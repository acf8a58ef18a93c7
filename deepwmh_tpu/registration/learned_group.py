"""Learned group registration end-to-end (the VoxelMorph pathway).

Rebuild of vxm_end2end (deepwmh/external_tools/VxM_group_registration.py:
84-397): build an affine template from the cohort, affine-align every image
onto the template grid, train ONE displacement-predicting network on the
aligned cohort, then register every (source, target) pair with a single
forward pass and map the result back to each target's native grid.

The per-pair output is exactly GroupRegistration's artifact layout
(<s>_to_<t>.nii.gz + affine.json + warp.nii.gz), so the training pipeline
and `apply_pair_transforms` label propagation consume it unchanged. The
transform algebra: with M_i mapping template physical -> image_i physical
(the template-construction resampling transforms) and d the learned
template-grid displacement for (moving=s_aligned, fixed=t_aligned),

  warp s onto t:  x_t --M_t^-1--> template --(+d)--> template --M_s--> s

which factors into the standard [affine, warp] form with
  affine = M_s @ M_t^-1  and
  disp_t(x) = M_t((psi + d(psi)) * sp_T)/sp_t - x,  psi = template coords of x.
"""

from __future__ import annotations

import functools
import os

import jax
import numpy as np

from deepwmh_tpu.core import nifti
from deepwmh_tpu.core.artifacts import atomic_write_json, join_path, mkdir
from deepwmh_tpu.registration.affine import AffineConfig, invert_affine
from deepwmh_tpu.registration.group import pair_name
from deepwmh_tpu.registration.learned import LearnedRegConfig, LearnedRegistration
from deepwmh_tpu.registration.svf import apply_affine_svf
from deepwmh_tpu.registration.template import build_affine_template


def _compose_affines(a, b):
    """(a @ b) for 3x4 physical affines: x -> a(b(x))."""
    A = np.eye(4)
    A[:3, :] = np.asarray(a)
    B = np.eye(4)
    B[:3, :] = np.asarray(b)
    return (A @ B)[:3, :]


def _lift_core(disp_T, Minv_t, M_t, sp_T, sp_t, t_shape):
    """Template-grid displacement -> target-native displacement (traced)."""
    import jax.numpy as jnp

    from deepwmh_tpu.ops.warp import identity_grid, sample_channels

    grid_t = identity_grid(tuple(t_shape))  # [3, Dt, Ht, Wt] voxels
    sp_t_a = jnp.asarray(sp_t, jnp.float32).reshape(3, 1)
    sp_T_a = jnp.asarray(sp_T, jnp.float32).reshape(3, 1)
    x_phys = grid_t.reshape(3, -1) * sp_t_a
    A, b = Minv_t[:, :3], Minv_t[:, 3]
    psi_phys = A @ x_phys + b[:, None]
    psi_vox = (psi_phys / sp_T_a).reshape(grid_t.shape)
    # one fused 3-channel gather instead of three per-component samples
    d = sample_channels(jnp.asarray(disp_T, jnp.float32), psi_vox)
    moved_phys = (psi_vox + d).reshape(3, -1) * sp_T_a
    At, bt = M_t[:, :3], M_t[:, 3]
    back_phys = At @ moved_phys + bt[:, None]
    back_vox = (back_phys / sp_t_a).reshape(grid_t.shape)
    return back_vox - grid_t


@functools.partial(
    jax.jit, static_argnames=("sp_T", "sp_t", "sp_s", "t_shape", "order")
)
def _lift_and_warp(disp_T, Minv_t, M_t, matrix, moving,
                   sp_T, sp_t, sp_s, t_shape, order=1):
    """Fused per-pair program: lift the template-grid displacement to the
    target grid AND resample the moving image through [affine, warp] — ONE
    dispatch per pair. The unfused chain (three sample_volume dispatches +
    a separate apply_affine_svf) measured ~12s/pair through the remote
    tunnel vs ~1s fused (docs/PERF.md 'Registration at scale')."""
    import jax.numpy as jnp

    disp_t = _lift_core(disp_T, Minv_t, M_t, sp_T, sp_t, t_shape)
    warped = apply_affine_svf(
        moving, jnp.asarray(matrix, jnp.float32), disp_t, t_shape, sp_t,
        sp_s, order=order,
    )
    return warped, disp_t


def _disp_to_target_grid(disp_T, M_t, sp_T, sp_t, t_shape):
    """Lift a template-grid displacement field into the target's native
    grid so that affine=M_s@M_t^-1 plus this field reproduces the full
    chain. (Standalone entry point; production pairs run _lift_and_warp,
    which fuses this with the image resample.)"""
    import jax.numpy as jnp

    M_t = np.asarray(M_t)
    Minv = invert_affine(M_t)
    return np.asarray(
        _lift_core(
            jnp.asarray(disp_T, jnp.float32),
            jnp.asarray(Minv, jnp.float32),
            jnp.asarray(M_t, jnp.float32),
            tuple(float(s) for s in sp_T),
            tuple(float(s) for s in sp_t),
            tuple(int(s) for s in t_shape),
        )
    )


class LearnedGroupRegistration:
    """Amortized all-pairs registration: one network forward per pair."""

    def __init__(
        self,
        sources,
        targets,
        output_folder,
        reg_cfg: LearnedRegConfig = None,
        template_cfg: AffineConfig = None,
        template_spacing=(2.0, 2.0, 2.0),
        template_iterations: int = 2,
        mesh=None,
    ):
        self.sources = list(sources)
        self.targets = list(targets)
        self.output_folder = mkdir(output_folder)
        self.reg_cfg = reg_cfg or LearnedRegConfig()
        self.template_cfg = template_cfg or AffineConfig(shrinks=(4, 2), iters=(100, 50))
        self.template_spacing = tuple(float(s) for s in template_spacing)
        self.template_iterations = template_iterations
        self.mesh = mesh  # dp mesh for the network-training pair batches

    def pair_complete(self, s_name: str, t_name: str) -> bool:
        """Public resume/barrier probe — same contract as
        GroupRegistration.pair_complete (cli/train.py's completion barrier
        works with either mode)."""
        return self._pair_complete(s_name, t_name)

    def _pair_complete(self, s_name: str, t_name: str) -> bool:
        """Resume probe covering ALL pair artifacts (a crash between the
        image and json writes must not orphan the pair)."""
        pair = pair_name(s_name, t_name)
        pair_dir = join_path(self.output_folder, pair)
        out_img = join_path(self.output_folder, pair + ".nii.gz")
        return (
            nifti.try_load_nifti(out_img)
            and os.path.isfile(join_path(pair_dir, "affine.json"))
            and nifti.try_load_nifti(join_path(pair_dir, "warp.nii.gz"))
        )

    def launch(self, verbose: bool = True):
        from deepwmh_tpu.registration.affine import apply_affine

        # resume: template construction + network training are only worth
        # paying when at least one pair is missing
        if all(
            self._pair_complete(s, t)
            for s, _ in self.sources
            for t, _ in self.targets
        ):
            if verbose:
                print("all pairs already registered, nothing to do", flush=True)
            return

        cases = self.sources + self.targets
        names = [c for c, _ in cases]
        imgs, spacings = [], []
        for _, path in cases:
            imgs.append(nifti.load_nifti_simple(path))
            spacings.append(nifti.get_nifti_pixdim(path))
        img_by_name = {name: img for (name, _), img in zip(cases, imgs)}

        # 1) affine template (VxM_group_registration.py:229-309)
        if verbose:
            print("building affine template...", flush=True)
        template, mats = build_affine_template(
            imgs,
            spacings=spacings,
            out_spacing=self.template_spacing,
            iterations=self.template_iterations,
            cfg=self.template_cfg,
            verbose=verbose,
        )
        grid_shape = template.shape
        sp_T = self.template_spacing

        # 2) aligned cohort on the template grid
        aligned = {}
        for (name, _), img, sp, M in zip(cases, imgs, spacings, mats):
            aligned[name] = np.asarray(
                apply_affine(img, M, grid_shape, sp_T, sp, order=1)
            )
        M_by_name = {name: M for (name, _), M in zip(cases, mats)}
        sp_by_name = {name: sp for (name, _), sp in zip(cases, spacings)}

        # 3) train the registration network once (VxM train, :315-331)
        if verbose:
            print("training registration network...", flush=True)
        reg = LearnedRegistration(grid_shape, self.reg_cfg)
        reg.train(list(aligned.values()), verbose=verbose, mesh=self.mesh)
        self.reg = reg

        # 4) one forward pass per pair; emit GroupRegistration-layout
        # artifacts. Volumes come from the already-loaded cohort (imgs) —
        # no per-pair reloads; only headers are re-read (cheap).
        t_hdrs = {name: nifti.get_nifti_header(path) for name, path in self.targets}
        for s_name, s_path in self.sources:
            for t_name, t_path in self.targets:
                if self._pair_complete(s_name, t_name):
                    continue
                pair = pair_name(s_name, t_name)
                pair_dir = mkdir(join_path(self.output_folder, pair))
                out_img = join_path(self.output_folder, pair + ".nii.gz")
                if verbose:
                    print("registering %s" % pair, flush=True)
                disp_T = reg.register(aligned[t_name], aligned[s_name])
                t_vol, t_hdr = img_by_name[t_name], t_hdrs[t_name]
                sp_t = sp_by_name[t_name]
                M_t = np.asarray(M_by_name[t_name])
                matrix = _compose_affines(
                    M_by_name[s_name], invert_affine(M_t)
                )
                import jax.numpy as jnp

                warped, disp_t = _lift_and_warp(
                    jnp.asarray(disp_T, jnp.float32),
                    jnp.asarray(invert_affine(M_t), jnp.float32),
                    jnp.asarray(M_t, jnp.float32),
                    matrix,
                    jnp.asarray(img_by_name[s_name], jnp.float32),
                    tuple(float(v) for v in sp_T),
                    tuple(float(v) for v in sp_t),
                    tuple(float(v) for v in sp_by_name[s_name]),
                    tuple(int(v) for v in t_vol.shape),
                )
                warped = np.asarray(warped)
                disp_t = np.asarray(disp_t)
                nifti.save_nifti(warped, t_hdr, out_img)
                nifti.save_nifti_scaled_int16(
                    np.moveaxis(disp_t, 0, -1), t_hdr, join_path(pair_dir, "warp.nii.gz")
                )
                # affine.json last: the cheap atomic marker whose presence
                # implies the image and warp are complete (same producer
                # ordering as GroupRegistration._write_pair)
                atomic_write_json(
                    {
                        "matrix": matrix.tolist(),
                        "fixed_spacing": [float(v) for v in sp_t],
                        "moving_spacing": [float(v) for v in sp_by_name[s_name]],
                        "fixed_shape": [int(v) for v in t_vol.shape],
                        "affine_loss": None,
                        "svf_loss": None,
                        "method": "learned",
                        # learned pairs always write warp.nii.gz; without
                        # these flags apply_pair_transforms' lost-warp guard
                        # would silently propagate labels affine-only
                        "deformable": True,
                        "warp_kept": True,
                    },
                    join_path(pair_dir, "affine.json"),
                )
