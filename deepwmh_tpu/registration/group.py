"""All-pairs group registration with idempotent artifacts and sharding.

Rebuild of the reference's ANTsGroupRegistration driver
(deepwmh/external_tools/ANTs_group_registration.py:220-273 and CLI :277-391):
register every source (healthy reference) onto every target (training
subject), S x T pairs, skipping pairs whose outputs already load cleanly
(:175-188) and supporting the manual multi-machine `--distributed a/b`
round-robin sharding (:248-258). The per-pair compute is the TPU affine +
SVF stack instead of a subprocess per pair.

Artifact layout per pair (consumed by the training pipeline):
  <out>/<s>_to_<t>.nii.gz          warped source image on the target grid
  <out>/<s>_to_<t>/affine.json     3x4 physical affine + spacings
  <out>/<s>_to_<t>/warp.nii.gz     displacement field (D,H,W,3, voxels)
"""

from __future__ import annotations

import dataclasses
import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from deepwmh_tpu.core import nifti
from deepwmh_tpu.core.artifacts import atomic_write_json, join_path, load_json, mkdir
from deepwmh_tpu.registration.affine import AffineConfig, _affine_core, resample_moving
from deepwmh_tpu.registration.svf import SVFConfig, _svf_core, apply_affine_svf


def pair_name(source_case: str, target_case: str) -> str:
    return "%s_to_%s" % (source_case, target_case)


def _pair_core(fixed, moving, fsp, msp, acfg, scfg, deformable):
    """One pair end-to-end ON DEVICE: affine pyramid -> resample -> SVF
    pyramid -> final fused [affine, warp] resample. A single XLA program per
    pair geometry; the round-1 design dispatched ~5 programs + intermediate
    host transfers per pair, and through a remote-TPU tunnel the RPC latency
    and f32 wire bytes dominated the actual compute by >100x."""
    fixed = fixed.astype(jnp.float32)
    moving = moving.astype(jnp.float32)
    mat, aff_loss = _affine_core(fixed, moving, fsp, msp, acfg)
    moving_on_fixed = resample_moving(moving, mat, fixed.shape, fsp, msp, order=1)
    if deformable:
        disp, svf_loss = _svf_core(fixed, moving_on_fixed, scfg)
        warped = apply_affine_svf(
            moving, mat, disp, fixed.shape, fsp, msp, order=1
        )
        # f16 over the wire: warp fields carry ~1e-3 voxel quantization at
        # typical magnitudes, far below trilinear resampling error; halves
        # the dominant tunnel download
        disp16 = disp.astype(jnp.float16)
    else:
        disp16, svf_loss = None, None
        warped = moving_on_fixed
    return mat, aff_loss, disp16, svf_loss, warped.astype(jnp.float16)


@functools.partial(jax.jit, static_argnames=("acfg", "scfg", "deformable"))
def _pair_core_jit(fixed, moving, fsp, msp, acfg, scfg, deformable=True):
    return _pair_core(fixed, moving, fsp, msp, acfg, scfg, deformable)


@functools.partial(jax.jit, static_argnames=("acfg", "scfg", "deformable"))
def _pair_core_batch_jit(fixed, moving, fsp, msp, acfg, scfg, deformable=True):
    return jax.vmap(
        lambda f, m: _pair_core(f, m, fsp, msp, acfg, scfg, deformable)
    )(fixed, moving)


def register_pairs_mesh(fixed_stack, moving_stack, fixed_spacing,
                        moving_spacing, mesh, affine_cfg=None, svf_cfg=None,
                        deformable=True, axis=None):
    """Data-parallel pair registration over a `jax.sharding.Mesh`: the
    [B, D, H, W] stacks are sharded along the batch axis, so each chip
    registers its own pairs inside ONE jitted program — the reference's
    all-pairs training prep (train.py:184-185, 500-1000 pairs on a CPU
    cluster) scales linearly over a TPU slice with no collectives (pairs
    are independent; XLA partitions the vmap along the sharded batch).

    B is padded to a device-count multiple by repeating the last pair; the
    padded outputs are dropped. Returns the _pair_core tuple layout:
    (mats [B,3,4], affine_losses [B], disp16 [B,3,D,H,W] or None,
    svf_losses [B] or None, warped16 [B,D,H,W]).
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    from deepwmh_tpu.registration.affine import feasible_affine_cfg
    from deepwmh_tpu.registration.svf import _feasible_cfg

    axis = axis or mesh.axis_names[0]
    n_dev = int(mesh.shape[axis])
    B = int(fixed_stack.shape[0])
    pad = (-B) % n_dev
    fixed_stack = np.asarray(fixed_stack, np.float16)
    moving_stack = np.asarray(moving_stack, np.float16)
    if pad:
        rep = lambda a: np.concatenate([a, np.repeat(a[-1:], pad, axis=0)])
        fixed_stack = rep(fixed_stack)
        moving_stack = rep(moving_stack)

    shape = tuple(fixed_stack.shape[1:])
    acfg = feasible_affine_cfg(affine_cfg or AffineConfig(), shape)
    scfg = _feasible_cfg(svf_cfg or SVFConfig(), shape)

    # device_put HOST arrays with the sharding: each shard transfers
    # straight to its device — a jnp.asarray first would materialize the
    # whole stack on one chip and OOM at the workload this exists for
    sharding = NamedSharding(mesh, P(axis))
    fx = jax.device_put(fixed_stack, sharding)
    mv = jax.device_put(moving_stack, sharding)
    outs = _pair_core_batch_jit(
        fx, mv,
        jnp.asarray(fixed_spacing, jnp.float32),
        jnp.asarray(moving_spacing, jnp.float32),
        acfg, scfg, deformable=deformable,
    )
    if pad:
        outs = jax.tree_util.tree_map(
            lambda x: x[:B] if x is not None else None, outs,
            is_leaf=lambda x: x is None,
        )
    return outs


class GroupRegistration:
    def __init__(
        self,
        sources,
        targets,
        output_folder,
        keep_deformation: bool = True,
        quick: bool = False,
        large_deformation: bool = False,
        distributed: str = None,
        deformable: bool = True,
        warm_start: bool = False,
    ):
        """sources/targets: [(case_name, image_path)].

        quick: fewer iterations / skip the finest pyramid level — the
        reference's --allow-quick-registration (30-40% faster, :322-326).
        large_deformation: more iterations — --allow-large-deformations.
        distributed: 'a/b' runs shard a (1-based) of b (:248-258).
        warm_start: OPT-IN — register the first source onto every target
        and the remaining sources onto the first source at full budget,
        then seed every other (source, target) pair's SVF from the
        composed estimate and refine it on a shortened schedule
        (registration/warm.py). Requires >= 2 sources, deformable pairs
        with kept warps, and no --distributed sharding (the warm rows
        depend on the anchor row's artifacts).
        """
        self.sources = list(sources)
        self.targets = list(targets)
        self.output_folder = mkdir(output_folder)
        self.keep_deformation = keep_deformation
        self.deformable = deformable
        self._quick = quick
        self._large = large_deformation
        self.warm_start = bool(warm_start) and len(self.sources) >= 2
        if warm_start and distributed:
            raise ValueError(
                "warm_start shards have cross-pair dependencies (anchor row "
                "first); use --distributed without --svf-warm-start"
            )
        if warm_start and not (deformable and keep_deformation):
            raise ValueError(
                "warm_start needs deformable pairs with kept warps (the "
                "composed seed reads the anchor row's warp fields)"
            )

        if quick and large_deformation:
            # The reference's actual training-prep configuration composes
            # BOTH switches (deepwmh/main/train.py:215 passes
            # --allow-large-deformations --allow-quick-registration, and
            # ANTs_group_registration.py:191-201 applies large-deformation
            # strength THEN quick's coarser pyramid): large-deformation
            # capacity (iteration budget, 2^4 integration subdivisions,
            # hybrid exact-polish exp gradient) on the quick pyramid
            # (finest level dropped).
            self.affine_cfg = AffineConfig(shrinks=(8, 4), iters=(200, 120))
            # hybrid exp gradient: first-order VJP for the bulk of each
            # level, the last 30 iterations exact — measured on a 19.5-vox
            # synthetic deformation at bench shape: field RMSE 0.836 vs
            # all-exact 0.830 (all-approx: 0.949) at 6.5s vs 15.1s of SVF
            # device time
            self.svf_cfg = SVFConfig(
                shrinks=(8, 4), iters=(200, 160), n_squaring=4,
                exact_polish_iters=30,
            )
        elif quick:
            self.affine_cfg = AffineConfig(shrinks=(8, 4), iters=(100, 50))
            self.svf_cfg = SVFConfig(shrinks=(8, 4), iters=(100, 50))
        elif large_deformation:
            self.affine_cfg = AffineConfig(shrinks=(8, 4, 2), iters=(200, 120, 60))
            self.svf_cfg = SVFConfig(
                shrinks=(8, 4, 2), iters=(200, 160, 80), n_squaring=4,
                exact_polish_iters=30,
            )
        else:
            self.affine_cfg = AffineConfig()
            self.svf_cfg = SVFConfig()

        tasks = [(s, t) for s in self.sources for t in self.targets]
        if distributed:
            a, b = distributed.split("/")
            a, b = int(a), int(b)
            assert 1 <= a <= b, "invalid --distributed %s" % distributed
            tasks = [task for i, task in enumerate(tasks) if i % b == (a - 1)]
        self.tasks = tasks

    # ------------------------------------------------------------------ #

    def _pair_paths(self, s_case, t_case):
        name = pair_name(s_case, t_case)
        return {
            "image": join_path(self.output_folder, name + ".nii.gz"),
            "dir": join_path(self.output_folder, name),
            "affine": join_path(self.output_folder, name, "affine.json"),
            "warp": join_path(self.output_folder, name, "warp.nii.gz"),
        }

    def _pair_done(self, paths) -> bool:
        if not nifti.try_load_nifti(paths["image"]):
            return False
        if not os.path.isfile(paths["affine"]):
            return False
        if self.deformable and self.keep_deformation and not nifti.try_load_nifti(
            paths["warp"]
        ):
            return False
        return True

    def _pair_cfgs(self, fixed_shape):
        from deepwmh_tpu.registration.affine import feasible_affine_cfg
        from deepwmh_tpu.registration.svf import _feasible_cfg

        affine_cfg = feasible_affine_cfg(self.affine_cfg, fixed_shape)
        svf_cfg = _feasible_cfg(self.svf_cfg, fixed_shape)
        return affine_cfg, svf_cfg

    def _write_pair(self, paths, f_hdr, f_sp, m_sp, f_shape,
                    matrix, aff_loss, disp16, svf_loss, warped16):
        mkdir(paths["dir"])
        nifti.save_nifti(
            np.asarray(warped16, np.float32), f_hdr, paths["image"], level=2
        )
        if disp16 is not None and self.keep_deformation:
            # int16 + scl_slope: ~1e-2 voxel quantization (below the f16
            # wire precision already accepted), half the bytes, and several
            # times faster to deflate than float32 mantissa noise — warp
            # writes dominate a pair's host time otherwise
            nifti.save_nifti_scaled_int16(
                np.moveaxis(np.asarray(disp16, np.float32), 0, -1),
                f_hdr,
                paths["warp"],
            )
        # affine.json is written LAST: it is the cheap atomic marker, so its
        # presence implies the image (and warp, when kept) are complete — a
        # kill mid-pair can never half-pass later _pair_done probes
        atomic_write_json(
            self._pair_meta(
                np.asarray(matrix), f_sp, m_sp, f_shape,
                float(aff_loss),
                None if svf_loss is None else float(svf_loss),
            ),
            paths["affine"],
        )

    def register_pair(self, s_case, s_path, t_case, t_path, verbose=True):
        paths = self._pair_paths(s_case, t_case)
        if self._pair_done(paths):
            if verbose:
                print("pair %s: already done, skip" % pair_name(s_case, t_case))
            return paths
        if verbose:
            print("registering %s" % pair_name(s_case, t_case), flush=True)

        fixed, f_hdr = nifti.load_nifti(t_path)
        moving, _ = nifti.load_nifti(s_path)
        f_sp = nifti.get_nifti_pixdim(t_path)
        m_sp = nifti.get_nifti_pixdim(s_path)
        affine_cfg, svf_cfg = self._pair_cfgs(fixed.shape)

        # f16 upload: FLAIR intensities carry <= 12 significant bits; halves
        # the tunnel upload with no effect on MI binning / LNCC
        out = _pair_core_jit(
            jnp.asarray(fixed, jnp.float16),
            jnp.asarray(moving, jnp.float16),
            jnp.asarray(f_sp, jnp.float32),
            jnp.asarray(m_sp, jnp.float32),
            affine_cfg,
            svf_cfg,
            deformable=self.deformable,
        )
        self._write_pair(paths, f_hdr, f_sp, m_sp, fixed.shape, *out)
        return paths

    def _pair_meta(self, matrix, f_sp, m_sp, f_shape, aff_loss, svf_loss):
        return {
            "matrix": np.asarray(matrix).tolist(),
            "fixed_spacing": [float(v) for v in f_sp],
            "moving_spacing": [float(v) for v in m_sp],
            "fixed_shape": [int(v) for v in f_shape],
            "affine_loss": float(aff_loss),
            "svf_loss": None if svf_loss is None else float(svf_loss),
            "deformable": bool(self.deformable),
            "warp_kept": bool(self.deformable and self.keep_deformation),
        }

    def pair_complete(self, s_case: str, t_case: str) -> bool:
        """Full completeness probe for one pair (image + affine + warp when
        deformation is kept) — the contract distributed barriers must use."""
        return self._pair_done(self._pair_paths(s_case, t_case))

    def launch(self, verbose: bool = True, batch_pairs: int = 1, mesh=None):
        """Register all remaining pairs as a three-stage pipeline: threaded
        NIfTI prefetch -> one fused XLA program per chunk -> threaded
        artifact writes. The workload is host-gzip + wire bound (device
        compute of a quick-config pair is <1s), so the pipeline overlaps all
        three; this is the TPU answer to the reference's 4-process ANTs pool
        (ANTs_group_registration.py:272).

        batch_pairs > 1 fuses same-geometry pairs into one vmapped program.
        MEASURED (v5e behind a tunnel, 96^3 quick): B=1 29 pairs/min vs B=4
        20 pairs/min end-to-end — batching the compute scales ~3.4x on
        device but the wire bytes don't shrink, so B=1 is the default;
        prefer batch_pairs=4 on a local (untunneled) TPU host.

        mesh: a jax.sharding.Mesh shards each batched chunk along its
        batch axis so every device registers its own pairs (the multi-chip
        path of register_pairs_mesh, with this launcher's idempotent
        artifact contract kept); batch_pairs should be >= the device count
        to keep all chips busy."""
        if self.warm_start:
            if mesh is not None or batch_pairs > 1:
                raise ValueError(
                    "warm_start is a single-chip serial schedule (anchor row "
                    "-> warm rows); drop --svf-warm-start to batch/shard pairs"
                )
            return self._launch_warm(verbose=verbose)
        return self._launch_batched(max(1, batch_pairs), verbose=verbose, mesh=mesh)

    def _launch_warm(self, verbose: bool = True):
        """Warm-start schedule (registration/warm.py): the anchor source's
        row and the source->anchor auxiliary pairs run at the full budget,
        every remaining pair is seeded from their composition and refined on
        the shortened warm_schedule. Artifacts are bit-compatible with the
        cold path (same layout, same _pair_done probes), so resume works
        across mode switches; the aux pairs live under _warm_aux/ and are
        NOT part of the S x T contract."""
        from concurrent.futures import ThreadPoolExecutor

        from deepwmh_tpu.registration.warm import warm_pair_core_jit, warm_schedule

        anchor = self.sources[0]
        others = self.sources[1:]

        # phase 0+1 at the FULL budget via the cold machinery (idempotent)
        aux_dir = join_path(self.output_folder, "_warm_aux")
        aux = GroupRegistration(
            others, [anchor], aux_dir, keep_deformation=True,
            quick=self._quick, large_deformation=self._large,
        )
        aux.launch(verbose=verbose)
        row = GroupRegistration(
            [anchor], self.targets, self.output_folder, keep_deformation=True,
            quick=self._quick, large_deformation=self._large,
        )
        row.launch(verbose=verbose)

        remaining = [
            (s, t) for s in others for t in self.targets
            if not self._pair_done(self._pair_paths(s[0], t[0]))
        ]
        if not remaining:
            if verbose:
                print("all warm pairs already done", flush=True)
            return

        # auxiliary fields + matrices, decoded once (f16: S-1 fields in RAM)
        sp_s0 = nifti.get_nifti_pixdim(anchor[1])
        aux_data = {}
        for s_name, _ in others:
            pdir = join_path(aux_dir, pair_name(s_name, anchor[0]))
            meta = load_json(join_path(pdir, "affine.json"))
            di0 = np.moveaxis(
                nifti.load_nifti_simple(join_path(pdir, "warp.nii.gz")), -1, 0
            ).astype(np.float16)
            aux_data[s_name] = (np.asarray(meta["matrix"], np.float32), di0)
        moving_by_src = {
            s_name: nifti.load_nifti_simple(path).astype(np.float16)
            for s_name, path in others
        }

        def load_target(t):
            t_name, t_path = t
            fixed = nifti.load_nifti_simple(t_path).astype(np.float16)
            pdir = join_path(self.output_folder, pair_name(anchor[0], t_name))
            meta = load_json(join_path(pdir, "affine.json"))
            d0t = np.moveaxis(
                nifti.load_nifti_simple(join_path(pdir, "warp.nii.gz")), -1, 0
            ).astype(np.float16)
            return fixed, np.asarray(meta["matrix"], np.float32), d0t

        by_target = {}
        for s, t in remaining:
            by_target.setdefault(t, []).append(s)
        targets_todo = list(by_target)

        done, total = 0, len(remaining)
        write_futures = []
        with ThreadPoolExecutor(max_workers=8) as pool:
            tgt_future = pool.submit(load_target, targets_todo[0])
            for ti, t in enumerate(targets_todo):
                t_name, t_path = t
                fixed, mat0t, d0t = tgt_future.result()
                if ti + 1 < len(targets_todo):
                    tgt_future = pool.submit(load_target, targets_todo[ti + 1])
                f_hdr = nifti.get_nifti_header(t_path)
                f_sp = nifti.get_nifti_pixdim(t_path)
                affine_cfg, svf_cfg = self._pair_cfgs(fixed.shape)
                warm_scfg = warm_schedule(svf_cfg)
                fx = jnp.asarray(fixed)
                d0t_j = jnp.asarray(d0t)
                for s_name, s_path in by_target[t]:
                    done += 1
                    if verbose:
                        print("[warm %d/%d] registering %s"
                              % (done, total, pair_name(s_name, t_name)),
                              flush=True)
                    mati0, di0 = aux_data[s_name]
                    m_sp = nifti.get_nifti_pixdim(s_path)
                    outs = warm_pair_core_jit(
                        fx, jnp.asarray(moving_by_src[s_name]),
                        jnp.asarray(f_sp, jnp.float32),
                        jnp.asarray(m_sp, jnp.float32),
                        d0t_j, jnp.asarray(di0),
                        jnp.asarray(mat0t), jnp.asarray(mati0),
                        jnp.asarray(sp_s0, jnp.float32),
                        affine_cfg, warm_scfg,
                    )
                    paths = self._pair_paths(s_name, t_name)
                    write_futures.append(pool.submit(
                        self._write_pair, paths, f_hdr, f_sp, m_sp,
                        fixed.shape, *outs,
                    ))
                    for fut in [f for f in write_futures if f.done()]:
                        fut.result()  # fail fast
                    write_futures = [f for f in write_futures if not f.done()]
            for fut in write_futures:
                fut.result()

    def _launch_batched(self, batch_pairs: int, verbose: bool = True, mesh=None):
        from concurrent.futures import ThreadPoolExecutor

        # group remaining pairs by identical geometry
        buckets = {}
        n_skip = 0
        for s, t in self.tasks:
            paths = self._pair_paths(s[0], t[0])
            if self._pair_done(paths):
                n_skip += 1
                continue
            f_hdr = nifti.get_nifti_header(t[1])
            m_hdr = nifti.get_nifti_header(s[1])
            # abs() matches register_pair's get_nifti_pixdim: negative
            # header pixdims must not flip the physical grid or leak into
            # affine.json (the two launchers must emit identical artifacts)
            key = (
                f_hdr.shape, m_hdr.shape,
                tuple(round(abs(z), 4) for z in f_hdr.zooms[:3]),
                tuple(round(abs(z), 4) for z in m_hdr.zooms[:3]),
            )
            buckets.setdefault(key, []).append((s, t))
        if verbose and n_skip:
            print("%d pair(s) already done, skipped" % n_skip, flush=True)

        chunks = []  # (chunk, f_shape, f_sp, m_sp, affine_cfg, svf_cfg)
        for (f_shape, m_shape, f_sp, m_sp), pairs in buckets.items():
            affine_cfg, svf_cfg = self._pair_cfgs(f_shape)
            for i0 in range(0, len(pairs), batch_pairs):
                chunks.append(
                    (pairs[i0 : i0 + batch_pairs], f_shape, f_sp, m_sp,
                     affine_cfg, svf_cfg)
                )

        def load_chunk(chunk):
            # gzip decompression releases the GIL; stack to f16 for the wire
            fixed = np.stack(
                [nifti.load_nifti_simple(t[1]) for _, t in chunk]
            ).astype(np.float16)
            moving = np.stack(
                [nifti.load_nifti_simple(s[1]) for s, _ in chunk]
            ).astype(np.float16)
            return fixed, moving

        def write_one(paths, f_hdr, f_sp, m_sp, f_shape, outs_j):
            self._write_pair(paths, f_hdr, f_sp, m_sp, f_shape, *outs_j)

        done = 0
        total = sum(len(c[0]) for c in chunks)
        write_futures = []
        with ThreadPoolExecutor(max_workers=8) as pool:
            load_future = pool.submit(load_chunk, chunks[0][0]) if chunks else None
            for ci, (chunk, f_shape, f_sp, m_sp, acfg, scfg) in enumerate(chunks):
                fixed, moving = load_future.result()
                if ci + 1 < len(chunks):
                    load_future = pool.submit(load_chunk, chunks[ci + 1][0])
                if verbose:
                    print(
                        "[%d/%d] registering %s"
                        % (
                            done + len(chunk), total,
                            [pair_name(s[0], t[0]) for s, t in chunk],
                        ),
                        flush=True,
                    )
                done += len(chunk)
                fsp_j = jnp.asarray(f_sp, jnp.float32)
                msp_j = jnp.asarray(m_sp, jnp.float32)
                if len(chunk) == 1 and mesh is None:
                    outs = _pair_core_jit(
                        jnp.asarray(fixed[0]), jnp.asarray(moving[0]),
                        fsp_j, msp_j, acfg, scfg, deformable=self.deformable,
                    )
                    outs = jax.tree_util.tree_map(lambda x: x[None], outs)
                elif mesh is not None:
                    # one implementation of pad/shard/drop: the library call
                    outs = register_pairs_mesh(
                        fixed, moving, f_sp, m_sp, mesh,
                        affine_cfg=acfg, svf_cfg=scfg,
                        deformable=self.deformable,
                    )
                else:
                    outs = _pair_core_batch_jit(
                        jnp.asarray(fixed), jnp.asarray(moving),
                        fsp_j, msp_j, acfg, scfg, deformable=self.deformable,
                    )
                mats, aff_losses, disps16, svf_losses, warpeds16 = outs
                for j, (s, t) in enumerate(chunk):
                    paths = self._pair_paths(s[0], t[0])
                    f_hdr = nifti.get_nifti_header(t[1])
                    outs_j = (
                        mats[j], aff_losses[j],
                        None if disps16 is None else disps16[j],
                        None if svf_losses is None else svf_losses[j],
                        warpeds16[j],
                    )
                    write_futures.append(
                        pool.submit(
                            write_one, paths, f_hdr, f_sp, m_sp, f_shape, outs_j
                        )
                    )
                # fail fast: surface any completed write error before
                # dispatching more work
                for f in [f for f in write_futures if f.done()]:
                    f.result()
                write_futures = [f for f in write_futures if not f.done()]
            # barrier: launch() returns only when every artifact is durably
            # written (the pair_complete contract)
            for f in write_futures:
                f.result()


def apply_pair_transforms(
    pair_dir, in_files, out_files, interp="NearestNeighbor"
):
    """Warp files from the source subject's grid onto the target grid using
    a saved pair transform — the reference's two-step antsApplyTransforms
    label propagation (deepwmh/main/train.py:45-60) as one fused gather."""
    meta = load_json(join_path(pair_dir, "affine.json"))
    matrix = np.asarray(meta["matrix"], np.float32)
    fixed_shape = tuple(meta["fixed_shape"])
    f_sp = meta["fixed_spacing"]
    m_sp = meta["moving_spacing"]
    warp_path = join_path(pair_dir, "warp.nii.gz")
    order = 0 if interp == "NearestNeighbor" else 1

    deformable = meta.get("deformable")
    if deformable is None:  # metas from older runs lack the explicit flag
        deformable = meta.get("warp_kept", meta.get("svf_loss") is not None)
    # single decode (a probe-then-load would gunzip the dense field twice)
    disp = None
    try:
        disp = np.moveaxis(nifti.load_nifti_simple(warp_path), -1, 0)
    except Exception:
        pass
    if disp is None and deformable:
        # A deformable pair without a usable warp must NOT silently degrade
        # label propagation to affine-only: the pair image is SVF-warped, so
        # affine-only labels would be misaligned with it — and cached
        # forever by try_load_nifti resume probes downstream. This covers
        # both a missing/corrupt file and keep_deformation=False runs
        # (propagation needs the warp; re-register keeping it).
        raise RuntimeError(
            "pair %s: the pair was registered deformably but warp.nii.gz "
            "is missing or unreadable (never kept — re-run with "
            "keep_deformation — or deleted/corrupt: delete %s and re-run "
            "registration for this pair)." % (pair_dir, pair_dir)
        )
    if disp is None:
        # affine-only registration (deformable=False): zero displacement is
        # the correct composed transform, not a fallback
        disp = np.zeros((3,) + fixed_shape, np.float32)

    # donor header: the pair's registered image carries the true target
    # geometry (falling back to a synthesized header would write an sform
    # inconsistent with pixdim and misalign external overlays)
    pair_image = pair_dir.rstrip("/\\") + ".nii.gz"
    if os.path.isfile(pair_image):
        hdr = nifti.get_nifti_header(pair_image)
    else:
        hdr = nifti.NiftiHeader()
        hdr.set_shape(fixed_shape)
        hdr.set_zooms(tuple(f_sp))
        hdr.srow = np.concatenate(
            [np.diag([f_sp[0], f_sp[1], f_sp[2]]), np.zeros((3, 1))], axis=1
        )

    for in_file, out_file in zip(in_files, out_files):
        if nifti.try_load_nifti(out_file):
            continue
        data = nifti.load_nifti_simple(in_file)
        out = np.asarray(
            apply_affine_svf(
                jnp.asarray(data), matrix, jnp.asarray(disp), fixed_shape, f_sp, m_sp,
                order=order,
            )
        )
        os.makedirs(os.path.dirname(os.path.abspath(out_file)), exist_ok=True)
        nifti.save_nifti(out, hdr, out_file)
