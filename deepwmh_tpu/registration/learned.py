"""Learned (VoxelMorph-style) registration — the amortized alternative.

Rebuild of the reference's VoxelMorph pathway
(deepwmh/external_tools/VxM_group_registration.py:84-397): instead of
optimizing every source->target pair from scratch, train a small
displacement-predicting U-Net on the cohort once, then register any pair
with a single forward pass. On the reference's training workload (10 refs x
100 subjects = 1000 pairs, SURVEY.md §6) this turns hours of per-pair
optimization into one forward pass per pair.

The network consumes [fixed, moving] stacked as 2 channels on a common grid
(after the affine template alignment, registration/template.py) and
predicts a stationary velocity field; scaling-and-squaring integration keeps
the warp diffeomorphic. Loss = -LNCC + lambda * |grad v|^2, trained with the
same pjit/mesh data-parallel machinery as the segmentation engine.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
import optax

from deepwmh_tpu.ops.warp import displacement_warp
from deepwmh_tpu.registration.similarity import grad_sq, lncc, winsorize_rescale
from deepwmh_tpu.registration.svf import scaling_and_squaring
from deepwmh_tpu.unet.model import UNet3D
from deepwmh_tpu.unet.plan import Plan


@dataclass
class LearnedRegConfig:
    base_features: int = 8
    max_features: int = 32
    num_pools: int = 3
    steps: int = 300
    batch_pairs: int = 1
    lr: float = 1e-3
    smooth_weight: float = 1.0
    lncc_radius: int = 2
    int_steps: int = 5
    velocity_scale: float = 1.5  # tanh-bounded max velocity (voxels/step)


def _reg_plan(grid_shape, cfg: LearnedRegConfig) -> Plan:
    return Plan(
        target_spacing=[1.0, 1.0, 1.0],
        patch_size=[int(s) for s in grid_shape],
        batch_size=cfg.batch_pairs,
        pool_kernels=[[2, 2, 2]] * cfg.num_pools,
        conv_kernels=[[3, 3, 3]] * (cfg.num_pools + 1),
        base_features=cfg.base_features,
        max_features=cfg.max_features,
        num_classes=3,  # the 3 velocity components
        in_channels=2,
    )


class LearnedRegistration:
    """Train once on a cohort of same-grid volumes; register pairs in one
    forward pass."""

    def __init__(self, grid_shape, cfg: LearnedRegConfig = None):
        self.cfg = cfg or LearnedRegConfig()
        self.grid_shape = tuple(int(s) for s in grid_shape)
        # the U-Net needs every axis divisible by 2^num_pools (odd sizes
        # mid-pyramid break the skip concatenations); inputs are zero-
        # padded to this shape and the predicted velocity cropped back
        stride = 2 ** self.cfg.num_pools
        self.pad_shape = tuple(
            -(-s // stride) * stride for s in self.grid_shape
        )
        self.plan = _reg_plan(self.pad_shape, self.cfg)
        self.model = UNet3D(plan=self.plan)
        self.params = None
        self._predict = jax.jit(self._predict_impl)
        self._train_step = jax.jit(self._train_step_impl, donate_argnums=(0, 1))

    # ------------------------------------------------------------------ #

    def _velocity(self, params, fixed, moving):
        D, H, W = self.grid_shape
        pads = [(0, p - s) for p, s in zip(self.pad_shape, self.grid_shape)]
        fixed = jnp.pad(fixed, pads)
        moving = jnp.pad(moving, pads)
        x = jnp.stack([fixed, moving], axis=-1)[None]
        out = self.model.apply({"params": params}, x)[0]  # [pad D,H,W,3]
        v = jnp.tanh(out.astype(jnp.float32)) * self.cfg.velocity_scale
        return jnp.moveaxis(v[:D, :H, :W], -1, 0)  # [3,D,H,W]

    def _predict_impl(self, params, fixed, moving):
        v = self._velocity(params, fixed, moving)
        return scaling_and_squaring(v, self.cfg.int_steps)

    def _loss_one(self, params, fixed, moving):
        v = self._velocity(params, fixed, moving)
        disp = scaling_and_squaring(v, self.cfg.int_steps)
        warped = displacement_warp(moving, disp)
        sim = -lncc(fixed, warped, radius=self.cfg.lncc_radius)
        return sim + self.cfg.smooth_weight * grad_sq(v)

    def _loss(self, params, fixed, moving):
        """Mean loss over a PAIR BATCH [B,D,H,W] — under a dp mesh each
        device evaluates its shard and XLA all-reduces the gradient, the
        same DP shape as unet/train.Trainer."""
        losses = jax.vmap(lambda f, m: self._loss_one(params, f, m))(
            fixed, moving
        )
        return jnp.mean(losses)

    def _train_step_impl(self, params, opt_state, fixed, moving):
        loss, grads = jax.value_and_grad(self._loss)(params, fixed, moving)
        updates, opt_state = self.tx.update(grads, opt_state)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    # ------------------------------------------------------------------ #

    def train(self, volumes, rng_seed: int = 0, verbose: bool = True,
              mesh=None):
        """volumes: list of [D,H,W] arrays on the common grid (affine-aligned).
        Trains on random ordered pair BATCHES (cfg.batch_pairs per step;
        raised to the device count under a mesh). Returns the final mean
        loss.

        mesh: a 1-D 'dp' jax.sharding.Mesh shards the pair batch across
        devices — params replicated, XLA all-reduces the gradient over ICI,
        exactly like the segmentation Trainer."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        cfg = self.cfg
        B = max(int(cfg.batch_pairs), 1)
        rep_sharding = None
        if mesh is not None:
            if B < int(mesh.size):
                if B != 1:
                    # an explicit batch size that cannot shard evenly is a
                    # loud error, not a silent recipe change
                    raise ValueError(
                        "batch_pairs (%d) must divide by the mesh size (%d)"
                        % (B, int(mesh.size))
                    )
                B = int(mesh.size)
                if verbose:
                    print(
                        "regnet: batch_pairs 1 -> %d (one pair per mesh "
                        "device)" % B, flush=True)
            elif B % int(mesh.size):
                raise ValueError(
                    "batch_pairs (%d) must divide by the mesh size (%d)"
                    % (B, int(mesh.size))
                )
            rep_sharding = NamedSharding(mesh, P())
            dp_sharding = NamedSharding(mesh, P("dp"))
        # keep the winsorized cohort ON DEVICE as one [N,D,H,W] stack
        # (replicated under a mesh): pulling volumes to host and re-uploading
        # two per step would pay 2*steps full-volume transfers through the
        # (RTT-bound) remote-TPU link. Batches are assembled by a jitted
        # leading-axis gather; under a mesh its output carries the dp
        # sharding, and since every device holds the full replica the
        # reshard is device-local — steady-state steps move no volume data
        # at all (only the [B,2] index array). Cohorts too large to pin in
        # HBM next to params/grads/activations fall back to host batches
        # (one dp-sharded upload per step, each shard straight to its device).
        host_vols = None
        cohort_bytes = 4 * sum(int(np.prod(np.shape(v))) for v in volumes)
        max_resident = int(
            os.environ.get("DEEPWMH_REG_COHORT_HBM_BYTES", 2 << 30)
        )
        if cohort_bytes > max_resident:
            if verbose:
                print(
                    "regnet: cohort %.1f GiB > %.1f GiB budget — batching "
                    "from host" % (cohort_bytes / 2**30, max_resident / 2**30),
                    flush=True)
            host_vols = [
                np.asarray(winsorize_rescale(jnp.asarray(v, jnp.float32)))
                for v in volumes
            ]
            batch_sharding = dp_sharding if mesh is not None else None

            def _gather(_vs, ia, ib):
                fixed = np.stack([host_vols[i] for i in ia])
                moving = np.stack([host_vols[j] for j in ib])
                if batch_sharding is not None:
                    return (jax.device_put(fixed, batch_sharding),
                            jax.device_put(moving, batch_sharding))
                return jnp.asarray(fixed), jnp.asarray(moving)

            vol_stack = None
        else:
            vol_stack = jnp.stack(
                [winsorize_rescale(jnp.asarray(v, jnp.float32))
                 for v in volumes]
            )
            if mesh is not None:
                vol_stack = jax.device_put(vol_stack, rep_sharding)
                _gather = jax.jit(
                    lambda vs, ia, ib: (vs[ia], vs[ib]),
                    out_shardings=(dp_sharding, dp_sharding),
                )
            else:
                vol_stack = jax.device_put(vol_stack)
                _gather = jax.jit(lambda vs, ia, ib: (vs[ia], vs[ib]))
        key = jax.random.PRNGKey(rng_seed)
        x0 = jnp.zeros((1,) + self.pad_shape + (2,), jnp.bfloat16)
        self.params = self.model.init(key, x0)["params"]
        self.tx = optax.adam(cfg.lr)
        opt_state = self.tx.init(self.params)
        if rep_sharding is not None:
            self.params = jax.device_put(self.params, rep_sharding)
            opt_state = jax.device_put(opt_state, rep_sharding)

        n_vols = len(volumes)
        np_rng = np.random.RandomState(rng_seed)
        losses = []
        for step in range(cfg.steps):
            idx = np_rng.randint(0, n_vols, size=(B, 2))
            idx[:, 1] = np.where(
                idx[:, 0] == idx[:, 1], (idx[:, 1] + 1) % n_vols, idx[:, 1]
            )
            fixed, moving = _gather(vol_stack, idx[:, 0], idx[:, 1])
            self.params, opt_state, loss = self._train_step(
                self.params, opt_state, fixed, moving
            )
            losses.append(float(loss))
            if verbose and (step + 1) % max(cfg.steps // 10, 1) == 0:
                print(
                    "regnet step %d/%d loss %.4f"
                    % (step + 1, cfg.steps, np.mean(losses[-20:])),
                    flush=True,
                )
        return float(np.mean(losses[-20:]))

    def register(self, fixed, moving):
        """One forward pass -> displacement field [3,D,H,W] (voxel units)
        such that moving o (id+disp) ~ fixed."""
        assert self.params is not None, "train() first (or load params)"
        f = winsorize_rescale(jnp.asarray(fixed, jnp.float32))
        m = winsorize_rescale(jnp.asarray(moving, jnp.float32))
        return np.asarray(self._predict(self.params, f, m))
