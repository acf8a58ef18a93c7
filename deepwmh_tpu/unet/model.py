"""Plan-driven 3D U-Net in Flax, designed for the TPU MXU.

Replaces the nnU-Net fork's Generic_UNet (PyTorch/CUDA) that the reference
drives through shell commands (deepwmh/pipeline/DCNN_multistage.py:292-298,
predict.py:153-156). Same topology family — conv-downsample encoder,
transpose-conv decoder with skip concatenation, instance norm + leaky ReLU,
deep supervision — but laid out for XLA/TPU:

- NDHWC (channels-last) tensors so conv channels land on the 128-wide lane
  dimension of the MXU,
- bfloat16 activations/weights in compute with float32 parameters and
  float32 normalization statistics,
- per-stage anisotropic kernel/stride schedules straight from the Plan, all
  static so the whole forward is one fused XLA program.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from deepwmh_tpu.unet.plan import Plan, features_per_stage

LRELU_SLOPE = 0.01


class ConvNormAct(nn.Module):
    features: int
    kernel: Sequence[int]
    stride: Sequence[int] = (1, 1, 1)
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(
            self.features,
            kernel_size=tuple(self.kernel),
            strides=tuple(self.stride),
            padding="SAME",
            use_bias=True,
            dtype=self.dtype,
            param_dtype=jnp.float32,
        )(x)
        # instance norm == group norm with one channel per group; stats in f32
        x = nn.GroupNorm(
            num_groups=None,
            group_size=1,
            epsilon=1e-5,
            dtype=jnp.float32,
            param_dtype=jnp.float32,
        )(x)
        x = nn.leaky_relu(x, negative_slope=LRELU_SLOPE)
        return x.astype(self.dtype)


class UNet3D(nn.Module):
    """Plan-configured 3D U-Net.

    __call__(x: [N, D, H, W, C]) -> list of logits, highest resolution
    first: [N, D, H, W, num_classes] then one per deep-supervision level.
    """

    plan: Plan
    dtype: jnp.dtype = jnp.bfloat16
    # rematerialize conv-block activations in the backward pass: ~30% more
    # backward FLOPs for a large cut in live activation memory. Without it
    # the nnU-Net-recipe batch-2 training step at the flagship plan
    # (128x160x128 patches) fails to COMPILE on a 16GB v5e; with it both
    # batch sizes fit. Training turns it on; inference (no backward) has
    # nothing to rematerialize, so the flag is free there.
    remat: bool = False

    @nn.compact
    def __call__(self, x, deep_supervision: bool = False):
        plan = self.plan
        feats = features_per_stage(plan)
        P = plan.num_pools
        x = x.astype(self.dtype)
        # explicit names keep the parameter tree IDENTICAL between the
        # remat and plain variants (nn.remat changes auto-generated scope
        # names), so trained checkpoints load into inference models freely
        blk = nn.remat(ConvNormAct) if self.remat else ConvNormAct
        n_blocks = 0

        def Conv(f, k, s, dt):
            nonlocal n_blocks
            m = blk(f, k, s, dt, name="ConvNormAct_%d" % n_blocks)
            n_blocks += 1
            return m

        skips = []
        # encoder
        for i in range(P + 1):
            stride = plan.pool_kernels[i - 1] if i > 0 else (1, 1, 1)
            x = Conv(feats[i], plan.conv_kernels[i], stride, self.dtype)(x)
            x = Conv(feats[i], plan.conv_kernels[i], (1, 1, 1), self.dtype)(x)
            if i < P:
                skips.append(x)

        # decoder
        outputs = []
        if P == 0:
            # degenerate no-pooling plan (tiny volumes): single-scale head
            logits = nn.Conv(
                plan.num_classes,
                kernel_size=(1, 1, 1),
                dtype=self.dtype,
                param_dtype=jnp.float32,
                name="seg_head_0",
            )(x)
            outputs.append(logits.astype(jnp.float32))
        for i in range(P - 1, -1, -1):
            x = nn.ConvTranspose(
                feats[i],
                kernel_size=tuple(plan.pool_kernels[i]),
                strides=tuple(plan.pool_kernels[i]),
                padding="VALID",
                use_bias=False,
                dtype=self.dtype,
                param_dtype=jnp.float32,
            )(x)
            x = jnp.concatenate([x, skips[i]], axis=-1)
            x = Conv(feats[i], plan.conv_kernels[i], (1, 1, 1), self.dtype)(x)
            x = Conv(feats[i], plan.conv_kernels[i], (1, 1, 1), self.dtype)(x)
            # heads exist at every level so the param tree is invariant to
            # the deep_supervision flag (init once, use either way)
            logits = nn.Conv(
                plan.num_classes,
                kernel_size=(1, 1, 1),
                dtype=self.dtype,
                param_dtype=jnp.float32,
                name=f"seg_head_{i}",
            )(x)
            outputs.append(logits.astype(jnp.float32))

        outputs.reverse()  # highest resolution first
        return outputs if deep_supervision else outputs[0]


def create_model(plan: Plan, dtype=jnp.bfloat16) -> UNet3D:
    return UNet3D(plan=plan, dtype=dtype)


def init_params(model: UNet3D, rng, patch_size=None):
    ps = tuple(patch_size or model.plan.patch_size)
    x = jnp.zeros((1,) + ps + (model.plan.in_channels,), jnp.bfloat16)
    return model.init(rng, x)["params"]


def count_params(params) -> int:
    import jax

    return int(sum(p.size for p in jax.tree_util.tree_leaves(params)))
