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

import jax
import jax.numpy as jnp
from flax import linen as nn

from deepwmh_tpu.unet.plan import Plan, features_per_stage

LRELU_SLOPE = 0.01


def _conv3d_depth_decomposed(x, w, stride):
    """k_d x k x k conv == sum of k_d depth-shifted 2D convs (exact).

    Measured on a v5e: XLA's native 3D convolution lowering runs the
    full-resolution low-channel stages at 3-8% of MXU peak (the channel dim
    is padded to the 128-wide lanes AND the 3D window tiling is poor),
    while the equivalent depth-decomposed 2D convolutions reach their
    padded-lane ceiling (~1.5-2.4x faster at C<=64 full-res shapes).
    Deeper stages (C>=64 at reduced resolution) lower well as native 3D
    convs (20-35% MXU), so only the full-res stage uses this path.

    x: [N, D, H, W, Ci]; w: [kd, kh, kw, Ci, Co]; stride: (sd, sh, sw).
    Matches lax SAME padding semantics exactly (asymmetric for stride 2).
    """
    N, D, H, W, Ci = x.shape
    kd = w.shape[0]
    Co = w.shape[-1]
    sd = int(stride[0])
    out_d = -(-D // sd)  # ceil
    # XLA SAME: pad_total = max((out-1)*s + k - in, 0), split lo=total//2
    pad_total = max((out_d - 1) * sd + kd - D, 0)
    lo = pad_total // 2
    hi = pad_total - lo
    # Depth-tap extraction WITHOUT strided slices: a stride-sd slice on TPU
    # is profiled at ~15x the cost of a contiguous one (it gathers). Pad
    # the depth axis to a multiple of sd, split it into (out, sd), and
    # take contiguous slices: xp row od*sd + dz == x2[:, od + dz//sd,
    # dz%sd] (extra zero rows at the tail are never indexed).
    qmax = (kd - 1) // sd
    dp_target = max(-(-(D + lo + hi) // sd), out_d + qmax) * sd
    xp = jnp.pad(
        x, ((0, 0), (lo, dp_target - D - lo), (0, 0), (0, 0), (0, 0))
    )
    x2 = xp.reshape((N, dp_target // sd, sd, H, W, Ci))
    out = None
    for dz in range(kd):
        # output depth od reads input depth od*sd - lo + dz (xp row
        # od*sd + dz)
        q, rpar = divmod(dz, sd)
        xs = jax.lax.slice(
            x2,
            (0, q, rpar, 0, 0, 0),
            (N, q + out_d, rpar + 1, H, W, Ci),
        )
        y = jax.lax.conv_general_dilated(
            xs.reshape((N * out_d, H, W, Ci)),
            w[dz],
            tuple(int(s) for s in stride[1:]),
            "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        out = y if out is None else out + y
    return out.reshape((N, out_d) + out.shape[1:])


class Conv3D(nn.Module):
    """nn.Conv-compatible 3D convolution (same parameter shapes/names, same
    SAME-padding semantics) with an optional depth-decomposed 2D lowering
    for the shapes where XLA's native 3D conv is slow (see
    _conv3d_depth_decomposed)."""

    features: int
    kernel_size: Sequence[int]
    strides: Sequence[int] = (1, 1, 1)
    dtype: jnp.dtype = jnp.bfloat16
    decompose: bool = False
    pad_style: str = "same"

    @nn.compact
    def __call__(self, x):
        kshape = tuple(self.kernel_size) + (x.shape[-1], self.features)
        w = self.param(
            "kernel", nn.initializers.lecun_normal(), kshape, jnp.float32
        )
        b = self.param("bias", nn.initializers.zeros_init(), (self.features,),
                       jnp.float32)
        w = w.astype(self.dtype)
        x = x.astype(self.dtype)
        strided = any(int(s) > 1 for s in self.strides)
        if self.pad_style == "torch" and strided:
            # torch Conv3d(padding=k//2) geometry: symmetric padding, the
            # window anchored one voxel earlier than XLA SAME on even
            # inputs. Only strided convs differ (stride-1 odd-k is
            # identical), and they never take the decomposed path here.
            padding = tuple((int(k) // 2, int(k) // 2)
                            for k in self.kernel_size)
            y = jax.lax.conv_general_dilated(
                x, w, tuple(int(s) for s in self.strides), padding,
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            )
        elif self.decompose:
            y = _conv3d_depth_decomposed(x, w, self.strides)
        else:
            y = jax.lax.conv_general_dilated(
                x, w, tuple(int(s) for s in self.strides), "SAME",
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            )
        return y + b.astype(self.dtype)


class _InstanceNormParams(nn.Module):
    """Parameter-only stand-in for nn.GroupNorm: same scope name, same
    param names/shapes/dtypes, so checkpoints move freely between the
    fused-stats and flax paths."""

    features: int

    @nn.compact
    def __call__(self):
        scale = self.param(
            "scale", nn.initializers.ones_init(), (self.features,),
            jnp.float32,
        )
        bias = self.param(
            "bias", nn.initializers.zeros_init(), (self.features,),
            jnp.float32,
        )
        return scale, bias


def _instance_norm_stats(x):
    """Per-(sample, channel) mean/var of [N, D, H, W, C], f32.

    On TPU, shapes inside the Pallas kernel's contract take the fused
    one-pass kernel (ops/pallas_kernels.instance_norm_stats_pallas); other
    backends/shapes use the plain XLA reduction (identical fast-variance
    math, reduction-order differences only)."""
    if jax.default_backend() == "tpu":
        try:
            from deepwmh_tpu.ops.pallas_kernels import (
                instance_norm_stats_pallas,
            )

            return instance_norm_stats_pallas(x)
        except ValueError:
            pass
    xf = x.astype(jnp.float32)
    axes = tuple(range(1, x.ndim - 1))
    mean = xf.mean(axes)
    var = (xf * xf).mean(axes) - mean * mean
    return mean, var


class ConvNormAct(nn.Module):
    features: int
    kernel: Sequence[int]
    stride: Sequence[int] = (1, 1, 1)
    dtype: jnp.dtype = jnp.bfloat16
    decompose: bool = False
    pad_style: str = "same"
    fused_stats: bool = False

    @nn.compact
    def __call__(self, x):
        x = Conv3D(
            self.features,
            kernel_size=tuple(self.kernel),
            strides=tuple(self.stride),
            dtype=self.dtype,
            decompose=self.decompose,
            pad_style=self.pad_style,
            name="Conv_0",  # keep the nn.Conv-era parameter tree
        )(x)
        # instance norm == group norm with one channel per group; flax
        # computes the statistics in f32 even with bf16 compute dtype, so
        # bf16 here saves the f32 round-trip bandwidth without giving up
        # stable statistics. (A stats-on-flattened-view variant that tried
        # to steer XLA's layout choice measured exactly equal at inference
        # and 10% slower in the train step — negative result, don't retry.)
        if self.fused_stats:
            # inference-only fused path (the Pallas stats kernel defines
            # no VJP): one bf16-rate pass for the two moments, then the
            # normalize+affine folded to a single FMA XLA fuses onward.
            # Param scope/names match nn.GroupNorm exactly. MEASURED ON
            # TPU (r05): the full TTA sweep runs 2.0x SLOWER with this on
            # — the Pallas boundary's forced layout transitions cost more
            # than the convert_reduce fusions it replaces (docs/PERF.md
            # "Remaining theoretical headroom"). Kept tested, default OFF.
            scale, bias = _InstanceNormParams(
                self.features, name="GroupNorm_0"
            )()
            mean, var = _instance_norm_stats(x)
            w = scale[None, :] * jax.lax.rsqrt(var + 1e-5)  # [N, C] f32
            bc = (slice(None),) + (None,) * (x.ndim - 2) + (slice(None),)
            # (x - mean) * w + bias in f32 like flax's _normalize (the f32
            # mean promotes the expression; the convert fuses into the
            # elementwise pass, so x is still READ at bf16 rate), cast to
            # the compute dtype at the end
            x = ((x - mean[bc]) * w[bc] + bias[None, :][bc]).astype(
                self.dtype
            )
        else:
            x = nn.GroupNorm(
                num_groups=None,
                group_size=1,
                epsilon=1e-5,
                dtype=self.dtype,
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
    # rematerialize conv-block activations in the backward pass: more
    # backward FLOPs for a large cut in live activation memory. Without it
    # the nnU-Net-recipe batch-2 training step at the flagship plan
    # (128x160x128 patches) fails to COMPILE on a 16GB v5e; with it both
    # batch sizes fit. Training turns it on; inference (no backward) has
    # nothing to rematerialize, so the flag is free there. Remat is
    # SELECTIVE: only stages 0-1 (full and half resolution) hold
    # activations big enough to matter (hundreds of MB per block vs tens
    # at stage 2+), so deeper blocks skip the recompute entirely.
    remat: bool = False
    remat_max_stage: int = 1
    # lower the full-resolution convs (stage 0 + the first downsample) as
    # depth-decomposed 2D convolutions — exact same math, measured 1.4-2.4x
    # faster on TPU where XLA's 3D conv lowering is weakest (see Conv3D)
    decompose_fullres: bool = True
    # fuse the instance-norm statistics into one Pallas bf16-rate pass
    # (ConvNormAct fused path). INFERENCE ONLY — the stats kernel defines
    # no VJP, so training keeps the flax GroupNorm. Identical parameter
    # tree either way (checkpoints interchange freely).
    fused_stats: bool = False

    @nn.compact
    def __call__(self, x, deep_supervision: bool = False):
        plan = self.plan
        feats = features_per_stage(plan)
        P = plan.num_pools
        x = x.astype(self.dtype)
        # explicit names keep the parameter tree IDENTICAL between the
        # remat and plain variants (nn.remat changes auto-generated scope
        # names), so trained checkpoints load into inference models freely
        rematted = nn.remat(ConvNormAct)
        n_blocks = 0

        pad_style = getattr(plan, "pad_style", "same")

        def Conv(f, k, s, dt, decompose=False, stage=0):
            nonlocal n_blocks
            blk = (
                rematted
                if self.remat and stage <= self.remat_max_stage
                else ConvNormAct
            )
            m = blk(f, k, s, dt, decompose and self.decompose_fullres,
                    pad_style, self.fused_stats,
                    name="ConvNormAct_%d" % n_blocks)
            n_blocks += 1
            return m

        skips = []
        # encoder
        for i in range(P + 1):
            stride = plan.pool_kernels[i - 1] if i > 0 else (1, 1, 1)
            # convs whose INPUT sits at full resolution: stage 0's two and
            # the stride conv entering stage 1
            x = Conv(feats[i], plan.conv_kernels[i], stride, self.dtype,
                     decompose=i <= 1, stage=i)(x)
            x = Conv(feats[i], plan.conv_kernels[i], (1, 1, 1), self.dtype,
                     decompose=i == 0, stage=i)(x)
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
            x = Conv(feats[i], plan.conv_kernels[i], (1, 1, 1), self.dtype,
                     decompose=i == 0, stage=i)(x)
            x = Conv(feats[i], plan.conv_kernels[i], (1, 1, 1), self.dtype,
                     decompose=i == 0, stage=i)(x)
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
