"""On-device training augmentations, fused into the train step.

The nnU-Net fork's batchgenerators pipeline (rotation, scaling, noise, blur,
brightness, contrast, gamma, mirroring) runs in host worker processes; here
the same family of augmentations is expressed as pure JAX on the device so
it fuses into the compiled train step — on TPU the host (often 1 core per
chip in this deployment) is far too slow to feed augmented patches.

Also implements the reference's explicit mixed-cohort "noise=0.1"
augmentation: additive Gaussian noise scaled by the 5-95 percentile range
(deepwmh/pipeline/DCNN_multistage.py:24-37,676).

All random draws come from a threaded jax.random key; each augmentation
applies with its nnU-Net default probability.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from deepwmh_tpu.ops.warp import affine_warp, rotation_matrix


@dataclass(frozen=True)
class AugmentConfig:
    p_rotscale: float = 0.2
    rot_max_rad: float = 0.5236  # 30 degrees
    scale_range: tuple = (0.7, 1.4)
    p_noise: float = 0.1
    noise_std_max: float = 0.1
    p_brightness: float = 0.15
    brightness_range: tuple = (0.7, 1.3)
    p_contrast: float = 0.15
    contrast_range: tuple = (0.65, 1.5)
    p_gamma: float = 0.3
    gamma_range: tuple = (0.7, 1.5)
    p_mirror: float = 0.5  # per axis


def _maybe(key, p):
    return jax.random.uniform(key) < p


def augment_sample(key, image, label, cfg: AugmentConfig = AugmentConfig()):
    """image: [D,H,W] float32 (z-scored), label: [D,H,W] int. Returns the
    augmented pair. Fully traceable. Intensity branches always execute and
    select; the expensive spatial warp runs under lax.cond so it is SKIPPED
    at runtime when the (single, scalar) coin says no — wrapping this in
    vmap batches the predicate and silently re-executes the warp for every
    sample, so keep per-sample dispatch (see augment_samples below)."""
    keys = jax.random.split(key, 13)
    shape = image.shape
    center = jnp.array([(s - 1) / 2.0 for s in shape], jnp.float32)

    # --- spatial: rotation + scaling about the patch center -------------
    angles = jax.random.uniform(
        keys[0], (3,), minval=-cfg.rot_max_rad, maxval=cfg.rot_max_rad
    )
    scale = jax.random.uniform(
        keys[1], (), minval=cfg.scale_range[0], maxval=cfg.scale_range[1]
    )
    # pull-back matrix: output coord -> input coord = R^-1 / scale
    R = rotation_matrix(angles)
    A = R.T / scale
    mat = jnp.concatenate([A, jnp.zeros((3, 1), jnp.float32)], axis=1)
    do_spatial = _maybe(keys[2], cfg.p_rotscale)

    # The warp is the single most expensive op in the train step (8
    # trilinear-corner gathers + a nearest gather, ~640 ms/step profiled
    # on a v5e at the flagship patch size) while p_rotscale=0.2 means 80%
    # of samples discard it. A where() would execute both branches every
    # step; lax.cond at this (unvmapped) level lowers to a true runtime
    # HLO conditional, so the untaken branch costs nothing. augment_batch
    # therefore loops samples in Python instead of vmapping (vmap would
    # turn the cond back into a select).
    def _spatial(args):
        img, lbl = args
        return (
            affine_warp(img, mat, order=1, center=center),
            affine_warp(lbl.astype(jnp.float32), mat, order=0, center=center),
        )

    def _identity(args):
        img, lbl = args
        return img, lbl.astype(jnp.float32)

    image, label = jax.lax.cond(
        do_spatial, _spatial, _identity, (image, label)
    )

    # --- gaussian noise ---------------------------------------------------
    std = jax.random.uniform(keys[3], (), minval=0.0, maxval=cfg.noise_std_max)
    noise = jax.random.normal(keys[4], shape) * std
    image = jnp.where(_maybe(keys[5], cfg.p_noise), image + noise, image)

    # --- brightness (multiplicative) --------------------------------------
    b = jax.random.uniform(
        keys[6], (), minval=cfg.brightness_range[0], maxval=cfg.brightness_range[1]
    )
    image = jnp.where(_maybe(keys[7], cfg.p_brightness), image * b, image)

    # --- contrast (scale about mean, preserve range) -----------------------
    # nnU-Net's ContrastAugmentationTransform defaults to preserve_range=True:
    # the adjusted image is clamped back to the pre-transform [min, max]
    c = jax.random.uniform(
        keys[8], (), minval=cfg.contrast_range[0], maxval=cfg.contrast_range[1]
    )
    mn = image.mean()
    pre_lo, pre_hi = image.min(), image.max()
    contrasted = jnp.clip((image - mn) * c + mn, pre_lo, pre_hi)
    image = jnp.where(_maybe(keys[9], cfg.p_contrast), contrasted, image)

    # --- gamma (on min-max normalized intensities) --------------------------
    g = jax.random.uniform(
        keys[10], (), minval=cfg.gamma_range[0], maxval=cfg.gamma_range[1]
    )
    lo, hi = image.min(), image.max()
    rng_ = jnp.maximum(hi - lo, 1e-7)
    gamma_img = jnp.power((image - lo) / rng_, g) * rng_ + lo
    image = jnp.where(_maybe(keys[11], cfg.p_gamma), gamma_img, image)

    # --- mirroring ---------------------------------------------------------
    mkeys = jax.random.split(keys[12], 3)
    for ax in range(3):
        flip = _maybe(mkeys[ax], cfg.p_mirror)
        image = jnp.where(flip, jnp.flip(image, ax), image)
        label = jnp.where(flip, jnp.flip(label, ax), label)

    return image, label.astype(jnp.int32)


def augment_samples(keys, images, labels, cfg: AugmentConfig = AugmentConfig()):
    """Per-sample augmentation over [N,D,H,W] with per-sample keys [N,...].

    A Python loop rather than vmap so the expensive-warp lax.cond inside
    augment_sample stays a runtime conditional (vmap lowers cond to
    select, executing the warp for every sample every step). Training
    batches are tiny (nnU-Net recipe: 2), so the unrolled program is
    small. Per-sample results are bit-identical to the former vmap form —
    the key split and draw order are unchanged."""
    outs = [
        augment_sample(keys[i], images[i], labels[i], cfg)
        for i in range(images.shape[0])
    ]
    return (
        jnp.stack([o[0] for o in outs]),
        jnp.stack([o[1] for o in outs]),
    )


def augment_batch(key, images, labels, cfg: AugmentConfig = AugmentConfig()):
    """Split one key into per-sample keys and augment (see augment_samples).

    Under a dp mesh use Trainer's shard_map route instead: indexing a
    dp-sharded batch from this host-level loop would serialize the work
    onto one device at a time."""
    keys = jax.random.split(key, images.shape[0])
    return augment_samples(keys, images, labels, cfg)


def percentile_noise(key, image, scale: float = 0.1):
    """The reference's mixed-cohort augmentation: additive N(0, scale*(q95-q5))
    (DCNN_multistage.py:29-34)."""
    q5 = jnp.percentile(image, 5)
    q95 = jnp.percentile(image, 95)
    return image + jax.random.normal(key, image.shape) * (scale * (q95 - q5))
