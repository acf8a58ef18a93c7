"""Gaussian negative-log-likelihood anomaly scoring.

The core of stage-1 pseudo-label generation (reference:
deepwmh/analysis/lesion_analysis.py:84-113). Given a target volume and a
stacked [K, D, H, W] cohort of registered healthy reference volumes, fit a
per-voxel Gaussian over the cohort and score the target by its NLL:

    anomaly = (x - mu)^2 / (2 sigma^2) + log(sigma * 2.506)

with sigma clamped from below, NaNs zeroed, and an optional one-sided
intensity prior ('+' keeps only hyper-intense anomalies, '-' hypo-intense).
The whole thing is one fused XLA program over the cohort stack.
"""

from __future__ import annotations

import jax.numpy as jnp

from deepwmh_tpu.ops.histogram import otsu_threshold
from deepwmh_tpu.ops.stats import group_mean, group_std

SQRT_2PI = 2.506  # the reference hard-codes sqrt(2*pi) ~= 2.506


def nll(x_prime, x_refs, min_std=None, side=None, return_all=False, use_mask=False):
    """Voxelwise Gaussian NLL of `x_prime` under the cohort `x_refs` [K,...].

    Mirrors reference lesion_analysis.py:84-113. `side` in {None,'+','-'}
    applies the one-sided intensity prior; `use_mask` estimates cohort
    moments only over each reference's Otsu-foreground.
    """
    assert side in (None, "+", "-")
    if use_mask:
        thr = jnp.stack([otsu_threshold(x_refs[i]) for i in range(x_refs.shape[0])])
        masks = (x_refs > thr.reshape((-1,) + (1,) * (x_refs.ndim - 1))).astype(
            jnp.float32
        )
        mu = group_mean(x_refs, masks=masks)
        sigma = group_std(x_refs, masks=masks)
    else:
        mu = group_mean(x_refs)
        sigma = group_std(x_refs)

    if min_std is None:
        sigma = sigma + 1e-6
    else:
        sigma = jnp.where(sigma < min_std, min_std, sigma)

    anomaly = jnp.square(x_prime - mu) / (2.0 * jnp.square(sigma)) + jnp.log(
        sigma * SQRT_2PI
    )
    anomaly = jnp.nan_to_num(anomaly, nan=0.0)
    if side == "+":
        anomaly = anomaly * (x_prime > mu).astype(jnp.float32)
    elif side == "-":
        anomaly = anomaly * (x_prime < mu).astype(jnp.float32)
    if return_all:
        return anomaly, mu, sigma
    return anomaly
