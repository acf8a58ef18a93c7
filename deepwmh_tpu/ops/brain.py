"""Brain extraction (ROBEX replacement) as dense on-device morphology.

The reference masks segmentations with ROBEX's C++ brain extractor
(deepwmh/main/predict.py:37-48,166-181, env ROBEX_DIR at
integrity_check.py:102-122). Its role in the pipeline is FOV filtering —
remove false positives outside brain tissue — so a robust intensity +
morphology extractor is sufficient and runs in milliseconds on TPU:

  Otsu foreground -> largest 3D component -> morphological closing
  -> interior hole fill (border flood-fill via connected components).

All stages reuse the ops/components labeling machinery, so the entire mask
is one XLA program chain with no host round trips.
"""

from __future__ import annotations

import math

import jax.numpy as jnp

from deepwmh_tpu.ops.components import label_components
from deepwmh_tpu.ops.histogram import otsu_threshold
from deepwmh_tpu.ops.morphology import binary_dilation_3d, binary_erosion_3d


def fill_holes(mask):
    """Fill interior cavities: background components not touching the volume
    border become foreground."""
    m = mask > 0.5
    bg = ~m
    N = int(m.size)
    lbl = label_components(bg)
    flat = lbl.reshape(-1)

    border = jnp.zeros(m.shape, jnp.float32)
    border = border.at[0].set(1.0).at[-1].set(1.0)
    border = border.at[:, 0].set(1.0).at[:, -1].set(1.0)
    border = border.at[:, :, 0].set(1.0).at[:, :, -1].set(1.0)

    # flag[root] = 1 if any voxel of the component touches the border
    flags = jnp.zeros((N + 1,), jnp.float32).at[flat].max(border.reshape(-1))
    outside = (flags[jnp.minimum(flat, N)] > 0.5).reshape(m.shape) & bg
    return (m | (bg & ~outside)).astype(jnp.float32)


def brain_extract(data, spacing=(1.0, 1.0, 1.0), closing_mm: float = 4.0):
    """Binary brain mask for a FLAIR/T1 head volume.

    spacing: static voxel size in mm (sets the closing radius in voxels).
    """
    data = jnp.asarray(data, jnp.float32)
    thr = otsu_threshold(data)
    m = (data > thr).astype(jnp.float32)

    # largest 3D component (6-connectivity); imported lazily — components
    # imports morphology, which this module also feeds
    from deepwmh_tpu.ops.components import largest_component

    m = largest_component(m)

    # closing: bridge sulci/ventricle gaps
    it = max(int(math.ceil(closing_mm / float(min(spacing)))), 1)
    m = binary_dilation_3d(m, iterations=it)
    m = binary_erosion_3d(m, iterations=it)

    m = fill_holes(m)
    return m
