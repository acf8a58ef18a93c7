"""Vectorized piecewise-linear colormaps for previews.

Rebuild of deepwmh/utilities/colormaps.py:32-185 (the reference evaluates
its maps per pixel in Python; here a map is a [N,4] stop table interpolated
over a whole slice at once)."""

from __future__ import annotations

import numpy as np

# stop tables: (position 0..1, r, g, b) with channels 0..1
_MAPS = {
    "grayscale": [(0, 0, 0, 0), (1, 1, 1, 1)],
    "red": [(0, 0, 0, 0), (1, 1, 0, 0)],
    "green": [(0, 0, 0, 0), (1, 0, 1, 0)],
    "blue": [(0, 0, 0, 0), (1, 0, 0, 1)],
    "hot": [(0, 0, 0, 0), (0.4, 1, 0, 0), (0.8, 1, 1, 0), (1, 1, 1, 1)],
    "cold": [(0, 0, 0, 0), (0.4, 0, 0, 1), (0.8, 0, 1, 1), (1, 1, 1, 1)],
    "jet": [
        (0, 0, 0, 0.5), (0.125, 0, 0, 1), (0.375, 0, 1, 1),
        (0.625, 1, 1, 0), (0.875, 1, 0, 0), (1, 0.5, 0, 0),
    ],
    "spring": [(0, 1, 0, 1), (1, 1, 1, 0)],
    "summer": [(0, 0, 0.5, 0.4), (1, 1, 1, 0.4)],
    "autumn": [(0, 1, 0, 0), (1, 1, 1, 0)],
    "winter": [(0, 0, 0, 1), (1, 0, 1, 0.5)],
}


def list_colormaps():
    return sorted(_MAPS.keys())


def apply_colormap(values, name: str = "grayscale"):
    """values in [0,1] (any shape) -> uint8 RGB array shaped values.shape+(3,)."""
    if name not in _MAPS:
        raise ValueError("unknown colormap %r (have: %s)" % (name, list_colormaps()))
    stops = np.array(_MAPS[name], np.float64)
    pos, rgb = stops[:, 0], stops[:, 1:]
    v = np.clip(np.asarray(values, np.float64), 0, 1)
    out = np.empty(v.shape + (3,), np.float64)
    for c in range(3):
        out[..., c] = np.interp(v, pos, rgb[:, c])
    return (out * 255).astype(np.uint8)
