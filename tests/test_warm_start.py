"""SVF warm start (registration/warm.py): composition math + quality floor.

The warm path seeds a pair's deformable stage from the composition of the
anchor row and source->anchor pairs and refines on a shortened schedule.
Two things must hold:

1. compose_pair_displacement implements the transform algebra exactly: the
   pair convention  mat_it o (x + d(x))  must land where the brute-force
   two-step composition  T_{i,0} o T_{0,t}  lands. Checked analytically
   with LINEAR displacement fields (trilinear sampling of a linear field
   is exact, so the identity holds to float tolerance).

2. The warm pair's end-to-end label-propagation quality matches the cold
   svf path on the SAME (source, target) anatomy pair — the non-circular
   benchmark of registration/quality.py, now with a third anchor anatomy
   in the loop. Equal floors: warm start must not be a quality trade.
"""

import json

import jax.numpy as jnp
import numpy as np
import pytest

from deepwmh_tpu.registration.warm import (
    compose_pair_displacement,
    warm_schedule,
)


def _rand_affine(rng, scale=0.05, shift=2.0):
    A = np.eye(3) + rng.uniform(-scale, scale, (3, 3))
    b = rng.uniform(-shift, shift, 3)
    return np.concatenate([A, b[:, None]], axis=1).astype(np.float32)


def _linear_field(rng, shape, scale=0.02, const=0.5):
    """d(x) = B x + c per channel — exactly representable by trilinear
    interpolation, so sample_channels introduces no approximation error."""
    from deepwmh_tpu.ops.warp import identity_grid

    B = rng.uniform(-scale, scale, (3, 3)).astype(np.float32)
    c = rng.uniform(-const, const, 3).astype(np.float32)
    g = np.asarray(identity_grid(shape))
    return np.einsum("ij,j...->i...", B, g) + c[:, None, None, None]


def test_composed_displacement_matches_bruteforce():
    rng = np.random.RandomState(0)
    t_shape, s0_shape = (8, 9, 10), (11, 8, 9)
    sp_t = np.array([1.0, 1.2, 0.8], np.float32)
    sp_s0 = np.array([0.9, 1.0, 1.1], np.float32)
    d0t = _linear_field(rng, t_shape)
    di0 = _linear_field(rng, s0_shape)
    mat0t = _rand_affine(rng)
    mati0 = _rand_affine(rng)
    mat_it = _rand_affine(rng)

    d = np.asarray(compose_pair_displacement(
        jnp.asarray(d0t), jnp.asarray(di0),
        jnp.asarray(mat0t), jnp.asarray(mati0), jnp.asarray(mat_it),
        sp_t, sp_s0, t_shape,
    ))

    # brute force at every voxel, in numpy
    from deepwmh_tpu.ops.warp import identity_grid

    x = np.asarray(identity_grid(t_shape)).reshape(3, -1)
    # step 1: t -> s0
    p = (x + d0t.reshape(3, -1)) * sp_t[:, None]
    y = (mat0t[:, :3] @ p + mat0t[:, 3:]) / sp_s0[:, None]
    # step 2: sample the LINEAR di0 analytically at y (exact)
    Bc = np.zeros((3, 3), np.float32)
    # reconstruct di0's linear form from three probes (it is exactly linear)
    base = np.array([di0[c][0, 0, 0] for c in range(3)])
    for ax in range(3):
        idx = [0, 0, 0]
        idx[ax] = 1
        Bc[:, ax] = np.array(
            [di0[c][tuple(idx)] for c in range(3)]
        ) - base
    di0_at_y = Bc @ y + base[:, None]
    q = (y + di0_at_y) * sp_s0[:, None]
    r = mati0[:, :3] @ q + mati0[:, 3:]
    # where the pair convention with (mat_it, d) lands
    p2 = (x + d.reshape(3, -1)) * sp_t[:, None]
    r2 = mat_it[:, :3] @ p2 + mat_it[:, 3:]

    # interior voxels only: y can fall outside the tiny s0 grid where the
    # gather clamps/zeros — the real pipeline's fields vanish at the border
    inside = np.all((y >= 0) & (y <= np.array(s0_shape)[:, None] - 1), axis=0)
    assert inside.mean() > 0.3, "test geometry pushed everything off-grid"
    err = np.abs(r - r2)[:, inside]
    assert err.max() < 1e-2, err.max()


def test_warm_schedule_shortens_with_floor():
    from deepwmh_tpu.registration.svf import SVFConfig

    cfg = SVFConfig(shrinks=(8, 4), iters=(200, 160), exact_polish_iters=30)
    w = warm_schedule(cfg)
    assert w.iters == (80, 64)
    assert w.shrinks == cfg.shrinks
    assert w.exact_polish_iters == cfg.exact_polish_iters
    tiny = SVFConfig(shrinks=(8,), iters=(30,))
    assert warm_schedule(tiny).iters == (20,)  # floor


@pytest.mark.slow
def test_warm_label_propagation_quality_floor(tmp_path):
    from deepwmh_tpu.registration.quality import label_propagation_quality

    # same shape + floor as the cold svf gate (test_registration_quality.py)
    q = label_propagation_quality(str(tmp_path), mode="warm", shape=(32, 40, 32))
    print(json.dumps(q))
    assert q["unregistered_dice"] < 0.75, q
    assert q["mean_fg_dice"] >= 0.75, q
    assert q["mean_fg_dice"] > q["unregistered_dice"] + 0.10, q
    assert q["brain_dice"] > 0.9, q


@pytest.mark.slow
def test_warm_artifacts_and_resume(tmp_path):
    """2 sources x 2 targets through warm_start: every contract pair's
    artifact set completes (pair_complete), and a re-launch skips all work
    (idempotency — the CLAUDE.md resume contract)."""
    import os

    from deepwmh_tpu.core import nifti
    from deepwmh_tpu.eval.phantom import make_subject
    from deepwmh_tpu.registration.group import GroupRegistration

    shape = (24, 28, 24)
    hdr = nifti.NiftiHeader()
    hdr.set_shape(shape)
    hdr.set_zooms((2.0, 2.0, 2.0))
    paths = {}
    for i, name in enumerate(["S0", "S1", "T0", "T1"]):
        sub = make_subject(shape, seed=40 + i, lesion=False)
        p = os.path.join(str(tmp_path), name + ".nii.gz")
        nifti.save_nifti(sub["flair"].astype(np.float32), hdr, p)
        paths[name] = p

    srcs = [("S0", paths["S0"]), ("S1", paths["S1"])]
    tgts = [("T0", paths["T0"]), ("T1", paths["T1"])]
    out = os.path.join(str(tmp_path), "reg")
    reg = GroupRegistration(srcs, tgts, out, keep_deformation=True,
                            quick=True, warm_start=True)
    reg.launch(verbose=False)
    for s, _ in srcs:
        for t, _ in tgts:
            assert reg.pair_complete(s, t), (s, t)

    # resume: nothing left to do (and it must not crash re-probing)
    reg2 = GroupRegistration(srcs, tgts, out, keep_deformation=True,
                             quick=True, warm_start=True)
    reg2.launch(verbose=False)
