import numpy as np
import jax.numpy as jnp

from deepwmh_tpu.ops.warp import affine_warp
from deepwmh_tpu.registration.affine import (
    AffineConfig,
    apply_affine,
    invert_affine,
    register_affine,
)
from deepwmh_tpu.registration.similarity import (
    lncc,
    mutual_information,
    winsorize_rescale,
)
from deepwmh_tpu.registration.svf import SVFConfig, register_svf


def make_brain(shape=(32, 32, 32), seed=0):
    rng = np.random.RandomState(seed)
    g = np.meshgrid(*[np.linspace(-1, 1, s) for s in shape], indexing="ij")
    r = np.sqrt(sum(a**2 for a in g))
    vol = np.where(r < 0.7, 200.0, 0.0) + np.where(r < 0.4, 100.0, 0.0)
    vol += 10 * rng.rand(*shape)
    # off-center bright structure to break rotational symmetry
    vol[8:14, 18:26, 10:18] += 150
    vol[20:24, 6:12, 20:26] += 120
    return vol.astype(np.float32)


def test_mi_prefers_aligned(rng):
    a = jnp.asarray(winsorize_rescale(jnp.asarray(make_brain())))
    shifted = np.roll(np.asarray(a), 5, axis=0)
    mi_self = float(mutual_information(a, a))
    mi_shift = float(mutual_information(a, jnp.asarray(shifted)))
    assert mi_self > mi_shift


def test_lncc_prefers_aligned(rng):
    a = jnp.asarray(winsorize_rescale(jnp.asarray(make_brain())))
    shifted = jnp.asarray(np.roll(np.asarray(a), 4, axis=1))
    assert float(lncc(a, a)) > float(lncc(a, shifted))
    assert float(lncc(a, a)) > 0.95


def test_affine_recovers_translation():
    fixed = make_brain()
    # moving = fixed shifted by 3 voxels along axis 0 (content moved +3)
    mat = np.eye(3, 4, dtype=np.float32)
    mat[0, 3] = -3.0
    moving = np.asarray(affine_warp(jnp.asarray(fixed), mat))
    cfg = AffineConfig(shrinks=(2,), iters=(120,), do_affine=False)
    got, loss = register_affine(fixed, moving, cfg=cfg)
    # moving(o) = fixed(o-3): moving content sits at +3, so the fixed->moving
    # map is x -> x+3
    assert abs(got[0, 3] - 3.0) < 1.0, got
    assert abs(got[1, 3]) < 1.0 and abs(got[2, 3]) < 1.0
    warped = np.asarray(
        apply_affine(moving, got, fixed.shape, (1, 1, 1), (1, 1, 1))
    )
    cc_before = np.corrcoef(fixed.ravel(), moving.ravel())[0, 1]
    cc_after = np.corrcoef(fixed.ravel(), warped.ravel())[0, 1]
    assert cc_after > cc_before
    assert cc_after > 0.95


def test_affine_recovers_rotation():
    from deepwmh_tpu.ops.warp import rotation_matrix

    fixed = make_brain()
    R = np.asarray(rotation_matrix(jnp.array([0.0, 0.0, 0.15])))
    mat = np.concatenate([R, np.zeros((3, 1), np.float32)], axis=1)
    c = np.array([15.5, 15.5, 15.5], np.float32)
    moving = np.asarray(affine_warp(jnp.asarray(fixed), mat, center=c))
    cfg = AffineConfig(shrinks=(2, 1), iters=(120, 60))
    got, _ = register_affine(fixed, moving, cfg=cfg)
    warped = np.asarray(apply_affine(moving, got, fixed.shape, (1, 1, 1), (1, 1, 1)))
    mask = fixed > 50
    cc_before = np.corrcoef(fixed[mask], moving[mask])[0, 1]
    cc_after = np.corrcoef(fixed[mask], warped[mask])[0, 1]
    assert cc_after > cc_before
    assert cc_after > 0.9


def test_invert_affine():
    m = np.eye(3, 4)
    m[:, 3] = [1, 2, 3]
    inv = invert_affine(m)
    np.testing.assert_allclose(inv[:, 3], [-1, -2, -3], atol=1e-6)


def test_svf_improves_alignment():
    from deepwmh_tpu.ops.warp import displacement_warp

    fixed = make_brain()
    # smooth synthetic deformation
    zz = np.linspace(0, np.pi, 32)
    bump = 2.0 * np.sin(zz)[:, None, None] * np.ones((32, 32, 32))
    disp_true = np.stack([bump, 0.5 * bump, np.zeros_like(bump)]).astype(np.float32)
    moving = np.asarray(displacement_warp(jnp.asarray(fixed), jnp.asarray(disp_true)))

    cfg = SVFConfig(shrinks=(2,), iters=(80,), lncc_radius=2)
    disp, loss = register_svf(fixed, moving, cfg=cfg)
    assert disp.shape == (3, 32, 32, 32)
    warped = np.asarray(displacement_warp(jnp.asarray(moving), jnp.asarray(disp)))
    mask = fixed > 50
    cc_before = np.corrcoef(fixed[mask], moving[mask])[0, 1]
    cc_after = np.corrcoef(fixed[mask], warped[mask])[0, 1]
    assert cc_after > cc_before


def test_svf_approx_exp_grad_matches_exact():
    """The first-order pass-through VJP (SVFConfig.exact_exp_grad=False,
    which kills the backward scatter-adds on TPU) must register as well as
    exact autodiff through the squaring compositions."""
    from deepwmh_tpu.ops.warp import displacement_warp

    fixed = make_brain()
    zz = np.linspace(0, np.pi, 32)
    bump = 2.0 * np.sin(zz)[:, None, None] * np.ones((32, 32, 32))
    disp_true = np.stack([bump, 0.5 * bump, np.zeros_like(bump)]).astype(np.float32)
    moving = np.asarray(displacement_warp(jnp.asarray(fixed), jnp.asarray(disp_true)))

    mask = fixed > 50
    ccs = {}
    for exact in (True, False):
        cfg = SVFConfig(
            shrinks=(2,), iters=(80,), lncc_radius=2, exact_exp_grad=exact
        )
        disp, _ = register_svf(fixed, moving, cfg=cfg)
        warped = np.asarray(displacement_warp(jnp.asarray(moving), jnp.asarray(disp)))
        ccs[exact] = np.corrcoef(fixed[mask], warped[mask])[0, 1]
    cc_before = np.corrcoef(fixed[mask], moving[mask])[0, 1]
    assert ccs[False] > cc_before
    # within a hair of the exact-gradient result
    assert ccs[False] > ccs[True] - 0.02, ccs


def test_svf_exact_polish_schedule():
    """exact_polish_iters: approx-grad bulk + exact final iterations (the
    large-deformation presets' schedule — measured at bench shape: field
    RMSE 0.836 vs all-exact 0.830 vs all-approx 0.949 on a 19.5-vox
    deformation). Here: it must register at least as well as all-approx
    with the same total budget, and stay within a hair of all-exact."""
    from deepwmh_tpu.ops.warp import displacement_warp

    fixed = make_brain()
    zz = np.linspace(0, np.pi, 32)
    bump = 2.0 * np.sin(zz)[:, None, None] * np.ones((32, 32, 32))
    disp_true = np.stack([bump, 0.5 * bump, np.zeros_like(bump)]).astype(np.float32)
    moving = np.asarray(displacement_warp(jnp.asarray(fixed), jnp.asarray(disp_true)))

    mask = fixed > 50
    ccs = {}
    for name, kw in {
        "exact": dict(exact_exp_grad=True),
        "polish": dict(exact_exp_grad=False, exact_polish_iters=20),
    }.items():
        cfg = SVFConfig(shrinks=(2,), iters=(80,), lncc_radius=2, **kw)
        disp, _ = register_svf(fixed, moving, cfg=cfg)
        warped = np.asarray(
            displacement_warp(jnp.asarray(moving), jnp.asarray(disp))
        )
        ccs[name] = np.corrcoef(fixed[mask], warped[mask])[0, 1]
    cc_before = np.corrcoef(fixed[mask], moving[mask])[0, 1]
    assert ccs["polish"] > cc_before
    assert ccs["polish"] > ccs["exact"] - 0.02, ccs
    # polish budget larger than the level cap is clamped, not an error
    cfg = SVFConfig(shrinks=(2,), iters=(10,), lncc_radius=2,
                    exact_polish_iters=99)
    disp, _ = register_svf(fixed, moving, cfg=cfg)
    assert disp.shape == (3, 32, 32, 32)


def test_apply_affine_svf_identity():
    from deepwmh_tpu.registration.svf import apply_affine_svf

    vol = make_brain()
    eye = np.eye(3, 4, dtype=np.float32)
    disp = np.zeros((3, 32, 32, 32), np.float32)
    out = np.asarray(
        apply_affine_svf(vol, eye, disp, (32, 32, 32), (1, 1, 1), (1, 1, 1))
    )
    np.testing.assert_allclose(out, vol, atol=1e-4)


def test_batched_affine_matches_single():
    from deepwmh_tpu.registration.affine import register_affine_batch

    fixed = make_brain()
    mats_shift = []
    movings = []
    for shift in (-2.0, 3.0):
        mat = np.eye(3, 4, dtype=np.float32)
        mat[0, 3] = -shift
        movings.append(np.asarray(affine_warp(jnp.asarray(fixed), mat)))
        mats_shift.append(shift)
    cfg = AffineConfig(shrinks=(2,), iters=(120,), do_affine=False)
    mats, losses = register_affine_batch(
        np.stack([fixed, fixed]), np.stack(movings), cfg=cfg
    )
    assert mats.shape == (2, 3, 4)
    for i, shift in enumerate(mats_shift):
        assert abs(mats[i, 0, 3] - shift) < 1.0, (i, mats[i, 0, 3], shift)


def test_batched_svf_shapes():
    from deepwmh_tpu.ops.warp import displacement_warp
    from deepwmh_tpu.registration.svf import register_svf_batch

    fixed = make_brain()
    zz = np.linspace(0, np.pi, 32)
    bump = 1.5 * np.sin(zz)[:, None, None] * np.ones((32, 32, 32))
    disp_true = np.stack([bump, np.zeros_like(bump), np.zeros_like(bump)])
    moving = np.asarray(
        displacement_warp(jnp.asarray(fixed), jnp.asarray(disp_true.astype(np.float32)))
    )
    cfg = SVFConfig(shrinks=(2,), iters=(60,), lncc_radius=2)
    disps, losses = register_svf_batch(
        np.stack([fixed, fixed]), np.stack([moving, moving]), cfg=cfg
    )
    assert disps.shape == (2, 3, 32, 32, 32)
    np.testing.assert_allclose(disps[0], disps[1], atol=1e-4)
    warped = np.asarray(
        displacement_warp(jnp.asarray(moving), jnp.asarray(disps[0]))
    )
    m = fixed > 50
    cc_b = np.corrcoef(fixed[m], moving[m])[0, 1]
    cc_a = np.corrcoef(fixed[m], warped[m])[0, 1]
    assert cc_a > cc_b


def test_group_registration_batched_launch(tmp_path):
    from deepwmh_tpu.core import nifti
    from deepwmh_tpu.registration.group import GroupRegistration

    hdr = nifti.NiftiHeader()
    hdr.set_shape((32, 32, 32))
    base = make_brain()
    paths = {}
    for name, shift in (("S0", 0), ("T0", 1), ("T1", -1)):
        p = str(tmp_path / (name + ".nii.gz"))
        nifti.save_nifti(np.roll(base, shift, axis=0), hdr, p)
        paths[name] = p
    out = str(tmp_path / "reg")
    reg = GroupRegistration(
        [("S0", paths["S0"])],
        [("T0", paths["T0"]), ("T1", paths["T1"])],
        out,
        quick=True,
    )
    reg.launch(batch_pairs=2, verbose=False)
    for t in ("T0", "T1"):
        assert nifti.try_load_nifti(str(tmp_path / "reg" / ("S0_to_%s.nii.gz" % t)))
        assert nifti.try_load_nifti(str(tmp_path / "reg" / ("S0_to_%s" % t) / "warp.nii.gz"))
    # alignment improved
    warped = nifti.load_nifti_simple(str(tmp_path / "reg" / "S0_to_T0.nii.gz"))
    tgt = nifti.load_nifti_simple(paths["T0"])
    src = nifti.load_nifti_simple(paths["S0"])
    m = tgt > 50
    assert np.corrcoef(warped[m], tgt[m])[0, 1] > np.corrcoef(src[m], tgt[m])[0, 1]
    # rerun skips everything (idempotent even in batched mode)
    reg.launch(batch_pairs=2, verbose=False)


def test_group_registration_composed_quick_large(tmp_path):
    """quick + large_deformation COMPOSE (the reference's emitted training
    config, deepwmh/main/train.py:215 + ANTs_group_registration.py:191-201):
    large-deformation capacity on the quick (finest-level-dropped) pyramid."""
    from deepwmh_tpu.registration.group import GroupRegistration

    def mk(**kw):
        return GroupRegistration([], [], str(tmp_path / "o"), **kw)

    quick = mk(quick=True)
    large = mk(large_deformation=True)
    both = mk(quick=True, large_deformation=True)

    # quick pyramid: finest level dropped relative to large-deformation
    assert both.svf_cfg.shrinks == quick.svf_cfg.shrinks
    assert len(both.svf_cfg.shrinks) < len(large.svf_cfg.shrinks)
    # large-deformation capacity: budget above quick, integration accuracy
    # and the exact-polish gradient schedule from the large-deformation
    # preset (approx-grad bulk + exact final iterations per level)
    assert sum(both.svf_cfg.iters) > sum(quick.svf_cfg.iters)
    assert both.svf_cfg.n_squaring == large.svf_cfg.n_squaring
    assert both.svf_cfg.exact_polish_iters == large.svf_cfg.exact_polish_iters
    assert both.svf_cfg.exact_polish_iters > 0
    assert quick.svf_cfg.exact_polish_iters == 0
    assert sum(both.affine_cfg.iters) > sum(quick.affine_cfg.iters)
