import numpy as np
import jax.numpy as jnp

from deepwmh_tpu.ops.warp import displacement_warp
from deepwmh_tpu.registration.learned import LearnedRegConfig, LearnedRegistration


def make_cohort(n=4, shape=(16, 16, 16), seed=0):
    """Same anatomy with smooth per-subject deformations."""
    rng = np.random.RandomState(seed)
    g = np.meshgrid(*[np.linspace(-1, 1, s) for s in shape], indexing="ij")
    r = np.sqrt(sum(a**2 for a in g))
    base = np.where(r < 0.7, 200.0, 0.0) + np.where(r < 0.35, 120.0, 0.0)
    base[3:6, 8:12, 4:8] += 150
    vols = []
    for i in range(n):
        zz = np.linspace(0, np.pi, shape[0])
        amp = rng.uniform(-1.5, 1.5)
        bump = amp * np.sin(zz)[:, None, None] * np.ones(shape)
        disp = np.stack([bump, 0.3 * bump, np.zeros_like(bump)]).astype(np.float32)
        v = np.array(
            displacement_warp(jnp.asarray(base.astype(np.float32)), jnp.asarray(disp))
        )
        v += 4 * rng.rand(*shape).astype(np.float32)
        vols.append(v)
    return vols


def test_learned_registration_improves_alignment():
    vols = make_cohort()
    cfg = LearnedRegConfig(
        base_features=4, max_features=8, num_pools=2, steps=120, lr=3e-3,
        smooth_weight=0.5,
    )
    reg = LearnedRegistration((16, 16, 16), cfg)
    final = reg.train(vols, verbose=False)
    assert np.isfinite(final)

    fixed, moving = vols[0], vols[1]
    disp = reg.register(fixed, moving)
    assert disp.shape == (3, 16, 16, 16)
    warped = np.asarray(
        displacement_warp(jnp.asarray(moving, jnp.float32), jnp.asarray(disp))
    )
    mask = fixed > 50
    cc_before = np.corrcoef(fixed[mask], moving[mask])[0, 1]
    cc_after = np.corrcoef(fixed[mask], warped[mask])[0, 1]
    # the 16^3 cohort carries heavy iid noise (+4*rand), so raw masked
    # correlation is a loose proxy for the smoothed-LNCC objective: require
    # "no meaningful degradation" rather than strict improvement (the exact
    # delta is roundoff-trajectory sensitive across kernel implementations)
    assert cc_after > cc_before - 0.03

    # displacement stays bounded by the velocity budget
    assert np.abs(disp).max() < cfg.velocity_scale * (2**cfg.int_steps)


def test_mesh_dp_training_matches_single_device():
    """A dp-sharded pair batch optimizes identically to the same batch on
    one device (params replicated, gradient all-reduced) — the learned
    path's multi-chip story."""
    import jax
    import pytest

    if jax.device_count() < 2:
        pytest.skip("needs multiple devices")
    from deepwmh_tpu.parallel.mesh import make_mesh

    vols = make_cohort(n=4)
    n_dev = min(4, jax.device_count())
    # parity object = the LOSS and its GRADIENT (Adam quantizes near-zero
    # gradients to +-lr sign bits, so one optimizer step is already not
    # bitwise-comparable; per the repo's convention trajectories are
    # validated by quality, not bitwise)
    cfg = LearnedRegConfig(
        base_features=4, max_features=8, num_pools=2, steps=1, lr=3e-3,
        batch_pairs=n_dev,
    )
    from jax.sharding import NamedSharding, PartitionSpec as P

    reg = LearnedRegistration((16, 16, 16), cfg)
    x0 = jnp.zeros((1, 16, 16, 16, 2), jnp.bfloat16)
    params = reg.model.init(jax.random.PRNGKey(0), x0)["params"]
    w = [np.asarray(v, np.float32) for v in vols]
    # exactly n_dev rows even on odd device counts (e.g. a 3-device
    # platform): the dp sharding below requires batch % n_dev == 0
    reps = (n_dev + 1) // 2
    fixed = jnp.stack(w[:2] * reps)[:n_dev]
    moving = jnp.stack(w[2:] * reps)[:n_dev]
    vg = jax.jit(jax.value_and_grad(reg._loss))
    loss_1, grad_1 = vg(params, fixed, moving)

    mesh = make_mesh(n_dev)
    dp = NamedSharding(mesh, P("dp"))
    rep = NamedSharding(mesh, P())
    loss_m, grad_m = vg(
        jax.device_put(params, rep),
        jax.device_put(fixed, dp),
        jax.device_put(moving, dp),
    )
    np.testing.assert_allclose(float(loss_1), float(loss_m), rtol=1e-4)
    # partitioning reorders the bf16 whole-volume bias-gradient sums, so
    # elementwise/L2 parity does not hold (measured: the diff concentrates
    # in bias leaves, cosine 0.997) — the invariant is the DIRECTION and
    # magnitude of the gradient, which is what the optimizer consumes
    g1 = np.concatenate([
        np.asarray(x, np.float32).ravel()
        for x in jax.tree_util.tree_leaves(grad_1)
    ])
    gm = np.concatenate([
        np.asarray(x, np.float32).ravel()
        for x in jax.tree_util.tree_leaves(grad_m)
    ])
    cos = float(g1 @ gm / (np.linalg.norm(g1) * np.linalg.norm(gm) + 1e-12))
    assert cos > 0.99, cos
    ratio = np.linalg.norm(gm) / max(np.linalg.norm(g1), 1e-12)
    assert 0.95 < ratio < 1.05, ratio

    # and a short sharded run stays finite and learns
    cfg3 = LearnedRegConfig(
        base_features=4, max_features=8, num_pools=2, steps=12, lr=3e-3,
        batch_pairs=n_dev,
    )
    m = LearnedRegistration((16, 16, 16), cfg3)
    final = m.train(vols, rng_seed=0, verbose=False, mesh=make_mesh(n_dev))
    assert np.isfinite(final)

    # indivisible batch is a loud error, not silent truncation
    bad = LearnedRegistration(
        (16, 16, 16),
        LearnedRegConfig(base_features=4, max_features=8, num_pools=2,
                         steps=1, batch_pairs=3),
    )
    with pytest.raises(ValueError, match="divide"):
        bad.train(vols, verbose=False, mesh=make_mesh(2))


def test_host_cohort_fallback_trains(monkeypatch):
    """A cohort above the HBM budget batches from host (dp-sharded uploads
    per step) instead of being replicated on device, and still trains."""
    import jax
    import pytest

    from deepwmh_tpu.parallel.mesh import make_mesh

    monkeypatch.setenv("DEEPWMH_REG_COHORT_HBM_BYTES", "1024")  # force it
    vols = make_cohort()
    cfg = LearnedRegConfig(
        base_features=2, max_features=4, num_pools=1, steps=2, lr=3e-3,
    )
    reg = LearnedRegistration((16, 16, 16), cfg)
    assert np.isfinite(reg.train(vols, verbose=False))
    if jax.device_count() >= 2:
        n = 2 if jax.device_count() % 2 == 0 else jax.device_count()
        reg2 = LearnedRegistration((16, 16, 16), cfg)
        assert np.isfinite(reg2.train(vols, verbose=False,
                                      mesh=make_mesh(n)))
    # an explicit batch size that can't shard evenly stays a loud error
    if jax.device_count() >= 4:
        cfg_bad = LearnedRegConfig(
            base_features=2, max_features=4, num_pools=1, steps=1,
            batch_pairs=3,
        )
        reg3 = LearnedRegistration((16, 16, 16), cfg_bad)
        with pytest.raises(ValueError, match="divide"):
            reg3.train(vols, verbose=False, mesh=make_mesh(4))


def test_nondivisible_grid_pads_internally():
    """Grids not divisible by 2^num_pools (arbitrary cohort shapes) are
    padded for the U-Net and the velocity cropped back (regression: odd
    mid-pyramid sizes broke the skip concatenations)."""
    vols = [v[:14, :, :15] for v in make_cohort(n=3, shape=(16, 16, 16))]
    cfg = LearnedRegConfig(
        base_features=4, max_features=8, num_pools=2, steps=2, lr=3e-3,
    )
    reg = LearnedRegistration((14, 16, 15), cfg)
    final = reg.train(vols, verbose=False)
    assert np.isfinite(final)
    disp = reg.register(vols[0], vols[1])
    assert disp.shape == (3, 14, 16, 15)
    assert np.isfinite(np.asarray(disp)).all()
