import numpy as np
import jax
import jax.numpy as jnp
import pytest

from deepwmh_tpu.parallel.mesh import device_info, make_mesh
from deepwmh_tpu.parallel.infer_sharded import ShardedSlidingWindowPredictor
from deepwmh_tpu.unet.infer import SlidingWindowPredictor
from deepwmh_tpu.unet.model import UNet3D, init_params
from deepwmh_tpu.unet.plan import Plan


def tiny_plan():
    return Plan(
        target_spacing=[1.0, 1.0, 1.0],
        patch_size=[16, 16, 16],
        batch_size=2,
        pool_kernels=[[2, 2, 2], [2, 2, 2]],
        conv_kernels=[[3, 3, 3]] * 3,
        base_features=4,
        max_features=8,
    )


def test_device_info():
    info = device_info()
    assert info["device_count"] >= 1
    assert info["backend"] == "cpu"  # forced in conftest


def test_sharded_inference_matches_single(rng):
    n = min(8, jax.device_count())
    if n < 2:
        pytest.skip("needs multiple devices")
    mesh = make_mesh(n)
    plan = tiny_plan()
    model = UNet3D(plan=plan)
    params = init_params(model, jax.random.PRNGKey(0))
    vol = jnp.asarray(rng.rand(24, 20, 28), jnp.float32)

    # like-for-like: the sharded predictor shards the PATCH sweep, so
    # compare against the single-device patch sweep (the default mode is
    # whole-volume fully-convolutional, a different — better — computation)
    single = SlidingWindowPredictor(model, params, plan, tta=False, mode="patch")
    want = np.asarray(single.predict_volume(vol))

    sharded = ShardedSlidingWindowPredictor(model, params, plan, mesh, tta=False, mode="patch")
    got = np.asarray(sharded.predict_volume(vol))

    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(got.sum(-1), 1.0, rtol=1e-4)


def test_sharded_fullvol_matches_single_fullvol(rng):
    """Flip-sharded whole-volume TTA across the mesh equals the single-
    device whole-volume TTA (same forwards, psum-merged)."""
    n = min(8, jax.device_count())
    if n < 2:
        pytest.skip("needs multiple devices")
    mesh = make_mesh(n)
    plan = tiny_plan()
    model = UNet3D(plan=plan)
    params = init_params(model, jax.random.PRNGKey(3))
    vol = jnp.asarray(rng.rand(24, 20, 28), jnp.float32)

    single = SlidingWindowPredictor(model, params, plan, tta=True, mode="fullvol")
    want = np.asarray(single.predict_volume(vol))
    sharded = ShardedSlidingWindowPredictor(model, params, plan, mesh, tta=True)
    got = np.asarray(sharded.predict_volume(vol))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)

    # no-TTA: one real flip on an n-device mesh (all padding slots skip)
    s1 = ShardedSlidingWindowPredictor(model, params, plan, mesh, tta=False)
    g1 = np.asarray(s1.predict_volume(vol))
    w1 = np.asarray(
        SlidingWindowPredictor(model, params, plan, tta=False,
                               mode="fullvol").predict_volume(vol)
    )
    np.testing.assert_allclose(g1, w1, rtol=2e-3, atol=2e-3)


def test_sharded_predict_case_matches_single(rng):
    """The fused case program (resample -> z-score -> sharded sweep ->
    resample back -> threshold) equals the single-device predict_case for
    both sweep modes (the serve CLI's --mesh path)."""
    n = min(8, jax.device_count())
    if n < 2:
        pytest.skip("needs multiple devices")
    mesh = make_mesh(n)
    plan = tiny_plan()
    model = UNet3D(plan=plan)
    params = init_params(model, jax.random.PRNGKey(5))
    vol = np.asarray(rng.rand(20, 24, 18), np.float32) * 100.0
    spacing = (1.3, 0.9, 1.1)

    for mode in ("fullvol", "patch"):
        single = SlidingWindowPredictor(model, params, plan, tta=True, mode=mode)
        want_seg, want_fg = single.predict_case(vol, spacing)
        sharded = ShardedSlidingWindowPredictor(
            model, params, plan, mesh, tta=True, mode=mode
        )
        got_seg, got_fg = sharded.predict_case(vol, spacing)
        assert got_fg.shape == vol.shape
        np.testing.assert_allclose(
            np.asarray(got_fg), np.asarray(want_fg), rtol=2e-3, atol=2e-3
        )
        agree = (np.asarray(got_seg) == np.asarray(want_seg)).mean()
        assert agree > 0.999, (mode, agree)


def test_select_device_pins_placement():
    """select_device (the CLIs' -g/--device role) routes subsequent
    unsharded computation to the chosen local device."""
    from deepwmh_tpu.parallel.mesh import select_device

    if jax.device_count() < 2:
        pytest.skip("needs multiple devices")
    try:
        dev = select_device(1)
        x = jnp.zeros((4,)) + 1.0
        assert x.devices() == {dev}
        with pytest.raises(ValueError):
            select_device(jax.device_count())
    finally:
        jax.config.update("jax_default_device", None)
    y = jnp.zeros((2,))
    assert y.devices() == {jax.devices()[0]}
