import numpy as np
import jax
import jax.numpy as jnp
import pytest

from deepwmh_tpu.unet.plan import Plan
from deepwmh_tpu.unet.data import SegDataset
from deepwmh_tpu.unet.train import TrainConfig, Trainer
from deepwmh_tpu.unet import checkpoint as ckpt
from deepwmh_tpu.unet.losses import (
    ce_dice_loss,
    deep_supervision_loss,
    ds_weights,
    hard_dice,
    soft_dice,
)


def micro_plan(batch=2):
    return Plan(
        target_spacing=[1.0, 1.0, 1.0],
        patch_size=[8, 8, 8],
        batch_size=batch,
        pool_kernels=[[2, 2, 2]],
        conv_kernels=[[3, 3, 3], [3, 3, 3]],
        base_features=2,
        max_features=4,
    )


def blob_dataset(patch, n_cases=2, size=12):
    rng = np.random.RandomState(0)
    ds = SegDataset(patch)
    for i in range(n_cases):
        img = rng.rand(size, size, size).astype(np.float32)
        lbl = np.zeros((size, size, size), np.uint8)
        lbl[3:7, 3:7, 3:7] = 1
        img = img + 3.0 * lbl  # bright lesions: learnable signal
        ds.add_case("case%d" % i, img, lbl)
    return ds


def test_ds_weights():
    w = ds_weights(4)
    assert w[-1] == 0.0
    np.testing.assert_allclose(sum(w), 1.0)
    assert w[0] > w[1] > w[2]


def test_losses_basic(rng):
    logits = jnp.asarray(rng.randn(2, 8, 8, 8, 2), jnp.float32)
    target = jnp.asarray((rng.rand(2, 8, 8, 8) > 0.7).astype(np.int32))
    l = float(ce_dice_loss(logits, target))
    assert np.isfinite(l) and l > 0
    # perfect prediction -> dice loss ~ 0
    perfect = jax.nn.one_hot(target, 2) * 20.0
    assert float(soft_dice(perfect, target)) < 1e-3


def test_ce_finite_with_suppressed_nontarget_class(rng):
    """A fully suppressed non-target class (logit -> -inf, so logp = -inf)
    must not poison the loss: the one-hot CE is a where-select, never a
    (-inf)*0 multiply (regression test for the NaN the multiply form had)."""
    from deepwmh_tpu.unet.losses import softmax_ce

    logits = jnp.asarray(rng.randn(1, 4, 4, 4, 3), jnp.float32)
    target = jnp.zeros((1, 4, 4, 4), jnp.int32)
    logits = logits.at[0, 0, 0, 0, 2].set(-jnp.inf)
    v = float(softmax_ce(logits, target))
    assert np.isfinite(v), v
    # still matches the gather form where both are defined
    ref = -float(
        jnp.mean(
            jnp.take_along_axis(
                jax.nn.log_softmax(logits, -1), target[..., None], -1
            )
        )
    )
    np.testing.assert_allclose(v, ref, rtol=1e-6)


def test_hard_dice():
    a = jnp.zeros((4, 4, 4)).at[:2].set(1)
    np.testing.assert_allclose(float(hard_dice(a, a)), 1.0, atol=1e-4)
    b = jnp.zeros((4, 4, 4))
    assert float(hard_dice(a, b)) < 1e-3


def test_deep_supervision_loss(rng):
    outs = [
        jnp.asarray(rng.randn(1, 8, 8, 8, 2), jnp.float32),
        jnp.asarray(rng.randn(1, 4, 4, 4, 2), jnp.float32),
    ]
    target = jnp.asarray((rng.rand(1, 8, 8, 8) > 0.5).astype(np.int32))
    l = float(deep_supervision_loss(outs, target, [[2, 2, 2]]))
    assert np.isfinite(l)


def test_dataset_sampling():
    ds = blob_dataset((8, 8, 8))
    rng = np.random.RandomState(1)
    imgs, lbls = ds.sample_batch(rng, 4, oversample_fg=0.5)
    assert imgs.shape == (4, 8, 8, 8)
    assert lbls.shape == (4, 8, 8, 8)
    # fg-forced samples must contain lesion voxels
    assert lbls[-1].sum() > 0
    assert lbls[-2].sum() > 0


def test_trainer_loss_decreases_and_checkpoints(tmp_path):
    plan = micro_plan()
    cfg = TrainConfig(
        epochs=3,
        batches_per_epoch=6,
        batch_size=2,
        lr=0.05,
        augment=False,
        noval=True,
        save_every_epoch=True,
        seed=0,
    )
    out = str(tmp_path / "run")
    trainer = Trainer(plan, cfg, out)
    ds = blob_dataset((8, 8, 8))
    params, best = trainer.fit(ds, resume=False)
    assert ckpt.checkpoint_exists(out, "model_latest")
    assert ckpt.checkpoint_exists(out, "model_best")
    assert ckpt.checkpoint_exists(out, "model_ep_0001")
    assert ckpt.checkpoint_exists(out, "model_ep_0003")

    # resume: continues from epoch 3 and is a no-op at epochs=3
    trainer2 = Trainer(plan, cfg, out)
    _, _ = trainer2.fit(ds, resume=True)
    _, _, meta = ckpt.load_checkpoint(
        out, "model_latest", *trainer2.init_state(jax.random.PRNGKey(0))
    )
    assert meta["epoch"] == 3


def test_trainer_dp_mesh(tmp_path):
    n = min(8, jax.device_count())
    if n < 2:
        pytest.skip("needs multiple devices")
    from jax.sharding import Mesh

    mesh = Mesh(np.array(jax.devices()[:n]), ("dp",))
    plan = micro_plan(batch=n)
    cfg = TrainConfig(
        epochs=1, batches_per_epoch=2, batch_size=n, augment=True, noval=True, seed=0
    )
    trainer = Trainer(plan, cfg, str(tmp_path / "dp"), mesh=mesh)
    ds = blob_dataset((8, 8, 8))
    params, _ = trainer.fit(ds, resume=False)
    assert params is not None


def test_graft_entry_dryrun():
    import sys

    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge

    ge.dryrun_multichip(min(8, jax.device_count()))


def test_trainer_actually_learns(tmp_path):
    """End-to-end learning check: a tiny U-Net must segment bright synthetic
    blobs after a short real training run (not just run without crashing)."""
    plan = micro_plan()
    cfg = TrainConfig(
        epochs=8,
        batches_per_epoch=8,
        batch_size=2,
        lr=0.05,
        augment=False,
        noval=False,
        seed=1,
        val_batches=4,
    )
    ds = blob_dataset((8, 8, 8), n_cases=3)
    val = blob_dataset((8, 8, 8), n_cases=1)
    trainer = Trainer(plan, cfg, str(tmp_path / "learn"), )
    params, best = trainer.fit(ds, val, resume=False)
    assert best > 0.5, "val dice after training too low: %.3f" % best

    # the trained model segments a fresh blob volume correctly
    import jax

    rng_np = np.random.RandomState(9)
    img = rng_np.rand(8, 8, 8).astype(np.float32)
    lbl = np.zeros((8, 8, 8), np.uint8)
    lbl[2:6, 2:6, 2:6] = 1
    img += 3.0 * lbl
    logits = trainer.model.apply({"params": params}, jnp.asarray(img)[None, ..., None])
    pred = np.asarray(jnp.argmax(logits, -1))[0]
    inter = ((pred > 0.5) & (lbl > 0.5)).sum()
    dice = 2 * inter / max((pred > 0.5).sum() + lbl.sum(), 1)
    assert dice > 0.5, "trained model dice %.3f" % dice
