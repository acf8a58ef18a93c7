"""Checkpoint-IO hygiene: noval training writes model_best exactly once,
and compiled-program caches stay bounded on heterogeneous cohorts."""

import numpy as np

import deepwmh_tpu.unet.checkpoint as ckpt_mod
from deepwmh_tpu.unet.plan import Plan
from deepwmh_tpu.unet.train import TrainConfig, Trainer


def micro_plan(patch=(8, 8, 8)):
    return Plan(
        target_spacing=[1.0, 1.0, 1.0],
        patch_size=list(patch),
        batch_size=2,
        pool_kernels=[[2, 2, 2]],
        conv_kernels=[[3, 3, 3], [3, 3, 3]],
        base_features=2,
        max_features=4,
    )


class _Blobs:
    def __init__(self, shape=(8, 8, 8), n=4):
        rng = np.random.RandomState(0)
        self.imgs = [rng.randn(*shape).astype(np.float32) for _ in range(n)]
        self.lbls = [
            (rng.rand(*shape) > 0.8).astype(np.int32) for _ in range(n)
        ]

    def __len__(self):
        return len(self.imgs)

    def sample_batch(self, rng, batch_size, oversample_fg):
        idx = rng.randint(0, len(self.imgs), batch_size)
        return (
            np.stack([self.imgs[i] for i in idx]),
            np.stack([self.lbls[i] for i in idx]),
        )


def test_noval_writes_model_best_once(tmp_path, monkeypatch):
    calls = []
    orig = ckpt_mod.save_checkpoint

    def counting(folder, name, *a, **k):
        calls.append(name)
        return orig(folder, name, *a, **k)

    monkeypatch.setattr(ckpt_mod, "save_checkpoint", counting)

    epochs = 4
    cfg = TrainConfig(
        epochs=epochs, batches_per_epoch=2, batch_size=2, augment=False,
        noval=True, save_every_epoch=True, seed=0,
    )
    trainer = Trainer(micro_plan(), cfg, str(tmp_path / "run"))
    trainer.fit(_Blobs(), resume=False)

    # N latest + N per-epoch + exactly ONE best (reference --noval contract,
    # without rewriting model_best every epoch)
    assert calls.count("model_latest") == epochs
    assert len([c for c in calls if c.startswith("model_ep_")]) == epochs
    assert calls.count("model_best") == 1
    assert ckpt_mod.checkpoint_exists(str(tmp_path / "run"), "model_best")


def test_bounded_cache_lru():
    from deepwmh_tpu.utils.misc import BoundedCache

    c = BoundedCache(maxsize=3)
    for i in range(5):
        c[i] = i * 10
    assert len(c) == 3
    assert 0 not in c and 1 not in c
    assert c[2] == 20
    # touching 2 makes 3 the LRU entry
    c[99] = 990
    assert 3 not in c and 2 in c


def test_predictor_case_cache_bounded():
    import jax

    from deepwmh_tpu.unet.infer import SlidingWindowPredictor
    from deepwmh_tpu.unet.model import UNet3D, init_params

    plan = micro_plan()
    model = UNet3D(plan=plan)
    params = init_params(model, jax.random.PRNGKey(0))
    pred = SlidingWindowPredictor(model, params, plan, tta=False)
    rng = np.random.RandomState(0)
    # the case cache is PROCESS-wide (shared across predictor instances so
    # equal-config models reuse compiled programs); drive it past its own
    # bound and assert eviction, whatever other tests left in it
    maxsize = pred._case_cache.maxsize
    for i in range(maxsize + 2):
        vol = rng.rand(9 + i, 9, 9).astype(np.float32)
        pred.predict_case(vol, (1.0, 1.0, 1.0))
    assert len(pred._case_cache) <= maxsize
