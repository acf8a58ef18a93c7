"""The U-Net training engine: pjit-sharded data-parallel training loop.

Replaces the nnU-Net fork's `nnUNet_train` command surface that the
reference pipeline drives (deepwmh/pipeline/DCNN_multistage.py:292-309,
496-523), reproducing its semantics:

- `-e epochs` / `-b batches-per-epoch` budgets (fork-specific flags)
- `--noval` (no validation split; model_best := model_latest)
- `--save_every_epoch` (per-epoch checkpoints enabling stage-2 softmax
  ensembling over the last 10% of epochs)
- `--custom_val_cases` (explicit validation case list, stage 3)
- `-c` continue-from-model_latest resume
- SGD + Nesterov momentum 0.99, poly LR (1 - step/total)^0.9, grad-norm
  clip 12, CE + batch soft-Dice with deep supervision — the nnUNetTrainerV2
  optimization recipe.

TPU design: the whole step (on-device augmentation -> forward with deep
supervision -> loss -> grads -> SGD update) is ONE jitted program; with a
`jax.sharding.Mesh` the batch is sharded over the 'dp' axis and parameters
are replicated, so XLA inserts the gradient all-reduce over ICI
(SURVEY.md §2.2 TPU equivalent).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from deepwmh_tpu.unet import checkpoint as ckpt
from deepwmh_tpu.unet.augment import AugmentConfig, augment_samples
from deepwmh_tpu.unet.data import SegDataset
from deepwmh_tpu.unet.losses import deep_supervision_loss, hard_dice
from deepwmh_tpu.unet.model import UNet3D
from deepwmh_tpu.unet.plan import Plan
from deepwmh_tpu.utils.logging import SimpleTxtLog, Timer


@dataclass
class TrainConfig:
    epochs: int = 100
    batches_per_epoch: int = 150  # reference DCNN_batches_in_each_epoch
    batch_size: int = 2
    lr: float = 1e-2
    momentum: float = 0.99
    weight_decay: float = 3e-5
    grad_clip: float = 12.0
    noval: bool = False
    save_every_epoch: bool = False
    oversample_fg: float = 0.33
    augment: bool = True
    aug: AugmentConfig = field(default_factory=AugmentConfig)
    val_batches: int = 10
    seed: int = 0


# One compiled train step shared across Trainer instances with identical
# compute configuration (model/plan, augmentation, optimizer constants,
# mesh). The multistage pipeline builds a separate Trainer per stage; with
# the LR passed as a runtime argument their step programs are identical,
# and re-jitting per instance would pay a full fresh XLA compile each time
# (jit caches are per-wrapper). Keyed by everything _train_step_impl reads
# from its trainer; the first trainer's closure serves the rest.
_TRAIN_STEP_CACHE = {}


def _shared_train_step(trainer):
    import dataclasses as _dc

    mesh = trainer.mesh
    mesh_key = (
        None
        if mesh is None
        else (tuple(mesh.axis_names), tuple(mesh.shape.values()),
              tuple(d.id for d in np.asarray(mesh.devices).reshape(-1)))
    )
    cfg = trainer.cfg
    key = (
        trainer.plan.to_json(),
        repr(trainer.model),  # flax dataclass repr covers remat/dtype flags
        bool(cfg.augment),
        repr(cfg.aug),
        (cfg.grad_clip, cfg.weight_decay, cfg.momentum),
        mesh_key,
    )
    if key not in _TRAIN_STEP_CACHE:
        _TRAIN_STEP_CACHE[key] = jax.jit(
            trainer._train_step_impl, donate_argnums=(0, 1)
        )
    return _TRAIN_STEP_CACHE[key]


class Trainer:
    def __init__(self, plan: Plan, cfg: TrainConfig, out_dir: str, mesh=None, logger=None):
        self.plan = plan
        self.cfg = cfg
        self.out_dir = out_dir
        os.makedirs(out_dir, exist_ok=True)
        # remat: batch-2 training at the flagship plan does not even
        # compile on a 16GB chip without it (see UNet3D.remat).
        # decompose_fullres stays OFF for training: the depth-decomposed
        # lowering wins only at batch-1 whole-volume inference shapes — at
        # batched patch shapes it is measured slower and its extra
        # pad/slice graph interacts badly with remat compile times. The
        # parameter tree is identical either way, so checkpoints trained
        # here load into decomposed inference models freely.
        self.model = UNet3D(plan=plan, remat=True, decompose_fullres=False)
        self.logger = logger or SimpleTxtLog(os.path.join(out_dir, "training_log.txt"))
        if mesh is not None and cfg.batch_size % int(mesh.size) != 0:
            # DP shards the batch axis; the global batch is part of the
            # training recipe (reference plan semantics), so rather than
            # silently changing it, shard over the largest device count
            # that divides it (a submesh), or run unsharded if none does
            import math

            from jax.sharding import Mesh

            d = math.gcd(cfg.batch_size, int(mesh.size))
            flat = np.asarray(mesh.devices).reshape(-1)
            sub = Mesh(flat[:d], ("dp",)) if d > 1 else None
            self.log(
                "batch %d not divisible by mesh size %d: %s"
                % (cfg.batch_size, int(mesh.size),
                   "sharding over %d device(s)" % d if sub is not None
                   else "running unsharded")
            )
            mesh = sub
        self.mesh = mesh

        # Poly LR (1 - step/total)^0.9 is computed HOST-side per step and
        # passed into the compiled step as a scalar argument: with the
        # schedule baked into optax (scale_by_schedule) the total-step count
        # becomes a program constant, so the stage-2 (50-epoch) and stage-3
        # (100-epoch) trainers of the multistage pipeline each paid a full
        # fresh XLA compile of an otherwise identical step (~50 s each on
        # the remote backend). The optimizer chain is schedule-free
        # (sgd(1.0) ends in a stateless scale(-1)) and _train_step_impl
        # multiplies the update by the traced lr — same math, one program.
        total_steps = cfg.epochs * cfg.batches_per_epoch
        self._schedule = (
            lambda step: cfg.lr * (1.0 - step / max(total_steps, 1)) ** 0.9
        )
        self.tx = optax.chain(
            optax.clip_by_global_norm(cfg.grad_clip),
            optax.add_decayed_weights(cfg.weight_decay),
            optax.sgd(1.0, momentum=cfg.momentum, nesterov=True),
        )

        if mesh is not None:
            self.rep_sharding = NamedSharding(mesh, P())
            self.batch_sharding = NamedSharding(mesh, P("dp"))
        else:
            self.rep_sharding = None
            self.batch_sharding = None

        self._train_step = _shared_train_step(self)
        self._eval_step = jax.jit(self._eval_step_impl)

    # ------------------------------------------------------------------ #

    def log(self, msg: str):
        self.logger.write(msg)
        print(msg, flush=True)

    def init_state(self, rng):
        from deepwmh_tpu.unet.model import init_params

        params = init_params(self.model, rng)
        opt_state = self.tx.init(params)
        if self.rep_sharding is not None:
            params = jax.device_put(params, self.rep_sharding)
            opt_state = jax.device_put(opt_state, self.rep_sharding)
        return params, opt_state

    def _train_step_impl(self, params, opt_state, images, labels, rng, lr):
        """images [N,D,H,W] f32, labels [N,D,H,W] i32, lr scalar f32 (the
        host-computed poly-schedule value for this step)."""
        if self.cfg.augment:
            images, labels = self._augment(rng, images, labels)

        def loss_fn(p):
            outs = self.model.apply(
                {"params": p}, images[..., None], deep_supervision=True
            )
            return deep_supervision_loss(outs, labels, self.plan.pool_kernels)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = self.tx.update(grads, opt_state, params)
        updates = jax.tree_util.tree_map(lambda u: u * lr, updates)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    def _augment(self, rng, images, labels):
        """Per-sample augmentation; the spatial warp runs under a runtime
        lax.cond (p_rotscale=0.2 means 80% of samples skip its ~320 ms of
        gathers). Single-device: a host-level per-sample loop. Under a dp
        mesh: the same loop inside shard_map over the local shard, so
        every device augments its own samples concurrently and the cond
        stays a true conditional (indexing a dp-sharded batch from the
        host-level loop would serialize devices; vmap would lower the
        cond to a both-branches select)."""
        keys = jax.random.split(rng, images.shape[0])
        if self.mesh is None:
            return augment_samples(keys, images, labels, self.cfg.aug)
        aug = jax.shard_map(
            lambda k, i, l: augment_samples(k, i, l, self.cfg.aug),
            mesh=self.mesh,
            in_specs=(P("dp"), P("dp"), P("dp")),
            out_specs=(P("dp"), P("dp")),
        )
        return aug(keys, images, labels)

    def _eval_step_impl(self, params, images, labels):
        logits = self.model.apply({"params": params}, images[..., None])
        pred = jnp.argmax(logits, axis=-1)
        return hard_dice(pred, labels)

    def _put_batch(self, images, labels):
        if self.batch_sharding is not None:
            images = jax.device_put(images, self.batch_sharding)
            labels = jax.device_put(labels, self.batch_sharding)
        return jnp.asarray(images), jnp.asarray(labels)

    # ------------------------------------------------------------------ #

    def fit(self, train_ds: SegDataset, val_ds: SegDataset = None, resume: bool = True):
        """Run the full training budget; returns (params, best_metric).

        Resume semantics match the reference: if model_latest exists,
        continue from it (`-c`, DCNN_multistage.py:300-304).
        """
        cfg = self.cfg
        rng = jax.random.PRNGKey(cfg.seed)
        params, opt_state = self.init_state(rng)
        start_epoch = 0
        best_metric = -float("inf")  # noval metrics (= -loss) can be < -1

        if resume and ckpt.checkpoint_exists(self.out_dir, ckpt.MODEL_LATEST):
            params, opt_state, meta = ckpt.load_checkpoint(
                self.out_dir, ckpt.MODEL_LATEST, params, opt_state
            )
            start_epoch = int(meta.get("epoch", 0))
            best_metric = float(meta.get("best_metric", -float("inf")))
            self.log("resumed from model_latest at epoch %d" % start_epoch)

        # decorrelate BOTH randomness streams from the pre-interrupt run:
        # np_rng reseeds with the epoch offset, and the jax augmentation key
        # folds it in (else a resumed run replays the step_rng sequence —
        # identical augmentation coins — from step 0)
        np_rng = np.random.RandomState(cfg.seed + start_epoch)
        if start_epoch:
            rng = jax.random.fold_in(rng, start_epoch)
        ema_loss = None
        # host->device overlap: sample + device_put the NEXT batch while the
        # current step executes on device (dispatch is async, so the step
        # call returns immediately; the executor thread hides the host-side
        # sampling + H2D transfer). One worker keeps np_rng consumption
        # strictly sequential, so batches are identical to the unprefetched
        # loop.
        from concurrent.futures import ThreadPoolExecutor

        def _next_batch():
            imgs, lbls = train_ds.sample_batch(
                np_rng, cfg.batch_size, cfg.oversample_fg
            )
            return self._put_batch(imgs, lbls)

        prefetcher = ThreadPoolExecutor(max_workers=1)
        for epoch in range(start_epoch, cfg.epochs):
            timer = Timer()
            losses = []
            # prefetch stays within the epoch: the last pending batch is
            # consumed before validation below touches np_rng on this thread
            pending = prefetcher.submit(_next_batch)
            for b in range(cfg.batches_per_epoch):
                imgs, lbls = pending.result()
                if b + 1 < cfg.batches_per_epoch:
                    pending = prefetcher.submit(_next_batch)
                rng, step_rng = jax.random.split(rng)
                lr = self._schedule(epoch * cfg.batches_per_epoch + b)
                params, opt_state, loss = self._train_step(
                    params, opt_state, imgs, lbls, step_rng, np.float32(lr)
                )
                losses.append(loss)
            mean_loss = float(jnp.mean(jnp.stack(losses)))
            ema_loss = mean_loss if ema_loss is None else 0.9 * ema_loss + 0.1 * mean_loss

            # online validation: pseudo-Dice on val patches (nnU-Net style).
            # noval: model_best follows model_latest, the reference --noval
            # contract (DCNN_multistage.py:292)
            noval_mode = cfg.noval or val_ds is None or len(val_ds) == 0
            if not noval_mode:
                dices = []
                for _ in range(cfg.val_batches):
                    vi, vl = val_ds.sample_batch(np_rng, cfg.batch_size, 0.5)
                    vi, vl = self._put_batch(vi, vl)
                    dices.append(self._eval_step(params, vi, vl))
                metric = float(jnp.mean(jnp.stack(dices)))
            else:
                metric = float(epoch + 1)  # monotonic: best == latest

            meta = {
                "epoch": epoch + 1,
                "best_metric": max(best_metric, metric),
                "train_loss": mean_loss,
                "val_metric": None if noval_mode else metric,
            }
            ckpt.save_checkpoint(self.out_dir, ckpt.MODEL_LATEST, params, opt_state, meta)
            if cfg.save_every_epoch:
                ckpt.save_checkpoint(
                    self.out_dir, ckpt.MODEL_EPOCH_FMT % (epoch + 1), params, meta=meta
                )
            if noval_mode:
                # model_best == model_latest by construction: hardlink the
                # just-written latest instead of re-serializing tens of MB
                # of identical weights every epoch — cheap, yet an
                # interrupted run still leaves a valid model_best (a
                # once-at-the-end write would not)
                best_metric = metric
                ckpt.link_checkpoint(self.out_dir, ckpt.MODEL_LATEST, ckpt.MODEL_BEST)
            elif metric > best_metric:
                best_metric = metric
                ckpt.save_checkpoint(self.out_dir, ckpt.MODEL_BEST, params, meta=meta)
            self.log(
                "epoch %d/%d loss=%.4f metric=%.4f best=%.4f (%.1fs)"
                % (epoch + 1, cfg.epochs, mean_loss, metric, best_metric, timer.elapsed())
            )

        prefetcher.shutdown(wait=False)
        noval_mode = cfg.noval or val_ds is None or len(val_ds) == 0
        if noval_mode or not ckpt.checkpoint_exists(self.out_dir, ckpt.MODEL_BEST):
            ckpt.save_checkpoint(
                self.out_dir, ckpt.MODEL_BEST, params,
                meta={"epoch": cfg.epochs, "best_metric": best_metric},
            )
        return params, best_metric
