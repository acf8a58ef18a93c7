"""The 3-stage annotation-free self-training pipeline.

Rebuild of Pipeline_DCNN_Multistage_nnUNet
(deepwmh/pipeline/DCNN_multistage.py:147-720) on the TPU engine:

  Stage I   NLL anomaly scoring + auto-thresholding -> noisy pseudo-labels
            (pipeline/analysis.py; reference :218-234)
  Stage II  label denoising: short U-Net training (50 epochs x 150 batches,
            no val split, per-epoch checkpoints), then softmax ensembling
            over the last 10% of epochs with TTA disabled, inverted-
            background masking y = 1-(m*(1-x)), mean-ensemble, lesion =
            field < 0.5, 3mm spark removal (reference :236-396)
  Stage III final model: Dice-ranked 5% validation split (interleaved pick,
            min 1), 100-epoch training with custom val cases, training-fit
            predictions + postproc + GIF previews (reference :398-564)

Every phase is gated by a marker checkpoint (same names as the reference)
and all artifacts are loadability-probed, so the pipeline is re-entrant at
any point. The nnU-Net env-var/subprocess contract is replaced by direct
library calls into deepwmh_tpu.unet.
"""

from __future__ import annotations

import datetime
import os
from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

from deepwmh_tpu.core import nifti
from deepwmh_tpu.core.artifacts import (
    Checkpoints,
    atomic_write_json,
    join_path,
    load_json,
    mkdir,
)
from deepwmh_tpu.eval.metrics import hard_dice_binary
from deepwmh_tpu.eval.preview import nii_as_gif, nii_slice_range, try_load_gif
from deepwmh_tpu.ops.components import remove_3mm_sparks
from deepwmh_tpu.pipeline.analysis import LesionAnalyzer
from deepwmh_tpu.unet import checkpoint as ckpt
from deepwmh_tpu.unet.data import SegDataset
from deepwmh_tpu.unet.infer import SlidingWindowPredictor
from deepwmh_tpu.unet.model import UNet3D, init_params
from deepwmh_tpu.unet.plan import Plan, plan_experiment
from deepwmh_tpu.unet.preprocess import normalize_zscore, resample_volume
from deepwmh_tpu.unet.release import release_model
from deepwmh_tpu.unet.train import TrainConfig, Trainer
from deepwmh_tpu.utils.logging import SimpleTxtLog


@dataclass
class StageBudget:
    """The reference's hard-coded budgets (DCNN_multistage.py:193-216),
    overridable for tests/small runs."""

    stage2_epochs: int = 50
    stage3_epochs: int = 100
    batches_per_epoch: int = 150
    batch_size: int = 2
    val_fraction: float = 0.05
    voxel_budget: int = 128 * 128 * 128
    # network width overrides (None = the plan defaults, 32->320). Used by
    # CPU-scale tests and width experiments (e.g. the C=64 stage-0 study);
    # a released model records its width in plan.json so predict loads it
    # correctly either way.
    base_features: int = None
    max_features: int = None

    @property
    def ensemble_epochs(self) -> int:
        return max(int(0.1 * self.stage2_epochs), 1)


class PipelineMultistage:
    STAGE2_TASK = "Task001_LabelDenoising"
    STAGE3_TASK = "Task002_FinalModel"

    def __init__(
        self,
        output_folder: str,
        intensity_prior: str = "+",
        budget: StageBudget = None,
        mesh=None,
    ):
        assert intensity_prior in ("+", "-", None)
        self.folder = mkdir(os.path.abspath(output_folder))
        self.intensity_prior = intensity_prior
        self.budget = budget or StageBudget()
        self.mesh = mesh

        self.logger = SimpleTxtLog(
            join_path(
                self.folder,
                datetime.datetime.now().strftime("%Y_%m_%d_%H_%M_%S") + ".txt",
            )
        )
        self.stage1_folder = mkdir(join_path(self.folder, "Stage_1_initial_segmentation"))
        self.stage2_folder = mkdir(join_path(self.folder, "Stage_2_label_denoising"))
        self.stage3_folder = mkdir(join_path(self.folder, "Stage_3_DCNN_training"))
        self.dcnn_folder = mkdir(join_path(self.folder, "DCNN_Outputs"))
        self.checkpoints = Checkpoints(join_path(self.folder, "Checkpoints"))
        self.analyzer = LesionAnalyzer(self.stage1_folder, logger=self.logger)
        self.train_dict = {}

    def log(self, msg):
        self.logger.write(msg)
        print(msg, flush=True)

    def add_training_case(self, name, x_train, x_refs, label1, label2, description=None):
        self.train_dict[name] = {"description": description}
        self.analyzer.add_case(name, x_train, x_refs, label1, label2)

    # ------------------------------------------------------------------ #
    # shared helpers
    # ------------------------------------------------------------------ #

    def _task_dir(self, task: str) -> str:
        return mkdir(join_path(self.dcnn_folder, task))

    def _train_dir(self, task: str) -> str:
        return mkdir(join_path(self._task_dir(task), "training"))

    def _case_paths(self, case: str) -> dict:
        d = join_path(self.stage1_folder, case)
        return {
            "image": join_path(d, "preprocessed_image.nii.gz"),
            "seg": join_path(d, "segmentation.nii.gz"),
            "seg_pp": join_path(d, "segmentation_pp.nii.gz"),
            "valid_mask": join_path(d, "valid_mask.nii.gz"),
            "normalized": join_path(d, "normalized_input.nii.gz"),
        }

    def _make_plan(self, task: str, cases) -> Plan:
        plan_path = join_path(self._task_dir(task), "plan.json")
        if os.path.isfile(plan_path):
            return Plan.load(plan_path)
        shapes, spacings = [], []
        for case in cases:
            p = self._case_paths(case)["image"]
            hdr = nifti.get_nifti_header(p)
            shapes.append(list(hdr.shape))
            spacings.append(nifti.get_nifti_pixdim(p))
        plan = plan_experiment(
            shapes,
            spacings,
            voxel_budget=self.budget.voxel_budget,
            batch_size=self.budget.batch_size,
        )
        if self.budget.base_features is not None:
            plan.base_features = int(self.budget.base_features)
        if self.budget.max_features is not None:
            plan.max_features = int(self.budget.max_features)
        plan.save(plan_path)
        return plan

    def _build_dataset(self, task: str, case_labels: dict, plan: Plan) -> SegDataset:
        """case_labels: {case: (label_path, mask_path_or_None)}. Resamples
        image (linear) + label (nearest) to plan spacing, z-scores the image
        (the plan-and-preprocess role, DCNN_multistage.py:281)."""
        ds = SegDataset(plan.patch_size)
        for case, (label_path, mask_path) in case_labels.items():
            img_path = self._case_paths(case)["image"]
            img = nifti.load_nifti_simple(img_path)
            spacing = nifti.get_nifti_pixdim(img_path)
            lbl = (nifti.load_nifti_simple(label_path) > 0.5).astype(np.float32)
            if mask_path is not None:
                lbl = lbl * (nifti.load_nifti_simple(mask_path) > 0.5)
            img_r = resample_volume(jnp.asarray(img), spacing, plan.target_spacing, 1)
            lbl_r = resample_volume(jnp.asarray(lbl), spacing, plan.target_spacing, 0)
            img_r = normalize_zscore(img_r)
            ds.add_case(case, np.asarray(img_r), np.asarray(lbl_r))
        return ds

    def _trainer(self, task: str, epochs: int, noval: bool, save_every_epoch: bool, plan: Plan) -> Trainer:
        cfg = TrainConfig(
            epochs=epochs,
            batches_per_epoch=self.budget.batches_per_epoch,
            batch_size=self.budget.batch_size,
            noval=noval,
            save_every_epoch=save_every_epoch,
        )
        return Trainer(plan, cfg, self._train_dir(task), mesh=self.mesh, logger=self.logger)

    def _load_params(self, task: str, plan: Plan, checkpoint_name: str):
        import jax

        model = UNet3D(plan=plan)
        # the init template is only a deserialization pytree; build it once
        # per task — model.init re-traces and allocates the whole param
        # tree, far too expensive to pay per ensemble epoch
        cache = getattr(self, "_template_cache", None)
        if cache is None:
            cache = self._template_cache = {}
        if task not in cache:
            cache[task] = init_params(model, jax.random.PRNGKey(0))
        params, _ = ckpt.load_params_only(
            self._train_dir(task), checkpoint_name, cache[task]
        )
        return model, params

    def _predictor_for(self, task: str, plan: Plan, checkpoint_name: str, tta: bool):
        model, params = self._load_params(task, plan, checkpoint_name)
        return SlidingWindowPredictor(model, params, plan, tta=tta)

    # ------------------------------------------------------------------ #
    # stages
    # ------------------------------------------------------------------ #

    def _do_initial_segmentation(self):
        self.log("== Stage I: initial segmentation ==")
        if not self.checkpoints.is_finished("STAGE_1_INITIAL_SEGMENTATION"):
            self.analyzer.analyze_and_do_segmentation(
                intensity_prior=self.intensity_prior, do_postprocessing=True,
                mesh=self.mesh,
            )
            self.checkpoints.set_finish("STAGE_1_INITIAL_SEGMENTATION")
        self.log("stage 1 complete.")

    def _do_label_denoising(self):
        self.log("== Stage II: label denoising ==")
        B = self.budget
        cases = list(self.train_dict.keys())
        plan = self._make_plan(self.STAGE2_TASK, cases)

        # 2-1/2-2: training data from stage-1 pseudo-labels (masked)
        ds = None
        if not self.checkpoints.is_finished("STAGE_2-3_TRAINING_DENOISER"):
            labels = {
                c: (self._case_paths(c)["seg_pp"], self._case_paths(c)["valid_mask"])
                for c in cases
            }
            ds = self._build_dataset(self.STAGE2_TASK, labels, plan)
            trainer = self._trainer(
                self.STAGE2_TASK, B.stage2_epochs, noval=True, save_every_epoch=True, plan=plan
            )
            trainer.fit(ds, resume=True)
            self.checkpoints.set_finish("STAGE_2-3_TRAINING_DENOISER")

        # 2-4: per-epoch background softmax over the ensemble window. ONE
        # predictor is reused across epochs (params are a runtime argument
        # of the compiled sweep — rebuilding it would re-trace and
        # re-compile the identical program every epoch)
        raw_softmax = mkdir(join_path(self.stage2_folder, "003_raw_softmax"))
        if not self.checkpoints.is_finished("STAGE_2-4_RAW_SOFTMAX"):
            predictor = None
            for epoch in range(B.stage2_epochs - B.ensemble_epochs + 1, B.stage2_epochs + 1):
                epoch_dir = mkdir(join_path(raw_softmax, "epoch_%04d" % epoch))
                todo = [
                    c
                    for c in cases
                    if not nifti.try_load_nifti(join_path(epoch_dir, "%s_0.nii.gz" % c))
                ]
                if not todo:
                    continue
                self.log("softmax for epoch %d (%d case(s))" % (epoch, len(todo)))
                model, params = self._load_params(
                    self.STAGE2_TASK, plan, ckpt.MODEL_EPOCH_FMT % epoch
                )
                if predictor is None:
                    predictor = SlidingWindowPredictor(model, params, plan, tta=False)
                else:
                    predictor.params = params
                for c in todo:
                    img_path = self._case_paths(c)["image"]
                    img, hdr = nifti.load_nifti(img_path)
                    spacing = nifti.get_nifti_pixdim(img_path)
                    _, fg = predictor.predict_case(img, spacing)
                    bg = 1.0 - np.asarray(fg)  # fork stores background only
                    nifti.save_nifti(bg, hdr, join_path(epoch_dir, "%s_0.nii.gz" % c))
            self.checkpoints.set_finish("STAGE_2-4_RAW_SOFTMAX")

        # 2-5: inverted-background masking y = 1-(m*(1-x)) (:350-366)
        masked_softmax = mkdir(join_path(self.stage2_folder, "004_masked_softmax"))
        if not self.checkpoints.is_finished("STAGE_2-5_MASKED_SOFTMAX"):
            for epoch in range(B.stage2_epochs - B.ensemble_epochs + 1, B.stage2_epochs + 1):
                in_dir = join_path(raw_softmax, "epoch_%04d" % epoch)
                out_dir = mkdir(join_path(masked_softmax, "epoch_%04d" % epoch))
                for c in cases:
                    out_path = join_path(out_dir, "%s_0.nii.gz" % c)
                    if nifti.try_load_nifti(out_path):
                        continue
                    x = nifti.load_nifti_simple(join_path(in_dir, "%s_0.nii.gz" % c))
                    m = nifti.load_nifti_simple(self._case_paths(c)["valid_mask"])
                    y = 1 - (m * (1 - x))
                    hdr = nifti.get_nifti_header(join_path(in_dir, "%s_0.nii.gz" % c))
                    nifti.save_nifti(y, hdr, out_path)
            self.checkpoints.set_finish("STAGE_2-5_MASKED_SOFTMAX")

        # 2-6: ensemble -> refined labels (:368-394)
        refined = mkdir(join_path(self.stage2_folder, "005_refined_label"))
        if not self.checkpoints.is_finished("STAGE_2-6_ENSEMBLING"):
            for c in cases:
                case_dir = mkdir(join_path(refined, c))
                out_field = join_path(case_dir, "softmax_ensembled.nii.gz")
                out_seg = join_path(case_dir, "label_ensembled.nii.gz")
                if nifti.try_load_nifti(out_field) and nifti.try_load_nifti(out_seg):
                    continue
                fields = []
                for epoch in range(
                    B.stage2_epochs - B.ensemble_epochs + 1, B.stage2_epochs + 1
                ):
                    fields.append(
                        nifti.load_nifti_simple(
                            join_path(masked_softmax, "epoch_%04d" % epoch, "%s_0.nii.gz" % c)
                        )
                    )
                field = np.mean(np.stack(fields), axis=0)
                img_path = self._case_paths(c)["image"]
                phys = nifti.get_nifti_pixdim(img_path)
                lesion = (field < 0.5).astype(np.float32)
                lesion = np.asarray(remove_3mm_sparks(jnp.asarray(lesion), phys))
                hdr = nifti.get_nifti_header(img_path)
                nifti.save_nifti(field, hdr, out_field)
                nifti.save_nifti(lesion, hdr, out_seg)
            self.checkpoints.set_finish("STAGE_2-6_ENSEMBLING")
        self.log("stage 2 complete.")

    def _refined_label_path(self, case: str) -> str:
        return join_path(
            self.stage2_folder, "005_refined_label", case, "label_ensembled.nii.gz"
        )

    def _do_DCNN_training(self):
        self.log("== Stage III: final model training ==")
        B = self.budget
        cases = list(self.train_dict.keys())
        partition_folder = mkdir(join_path(self.stage3_folder, "001_data_partitions"))
        train_fit_folder = mkdir(join_path(self.stage3_folder, "002_training_fit"))
        preview_folder = mkdir(join_path(self.stage3_folder, "003_final_preview"))

        # 3-1: Dice-ranked split (:414-455)
        split_path = join_path(partition_folder, "split.json")
        if not self.checkpoints.is_finished("STAGE_3-1_DATA_SPLIT"):
            pairs = []
            for c in cases:
                d = hard_dice_binary(
                    nifti.load_nifti_simple(self._case_paths(c)["seg_pp"]),
                    nifti.load_nifti_simple(self._refined_label_path(c)),
                )
                pairs.append((c, float(d)))
            pairs.sort(key=lambda x: x[1], reverse=True)
            val_target = max(int(len(cases) * B.val_fraction), 1)
            train_cases, val_cases = [], []
            for i, (c, _) in enumerate(pairs):
                if len(val_cases) < val_target:
                    (train_cases if i % 2 == 0 else val_cases).append(c)
                else:
                    train_cases.append(c)
            atomic_write_json({"train": train_cases, "val": val_cases}, split_path)
            self.log("train=%d val=%d (%s)" % (len(train_cases), len(val_cases), val_cases))
            self.checkpoints.set_finish("STAGE_3-1_DATA_SPLIT")
        split = load_json(split_path)
        train_cases, val_cases = split["train"], split["val"]

        # 3-2/3-3: data prep + plan
        plan = self._make_plan(self.STAGE3_TASK, cases)

        # 3-4: final training with custom val cases (:496-523)
        if not self.checkpoints.is_finished("STAGE_3-4_TRAINING"):
            labels = {
                c: (self._refined_label_path(c), self._case_paths(c)["valid_mask"])
                for c in cases
            }
            train_ds = self._build_dataset(
                self.STAGE3_TASK,
                {c: labels[c] for c in train_cases},
                plan,
            )
            val_ds = self._build_dataset(
                self.STAGE3_TASK, {c: labels[c] for c in val_cases}, plan
            )
            trainer = self._trainer(
                self.STAGE3_TASK, B.stage3_epochs, noval=False, save_every_epoch=False, plan=plan
            )
            trainer.fit(train_ds, val_ds, resume=True)
            self.checkpoints.set_finish("STAGE_3-4_TRAINING")

        # 3-5: training-set fit + postproc + previews (:529-561)
        if not self.checkpoints.is_finished("STAGE_3-5_FINAL_FIT"):
            predictor = self._predictor_for(self.STAGE3_TASK, plan, ckpt.MODEL_BEST, tta=True)
            post_dir = mkdir(join_path(train_fit_folder, "3mm_postproc"))
            for c in cases:
                raw_path = join_path(train_fit_folder, "%s.nii.gz" % c)
                if not nifti.try_load_nifti(raw_path):
                    img_path = self._case_paths(c)["image"]
                    img, hdr = nifti.load_nifti(img_path)
                    spacing = nifti.get_nifti_pixdim(img_path)
                    seg, _ = predictor.predict_case(img, spacing)
                    nifti.save_nifti(np.asarray(seg), hdr, raw_path)
                out_path = join_path(post_dir, "%s.nii.gz" % c)
                if not nifti.try_load_nifti(out_path):
                    seg = nifti.load_nifti_simple(raw_path)
                    m = nifti.load_nifti_simple(self._case_paths(c)["valid_mask"])
                    phys = nifti.get_nifti_pixdim(self._case_paths(c)["image"])
                    pp = np.asarray(remove_3mm_sparks(jnp.asarray(seg * m), phys))
                    nifti.save_nifti(pp, nifti.get_nifti_header(raw_path), out_path)
                gif_path = join_path(preview_folder, "%s_image+seg.gif" % c)
                if not try_load_gif(gif_path):
                    img = nifti.load_nifti_simple(self._case_paths(c)["normalized"])
                    seg = nifti.load_nifti_simple(out_path)
                    s0, s1 = nii_slice_range(img, axis="axial")
                    nii_as_gif(
                        img, gif_path, axis="axial", lesion_mask=seg,
                        side_by_side=True, slice_range=(s0, s1),
                    )
            self.checkpoints.set_finish("STAGE_3-5_FINAL_FIT")

        self.checkpoints.set_finish("PIPELINE_TRAINING_COMPLETE")
        self.log("stage 3 complete.")

    # ------------------------------------------------------------------ #

    def run_training(self, run_stages: str = "full"):
        assert run_stages in ("initseg", "denoise", "full")
        self._do_initial_segmentation()
        if run_stages in ("denoise", "full"):
            self._do_label_denoising()
        if run_stages == "full":
            self._do_DCNN_training()
            self.log("training complete.")

    def release_model(self, output_folder: str):
        """Package the stage-3 model (reference :595-641)."""
        if not (
            self.checkpoints.is_finished("PIPELINE_TRAINING_COMPLETE")
            or self.checkpoints.is_finished("MIXED_COHORT_3_MODEL_TRAINING")
        ):
            self.log("Pipeline is not fully trained; cannot release.")
            return None
        plan = Plan.load(join_path(self._task_dir(self.STAGE3_TASK), "plan.json"))
        tarball = release_model(self._train_dir(self.STAGE3_TASK), plan, output_folder)
        self.log("released model: %s" % tarball)
        return tarball

    def mixed_cohort_training(self, data_dict, val_cases, add_noise=True, model_release_folder=None):
        """Train the final model directly on multi-cohort (image, label)
        pairs (reference :643-720)."""
        for v in val_cases:
            assert v in data_dict, "val case %r not in data_dict" % v

        cases = list(data_dict.keys())
        # fingerprint from the provided images
        plan_path = join_path(self._task_dir(self.STAGE3_TASK), "plan.json")
        if os.path.isfile(plan_path):
            plan = Plan.load(plan_path)
        else:
            shapes, spacings = [], []
            for c in cases:
                hdr = nifti.get_nifti_header(data_dict[c][0])
                shapes.append(list(hdr.shape))
                spacings.append(nifti.get_nifti_pixdim(data_dict[c][0]))
            plan = plan_experiment(
                shapes, spacings,
                voxel_budget=self.budget.voxel_budget,
                batch_size=self.budget.batch_size,
            )
            plan.save(plan_path)

        if not self.checkpoints.is_finished("MIXED_COHORT_3_MODEL_TRAINING"):
            train_ds = SegDataset(plan.patch_size)
            val_ds = SegDataset(plan.patch_size)
            rng = np.random.RandomState(0)
            for c in cases:
                img_path, lbl_path = data_dict[c][0], data_dict[c][1]
                img = nifti.load_nifti_simple(img_path)
                spacing = nifti.get_nifti_pixdim(img_path)
                lbl = (nifti.load_nifti_simple(lbl_path) > 0.5).astype(np.float32)
                if add_noise:  # reference noise=0.1 augmentation (:676)
                    # same transform as unet/augment.percentile_noise, kept
                    # inline on the host numpy RNG: this is one-time data
                    # prep whose determinism contract is np.RandomState(0),
                    # not the per-step jax augmentation stream
                    q5, q95 = np.percentile(img, 5), np.percentile(img, 95)
                    img = img + rng.normal(scale=0.1 * (q95 - q5), size=img.shape)
                img_r = resample_volume(jnp.asarray(img), spacing, plan.target_spacing, 1)
                lbl_r = resample_volume(jnp.asarray(lbl), spacing, plan.target_spacing, 0)
                img_r = np.asarray(normalize_zscore(img_r))
                (val_ds if c in val_cases else train_ds).add_case(
                    c, img_r, np.asarray(lbl_r)
                )
            trainer = self._trainer(
                self.STAGE3_TASK, self.budget.stage3_epochs, noval=False,
                save_every_epoch=False, plan=plan,
            )
            trainer.fit(train_ds, val_ds, resume=True)
            self.checkpoints.set_finish("MIXED_COHORT_3_MODEL_TRAINING")

        if model_release_folder is not None:
            self.release_model(model_release_folder)
