"""Stage-1 lesion analysis: the NLL anomaly pipeline as one fused program.

Rebuild of the reference's nll_analysis + LesionAnalyzer
(deepwmh/analysis/lesion_analysis.py:115-278,358-461) — the 2-5 min/case
numpy hot path (SURVEY.md §3.5) — as a single jitted XLA program per case:

  rough brain mask from the registered label1 cohort -> z-score -> Otsu
  valid mask -> tissue-min background fill -> 50 mm local-mean alignment of
  every reference to the target -> voxelwise Gaussian NLL with one-sided
  prior -> per-slice component filtering -> per-reference anomaly histograms
  -> zero-crossing auto-threshold -> cerebellum/brainstem 3 mm median ->
  majority-vote tissue masking.

The host wrapper (LesionAnalyzer) handles NIfTI I/O, idempotent artifacts
and the per-case summary, matching the reference's output contract
(anomaly_score / valid_mask / normalized_input / segmentation[_pp] /
summary + segmentation.txt).
"""

from __future__ import annotations

import functools
import json
import math
import os
import shutil
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from deepwmh_tpu.core import nifti
from deepwmh_tpu.core.artifacts import atomic_write_json, join_path, mkdir
from deepwmh_tpu.ops.components import (
    average_contiguous_labels,
    component_filtering,
    remove_3mm_sparks,
)
from deepwmh_tpu.ops.filters import median_3mm
from deepwmh_tpu.ops.grid import mean_std_grid
from deepwmh_tpu.ops.histogram import (
    auto_threshold_from_curves,
    histogram_analysis,
    otsu_threshold,
)
from deepwmh_tpu.ops.nll import nll
from deepwmh_tpu.ops.stats import group_mean, z_score
from deepwmh_tpu.utils.logging import SimpleTxtLog, TimeStamps

PHYSICAL_PATCH_MM = 50.0  # reference lesion_analysis.py:126-127
MIN_STD = 0.03  # reference lesion_analysis.py:180


@dataclass
class AnalysisResult:
    anomaly: np.ndarray
    valid_mask: np.ndarray
    normalized_input: np.ndarray
    averaged_label: np.ndarray
    curve_x: np.ndarray
    curve_y: np.ndarray
    curve_r: np.ndarray
    curve_rs: np.ndarray
    threshold: float
    debug: dict = None  # intermediates when analyzed with debug=True


def _nll_core_impl(
    x_raw,
    refs_raw,
    label1s,
    label2s,
    patch_size,
    voxel_size,
    num_label_classes,
    side="+",
    apply_otsu=True,
    mean_correction=True,
    debug=False,
):
    """x_raw [D,H,W]; refs_raw/label1s/label2s [K,D,H,W] (registered).

    Returns (anomaly, valid_mask, normalized_input, averaged_label,
    curve_x, curve_y, curve_r, threshold). With debug=True a dict of
    intermediates is appended: the per-voxel intensity threshold
    back-solved from the anomaly threshold (reference
    lesion_analysis.py:245-251), rough brain mask, local mean, cohort
    mean/std, and the aligned reference images + their anomaly maps
    (:259-277)."""
    K = refs_raw.shape[0]

    # rough brain mask: cohort majority of label1 (lesion_analysis.py:139-141)
    m1 = (label1s > 0.5).astype(jnp.float32)
    m_prob = group_mean(m1)
    m_rough = (m_prob > 0.5).astype(jnp.float32)

    x = z_score(x_raw.astype(jnp.float32), mask=m_rough)
    if apply_otsu:
        xmin = jnp.min(x)
        otsu_thr = otsu_threshold(jnp.where(m_rough < 0.5, xmin, x))
        m_otsu = (x > otsu_thr).astype(jnp.float32)
    else:
        m_otsu = jnp.ones_like(x)
    m_valid = m_rough * m_otsu

    # background fill with tissue minimum (lesion_analysis.py:155-167)
    tissue_min = jnp.min(jnp.where(m_rough > 0.5, x, jnp.inf))
    x = jnp.where(m_rough < 0.5, tissue_min, x)

    def prep_ref(r):
        t = z_score(r.astype(jnp.float32), mask=m_rough)
        tmin = jnp.min(jnp.where(m_rough > 0.5, t, jnp.inf))
        return jnp.where(m_rough < 0.5, tmin, t)

    refs = jax.vmap(prep_ref)(refs_raw)

    # local mean alignment (lesion_analysis.py:169-176)
    x_mu, _ = mean_std_grid(x, patch_size, mask=m_valid)
    if mean_correction:
        def align(r):
            r_mu, _ = mean_std_grid(r, patch_size, mask=m_valid)
            return r - r_mu + x_mu

        refs = jax.vmap(align)(refs)

    # anomaly of the target and of each reference (leave-none-out, like the
    # reference: each ref scored against the full cohort)
    anomaly, x_mean, x_std = nll(x, refs, min_std=MIN_STD, side=side, return_all=True)
    anomaly = anomaly * component_filtering(m_valid, voxel_size)

    anomaly_refs = jax.vmap(
        lambda r: nll(r, refs, min_std=MIN_STD, side=side) * m_valid
    )(refs)

    # histogram curves + auto threshold (lesion_analysis.py:195-215)
    curve_x, curve_y, curve_r, curve_rs = histogram_analysis(
        anomaly, anomaly_refs, m_valid
    )
    threshold = auto_threshold_from_curves(curve_x, curve_rs)

    # anatomical priors (lesion_analysis.py:217-243)
    avg_label = average_contiguous_labels(label2s, num_label_classes).astype(
        jnp.float32
    )
    anomaly = anomaly * (avg_label > 0.5).astype(jnp.float32)
    cb_mask = ((avg_label > 1.5) & (avg_label < 2.5)).astype(jnp.float32)
    anomaly_cb = median_3mm(anomaly, voxel_size)
    anomaly = jnp.where(cb_mask > 0.5, anomaly_cb, anomaly)

    tissue_sum = jnp.sum((label2s > 0.5).astype(jnp.float32), axis=0)
    tissue_majority = (tissue_sum > (K / 2.0)).astype(jnp.float32)
    anomaly = anomaly * tissue_majority

    base = (anomaly, m_valid, x, avg_label, curve_x, curve_y, curve_r,
            curve_rs, threshold)
    if not debug:
        return base
    # back-solve the per-voxel intensity threshold from the anomaly
    # threshold: thr = (t-mu)^2/(2 sigma^2) + log(sigma*sqrt(2pi)) solved
    # for t on the '+' side (lesion_analysis.py:245-251; sqrt of a negative
    # discriminant -> nan, i.e. no intensity reaches the threshold there)
    d = 2.0 * (threshold - jnp.log(x_std * 2.506))
    x_thr = x_mean + x_std * jnp.sqrt(jnp.where(d < 0, jnp.nan, d))
    dbg = {
        "intensity_thr": x_thr * m_valid,
        "rough_brain": m_rough,
        "local_mean": x_mu,
        "mean_value": x_mean,
        "std_value": x_std * m_valid,
        "ref_aligned": refs,
        "ref_anomaly": anomaly_refs,
    }
    return base + (dbg,)


_NLL_STATIC = (
    "patch_size",
    "voxel_size",
    "num_label_classes",
    "side",
    "apply_otsu",
    "mean_correction",
    "debug",
)

nll_analysis_core = functools.partial(
    jax.jit, static_argnames=_NLL_STATIC
)(_nll_core_impl)


@functools.partial(jax.jit, static_argnames=_NLL_STATIC[:-1])
def _nll_batch_jit(xs, refs, l1s, l2s, patch_size, voxel_size,
                   num_label_classes, side="+", apply_otsu=True,
                   mean_correction=True):
    f = functools.partial(
        _nll_core_impl,
        patch_size=patch_size,
        voxel_size=voxel_size,
        num_label_classes=num_label_classes,
        side=side,
        apply_otsu=apply_otsu,
        mean_correction=mean_correction,
    )
    return jax.vmap(f)(xs, refs, l1s, l2s)


def nll_analysis_batch(xs, refs, l1s, l2s, *, patch_size, voxel_size,
                       num_label_classes, side="+", apply_otsu=True,
                       mean_correction=True, mesh=None):
    """Stage-1 analysis for a BATCH of same-geometry cases as one vmapped
    XLA program — the TPU counterpart of the reference's stage-1 process
    pool (lesion_analysis.py:409-421). Same-protocol cohorts share shape/
    spacing, so the whole batch runs one compiled program; with `mesh`, the
    case axis is sharded across devices exactly as register_pairs_mesh
    shards registration pairs (registration/group.py:74-126).

    xs [B,D,H,W]; refs/l1s/l2s [B,K,D,H,W]. Returns the per-case tuple of
    nll_analysis_core with a leading batch axis."""
    B = xs.shape[0]
    pad = 0
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        axis = mesh.axis_names[0]
        n_dev = int(mesh.shape[axis])
        pad = (-B) % n_dev
        if pad:
            rep = lambda a: jnp.concatenate(
                [a, jnp.repeat(a[-1:], pad, axis=0)], axis=0
            )
            xs, refs, l1s, l2s = rep(xs), rep(refs), rep(l1s), rep(l2s)
        sharding = NamedSharding(mesh, P(axis))
        xs, refs, l1s, l2s = (
            jax.device_put(a, sharding) for a in (xs, refs, l1s, l2s)
        )
    out = _nll_batch_jit(
        xs, refs, l1s, l2s, patch_size, voxel_size, num_label_classes,
        side, apply_otsu, mean_correction,
    )
    if pad:
        out = tuple(o[:B] for o in out)
    return out


def patch_size_from_voxel(voxel_size):
    """ceil(50 mm / pixdim) per axis (lesion_analysis.py:126-132)."""
    return tuple(int(math.ceil(PHYSICAL_PATCH_MM / float(v))) for v in voxel_size)


class LesionAnalyzer:
    """Host orchestration: NIfTI in, idempotent artifacts out
    (reference LesionAnalyzer, lesion_analysis.py:358-461)."""

    def __init__(self, output_folder: str, logger: SimpleTxtLog = None):
        self.output_folder = mkdir(output_folder)
        self.data_dict = {}
        self.logger = logger
        self.time_stamps = TimeStamps()

    def log(self, msg):
        if self.logger is not None:
            self.logger.write(msg)
        print(msg, flush=True)

    def add_case(self, name, x_input, x_refs, label1, label2):
        self.data_dict[name] = {"x": x_input, "r": x_refs, "m": label1, "y": label2}

    # ------------------------------------------------------------------ #

    def _load_case(self, case: str):
        """Host IO for one case: the input + K reference/label gzip volumes
        (~3K files) — threaded here so the driver loop can prefetch the
        next case while the current one computes on device."""
        info = self.data_dict[case]
        x_raw, hdr = nifti.load_nifti(info["x"])
        # round so float32 header jitter can't defeat the jit cache across
        # same-protocol cases
        voxel_size = tuple(round(v, 4) for v in nifti.get_nifti_pixdim(info["x"]))
        from deepwmh_tpu.utils.parallel import run_parallel

        nr, nm = len(info["r"]), len(info["m"])
        paths = list(info["r"]) + list(info["m"]) + list(info["y"])
        vols = run_parallel(nifti.load_nifti_simple, paths, show_progress=False)
        refs = np.stack(vols[:nr])
        l1 = np.stack(vols[nr : nr + nm])
        l2 = np.stack(vols[nr + nm :])
        return x_raw, hdr, voxel_size, refs, l1, l2

    def analyze_case(self, case: str, intensity_prior="+", apply_otsu=True,
                     loaded=None, debug=False) -> AnalysisResult:
        x_raw, hdr, voxel_size, refs, l1, l2 = loaded or self._load_case(case)
        patch = patch_size_from_voxel(voxel_size)
        num_classes = int(np.max(l2.astype(np.int64))) + 1

        out = nll_analysis_core(
            jnp.asarray(x_raw),
            jnp.asarray(refs),
            jnp.asarray(l1),
            jnp.asarray(l2),
            patch_size=patch,
            voxel_size=voxel_size,
            num_label_classes=num_classes,
            side=intensity_prior,
            apply_otsu=apply_otsu,
            debug=debug,
        )
        dbg = None
        if debug:
            out, dbg = out[:-1], {k: np.asarray(v) for k, v in out[-1].items()}
        (anomaly, m_valid, x_norm, avg_label, cx, cy, cr, crs, thr) = [
            np.asarray(o) for o in out
        ]
        return AnalysisResult(
            anomaly, m_valid, x_norm, avg_label, cx, cy, cr, crs, float(thr),
            debug=dbg,
        ), hdr, voxel_size

    def _save_debug(self, case_dir, result, hdr):
        """Debug-mode intermediates (reference lesion_analysis.py:259-277):
        the back-solved per-voxel intensity threshold, rough brain mask,
        local mean, cohort mean/std, and per-reference aligned images +
        anomaly maps under references/."""
        dbg = result.debug
        for key in ("intensity_thr", "rough_brain", "local_mean",
                    "mean_value", "std_value"):
            nifti.save_nifti(dbg[key], hdr, join_path(case_dir, key + ".nii.gz"))
        ref_dir = mkdir(join_path(case_dir, "references"))
        for k in range(dbg["ref_aligned"].shape[0]):
            nifti.save_nifti(
                dbg["ref_aligned"][k], hdr,
                join_path(ref_dir, "ref%02d.nii.gz" % k),
            )
            nifti.save_nifti(
                dbg["ref_anomaly"][k], hdr,
                join_path(ref_dir, "ref%02d_anomaly.nii.gz" % k),
            )

    def _save_case_artifacts(self, case, result, hdr, intensity_prior):
        case_dir = join_path(self.output_folder, case)
        if result.debug is not None:
            self._save_debug(case_dir, result, hdr)
        nifti.save_nifti(
            result.normalized_input, hdr, join_path(case_dir, "normalized_input.nii.gz")
        )
        nifti.save_nifti(
            result.anomaly, hdr, join_path(case_dir, "anomaly_score.nii.gz")
        )
        nifti.save_nifti(
            result.valid_mask, hdr, join_path(case_dir, "valid_mask.nii.gz")
        )
        nifti.save_nifti(
            result.averaged_label, hdr, join_path(case_dir, "averaged_label.nii.gz")
        )
        shutil.copyfile(
            self.data_dict[case]["x"],
            join_path(case_dir, "preprocessed_image.nii.gz"),
        )
        summary = {
            "preprocessed_image": self.data_dict[case]["x"],
            "intensity_prior": intensity_prior,
            "autoseg_threshold": result.threshold,
            "histogram_curves": {
                "x": result.curve_x.tolist(),
                "y": result.curve_y.tolist(),
                "r": result.curve_r.tolist(),
            },
        }
        # per-case histogram curve plot (lesion_analysis.py:198-199)
        try:
            from deepwmh_tpu.eval.plots import hist_curve_plot

            hist_curve_plot(
                result.curve_x,
                result.curve_y,
                result.curve_r,
                result.curve_rs,
                join_path(case_dir, "histogram_curves.png"),
            )
        except Exception as e:  # plotting must never kill analysis
            self.log("histogram plot failed for %s: %s" % (case, e))
        # summary.json is the completion marker: written LAST
        atomic_write_json(summary, join_path(case_dir, "summary.json"))

    def _auto_batch_cases(self, shape, K, n_devices: int = 1) -> int:
        """Cases per XLA program: the core holds ~5 K-stacked f32 volumes
        per case, budgeted at ~6 GB of HBM PER DEVICE. With a mesh the
        batch rounds to a device multiple (nll_analysis_batch pads partial
        batches by repeating a case — a full multiple wastes nothing) and
        is capped at 4 rounds per device."""
        vox = int(np.prod(shape))
        per_case = (5 * K + 10) * 4 * vox
        per_device = int(max(1, 6_000_000_000 // max(per_case, 1)))
        if n_devices <= 1:
            return min(8, per_device)
        return min(4 * n_devices, max(1, per_device) * n_devices)

    def analyze_and_do_segmentation(self, intensity_prior="+", do_postprocessing=True,
                                    debug=False, batch_cases="auto", mesh=None):
        """batch_cases: how many same-geometry cases to fuse into one
        vmapped program ('auto' sizes by HBM; 1 = per-case). mesh: shard
        the case batch across devices (see nll_analysis_batch)."""
        from concurrent.futures import ThreadPoolExecutor

        self.time_stamps.record("segmentation_start")
        todo = []
        for case in self.data_dict:
            case_dir = mkdir(join_path(self.output_folder, case))
            if os.path.isfile(join_path(case_dir, "summary.json")):
                self.log("case %s: summary exists, skip analysis" % case)
            else:
                todo.append(case)

        # group same-geometry cases (same-protocol cohorts share shape and
        # spacing) so each group runs as batched XLA programs
        groups = {}
        for case in todo:
            info = self.data_dict[case]
            hdr = nifti.get_nifti_header(info["x"])
            shape = tuple(int(s) for s in hdr.shape[:3])
            voxel = tuple(
                round(v, 4) for v in nifti.get_nifti_pixdim(info["x"])
            )
            key = (shape, voxel, len(info["r"]))
            groups.setdefault(key, []).append(case)

        chunks = []
        for (shape, voxel, K), cases in groups.items():
            if batch_cases == "auto":
                # batching pays when the case axis shards across a MESH; on
                # a single device the vmapped program is measured SLOWER
                # than the per-case path (bench.py bench_nll), so auto
                # batches only under a mesh
                B = (
                    self._auto_batch_cases(shape, K, int(mesh.size))
                    if mesh is not None
                    else 1
                )
            else:
                B = max(int(batch_cases), 1)
            if debug:
                B = 1  # debug intermediates are a per-case artifact set
            chunks += [cases[i : i + B] for i in range(0, len(cases), B)]

        def load_chunk(cases):
            return [self._load_case(c) for c in cases]

        with ThreadPoolExecutor(max_workers=1) as pool:
            load_future = (
                pool.submit(load_chunk, chunks[0]) if chunks else None
            )
            for ci, chunk in enumerate(chunks):
                loaded_chunk = load_future.result()
                if ci + 1 < len(chunks):  # prefetch the next chunk's IO
                    load_future = pool.submit(load_chunk, chunks[ci + 1])
                if len(chunk) == 1:
                    case = chunk[0]
                    self.log("analyzing case %s" % case)
                    result, hdr, _ = self.analyze_case(
                        case, intensity_prior=intensity_prior,
                        loaded=loaded_chunk[0], debug=debug,
                    )
                    self._save_case_artifacts(case, result, hdr, intensity_prior)
                    continue
                self.log(
                    "analyzing cases %s (one batched program)"
                    % ", ".join(chunk)
                )
                self._analyze_chunk_batched(
                    chunk, loaded_chunk, intensity_prior, mesh
                )

        # segmentation (reference _parallel_segmentation) — for EVERY case,
        # including ones whose analysis was skipped as already done (a
        # deleted/corrupt segmentation must be recomputable from artifacts)
        for case in self.data_dict:
            case_dir = join_path(self.output_folder, case)
            summary_path = join_path(case_dir, "summary.json")
            seg_path = join_path(case_dir, "segmentation.nii.gz")
            if not nifti.try_load_nifti(seg_path):
                with open(summary_path) as f:
                    summary = json.load(f)
                thr = summary["autoseg_threshold"]
                anomaly = nifti.load_nifti_simple(join_path(case_dir, "anomaly_score.nii.gz"))
                hdr = nifti.get_nifti_header(join_path(case_dir, "preprocessed_image.nii.gz"))
                seg = (anomaly > thr).astype(np.float32)
                nifti.save_nifti(seg, hdr, seg_path)
                with open(join_path(case_dir, "segmentation.txt"), "w") as f:
                    f.write("case name: %s\n" % case)
                    f.write("segmentation threshold: %.4f\n" % thr)

            # post-processing: 3mm spark removal
            if do_postprocessing:
                pp_path = join_path(case_dir, "segmentation_pp.nii.gz")
                if not nifti.try_load_nifti(pp_path):
                    voxel_size = nifti.get_nifti_pixdim(
                        join_path(case_dir, "preprocessed_image.nii.gz")
                    )
                    seg = nifti.load_nifti_simple(seg_path)
                    hdr = nifti.get_nifti_header(
                        join_path(case_dir, "preprocessed_image.nii.gz")
                    )
                    seg_pp = np.asarray(remove_3mm_sparks(jnp.asarray(seg), voxel_size))
                    nifti.save_nifti(seg_pp, hdr, pp_path)

        self.time_stamps.record("segmentation_end")
        self.log("stage-1 analysis finished for %d case(s)" % len(self.data_dict))

    def _analyze_chunk_batched(self, chunk, loaded_chunk, intensity_prior, mesh):
        # cases in a chunk share geometry; num_label_classes must also
        # agree for one program — sub-split the rare disagreements
        per_case_classes = [
            int(np.max(l2.astype(np.int64))) + 1
            for (_x, _h, _v, _r, _l1, l2) in loaded_chunk
        ]
        by_classes = {}
        for i, c in enumerate(per_case_classes):
            by_classes.setdefault(c, []).append(i)
        for num_classes, idxs in by_classes.items():
            cases = [chunk[i] for i in idxs]
            loads = [loaded_chunk[i] for i in idxs]
            x_raw, hdr, voxel_size = loads[0][0], loads[0][1], loads[0][2]
            patch = patch_size_from_voxel(voxel_size)
            if len(cases) == 1:
                result, hdr, _ = self.analyze_case(
                    cases[0], intensity_prior=intensity_prior, loaded=loads[0]
                )
                self._save_case_artifacts(cases[0], result, hdr, intensity_prior)
                continue
            xs = jnp.asarray(np.stack([ld[0] for ld in loads]))
            refs = jnp.asarray(np.stack([ld[3] for ld in loads]))
            l1s = jnp.asarray(np.stack([ld[4] for ld in loads]))
            l2s = jnp.asarray(np.stack([ld[5] for ld in loads]))
            out = nll_analysis_batch(
                xs, refs, l1s, l2s,
                patch_size=patch, voxel_size=voxel_size,
                num_label_classes=num_classes, side=intensity_prior,
                mesh=mesh,
            )
            out = [np.asarray(o) for o in out]
            for i, case in enumerate(cases):
                result = AnalysisResult(
                    out[0][i], out[1][i], out[2][i], out[3][i],
                    out[4][i], out[5][i], out[6][i], out[7][i],
                    float(out[8][i]),
                )
                self._save_case_artifacts(
                    case, result, loads[i][1], intensity_prior
                )

