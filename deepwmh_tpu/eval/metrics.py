"""Evaluation metrics: voxel Dice, precision/recall, instance F1,
per-component Dice, and a file-pair evaluation harness.

Rebuild of deepwmh/analysis/metrics.py (C12 in SURVEY.md §2): the accuracy
north star is voxel-wise hard Dice against expert raters
(experiments/010_OASIS3/run_Siemens_Biograph_mMR.py:282-300). Heavy array
math accepts numpy or jax arrays; instance metrics use the framework's own
connected-components op.
"""

from __future__ import annotations

import numpy as np


def hard_dice_binary(a, b, threshold: float = 0.5) -> float:
    """Voxel-wise hard Dice (reference metrics.py:26-32)."""
    a = np.asarray(a) > threshold
    b = np.asarray(b) > threshold
    inter = np.logical_and(a, b).sum()
    denom = a.sum() + b.sum()
    if denom == 0:
        return 1.0
    return float(2.0 * inter / denom)


def voxel_precision_recall(pred, truth, threshold: float = 0.5):
    """(precision, recall) at the voxel level (reference metrics.py:34-44)."""
    p = np.asarray(pred) > threshold
    t = np.asarray(truth) > threshold
    tp = np.logical_and(p, t).sum()
    precision = float(tp / p.sum()) if p.sum() > 0 else 0.0
    recall = float(tp / t.sum()) if t.sum() > 0 else 0.0
    return precision, recall


def _label_np(mask):
    """Host connected components (6-connectivity): native union-find when
    the C++ layer is built, JAX min-propagation otherwise."""
    from deepwmh_tpu.native import label_components_host

    native = label_components_host(np.asarray(mask))
    if native is not None:
        return native

    import jax.numpy as jnp

    from deepwmh_tpu.ops.components import label_components

    lbl = np.asarray(label_components(jnp.asarray(mask.astype(np.float32))))
    N = mask.size
    fg = lbl < N
    # compact ids 1..n
    roots, inv = np.unique(lbl[fg], return_inverse=True)
    out = np.zeros(mask.shape, np.int32)
    out[fg] = inv + 1
    return out, len(roots)


def instance_confusion(pred, truth, threshold: float = 0.5):
    """Instance-level TP/FP/FN: a predicted component is a TP if it overlaps
    any truth voxel; a truth component is detected if it overlaps any
    prediction (reference metrics.py:46-76)."""
    p = np.asarray(pred) > threshold
    t = np.asarray(truth) > threshold
    p_lbl, p_n = _label_np(p)
    t_lbl, t_n = _label_np(t)
    # one bincount pass over the overlap voxels instead of a Python loop of
    # full-volume scans per component — O(voxels) total, not
    # O(components x voxels) (round-1 weak item; the reference is the slow
    # form, metrics.py:46-76)
    p_hit = np.bincount(p_lbl[t].ravel(), minlength=p_n + 1)[1:] > 0
    tp = int(p_hit.sum())
    fp = p_n - tp
    t_hit = np.bincount(t_lbl[p].ravel(), minlength=t_n + 1)[1:] > 0
    fn = t_n - int(t_hit.sum())
    return tp, fp, fn


def instance_f1(pred, truth, threshold: float = 0.5) -> float:
    tp, fp, fn = instance_confusion(pred, truth, threshold)
    denom = 2 * tp + fp + fn
    return float(2 * tp / denom) if denom > 0 else 1.0


def binary_component_dice(pred, truth, threshold: float = 0.5):
    """Per-truth-component Dice list, sorted by lesion size: for each
    ground-truth lesion cT, Dice(cT, cP) where cP is the FULL extent of every
    predicted component overlapping cT, minus voxels belonging to OTHER truth
    lesions (reference metrics.py:304-325: `mP` is the union of the touching
    predicted components, `cP = (mP - (yt - cT)) > 0.5`). Over-segmentation
    therefore lowers the per-lesion Dice — the prediction is NOT clipped to
    the truth component. Vectorized with bincount passes over (truth, pred)
    component-pair overlaps instead of the reference's per-component
    full-volume loops."""
    p = np.asarray(pred) > threshold
    t = np.asarray(truth) > threshold
    t_lbl, t_n = _label_np(t)
    if t_n == 0:
        return []
    p_lbl, p_n = _label_np(p)
    size_t = np.bincount(t_lbl.ravel(), minlength=t_n + 1)
    size_p = np.bincount(p_lbl.ravel(), minlength=p_n + 1)
    # per predicted component: how many of its voxels lie on ANY truth lesion
    p_on_truth = np.bincount(p_lbl[t].ravel(), minlength=p_n + 1)
    # (truth, pred) overlap counts for touching pairs
    both = t & (p_lbl > 0)
    pair = t_lbl[both].astype(np.int64) * (p_n + 1) + p_lbl[both]
    uniq, counts = np.unique(pair, return_counts=True)
    t_of = (uniq // (p_n + 1)).astype(np.int64)
    p_of = (uniq % (p_n + 1)).astype(np.int64)
    # |cT ∧ cP| = total overlap of cT with its touching predicted comps
    inter_t = np.bincount(t_of, weights=counts, minlength=t_n + 1)
    # |cP| = Σ over touching preds of (full size − voxels on other truth
    # lesions) = Σ (size_p − p_on_truth + overlap-with-this-lesion)
    cp_size = np.bincount(
        t_of, weights=size_p[p_of] - p_on_truth[p_of] + counts,
        minlength=t_n + 1)
    dice = 2.0 * inter_t / np.maximum(size_t + cp_size, 1)
    out = [(int(size_t[i]), float(dice[i])) for i in range(1, t_n + 1)]
    return sorted(out, key=lambda e: e[0])


def _eval_one(pred_path, truth_path, metrics):
    from deepwmh_tpu.core import nifti

    pred = nifti.load_nifti_simple(pred_path)
    truth = nifti.load_nifti_simple(truth_path)
    row = {}
    for m in metrics:
        if m == "dice":
            row[m] = hard_dice_binary(pred, truth)
        elif m == "precision_recall":
            row["precision"], row["recall"] = voxel_precision_recall(pred, truth)
        elif m == "instance_f1":
            row[m] = instance_f1(pred, truth)
        elif m == "instance_precision_recall":
            row["tp"], row["fp"], row["fn"] = instance_confusion(pred, truth)
        elif m == "component_dice":
            row[m] = binary_component_dice(pred, truth)
        else:
            raise ValueError("unknown metric %r" % m)
    return row


class PairedEvaluation:
    """Evaluate (prediction file, truth file) pairs with named methods —
    the reference's PairedEvaluation with both serial and PARALLEL modes
    (deepwmh/analysis/metrics.py:175-262). Parallelism is a thread pool:
    the work is gzip decompression (releases the GIL) + numpy reductions."""

    def __init__(self):
        self.pairs = []

    def add_pair(self, name: str, pred_path: str, truth_path: str):
        self.pairs.append((name, pred_path, truth_path))

    def run(self, metrics=("dice",), num_workers: int = 1) -> dict:
        if num_workers > 1:
            from deepwmh_tpu.utils.parallel import run_parallel

            rows = run_parallel(
                lambda args: _eval_one(args[0], args[1], metrics),
                [(p, t) for _, p, t in self.pairs],
                num_workers=num_workers,
            )
            return {name: row for (name, _, _), row in zip(self.pairs, rows)}
        return {
            name: _eval_one(p, t, metrics) for name, p, t in self.pairs
        }


class MethodEvaluation:
    """The reference experiments' evaluation harness base
    (deepwmh/analysis/metrics.py:120-262): register named *methods* as
    case -> file mappings, then compare any two methods across the subject
    list with this class's metric. Operand order follows the reference: for
    asymmetric metrics, method_a is the ground truth and method_b the
    prediction (metrics.py:276-298 operand-order warnings). With
    allow_null=True a method may map a case to None, which evaluates as an
    all-background volume shaped like the other operand
    (metrics.py:202-213)."""

    @staticmethod
    def _metric(truth, pred):  # override in subclasses
        raise NotImplementedError

    def __init__(self, subject_list):
        self.subjects = list(subject_list)
        self.methods = {}

    def add_method(self, name: str, path_fn):
        """path_fn: case name -> prediction/annotation file path (or None
        with allow_null)."""
        self.methods[name] = path_fn

    def get_subject_list(self):
        return list(self.subjects)

    def _eval_case(self, case, fa, fb, allow_null):
        from deepwmh_tpu.core import nifti

        file_a, file_b = fa(case), fb(case)
        if not allow_null and (file_a is None or file_b is None):
            raise RuntimeError(
                'subject "%s": NULL file is not allowed (allow_null=False)'
                % case)
        if file_a is None and file_b is None:
            raise RuntimeError(
                'subject "%s": no valid file found for evaluation' % case)
        a = nifti.load_nifti_simple(file_a) if file_a is not None else None
        b = nifti.load_nifti_simple(file_b) if file_b is not None else None
        if a is None:
            a = np.zeros_like(b)
        if b is None:
            b = np.zeros_like(a)
        if a.shape != b.shape:
            raise RuntimeError(
                'subject "%s": shapes not equal: %s vs %s'
                % (case, a.shape, b.shape))
        return self._metric(a, b)

    def run_eval(self, method_a: str, method_b: str, num_workers: int = 4,
                 allow_null: bool = False):
        """Per-subject metric list of method_a (truth) vs method_b (pred)."""
        fa, fb = self.methods[method_a], self.methods[method_b]
        if num_workers > 1:
            from deepwmh_tpu.utils.parallel import run_parallel

            return run_parallel(
                lambda case: self._eval_case(case, fa, fb, allow_null),
                self.subjects, num_workers=num_workers,
            )
        return [self._eval_case(c, fa, fb, allow_null) for c in self.subjects]

    # reference spelling (metrics.py:223-262)
    run_eval_parallel = run_eval


class BinaryDiceEvaluation(MethodEvaluation):
    """Voxel-wise hard Dice (symmetric) — reference metrics.py:264-267,
    used by experiments/010_OASIS3/run_Siemens_Biograph_mMR.py:282-289."""

    @staticmethod
    def _metric(truth, pred):
        return hard_dice_binary(pred, truth)


class VoxelPrecisionRecallEvaluation(MethodEvaluation):
    """(precision, recall) per subject; method_a must be the ground truth
    (reference metrics.py:268-277)."""

    @staticmethod
    def _metric(truth, pred):
        return voxel_precision_recall(pred, truth)


class InstancePrecisionRecallEvaluation(MethodEvaluation):
    """Instance-level (TP, FP, FN) per subject; method_a must be the ground
    truth (reference metrics.py:279-287)."""

    @staticmethod
    def _metric(truth, pred):
        return instance_confusion(pred, truth)


class InstanceF1Evaluation(MethodEvaluation):
    """Instance-level F1 per subject; method_a must be the ground truth
    (reference metrics.py:289-298)."""

    @staticmethod
    def _metric(truth, pred):
        return instance_f1(pred, truth)


class BinaryComponentDiceEvaluation(MethodEvaluation):
    """Per-lesion (size, Dice) pairs per subject; method_a must be the
    ground truth (reference metrics.py:326-336). Feed the flattened result
    to eval.stats.component_dice_scatter for the reference's lesion-size
    scatter plot (metrics.py:338-536)."""

    @staticmethod
    def _metric(truth, pred):
        return binary_component_dice(pred, truth)


def summarize(results: dict) -> dict:
    """Mean/std per metric across cases. List-valued metrics (component_dice
    rows of per-lesion (size, dice) pairs) aggregate over all lesions of all
    cases: mean/std of the Dice values, n = total lesion count."""
    keys = set()
    for row in results.values():
        keys.update(row.keys())
    out = {}
    for k in sorted(keys):
        vals = [row[k] for row in results.values() if k in row]
        if vals and isinstance(vals[0], (list, tuple)):
            dices = [d for case in vals for (_size, d) in case]
            out[k] = {
                "mean": float(np.mean(dices)) if dices else 0.0,
                "std": float(np.std(dices)) if dices else 0.0,
                "n": len(dices),
            }
        else:
            out[k] = {
                "mean": float(np.mean(vals)),
                "std": float(np.std(vals)),
                "n": len(vals),
            }
    return out
