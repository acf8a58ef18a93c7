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
    """Per-truth-component Dice list: for each ground-truth lesion, the Dice
    of the prediction restricted to that component's bounding neighborhood
    (reference metrics.py:304-536, the lesion-size scatter data)."""
    p = np.asarray(pred) > threshold
    t = np.asarray(truth) > threshold
    t_lbl, t_n = _label_np(t)
    # vectorized: component sizes and per-component intersections in two
    # bincount passes (pd == p AND component, so |pd| is the intersection)
    sizes = np.bincount(t_lbl.ravel(), minlength=t_n + 1)[1:]
    inter = np.bincount(t_lbl[p].ravel(), minlength=t_n + 1)[1:]
    dice = 2.0 * inter / np.maximum(sizes + inter, 1)
    return [(int(s), float(d)) for s, d in zip(sizes, dice)]


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


class BinaryDiceEvaluation:
    """The reference experiments' evaluation harness
    (deepwmh/analysis/metrics.py:264-298, used by
    experiments/010_OASIS3/run_Siemens_Biograph_mMR.py:282-289): register
    named *methods* as case -> file mappings, then compare any two methods
    with voxel-wise hard Dice across the subject list."""

    def __init__(self, subject_list):
        self.subjects = list(subject_list)
        self.methods = {}

    def add_method(self, name: str, path_fn):
        """path_fn: case name -> prediction/annotation file path."""
        self.methods[name] = path_fn

    def get_subject_list(self):
        return list(self.subjects)

    def run_eval(self, method_a: str, method_b: str, num_workers: int = 4):
        """Per-subject Dice of method_a vs method_b (order irrelevant)."""
        fa, fb = self.methods[method_a], self.methods[method_b]
        ev = PairedEvaluation()
        for case in self.subjects:
            ev.add_pair(case, fa(case), fb(case))
        res = ev.run(metrics=("dice",), num_workers=num_workers)
        return [res[case]["dice"] for case in self.subjects]


def summarize(results: dict) -> dict:
    """Mean/std per metric across cases."""
    keys = set()
    for row in results.values():
        keys.update(row.keys())
    out = {}
    for k in sorted(keys):
        vals = [row[k] for row in results.values() if k in row]
        out[k] = {"mean": float(np.mean(vals)), "std": float(np.std(vals)), "n": len(vals)}
    return out
