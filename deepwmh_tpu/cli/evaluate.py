"""DeepWMH_evaluate — segmentation accuracy evaluation CLI.

Covers the reference's evaluation entry points (deepwmh/analysis/metrics.py
BinaryDiceEvaluation and friends, used by experiments/010_OASIS3/*:266-300):
voxel Dice, precision/recall and instance F1 between a prediction folder
and a ground-truth folder, written as CSV + JSON summary.
"""

from __future__ import annotations

import argparse
import json
import os

from deepwmh_tpu.core.artifacts import atomic_write_json
from deepwmh_tpu.eval.metrics import PairedEvaluation, summarize


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="Evaluate predicted segmentations against ground truth.",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
    )
    parser.add_argument("-p", "--predictions", type=str, required=True,
                        help="Folder with predicted <case>.nii.gz files.")
    parser.add_argument("-g", "--ground-truth", type=str, required=True,
                        help="Folder with ground-truth <case>.nii.gz files.")
    parser.add_argument("-o", "--output", type=str, required=True,
                        help="Output report path (.json).")
    parser.add_argument("--metrics", nargs="+",
                        choices=["dice", "precision_recall", "instance_f1",
                                 "instance_precision_recall", "component_dice"],
                        default=["dice", "precision_recall", "instance_f1"])
    args = parser.parse_args(argv)

    ev = PairedEvaluation()
    n = 0
    seen = set()
    for f in sorted(os.listdir(args.predictions)):
        if f.endswith(".nii.gz"):
            case = f[: -len(".nii.gz")]
        elif f.endswith(".nii"):
            case = f[: -len(".nii")]
        else:
            continue
        if case in seen:
            print("[skip] duplicate prediction variant for %s (%s)" % (case, f))
            continue
        seen.add(case)
        truth = os.path.join(args.ground_truth, f)
        if not os.path.isfile(truth):
            # the truth may use the other compression variant
            for alt in (case + ".nii.gz", case + ".nii"):
                if os.path.isfile(os.path.join(args.ground_truth, alt)):
                    truth = os.path.join(args.ground_truth, alt)
                    break
            else:
                print("[skip] no ground truth for %s" % f)
                continue
        ev.add_pair(case, os.path.join(args.predictions, f), truth)
        n += 1
    results = ev.run(metrics=tuple(args.metrics))
    report = {"cases": results, "summary": summarize(results)}
    atomic_write_json(report, args.output)
    print(json.dumps(report["summary"], indent=2))
    print("report written to %s (%d case(s))" % (args.output, n))


if __name__ == "__main__":
    main()
