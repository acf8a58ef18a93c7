"""Full-loop validation of the learned-mode side of the registration
crossover policy (registration/policy.py:LEARNED_CROSSOVER_PAIRS).

Below the crossover the svf default is backed by a full train->predict
measurement (0.931 svf vs 0.780 learned at 15 pairs, docs/PERF.md); this
study is the analogue ABOVE the crossover: 12 refs x 14 patients = 168
pairs (the regime deepwmh/main/train.py:184-185 targets) through the FULL
annotation-free loop (eval/e2e.py) with each mode forced, identical
config/seed, scored by held-out Dice on 2 unseen patients. The result
either validates the policy's most consequential branch (auto -> learned
past 150 pairs) or corrects the crossover constant.

Usage:  python experiments/studies/crossover_e2e_study.py svf|learned
Work dirs persist under /tmp/crossover_study/<mode> (idempotent resume,
same contract as production runs). Prints JSON to stdout.
"""

from __future__ import annotations

import json
import os
import sys
import time


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "svf"
    assert mode in ("svf", "learned"), mode
    from deepwmh_tpu.eval.e2e import run_e2e_accuracy

    work = os.path.join("/tmp/crossover_study", mode)
    t0 = time.time()
    res = run_e2e_accuracy(
        work,
        n_ref=12,
        n_train=14,
        n_test=2,
        seed=0,
        run_stages="full",
        registration_mode=mode,
    )
    out = {
        "mode": mode,
        "n_pairs": 12 * 14,  # refs x training subjects (cli/train.py:188-191)
        "heldout_dice": round(res["dice"], 4),
        "heldout_per_case": {k: round(v, 4) for k, v in res["heldout_dice"].items()},
        "stage1_mean_dice": round(
            sum(res["stage1_dice"].values()) / max(len(res["stage1_dice"]), 1), 4
        ),
        "trainfit_mean_dice": round(
            sum(res["trainfit_dice"].values()) / max(len(res["trainfit_dice"]), 1), 4
        ),
        "wall_s": round(time.time() - t0, 1),
    }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
