"""Error bars for the e2e accuracy north star (VERDICT r4 item 6).

`e2e_dice_synthetic` is tracked by bench.py every round at ONE
(cohort-seed, training-seed) draw; without a variance estimate a future
+-0.03 move is uninterpretable. This study runs the exact bench e2e config
(eval/e2e.py defaults: 64x80x64 @2mm, n_ref=5, n_train=3, n_test=2,
15/25-epoch budget) at additional seeds; docs/PERF.md records mean +-
range across seeds and the bench floor is set with that variance in hand.

Usage:  python experiments/studies/seed_variance_study.py <seed>
Work dirs persist under /tmp/seed_study/<seed> (idempotent resume).
Prints JSON to stdout.
"""

from __future__ import annotations

import json
import os
import sys
import time


def main():
    seed = int(sys.argv[1])
    from deepwmh_tpu.eval.e2e import run_e2e_accuracy

    work = os.path.join("/tmp/seed_study", str(seed))
    t0 = time.time()
    res = run_e2e_accuracy(
        work, n_ref=5, n_train=3, n_test=2, seed=seed, run_stages="full",
    )
    print(json.dumps({
        "seed": seed,
        "heldout_dice": round(res["dice"], 4),
        "heldout_per_case": {k: round(v, 4) for k, v in res["heldout_dice"].items()},
        "wall_s": round(time.time() - t0, 1),
    }, indent=1))


if __name__ == "__main__":
    main()
