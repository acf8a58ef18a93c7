"""SVF warm-start study: measured speed + quality vs the cold path.

This is the measurement cited by registration/warm.py and
cli/train.py (--svf-warm-start): docs/PERF.md "SVF warm start" records the
result. Two parts:

1. THROUGHPUT (real TPU, bench shape 192x224x192 @1mm, production
   quick+large preset): a 3x3 cohort registered end-to-end (artifacts
   written, same idempotency contract) cold vs warm. Warm's total work is
   (S-1)+T full-budget pairs (aux row + anchor row) + (S-1)*T shortened
   pairs, so the 3x3 win is modest by construction; the per-pair costs
   measured here (c_full, c_warm) project the win at the reference's own
   cohort scales (deepwmh/main/train.py:184-185), reported alongside.

2. QUALITY (96x112x96 phantoms, distinct anatomies): the non-circular
   label-propagation benchmark (registration/quality.py) scored for the
   SAME (SRC, TGT) pair through the cold svf path and through a warm
   composed-seed pair refined on the shortened schedule.

Usage:  python experiments/studies/warm_start_study.py [--skip-quality]
Writes JSON to stdout; progress to stderr. Runtime ~15-20 min on one v5e.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

import numpy as np

BENCH_SHAPE = (192, 224, 192)


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def make_heads(tmp, n_src, n_tgt):
    """Simple distinct spherical heads at bench shape (throughput only:
    the schedules are static, so pair cost is anatomy-independent)."""
    from deepwmh_tpu.core import nifti

    hdr = nifti.NiftiHeader()
    hdr.set_shape(BENCH_SHAPE)
    hdr.set_zooms((1.0, 1.0, 1.0))
    g = np.meshgrid(
        *[np.linspace(-1, 1, s) for s in BENCH_SHAPE], indexing="ij"
    )

    def head(seed, shift):
        rr = np.sqrt((g[0] - shift) ** 2 + g[1] ** 2 + g[2] ** 2)
        tex = np.random.RandomState(seed).rand(*BENCH_SHAPE).astype(np.float32)
        return ((rr < 0.8) * (300 + 100 * tex)).astype(np.float32)

    srcs, tgts = [], []
    for i in range(n_src):
        p = os.path.join(tmp, "src%d.nii.gz" % i)
        nifti.save_nifti(head(i, 0.03 * (i + 1)), hdr, p)
        srcs.append(("S%d" % i, p))
    for i in range(n_tgt):
        p = os.path.join(tmp, "tgt%d.nii.gz" % i)
        nifti.save_nifti(head(100 + i, -0.02 * (i + 1)), hdr, p)
        tgts.append(("T%d" % i, p))
    return srcs, tgts


def throughput_study(tmp):
    from deepwmh_tpu.registration.group import GroupRegistration

    srcs, tgts = make_heads(tmp, 3, 3)

    # compile warmup: one cold pair + one warm triangle in throwaway dirs
    # (axon compiles server-side per process; the timed sections below must
    # measure execution, not compilation)
    log("warmup: cold pair compile")
    GroupRegistration(
        srcs[:1], tgts[:1], os.path.join(tmp, "warm_cold"),
        quick=True, large_deformation=True,
    ).launch(verbose=False)
    log("warmup: warm triangle compile")
    GroupRegistration(
        srcs[:2], tgts[:1], os.path.join(tmp, "warm_warm"),
        quick=True, large_deformation=True, warm_start=True,
    ).launch(verbose=False)

    log("timed: COLD 3x3 (9 full pairs)")
    t0 = time.time()
    GroupRegistration(
        srcs, tgts, os.path.join(tmp, "cold33"),
        quick=True, large_deformation=True,
    ).launch(verbose=False)
    cold_s = time.time() - t0

    log("timed: WARM 3x3 (2 aux + 3 anchor full, 6 warm pairs)")
    t0 = time.time()
    GroupRegistration(
        srcs, tgts, os.path.join(tmp, "warm33"),
        quick=True, large_deformation=True, warm_start=True,
    ).launch(verbose=False)
    warm_s = time.time() - t0

    n_pairs = 9
    # per-pair cost decomposition: warm total = 5*c_full' + 6*c_warm where
    # c_full' ~ cold's per-pair cost (same program). Solve for c_warm.
    c_full = cold_s / n_pairs
    c_warm = max(warm_s - 5 * c_full, 0.0) / 6.0

    def project(S, T):
        cold = S * T * c_full
        warm = (S - 1 + T) * c_full + (S - 1) * T * c_warm
        return round(cold / warm, 2) if warm > 0 else None

    return {
        "cold_3x3_s": round(cold_s, 1),
        "warm_3x3_s": round(warm_s, 1),
        "cold_pairs_per_min": round(n_pairs / cold_s * 60.0, 2),
        "warm_pairs_per_min": round(n_pairs / warm_s * 60.0, 2),
        "speedup_3x3": round(cold_s / warm_s, 2),
        "c_full_s_per_pair": round(c_full, 2),
        "c_warm_s_per_pair": round(c_warm, 2),
        "projected_speedup": {
            "5x10": project(5, 10),
            "10x50": project(10, 50),
            "10x100": project(10, 100),
        },
    }


def quality_study(tmp):
    from deepwmh_tpu.registration.quality import label_propagation_quality

    out = {}
    for mode in ("svf", "warm"):
        log("quality: mode=%s at 96x112x96" % mode)
        q = label_propagation_quality(
            os.path.join(tmp, "q_%s" % mode), mode=mode,
        )
        out[mode] = q
    return out


def main():
    t0 = time.time()
    res = {}
    with tempfile.TemporaryDirectory() as tmp:
        res["throughput"] = throughput_study(tmp)
        if "--skip-quality" not in sys.argv:
            res["quality"] = quality_study(tmp)
    res["wall_s"] = round(time.time() - t0, 1)
    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
