"""Measured adoption decision for ConvNormAct(fused_stats=True).

The Pallas one-pass instance-norm moments kernel
(ops/pallas_kernels.instance_norm_stats_pallas) targets the ~16 ms/flip
DRAM-bound `convert_reduce` statistics fusions identified in docs/PERF.md
"Remaining theoretical headroom" — the cheapest slice of the sweep's
non-conv overhead. This study measures, on the real chip at the bench
fullvol shape, the full 8-flip TTA sweep with the fused path ON vs OFF
(same parameters — the param trees are interchangeable by construction)
plus the numerical agreement of the output probabilities. The result is
recorded in docs/PERF.md and decides whether inference enables the kernel
by default on TPU.

Usage:  python experiments/studies/fused_stats_study.py
Prints JSON to stdout, progress to stderr. Runtime ~6-10 min on one v5e.
"""

from __future__ import annotations

import json
import statistics
import sys
import time

import numpy as np


def log(msg):
    print(msg, file=sys.stderr, flush=True)


BENCH_SHAPE = (192, 224, 192)


def main():
    import jax
    import jax.numpy as jnp

    from deepwmh_tpu.unet.infer import (
        ALL_FLIPS,
        SlidingWindowPredictor,
        fullvol_shape,
        fullvol_tta,
    )
    from deepwmh_tpu.unet.model import UNet3D, init_params
    from deepwmh_tpu.unet.plan import default_plan_1mm_iso
    from deepwmh_tpu.unet.preprocess import pad_to, preprocess_case

    plan = default_plan_1mm_iso()
    rng = np.random.RandomState(0)
    vol = (rng.rand(*BENCH_SHAPE) * 400).astype(np.float32)
    pre = jax.jit(lambda v: preprocess_case(v, [1.0, 1.0, 1.0], plan))(
        jnp.asarray(vol)
    )
    target = fullvol_shape(pre.shape, plan)
    padded = pad_to(pre, target)
    jax.block_until_ready(padded)
    log("padded fullvol shape: %s" % (target,))

    base = UNet3D(plan=plan)
    params = init_params(base, jax.random.PRNGKey(0))

    results = {}
    probs = {}
    for name, fused in (("baseline", False), ("fused_stats", True)):
        model = UNet3D(plan=plan, fused_stats=fused)
        pred = SlidingWindowPredictor(model, params, plan, tta=True)

        def sweep(p, v, _apply=pred._apply):
            return fullvol_tta(p, v, _apply, int(plan.num_classes), ALL_FLIPS)

        fn = jax.jit(sweep)
        out = fn(params, padded)
        jax.block_until_ready(out)  # compile
        probs[name] = out
        ts = []
        for _ in range(6):
            t0 = time.time()
            o = fn(params, padded)
            float(jnp.sum(o[..., 1]))  # force full pull-through sync
            ts.append(time.time() - t0)
        med = statistics.median(ts)
        best = min(ts)
        log("%s: median %.3fs best %.3fs (all: %s)"
            % (name, med, best, ["%.3f" % t for t in ts]))
        results[name] = {"median_s": round(med, 3), "best_s": round(best, 3)}

    diff = float(jnp.max(jnp.abs(
        probs["baseline"].astype(jnp.float32)
        - probs["fused_stats"].astype(jnp.float32)
    )))
    agree = float(jnp.mean(
        (jnp.argmax(probs["baseline"], -1) == jnp.argmax(probs["fused_stats"], -1))
        .astype(jnp.float32)
    ))
    out = {
        "sweep": results,
        "speedup_median": round(
            results["baseline"]["median_s"] / results["fused_stats"]["median_s"], 3
        ),
        "speedup_best": round(
            results["baseline"]["best_s"] / results["fused_stats"]["best_s"], 3
        ),
        "max_abs_prob_diff": diff,
        "argmax_agreement": agree,
        "device": jax.devices()[0].device_kind,
    }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
