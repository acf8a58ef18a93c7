"""Headline benchmark: FLAIR volumes/min/chip (preprocess + inference).

Runs the flagship path on a synthetic 1mm-isotropic T2-FLAIR head volume
(192x224x192, the OASIS-3-like shape): N4 bias-field correction (3x50
iterations, shrink 2 — the reference's exact budget), resample + z-score
preprocessing and Gaussian sliding-window 3D U-Net inference with full
8-way mirror TTA — the same semantics as the reference's DeepWMH_predict
(deepwmh/main/predict.py:16-17,153-156).

Baseline: BASELINE.md target of <10 s/volume => 6 volumes/min/chip.
Prints ONE JSON line.
"""

from __future__ import annotations

import json
import time

import jax
import numpy as np

BASELINE_VOL_PER_MIN = 6.0  # 10 s/volume target from BASELINE.md


def make_synthetic_flair(shape=(192, 224, 192), seed=0):
    rng = np.random.RandomState(seed)
    zz, yy, xx = np.meshgrid(
        np.linspace(-1, 1, shape[0]),
        np.linspace(-1, 1, shape[1]),
        np.linspace(-1, 1, shape[2]),
        indexing="ij",
    )
    r = np.sqrt(zz**2 + yy**2 + xx**2)
    head = (r < 0.85).astype(np.float32)
    tex = rng.rand(*shape).astype(np.float32)
    return head * (400 + 150 * tex) + 30 * rng.rand(*shape).astype(np.float32)


def main():
    from deepwmh_tpu.utils.compilation_cache import enable_compilation_cache

    enable_compilation_cache()

    import jax.numpy as jnp

    from deepwmh_tpu.unet.infer import SlidingWindowPredictor
    from deepwmh_tpu.unet.model import UNet3D, init_params
    from deepwmh_tpu.unet.plan import default_plan_1mm_iso

    plan = default_plan_1mm_iso()
    model = UNet3D(plan=plan)
    params = init_params(model, jax.random.PRNGKey(0))
    predictor = SlidingWindowPredictor(model, params, plan, tta=True)

    vol = make_synthetic_flair()
    spacing = [1.0, 1.0, 1.0]

    def full_pipeline(raw):
        # one fused jit: N4 -> preprocess -> sliding window -> resample back
        return predictor.predict_case(jnp.asarray(raw), spacing, apply_n4=True)

    # warmup / compile
    seg, fg = full_pipeline(vol)
    jax.block_until_ready(fg)

    # throughput measurement: dispatch all volumes asynchronously (JAX
    # queues the fused programs; transfers overlap compute) and block once
    n_runs = 6
    t0 = time.time()
    outs = [full_pipeline(vol) for _ in range(n_runs)]
    jax.block_until_ready(outs)
    per_volume = (time.time() - t0) / n_runs

    vol_per_min = 60.0 / per_volume
    print(
        json.dumps(
            {
                "metric": "FLAIR volumes/min/chip (N4+preproc+inference, mirror TTA)",
                "value": round(vol_per_min, 3),
                "unit": "volumes/min/chip",
                "vs_baseline": round(vol_per_min / BASELINE_VOL_PER_MIN, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
