"""Registration mode selection: per-pair SVF optimization vs the amortized
learned network.

The reference ships both pathways (ANTs per-pair SyN as the default,
VoxelMorph as the GPU alternative — deepwmh/main/train.py:182-224,
deepwmh/external_tools/VxM_group_registration.py:84-397) and leaves the
choice to the user. `select_registration_mode` makes the choice
automatically from two measured facts (docs/PERF.md "Registration at
scale" and "Registration crossover validated through the full loop"):

1. WALL-CLOCK (one TPU v5e chip, production configs): per-pair costs
   scale with volume voxels; at bench shape (192x224x192 @1mm, 8.26M
   voxels) t_svf_pair = 20.6 s and t_learned_pair ~= 6 s, while the
   learned mode pays a fixed cost (~350 s one-time compiles + ~1450 s of
   voxel-scaled template construction and network training). At the
   reference's own 500-1000-pair workloads learned wins 2.0-2.2x total.

2. QUALITY (full train->predict loop, held-out Dice, identical
   config/seed, each mode forced): svf wins BOTH measured points — 0.931
   vs 0.780 at 15 pairs (64x80x64), and 0.9451 vs 0.8840 at 168 pairs
   (same shape, r05) where learned's fixed cost did not even amortize
   (1936 s vs 1808 s). The per-pair non-circular label-overlap benchmark
   measures the modes equal on distinct anatomies (0.881/0.879), but the
   full loop consistently favors svf at small volumes/cohorts.

Policy: auto picks learned only where its wall-clock win is LARGE —
estimated svf total > QUALITY_INSURANCE_FACTOR (2.0) x learned total,
with per-pair and fixed costs scaled by mean volume voxels. That lands
exactly on the regime PERF measured learned winning (2.0x at 10x50,
2.2x at 10x100 bench-shape pairs) and keeps svf everywhere the full-loop
quality evidence says it is better: a 168-pair small-volume cohort now
correctly resolves to svf (the r04 pairs-only crossover sent it to
learned and lost 0.06 held-out Dice for nothing).
"""

from __future__ import annotations

# Measured on one TPU v5 lite chip at bench shape, 192x224x192 @1mm
# (docs/PERF.md "Registration at scale"):
BENCH_VOXELS = 192 * 224 * 192  # the shape the per-pair costs were measured at
T_SVF_PAIR_S = 20.6             # production preset, artifact-to-artifact
T_LEARNED_PAIR_S = 6.0          # forward 0.8 + fused lift/warp 1.3 + writes
LEARNED_FIXED_COMPILE_S = 350.0  # one-time compiles (voxel-independent)
LEARNED_FIXED_SCALED_S = 1450.0  # template (~19 s/vol x ~10) + 300 train steps
# svf must be this many times slower before auto trades away its measured
# full-loop quality edge (0.931 vs 0.780 at 15 pairs; 0.9451 vs 0.8840 at
# 168 pairs — docs/PERF.md). 2.0 = the win PERF measured at the
# reference's 10x50 workload, the smallest scale learned is known to pay.
QUALITY_INSURANCE_FACTOR = 2.0

# r01-r04 exposed a bare pair-count crossover; kept for reference and for
# the cost model's bench-shape sanity anchor (wall-clock EQUALITY lands
# near 125-150 bench-shape pairs; auto now demands a 2x win, see above).
LEARNED_CROSSOVER_PAIRS = 150


def estimated_totals_s(n_pairs: int, volume_voxels: int | None = None):
    """(svf_total_s, learned_total_s) from the measured cost model.

    volume_voxels: mean voxels per cohort volume; None assumes bench
    shape (the scale the model was fit at)."""
    s = 1.0 if volume_voxels is None else max(
        float(volume_voxels) / BENCH_VOXELS, 1e-3
    )
    svf = T_SVF_PAIR_S * s * n_pairs
    learned = (
        LEARNED_FIXED_COMPILE_S
        + LEARNED_FIXED_SCALED_S * s
        + T_LEARNED_PAIR_S * s * n_pairs
    )
    return svf, learned


def select_registration_mode(
    n_sources: int,
    n_targets: int,
    mode: str = "auto",
    distributed: str | None = None,
    volume_voxels: int | None = None,
) -> str:
    """Resolve 'auto' to 'svf' or 'learned'.

    - explicit 'svf'/'learned' always wins;
    - '--distributed a/b' shards a pair LIST across machines, which only
      the per-pair mode supports (the learned mode trains ONE shared
      network) -> auto resolves to 'svf';
    - otherwise learned only when the estimated svf wall-clock exceeds
      QUALITY_INSURANCE_FACTOR x the learned estimate (module docstring;
      volume_voxels = mean voxels per volume, bench shape when None).
    """
    if mode not in ("auto", "svf", "learned"):
        raise ValueError("registration mode must be auto/svf/learned, got %r" % mode)
    if mode != "auto":
        return mode
    if distributed is not None:
        return "svf"
    n_pairs = int(n_sources) * int(n_targets)
    svf_s, learned_s = estimated_totals_s(n_pairs, volume_voxels)
    return "learned" if svf_s > QUALITY_INSURANCE_FACTOR * learned_s else "svf"
