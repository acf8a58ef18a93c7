"""Registration mode auto-selection (registration/policy.py).

The r05 policy is a voxel-scaled cost model with a quality-insurance
factor: auto trades svf's measured full-loop quality edge (0.931 vs
0.780 at 15 pairs; 0.9451 vs 0.8840 at 168 small-volume pairs) only
where the learned mode's wall-clock win is >= 2x — the regime PERF
measured it winning (10x50 / 10x100 bench-shape pairs).
"""

import pytest

from deepwmh_tpu.registration.policy import (
    BENCH_VOXELS,
    QUALITY_INSURANCE_FACTOR,
    estimated_totals_s,
    select_registration_mode,
)

SMALL_VOX = 64 * 80 * 64  # the e2e/crossover-study volume


def test_explicit_modes_win():
    assert select_registration_mode(100, 100, mode="svf") == "svf"
    assert select_registration_mode(1, 1, mode="learned") == "learned"


def test_auto_at_reference_scale_bench_volumes():
    # the reference's own workloads (10 refs x 50-100 subjects at ~bench
    # shape, deepwmh/main/train.py:184-185) are where learned measured
    # 2.0-2.2x: auto must pick it there
    assert select_registration_mode(
        10, 50, mode="auto", volume_voxels=BENCH_VOXELS) == "learned"
    assert select_registration_mode(
        10, 100, mode="auto", volume_voxels=BENCH_VOXELS) == "learned"
    # small cohorts: svf (also the measured quality winner)
    assert select_registration_mode(
        2, 2, mode="auto", volume_voxels=BENCH_VOXELS) == "svf"
    assert select_registration_mode(
        5, 3, mode="auto", volume_voxels=BENCH_VOXELS) == "svf"


def test_auto_small_volumes_stay_svf():
    # the r05 full-loop measurement: 12x14 = 168 pairs at 64x80x64 —
    # learned lost BOTH quality (0.8840 vs 0.9451) and wall-clock
    # (1936s vs 1808s); the pairs-only r04 crossover sent this to
    # learned, the voxel-scaled model must not
    assert select_registration_mode(
        12, 14, mode="auto", volume_voxels=SMALL_VOX) == "svf"
    # even several hundred small-volume pairs: svf pairs are ~1s
    assert select_registration_mode(
        10, 50, mode="auto", volume_voxels=SMALL_VOX) == "svf"


def test_cost_model_consistent_with_measured_rows():
    # PERF.md "Registration at scale" measured totals at bench shape:
    # 10x50: svf 10290s vs learned ~5200s (2.0x); 10x100: 20580 vs ~9200
    svf, learned = estimated_totals_s(500, BENCH_VOXELS)
    assert abs(svf - 10300) / 10300 < 0.05
    assert abs(learned - 4800) / 5200 < 0.25
    svf, learned = estimated_totals_s(1000, BENCH_VOXELS)
    assert svf > QUALITY_INSURANCE_FACTOR * learned
    # default (None) assumes bench shape
    assert estimated_totals_s(500) == estimated_totals_s(500, BENCH_VOXELS)


def test_distributed_forces_svf():
    # --distributed a/b shards a pair list; only the per-pair mode can
    assert select_registration_mode(10, 100, mode="auto",
                                    distributed="1/4") == "svf"
    # but an EXPLICIT learned request is honored (the CLI rejects the
    # combination with a clear error before this point)
    assert select_registration_mode(10, 100, mode="learned",
                                    distributed="1/4") == "learned"


def test_bad_mode_rejected():
    with pytest.raises(ValueError):
        select_registration_mode(1, 1, mode="ants")
