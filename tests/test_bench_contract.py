"""Driver contract for bench.py: stdout is exactly ONE JSON line.

The driver records bench.py's stdout at the end of every round
(BENCH_r{N}.json). Sections drive the real CLIs in-process (the e2e
accuracy loop runs DeepWMH_train/DeepWMH_predict, which print progress),
so bench.main() diverts stdout to stderr globally and writes only the
final JSON to the real stream. This test runs bench.py as a subprocess —
forced-CPU backend, shrunken headline volume, zero section budget — and
pins the contract: one parseable stdout line carrying the schema keys the
driver and the judge read.
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# headline-only run: the zero budget skips every optional section, and the
# small volume keeps the CPU sweep (compile included) around a minute
_DRIVER = """
import jax
jax.config.update("jax_platforms", "cpu")
import bench
small = (48, 56, 48)
_orig = bench.make_synthetic_flair
bench.make_synthetic_flair = lambda shape=small, seed=0: _orig(small, seed)
bench.main()
"""


@pytest.mark.slow
def test_bench_stdout_is_one_json_line():
    env = dict(os.environ)
    env["BENCH_BUDGET_S"] = "0"
    # zero budget makes the dead-man default (budget+120s) tighter than a
    # CPU headline compile; relax it here — this test pins the one-line
    # stdout contract, the wedge test below pins the dead-man
    env["BENCH_HARD_DEADLINE_S"] = "1200"
    env["JAX_PLATFORMS"] = "cpu"
    r = subprocess.run(
        [sys.executable, "-c", _DRIVER], env=env, cwd=REPO,
        capture_output=True, text=True, timeout=1500,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    lines = [ln for ln in r.stdout.splitlines() if ln.strip()]
    assert len(lines) == 1, "stdout must be exactly ONE line, got %d:\n%s" % (
        len(lines), r.stdout[:2000],
    )
    rec = json.loads(lines[0])
    # the driver's schema
    for key in ("metric", "value", "unit", "vs_baseline"):
        assert key in rec, key
    assert rec["unit"] == "volumes/min/chip"
    assert rec["value"] > 0
    # the round-over-round regression keys are present even when their
    # sections were skipped (null-valued, with the skip recorded)
    for key in ("e2e_dice_synthetic", "train_steps_per_sec",
                "registration_recovery", "registration_label_quality",
                "sections_dropped"):
        assert key in rec, key
    assert set(rec["sections_dropped"]) == {
        "stages", "training", "nll", "registration", "registration_quality",
        "registration_label_quality", "e2e_dice",
    }


# wedged-section simulation: BENCH_WEDGE_SECTION turns the first section
# after the headline into an indefinite block (a stand-in for a native
# call hanging inside the runtime — the exact failure mode of the r04
# tunnel). The dead-man must land the ONE JSON line carrying the
# already-measured headline INSIDE a driver-like window. The headline
# measurement box is capped so the test spends its time proving the
# dead-man, not benchmarking a CPU.
_WEDGE_DRIVER = """
import jax
jax.config.update("jax_platforms", "cpu")
import bench
small = (48, 56, 48)
_orig = bench.make_synthetic_flair
bench.make_synthetic_flair = lambda shape=small, seed=0: _orig(small, seed)
_bh = bench.bench_headline
bench.bench_headline = (
    lambda p, v, s, max_meas_s=20, publish=None: _bh(p, v, s, 20, publish)
)
bench.main()
"""


@pytest.mark.slow
def test_deadman_emits_partial_json_when_a_section_wedges():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["BENCH_WEDGE_SECTION"] = "e2e_dice"
    # driver-like window: the dead-man must fire well inside the subprocess
    # timeout below (the stand-in for the real driver's kill). 330s (not
    # 240) because on a LOADED host the CPU headline compile alone can
    # exceed 240s and the record then carries value=0 — observed when the
    # full suite ran alongside another compile-heavy process; the margin
    # keeps the test about the dead-man, not about host contention.
    env["BENCH_HARD_DEADLINE_S"] = "330"
    r = subprocess.run(
        [sys.executable, "-c", _WEDGE_DRIVER], env=env, cwd=REPO,
        capture_output=True, text=True, timeout=600,
    )
    assert r.returncode == 3, (r.returncode, r.stderr[-2000:])
    lines = [ln for ln in r.stdout.splitlines() if ln.strip()]
    assert len(lines) == 1, r.stdout[:2000]
    rec = json.loads(lines[0])
    # the headline measured BEFORE the wedge must survive into the record
    assert rec["value"] > 0, rec
    assert rec["vs_baseline"] > 0, rec
    assert "error" in rec, rec
    assert "WEDGED" in r.stderr
