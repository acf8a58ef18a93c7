"""Registration mode selection: per-pair SVF optimization vs the amortized
learned network.

The reference ships both pathways (ANTs per-pair SyN as the default,
VoxelMorph as the GPU alternative — deepwmh/main/train.py:182-224,
deepwmh/external_tools/VxM_group_registration.py:84-397) and leaves the
choice to the user. At the reference's own training scale (10 refs x 100
subjects = 1000 pairs, train.py:184-185) the amortized design wins by
construction: one network training spread over all pairs, then one forward
per pair.

`select_registration_mode` makes that choice automatically from the
measured cost model (single TPU v5e chip, 192x224x192 @1 mm volumes,
production configs — see docs/PERF.md "Registration at scale" for the
measurement):

  svf total     ~= t_svf_pair * n_pairs
  learned total ~= t_template(n_vols) + t_train + t_fwd_pair * n_pairs

Quality gate: the non-circular label-propagation benchmark measures the two
modes EQUAL per pair on distinct anatomies (mean foreground-tissue Dice
0.88 both, registration/quality.py; floors enforced by
tests/test_registration_quality.py). Below the crossover the svf default is
also a measured QUALITY choice, not only wall-clock: at a 15-pair phantom
cohort the full train->predict loop reaches held-out Dice 0.931 with svf
vs 0.780 with learned forced (identical config/seed) — a network trained
on 8 volumes is below the amortized design's regime (docs/PERF.md
"Registration at scale").
"""

from __future__ import annotations

# Measured on one TPU v5 lite chip at bench shape, 192x224x192 @1mm
# (docs/PERF.md "Registration at scale"):
#   t_svf_pair      20.6 s   artifact-to-artifact, production preset
#   t_fwd_pair       ~6 s    learned: forward 0.8 + fused lift/warp 1.3
#                            + artifact writes ~3.6
#   fixed cost    ~1800 s    template ~19 s/volume + network training
#                            1066 s (300 steps) + one-time compiles ~350 s
# Crossover = fixed / (t_svf_pair - t_fwd_pair) ~= 125 pairs at a 20-volume
# cohort; 150 adds margin for smaller volumes (where svf pairs are faster).
# At the reference's own workloads the choice is clear-cut: 10x50 = 2.0x,
# 10x100 = 2.2x total wall-clock win for learned.
LEARNED_CROSSOVER_PAIRS = 150


def select_registration_mode(
    n_sources: int,
    n_targets: int,
    mode: str = "auto",
    distributed: str | None = None,
) -> str:
    """Resolve 'auto' to 'svf' or 'learned'.

    - explicit 'svf'/'learned' always wins;
    - '--distributed a/b' shards a pair LIST across machines, which only
      the per-pair mode supports (the learned mode trains ONE shared
      network) -> auto resolves to 'svf';
    - otherwise 'learned' once the workload is past the measured crossover.
    """
    if mode not in ("auto", "svf", "learned"):
        raise ValueError("registration mode must be auto/svf/learned, got %r" % mode)
    if mode != "auto":
        return mode
    if distributed is not None:
        return "svf"
    n_pairs = int(n_sources) * int(n_targets)
    return "learned" if n_pairs >= LEARNED_CROSSOVER_PAIRS else "svf"
