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
modes EQUAL on distinct anatomies (mean foreground-tissue Dice 0.88 both,
registration/quality.py; floors enforced by
tests/test_registration_quality.py), so the crossover is purely a
wall-clock decision.
"""

from __future__ import annotations

# Measured on one TPU v5 lite chip (docs/PERF.md "Registration at scale"):
# production (quick + large-deformation composed) SVF pair wall vs the
# learned path's template + network training amortization. The constant is
# the pair count where the learned total drops below the SVF total with a
# 1.5x safety margin on the measured template+train cost (cohort-size
# dependence is mild: the template adds one affine per volume).
LEARNED_CROSSOVER_PAIRS = 60


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
