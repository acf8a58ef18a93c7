"""Registration mode auto-selection (registration/policy.py)."""

import pytest

from deepwmh_tpu.registration.policy import (
    LEARNED_CROSSOVER_PAIRS,
    select_registration_mode,
)


def test_explicit_modes_win():
    assert select_registration_mode(100, 100, mode="svf") == "svf"
    assert select_registration_mode(1, 1, mode="learned") == "learned"


def test_auto_crossover():
    # below crossover: per-pair optimization
    assert select_registration_mode(2, 2, mode="auto") == "svf"
    # the reference's own workload (10 refs x 100 subjects,
    # deepwmh/main/train.py:184-185) is far past the crossover
    assert select_registration_mode(10, 100, mode="auto") == "learned"
    n = LEARNED_CROSSOVER_PAIRS
    assert select_registration_mode(1, n, mode="auto") == "learned"
    assert select_registration_mode(1, n - 1, mode="auto") == "svf"


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
