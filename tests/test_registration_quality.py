"""Non-circular registration quality floors (registration/quality.py).

Two INDEPENDENTLY generated phantom anatomies registered through the full
production group path, scored by propagated-tissue-label Dice — the
anatomical-overlap criterion the reference's ANTs SyN settings are trusted
on (deepwmh/external_tools/ANTs_group_registration.py:85-119). Unlike the
self-recovery tests (tests/test_registration.py), a similarity-metric or
regularization weakness on genuinely different anatomies fails here.

Floors are set from measured CPU runs at this shape (svf 0.87 / learned
0.85 mean foreground Dice vs 0.55-0.58 unregistered); a drop below the
floor is a quality regression, not noise — both modes sit >0.25 above it.
"""

import json
import os

import pytest

from deepwmh_tpu.registration.learned import LearnedRegConfig
from deepwmh_tpu.registration.quality import label_propagation_quality

SHAPE = (32, 40, 32)


@pytest.mark.slow
@pytest.mark.parametrize("mode,floor", [("svf", 0.75), ("learned", 0.72)])
def test_label_propagation_quality_floor(tmp_path, mode, floor):
    cfg = LearnedRegConfig(steps=120) if mode == "learned" else None
    q = label_propagation_quality(
        str(tmp_path), mode=mode, shape=SHAPE, learned_cfg=cfg
    )
    print(json.dumps(q))
    assert q["unregistered_dice"] < 0.75, (
        "phantom anatomies too similar for a meaningful test: %r" % q
    )
    assert q["mean_fg_dice"] >= floor, q
    # registration must clearly beat no registration
    assert q["mean_fg_dice"] > q["unregistered_dice"] + 0.10, q
    assert q["brain_dice"] > 0.9, q
