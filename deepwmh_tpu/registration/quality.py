"""Non-circular registration quality measurement.

The reference trusts its ANTs SyN settings because ANTs is validated on
inter-subject anatomy (deepwmh/external_tools/ANTs_group_registration.py:
85-119). The equivalent evidence for this framework cannot come from
recovering a deformation the framework itself generated (self-recovery is
circular: it cannot catch a similarity-metric or regularization weakness on
genuinely different anatomies). Instead: two INDEPENDENTLY generated
anatomies from eval/phantom.py (distinct random diffeomorphisms + affines of
one base head, so they share label topology but no deformation model with
the registration), registered through the FULL production group-registration
path, scored by propagated-tissue-label Dice against the target's own label
map — exactly the anatomical-overlap criterion deformable registration is
validated with in the literature.

Used by tests/test_registration_quality.py (per-mode floors) and bench.py's
registration_quality section (driver-tracked every round).
"""

from __future__ import annotations

import os

import numpy as np

from deepwmh_tpu.core import nifti
from deepwmh_tpu.eval.metrics import hard_dice_binary
from deepwmh_tpu.eval.phantom import make_subject


def _tissue_dice(pred_label, true_label, classes=(1, 2, 3)):
    """Per-class and mean foreground Dice between two tissue label maps."""
    per_class = {
        int(c): float(hard_dice_binary(pred_label == c, true_label == c))
        for c in classes
    }
    return per_class, float(np.mean(list(per_class.values())))


def label_propagation_quality(
    work_dir,
    mode: str = "svf",
    shape=(96, 112, 96),
    spacing=(2.0, 2.0, 2.0),
    seed_src: int = 11,
    seed_tgt: int = 12,
    seed_anchor: int = 13,
    quick: bool = True,
    large_deformation: bool = True,
    learned_cfg=None,
    subjects=None,
):
    """Register phantom subject A onto phantom subject B through the full
    group-registration path (mode 'svf' = GroupRegistration's optimization
    path, 'learned' = LearnedGroupRegistration's amortized path, 'warm' =
    GroupRegistration(warm_start=True) with a third anchor anatomy, so the
    scored A->B pair is a COMPOSED-SEED warm pair refined on the shortened
    schedule — registration/warm.py), propagate A's tissue labels with
    apply_pair_transforms (NearestNeighbor — the reference's label warp,
    deepwmh/main/train.py:56-60), and Dice them against B's own tissue
    labels. 'warm' scores the identical (A, B) pair as 'svf', so the two
    results are directly comparable.

    Returns {"mode", "dice_per_class", "mean_fg_dice", "unregistered_dice",
    "brain_dice"} — unregistered = A's labels compared directly (the floor
    any successful registration must clearly beat).

    subjects: optional (src_subject, tgt_subject) pair of precomputed
    make_subject(shape, seed_src/seed_tgt, lesion=False) dicts — phantom
    synthesis at the bench shape costs ~35 s/subject of host CPU, so
    bench.py synthesizes them on a background thread during earlier
    device-bound sections and hands them in here.
    """
    from deepwmh_tpu.registration.group import (
        GroupRegistration,
        apply_pair_transforms,
        pair_name,
    )

    os.makedirs(work_dir, exist_ok=True)
    hdr = nifti.NiftiHeader()
    hdr.set_shape(shape)
    hdr.set_zooms(spacing)

    if subjects is not None:
        src, tgt = subjects
    else:
        src = make_subject(shape, seed=seed_src, lesion=False)
        tgt = make_subject(shape, seed=seed_tgt, lesion=False)
    paths = {}
    for name, sub in (("SRC", src), ("TGT", tgt)):
        for k in ("flair", "label2", "label1"):
            p = os.path.join(work_dir, "%s_%s.nii.gz" % (name, k))
            nifti.save_nifti(sub[k].astype(np.float32), hdr, p)
            paths[(name, k)] = p

    reg_dir = os.path.join(work_dir, "reg_%s" % mode)
    sources = [("SRC", paths[("SRC", "flair")])]
    targets = [("TGT", paths[("TGT", "flair")])]
    if mode == "svf":
        reg = GroupRegistration(
            sources, targets, reg_dir, keep_deformation=True,
            quick=quick, large_deformation=large_deformation,
        )
        reg.launch(verbose=False)
    elif mode == "warm":
        anch = make_subject(shape, seed=seed_anchor, lesion=False)
        anch_p = os.path.join(work_dir, "ANCH_flair.nii.gz")
        nifti.save_nifti(anch["flair"].astype(np.float32), hdr, anch_p)
        reg = GroupRegistration(
            [("ANCH", anch_p)] + sources, targets, reg_dir,
            keep_deformation=True, quick=quick,
            large_deformation=large_deformation, warm_start=True,
        )
        reg.launch(verbose=False)
    elif mode == "learned":
        from deepwmh_tpu.registration.learned_group import (
            LearnedGroupRegistration,
        )

        reg = LearnedGroupRegistration(
            sources, targets, reg_dir, reg_cfg=learned_cfg,
        )
        reg.launch(verbose=False)
    else:
        raise ValueError("mode must be 'svf', 'warm' or 'learned', got %r" % mode)

    pair_dir = os.path.join(reg_dir, pair_name("SRC", "TGT"))
    out_l2 = os.path.join(work_dir, "prop_label2_%s.nii.gz" % mode)
    out_l1 = os.path.join(work_dir, "prop_label1_%s.nii.gz" % mode)
    apply_pair_transforms(
        pair_dir,
        [paths[("SRC", "label2")], paths[("SRC", "label1")]],
        [out_l2, out_l1],
        interp="NearestNeighbor",
    )

    prop = nifti.load_nifti_simple(out_l2).astype(np.int32)
    true = tgt["label2"].astype(np.int32)
    per_class, mean_fg = _tissue_dice(prop, true)
    _, unreg = _tissue_dice(src["label2"].astype(np.int32), true)
    brain = float(
        hard_dice_binary(nifti.load_nifti_simple(out_l1) > 0.5,
                         tgt["label1"] > 0.5)
    )
    return {
        "mode": mode,
        "dice_per_class": per_class,
        "mean_fg_dice": round(mean_fg, 4),
        "unregistered_dice": round(unreg, 4),
        "brain_dice": round(brain, 4),
    }
