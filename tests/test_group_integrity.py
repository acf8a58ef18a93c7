"""Regression tests for the label-propagation integrity contract:
a deformable pair whose warp.nii.gz is lost must be caught by both the
distributed barrier (pair_complete) and the consumer (apply_pair_transforms),
never silently degraded to affine-only propagation.
"""

import json
import os

import numpy as np
import pytest

from deepwmh_tpu.core import nifti
from deepwmh_tpu.registration.group import (
    GroupRegistration,
    apply_pair_transforms,
    pair_name,
)


def _ball(shape, seed, shift=0.0):
    rng = np.random.RandomState(seed)
    g = np.meshgrid(*[np.linspace(-1, 1, s) for s in shape], indexing="ij")
    r = np.sqrt((g[0] - shift) ** 2 + g[1] ** 2 + g[2] ** 2)
    return ((r < 0.7) * (150 + 5 * rng.randn(*shape))).astype(np.float32)


@pytest.fixture(scope="module")
def registered_pair(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("pair")
    shape = (20, 20, 16)
    hdr = nifti.NiftiHeader()
    hdr.set_shape(shape)
    hdr.set_zooms((2.0, 2.0, 2.0))
    s_path = str(tmp / "src.nii.gz")
    t_path = str(tmp / "tgt.nii.gz")
    l_path = str(tmp / "lbl.nii.gz")
    nifti.save_nifti(_ball(shape, 0, shift=0.05), hdr, s_path)
    nifti.save_nifti(_ball(shape, 1), hdr, t_path)
    nifti.save_nifti((_ball(shape, 0) > 0).astype(np.float32), hdr, l_path)

    out = str(tmp / "reg")
    reg = GroupRegistration(
        [("S", s_path)], [("T", t_path)], out,
        keep_deformation=True, quick=True,
    )
    reg.launch(verbose=False)
    pair_dir = os.path.join(out, pair_name("S", "T"))
    return reg, out, pair_dir, l_path, str(tmp)


def test_pair_complete_requires_warp(registered_pair):
    reg, out, pair_dir, _, _ = registered_pair
    assert reg.pair_complete("S", "T")
    warp = os.path.join(pair_dir, "warp.nii.gz")
    backup = warp + ".bak"
    os.rename(warp, backup)
    try:
        assert not reg.pair_complete("S", "T"), (
            "barrier passed a deformable pair with a missing warp"
        )
        # corrupt (truncated) warp must also fail the probe
        with open(warp, "wb") as f:
            f.write(b"\x1f\x8b garbage")
        assert not reg.pair_complete("S", "T")
        os.remove(warp)
    finally:
        os.rename(backup, warp)
    assert reg.pair_complete("S", "T")


def test_apply_pair_transforms_raises_on_lost_warp(registered_pair):
    _, _, pair_dir, l_path, tmp = registered_pair
    warp = os.path.join(pair_dir, "warp.nii.gz")
    backup = warp + ".bak"
    os.rename(warp, backup)
    out_file = os.path.join(tmp, "prop_fail.nii.gz")
    try:
        with pytest.raises(RuntimeError, match="warp"):
            apply_pair_transforms(pair_dir, [l_path], [out_file])
        assert not os.path.exists(out_file)
    finally:
        os.rename(backup, warp)
    # with the warp restored, propagation succeeds
    apply_pair_transforms(pair_dir, [l_path], [out_file])
    assert nifti.try_load_nifti(out_file)


def test_affine_only_pair_propagates_without_warp(tmp_path):
    shape = (20, 20, 16)
    hdr = nifti.NiftiHeader()
    hdr.set_shape(shape)
    hdr.set_zooms((2.0, 2.0, 2.0))
    s_path = str(tmp_path / "src.nii.gz")
    t_path = str(tmp_path / "tgt.nii.gz")
    l_path = str(tmp_path / "lbl.nii.gz")
    nifti.save_nifti(_ball(shape, 2), hdr, s_path)
    nifti.save_nifti(_ball(shape, 3), hdr, t_path)
    nifti.save_nifti((_ball(shape, 2) > 0).astype(np.float32), hdr, l_path)

    out = str(tmp_path / "reg")
    reg = GroupRegistration(
        [("S", s_path)], [("T", t_path)], out,
        keep_deformation=False, quick=True, deformable=False,
    )
    reg.launch(verbose=False)
    pair_dir = os.path.join(out, pair_name("S", "T"))
    assert not os.path.exists(os.path.join(pair_dir, "warp.nii.gz"))
    meta = json.load(open(os.path.join(pair_dir, "affine.json")))
    assert meta["deformable"] is False and meta["warp_kept"] is False
    assert reg.pair_complete("S", "T")

    out_file = str(tmp_path / "prop.nii.gz")
    apply_pair_transforms(pair_dir, [l_path], [out_file])
    assert nifti.try_load_nifti(out_file)


def test_affine_json_written_last(registered_pair):
    """affine.json is the completion marker: it must not be older than the
    image or the warp (producer write order image -> warp -> affine.json)."""
    _, _, pair_dir, _, _ = registered_pair
    t_affine = os.path.getmtime(os.path.join(pair_dir, "affine.json"))
    t_image = os.path.getmtime(pair_dir.rstrip("/\\") + ".nii.gz")
    t_warp = os.path.getmtime(os.path.join(pair_dir, "warp.nii.gz"))
    assert t_affine >= t_image and t_affine >= t_warp


def test_launch_with_mesh_writes_artifacts(tmp_path):
    """GroupRegistration.launch(mesh=...) shards batched chunks over the
    device mesh (pad-and-drop for uneven batches) while keeping the full
    artifact contract."""
    import jax
    import numpy as np
    from jax.sharding import Mesh

    from deepwmh_tpu.core import nifti
    from deepwmh_tpu.registration.group import GroupRegistration

    shape = (20, 22, 18)
    hdr = nifti.NiftiHeader()
    hdr.set_shape(shape)
    hdr.set_zooms((2.0, 2.0, 2.0))
    g = np.meshgrid(*[np.linspace(-1, 1, s) for s in shape], indexing="ij")
    rr = np.sqrt(sum(a**2 for a in g))

    def head(seed, shift):
        rng = np.random.RandomState(seed)
        return (
            ((np.sqrt((g[0] - shift) ** 2 + g[1] ** 2 + g[2] ** 2) < 0.8))
            * (300 + 100 * rng.rand(*shape))
        ).astype(np.float32)

    srcs, tgts = [], []
    p = str(tmp_path / "s0.nii.gz")
    nifti.save_nifti(head(0, 0.04), hdr, p)
    srcs.append(("S0", p))
    for i in range(3):  # 3 pairs: NOT a multiple of the 8-device mesh
        p = str(tmp_path / ("t%d.nii.gz" % i))
        nifti.save_nifti(head(10 + i, 0.0), hdr, p)
        tgts.append(("T%d" % i, p))

    mesh = Mesh(np.array(jax.devices()[:8]), ("dp",))
    reg = GroupRegistration(
        srcs, tgts, str(tmp_path / "out"), quick=True, keep_deformation=True
    )
    reg.launch(verbose=False, batch_pairs=8, mesh=mesh)
    for i in range(3):
        paths = reg._pair_paths("S0", "T%d" % i)
        assert reg._pair_done(paths), i
        import os

        assert os.path.isfile(paths["image"]) and os.path.isfile(paths["warp"])


def test_apply_pair_transforms_raises_without_kept_deformation(tmp_path):
    """keep_deformation=False + deformable=True: the pair image is
    SVF-warped but no warp exists, so propagation CANNOT be faithful —
    it must raise, never silently fall back to affine-only labels."""
    shape = (20, 20, 16)
    hdr = nifti.NiftiHeader()
    hdr.set_shape(shape)
    hdr.set_zooms((2.0, 2.0, 2.0))
    s_path = str(tmp_path / "src.nii.gz")
    t_path = str(tmp_path / "tgt.nii.gz")
    l_path = str(tmp_path / "lbl.nii.gz")
    nifti.save_nifti(_ball(shape, 0, shift=0.05), hdr, s_path)
    nifti.save_nifti(_ball(shape, 1), hdr, t_path)
    nifti.save_nifti((_ball(shape, 0) > 0).astype(np.float32), hdr, l_path)

    out = str(tmp_path / "reg")
    reg = GroupRegistration(
        [("S", s_path)], [("T", t_path)], out,
        keep_deformation=False, quick=True,
    )
    reg.launch(verbose=False)
    pair_dir = os.path.join(out, pair_name("S", "T"))
    meta = json.load(open(os.path.join(pair_dir, "affine.json")))
    assert meta["deformable"] and not meta["warp_kept"]
    with pytest.raises(RuntimeError, match="keep_deformation"):
        apply_pair_transforms(
            pair_dir, [l_path], [str(tmp_path / "prop.nii.gz")]
        )


def test_affine_only_pairs_still_propagate(tmp_path):
    """deformable=False pairs legitimately propagate with zero
    displacement (no warp is expected)."""
    shape = (20, 20, 16)
    hdr = nifti.NiftiHeader()
    hdr.set_shape(shape)
    hdr.set_zooms((2.0, 2.0, 2.0))
    s_path = str(tmp_path / "src.nii.gz")
    t_path = str(tmp_path / "tgt.nii.gz")
    l_path = str(tmp_path / "lbl.nii.gz")
    nifti.save_nifti(_ball(shape, 0, shift=0.05), hdr, s_path)
    nifti.save_nifti(_ball(shape, 1), hdr, t_path)
    nifti.save_nifti((_ball(shape, 0) > 0).astype(np.float32), hdr, l_path)

    out = str(tmp_path / "reg")
    reg = GroupRegistration(
        [("S", s_path)], [("T", t_path)], out,
        deformable=False, quick=True,
    )
    reg.launch(verbose=False)
    pair_dir = os.path.join(out, pair_name("S", "T"))
    out_file = str(tmp_path / "prop.nii.gz")
    apply_pair_transforms(pair_dir, [l_path], [out_file])
    assert nifti.try_load_nifti(out_file)
