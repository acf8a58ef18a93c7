import os

import numpy as np
import jax.numpy as jnp

from deepwmh_tpu.ops.selection import (
    binarize_image,
    gaussian_noise_2x2x2,
    select_components,
)
from deepwmh_tpu.eval.colormaps import apply_colormap, list_colormaps
from deepwmh_tpu.eval.stats import (
    VisualScoreEvaluation,
    boxplot_compare,
    component_dice_scatter,
    nuisance_regression,
    paired_test,
    significance_stars,
)
from deepwmh_tpu.utils.misc import contain_duplicates, minibar, remove_duplicates
from deepwmh_tpu.utils.table import render_table


def test_select_components_modes():
    m = np.zeros((10, 10, 10), np.float32)
    m[1:3, 1:3, 1:3] = 1  # comp A: inside selection
    m[6:9, 6:9, 6:9] = 1  # comp B: partially crossing
    sel = np.zeros_like(m)
    sel[0:5, 0:5, 0:5] = 1
    sel[6:7, 6:7, 6:7] = 1
    win = np.asarray(select_components(jnp.asarray(m), jnp.asarray(sel), "window"))
    cross = np.asarray(select_components(jnp.asarray(m), jnp.asarray(sel), "crossing"))
    maskd = np.asarray(select_components(jnp.asarray(m), jnp.asarray(sel), "masking"))
    assert win[2, 2, 2] == 1 and win[7, 7, 7] == 0  # only fully-inside A
    assert cross[2, 2, 2] == 1 and cross[7, 7, 7] == 1  # both selected
    assert maskd[6, 6, 6] == 1 and maskd[7, 7, 7] == 0  # plain intersection


def test_gaussian_noise_2x2x2():
    n = gaussian_noise_2x2x2((9, 8, 7), 1.0, seed=0)
    assert n.shape == (9, 8, 7)
    # 2x2x2 blocks are constant
    assert n[0, 0, 0] == n[1, 1, 1] == n[0, 1, 0]
    assert abs(n.std() - 1.0) < 0.2


def test_binarize_image(tmp_path, rng):
    from deepwmh_tpu.core import nifti

    p = str(tmp_path / "x.nii.gz")
    nifti.save_nifti_simple(rng.rand(5, 5, 5).astype(np.float32), p)
    out = binarize_image(p, 0.5, save_file=str(tmp_path / "b.nii.gz"))
    assert set(np.unique(out)).issubset({0.0, 1.0})
    assert os.path.isfile(str(tmp_path / "b.nii.gz"))


def test_colormaps(rng):
    v = rng.rand(6, 6)
    for name in list_colormaps():
        rgb = apply_colormap(v, name)
        assert rgb.shape == (6, 6, 3)
        assert rgb.dtype == np.uint8
    gray = apply_colormap(np.array([0.0, 1.0]), "grayscale")
    np.testing.assert_array_equal(gray[0], [0, 0, 0])
    np.testing.assert_array_equal(gray[1], [255, 255, 255])


def test_reference_colormap_parity():
    """The 11 reference map names exist with the reference's stop colors
    (deepwmh/utilities/colormaps.py:32-159) at exact stop positions."""
    from deepwmh_tpu.eval.colormaps import REFERENCE_MAPS

    assert set(REFERENCE_MAPS) == {
        "metalheat", "grayscale", "grayscale2", "rainbow", "highcontrast",
        "green", "red", "blue", "plasma", "ratio", "vik",
    }
    for name in REFERENCE_MAPS:
        assert name in list_colormaps()
    # spot-check stop colors against the reference tables
    checks = [
        ("vik", 0.5, (255, 255, 255)),          # white midpoint
        ("vik", 0.0, (0, 16, 95)),
        ("ratio", 0.0, (0, 0, 255)),
        ("ratio", 1.0, (255, 0, 0)),
        ("metalheat", 0.44, (255, 0, 0)),
        ("metalheat", 1.0, (255, 255, 255)),
        ("grayscale2", 0.0, (0, 0, 255)),       # under-range sentinel
        ("grayscale2", 1.0, (255, 0, 0)),       # over-range sentinel
        ("red", 0.0, (255, 255, 255)),          # reference red: white->salmon
        ("highcontrast", 1.0, (255, 0, 0)),
        ("plasma", 0.0, (13, 8, 135)),
        ("rainbow", 37 / 255, (0, 0, 255)),
    ]
    for name, pos, want in checks:
        got = apply_colormap(np.array([pos]), name)[0]
        assert tuple(int(c) for c in got) == want, (name, pos, got, want)


def test_draw_colorbar(tmp_path):
    from deepwmh_tpu.eval.preview import draw_colorbar

    p = str(tmp_path / "bar.png")
    draw_colorbar(p, colormap="vik", size=(64, 8))
    from PIL import Image

    with Image.open(p) as im:
        assert im.size == (64, 8)  # gradient runs left->right
        px = np.asarray(im.convert("RGB"))
    # left edge is the first stop, middle ~white
    assert tuple(px[0, 0]) == (0, 16, 95)
    assert all(c > 200 for c in px[0, 32])


def test_stats_paired(rng):
    a = rng.rand(20)
    b = a + 0.5  # clearly different
    p = paired_test(a, b, "wilcoxon")
    assert p < 0.01
    assert significance_stars(p) in ("**", "***")
    assert paired_test(a, a) == 1.0
    resid, beta = nuisance_regression(2 * np.arange(10.0) + 3, np.arange(10.0))
    np.testing.assert_allclose(resid, 0, atol=1e-8)
    np.testing.assert_allclose(beta, [3, 2], atol=1e-8)


def test_stats_plots(tmp_path, rng):
    groups = [rng.rand(15), rng.rand(15) + 0.3]
    f1 = str(tmp_path / "box.png")
    boxplot_compare(groups, ["a", "b"], f1, paired_pairs=[(0, 1)])
    assert os.path.getsize(f1) > 1000
    pairs = [(int(v), float(d)) for v, d in zip(rng.randint(1, 1000, 40), rng.rand(40))]
    f2 = str(tmp_path / "scatter.png")
    component_dice_scatter(pairs, f2, n_boot=20)
    assert os.path.getsize(f2) > 1000


def test_matrix_workbook_roundtrip(tmp_path):
    """Reference-format rating workbook: per-case shuffled Mapping sheet,
    n/a voids a whole case row, TianTan 3-region normalization
    (metrics.py:584-614,664-726,833-893)."""
    from deepwmh_tpu.core.xlsx import read_xlsx, write_xlsx

    cases = ["c1", "c2", "c3"]
    methods = ["ours", "baseline"]
    wb = str(tmp_path / "rate.xlsx")
    VisualScoreEvaluation.make_matrix_workbook(cases, methods, wb, seed=3)
    got_m, got_c = VisualScoreEvaluation.parse_matrix_sheet(
        wb, "Mapping", return_methods_and_subjects=True)
    assert got_c == cases and sorted(got_m) == sorted(methods)

    # fill scores: c1 scores fine, c2 has one n/a (voids the row), c3 fine
    sheets = read_xlsx(wb)
    mapping = sheets["Mapping"]
    score = [["case", "seg_1", "seg_2"],
             ["c1", "2", "1"],
             ["c2", "x", "2"],
             ["c3", "0", "2"]]
    write_xlsx(wb, {"Score": score, "Mapping": mapping})
    parsed = VisualScoreEvaluation.parse_matrix_sheet(wb, "Score")
    for m in methods:
        assert parsed[m]["c2"] == "n/a"  # one n/a voids every method
        assert parsed[m]["c1"] != "n/a" and parsed[m]["c3"] != "n/a"
    # scores landed on the right method through the per-case mapping
    map_c1 = {str(a): str(v) for a, v in zip(mapping[0][1:], mapping[1][1:])}
    want_ours_c1 = "2" if map_c1["seg_1"] == "ours" else "1"
    assert parsed["ours"]["c1"] == want_ours_c1


def test_matrix_sheet_edge_cases(tmp_path):
    """Review regressions: fractional scores void the row (reference
    int(str) semantics), a blank-cased Mapping row must not shift later
    lookups, header-only Mapping raises, oversize bars clamp+warn."""
    import pytest

    from deepwmh_tpu.core.xlsx import write_xlsx

    wb = str(tmp_path / "edge.xlsx")
    header = ["case", "seg_1", "seg_2"]
    write_xlsx(wb, {
        # a stray blank-cased row between header and c1
        "Mapping": [header, ["", "ours", "base"], ["c1", "base", "ours"]],
        "Score": [header, ["c1", "2", "1"]],
    })
    parsed = VisualScoreEvaluation.parse_matrix_sheet(wb)
    # c1's permutation is (base, ours): seg_1=2 -> base, seg_2=1 -> ours
    assert parsed["base"]["c1"] == "2" and parsed["ours"]["c1"] == "1"

    # fractional score voids the whole case row
    write_xlsx(wb, {
        "Mapping": [header, ["c1", "ours", "base"]],
        "Score": [header, ["c1", "1.5", "2"]],
    })
    parsed = VisualScoreEvaluation.parse_matrix_sheet(wb)
    assert parsed["ours"]["c1"] == "n/a" and parsed["base"]["c1"] == "n/a"
    # integral float cells are fine (xlsx numerics arrive as floats)
    write_xlsx(wb, {
        "Mapping": [header, ["c1", "ours", "base"]],
        "Score": [header, ["c1", "2.0", "1"]],
    })
    assert VisualScoreEvaluation.parse_matrix_sheet(wb)["ours"]["c1"] == "2"

    # header-only Mapping is a clear error
    write_xlsx(wb, {"Mapping": [header], "Score": [header]})
    with pytest.raises(ValueError, match="no case rows"):
        VisualScoreEvaluation.parse_matrix_sheet(wb)

    # counts past n_max warn and clamp instead of drawing off-page
    pdf = str(tmp_path / "clamp.pdf")
    with pytest.warns(UserWarning, match="clamped"):
        VisualScoreEvaluation.score_histogram([0.05] * 9, 4, pdf)
    assert open(pdf, "rb").read().startswith(b"%PDF")
    with pytest.raises(ValueError, match="n_max"):
        VisualScoreEvaluation.score_histogram([0.5], 0, pdf)


def test_tiantan_scores_and_histogram(tmp_path):
    from deepwmh_tpu.core.xlsx import write_xlsx

    methods = ["ours"]
    header = ["case", "seg_1"]
    mapping = [header, ["c1", "ours"], ["c2", "ours"]]
    wb = str(tmp_path / "tian.xlsx")
    write_xlsx(wb, {
        "Mapping": mapping,
        "Cerebral_small": [header, ["c1", "2"], ["c2", "n/a"]],
        "Cerebral_large": [header, ["c1", "1"], ["c2", "n/a"]],
        "Cerebellum_and_brainstem": [header, ["c1", "2"], ["c2", "n/a"]],
    })
    got_m, valid, final = VisualScoreEvaluation.parse_tiantan_scores(wb)
    assert got_m == methods
    assert valid == ["c1"]  # c2 has no valid region at all -> dropped
    assert abs(final["ours"]["c1"] - 5.0 / 6.0) < 1e-12

    pdf = str(tmp_path / "hist.pdf")
    VisualScoreEvaluation.score_histogram([0.1, 0.5, 0.9, 0.95], 4, pdf)
    data = open(pdf, "rb").read()
    assert data.startswith(b"%PDF") and len(data) > 400


def test_visual_score_harness_csv(tmp_path):
    ev = VisualScoreEvaluation(str(tmp_path / "vs"), seed=1, fmt="csv")
    ev.add_entry("c1", "ours", "p1.gif")
    ev.add_entry("c1", "baseline", "p2.gif")
    ev.add_entry("c2", "ours", "p3.gif")
    sheet, key = ev.make_blinded_sheet()
    # rater fills scores
    import csv

    rows = list(csv.DictReader(open(sheet)))
    for i, r in enumerate(rows):
        r["score"] = str(i + 1)
    with open(sheet, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["blind_id", "preview", "score"])
        w.writeheader()
        w.writerows(rows)
    scores = VisualScoreEvaluation.unblind(sheet, key)
    assert sorted(scores.keys()) == ["baseline", "ours"]
    assert len(scores["ours"]) == 2


def test_visual_score_harness_xlsx_roundtrip(tmp_path):
    """xlsx is the default sheet format (the reference's rating workflow,
    metrics.py:584-647), written and read by the in-house core.xlsx codec."""
    from deepwmh_tpu.core.xlsx import read_xlsx, write_xlsx

    ev = VisualScoreEvaluation(str(tmp_path / "vs"), seed=1)
    ev.add_entry("c1", "ours", "p1.gif")
    ev.add_entry("c1", "baseline", "p2.gif")
    ev.add_entry("c2", "ours", "p3.gif")
    ev.add_entry("c2", "baseline", "p4.gif")
    sheet, key = ev.make_blinded_sheet()
    assert sheet.endswith(".xlsx") and key.endswith(".xlsx")

    # rater fills scores into the xlsx (c2/baseline left unrated)
    rows = read_xlsx(sheet)["rating"]
    key_rows = read_xlsx(key)["key"]
    method_of = {str(int(float(r[0]))): r[2] for r in key_rows[1:]}
    n_rated = 0
    for r in rows[1:]:
        bid = str(int(float(r[0])))
        if method_of[bid] == "baseline" and n_rated >= 1:
            continue  # leave one unrated
        while len(r) < 3:
            r.append("")
        r[2] = 3.0 if method_of[bid] == "ours" else 1.0
        n_rated += 1
    write_xlsx(sheet, {"rating": rows})

    scores = VisualScoreEvaluation.unblind(sheet, key)
    assert scores["ours"] == [3.0, 3.0]
    assert scores["baseline"] == [1.0]


def test_misc_utils():
    assert contain_duplicates([1, 2, 1])
    assert not contain_duplicates([1, 2, 3])
    assert remove_duplicates([3, 1, 3, 2]) == [3, 1, 2]
    bar = minibar(0.5, width=10, msg="x")
    assert "#####" in bar and "50%" in bar
    t = render_table(["a", "bb"], [["1", "2"], ["333", "4"]])
    assert "333" in t and "| a " in t


def test_stage_timer():
    from deepwmh_tpu.utils.profiling import StageTimer

    st = StageTimer()
    with st.stage("foo"):
        pass
    assert "foo" in st.durations
    assert "foo" in st.summary()
