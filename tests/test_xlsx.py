from deepwmh_tpu.core.xlsx import read_xlsx, write_xlsx


def test_xlsx_roundtrip(tmp_path):
    path = str(tmp_path / "scores.xlsx")
    sheets = {
        "ratings": [
            ["case", "score", "note"],
            ["c1", 3, "good & clean"],
            ["c2", 4.5, None],
            ["c3", 0, "<edge>"],
        ],
        "meta": [["rater", "R01"]],
    }
    write_xlsx(path, sheets)
    back = read_xlsx(path)
    assert list(back.keys()) == ["ratings", "meta"]
    rows = back["ratings"]
    assert rows[0] == ["case", "score", "note"]
    assert rows[1] == ["c1", 3.0, "good & clean"]
    assert rows[2][:2] == ["c2", 4.5]
    assert rows[3] == ["c3", 0.0, "<edge>"]
    assert back["meta"][0] == ["rater", "R01"]


def test_xlsx_zip_structure(tmp_path):
    import zipfile

    path = str(tmp_path / "t.xlsx")
    write_xlsx(path, {"s": [["a"]]})
    with zipfile.ZipFile(path) as z:
        names = z.namelist()
    assert "[Content_Types].xml" in names
    assert "xl/workbook.xml" in names
    assert "xl/worksheets/sheet1.xml" in names
