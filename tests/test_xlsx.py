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


def test_read_xlsx_formula_and_error_cells(tmp_path):
    """Excel-authored quirks: a formula cell stores <f> before its cached
    <v> (must not lose the value); t=\"e\"/t=\"str\" cells are text, not
    floats (must not crash)."""
    import zipfile

    from deepwmh_tpu.core.xlsx import read_xlsx, write_xlsx

    p = str(tmp_path / "t.xlsx")
    write_xlsx(p, {"S": [["a", 1.0]]})
    # graft hand-built Excel-style cells into the sheet
    with zipfile.ZipFile(p) as z:
        names = z.namelist()
        parts = {n: z.read(n) for n in names}
    sheet = parts["xl/worksheets/sheet1.xml"].decode()
    row2 = ('<row r="2">'
            '<c r="A2"><f>1+2</f><v>3</v></c>'
            '<c r="B2" t="e"><v>#DIV/0!</v></c>'
            '<c r="C2" t="str"><v>hi</v></c>'
            "</row>")
    sheet = sheet.replace("</sheetData>", row2 + "</sheetData>")
    parts["xl/worksheets/sheet1.xml"] = sheet.encode()
    with zipfile.ZipFile(p, "w") as z:
        for n, b in parts.items():
            z.writestr(n, b)
    rows = read_xlsx(p)["S"]
    assert rows[1][0] == 3.0          # formula's cached value survives
    assert rows[1][1] == "#DIV/0!"    # error cell -> text, no crash
    assert rows[1][2] == "hi"


def test_read_xlsx_respects_sheet_rels_order(tmp_path):
    """Sheet names map to worksheet parts through the rels, not position:
    a workbook whose sheet order was changed in Excel keeps the original
    sheetN.xml targets."""
    import zipfile

    from deepwmh_tpu.core.xlsx import read_xlsx, write_xlsx

    p = str(tmp_path / "two.xlsx")
    write_xlsx(p, {"First": [["f"]], "Second": [["s"]]})
    with zipfile.ZipFile(p) as z:
        parts = {n: z.read(n) for n in z.namelist()}
    wb = parts["xl/workbook.xml"].decode()
    # swap the <sheet> entries (Excel reorder) but leave rels + files alone
    import re as _re

    tags = _re.findall(r"<sheet [^>]*/>", wb)
    assert len(tags) == 2
    wb = wb.replace(tags[0] + tags[1], tags[1] + tags[0])
    parts["xl/workbook.xml"] = wb.encode()
    with zipfile.ZipFile(p, "w") as z:
        for n, b in parts.items():
            z.writestr(n, b)
    out = read_xlsx(p)
    assert out["First"] == [["f"]] and out["Second"] == [["s"]]


def test_self_closing_cell_does_not_steal_next_value():
    """<c r=\"A1\" s=\"1\"/> (styled empty cell) must stay empty — the
    tempered-dot regex it replaced let it capture B1's <v> (regression)."""
    from deepwmh_tpu.core.xlsx import _iter_cells

    xml = '<c r="A1" s="1"/><c r="B1" t="s"><v>0</v></c>'
    assert list(_iter_cells(xml)) == [
        ("A", "1", "", ""), ("B", "1", "s", "0"),
    ]
