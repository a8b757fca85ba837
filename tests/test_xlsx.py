"""Stdlib OOXML reader/writer (`evr_tpu/utils/xlsx.py`) — write/read
round-trips, the evaluation-report layout the reference produces
(`compare_models.py:1359-1381`), and the test-set/translation consumers."""

import zipfile

import pytest

from evr_tpu.utils.xlsx import read_xlsx, write_xlsx


def test_roundtrip_types_and_unicode(tmp_path):
    rows = [
        ["folder", "caption", "image"],
        ["v1", "một túi thịt gà làm sạch", "a.jpg;b.jpg"],
        ["v2", 3.5, True],
        ["v3", -7, None],
    ]
    path = write_xlsx(tmp_path / "t.xlsx", {"Sheet1": rows})
    out = read_xlsx(path)
    assert list(out) == ["Sheet1"]
    got = out["Sheet1"]
    assert got[0] == rows[0]
    assert got[1] == rows[1]  # Vietnamese diacritics survive
    assert got[2] == ["v2", 3.5, True]
    assert got[3][:2] == ["v3", -7]  # ints stay ints
    assert isinstance(got[3][1], int)


def test_multi_sheet_order_and_name_sanitisation(tmp_path):
    path = write_xlsx(
        tmp_path / "m.xlsx",
        {
            "Text-to-Image": [["m", 1]],
            "Bad[name]:with*chars? and a very long tail beyond 31 chars": [["x"]],
            "Mean Metrics": [["m", 2]],
        },
    )
    out = read_xlsx(path)
    names = list(out)
    assert names[0] == "Text-to-Image"
    assert names[2] == "Mean Metrics"
    assert "[" not in names[1] and len(names[1]) <= 31
    assert out["Mean Metrics"] == [["m", 2]]


def test_sparse_cells_and_shared_strings(tmp_path):
    """Hand-built workbook with shared strings and gap cells (the form
    openpyxl/Excel emit) must read back densely padded."""
    sheet = (
        '<?xml version="1.0"?><worksheet xmlns="http://schemas.openxmlformats'
        '.org/spreadsheetml/2006/main"><sheetData>'
        '<row r="1"><c r="A1" t="s"><v>0</v></c><c r="C1"><v>9</v></c></row>'
        '<row r="3"><c r="B3" t="s"><v>1</v></c></row>'
        "</sheetData></worksheet>"
    )
    shared = (
        '<?xml version="1.0"?><sst xmlns="http://schemas.openxmlformats.org/'
        'spreadsheetml/2006/main"><si><t>hello</t></si>'
        "<si><r><t>ri</t></r><r><t>ch</t></r></si></sst>"
    )
    workbook = (
        '<?xml version="1.0"?><workbook xmlns="http://schemas.openxmlformats'
        '.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxml'
        'formats.org/officeDocument/2006/relationships"><sheets>'
        '<sheet name="S" sheetId="1" r:id="rId1"/></sheets></workbook>'
    )
    rels = (
        '<?xml version="1.0"?><Relationships xmlns="http://schemas.openxml'
        'formats.org/package/2006/relationships"><Relationship Id="rId1" '
        'Type="t" Target="worksheets/sheet1.xml"/></Relationships>'
    )
    path = tmp_path / "s.xlsx"
    with zipfile.ZipFile(path, "w") as zf:
        zf.writestr("xl/workbook.xml", workbook)
        zf.writestr("xl/_rels/workbook.xml.rels", rels)
        zf.writestr("xl/worksheets/sheet1.xml", sheet)
        zf.writestr("xl/sharedStrings.xml", shared)
    out = read_xlsx(path)["S"]
    assert out[0] == ["hello", None, 9]
    assert out[1] == []  # row 2 absent in file → empty placeholder
    assert out[2] == [None, "rich"]  # rich-text runs concatenate


def test_comparator_save_xlsx_reference_layout(tmp_path):
    from evr_tpu.evaluation.compare import ModelComparison

    comp = ModelComparison(output_dir=tmp_path, log=lambda *_: None)
    metrics = {
        "R@1": 0.5, "R@5": 0.8, "R@10": 0.9,
        "MRR": 0.6, "Median_Rank": 2.0, "Mean_Rank": 3.0,
    }
    comp.results = {
        "clip-b32": {"t2i": metrics, "i2t": metrics,
                     "mean": {**metrics, "rsum": 220.0}},
    }
    path = comp.save_xlsx()
    out = read_xlsx(path)
    assert list(out) == ["Text-to-Image", "Image-to-Text", "Mean Metrics"]
    t2i = out["Text-to-Image"]
    assert t2i[0][1:] == ["R@1", "R@5", "R@10", "MRR", "Median_Rank", "Mean_Rank"]
    assert t2i[1][0] == "clip-b32" and t2i[1][1] == 0.5
    mean = out["Mean Metrics"]
    assert mean[0][-1] == "rsum" and mean[1][-1] == 220.0


def test_load_excel_testset_reads_native_xlsx(tmp_path):
    from evr_tpu.evaluation.datasets import load_excel_testset

    img_root = tmp_path / "imgs"
    (img_root / "v1").mkdir(parents=True)
    for n in ("a.jpg", "b.jpg"):
        (img_root / "v1" / n).write_bytes(b"\xff\xd8fake")
    write_xlsx(
        tmp_path / "set.xlsx",
        {
            "Sheet1": [
                ["folder", "caption", "image"],
                ["v1", "a dog running", "a.jpg;b.jpg"],
            ]
        },
    )
    table = load_excel_testset(tmp_path / "set.xlsx", img_root)
    assert len(table.image_ids) == 2
    assert len(table.captions) == 1


def test_translate_testset_xlsx_to_xlsx(tmp_path):
    from evr_tpu.data_prep.translate_testset import translate_testset_csv

    write_xlsx(
        tmp_path / "vi.xlsx",
        {
            "Sheet1": [
                ["folder", "caption", "image"],
                ["v1", "đánh nhau trên đường", "a.jpg"],
            ]
        },
    )
    n = translate_testset_csv(tmp_path / "vi.xlsx", tmp_path / "en.xlsx")
    assert n == 1
    out = read_xlsx(tmp_path / "en.xlsx")["Sheet1"]
    assert out[1][1] == "fighting on the road"
    assert out[1][0] == "v1" and out[1][2] == "a.jpg"


def test_empty_workbook(tmp_path):
    path = write_xlsx(tmp_path / "e.xlsx", {})
    out = read_xlsx(path)
    assert list(out.values()) == [[]]


def test_read_rejects_missing_file(tmp_path):
    with pytest.raises(FileNotFoundError):
        read_xlsx(tmp_path / "nope.xlsx")
