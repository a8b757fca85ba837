"""Excel/CSV 3-column test-set loader (E1 input format).

The reference's Excel test sets have 3 columns — folder, caption, image
with ';'-separated multi-ground-truth (`/root/reference/README.md:153-158`,
consumed by `compare_models.py --test_file`). openpyxl is absent here, so
the loader reads the identical schema from .csv; these tests pin that
behaviour on a committed fixture file."""

import pathlib
import shutil

import numpy as np
import pytest

from evr_tpu.evaluation.datasets import load_excel_testset

FIXTURE = pathlib.Path(__file__).parent / "golden" / "testset_3col.csv"


@pytest.fixture()
def images_root(tmp_path):
    from PIL import Image

    for folder, names in {"vidA": ["10.jpg", "25.jpg", "40.jpg"],
                          "vidB": ["5.jpg"]}.items():
        d = tmp_path / folder
        d.mkdir()
        for n in names:
            Image.fromarray(np.zeros((8, 8, 3), np.uint8)).save(d / n)
    return tmp_path


def test_loads_multi_ground_truth(images_root):
    table = load_excel_testset(FIXTURE, images_root)
    # caption 4 has no existing GT → dropped; caption 3 keeps only 5.jpg
    assert table.captions == [
        "a man fighting in the street",
        "a red car driving",
        "two people talking",
    ]
    assert table.caption_gt_ids == [
        ["vidA/10.jpg", "vidA/25.jpg"],
        ["vidA/40.jpg"],
        ["vidB/5.jpg"],
    ]
    # image table holds each referenced-and-existing image exactly once
    assert sorted(table.image_ids) == [
        "vidA/10.jpg", "vidA/25.jpg", "vidA/40.jpg", "vidB/5.jpg"
    ]
    for p in table.ordered_paths:
        assert pathlib.Path(p).exists()


def test_column_names_case_insensitive(images_root, tmp_path):
    shuffled = tmp_path / "cols.csv"
    # different case + surrounding whitespace in the header
    text = FIXTURE.read_text().replace("Folder,Caption,Image", " FOLDER , caption ,IMAGE")
    shuffled.write_text(text)
    table = load_excel_testset(shuffled, images_root)
    assert len(table.captions) == 3


def test_xlsx_loads_natively_and_corrupt_file_raises(images_root, tmp_path):
    """.xlsx now loads through the stdlib OOXML reader (utils/xlsx.py) —
    no openpyxl needed; a non-zip file still fails loudly, not silently."""
    pytest.importorskip("pandas")
    import zipfile

    from evr_tpu.utils.xlsx import write_xlsx

    rows = [["folder", "caption", "image"]]
    with open(FIXTURE, newline="", encoding="utf-8") as f:
        import csv as _csv

        rows += list(_csv.reader(f))[1:]
    native = tmp_path / "testset.xlsx"
    write_xlsx(native, {"Sheet1": rows})
    table = load_excel_testset(native, images_root)
    assert len(table.captions) > 0

    corrupt = tmp_path / "corrupt.xlsx"
    shutil.copy(FIXTURE, corrupt)  # CSV bytes with an .xlsx name
    with pytest.raises(zipfile.BadZipFile):
        load_excel_testset(corrupt, images_root)


def test_eval_consumes_multi_gt(images_root):
    """Multi-GT rank semantics: best (lowest) rank across the GT set, the
    reference's ';'-separated answer behaviour."""
    from evr_tpu.evaluation.retrieval import calculate_metrics

    table = load_excel_testset(FIXTURE, images_root)
    n = len(table.image_ids)
    id_to_row = {iid: i for i, iid in enumerate(table.image_ids)}
    rng = np.random.default_rng(0)
    sims = rng.random((len(table.captions), n))
    # make caption 0's SECOND gt the global argmax: with multi-GT the rank
    # must be 1 even though gt[0] ranks worse
    sims[0] = 0.0
    sims[0, id_to_row["vidA/25.jpg"]] = 1.0
    gt_rows = [[id_to_row[i] for i in ids] for ids in table.caption_gt_ids]
    m, ranks = calculate_metrics(sims, gt_rows)
    assert ranks[0] == 1  # best-of-GT-set rank semantics
    assert m["R@1"] > 0


def test_translate_testset_csv(tmp_path):
    """vi→en test-set translation with the bundled local translator
    (reference: Translate_file_test_caption/translate.py)."""
    from evr_tpu.data_prep.translate_testset import translate_testset_csv

    src = tmp_path / "testset_vi.csv"
    src.write_text(
        "Folder,Caption,Image\n"
        "vidA,hai người đánh nhau trong phòng,10.jpg;25.jpg\n"
        "vidA,a caption already in english,40.jpg\n",
        encoding="utf-8",
    )
    out = tmp_path / "testset_en.csv"
    n = translate_testset_csv(src, out)
    assert n == 2
    rows = out.read_text(encoding="utf-8").strip().splitlines()
    assert rows[0] == "Folder,Caption,Image"
    assert "two people fighting in a room" in rows[1]
    assert rows[1].endswith("10.jpg;25.jpg")
    assert "a caption already in english" in rows[2]


def test_translate_testset_missing_column(tmp_path):
    from evr_tpu.data_prep.translate_testset import translate_testset_csv

    src = tmp_path / "bad.csv"
    src.write_text("a,b\n1,2\n")
    import pytest as _pytest

    with _pytest.raises(ValueError, match="caption"):
        translate_testset_csv(src, tmp_path / "out.csv")
