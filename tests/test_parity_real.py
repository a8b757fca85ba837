"""`make parity-real` contract (VERDICT r3 #6): the real-asset parity
gates emit a machine-readable report that names every gate, SKIPs with the
exact enabling knob when assets are absent, and exits 0 unless a gate
actually FAILED."""

import json

from evr_tpu.tools.parity_real import main

EXPECTED_GATES = {
    "clip_bpe_tokenizer_ids",
    "clip_golden_retrieval",
    "whisper_real_transcription",
    "siglip_tokenizer_ids",
}


def test_zero_egress_report_schema(tmp_path, monkeypatch, capsys):
    for var in (
        "EVR_TPU_BPE_VOCAB", "EVR_TPU_CLIP_CHECKPOINT",
        "EVR_TPU_WHISPER_CHECKPOINT", "EVR_TPU_WHISPER_TOKENIZER",
        "EVR_TPU_SIGLIP_TOKENIZER",
    ):
        monkeypatch.delenv(var, raising=False)
    out = tmp_path / "report.json"
    rc = main(["--out", str(out), "--reference-root", str(tmp_path / "nope")])
    assert rc == 0  # SKIPPED is not failure
    report = json.loads(out.read_text())
    assert {g["gate"] for g in report["gates"]} == EXPECTED_GATES
    for g in report["gates"]:
        assert g["status"] in ("OK", "SKIPPED")  # nothing can FAIL here
        if g["status"] == "SKIPPED":
            assert g["how_to_provide"], g  # the knob is always named
    s = report["summary"]
    assert s["ok"] + s["failed"] + s["skipped"] == len(report["gates"])
    assert s["failed"] == 0
    # stdout carries the same JSON (CI-pipeable)
    assert json.loads(capsys.readouterr().out)["summary"] == s
