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


def test_rehearsal_cheap_gates(tmp_path, monkeypatch):
    """Rehearsal mechanics (VERDICT r4 #6) for the asset-light gates: the
    synthetic BPE table must land the structural ids (sot/eot/vocab) with
    exactly the known-phrase value mismatch, and the toy SigLIP tokenizer
    must drive its gate to OK. (The full 4-gate rehearsal, including the
    random-weight HF CLIP/Whisper dirs, is `make parity-rehearse`; its
    committed report is parity_rehearsal_report.json.)"""
    from evr_tpu.tools.parity_real import (
        _gate_bpe,
        _gate_siglip_tokenizer,
        _rehearsal_mechanics,
        build_rehearsal_assets,
    )

    env = build_rehearsal_assets(tmp_path, gates=("bpe", "siglip"))
    for k, v in env.items():
        monkeypatch.setenv(k, v)
    bpe = _gate_bpe()
    assert bpe["status"] == "FAILED"  # value-locked to the real vocab
    assert bpe["metrics"]["mismatches"] == 1  # structure ids matched
    assert _rehearsal_mechanics(bpe)
    sig = _gate_siglip_tokenizer()
    assert sig["status"] == "OK" and _rehearsal_mechanics(sig)
    # a SKIPPED gate is a rehearsal failure (env knob failed to route)
    assert not _rehearsal_mechanics({"gate": "x", "status": "SKIPPED"})
