"""Video speech-transcript ingestion — the searchable-ASR modality.

Beyond-reference capability: the reference probed Whisper subtitle
generation (`content/file_test_prob/test_subtitles.py` builds .srt files)
but never fed transcripts into retrieval; its only speech path is the
live-mic proxy (`Backend/app.py:766-850`). Here transcripts are a
first-class, time-anchored match source: ingest writes a
``{video}_transcript.json`` artifact, `serving.context.ServingContext.boot`
loads it into the `MetadataStore`, and the ``speech_only``/``text_speech``
query strategies search it like OCR text.

Transcript schema (one file per video)::

    {"video": name, "segments": [{"start": s, "end": s, "text": str}, ...]}

The transcriber is pluggable (same dep-gating pattern as the OCR/YOLO
annotators — `ingest/annotators.py`): any callable ``(audio_f32_16kHz) ->
[{"start","end","text"}, ...]`` works; `WhisperSegmentTranscriber` adapts
the on-chip `models.whisper.WhisperASR` (weights/tokenizer are deployment
assets). Audio extraction from video containers needs ffmpeg (absent
here), so ingestion takes PCM WAV sidecars — `read_wav` handles
rate/width/channel conversion.
"""

from __future__ import annotations

import json
import pathlib
from typing import Callable, Protocol


class SegmentTranscriber(Protocol):
    def __call__(self, audio) -> list[dict]:
        """fp32 mono waveform at 16 kHz → [{"start", "end", "text"}, ...]."""
        ...


class WhisperSegmentTranscriber:
    """Adapt the on-chip `WhisperASR` to the SegmentTranscriber protocol."""

    def __init__(self, asr, prompt_ids: list[int] | None = None):
        self.asr = asr
        self.prompt_ids = prompt_ids

    def __call__(self, audio) -> list[dict]:
        return self.asr.transcribe_segments(audio, prompt_ids=self.prompt_ids)


def transcript_path_for(metadata_file, video_name: str) -> pathlib.Path:
    """Sidecar convention: the transcript lives next to the metadata file as
    ``{video}_transcript.json`` (mirrors ``{video}_metadata.json``)."""
    return pathlib.Path(metadata_file).parent / f"{video_name}_transcript.json"


def build_video_transcript(
    wav_path,
    video_name: str,
    transcriber: SegmentTranscriber,
    out_path=None,
    sample_rate: int = 16000,
) -> dict:
    """Transcribe one video's WAV sidecar into the transcript artifact.

    Returns the payload; writes it to ``out_path`` when given. Segments with
    empty text are dropped (silence windows)."""
    from evr_tpu.models.whisper import read_wav

    audio = read_wav(str(wav_path), sample_rate)
    segments = [
        {
            "start": float(seg["start"]),
            "end": float(seg["end"]),
            "text": str(seg["text"]).strip(),
        }
        for seg in transcriber(audio)
        if str(seg.get("text", "")).strip()
    ]
    payload = {"video": video_name, "segments": segments}
    if out_path is not None:
        out_path = pathlib.Path(out_path)
        out_path.parent.mkdir(parents=True, exist_ok=True)
        out_path.write_text(json.dumps(payload, indent=2), encoding="utf-8")
    return payload


def load_transcript(path) -> list[dict]:
    """Read a transcript artifact (or a bare segment list) → segments."""
    payload = json.loads(pathlib.Path(path).read_text(encoding="utf-8"))
    if isinstance(payload, dict):
        return payload.get("segments", [])
    return payload
