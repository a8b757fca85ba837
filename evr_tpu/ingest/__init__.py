from .scene import detect_scenes, content_curve, cuts_from_curve, ContentDetectorConfig
from .frames import extract_scene_frames, extract_uniform_frames
from .annotate import build_frame_record, Annotator, NullAnnotator, annotate_folder
from .zeroshot import COCO_CLASSES, ZeroShotObjectAnnotator, make_region_grid, nms_xywh
from .ocr import LocalOCRAnnotator, detect_text_regions
from .pipeline import ingest_video, IngestResult
from .transcripts import (
    SegmentTranscriber,
    WhisperSegmentTranscriber,
    build_video_transcript,
    load_transcript,
    transcript_path_for,
)

__all__ = [
    "detect_scenes",
    "content_curve",
    "cuts_from_curve",
    "ContentDetectorConfig",
    "extract_scene_frames",
    "extract_uniform_frames",
    "build_frame_record",
    "Annotator",
    "NullAnnotator",
    "annotate_folder",
    "COCO_CLASSES",
    "ZeroShotObjectAnnotator",
    "make_region_grid",
    "nms_xywh",
    "LocalOCRAnnotator",
    "detect_text_regions",
    "ingest_video",
    "IngestResult",
    "SegmentTranscriber",
    "WhisperSegmentTranscriber",
    "build_video_transcript",
    "load_transcript",
    "transcript_path_for",
]
