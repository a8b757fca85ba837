"""Concrete OCR / object-detection annotator adapters.

The reference runs EasyOCR (Vietnamese) + YOLOv8x per frame
(`Backend/JSON_sample_DOC.py:29-87`). Both stay host-side third-party
models (SURVEY.md §2.4); these adapters wrap them into the ``Annotator``
protocol with normalised bounding boxes and degrade with a clear error when
the packages aren't installed. ``CompositeAnnotator`` merges several
annotators' outputs into one detection dict.
"""

from __future__ import annotations


def _norm_box(x, y, w, h, width, height):
    return [x / width, y / height, w / width, h / height]


class EasyOCRAnnotator:
    """EasyOCR text detections → reference schema (label/bbox/confidence)."""

    def __init__(self, languages=("vi", "en"), gpu: bool = False):
        try:
            import easyocr
        except ImportError as e:  # pragma: no cover - optional dependency
            raise ImportError(
                "easyocr is not installed; OCR annotation is an optional host-side plugin"
            ) from e
        self.reader = easyocr.Reader(list(languages), gpu=gpu)

    def __call__(self, image_path) -> dict:
        from PIL import Image

        with Image.open(image_path) as img:
            width, height = img.size
        detections = []
        for bbox, text, conf in self.reader.readtext(str(image_path)):
            xs = [p[0] for p in bbox]
            ys = [p[1] for p in bbox]
            x, y = min(xs), min(ys)
            detections.append(
                {
                    "label": text,
                    "bounding_box": _norm_box(x, y, max(xs) - x, max(ys) - y, width, height),
                    "confidence": float(conf),
                }
            )
        return {"text_detections": detections, "object_detections": []}


class YOLOAnnotator:
    """Ultralytics YOLO object detections → reference schema."""

    def __init__(self, weights: str = "yolov8x.pt", conf: float = 0.25):
        try:
            from ultralytics import YOLO
        except ImportError as e:  # pragma: no cover - optional dependency
            raise ImportError(
                "ultralytics is not installed; object annotation is an optional host-side plugin"
            ) from e
        self.model = YOLO(weights)
        self.conf = conf

    def __call__(self, image_path) -> dict:
        results = self.model(str(image_path), conf=self.conf, verbose=False)
        detections = []
        for result in results:
            names = result.names
            h, w = result.orig_shape
            for box in result.boxes:
                x1, y1, x2, y2 = box.xyxy[0].tolist()
                detections.append(
                    {
                        "label": names[int(box.cls[0])],
                        "bounding_box": _norm_box(x1, y1, x2 - x1, y2 - y1, w, h),
                        "confidence": float(box.conf[0]),
                    }
                )
        return {"text_detections": [], "object_detections": detections}


class CompositeAnnotator:
    """Merge several annotators' outputs (text lists concat, object lists
    concat) — the reference runs OCR and YOLO per frame in one pass."""

    def __init__(self, *annotators):
        self.annotators = annotators

    def __call__(self, image_path) -> dict:
        out = {"text_detections": [], "object_detections": []}
        for ann in self.annotators:
            result = ann(image_path)
            out["text_detections"] += list(result.get("text_detections", []))
            out["object_detections"] += list(result.get("object_detections", []))
        return out

    def annotate_batch(self, paths) -> list[dict]:
        """Folder-batched protocol (`annotate_folder` prefers it): children
        exposing ``annotate_batch`` (the TPU zero-shot/OCR annotators) keep
        their one-device-dispatch batching; the rest run per frame."""
        merged = [
            {"text_detections": [], "object_detections": []} for _ in paths
        ]
        for ann in self.annotators:
            if hasattr(ann, "annotate_batch"):
                results = ann.annotate_batch(paths)
            else:
                results = [ann(p) for p in paths]
            for out, result in zip(merged, results):
                out["text_detections"] += list(result.get("text_detections", []))
                out["object_detections"] += list(
                    result.get("object_detections", [])
                )
        return merged
