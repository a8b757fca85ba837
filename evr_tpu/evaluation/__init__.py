from .retrieval import (
    metrics_from_ranks,
    calculate_metrics,
    evaluate_retrieval,
)
from .datasets import CaptionsTable, load_captions_csv, load_excel_testset
from .compare import ModelComparison, EngineAdapter
from .classification import evaluate_classification
from . import diagnostics

__all__ = [
    "metrics_from_ranks",
    "calculate_metrics",
    "evaluate_retrieval",
    "CaptionsTable",
    "load_captions_csv",
    "load_excel_testset",
    "ModelComparison",
    "EngineAdapter",
    "evaluate_classification",
    "diagnostics",
]
