"""Typed, relocatable configuration.

The reference has no config system — hardcoded module constants with absolute
Windows paths (`Backend/app.py:54-57`), CONFIG dicts (`clip_finetune_correct.py:
296-333`) and `class Args` stand-ins (`compare_models.py:1675-1697`). Here every
subsystem takes a dataclass config with JSON round-trip, env overrides, and
paths resolved relative to a single data root.
"""

from __future__ import annotations

import dataclasses
import json
import os
import pathlib
from dataclasses import dataclass, field
from typing import Any


def _coerce(value: Any, typ: Any) -> Any:
    if dataclasses.is_dataclass(typ) and isinstance(value, dict):
        return from_dict(typ, value)
    if typ in (pathlib.Path, "Path") and isinstance(value, str):
        return pathlib.Path(value)
    if isinstance(typ, type) and isinstance(value, (int, float, str, bool)):
        try:
            if typ is float and isinstance(value, int):
                return float(value)
        except TypeError:
            pass
    return value


def from_dict(cls, data: dict):
    """Build a (possibly nested) dataclass from a plain dict."""
    kwargs = {}
    fields = {f.name: f for f in dataclasses.fields(cls)}
    for key, value in data.items():
        if key not in fields:
            raise KeyError(f"{cls.__name__} has no field {key!r}")
        kwargs[key] = _coerce(value, fields[key].type)
    return cls(**kwargs)


def to_dict(cfg) -> dict:
    def encode(obj):
        if dataclasses.is_dataclass(obj):
            return {f.name: encode(getattr(obj, f.name)) for f in dataclasses.fields(obj)}
        if isinstance(obj, pathlib.Path):
            return str(obj)
        if isinstance(obj, (list, tuple)):
            return [encode(x) for x in obj]
        if isinstance(obj, dict):
            return {k: encode(v) for k, v in obj.items()}
        return obj

    return encode(cfg)


def save_json(cfg, path: os.PathLike) -> None:
    pathlib.Path(path).write_text(json.dumps(to_dict(cfg), indent=2))


def load_json(cls, path: os.PathLike):
    return from_dict(cls, json.loads(pathlib.Path(path).read_text()))


@dataclass
class DataRootConfig:
    """Single relocatable root for all durable serving state.

    Replaces the reference's absolute-path constants (`app.py:54-57`):
    metadata JSONs, embedding .npy files, uploaded videos, extracted frames.
    """

    root: pathlib.Path = field(default_factory=lambda: pathlib.Path("data"))

    def __post_init__(self):
        self.root = pathlib.Path(self.root)

    @property
    def metadata_dir(self) -> pathlib.Path:
        return self.root / "metadata"

    @property
    def embedding_dir(self) -> pathlib.Path:
        return self.root / "embedding"

    @property
    def video_dir(self) -> pathlib.Path:
        return self.root / "videos"

    @property
    def frames_dir(self) -> pathlib.Path:
        return self.root / "frames"

    @property
    def models_dir(self) -> pathlib.Path:
        return self.root / "models"

    @property
    def mapping_path(self) -> pathlib.Path:
        return self.metadata_dir / "video_mapping.json"

    def ensure(self) -> "DataRootConfig":
        for d in (self.metadata_dir, self.embedding_dir, self.video_dir,
                  self.frames_dir, self.models_dir):
            d.mkdir(parents=True, exist_ok=True)
        return self
