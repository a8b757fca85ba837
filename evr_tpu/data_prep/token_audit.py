"""Caption token-limit audit.

Reference counterpart: `content/source_training/Kiemtra_gioihan_script.py`
(+ the Merge_data variant): flag captions exceeding CLIP's 77-token window
so truncation losses are visible before training.
"""

from __future__ import annotations

import json
import pathlib

from evr_tpu.tokenizer import get_default_tokenizer


def audit_token_limits(
    json_path, context_length: int = 77, tokenizer=None
) -> dict:
    """Audit a caption JSON ({path: {caption, ...}} or {path: caption}).

    Returns {'total', 'over_limit': [{path, caption, n_tokens}], 'max_tokens'}.
    Token count includes SOT/EOT, matching what tokenize() must fit.
    """
    tokenizer = tokenizer or get_default_tokenizer()
    data = json.loads(pathlib.Path(json_path).read_text(encoding="utf-8"))
    over, max_tokens = [], 0
    for path, meta in data.items():
        caption = meta.get("caption", "") if isinstance(meta, dict) else str(meta)
        n = len(tokenizer.encode(caption)) + 2  # + SOT/EOT
        max_tokens = max(max_tokens, n)
        if n > context_length:
            over.append({"path": path, "caption": caption, "n_tokens": n})
    return {"total": len(data), "over_limit": over, "max_tokens": max_tokens}
