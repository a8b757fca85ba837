"""Command-line tools.

| tool | purpose | reference counterpart |
|---|---|---|
| ``python -m evr_tpu.tools.ingest`` | video → frames → embeddings → index | upload path (`app.py:615-691`) offline |
| ``python -m evr_tpu.tools.retrieve`` | checkpoint → frame dir → query → top-k dump | `clip_contrastive_retrieval.py` etc. |
| ``python -m evr_tpu.tools.finetune`` | T1 contrastive fine-tune | `clip_finetune_correct.py` |
| ``python -m evr_tpu.tools.evaluate`` | multi-model R@K/MRR benchmark | `compare_models.py` |
| ``python -m evr_tpu.tools.export_embeddings`` | chunked embedding export | `training_CLIP_multimodal.py:787-886` |
"""
