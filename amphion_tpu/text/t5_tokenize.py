"""T5 tokenization for the TTA conditioning path (reference:
`models/tta/ldm/audioldm_dataset.py:112` — `AutoTokenizer.from_pretrained
("t5-base")`).

Tokenization is host-side string processing (not framework compute), so
the HF tokenizer is used when its sentencepiece asset is available; in
fully-offline environments a deterministic hashed fallback keeps the
pipeline runnable (ids are stable across runs but NOT the pretrained
vocabulary — pair it with a model trained on the same fallback)."""

from __future__ import annotations

import hashlib

import numpy as np

_EOS_ID = 1  # t5 </s>


def t5_tokenize(texts: list[str], max_len: int = 32,
                vocab_size: int = 32128) -> tuple[np.ndarray, np.ndarray]:
    """texts → (ids (B, max_len) int32, mask (B, max_len) int32),
    padded/truncated to ``max_len`` with the T5 convention (</s> = 1
    appended, pad = 0)."""
    try:
        from transformers import AutoTokenizer

        # local_files_only: a cache hit loads instantly; without it a
        # zero-egress environment HANGS on the hub fetch
        tok = AutoTokenizer.from_pretrained("t5-base",
                                            local_files_only=True)
        batch = tok(texts, padding="max_length", truncation=True,
                    max_length=max_len, return_tensors="np")
        return (batch["input_ids"].astype(np.int32),
                batch["attention_mask"].astype(np.int32))
    except Exception:
        pass
    ids = np.zeros((len(texts), max_len), np.int32)
    mask = np.zeros((len(texts), max_len), np.int32)
    for b, text in enumerate(texts):
        toks = text.lower().split()[: max_len - 1]
        for i, t in enumerate(toks):
            h = int.from_bytes(hashlib.sha1(t.encode()).digest()[:4],
                               "little")
            ids[b, i] = 2 + (h % (vocab_size - 2))
        ids[b, len(toks)] = _EOS_ID
        mask[b, : len(toks) + 1] = 1
    return ids, mask
