"""Extractive summarization: sentence split + centrality top-k.

Re-expresses the reference's SBERT centrality summarizer
(5_NLP/nlp/summarizer_extractive.py:14-44: embed sentences, cosine
similarity matrix, row-sum centrality, ``np.argsort(scores)[::-1][:k]``
output in score order) with a deterministic bag-of-words embedding in
place of MiniLM (model weights are not in the sandbox; the embedding
engine is pluggable the same way the OCR engine is).

Runs per document inside ``map_batches`` — numpy kernels, no shuffle.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

from ..functions.scalar import split_into_sentences

_RE_WORD = re.compile(r"[a-z0-9]+")


def _bow_matrix(sentences: list[str]) -> np.ndarray:
    """Integer bag-of-words count matrix (int64 keeps dot products
    EXACT — the float steps below are then each a single correctly
    rounded IEEE op, bit-identical to the DuckDB oracle's)."""
    vocab: dict[str, int] = {}
    rows = []
    for s in sentences:
        counts: dict[int, int] = {}
        for w in _RE_WORD.findall(s.lower()):
            idx = vocab.setdefault(w, len(vocab))
            counts[idx] = counts.get(idx, 0) + 1
        rows.append(counts)
    m = np.zeros((len(sentences), max(1, len(vocab))), dtype=np.int64)
    for i, counts in enumerate(rows):
        for j, c in counts.items():
            m[i, j] = c
    return m


def centrality_scores(sentences: list[str]) -> np.ndarray:
    """Row-sum cosine centrality, computed so every float op has a
    deterministic order: exact integer dot matrix -> cos_ij =
    dot_ij / (sqrt(dot_ii) * sqrt(dot_jj)) (each step one correctly
    rounded IEEE op) -> per-row cumsum (strictly left-to-right adds,
    j ascending). The DuckDB oracle performs the identical chain, so
    scores are bit-equal and the argsort picks the same sentences."""
    m = _bow_matrix(sentences)
    dots = m @ m.T  # exact int64
    norms = np.sqrt(dots.diagonal().astype(np.float64))
    denom = np.outer(norms, norms)
    zero = norms == 0.0
    denom[zero, :] = 1.0
    denom[:, zero] = 1.0
    cos = dots.astype(np.float64) / denom
    cos[zero, :] = 0.0
    cos[:, zero] = 0.0
    return np.cumsum(cos, axis=1)[:, -1]


def summarize(text: str, top_k: int = 3) -> str:
    """Top-k central sentences, output in centrality order (ties by
    sentence position, matching argsort-descending semantics —
    summarizer_extractive.py:35-37)."""
    sentences = split_into_sentences(text)
    if len(sentences) <= top_k:
        return " ".join(sentences)
    scores = centrality_scores(sentences)
    order = np.argsort(-scores, kind="stable")[:top_k]
    return " ".join(sentences[i] for i in order)


def summarize_batch(batch: pa.Table, top_k: int = 3) -> pa.Table:
    texts = batch["text"].to_pylist()
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "summary": pa.array([summarize(t, top_k) for t in texts], pa.string()),
            "n_sentences": pa.array(
                [len(split_into_sentences(t)) for t in texts], pa.int64()
            ),
        }
    )
