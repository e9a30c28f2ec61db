"""Pure-Python BM25 oracle — the engine's correctness reference.

Mirrors the reference project's test discipline of substituting a trivially
correct interpreter for the effectful one (`EsTestInterpreter.scala:13-61`):
a dict-based inverted index plus textbook Lucene BM25, run over the
deterministic synthetic corpus.  Engine top-k must be rank-identical with
scores equal to 1e-6 (BASELINE.json north_rule).

BM25 (Lucene / ES 6.x defaults, which the reference never overrides):
    idf(t)     = ln(1 + (N - df + 0.5) / (df + 0.5))
    score(d,q) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 - b + b·dl/avgdl))
with k1 = 1.2, b = 0.75.  Multi-term queries are unions (ES `match` OR
semantics); term contributions are accumulated in ascending term order so the
float addition order matches the engine exactly.
"""

from __future__ import annotations

import math
from collections import Counter
from dataclasses import dataclass, field

from .config import TokenizerConfig
from .functions.tokenizer import tokenize_py


@dataclass
class PyIndex:
    postings: dict[str, dict[int, int]] = field(default_factory=dict)  # term -> {doc: tf}
    doclen: dict[int, int] = field(default_factory=dict)
    n_docs: int = 0
    avg_dl: float = 0.0


def build_py_index(contents: dict[int, str],
                   cfg: TokenizerConfig = TokenizerConfig()) -> PyIndex:
    idx = PyIndex()
    for doc_id, content in contents.items():
        toks = tokenize_py(content, cfg)
        idx.doclen[doc_id] = len(toks)
        for term, tf in Counter(toks).items():
            idx.postings.setdefault(term, {})[doc_id] = tf
    idx.n_docs = len(contents)
    idx.avg_dl = (sum(idx.doclen.values()) / idx.n_docs) if idx.n_docs else 0.0
    return idx


def bm25_scores(idx: PyIndex, terms: list[str],
                k1: float = 1.2, b: float = 0.75,
                mode: str = "or") -> dict[int, float]:
    """Scores for all matching docs; term order = sorted unique.
    ``mode="or"`` = union (ES `match` default); ``mode="and"`` = conjunction
    (ES `match` operator=and): only docs containing every query term."""
    scores: dict[int, float] = {}
    nmatch: dict[int, int] = {}
    uniq = sorted(set(terms))
    for term in uniq:
        plist = idx.postings.get(term)
        if not plist:
            continue
        df = len(plist)
        idf = math.log(1.0 + (idx.n_docs - df + 0.5) / (df + 0.5))
        for doc_id, tf in plist.items():
            dl = idx.doclen[doc_id]
            norm = tf + k1 * (1.0 - b + b * dl / idx.avg_dl)
            contrib = idf * tf * (k1 + 1.0) / norm
            scores[doc_id] = scores.get(doc_id, 0.0) + contrib
            nmatch[doc_id] = nmatch.get(doc_id, 0) + 1
    if mode == "and":
        scores = {d: s for d, s in scores.items() if nmatch[d] >= len(uniq)}
    return scores


def bm25_topk(idx: PyIndex, terms: list[str], k: int,
              k1: float = 1.2, b: float = 0.75,
              mode: str = "or") -> list[tuple[int, float]]:
    """Top-k (doc_id, score), score desc then doc_id asc (stable tie-break)."""
    scores = bm25_scores(idx, terms, k1, b, mode)
    ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
    return ranked[:k]
