"""Low-latency local query serving over a built index generation — no Spark.

The reference's serving side is an Elasticsearch cluster: documents are
indexed through the write pipeline, then queries bypass the ingest machinery
entirely and hit ES's own searchers (`EsOpsClientApi.scala:89-90` is the only
query the reference itself issues).  This module is the engine-native
equivalent of that split: **build distributed (Spark), serve from the
artifact (pyarrow)**.  An index generation is immutable columnar parquet
(SURVEY §1.3), so a search frontend can mmap/read it directly — the posting
codec, BM25 math, and block-max WAND scorer are the exact same functions the
Spark scatter-gather path uses (operators/query.py), which keeps the two
paths rank- and score-identical by construction (pinned by tests).

Latency profile: the Spark path pays one job (~0.3-1 s scheduling floor) per
query — right for analytical batch scoring over thousands of queries; this
path pays one filtered parquet read (row-group pruned on the sorted `term`
column) plus in-process vectorized scoring — ms-level for selective terms,
~100-200ms p50 even for stopword-grade terms over 8M postings.  At
production scale each serving replica reads only the query terms' rows of
the shards it hosts, exactly like an ES data node.
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor

import numpy as np

from . import fs as FS
from .config import IndexConfig
from .functions.codec import row_to_enc
from .operators.query import (
    _idf,
    _shard_bool,
    _shard_exhaustive,
    _shard_phrase,
    _shard_wand,
    analyze_phrase,
    choose_scorer,
    analyze_query,
    load_config,
    load_stats,
)


def _levenshtein(a: str, b: str) -> int:
    """Plain edit distance — the same function Spark's ``F.levenshtein``
    and DuckDB's ``levenshtein`` compute (unit costs, no transposition),
    so serving-tier fuzzy expansion matches the Spark/oracle paths
    exactly."""
    if a == b:
        return 0
    if not a or not b:
        return len(a) or len(b)
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


class LocalSearcher:
    """Query a generation directory directly through pyarrow.

    One instance per (immutable) generation: the dataset file listing and
    the stats/config manifests are resolved once at construction, so a
    query is a single filtered columnar read + in-process scoring
    (vectorized exhaustive by default; ``wand=True`` for block-max WAND).
    Shards score on a small thread pool — the codec/scoring work is NumPy
    over released-GIL buffers, so shard fan-out parallelizes like the ES
    data node it mirrors.  The generation may live on any FS the engine's
    fs layer resolves (local, ``file://``, object stores).
    """

    def __init__(self, generation_dir: str, *, n_threads: int = 4):
        self.generation_dir = generation_dir
        self.n_threads = max(1, int(n_threads))
        self.cfg: IndexConfig = load_config(generation_dir)
        stats = load_stats(generation_dir)
        self.num_docs: int = stats["num_docs"]
        self.avg_dl: float = stats["avg_dl"]
        self.postings = FS.parquet_dataset(
            FS.join(generation_dir, "postings"),
            format="parquet", partitioning="hive")
        dict_path = FS.join(generation_dir, "dictionary")
        self.dictionary = (
            FS.parquet_dataset(dict_path, format="parquet")
            if FS.exists(dict_path) else None)
        self._pool = (ThreadPoolExecutor(max_workers=self.n_threads)
                      if self.n_threads > 1 else None)
        self._doclen = None              # lazy: only hydration needs it

    def _dfs(self, terms: list[str], postings_tbl) -> dict[str, int]:
        import pyarrow.dataset as ds

        if self.dictionary is not None:
            t = self.dictionary.to_table(
                filter=ds.field("term").isin(terms))
            return dict(zip(t.column("term").to_pylist(),
                            (int(x) for x in t.column("df").to_pylist())))
        # pre-dictionary generations: a term's global df is the sum of its
        # per-shard dfs (each doc lives in exactly one shard)
        out: dict[str, int] = {}
        for term, df in zip(postings_tbl.column("term").to_pylist(),
                            postings_tbl.column("df").to_pylist()):
            out[term] = out.get(term, 0) + int(df)
        return out

    def search(self, query_terms: list[str], k: int = 10, *,
               wand: bool = False, mode: str = "or") -> list[tuple[int, float]]:
        """Top-k BM25 → [(doc_id, score)] ordered by (score desc, doc_id asc).

        Identical semantics (analysis, scoring, tie-breaks, ``mode="and"``
        conjunction) to :func:`operators.query.topk`.
        """
        import pyarrow.dataset as ds

        if mode not in ("or", "and"):
            raise ValueError(f"mode must be 'or' or 'and', got {mode!r}")
        terms = analyze_query(query_terms, self.cfg.tokenizer)
        if not terms or self.num_docs == 0 or self.avg_dl == 0:
            return []
        tbl = self.postings.to_table(filter=ds.field("term").isin(terms))
        if tbl.num_rows == 0:
            return []
        dfs = self._dfs(terms, tbl)
        idfs = {t: _idf(self.num_docs, df) for t, df in dfs.items()}
        require_all = len(terms) if mode == "and" else 0
        # cost-based: wand is a hint; all-dense terms -> vectorized
        # exhaustive (block-max cannot prune, measured ~10x faster)
        scorer = choose_scorer(wand, dfs, self.num_docs)

        # rows = terms × shards (tiny): plain dict grouping, no pandas rows
        by_shard: dict[int, list] = {}
        for r in tbl.to_pylist():
            by_shard.setdefault(int(r["shard"]), []).append(
                (r["term"], row_to_enc(r)))

        def score_shard(encs) -> list[tuple[float, int]]:
            top = scorer(encs, idfs, self.cfg.k1, self.cfg.b,
                         float(self.avg_dl), k, require_all)
            return list(zip(top["score"], top["doc_id"]))

        groups = list(by_shard.values())
        if self._pool is not None and len(groups) > 1:
            tops = list(self._pool.map(score_shard, groups))
        else:
            tops = [score_shard(g) for g in groups]
        merged = [sd for t in tops for sd in t]
        merged.sort(key=lambda sd: (-sd[0], sd[1]))
        return [(int(d), float(s)) for s, d in merged[:k]]

    def search_batch(self, queries: dict[int, list[str]], k: int = 10, *,
                     wand: bool = False,
                     mode: str = "or") -> dict[int, list[tuple[int, float]]]:
        """Top-k for a whole query set in ONE artifact read →
        {query_id: [(doc_id, score)]}, each list ordered like
        :meth:`search`.

        The serving twin of ``operators.query.topk_batch``: the postings
        read filters on the UNION of every query's terms (one row-group-
        pruned columnar read instead of |queries| reads), each shard's
        term slice is decoded once, and every query scores against the
        already-decoded slice.  Per-query results are identical to
        :meth:`search` (same analyzer, scorers, tie-breaks) — pinned by
        tests."""
        import pyarrow.dataset as ds

        if mode not in ("or", "and"):
            raise ValueError(f"mode must be 'or' or 'and', got {mode!r}")
        analyzed = {qid: analyze_query(t, self.cfg.tokenizer)
                    for qid, t in queries.items()}
        analyzed = {qid: t for qid, t in analyzed.items() if t}
        all_terms = sorted({t for ts in analyzed.values() for t in ts})
        if not all_terms or self.num_docs == 0 or self.avg_dl == 0:
            return {}
        tbl = self.postings.to_table(filter=ds.field("term").isin(all_terms))
        if tbl.num_rows == 0:
            return {}
        dfs = self._dfs(all_terms, tbl)
        idfs = {t: _idf(self.num_docs, df) for t, df in dfs.items()}

        by_shard: dict[int, dict] = {}
        for r in tbl.to_pylist():
            by_shard.setdefault(int(r["shard"]), {})[r["term"]] = \
                row_to_enc(r)

        def score_shard(term_encs: dict) -> dict[int, list]:
            outs: dict[int, list] = {}
            for qid, terms in analyzed.items():
                encs = [(t, term_encs[t]) for t in terms if t in term_encs]
                if not encs:
                    continue
                require_all = len(terms) if mode == "and" else 0
                scorer = choose_scorer(
                    wand, {t: dfs[t] for t, _ in encs if t in dfs},
                    self.num_docs)
                top = scorer(encs, idfs, self.cfg.k1, self.cfg.b,
                             float(self.avg_dl), k, require_all)
                if len(top):
                    outs[qid] = list(zip(top["score"], top["doc_id"]))
            return outs

        groups = list(by_shard.values())
        if self._pool is not None and len(groups) > 1:
            shard_outs = list(self._pool.map(score_shard, groups))
        else:
            shard_outs = [score_shard(g) for g in groups]
        result: dict[int, list[tuple[int, float]]] = {}
        for qid in analyzed:
            merged = [sd for so in shard_outs for sd in so.get(qid, [])]
            if not merged:
                continue
            merged.sort(key=lambda sd: (-sd[0], sd[1]))
            result[qid] = [(int(d), float(s)) for s, d in merged[:k]]
        return result

    def search_phrase(self, phrase_terms: list[str],
                      k: int = 10, *,
                      slop: int = 0) -> list[tuple[int, float]]:
        """ES ``match_phrase`` on the serving tier → [(doc_id, score)]
        ordered by (score desc, doc_id asc).  ``slop`` relaxes adjacency
        to ordered proximity (gap ≤ 1+slop per consecutive pair).

        Requires a positions generation (``store_positions=True``): the
        adjacency check runs entirely off the artifact's decoded
        ``pos_blob`` streams — same ``_shard_phrase`` kernel as the Spark
        path (``operators.query.phrase_topk``), so results are
        rank- and score-identical (pinned by pytest)."""
        import pyarrow.dataset as ds

        seq = analyze_phrase(phrase_terms, self.cfg.tokenizer)
        if not seq or self.num_docs == 0 or self.avg_dl == 0:
            return []
        if not getattr(self.cfg, "store_positions", False):
            raise ValueError(
                "search_phrase needs a positions generation "
                "(store_positions=True); this index stores none")
        terms = sorted(set(seq))
        tbl = self.postings.to_table(filter=ds.field("term").isin(terms))
        if tbl.num_rows == 0:
            return []
        dfs = self._dfs(terms, tbl)
        if any(t not in dfs for t in terms):
            return []  # a phrase term absent from the whole corpus
        idfs = {t: _idf(self.num_docs, df) for t, df in dfs.items()}

        by_shard: dict[int, list] = {}
        for r in tbl.to_pylist():
            by_shard.setdefault(int(r["shard"]), []).append(
                (r["term"], row_to_enc(r)))

        def score_shard(encs) -> list[tuple[float, int]]:
            top = _shard_phrase(encs, seq, idfs, self.cfg.k1, self.cfg.b,
                                float(self.avg_dl), k, slop=slop)
            return list(zip(top["score"], top["doc_id"]))

        groups = list(by_shard.values())
        if self._pool is not None and len(groups) > 1:
            tops = list(self._pool.map(score_shard, groups))
        else:
            tops = [score_shard(g) for g in groups]
        merged = [sd for t in tops for sd in t]
        merged.sort(key=lambda sd: (-sd[0], sd[1]))
        return [(int(d), float(s)) for s, d in merged[:k]]

    def search_bool(self, *, must: list[str] | None = None,
                    should: list[str] | None = None,
                    must_not: list[str] | None = None,
                    k: int = 10) -> list[tuple[int, float]]:
        """ES ``bool`` query on the serving tier — twin of
        ``operators.query.bool_topk`` (same ``_shard_bool`` kernel:
        must filters+scores, should boosts, must_not excludes),
        rank/score-identical by pytest."""
        import pyarrow.dataset as ds

        must_t = analyze_query(must or [], self.cfg.tokenizer)
        should_t = analyze_query(should or [], self.cfg.tokenizer)
        not_t = analyze_query(must_not or [], self.cfg.tokenizer)
        if not must_t and not should_t:
            return []
        overlap = set(not_t) & (set(must_t) | set(should_t))
        if overlap:
            raise ValueError(f"terms cannot be both excluded and "
                             f"matched: {sorted(overlap)}")
        if self.num_docs == 0 or self.avg_dl == 0:
            return []
        all_terms = sorted(set(must_t) | set(should_t) | set(not_t))
        tbl = self.postings.to_table(
            filter=ds.field("term").isin(all_terms))
        if tbl.num_rows == 0:
            return []
        dfs = self._dfs(all_terms, tbl)
        idfs = {t: _idf(self.num_docs, df) for t, df in dfs.items()}
        by_shard: dict[int, list] = {}
        for r in tbl.to_pylist():
            by_shard.setdefault(int(r["shard"]), []).append(
                (r["term"], row_to_enc(r)))

        def score_shard(encs) -> list[tuple[float, int]]:
            top = _shard_bool(encs, must_t, should_t, not_t, idfs,
                              self.cfg.k1, self.cfg.b,
                              float(self.avg_dl), k)
            return list(zip(top["score"], top["doc_id"]))

        groups = list(by_shard.values())
        if self._pool is not None and len(groups) > 1:
            tops = list(self._pool.map(score_shard, groups))
        else:
            tops = [score_shard(g) for g in groups]
        merged = [sd for t in tops for sd in t]
        merged.sort(key=lambda sd: (-sd[0], sd[1]))
        return [(int(d), float(s)) for s, d in merged[:k]]

    def expand_terms(self, *, prefix: str | None = None,
                     fuzzy: str | None = None, max_edit: int = 2,
                     max_expansions: int = 50) -> list[str]:
        """Term-dictionary expansion on the serving tier (pyarrow read of
        the vocabulary-sized dictionary artifact) — same semantics as
        ``operators.query.expand_terms``: alphabetically-first
        ``max_expansions`` terms matching the prefix and/or within
        ``max_edit`` plain Levenshtein distance."""
        if self.dictionary is None:
            raise ValueError("term expansion needs the build-time "
                             "dictionary (pre-dictionary generation)")
        terms = sorted(
            self.dictionary.to_table(columns=["term"])
            .column("term").to_pylist())
        if prefix is not None:
            terms = [t for t in terms if t.startswith(prefix)]
        if fuzzy is not None:
            terms = [t for t in terms
                     if _levenshtein(t, fuzzy) <= max_edit]
        return terms[:max_expansions]

    def search_prefix(self, prefix: str, k: int = 10, *,
                      max_expansions: int = 50,
                      wand: bool = False) -> list[tuple[int, float]]:
        """ES prefix query on the serving tier: dictionary expansion +
        BM25 disjunction — rank/score-identical to
        ``operators.query.prefix_topk`` (pinned by pytest)."""
        terms = self.expand_terms(prefix=prefix,
                                  max_expansions=max_expansions)
        return self.search(terms, k, wand=wand) if terms else []

    def search_fuzzy(self, term: str, k: int = 10, *, max_edit: int = 2,
                     max_expansions: int = 50,
                     wand: bool = False) -> list[tuple[int, float]]:
        """ES fuzzy query on the serving tier: Levenshtein expansion +
        BM25 disjunction — twin of ``operators.query.fuzzy_topk``."""
        terms = self.expand_terms(fuzzy=term, max_edit=max_edit,
                                  max_expansions=max_expansions)
        return self.search(terms, k, wand=wand) if terms else []

    def search_highlight(self, query_terms: list[str], k: int = 10, *,
                         wand: bool = False,
                         mode: str = "or") -> list[dict]:
        """ES highlighting on the serving tier: top-k hits plus each
        matched term's 0-based token positions, straight from the
        artifact's ``pos_blob`` streams →
        ``[{"doc_id", "score", "term", "positions": [int, ...]}, ...]``
        ordered (score desc, doc_id asc, term asc) — the serving twin of
        ``operators.query.highlight_topk`` (identical docs/scores/
        positions, pinned by pytest).  Requires a positions generation."""
        import numpy as np
        import pyarrow.dataset as ds

        from .functions.codec import decode_positions, decode_postings

        if not getattr(self.cfg, "store_positions", False):
            raise ValueError(
                "search_highlight needs a positions generation "
                "(store_positions=True); this index stores none")
        hits = self.search(query_terms, k, wand=wand, mode=mode)
        if not hits:
            return []
        terms = analyze_query(query_terms, self.cfg.tokenizer)
        tbl = self.postings.to_table(filter=ds.field("term").isin(terms))
        by_doc_score = dict(hits)
        want = np.array(sorted(by_doc_score), dtype=np.int64)
        out = []
        for r in tbl.to_pylist():
            enc = row_to_enc(r)
            doc_ids, tfs, _dls = decode_postings(enc)
            pos = decode_positions(enc, tfs)
            offs = np.concatenate(([0], np.cumsum(tfs)))
            idx = np.searchsorted(doc_ids, want)
            ok = idx < doc_ids.size
            ok[ok] = doc_ids[idx[ok]] == want[ok]
            for j in np.nonzero(ok)[0]:
                i = int(idx[j])
                did = int(want[j])
                out.append({"doc_id": did, "score": by_doc_score[did],
                            "term": r["term"],
                            "positions": [int(x) for x in
                                          pos[offs[i]:offs[i + 1]]]})
        out.sort(key=lambda d: (-d["score"], d["doc_id"], d["term"]))
        return out

    def search_hydrated(self, query_terms: list[str], k: int = 10, *,
                        wand: bool = False, mode: str = "or",
                        columns: list[str] | None = None) -> list[dict]:
        """Top-k with source documents attached →
        ``[{"rank", "doc_id", "score", <passthrough cols>}, ...]``.

        The serving twin of ``operators.query.topk_hydrated`` (the
        reference's ES search returns ``_source`` documents, not ids): the
        k hit ids filter a columnar doclen read — pyarrow pushes the
        ``doc_id IN (...)`` predicate into row-group pruning, and only the
        requested passthrough columns are materialized."""
        import pyarrow.dataset as ds

        hits = self.search(query_terms, k, wand=wand, mode=mode)
        if not hits:
            return []
        if self._doclen is None:
            self._doclen = FS.parquet_dataset(
                FS.join(self.generation_dir, "doclen"),
                format="parquet", partitioning="hive")
        if columns is None:
            from .operators.query import DOCLEN_INTERNAL_COLS

            columns = [c for c in self._doclen.schema.names
                       if c not in DOCLEN_INTERNAL_COLS]
        ids = [d for d, _ in hits]
        tbl = self._doclen.to_table(
            columns=["doc_id", *columns],
            filter=ds.field("doc_id").isin(ids))
        by_id = {int(r["doc_id"]): r for r in tbl.to_pylist()}
        out = []
        for rank, (doc_id, score) in enumerate(hits, start=1):
            row = {"rank": rank, "doc_id": doc_id, "score": score}
            src = by_id.get(doc_id, {})
            for c in columns:
                row[c] = src.get(c)
            out.append(row)
        return out

    def count(self) -> int:
        """Match-all doc count (reference `EsOpsClientApi.scala:89-90`)."""
        return self.num_docs


def search_alias(index_root: str, alias: str, query_terms: list[str],
                 k: int = 10, **kw) -> list[tuple[int, float]]:
    """Resolve ``alias`` (the published generation, reference
    `AliasSwitching.scala`) and query it — the one-shot convenience wrapper a
    serving frontend would call per request when not caching searchers."""
    from .plans.pipeline import resolve_alias

    gen = resolve_alias(index_root, alias)
    if gen is None:
        raise KeyError(
            f"alias {alias!r} does not resolve to any generation "
            f"under {index_root!r}")
    return LocalSearcher(gen).search(query_terms, k, **kw)
