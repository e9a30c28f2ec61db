"""Multi-field indexing with per-field analyzers + boosted multi_match.

The reference's mapping surface is inherently PER-FIELD: ``TypedMappingSetting``
carries a LIST of analyzers and field mappings (`MappingSetting.scala:13-19`),
and its integration schema maps ``name`` as ``text`` + ``keyword`` and nested
fields independently (`src/it/.../TestObjects.scala:36-43`).  The engine's
index generations were single-field (one ``content`` column); this module
closes that gap the way Lucene itself does — **one inverted index per
field** — and adds the ES ``multi_match`` (most_fields) query on top.

Layout: ``base_dir/field=<name>/`` is a full, self-contained generation
(postings + doclen + dictionary + stats + lineage) built over
``content = <source column>`` with that field's own tokenizer config.  Doc
ids are assigned by the SAME ``doc_key`` window in every field build, so a
document has one id across all fields — no id-mapping join at query time.

Scale shape:

* build — one pass per field over the source (each a standard
  ``build_index``: one shuffle, map-side TF combine).  Builds run
  sequentially by design: each saturates the cluster, so overlapping
  them only splits resources.  The known optimization this trades away
  is the single-document-pass build Lucene does (tokenize ALL fields in
  one scan, one exchange keyed (field, shard), postings partitioned by
  field) — it saves N-1 source scans for N fields at the cost of
  threading ``field`` through the whole build/query/codec surface; for
  the common 2-3-field case where secondary fields (path, repo, title)
  are tiny fractions of the content bytes, the extra scans cost far
  less than that complexity.  Revisit if a workload indexes many
  content-sized fields.
* query — per field, the standard pushdown-filtered postings scan + shard
  scatter-gather of :func:`operators.query.topk`; the combine is a
  groupBy over ≤ Σ_field |matches| (query-term-bounded, corpus-tiny) rows.
  The contract path scores ALL matching docs per field (exact); a serving
  deployment bounds each field with a deep top-k margin exactly like the
  single-field WAND rows re-select on the oracle key.

Cross-engine determinism: per-field scores are rounded to 6 dp (the same
display contract every BM25 row uses) and combined in exact INTEGER units —
``score_units = round(score, 6) * 10^6`` (via an exact decimal hop) and
``boost_units = round(boost * 10^3)`` — so ``sum(score_units *
boost_units)`` is bigint arithmetic: order-independent and bit-identical
on any engine.  (A decimal-multiply combine was rejected: Spark caps a
DECIMAL product's scale at 6 while DuckDB keeps s1+s2, so e.g.
``0.000001 * 2.5`` rounds on one engine and not the other.)  The combined
display score is ``sum_units / 10^9`` evaluated in float64.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import fs as FS
from ..config import IndexConfig, TokenizerConfig
from ..results import IndexError, RunResult
from .build import build_index
from .query import topk


@dataclass(frozen=True)
class FieldSpec:
    """One indexed field: which source column it reads and (optionally) its
    own analyzer — the engine twin of the reference's per-field mapping
    entries (`MappingSetting.scala:13-19`)."""

    column: str
    tokenizer: TokenizerConfig | None = None  # None = the base analyzer


def field_dir(base_dir: str, field: str) -> str:
    return FS.join(base_dir, f"field={field}")


def build_multifield_index(spark: SparkSession, source_df: DataFrame,
                           base_cfg: IndexConfig, base_dir: str,
                           fields: dict[str, FieldSpec],
                           **build_kw) -> dict[str, RunResult | IndexError]:
    """Build one generation per field under ``base_dir/field=<name>``.

    Every field build sees the SAME source rows and the same
    ``base_cfg.doc_key`` / ``num_shards``, so doc ids are identical across
    fields by construction.  Returns {field: RunResult | IndexError};
    a manifest (``fields.json``) records the field → column mapping.
    """
    if not fields:
        raise ValueError("fields must name at least one FieldSpec")
    missing = [s.column for s in fields.values()
               if s.column not in source_df.columns]
    if missing:
        raise ValueError(f"source is missing field columns: {missing}")
    results: dict[str, RunResult | IndexError] = {}
    for name, spec in sorted(fields.items()):
        cfg_f = dataclasses.replace(
            base_cfg, tokenizer=spec.tokenizer or base_cfg.tokenizer)
        df_f = source_df.withColumn("content",
                                    F.col(spec.column).cast("string"))
        results[name] = build_index(spark, df_f, cfg_f,
                                    field_dir(base_dir, name), **build_kw)
    # the manifest is the multi-field PUBLISH marker: written only when
    # every field built — a partial failure leaves no fields.json, so a
    # reader cannot mistake a half-built field set for a served index
    if all(isinstance(r, RunResult) for r in results.values()):
        FS.mkdirs(base_dir)
        FS.write_json(FS.join(base_dir, "fields.json"),
                      {"fields": {n: {"column": s.column}
                                  for n, s in fields.items()},
                       "doc_key": list(base_cfg.doc_key)})
    return results


def multi_match_topk(spark: SparkSession, base_dir: str,
                     query_terms: list[str], boosts: dict[str, float],
                     k: int = 10, *, mode: str = "or",
                     per_field_k: int = 1_000_000) -> DataFrame:
    """ES ``multi_match`` (type ``most_fields``) analog: top-k docs by
    ``sum_f boost_f * BM25_f(query)`` over the named fields →
    DataFrame(doc_id long, score double), ordered (score desc, doc_id asc).

    Each field scores with its OWN analyzer (camelCase queries split for a
    code field, stay whole for a keyword-ish field) against its own
    postings — the reference's per-field mapping made queryable.  A field
    in ``boosts`` must exist under ``base_dir``.

    ``per_field_k`` bounds each field's candidate list; the default scores
    every matching doc (exact combined ranking).  At 10^12-doc scale set a
    deep margin (e.g. 100·k): a doc outside every field's margin must rank
    below k in the combined order whenever margins are deep relative to
    boost skew — same deep-margin discipline as the WAND contract rows.

    Boosts are quantized to 1/1000 (documented contract) so the combine is
    exact bigint arithmetic (see module docstring).
    """
    if not boosts:
        raise ValueError("boosts must name at least one field")
    parts: list[DataFrame] = []
    for name, boost in sorted(boosts.items()):
        gen = field_dir(base_dir, name)
        if not FS.exists(FS.join(gen, "stats.json")):
            raise FileNotFoundError(
                f"field {name!r} has no generation under {base_dir!r}")
        scores = topk(spark, gen, query_terms, k=per_field_k,
                      wand=False, mode=mode)
        # exact integer units: double → 6-dp round → decimal (exact) →
        # *10^6 (exact, integral) → bigint; then one bigint boost multiply
        units = (F.round("score", 6).cast("decimal(28,6)")
                 * F.lit(1_000_000)).cast("long")
        contrib = units * F.lit(int(round(float(boost) * 1000)))
        parts.append(scores.select("doc_id", contrib.alias("_contrib")))
    allscores = parts[0]
    for p in parts[1:]:
        allscores = allscores.unionAll(p)
    combined = (allscores.groupBy("doc_id")
                .agg((F.sum("_contrib").cast("double")
                      / F.lit(1.0e9)).alias("score")))
    return combined.orderBy(F.col("score").desc(),
                            F.col("doc_id").asc()).limit(k)
