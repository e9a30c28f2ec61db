"""Physical-plan audit: prove the engine's plans have the shape we claim.

Checks (greps `.explain("formatted")` output):
 1. query path — the postings scan carries `PushedFilters` with the query
    terms' `In(term, ...)` predicate and prunes to the blob columns only
    (ReadSchema must NOT include every column);
 2. build path — tokenize + sha256 run inside WholeStageCodegen in the SCAN
    stage (before the exchange), and the tf aggregation is partial
    (HashAggregate appears below AND above the term exchange = map-side
    combine);
 3. doclen write — exactly the two planned exchanges, no more (id-assign
    window); tokenizer expression not evaluated post-shuffle.

Run:  python scripts/explain_audit.py [sf_dir]
Exit code 0 = every assertion held; prints the evidence lines.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

from pyspark.sql import functions as F  # noqa: E402

from elastic_indexer4s_spark.config import IndexConfig, tuned_builder  # noqa: E402
from elastic_indexer4s_spark import driver_contract as dc  # noqa: E402
from elastic_indexer4s_spark.operators.build import (  # noqa: E402
    term_frequencies, tokenized_docs,
)

FAIL = 0


def check(name: str, ok: bool, evidence: str) -> None:
    global FAIL
    print(f"{'OK  ' if ok else 'FAIL'} {name}")
    for line in evidence.splitlines():
        print(f"      {line.strip()}")
    if not ok:
        FAIL += 1


def plan_of(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "formatted")


def main() -> None:
    spark = tuned_builder("local[4]", "ei4s-explain-audit",
                          shuffle_partitions=8, driver_mem="8g").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    # AQE wraps the plan in AdaptiveSparkPlan, which hides codegen ids from
    # the pre-execution formatted explain — audit the static plan instead.
    spark.conf.set("spark.sql.adaptive.enabled", "false")

    gen = dc._generation_for(spark, SF_DIR)  # noqa: SLF001
    cfg = IndexConfig(num_shards=8, block_size=64)

    # --- 1. query path: predicate pushdown + column pruning on postings ----
    postings = spark.read.parquet(os.path.join(gen, "postings"))
    q = postings.filter(F.col("term").isin(["spark", "join"]))
    plan = plan_of(q)
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    ok = any(re.search(r"In\(term, \[join,spark\]\)", ln) for ln in pushed)
    check("postings scan pushes `term IN (...)` into parquet", ok,
          "\n".join(pushed) or plan[:500])

    proj = q.select("term", "doc_blob")
    plan = plan_of(proj)
    rs = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    ok = bool(rs) and all("tf_blob" not in ln and "dl_blob" not in ln
                          for ln in rs)
    check("projection prunes unread blob columns from the scan", ok,
          "\n".join(rs))

    # --- 2. build path: compute-before-shuffle + partial aggregation -------
    # raw reader (no _spread): the audit is about the engine's plan over a
    # production table; the contract readers' parallelism-restoring
    # repartition for single-row-group test files would add an exchange
    # that a real multi-split table doesn't have.
    corpus = dc.corpus_shaped(
        spark.read.parquet(os.path.join(SF_DIR, "documents.parquet")))
    toks = tokenized_docs(corpus, cfg)
    plan = plan_of(toks)
    # sha2/tokenizer must appear BEFORE (= deeper than) the id-assign exchange:
    # in formatted output the scan stage is listed first; find the first
    # Exchange node id and assert a Project with sha2 has a smaller node id.
    m_ex = re.search(r"\((\d+)\) Exchange", plan)
    m_sha = re.search(r"\((\d+)\) Project", plan)
    ok = bool(m_ex and m_sha and int(m_sha.group(1)) < int(m_ex.group(1))
              and "sha2" in plan)
    check("sha256+tokenize run in the scan stage, before the exchange", ok,
          f"first Project node ({m_sha and m_sha.group(1)}) < "
          f"first Exchange node ({m_ex and m_ex.group(1)})")

    tf = term_frequencies(toks)
    plan = plan_of(tf)
    aggs = re.findall(r"\(\d+\) HashAggregate", plan)
    exch = len(re.findall(r"\(\d+\) Exchange", plan))
    ok = len(aggs) >= 2  # partial (map-side) + final
    check(f"tf groupBy is a two-phase hash aggregate ({len(aggs)} "
          f"HashAggregate nodes, {exch} exchanges)", ok, "")

    wsc = len(set(re.findall(r"\[codegen id : (\d+)\]", plan)))
    ok = wsc >= 2
    check(f"tf plan keeps {wsc} WholeStageCodegen spans (JVM-side hot path)",
          ok, "")

    # --- 3. doclen lineage: exactly the planned exchanges ------------------
    plan = plan_of(toks.select("shard", "doc_id", "dl", "sha256"))
    n_ex = len(re.findall(r"\(\d+\) Exchange", plan))
    ok = n_ex == 1  # only the id-assign exchange
    check(f"doclen projection has exactly 1 exchange (id assignment), "
          f"found {n_ex}", ok, "")

    # --- 4. dedup/similarity plan shapes (round 2) -------------------------
    from elastic_indexer4s_spark.operators import dedup, similarity

    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    plan = plan_of(dedup.doc_shingles(docs))
    n_ex = len(re.findall(r"\(\d+\) Exchange", plan))
    check(f"shingling is row-local: 0 exchanges (found {n_ex})",
          n_ex == 0, "")

    plan = plan_of(dedup.minhash_signature_array(docs))
    n_ex = len(re.findall(r"\(\d+\) Exchange", plan))
    aggs = len(re.findall(r"\(\d+\) HashAggregate", plan))
    check(f"minhash signatures: ONE doc-keyed exchange with map-side "
          f"partials (found {n_ex} exchanges, {aggs} HashAggregates)",
          n_ex == 1 and aggs >= 2, "")

    emb = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    plan = plan_of(similarity.ivf_assign(emb))
    n_ex = len(re.findall(r"\(\d+\) Exchange", plan))
    check(f"IVF cell assignment is a pure projection: 0 exchanges "
          f"(found {n_ex})", n_ex == 0, "")

    # --- 5. round-3 shapes: pruned ANN exchanges, batch query scan ---------
    q = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding")
    plan = plan_of(similarity.brute_force_topk(emb, q, k=5))
    m_map = re.search(r"\((\d+)\) MapInPandas", plan)
    m_win = re.search(r"\((\d+)\) Window\b", plan)
    # formatted plans number nodes leaf-first: the prune's MapInPandas must
    # be DEEPER (smaller id) than the final window
    ok = bool(m_map and m_win and int(m_map.group(1)) < int(m_win.group(1)))
    check("brute-force top-k: window exchange consumes the PRUNED "
          "mapInPandas output, not raw scored rows", ok,
          f"MapInPandas node ({m_map and m_map.group(1)}) deeper than "
          f"Window node ({m_win and m_win.group(1)})")
    ok = ("Join" not in plan
          and len(re.findall(r"Scan parquet\s+\(\d+\)", plan)) == 1)
    check("brute-force top-k: ONE scan, queries ship in the scoring "
          "closure — no join, no per-query row duplication", ok, "")

    plan = plan_of(similarity.ivf_topk(emb, q, k=5))
    n_scan = len(re.findall(r"Scan parquet\s+\(\d+\)", plan))  # tree nodes
    n_map = len(re.findall(r"\(\d+\) MapInPandas", plan))
    check(f"fused IVF top-k: ONE corpus scan + ONE python stage "
          f"(found {n_scan} scans, {n_map} MapInPandas)",
          n_scan == 1 and n_map == 1, "")

    gen = dc._generation_for(spark, SF_DIR)
    from elastic_indexer4s_spark.operators.query import topk_batch
    qb = topk_batch(spark, gen, {0: ["spark", "join"], 1: ["merge"]}, k=5)
    plan = plan_of(qb)
    m_pf = re.search(r"PushedFilters: \[.*In\(term.*\]", plan)
    n_post_scans = len(re.findall(r"Scan parquet .*postings", plan)) or \
        len(re.findall(r"Scan parquet", plan))
    ok = bool(m_pf) and "BroadcastExchange" in plan
    check("batch query set: union-term IN pushdown + broadcast "
          "dictionary, one postings scan", ok,
          (m_pf.group(0)[:90] if m_pf else "no pushdown found"))

    # --- 6. round-5 shape: index-native phrase never reads the source -----
    from elastic_indexer4s_spark.operators.query import phrase_topk
    ph = phrase_topk(spark, gen, None, ["customer", "join"], k=5)
    plan = plan_of(ph)
    # tree nodes only — the formatted explain repeats each scan in the
    # detail section, so a bare "Scan parquet" count double-counts
    n_scans = len(re.findall(r"Scan parquet\s+\(\d+\)", plan))
    ok = ("content" not in plan
          and re.search(r"In\(term", plan) is not None
          and n_scans == 2)       # postings + dictionary, nothing else
    check("index-native phrase: postings+dictionary scans only, term IN "
          f"pushdown, source/doclen never read (found {n_scans} scans)",
          ok, "")

    spark.stop()
    sys.exit(1 if FAIL else 0)


if __name__ == "__main__":
    main()
