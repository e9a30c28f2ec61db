"""Text analysis operators for corpus curation: language-ID, quality
scoring, token counting, document fingerprinting.

All pure Spark built-ins (codegen'd, no UDFs): these run as a single narrow
projection or one map-side-combinable aggregation, so at 100 TB they are
scan-bound — exactly what a curation pass should be.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.hashing import md5_long, MASK31
from ..functions.tokenizer import simple_tokens_expr, token_ngrams_expr

# language marker words for the n-gram-heuristic language identifier.
# (lang, marker) pairs; ties broken by ascending lang, zero hits -> 'und'.
LANG_MARKERS: list[tuple[str, str]] = [
    ("en", "the"), ("en", "and"), ("en", "of"), ("en", "is"), ("en", "a"),
    ("de", "der"), ("de", "die"), ("de", "und"), ("de", "ist"), ("de", "das"),
    ("fr", "le"), ("fr", "la"), ("fr", "et"), ("fr", "est"), ("fr", "les"),
    ("es", "el"), ("es", "los"), ("es", "es"), ("es", "una"), ("es", "que"),
]

EN_STOPWORDS = ["the", "a", "an", "and", "of", "to", "in", "is", "it", "that"]


def language_id(df: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """(id, pred_lang, hits): marker-word vote, argmax with deterministic
    tie-break (most hits, then ascending lang); no hits -> 'und'.

    The marker table is a broadcast literal; the vote is one explode +
    hash-agg + per-doc window (partitioned by unique id — skew-free)."""
    spark = df.sparkSession
    markers = F.broadcast(
        spark.createDataFrame(LANG_MARKERS, "lang_cand string, tok string"))
    toks = df.select(F.col(id_col),
                     F.explode(simple_tokens_expr(F.col(text_col))).alias("tok"))
    votes = (toks.join(markers, "tok")
             .groupBy(id_col, "lang_cand").agg(F.count(F.lit(1)).alias("hits")))
    w = Window.partitionBy(id_col).orderBy(F.col("hits").desc(),
                                           F.col("lang_cand").asc())
    best = (votes.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select(id_col, F.col("lang_cand").alias("pred_lang"), "hits"))
    return (df.select(id_col).join(best, id_col, "left")
            .select(F.col(id_col),
                    F.coalesce("pred_lang", F.lit("und")).alias("pred_lang"),
                    F.coalesce("hits", F.lit(0).cast("long")).alias("hits")))


def quality_metrics(df: DataFrame, id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """Gopher-style per-document quality rules, as one narrow projection:

    (id, n_chars, n_tokens, avg_tok_len, punct_ratio, stop_ratio, quality)
    where quality = fraction of passed rules (length band, mean-token-length
    band, punctuation bound, stopword floor).
    """
    text = F.col(text_col)
    toks = simple_tokens_expr(text)
    n_tokens = F.size(toks).cast("long")
    # token-char sum and stopword count stay in whole-stage codegen:
    # Spark evaluates higher-order-function lambdas INTERPRETED (measured
    # 10-30x slower than codegen regex on this repo's shingler, BENCH.md
    # item 12), so the round-3 F.aggregate/F.filter pair was a needless CPU
    # multiplier on a scan-bound pass.  length(array_join(toks, '')) is the
    # exact token-char sum; tokens are [a-z0-9]+ runs joined by single
    # spaces, so \b<stopword>\b on that string matches whole tokens only
    # (no stopword is a substring match across a token boundary) — the
    # count equals size(filter(toks, isin(stopwords))) by construction.
    tok_chars = F.length(F.array_join(toks, "")).cast("long")
    avg_tok_len = F.round(tok_chars.cast("double")
                          / F.nullif(n_tokens, F.lit(0)).cast("double"), 6)
    n_chars = F.length(text).cast("long")
    stripped = F.regexp_replace(text, "[A-Za-z0-9\\s]", "")
    punct_ratio = F.round(F.length(stripped).cast("double")
                          / F.nullif(n_chars, F.lit(0)).cast("double"), 6)
    # re.escape per word + the charset assert make the alternation provably
    # equal to the isin() list filter it replaced: a future stopword with a
    # regex metacharacter (dotted/hyphenated form) would otherwise silently
    # change matching semantics (ADVICE r4) — and anything outside [a-z0-9]
    # can never equal a token of simple_tokens_expr anyway, so it is a
    # config error worth failing loudly on.
    import re as _re

    bad = [w for w in EN_STOPWORDS if not _re.fullmatch(r"[a-z0-9]+", w)]
    assert not bad, f"stopwords must match [a-z0-9]+ (tokenizer charset): {bad}"
    stop_pat = r"\b(" + "|".join(_re.escape(w) for w in EN_STOPWORDS) + r")\b"
    n_stops = F.regexp_count(F.array_join(toks, " "), F.lit(stop_pat))
    stop_ratio = F.round(n_stops.cast("double")
                         / F.nullif(n_tokens, F.lit(0)).cast("double"), 6)
    rules = (
        F.when((n_tokens >= 3) & (n_tokens <= 100000), 1).otherwise(0)
        + F.when((avg_tok_len >= 2.0) & (avg_tok_len <= 12.0), 1).otherwise(0)
        + F.when(F.coalesce(punct_ratio, F.lit(1.0)) <= 0.3, 1).otherwise(0)
        + F.when(F.coalesce(stop_ratio, F.lit(0.0)) >= 0.01, 1).otherwise(0)
    )
    return df.select(
        F.col(id_col), n_chars.alias("n_chars"), n_tokens.alias("n_tokens"),
        avg_tok_len.alias("avg_tok_len"), punct_ratio.alias("punct_ratio"),
        stop_ratio.alias("stop_ratio"),
        F.round(rules.cast("double") / 4.0, 6).alias("quality"))


def repetition_metrics(df: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text") -> DataFrame:
    """Gopher-style repetition signals per document:

    (id, n_lines, dup_line_ratio, top_bigram_ratio) where
    ``dup_line_ratio`` = 1 - distinct/total over non-blank lines and
    ``top_bigram_ratio`` = occurrences of the most frequent word 2-gram /
    total 2-grams — the standard "boilerplate / degenerate repetition"
    curation filters (a scraped page repeating one nav line, a doc looping
    one phrase).

    Scale shape: both signals are doc-keyed aggregations — explode +
    groupBy(id[, key]) with map-side partials, skew-free because the
    grouping key includes the unique doc id; the bigram stream comes from
    the same zero-width-lookahead regex as the shingler (codegen, row
    local).  Docs with no lines / no bigrams report ratio 0.
    """
    lines = (df.select(F.col(id_col),
                       F.explode(F.split(F.col(text_col), "\n")).alias("_l"))
             .filter(F.length(F.trim(F.col("_l"))) > 0)
             .groupBy(id_col)
             .agg(F.count(F.lit(1)).alias("n_lines"),
                  F.countDistinct("_l").alias("_nd")))
    bigrams = (df.select(
        F.col(id_col),
        F.explode(token_ngrams_expr(F.col(text_col), 2)).alias("_g"))
        .groupBy(id_col, "_g").agg(F.count(F.lit(1)).alias("_c"))
        .groupBy(id_col).agg(F.max("_c").alias("_top"),
                             F.sum("_c").alias("_tot")))
    return (df.select(id_col)
            .join(lines, id_col, "left")
            .join(bigrams, id_col, "left")
            .select(
                F.col(id_col),
                F.coalesce("n_lines", F.lit(0).cast("long")).alias("n_lines"),
                F.round(F.coalesce(
                    (F.col("n_lines") - F.col("_nd")).cast("double")
                    / F.col("n_lines").cast("double"),
                    F.lit(0.0)), 6).alias("dup_line_ratio"),
                F.round(F.coalesce(
                    F.col("_top").cast("double") / F.col("_tot").cast("double"),
                    F.lit(0.0)), 6).alias("top_bigram_ratio")))


def token_counts(df: DataFrame, id_col: str = "doc_id",
                 text_col: str = "text") -> DataFrame:
    """(id, ws_tokens, bpe_tokens): whitespace token count and a BPE-ish
    count (alnum runs + each non-alnum, non-space symbol = one token)."""
    text = F.col(text_col)
    ws = F.when(F.length(F.trim(text)) == 0, F.lit(0)).otherwise(
        F.size(F.split(F.trim(text), "\\s+"))).cast("long")
    bpe = F.size(F.regexp_extract_all(
        F.lower(text), F.lit("[a-z0-9]+|[^a-z0-9\\s]"), 0)).cast("long")
    return df.select(F.col(id_col), ws.alias("ws_tokens"),
                     bpe.alias("bpe_tokens"))


def fingerprint(df: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """(id, fp): order-sensitive 64-bit document fingerprint.

    fp = bit_xor over tokens of (hash(token) & MASK31) * ((pos % 97) + 1):
    position-weighted so permuted documents get different fingerprints, yet
    products stay < 2^38 (no bigint overflow under ANSI mode) and the whole
    thing is one explode + one agg, reproducible in any engine."""
    toks = df.select(
        F.col(id_col),
        F.posexplode(simple_tokens_expr(F.col(text_col))).alias("pos", "tok"))
    term = (md5_long(F.col("tok")).bitwiseAND(F.lit(MASK31))
            * ((F.col("pos") % 97) + 1).cast("long"))
    fp = toks.groupBy(id_col).agg(F.bit_xor(term).alias("fp"))
    return (df.select(id_col).join(fp, id_col, "left")
            .select(F.col(id_col),
                    F.coalesce("fp", F.lit(0).cast("long")).alias("fp")))
