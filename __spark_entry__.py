"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  -> flagship: full engine BM25 top-10 (blocked-varint postings,
                 shard scatter-gather, block-max WAND) on sf0.001.
queries()     -> one callable per implemented operator (SURVEY.md §2 plus the
                 training-data pipeline ops: dedup, similarity search, text
                 analysis, multimodal plumbing).
oracle_sql()  -> exact DuckDB twins (see elastic_indexer4s_spark/
                 driver_contract.py for the parity rules).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from elastic_indexer4s_spark import driver_contract as _dc  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return _dc.flagship(spark)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(_dc.QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(_dc.ORACLES)
