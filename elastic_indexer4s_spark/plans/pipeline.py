"""End-to-end indexing pipeline: the reference's fluent builder re-expressed.

Reference surface (`ElasticIndexer4s.scala:25-48`, `IndexableStream.scala:
12-48`): ``from(source) [.switchAliasFrom(alias, minT, maxT)]
[.deleteOldIndices(keep, protect)] .run`` — stages run in that order
(pinned by `IndexableStreamSpec.scala:16-52`: Index → Switch → Delete →
Shutdown), and a failed stage preserves the log of succeeded stages.

The builder is lazy: nothing executes until ``run()`` (the reference pins
this laziness in `IndexLogicSpec.scala:18-27`).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from datetime import datetime, timezone
from typing import Callable

from pyspark.sql import DataFrame, SparkSession

from ..config import IndexConfig
from ..results import IndexError, RunResult, StageSucceeded, run_stages
from .alias import switch_alias
from .catalog import GenerationCatalog
from .retention import delete_oldest


@dataclass
class IndexPipeline:
    """``ElasticIndexer4s(config).from(source)`` equivalent."""

    spark: SparkSession
    source: DataFrame
    cfg: IndexConfig
    index_root: str
    run_ts: str | None = None  # injectable for deterministic tests
    _switch: tuple[str, float, float] | None = None
    _delete: tuple[int, bool] | None = None
    _shutdown: Callable[[], None] | None = None
    _build_kwargs: dict = field(default_factory=dict)

    def switch_alias_from(self, alias: str, min_threshold: float = 0.95,
                          max_threshold: float = 1.25) -> "IndexPipeline":
        """`IndexableStream.scala:19-20`."""
        self._switch = (alias, min_threshold, max_threshold)
        return self

    def delete_old_indices(self, keep: int, alias_protection: bool = True) -> "IndexPipeline":
        """`IndexableStream.scala:22-23`."""
        self._delete = (keep, alias_protection)
        return self

    def with_shutdown(self, fn: Callable[[], None]) -> "IndexPipeline":
        """`ElasticIndexer4s.scala:32` shutdown hook, always invoked."""
        self._shutdown = fn
        return self

    def run(self) -> RunResult | IndexError:
        from ..operators.build import build_index

        cat = GenerationCatalog(self.index_root)
        ts = self.run_ts or datetime.now(timezone.utc).strftime(
            "%Y-%m-%d't'%H.%M.%S")
        generation = self.cfg.generation_name(ts)
        gen_dir = cat.path(generation)

        stages: list[tuple[str, Callable[[], StageSucceeded]]] = []

        def stage_build() -> StageSucceeded:
            cat.register(generation)
            res = build_index(self.spark, self.source, self.cfg, gen_dir,
                              **self._build_kwargs)
            if isinstance(res, IndexError):
                raise res
            n = cat.size_for(generation)
            return StageSucceeded(f"Indexed {n} documents successfully")

        stages.append(("index", stage_build))
        if self._switch is not None:
            alias, lo, hi = self._switch
            stages.append(("switch",
                           lambda: switch_alias(cat, alias, generation, lo, hi)))
        if self._delete is not None:
            keep, protect = self._delete
            stages.append(("delete",
                           lambda: delete_oldest(cat, self.cfg.index_prefix,
                                                 generation, keep, protect)))
        try:
            return run_stages(stages)
        finally:
            if self._shutdown is not None:
                self._shutdown()


def resolve_alias(index_root: str, alias: str) -> str | None:
    """Query-side helper: alias → newest generation directory path."""
    cat = GenerationCatalog(index_root)
    indices = cat.indices_by_age_for(alias)
    return cat.path(indices[-1]) if indices else None
