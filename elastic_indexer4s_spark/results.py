"""Run-result model: ordered stage log preserved on failure.

Mirrors the reference's result ADT (`Index_results/IndexError.scala:3-27`):
``RunResult(succeededStages*)`` on success, ``IndexError(msg, cause,
succeededStages)`` on failure, with the railway composition of
`IndexLogic.scala:23-29` (a failed stage keeps the log of already-succeeded
stages).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Iterable


@dataclass(frozen=True)
class StageSucceeded:
    msg: str

    def __str__(self) -> str:  # mirrors IndexError.scala:8-13 rendering
        return self.msg


@dataclass
class RunResult:
    succeeded_stages: list[StageSucceeded] = field(default_factory=list)

    def __str__(self) -> str:
        lines = "\n\t".join(str(s) for s in self.succeeded_stages)
        return f"Indexing finished successfully with stages:\n\t{lines}"


@dataclass
class IndexError(Exception):
    msg: str
    cause: BaseException | None = None
    succeeded_stages: list[StageSucceeded] = field(default_factory=list)

    def __str__(self) -> str:
        lines = "\n\t".join(str(s) for s in self.succeeded_stages)
        cause = f"\ncaused by: {self.cause!r}" if self.cause else ""
        return (
            f"Indexing failed with: {self.msg}{cause}\n"
            f"succeeded stages:\n\t{lines}"
        )


Stage = Callable[[], StageSucceeded]


def run_stages(stages: Iterable[tuple[str, Stage]]) -> RunResult | IndexError:
    """Railway sequencing (reference `IndexLogic.scala:23-29`,
    `IndexableStream.scala:12-48`): run stages in order; on the first
    exception return an ``IndexError`` carrying every stage that already
    succeeded.  Never raises."""
    import time

    done: list[StageSucceeded] = []
    for name, stage in stages:
        t0 = time.monotonic()
        try:
            ok = stage()
        except IndexError as e:  # nested pipeline error: merge stage logs
            return IndexError(e.msg, e.cause, done + e.succeeded_stages)
        except BaseException as e:  # noqa: BLE001 — mirrors NonFatal recover
            return IndexError(f"stage '{name}' failed: {e}", e, done)
        done.append(StageSucceeded(
            f"{ok.msg} [{time.monotonic() - t0:.2f}s]"))
    return RunResult(done)
