"""Threshold-gated alias switching — the publish operator (SURVEY §2 A12/A13).

Port of the reference semantics in `AliasSwitching.scala:15-54` +
`EsOpsClientApi.scala:36-46`, behavior pinned by `AliasSwitchSpec.scala:28-93`:

* compare new generation's doc count against the NEWEST generation currently
  holding the alias: ``ratio = new/old`` must satisfy ``minT < ratio ≤ maxT``
  (defaults 0.95 / 1.25, `IndexableStream.scala:19`);
* on pass: remove the alias from the OLDEST generation holding it, add it to
  the new one (`EsOpsClientApi.scala:42-46`, order pinned by
  `AliasSwitchSpec.scala:57-68`);
* if the alias is unused anywhere, create it on the new index
  (`AliasSwitching.scala:30-32`);
* the reference sleeps ``waitForElasticTimeout`` (5 s) first to let ES's
  near-real-time refresh settle (`AliasSwitching.scala:24`) — Spark writes
  are strongly consistent on job completion, so the engine drops the sleep
  and keeps the gate.
"""

from __future__ import annotations

from ..results import StageSucceeded
from .catalog import GenerationCatalog


class AliasSwitchError(Exception):
    pass


def check_threshold(min_t: float, max_t: float, ratio: float) -> bool:
    """`AliasSwitching.scala:54`: minT < ratio ≤ maxT."""
    return min_t < ratio <= max_t


def switch_alias(cat: GenerationCatalog, alias: str, new_index: str,
                 min_t: float = 0.95, max_t: float = 1.25) -> StageSucceeded:
    """Returns StageSuccess or raises AliasSwitchError (which the stage
    railway converts to an IndexError preserving prior stages)."""
    old_size = cat.latest_index_with_alias_size(alias)
    if old_size is None:
        cat.add_alias(alias, new_index)
        return StageSucceeded(
            f"Added alias {alias} to new index {new_index}")
    new_size = cat.size_for(new_index)
    ratio = new_size / old_size if old_size else float("inf")
    if not check_threshold(min_t, max_t, ratio):
        raise AliasSwitchError(
            f"Switching failed, new index size deviation {ratio!r} "
            f"not in ({min_t}, {max_t}] (new={new_size}, old={old_size})")
    # remove from the OLDEST index carrying the alias, add to the new one
    oldest = cat.indices_by_age_for(alias)[0]
    cat.remove_alias(alias, oldest)
    cat.add_alias(alias, new_index)
    return StageSucceeded(
        f"Switched alias {alias} from {oldest} to {new_index}")
