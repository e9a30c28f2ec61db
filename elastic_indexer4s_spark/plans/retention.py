"""Retention GC — delete oldest generations (SURVEY §2 A14).

Port of `IndexDeletion.scala:11-25`, behavior pinned by
`IndexDeletionSpec.scala:13-86`:

filter(same prefix) → sort by age → exclude the just-written index →
drop the newest ``keep`` → (optionally) protect any generation holding ANY
alias → delete the rest, oldest first.
"""

from __future__ import annotations

from ..results import StageSucceeded
from .catalog import GenerationCatalog


def delete_oldest(cat: GenerationCatalog, index_prefix: str, new_index: str,
                  keep: int, protect_alias: bool = True) -> StageSucceeded:
    infos = cat.all_indices_with_info()  # already age-ascending
    candidates = [i for i in infos
                  if i.index.startswith(index_prefix)
                  and i.index != new_index]
    victims = candidates[:-keep] if keep > 0 else candidates
    if protect_alias:
        victims = [i for i in victims if not i.aliases]
    for v in victims:
        cat.delete_index(v.index)
    names = [v.index for v in victims]
    return StageSucceeded(f"Deleted indices: {', '.join(names)}")
