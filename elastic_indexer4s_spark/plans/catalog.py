"""Generation catalog: list index generations with aliases + creation time.

Spark-native equivalent of the reference's ops-client catalog
(`EsOpsClientApi.scala:13,69-81`: ``IndexWithInfo(index, aliases,
creationTime)`` built by joining the alias listing with per-index
``index.creation_date`` settings) over a root directory of generation dirs
plus a tiny JSON alias manifest.

The catalog is metadata (thousands of rows at most) — plain Python, exactly
as the reference treats it; no Spark jobs are spawned for lifecycle
decisions.  All file access goes through the engine's fs layer, so the
index root may live on any supported store (local, ``file://``, object
stores), not just the POSIX tree.
"""

from __future__ import annotations

import time
from dataclasses import dataclass

from pyarrow import fs as pafs

from .. import fs as FS

ALIAS_MANIFEST = "_aliases.json"
META_FILE = "_meta.json"
CREATED_FILE = "_created"


@dataclass(frozen=True)
class IndexWithInfo:
    """Mirrors `EsOpsClientApi.scala:13`."""
    index: str
    aliases: tuple[str, ...]
    creation_time: int  # epoch millis


@dataclass
class GenerationCatalog:
    root: str
    lock_timeout_s: float = 10.0     # give up acquiring the manifest lock
    lock_stale_s: float = 30.0       # break locks older than this (dead writer)

    # -- generation registration ------------------------------------------

    def path(self, index: str) -> str:
        return FS.join(self.root, index)

    def register(self, index: str, creation_time: int | None = None) -> None:
        """Record creation time (the reference reads ES's
        ``index.creation_date`` setting, `EsOpsClientApi.scala:63-67`)."""
        ts = creation_time if creation_time is not None else int(time.time() * 1000)
        FS.mkdirs(self.path(index))
        FS.write_text(FS.join(self.path(index), CREATED_FILE), str(ts))

    def creation_time(self, index: str) -> int:
        p = FS.join(self.path(index), CREATED_FILE)
        if FS.exists(p):
            return int(FS.read_text(p).strip())
        tok = FS.mtime_token(self.path(index))
        return int(tok // 1_000_000) if isinstance(tok, int) else 0

    # -- alias manifest (atomic) -------------------------------------------

    def _read_aliases(self) -> dict[str, list[str]]:
        """alias -> [index, ...]"""
        p = FS.join(self.root, ALIAS_MANIFEST)
        if not FS.exists(p):
            return {}
        return FS.read_json(p)

    def _write_aliases(self, aliases: dict[str, list[str]]) -> None:
        """Atomic publish: write-temp-then-rename (the engine's equivalent of
        ES's atomic alias-update API used at `EsOpsClientApi.scala:83-87`)."""
        FS.mkdirs(self.root)
        FS.write_json(FS.join(self.root, ALIAS_MANIFEST), aliases,
                      atomic=True)

    def _mutate_aliases(self, fn) -> None:
        """Read-modify-write of the alias manifest under an exclusive lock
        file, so concurrent writers (a streaming drain registering a segment
        per micro-batch + a compaction flipping the alias) serialize instead
        of losing each other's updates — the final rename alone only made
        each PUBLISH atomic, not the read-modify-write.

        Protocol: create ``_aliases.json.lock`` with create-if-absent
        semantics (true O_EXCL locally; object stores plug their native
        conditional put in via ``fs.register_exclusive_backend`` — a true
        CAS; filesystems with neither degrade to check-then-write — see
        fs.create_exclusive); retry with backoff up to
        ``lock_timeout_s``; a lock older
        than ``lock_stale_s`` is presumed abandoned (writer died
        mid-mutation) and is broken.  The lock body carries a unique owner
        token: ownership is re-verified immediately before the publish and
        before the release delete, so a waiter that broke a lock held by a
        STALLED-not-dead writer (GC pause, NFS hiccup) cannot have its own
        fresh lock silently deleted or its update overwritten by the
        stalled writer waking up — the staller's publish aborts instead.
        The stale timestamp is wall-clock and advisory only (cross-host
        skew > lock_stale_s weakens it; ownership verification is what
        protects the manifest).  The mutation itself stays tiny (read
        json, mutate dict, atomic-rename publish), so lock hold time is
        milliseconds.  ``fn`` may return False to signal "nothing
        changed"; the manifest is then left untouched.
        """
        import time as _time
        import uuid as _uuid

        lock = FS.join(self.root, ALIAS_MANIFEST + ".lock")
        token = f"{_time.time()}:{_uuid.uuid4().hex}"
        FS.mkdirs(self.root)
        deadline = _time.monotonic() + self.lock_timeout_s
        while not FS.create_exclusive(lock, token.encode()):
            # the deadline governs EVERY retry path (including transient
            # read failures while the holder is mid-create/mid-release),
            # so no branch can spin past it
            if _time.monotonic() > deadline:
                raise TimeoutError(
                    f"alias manifest lock {lock} held for > "
                    f"{self.lock_timeout_s}s")
            try:
                held = FS.read_text(lock)
                held_since = float(held.split(":", 1)[0])
                if _time.time() - held_since > self.lock_stale_s:
                    # break the abandoned lock ONLY if it is still the one
                    # we judged stale (another waiter may have broken and
                    # re-acquired it in between)
                    if FS.read_text(lock) == held:
                        FS.delete_file(lock)
                    continue
            except (FileNotFoundError, OSError, ValueError):
                pass                         # holder released / mid-create
            _time.sleep(0.005)

        def _owns() -> bool:
            try:
                return FS.read_text(lock) == token
            except (FileNotFoundError, OSError):
                return False

        try:
            a = self._read_aliases()
            changed = fn(a)
            if changed is False:
                return
            # ownership re-check right before publish: if our lock was
            # stale-broken while we stalled, some other writer owns the
            # manifest now — abort rather than clobber its update
            if not _owns():
                raise TimeoutError(
                    f"alias manifest lock {lock} was broken while held "
                    f"(stalled > {self.lock_stale_s}s?); aborting publish")
            self._write_aliases(a)
        finally:
            if _owns():
                try:
                    FS.delete_file(lock)
                except (FileNotFoundError, OSError):
                    pass

    def add_alias(self, alias: str, index: str) -> None:
        """`EsOpsClientApi.scala:83-84` addAliasToIndex."""
        def mut(a):
            members = a.setdefault(alias, [])
            if index in members:
                return False                 # no-op: skip the publish
            members.append(index)
        self._mutate_aliases(mut)

    def set_alias(self, alias: str, indices: list[str]) -> None:
        """Replace the alias' ENTIRE membership in one atomic manifest
        publish — the engine's analog of ES's single atomic alias-update
        request carrying both add and remove actions
        (`EsOpsClientApi.scala:83-87` issues them as one API call).
        Composing the membership in memory and renaming once means a
        concurrent reader sees either the old set or the new set, never a
        mixture (an add followed by N separate removes exposes old+new
        simultaneously — double counting every doc in between)."""
        def mut(a):
            if indices:
                a[alias] = list(dict.fromkeys(indices))
            else:
                a.pop(alias, None)
        self._mutate_aliases(mut)

    def remove_alias(self, alias: str, index: str) -> None:
        """`EsOpsClientApi.scala:86-87` removeAliasFromIndex."""
        def mut(a):
            if alias not in a or index not in a[alias]:
                return False                 # no-op: skip the publish
            a[alias].remove(index)
            if not a[alias]:
                del a[alias]
        self._mutate_aliases(mut)

    # -- scans (A9-A11) ------------------------------------------------------

    def all_indices_with_info(self) -> list[IndexWithInfo]:
        """`EsOpsClientApi.scala:69-81` allIndicesWithAliasInfo: list
        generations joined with alias membership, sorted by creation time."""
        aliases = self._read_aliases()
        by_index: dict[str, list[str]] = {}
        for al, members in aliases.items():
            for idx in members:
                by_index.setdefault(idx, []).append(al)
        out = []
        for info in FS.ls(self.root):
            if info.type != pafs.FileType.Directory:
                continue
            name = info.base_name
            out.append(IndexWithInfo(
                index=name,
                aliases=tuple(sorted(by_index.get(name, []))),
                creation_time=self.creation_time(name)))
        return sorted(out, key=lambda i: (i.creation_time, i.index))

    def indices_by_age_for(self, alias: str) -> list[str]:
        """`EsOpsClientApi.scala:25-28`: generations carrying the alias,
        ascending creation time."""
        return [i.index for i in self.all_indices_with_info()
                if alias in i.aliases]

    def size_for(self, index: str) -> int:
        """Doc count of a generation (`EsOpsClientApi.scala:89-90` — search
        size 0 → totalHits). Reads stats.json; builds always write stats."""
        return int(FS.read_json(
            FS.join(self.path(index), "stats.json"))["num_docs"])

    def latest_index_with_alias_size(self, alias: str) -> int | None:
        """`EsOpsClientApi.scala:30-34`: doc count of the NEWEST generation
        holding the alias; None if the alias is unused."""
        indices = self.indices_by_age_for(alias)
        if not indices:
            return None
        return self.size_for(indices[-1])

    def delete_index(self, index: str) -> None:
        """`EsOpsClientApi.scala:60-61`."""
        FS.delete_dir(self.path(index))

        # drop any alias entries pointing at it (under the same lock as
        # every other manifest mutation)
        def mut(a):
            changed = False
            for al in list(a):
                if index in a[al]:
                    a[al].remove(index)
                    changed = True
                    if not a[al]:
                        del a[al]
            return changed
        self._mutate_aliases(mut)
