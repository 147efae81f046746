"""Manifest commit protocols for published table versions.

The maintenance sinks (:mod:`streaming.maintenance`) publish each
micro-batch as an immutable version directory and then commit a tiny
manifest pointing at it. The COMMIT step is the only piece whose
atomicity depends on the storage system, so it is abstracted here:

- :class:`RenamePublisher` — ``_LATEST`` + ``os.replace``: the classic
  single-file atomic-rename commit. Correct on POSIX filesystems and
  HDFS (rename is atomic); NOT correct on S3-style object stores,
  where "rename" is copy+delete and a reader can observe the missing
  or half-copied manifest.
- :class:`ConditionalPutPublisher` — an append-only ``_commits/`` log
  of ``{seq}.json`` objects, each created with create-exclusive
  semantics; the live manifest is the highest committed sequence.
  This is the object-store-safe protocol: create-exclusive maps 1:1
  to a conditional PUT (S3 ``If-None-Match: *``, GCS
  ``ifGenerationMatch=0``, Azure ``If-None-Match``), and it is the
  same shape as a Delta/Iceberg commit log (writers race on the next
  sequence number; losers re-read and reconcile). On a local
  filesystem the conditional create is emulated exactly: the manifest
  is staged to a temp file and ``os.link``ed into place — the link
  either publishes the FULL content atomically or fails with EEXIST,
  so readers can never observe a partial manifest, which ``open(path,
  'x')`` + write would not guarantee.

Both publishers expose the same two operations — ``read()`` (latest
committed manifest or None) and ``commit(manifest)`` (True if this
writer won) — so the sinks' exactly-once gate logic is protocol-
independent. ``resolve_publisher`` auto-detects which protocol a table
directory uses, so readers need no configuration.
"""

from __future__ import annotations

import json
import os
import uuid

__all__ = [
    "Publisher",
    "RenamePublisher",
    "ConditionalPutPublisher",
    "resolve_publisher",
]


class Publisher:
    """Commit protocol: read the live manifest, conditionally commit a
    new one. Implementations must guarantee (a) readers never observe a
    partial manifest and (b) of two racing commits for the same logical
    successor, exactly one wins."""

    def read(self) -> dict | None:
        raise NotImplementedError

    def commit(self, manifest: dict) -> bool:
        """Publish ``manifest`` as the new live manifest. Returns True
        if this writer's commit is now (or is superseded by an equal-
        or-newer commit of the same query incarnation) the live one;
        False if a conflicting writer advanced past it first."""
        raise NotImplementedError


class RenamePublisher(Publisher):
    """``_LATEST`` single-file manifest, committed by atomic rename.

    The original protocol: correct where rename is atomic (POSIX,
    HDFS); last-writer-wins with no conflict detection, which the
    sinks tolerate because replayed batches re-publish identical
    content. Do not use on S3-style stores — use
    :class:`ConditionalPutPublisher`.
    """

    def __init__(self, table_path: str):
        self.table_path = table_path

    @property
    def _path(self) -> str:
        return os.path.join(self.table_path, "_LATEST")

    def read(self) -> dict | None:
        if not os.path.exists(self._path):
            return None
        return json.loads(open(self._path).read())

    def commit(self, manifest: dict) -> bool:
        tmp = self._path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(manifest, fh)
        os.replace(tmp, self._path)
        return True


class ConditionalPutPublisher(Publisher):
    """Append-only ``_commits/{seq:020d}.json`` log; the live manifest
    is the highest sequence. Each commit object is created with
    conditional-create semantics (local-FS emulation: stage + hard
    link, atomic full-content-or-EEXIST), so two writers racing on the
    same sequence produce exactly one winner — the loser re-reads and
    either finds its batch already covered (a replica published the
    same or a newer batch: success) or retries at the next sequence.

    Old commit objects are retained (KB-scale) for audit; a vacuum
    pass may drop all but the last N, mirroring Delta log cleanup.
    """

    MAX_ATTEMPTS = 16

    def __init__(self, table_path: str):
        self.table_path = table_path

    @property
    def _dir(self) -> str:
        return os.path.join(self.table_path, "_commits")

    def _entries(self) -> list[str]:
        if not os.path.isdir(self._dir):
            return []
        return sorted(
            f for f in os.listdir(self._dir) if f.endswith(".json")
        )

    def read(self) -> dict | None:
        entries = self._entries()
        if not entries:
            return None
        return json.loads(
            open(os.path.join(self._dir, entries[-1])).read()
        )

    def _try_put(self, seq: int, manifest: dict) -> bool:
        """One conditional PUT of ``{seq}.json``: True iff created."""
        os.makedirs(self._dir, exist_ok=True)
        final = os.path.join(self._dir, f"{seq:020d}.json")
        tmp = os.path.join(self._dir, f".stage-{uuid.uuid4().hex}")
        with open(tmp, "w") as fh:
            json.dump(manifest, fh)
        try:
            os.link(tmp, final)  # atomic create-exclusive w/ content
            return True
        except FileExistsError:
            return False
        finally:
            os.unlink(tmp)

    def commit(self, manifest: dict) -> bool:
        for _ in range(self.MAX_ATTEMPTS):
            entries = self._entries()
            seq = (
                int(entries[-1].split(".")[0]) + 1 if entries else 0
            )
            if self._try_put(seq, manifest):
                return True
            # lost the race: if the winner (same query incarnation)
            # already covers this batch, the publish goal is met
            live = self.read()
            if (
                live is not None
                and live.get("query_id") == manifest.get("query_id")
                and live.get("gen", 0) >= manifest.get("gen", 0)
                and live["batch_id"] >= manifest["batch_id"]
            ):
                return False
        raise RuntimeError(
            f"manifest commit contended {self.MAX_ATTEMPTS} times at "
            f"{self._dir}"
        )


def resolve_publisher(
    table_path: str, publisher: "Publisher | str | None" = None
) -> Publisher:
    """Publisher instance for a table: pass-through for instances,
    ``"rename"`` / ``"conditional_put"`` by name, or None to
    auto-detect from the table directory (an existing ``_commits/``
    log wins; otherwise the rename protocol, which is also the default
    for brand-new tables so existing local/HDFS deployments keep their
    layout)."""
    if isinstance(publisher, Publisher):
        return publisher
    if publisher == "rename":
        return RenamePublisher(table_path)
    if publisher == "conditional_put":
        return ConditionalPutPublisher(table_path)
    if publisher is None:
        if os.path.isdir(os.path.join(table_path, "_commits")):
            return ConditionalPutPublisher(table_path)
        return RenamePublisher(table_path)
    raise ValueError(f"unknown publisher: {publisher!r}")
