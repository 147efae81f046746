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

- :class:`ObjectStoreConditionalPutPublisher` — the same sequence-log
  protocol spoken through an :class:`ObjectStore` adapter: the real
  S3/GCS/Azure conditional-PUT semantics (If-None-Match / generation
  match), a CAS retry loop for PreconditionFailed losers, and
  writer-token read-back resolution for AMBIGUOUS puts (5xx/timeout
  after the object landed). A cloud deployment implements the
  three-method :class:`ObjectStore` with its vendor SDK; the protocol
  layer above is store-independent and contract-tested here through
  the fault-injecting :class:`LocalObjectStore`.

All publishers expose the same two operations — ``read()`` (latest
committed manifest or None) and ``commit(manifest)`` (True if this
writer won) — so the sinks' exactly-once gate logic is protocol-
independent. ``resolve_publisher`` auto-detects which protocol a table
directory uses, so readers need no configuration.
"""

from __future__ import annotations

import json
import os
import random
import time
import uuid

__all__ = [
    "Publisher",
    "RenamePublisher",
    "ConditionalPutPublisher",
    "ObjectStore",
    "LocalObjectStore",
    "TransientStoreError",
    "ObjectStoreConditionalPutPublisher",
    "vacuum_commits",
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


class TransientStoreError(Exception):
    """A store request failed with an UNKNOWN outcome (the 5xx /
    timeout class): the object may or may not have been created. The
    caller must resolve the ambiguity by reading back — never by
    blindly retrying a non-idempotent create."""


class ObjectStore:
    """The minimal object-store surface the commit protocol needs —
    three operations, each with a direct mapping onto every major
    store's public API:

    - ``get(key)``: GET object (None on 404).
    - ``put_if_absent(key, data)``: conditional create — S3
      ``PUT`` + ``If-None-Match: *`` (412 Precondition Failed when the
      key exists; 409 under a concurrent in-flight conditional write,
      which surfaces here as :class:`TransientStoreError` to retry),
      GCS ``ifGenerationMatch=0``, Azure Blob ``If-None-Match: *``.
      Returns True iff this call created the object.
    - ``list_keys()``: LIST under the commit prefix (object stores
      list lexicographically, which is exactly the sequence order).

    A cloud adapter implements these three calls with the vendor SDK
    and raises :class:`TransientStoreError` for retryable/ambiguous
    failures; everything above it (sequencing, CAS retries, ambiguity
    resolution) is store-independent.
    """

    def get(self, key: str) -> bytes | None:
        raise NotImplementedError

    def put_if_absent(self, key: str, data: bytes) -> bool:
        raise NotImplementedError

    def list_keys(self) -> list[str]:
        raise NotImplementedError

    def delete(self, key: str) -> None:
        """Idempotent delete (no error on 404) — used only by vacuum,
        never by the commit protocol itself."""
        raise NotImplementedError


class LocalObjectStore(ObjectStore):
    """Directory-backed :class:`ObjectStore` with EXACT
    conditional-create semantics (stage + ``os.link``: the key appears
    with its full content atomically or the call loses with EEXIST —
    readers can never observe a partial object).

    Fault injection for contract tests: ``fail_before`` / ``fail_after``
    are ``key -> bool`` callables; returning True raises
    :class:`TransientStoreError` respectively BEFORE the create (the
    request never reached the store) or AFTER it succeeded (the object
    exists but the response was lost — the classic ambiguous PUT every
    real network client must handle).
    """

    def __init__(self, root: str, fail_before=None, fail_after=None):
        self.root = root
        self.fail_before = fail_before
        self.fail_after = fail_after

    def get(self, key: str) -> bytes | None:
        try:
            with open(os.path.join(self.root, key), "rb") as fh:
                return fh.read()
        except FileNotFoundError:
            return None

    def list_keys(self) -> list[str]:
        if not os.path.isdir(self.root):
            return []
        return sorted(
            f for f in os.listdir(self.root) if f.endswith(".json")
        )

    def put_if_absent(self, key: str, data: bytes) -> bool:
        if self.fail_before is not None and self.fail_before(key):
            raise TransientStoreError(f"injected fault before PUT {key}")
        os.makedirs(self.root, exist_ok=True)
        final = os.path.join(self.root, key)
        tmp = os.path.join(self.root, f".stage-{uuid.uuid4().hex}")
        with open(tmp, "wb") as fh:
            fh.write(data)
        try:
            os.link(tmp, final)
            created = True
        except FileExistsError:
            created = False
        finally:
            os.unlink(tmp)
        if created and self.fail_after is not None and self.fail_after(key):
            raise TransientStoreError(f"injected fault after PUT {key}")
        return created

    def delete(self, key: str) -> None:
        try:
            os.unlink(os.path.join(self.root, key))
        except FileNotFoundError:
            pass


class ObjectStoreConditionalPutPublisher(Publisher):
    """The :class:`ConditionalPutPublisher` sequence-log protocol
    spoken through an :class:`ObjectStore` — i.e. the REAL S3/GCS/Azure
    conditional-PUT commit, not just its local-FS shadow. Same
    ``_commits/{seq:020d}.json`` layout (the two publishers are
    layout-interchangeable on a local store), plus the two behaviors a
    networked store forces:

    1. **CAS retry loop**: LIST -> next sequence -> conditional PUT;
       a PreconditionFailed loser re-reads and either finds its batch
       already covered by the same query incarnation (success-by-proxy,
       returns False) or retries at the next sequence.
    2. **Ambiguous-PUT resolution**: every payload carries this
       writer's UUID under ``"_writer"``. When the PUT outcome is
       unknown (:class:`TransientStoreError`), the writer GETs the key
       back: its own token means ITS put landed (win — retrying the
       create would wrongly lose to itself); another writer's token
       means a genuine race loss; 404 means the request never landed
       and the same sequence is retried. This is the standard
       idempotency device for non-idempotent creates over an
       at-most-once-unknown transport.
    """

    MAX_ATTEMPTS = 16
    #: first retry delay; doubles per attempt, capped at BACKOFF_CAP.
    #: Full jitter (0.5x-1x) decorrelates a writer herd hammering a
    #: degraded store. backoff_base=0 disables sleeping (tests).
    BACKOFF_BASE = 0.05
    BACKOFF_CAP = 2.0

    def __init__(
        self,
        table_path: str,
        store: ObjectStore | None = None,
        writer_id: str | None = None,
        backoff_base: float | None = None,
    ):
        self.table_path = table_path
        self.store = (
            store
            if store is not None
            else LocalObjectStore(os.path.join(table_path, "_commits"))
        )
        self.writer_id = writer_id or uuid.uuid4().hex
        self.backoff_base = (
            self.BACKOFF_BASE if backoff_base is None else backoff_base
        )
        # seeded per writer: reproducible traces, decorrelated herd
        self._rng = random.Random(self.writer_id)

    def _backoff(self, attempt: int) -> None:
        if self.backoff_base <= 0:
            return
        delay = min(self.BACKOFF_CAP, self.backoff_base * (2**attempt))
        time.sleep(delay * (0.5 + self._rng.random() / 2))

    def _get_with_retry(self, key: str) -> bytes | None:
        last: Exception | None = None
        for attempt in range(self.MAX_ATTEMPTS):
            try:
                return self.store.get(key)
            except TransientStoreError as exc:  # pragma: no cover
                last = exc
                self._backoff(attempt)
        raise last  # pragma: no cover

    def _list_with_retry(self) -> list[str]:
        # LIST is as retryable as GET: an adapter following the
        # documented contract raises TransientStoreError on 5xx, and a
        # crash here would bypass the commit loop's own retry machinery
        last: Exception | None = None
        for attempt in range(self.MAX_ATTEMPTS):
            try:
                return self.store.list_keys()
            except TransientStoreError as exc:
                last = exc
                self._backoff(attempt)
        raise last

    def read(self) -> dict | None:
        keys = self._list_with_retry()
        if not keys:
            return None
        data = self._get_with_retry(keys[-1])
        if data is None:  # pragma: no cover - vacuum race
            return None
        return json.loads(data)

    def commit(self, manifest: dict) -> bool:
        payload = json.dumps(
            {**manifest, "_writer": self.writer_id}
        ).encode()
        transient = 0
        contended = 0
        for attempt in range(self.MAX_ATTEMPTS):
            keys = self._list_with_retry()
            seq = int(keys[-1].split(".")[0]) + 1 if keys else 0
            key = f"{seq:020d}.json"
            try:
                created = self.store.put_if_absent(key, payload)
            except TransientStoreError:
                readback = self._get_with_retry(key)
                if readback is None:
                    # the PUT never landed: same sequence is still free
                    # (or will collide next attempt, which is fine)
                    transient += 1
                    self._backoff(attempt)
                    continue
                created = (
                    json.loads(readback).get("_writer") == self.writer_id
                )
            if created:
                return True
            # lost the race: if the winner (same query incarnation)
            # already covers this batch, the publish goal is met
            contended += 1
            live = self.read()
            if (
                live is not None
                and live.get("query_id") == manifest.get("query_id")
                and live.get("gen", 0) >= manifest.get("gen", 0)
                and live["batch_id"] >= manifest["batch_id"]
            ):
                return False
            self._backoff(attempt)
        # name the actual failure mode: exhausting on fail-before
        # faults is a store availability problem, not writer contention
        if contended == 0:
            raise RuntimeError(
                f"manifest commit: transient store errors exhausted "
                f"{self.MAX_ATTEMPTS} attempts at "
                f"{self.table_path}/_commits (no CAS contention seen)"
            )
        raise RuntimeError(
            f"manifest commit contended after {self.MAX_ATTEMPTS} "
            f"attempts at {self.table_path}/_commits "
            f"({contended} race losses, {transient} transient outcomes)"
        )


def vacuum_commits(
    table_path: str,
    keep_last: int = 10,
    store: ObjectStore | None = None,
) -> int:
    """Drop all but the newest ``keep_last`` commit objects from a
    sequence-log table (the Delta-log-cleanup analogue the commit
    protocol's docstring promises). SAFE under concurrency by the
    protocol's own reading rule: readers take the HIGHEST sequence, so
    deleting strictly-older objects can never change the live
    manifest, and writers compute the next sequence from the highest
    remaining entry, so numbering continues monotonically. Returns the
    number of objects removed. No-op (0) for rename-protocol tables.
    """
    if keep_last < 1:
        raise ValueError("keep_last must be >= 1")
    st = (
        store
        if store is not None
        else LocalObjectStore(os.path.join(table_path, "_commits"))
    )
    keys = st.list_keys()
    victims = keys[:-keep_last] if len(keys) > keep_last else []
    for key in victims:
        st.delete(key)
    return len(victims)


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
    if publisher == "object_store":
        return ObjectStoreConditionalPutPublisher(table_path)
    if publisher is None:
        if os.path.isdir(os.path.join(table_path, "_commits")):
            return ConditionalPutPublisher(table_path)
        return RenamePublisher(table_path)
    raise ValueError(f"unknown publisher: {publisher!r}")
