"""Streaming CDC-upsert sink: continuous maintenance, restart safety.

Drives streaming/maintenance.py through three availableNow runs over a
growing change directory (the same harness shape as the exactly-once
sink test in test_datapipe.py): batch 1 bootstraps, batch 2 upserts +
deletes against the published table, and a restart with NO new data
must be a no-op (checkpoint skips committed batches). Final state is
asserted equal to batch-mode cdc_compact over the full change log.
"""

from __future__ import annotations

import datetime as dt
import os

import pytest

from pyspark.sql import functions as F

from qudo_etl_pipeline_spark.operators.analytics import cdc_compact
from qudo_etl_pipeline_spark.streaming.maintenance import (
    read_maintained_table,
    streaming_upsert,
)

SCHEMA = "k bigint, v string, ts timestamp, op string"


def _ts(minute: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 0, minute)


def _drain(spark, src, table, ckpt, publisher=None):
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("recursiveFileLookup", "true")
        .parquet(src)
    )
    q = streaming_upsert(
        stream, table, ckpt, keys=["k"], ts_col="ts", publisher=publisher
    )
    q.awaitTermination()


def _state(spark, table):
    df = read_maintained_table(spark, table)
    return sorted((r["k"], r["v"]) for r in df.select("k", "v").collect())


@pytest.mark.parametrize("publisher", ["rename", "conditional_put"])
def test_streaming_upsert_maintains_and_survives_restart(
    spark, tmp_path, publisher
):
    src = str(tmp_path / "changes")
    table = str(tmp_path / "table")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(table, exist_ok=True)

    batch1 = [(1, "a", _ts(0), "U"), (2, "b", _ts(0), "U"),
              (3, "c", _ts(0), "U")]
    batch2 = [(1, "a2", _ts(1), "U"),   # update
              (2, None, _ts(1), "D"),   # delete
              (4, "d", _ts(1), "U")]    # insert

    spark.createDataFrame(batch1, SCHEMA).write.parquet(
        f"{src}/b1.parquet", mode="overwrite"
    )
    _drain(spark, src, table, ckpt, publisher)
    assert _state(spark, table) == [(1, "a"), (2, "b"), (3, "c")]

    spark.createDataFrame(batch2, SCHEMA).write.parquet(
        f"{src}/b2.parquet", mode="overwrite"
    )
    _drain(spark, src, table, ckpt, publisher)
    after2 = _state(spark, table)
    assert after2 == [(1, "a2"), (3, "c"), (4, "d")]

    # restart with no new data: checkpoint must make it a no-op
    _drain(spark, src, table, ckpt, publisher)
    assert _state(spark, table) == after2

    # the continuously-maintained table equals one-shot batch compaction
    # over the full change log
    log = spark.createDataFrame(batch1 + batch2, SCHEMA)
    snapshot = log.drop("op").filter(F.lit(False))
    batch_result = sorted(
        (r["k"], r["v"])
        for r in cdc_compact(snapshot, log, ["k"], "ts")
        .select("k", "v")
        .collect()
    )
    assert batch_result == after2


@pytest.mark.parametrize(
    "publisher", ["rename", "conditional_put", "object_store"]
)
def test_streaming_rollup_equals_batch_aggregate(spark, tmp_path, publisher):
    """Two micro-batches of raw values -> maintained state must equal a
    one-shot batch aggregate over everything; then a checkpoint LOSS
    replays all input and the manifest's batch-id gate must prevent
    double-counting (state merge is additive, not idempotent)."""
    import shutil

    from qudo_etl_pipeline_spark.operators.incremental import (
        finalize_state,
        partial_state,
    )
    from qudo_etl_pipeline_spark.streaming.maintenance import streaming_rollup

    schema = "g bigint, v double"
    src = str(tmp_path / "src")
    table = str(tmp_path / "table")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(table, exist_ok=True)

    b1 = [(i % 3, i * 0.25) for i in range(40)]
    b2 = [(i % 3, 10 - i * 0.5) for i in range(25)]
    spark.createDataFrame(b1, schema).write.parquet(f"{src}/b1")

    def drain():
        stream = (
            spark.readStream.schema(schema)
            .option("recursiveFileLookup", "true")
            .parquet(src)
        )
        streaming_rollup(
            stream, table, ckpt, ["g"], "v", publisher=publisher
        ).awaitTermination()

    def state():
        df = finalize_state(read_maintained_table(spark, table), ["g"])
        return sorted(
            (r["g"], r["n"], r["total"], r["total_sq"]) for r in df.collect()
        )

    drain()
    import time

    time.sleep(1.1)
    spark.createDataFrame(b2, schema).write.parquet(f"{src}/b2")
    drain()

    batch = finalize_state(
        partial_state(spark.createDataFrame(b1 + b2, schema), ["g"], "v"),
        ["g"],
    )
    expected = sorted(
        (r["g"], r["n"], r["total"], r["total_sq"]) for r in batch.collect()
    )
    assert state() == expected

    # checkpoint loss: the whole source replays under fresh batch ids;
    # the gate detects the id reset and REBUILDS from the full re-read
    # (no double counting either way)
    shutil.rmtree(ckpt)
    drain()
    assert state() == expected

    # checkpoint loss WITH new data afterwards: skipping the replayed
    # ids would drop b3 forever (round-4 review finding) — the rebuild
    # must land exactly at the batch aggregate over b1+b2+b3
    time.sleep(1.1)
    b3 = [(i % 3, 3.5 * i) for i in range(10)]
    spark.createDataFrame(b3, schema).write.parquet(f"{src}/b3")
    shutil.rmtree(ckpt)
    drain()
    full = finalize_state(
        partial_state(
            spark.createDataFrame(b1 + b2 + b3, schema), ["g"], "v"
        ),
        ["g"],
    )
    assert state() == sorted(
        (r["g"], r["n"], r["total"], r["total_sq"]) for r in full.collect()
    )


def test_conditional_put_publisher_protocol(tmp_path):
    """The object-store commit protocol in isolation: create-exclusive
    sequencing, loser reconciliation, no partial manifests, and
    reader auto-detection of the protocol."""
    from qudo_etl_pipeline_spark.streaming.publish import (
        ConditionalPutPublisher,
        RenamePublisher,
        resolve_publisher,
    )

    table = str(tmp_path / "t")
    os.makedirs(table)
    a = ConditionalPutPublisher(table)
    b = ConditionalPutPublisher(table)  # a racing "zombie" writer

    assert a.read() is None
    assert a.commit({"version": "v0", "batch_id": 0, "gen": 0,
                     "query_id": "q"}) is True
    assert a.read()["version"] == "v0"

    # same-incarnation racer publishing an OLDER batch: loses the race
    # to the seq it read, reconciles as already-covered
    assert a.commit({"version": "v1", "batch_id": 1, "gen": 0,
                     "query_id": "q"}) is True
    seq_files = sorted(os.listdir(os.path.join(table, "_commits")))
    assert [f for f in seq_files if f.endswith(".json")] == [
        f"{0:020d}.json", f"{1:020d}.json"
    ]
    # b raced and lost at seq 2 while a also committed batch 2: emulate
    # by a committing first, then b retrying the same batch id
    assert a.commit({"version": "v2", "batch_id": 2, "gen": 0,
                     "query_id": "q"}) is True
    assert b.commit({"version": "v2r", "batch_id": 2, "gen": 0,
                     "query_id": "q"}) is True  # next free seq, still wins
    assert b.read()["batch_id"] == 2

    # every commit object is complete JSON (no partial manifests)
    import json as _json

    cdir = os.path.join(table, "_commits")
    for f in sorted(os.listdir(cdir)):
        if f.endswith(".json"):
            _json.loads(open(os.path.join(cdir, f)).read())

    # auto-detect: _commits/ present -> conditional publisher; a fresh
    # table -> rename
    assert isinstance(resolve_publisher(table), ConditionalPutPublisher)
    fresh = str(tmp_path / "fresh")
    os.makedirs(fresh)
    assert isinstance(resolve_publisher(fresh), RenamePublisher)


def test_object_store_publisher_cas_race_and_coverage(tmp_path):
    """The real conditional-PUT protocol under an injected LIST race:
    a writer acting on a STALE listing collides at an occupied
    sequence (PreconditionFailed), then either retries at the next
    sequence (newer batch -> wins) or reconciles as already-covered
    (same batch -> False, no duplicate commit object)."""
    from qudo_etl_pipeline_spark.streaming.publish import (
        LocalObjectStore,
        ObjectStoreConditionalPutPublisher,
    )

    table = str(tmp_path / "t")
    root = os.path.join(table, "_commits")

    class StaleListStore(LocalObjectStore):
        def __init__(self, root, stale_times):
            super().__init__(root)
            self.stale = stale_times

        def list_keys(self):
            keys = super().list_keys()
            if self.stale > 0 and keys:
                self.stale -= 1
                return keys[:-1]  # pretend the newest commit isn't there
            return keys

    a = ObjectStoreConditionalPutPublisher(table, writer_id="A")
    m = {"query_id": "q", "gen": 0}
    assert a.commit({**m, "batch_id": 0, "version": "v0"}) is True

    # stale racer with a NEWER batch: collides at seq 0, retries, wins
    b = ObjectStoreConditionalPutPublisher(
        table, store=StaleListStore(root, stale_times=1), writer_id="B"
    )
    assert b.commit({**m, "batch_id": 1, "version": "v1"}) is True
    assert a.read()["batch_id"] == 1
    assert len(os.listdir(root)) == 2

    # stale racer REPLAYING the covered batch: collides, reconciles as
    # covered -> False and the commit log does not grow
    c = ObjectStoreConditionalPutPublisher(
        table, store=StaleListStore(root, stale_times=1), writer_id="C"
    )
    assert c.commit({**m, "batch_id": 1, "version": "v1r"}) is False
    assert len(os.listdir(root)) == 2
    assert a.read()["version"] == "v1"


def test_object_store_publisher_ambiguous_put_resolution(tmp_path):
    """The 5xx-after-success case: the PUT landed but the response was
    lost. The writer must recognize its own token on read-back and
    claim the win WITHOUT creating a duplicate commit; the
    fault-before case (request never landed) must retry and succeed."""
    from qudo_etl_pipeline_spark.streaming.publish import (
        LocalObjectStore,
        ObjectStoreConditionalPutPublisher,
    )

    table = str(tmp_path / "t")
    root = os.path.join(table, "_commits")
    m = {"query_id": "q", "gen": 0}

    after = {"arm": 1}
    store = LocalObjectStore(
        root,
        fail_after=lambda key: after.__setitem__("arm", after["arm"] - 1)
        or after["arm"] >= 0,
    )
    p = ObjectStoreConditionalPutPublisher(table, store=store, writer_id="W")
    assert p.commit({**m, "batch_id": 0, "version": "v0"}) is True
    assert len(os.listdir(root)) == 1  # no duplicate despite the fault
    assert p.read()["version"] == "v0"

    before = {"arm": 2}
    store2 = LocalObjectStore(
        root,
        fail_before=lambda key: before.__setitem__(
            "arm", before["arm"] - 1
        )
        or before["arm"] >= 0,
    )
    p2 = ObjectStoreConditionalPutPublisher(
        table, store=store2, writer_id="X"
    )
    assert p2.commit({**m, "batch_id": 1, "version": "v1"}) is True
    assert p2.read()["batch_id"] == 1
    assert len(os.listdir(root)) == 2

    # a DIFFERENT writer suffering ambiguity on a key another writer
    # won must NOT claim it: token mismatch -> race loss path
    class AlwaysAmbiguousOnOccupied(LocalObjectStore):
        def put_if_absent(self, key, data):
            from qudo_etl_pipeline_spark.streaming.publish import (
                TransientStoreError,
            )

            if self.get(key) is not None:
                raise TransientStoreError("ambiguous on occupied key")
            return super().put_if_absent(key, data)

    class Stale(AlwaysAmbiguousOnOccupied):
        def __init__(self, root):
            super().__init__(root)
            self.stale = 1

        def list_keys(self):
            keys = super().list_keys()
            if self.stale > 0 and keys:
                self.stale -= 1
                return keys[:-1]
            return keys

    y = ObjectStoreConditionalPutPublisher(
        table, store=Stale(root), writer_id="Y"
    )
    # replays batch 1 against a stale list: ambiguous collision at the
    # occupied seq, read-back shows writer X's token -> covered -> False
    assert y.commit({**m, "batch_id": 1, "version": "v1r"}) is False
    assert len(os.listdir(root)) == 2


def test_streaming_upsert_through_faulty_object_store(spark, tmp_path):
    """End-to-end exactly-once THROUGH injected store faults: every
    micro-batch commit first suffers an ambiguous PUT (object landed,
    response lost) — the maintained table must still equal batch-mode
    compaction, with one commit object per published batch."""
    from qudo_etl_pipeline_spark.streaming.publish import (
        LocalObjectStore,
        ObjectStoreConditionalPutPublisher,
    )

    src = str(tmp_path / "changes")
    table = str(tmp_path / "table")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(table, exist_ok=True)
    root = os.path.join(table, "_commits")

    seen: set = set()

    def ambiguous_once_per_key(key: str) -> bool:
        if key in seen:
            return False
        seen.add(key)
        return True

    pub = ObjectStoreConditionalPutPublisher(
        table, store=LocalObjectStore(root, fail_after=ambiguous_once_per_key)
    )

    batch1 = [(1, "a", _ts(0), "U"), (2, "b", _ts(0), "U")]
    batch2 = [(1, "a2", _ts(1), "U"), (3, "c", _ts(1), "U")]
    spark.createDataFrame(batch1, SCHEMA).write.parquet(
        f"{src}/b1.parquet", mode="overwrite"
    )
    _drain(spark, src, table, ckpt, pub)
    assert _state(spark, table) == [(1, "a"), (2, "b")]

    import time

    time.sleep(1.1)
    spark.createDataFrame(batch2, SCHEMA).write.parquet(
        f"{src}/b2.parquet", mode="overwrite"
    )
    _drain(spark, src, table, ckpt, pub)
    assert _state(spark, table) == [(1, "a2"), (2, "b"), (3, "c")]
    # one commit object per PUBLISHED batch — the ambiguity never
    # produced a duplicate
    commits = [f for f in os.listdir(root) if f.endswith(".json")]
    assert len(commits) == len(seen) == 2


def test_conditional_put_lost_manifest_rebuild(spark, tmp_path):
    """Losing the ENTIRE commit log (manifest gone, data versions
    still on disk) plus the checkpoint must rebuild the published
    table from the full source re-read — same guarantee the rename
    protocol's lost-_LATEST case has."""
    import shutil

    src = str(tmp_path / "changes")
    table = str(tmp_path / "table")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(table, exist_ok=True)

    batch1 = [(1, "a", _ts(0), "U"), (2, "b", _ts(0), "U")]
    spark.createDataFrame(batch1, SCHEMA).write.parquet(
        f"{src}/b1.parquet", mode="overwrite"
    )
    _drain(spark, src, table, ckpt, "conditional_put")
    assert _state(spark, table) == [(1, "a"), (2, "b")]

    shutil.rmtree(os.path.join(table, "_commits"))
    shutil.rmtree(ckpt)
    _drain(spark, src, table, ckpt, "conditional_put")
    assert _state(spark, table) == [(1, "a"), (2, "b")]


def test_streaming_heavy_hitters_bound_and_replay(spark, tmp_path):
    """MG summary maintained across micro-batches: after any number of
    batches every estimate obeys true - n/(cap+1) <= est <= true, every
    key above the n/(cap+1) mass is PRESENT, the exact processed-row
    total rides in the NULL-key row, and a checkpoint loss rebuilds
    without double counting."""
    import collections
    import shutil
    import time

    from qudo_etl_pipeline_spark.streaming.maintenance import (
        streaming_heavy_hitters,
    )

    schema = "k bigint"
    src = str(tmp_path / "src")
    table = str(tmp_path / "table")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(table, exist_ok=True)
    cap = 8

    b1 = [7] * 60 + [8] * 30 + list(range(100, 140))
    b2 = [7] * 20 + [9] * 45 + list(range(200, 230))

    def drain():
        stream = (
            spark.readStream.schema(schema)
            .option("recursiveFileLookup", "true")
            .parquet(src)
        )
        streaming_heavy_hitters(
            stream, table, ckpt, "k", cap
        ).awaitTermination()

    def state():
        df = read_maintained_table(spark, table)
        rows = {r["__hk"]: r["cnt"] for r in df.collect()}
        total = rows.pop(None)
        return rows, total

    def check(data):
        est, total = state()
        assert total == len(data)
        assert len(est) <= cap
        true = collections.Counter(data)
        err = len(data) / (cap + 1)
        for k, c in est.items():
            assert c <= true[k] and c >= true[k] - err, (k, c, true[k])
        for k, c in true.items():
            if c > err:
                assert k in est, (k, c, err)

    spark.createDataFrame([(k,) for k in b1], schema).write.parquet(
        f"{src}/b1"
    )
    drain()
    check(b1)

    time.sleep(1.1)
    spark.createDataFrame([(k,) for k in b2], schema).write.parquet(
        f"{src}/b2"
    )
    drain()
    check(b1 + b2)

    # checkpoint loss: full replay under fresh ids -> rebuild, same bound
    shutil.rmtree(ckpt)
    drain()
    check(b1 + b2)


def test_streaming_heavy_hitters_null_keys_only_inflate_total(
    spark, tmp_path
):
    """Null stream keys count toward n_total (they were processed rows)
    but must NOT merge a null candidate row into the NULL-key total
    sentinel — the published total must equal exactly the processed row
    count, matching the batch kernel's dropna-candidates semantics."""
    from qudo_etl_pipeline_spark.streaming.maintenance import (
        streaming_heavy_hitters,
    )

    schema = "k bigint"
    src = str(tmp_path / "src")
    table = str(tmp_path / "table")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(table, exist_ok=True)

    data = [7] * 10 + [None] * 5 + [8] * 3
    spark.createDataFrame([(k,) for k in data], schema).write.parquet(
        f"{src}/b1"
    )
    stream = (
        spark.readStream.schema(schema)
        .option("recursiveFileLookup", "true")
        .parquet(src)
    )
    streaming_heavy_hitters(stream, table, ckpt, "k", 4).awaitTermination()
    rows = {
        r["__hk"]: r["cnt"]
        for r in read_maintained_table(spark, table).collect()
    }
    # sentinel == processed rows INCLUDING nulls, not inflated by a
    # null candidate row's count merging in
    assert rows.pop(None) == len(data)
    assert rows == {7: 10, 8: 3}


def test_vacuum_commits_preserves_live_manifest_and_sequencing(tmp_path):
    """Vacuum drops only strictly-older commit objects: the live
    manifest is unchanged, the next commit continues the sequence
    monotonically, and keep_last >= log size is a no-op."""
    from qudo_etl_pipeline_spark.streaming.publish import (
        ConditionalPutPublisher,
        ObjectStoreConditionalPutPublisher,
        vacuum_commits,
    )

    table = str(tmp_path / "t")
    os.makedirs(table)
    p = ObjectStoreConditionalPutPublisher(table, writer_id="W")
    for i in range(7):
        assert p.commit(
            {"query_id": "q", "gen": 0, "batch_id": i, "version": f"v{i}"}
        )
    root = os.path.join(table, "_commits")
    assert len(os.listdir(root)) == 7
    assert vacuum_commits(table, keep_last=3) == 4
    assert len(os.listdir(root)) == 3
    assert p.read()["version"] == "v6"
    # layout interop: the plain conditional publisher reads the same
    assert ConditionalPutPublisher(table).read()["version"] == "v6"
    # sequencing continues past the vacuumed prefix
    assert p.commit(
        {"query_id": "q", "gen": 0, "batch_id": 7, "version": "v7"}
    )
    assert sorted(os.listdir(root))[-1] == f"{7:020d}.json"
    # no-op when the log is already small enough
    assert vacuum_commits(table, keep_last=10) == 0
    import pytest as _pytest

    with _pytest.raises(ValueError):
        vacuum_commits(table, keep_last=0)


def test_object_store_publisher_survives_transient_list_failures(tmp_path):
    """LIST is as retryable as PUT/GET: a commit whose first listings
    return 5xx must retry and land, and read() must survive a flaky
    listing too — the commit loop's retry contract covers every store
    call, not just the conditional create."""
    from qudo_etl_pipeline_spark.streaming.publish import (
        LocalObjectStore,
        ObjectStoreConditionalPutPublisher,
        TransientStoreError,
    )

    table = str(tmp_path / "t")
    root = os.path.join(table, "_commits")

    class FlakyListStore(LocalObjectStore):
        def __init__(self, root, fail_times):
            super().__init__(root)
            self.fail = fail_times

        def list_keys(self):
            if self.fail > 0:
                self.fail -= 1
                raise TransientStoreError("injected LIST 503")
            return super().list_keys()

    p = ObjectStoreConditionalPutPublisher(
        table, store=FlakyListStore(root, fail_times=3), writer_id="W"
    )
    m = {"query_id": "q", "gen": 0}
    assert p.commit({**m, "batch_id": 0, "version": "v0"}) is True
    assert len(os.listdir(root)) == 1

    r = ObjectStoreConditionalPutPublisher(
        table, store=FlakyListStore(root, fail_times=2), writer_id="R"
    )
    assert r.read()["version"] == "v0"


def test_publisher_exhaustion_names_the_failure_mode(tmp_path):
    """Exhausting attempts on fail-before faults must report a store
    availability problem, not phantom CAS contention; backoff must be
    skippable for tests via backoff_base=0."""
    import os

    import pytest

    from qudo_etl_pipeline_spark.streaming.publish import (
        LocalObjectStore,
        ObjectStoreConditionalPutPublisher,
    )

    table = str(tmp_path / "t")
    root = os.path.join(table, "_commits")
    dead = LocalObjectStore(root, fail_before=lambda key: True)
    p = ObjectStoreConditionalPutPublisher(
        table, store=dead, writer_id="W", backoff_base=0
    )
    with pytest.raises(RuntimeError, match="transient store errors"):
        p.commit({"query_id": "q", "gen": 0, "batch_id": 0})


def test_publisher_backoff_schedule_is_capped_with_jitter():
    from qudo_etl_pipeline_spark.streaming.publish import (
        ObjectStoreConditionalPutPublisher,
    )

    p = ObjectStoreConditionalPutPublisher(
        "/tmp/unused-table", writer_id="W", backoff_base=0.05
    )
    slept = []
    import qudo_etl_pipeline_spark.streaming.publish as pub

    orig = pub.time.sleep
    pub.time.sleep = slept.append
    try:
        for attempt in range(12):
            p._backoff(attempt)
    finally:
        pub.time.sleep = orig
    # exponential up to the cap, full jitter in [0.5x, 1x]
    for attempt, d in enumerate(slept):
        ceiling = min(p.BACKOFF_CAP, 0.05 * 2**attempt)
        assert ceiling * 0.5 <= d <= ceiling
    assert max(slept) <= p.BACKOFF_CAP
