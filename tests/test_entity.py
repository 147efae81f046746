"""Unit tests for entity resolution (operators/entity.py):
blocking fan-out, the hot-block guard, similarity + exact gates, and
transitive entity closure with singletons."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from qudo_etl_pipeline_spark.operators import entity as E


@pytest.fixture(scope="module")
def people(spark):
    # 1/2/3 are one true entity chain (ann ~ anne ~ annex via 1-edit
    # steps), 4 is a near-name with a DIFFERENT city (exact gate must
    # reject), 5 is a singleton, 6/7 are an identical-name pair in
    # another block.
    rows = [
        (1, "anna", "nyc"),
        (2, "annb", "nyc"),
        (3, "annbx", "nyc"),
        (4, "annc", "sfo"),
        (5, "bob", "nyc"),
        (6, "carol", "chi"),
        (7, "carol", "chi"),
    ]
    return spark.createDataFrame(rows, "id: long, name: string, city: string")


def test_blocking_and_hot_block_guard(spark, people):
    blocks = E.blocking_keys(people, "id", [F.substring("name", 1, 2)])
    got = {(r["block_key"], r["id"]) for r in blocks.collect()}
    assert ("an", 1) in got and ("ca", 7) in got and len(got) == 7

    # block "an" has 4 members: a cap of 3 drops it entirely
    assert E.candidate_pairs(blocks, max_block_size=3).count() == 1  # (6,7)
    pairs = {
        (r["id_a"], r["id_b"])
        for r in E.candidate_pairs(blocks, max_block_size=10).collect()
    }
    assert (1, 2) in pairs and (6, 7) in pairs and (1, 5) not in pairs
    assert all(a < b for a, b in pairs)


def test_scoring_gates(spark, people):
    blocks = E.blocking_keys(people, "id", [F.substring("name", 1, 2)])
    cand = E.candidate_pairs(blocks)
    matched = E.score_pairs(
        people, cand, "id", "name", exact_cols=["city"], threshold=0.75
    )
    got = {(r["id_a"], r["id_b"]): r["sim"] for r in matched.collect()}
    # anna~annb: 1 edit / len 4 -> 0.75; annb~annbx: 1 edit / len 5 -> 0.8
    assert got[(1, 2)] == 0.75 and got[(2, 3)] == 0.8
    assert got[(6, 7)] == 1.0
    # annc is 1 edit from annb but lives in sfo: exact gate rejects
    assert (2, 4) not in got and (1, 4) not in got
    # anna~annbx is 2 edits / len 5 -> 0.6 < threshold
    assert (1, 3) not in got


@pytest.mark.parametrize("method", ["label", "star"])
def test_resolve_entities_transitive(spark, people, method):
    blocks = E.blocking_keys(people, "id", [F.substring("name", 1, 2)])
    matched = E.score_pairs(
        people,
        E.candidate_pairs(blocks),
        "id",
        "name",
        exact_cols=["city"],
        threshold=0.75,
    )
    ents = {
        r["id"]: r["entity_id"]
        for r in E.resolve_entities(people, matched, "id", method=method).collect()
    }
    # 1-2 and 2-3 matched -> transitive entity {1,2,3}; 4 never joined it
    assert ents[1] == ents[2] == ents[3] == 1
    assert ents[4] == 4 and ents[5] == 5
    assert ents[6] == ents[7] == 6
    assert len(ents) == 7


def test_multi_strategy_blocking(spark, people):
    """A second, sharper key recovers pairs a first key misses."""
    first = [F.substring("name", 1, 3)]
    both = first + [F.col("city")]
    p1 = {
        (r["id_a"], r["id_b"])
        for r in E.candidate_pairs(
            E.blocking_keys(people, "id", first)
        ).collect()
    }
    p2 = {
        (r["id_a"], r["id_b"])
        for r in E.candidate_pairs(
            E.blocking_keys(people, "id", both)
        ).collect()
    }
    assert p1 <= p2
    assert (1, 5) in p2 and (1, 5) not in p1  # same city, names unrelated
