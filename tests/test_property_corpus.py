"""Property-based tests: corpus-hygiene / packing operators vs pure-
python mirrors over random corpora (small vocabularies force heavy
collisions — duplicate bigrams, shared lines, shard-boundary packing)."""

from __future__ import annotations

from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from qudo_etl_pipeline_spark.operators.curation import line_dedup_stats
from qudo_etl_pipeline_spark.operators.packing import pack_greedy
from qudo_etl_pipeline_spark.operators.text import repetition_stats

VOCAB = ["a", "b", "c"]

docs_strategy = st.lists(
    st.lists(st.sampled_from(VOCAB), min_size=1, max_size=25).map(" ".join),
    min_size=1,
    max_size=10,
)


def _rep_mirror(text: str):
    toks = text.split(" ")
    grams = (
        [" ".join(toks[i : i + 2]) for i in range(len(toks) - 1)]
        if len(toks) >= 2
        else [toks[0]]
    )
    c = Counter(grams)
    n2 = len(grams)
    return (
        len(toks),
        round((len(toks) - len(set(toks))) / len(toks), 6),
        round(max(c.values()) / n2, 6),
        round(sum(v for v in c.values() if v > 1) / n2, 6),
    )


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(docs=docs_strategy)
def test_repetition_stats_matches_mirror(spark, docs):
    df = spark.createDataFrame(
        list(enumerate(docs)), "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (
            r["n_tokens"],
            r["dup_word_frac"],
            r["top_2gram_frac"],
            r["dup_2gram_frac"],
        )
        for r in repetition_stats(df).collect()
    }
    assert got == {i: _rep_mirror(t) for i, t in enumerate(docs)}


def _line_mirror(docs, line_tokens=3):
    seen = {}
    per_doc = {}
    for i, text in enumerate(docs):
        toks = text.split(" ")
        lines = [
            " ".join(toks[p : p + line_tokens])
            for p in range(0, len(toks), line_tokens)
        ]
        dups = 0
        for pos, ln in enumerate(lines):
            if ln in seen:
                dups += 1
            else:
                seen[ln] = (i, pos)
        per_doc[i] = (len(lines), dups)
    return per_doc


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(docs=docs_strategy)
def test_line_dedup_matches_mirror(spark, docs):
    df = spark.createDataFrame(
        list(enumerate(docs)), "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["n_lines"], r["n_dup_lines"])
        for r in line_dedup_stats(df, line_tokens=3).collect()
    }
    # the mirror scans docs in ascending id and positions in order, which
    # IS the operator's (min doc, min pos) first-occurrence rule
    assert got == _line_mirror(docs, line_tokens=3)


def _greedy_mirror(lengths, seq_len, n_shards):
    out = {}
    for shard in range(n_shards):
        cur, fill = 0, 0
        for i, n in lengths:
            if i % n_shards != shard:
                continue
            if fill > 0 and fill + n > seq_len:
                cur += 1
                fill = 0
            fill += n
            out[i] = (shard, cur, fill)
    return out


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    lengths=st.lists(
        st.integers(min_value=1, max_value=9), min_size=1, max_size=24
    ),
    seq_len=st.sampled_from([5, 8, 13]),
)
def test_pack_greedy_matches_mirror(spark, lengths, seq_len):
    rows = [(i, " ".join(["t"] * n)) for i, n in enumerate(lengths)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["shard"], r["seq_idx"], r["seq_fill"])
        for r in pack_greedy(df, seq_len=seq_len, n_shards=2).collect()
    }
    assert got == _greedy_mirror(list(enumerate(lengths)), seq_len, 2)


vec_strategy = st.lists(
    st.lists(
        st.floats(
            min_value=-1e6,
            max_value=1e6,
            allow_nan=False,
            allow_infinity=False,
            width=64,
        ),
        min_size=1,
        max_size=8,
    ),
    min_size=1,
    max_size=6,
)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(vecs=vec_strategy)
def test_embedding_quantize_matches_python_mirror(spark, vecs):
    """int8 quantization vs a pure-python mirror: identical codes
    (Python-round semantics), codes within [-127, 127], and the
    dequantization error within half a step of the true value."""
    from qudo_etl_pipeline_spark.operators.similarity import embedding_quantize

    df = spark.createDataFrame(
        list(enumerate(vecs)), "vec_id long, embedding array<double>"
    )
    out = {r["vec_id"]: r for r in embedding_quantize(df).collect()}
    for vid, v in enumerate(vecs):
        mx = max(abs(x) for x in v)
        expect = [0 if mx == 0 else round(x * 127.0 / mx) for x in v]
        got = out[vid]
        assert got["q"] == expect, (v, got["q"], expect)
        assert all(-127 <= q <= 127 for q in got["q"])
        assert got["scale6"] == round(mx / 127.0, 6)
        scale = mx / 127.0
        for x, q in zip(v, got["q"]):
            assert abs(q * scale - x) <= 0.5 * scale + 1e-9 * max(mx, 1.0)


def test_source_kl_divergence_properties(spark):
    """KL >= 0 (Gibbs), == 0 for a slice distributed like the corpus,
    and > 0 for a genuinely shifted slice."""
    from qudo_etl_pipeline_spark.operators.text import source_kl_divergence
    from pyspark.sql import functions as F

    rows = []
    # two sources with IDENTICAL token distributions -> pooled corpus
    # matches each -> KL == 0 for both
    for src in ("a", "b"):
        rows += [(src, "x x y z")] * 10
    # one shifted source
    rows += [("c", "y y y y z w")] * 10
    docs = spark.createDataFrame(rows, "source string, text string")
    kl = {r["source"]: r["kl"] for r in source_kl_divergence(docs).collect()}
    assert all(v >= 0 for v in kl.values())
    assert kl["c"] > 0.01
    # a and b differ from the POOLED corpus (which includes c), so not
    # exactly 0 — but far less than the shifted slice
    assert kl["a"] == kl["b"] < kl["c"]


def test_inverted_index_and_boolean_query(spark):
    from qudo_etl_pipeline_spark.operators.index import (
        boolean_and_query,
        inverted_index,
    )
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [(1, "a b c"), (2, "b c d"), (3, "c d e"), (4, "x y b c")],
        "doc_id bigint, text string",
    )
    idx = inverted_index(docs)
    m = {r["tok"]: (r["df"], r["postings"]) for r in idx.collect()}
    assert m["c"] == (4, [1, 2, 3, 4])
    assert m["b"] == (3, [1, 2, 4])
    # duplicate tokens in one doc count once (distinct postings)
    docs2 = spark.createDataFrame([(9, "z z z")], "doc_id bigint, text string")
    m2 = {r["tok"]: r["df"] for r in inverted_index(docs2).collect()}
    assert m2["z"] == 1
    # AND query = posting intersection
    got = sorted(r["doc"] for r in boolean_and_query(idx, ["b", "c"]).collect())
    assert got == [1, 2, 4]
    # a term missing from the index -> empty result, not an error
    assert boolean_and_query(idx, ["b", "zzz"]).count() == 0
    # stopword gate drops 'c' (df == n_docs)
    gated = inverted_index(docs, max_df_ratio=0.9)
    assert "c" not in {r["tok"] for r in gated.collect()}
