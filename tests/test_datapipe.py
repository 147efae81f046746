"""Unit tests for dedup / text / similarity / multimodal / streaming ops
against tiny hand-computed fixtures."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from qudo_etl_pipeline_spark.operators import dedup as D
from qudo_etl_pipeline_spark.operators import multimodal as MM
from qudo_etl_pipeline_spark.operators import similarity as SIM
from qudo_etl_pipeline_spark.operators import text as TX


def ref_hash64(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the cat sat on the mat"),
        (1, "the cat sat on the mat"),          # exact dup of 0
        (2, "the dog sat on the mat"),          # near dup
        (3, "completely different text here"),
        (4, "a b"),                              # shorter than a 3-shingle
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup(spark, docs):
    out = {r["text_hash"]: r for r in D.exact_dedup(docs).collect()}
    h = ref_hash64("the cat sat on the mat")
    assert out[h]["n_docs"] == 2
    assert out[h]["keeper_id"] == 0
    assert len(out) == 4


def _shingles_py(text: str, k: int = 3) -> list[str]:
    toks = text.split(" ")
    if len(toks) < k:
        return [" ".join(toks)]  # padded shingle: nulls skipped by concat_ws
    return [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]


def test_minhash_matches_python(spark, docs):
    out = {r["doc_id"]: r for r in D.minhash_signatures(docs, n_hashes=2).collect()}
    for doc_id, text in [
        (0, "the cat sat on the mat"),
        (3, "completely different text here"),
        (4, "a b"),  # shorter than a 3-shingle
    ]:
        for s in range(2):
            a, b = D.minhash_params(s)
            expected = min(
                (a * (ref_hash64(t) % D.MINHASH_RANGE) + b) % D.MINHASH_MOD
                for t in _shingles_py(text)
            )
            assert out[doc_id][f"mh{s}"] == expected
    # exact dups share signatures; near dups share some
    assert out[0]["mh0"] == out[1]["mh0"]


def test_lsh_candidates_contain_exact_dups(spark, docs):
    sigs = D.minhash_signatures(docs, n_hashes=4)
    pairs = {
        (r["id_a"], r["id_b"])
        for r in D.lsh_candidate_pairs(D.lsh_bands(sigs)).collect()
    }
    assert (0, 1) in pairs  # identical docs always collide


def test_lsh_hot_bucket_cap_bounds_candidates(spark):
    # planted mega-bucket: 40 docs all hashing to (band 0, bucket 99)
    # — the boilerplate-header pathology; plus two true near-dup docs
    # that ALSO share a normal bucket in band 1 (banding recall path)
    rows = [(i, 0, 99) for i in range(40)]
    rows += [(0, 1, 7), (1, 1, 7)]  # the pair's other, healthy band
    rows += [(38, 1, 8), (39, 1, 9)]  # singletons elsewhere
    bands = spark.createDataFrame(
        rows, "doc_id long, band long, bucket long"
    )
    capped = {
        (r["id_a"], r["id_b"])
        for r in D.lsh_candidate_pairs(
            bands, max_bucket_size=10
        ).collect()
    }
    # the 40-doc bucket (780 pairs) is evicted wholesale...
    assert capped == {(0, 1)}
    # ...but the true pair survives via its band-1 bucket
    # uncapped mode still produces the full quadratic set
    full = D.lsh_candidate_pairs(bands, max_bucket_size=None)
    assert full.count() == 40 * 39 // 2
    # default cap is invisible for healthy bucket sizes
    dflt = {
        (r["id_a"], r["id_b"])
        for r in D.lsh_candidate_pairs(bands).collect()
    }
    assert dflt == {(r["id_a"], r["id_b"]) for r in full.collect()}


def test_verified_pairs_and_groups(spark, docs):
    sigs = D.minhash_signatures(docs, n_hashes=4)
    cand = D.lsh_candidate_pairs(D.lsh_bands(sigs))
    ver = D.verified_pairs(docs, cand, threshold=0.5)
    pairs = {(r["id_a"], r["id_b"]): r["jaccard"] for r in ver.collect()}
    assert pairs[(0, 1)] == 1.0  # exact dups verify at jaccard 1
    assert all(j >= 0.5 for j in pairs.values())

    # hand-built graph: {1,2,3} chained, {5,6} separate
    g = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6)], "id_a long, id_b long"
    )
    groups = {r["doc_id"]: r["group_id"] for r in D.neardup_groups(g).collect()}
    assert groups == {1: 1, 2: 1, 3: 1, 5: 5, 6: 5}


def test_jaccard(spark, docs):
    t = docs.select("doc_id", F.array_distinct(F.split("text", " ")).alias("t"))
    a = t.filter(F.col("doc_id") == 0).select(F.col("t").alias("ta"))
    b = t.filter(F.col("doc_id") == 2).select(F.col("t").alias("tb"))
    j = a.crossJoin(b).select(
        D.jaccard_tokens(F.col("ta"), F.col("tb")).alias("j")
    ).collect()[0]["j"]
    # tokens: {the,cat,sat,on,mat} vs {the,dog,sat,on,mat}: inter 4, union 6
    assert j == pytest.approx(4 / 6)


def test_simhash_identical_and_bits(spark, docs):
    out = {r["doc_id"]: r["sh"] for r in
           docs.select("doc_id", D.simhash16("text").alias("sh")).collect()}
    assert out[0] == out[1]
    assert 0 <= out[0] < 2**16
    # python mirror for doc 4 ("a b")
    hs = [ref_hash64("0:a"), ref_hash64("0:b")]
    expected = 0
    for i in range(16):
        vote = sum(1 if (h >> i) & 1 else -1 for h in hs)
        if vote > 0:
            expected |= 1 << i
    assert out[4] == expected


def test_doc_fingerprint_short_doc_fallback(spark, docs):
    out = {r["doc_id"]: r["fingerprint"] for r in TX.doc_fingerprint(docs).collect()}
    assert out[4] == ref_hash64("7:a b")  # whole-text fallback
    shingles = ["the cat sat", "cat sat on", "sat on the", "on the mat"]
    assert out[0] == min(ref_hash64(f"7:{s}") for s in shingles)


def test_token_stats(spark, docs):
    out = {r["doc_id"]: r for r in TX.token_stats(docs).collect()}
    assert out[0]["n_tokens"] == 6
    assert out[0]["n_unique_tokens"] == 5
    assert out[0]["type_token_ratio"] == pytest.approx(round(5 / 6, 6))


def test_bpe_token_stats(spark):
    rows = [(0, "hello, world! price 12345"), (1, "   ")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in TX.bpe_token_stats(df).collect()}
    # hello | , | world | ! | price | 123 | 45  -> 7 bpe tokens, 4 ws tokens
    assert out[0]["n_bpe_tokens"] == 7
    assert out[0]["n_ws_tokens"] == 4
    assert out[0]["chars_per_token"] == pytest.approx(round(len(rows[0][1]) / 7, 6))
    # whitespace-only doc: zero tokens -> null ratio, not a crash
    assert out[1]["n_bpe_tokens"] == 0
    assert out[1]["chars_per_token"] is None


def test_neardup_groups_raises_on_nonconvergence(spark):
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 8)], "id_a long, id_b long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        D.neardup_groups(chain, max_iter=2)
    groups = {r["doc_id"]: r["group_id"] for r in D.neardup_groups(chain).collect()}
    assert set(groups.values()) == {1}  # one chain, one group


def test_langid_scores(spark):
    rows = [
        (0, "the cat and the dog in a house", "en"),
        (1, "el gato y la casa en que es", "es"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = {r["doc_id"]: r for r in TX.langid_heuristic(df).collect()}
    assert out[0]["pred_lang"] == "en" and out[0]["is_match"] == 1
    assert out[1]["pred_lang"] == "es" and out[1]["is_match"] == 1


def test_ivf_assign_and_probe(spark):
    # two orthogonal centroids; vectors cluster cleanly around them
    cents = [[1.0, 0.0], [0.0, 1.0]]
    rows = [
        (0, [1.0, 0.1]),   # cell 0
        (1, [0.9, 0.2]),   # cell 0
        (2, [0.1, 1.0]),   # cell 1
        (3, [0.2, 0.9]),   # cell 1
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cells = {r["vec_id"]: r["cell"] for r in SIM.ivf_assign(df, cents).collect()}
    assert cells == {0: 0, 1: 0, 2: 1, 3: 1}

    # nprobe=1: query 0 only sees its own cell -> neighbor 1 alone
    out1 = SIM.ivf_topk(df, df.filter(F.col("vec_id") == 0), cents, nprobe=1, k=3).collect()
    assert [r["neighbor_id"] for r in out1] == [1]
    # nprobe=2 probes both cells -> same result set as brute force
    out2 = SIM.ivf_topk(df, df.filter(F.col("vec_id") == 0), cents, nprobe=2, k=3).collect()
    brute = SIM.brute_force_topk(df, df.filter(F.col("vec_id") == 0), k=3).collect()
    assert {(r["neighbor_id"], r["rank"]) for r in out2} == {
        (r["neighbor_id"], r["rank"]) for r in brute
    }


def test_brute_force_topk_orders_by_cosine(spark):
    rows = [
        (0, [1.0, 0.0]),
        (1, [1.0, 0.1]),   # closest to 0
        (2, [0.5, 0.5]),
        (3, [-1.0, 0.0]),  # opposite
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = SIM.brute_force_topk(df, df.filter(F.col("vec_id") == 0), k=3).collect()
    order = [r["neighbor_id"] for r in sorted(out, key=lambda r: r["rank"])]
    assert order == [1, 2, 3]
    assert out[0]["cosine"] <= 1.0


def test_lsh_topk_subset_of_bruteforce(spark):
    import numpy as np

    rng = np.random.default_rng(7)
    rows = [(i, rng.normal(size=16).astype(float).tolist()) for i in range(60)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    ann = SIM.lsh_topk(df, k=3, n_planes=4, dim=16).collect()
    assert len(ann) > 0
    # every ANN neighbor must share the query's bucket
    buckets = {
        r["vec_id"]: r["bucket"]
        for r in SIM.hyperplane_lsh_buckets(df, n_planes=4, dim=16).collect()
    }
    for r in ann:
        assert buckets[r["query_id"]] == buckets[r["neighbor_id"]]


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        Row(media_id=1, kind="image", payload=bytes(range(100)),
            meta=Row(format="png", width=10, height=10, sample_rate=None,
                     duration_ms=None)),
        Row(media_id=2, kind="video", payload=b"\x01\x02" * 500,
            meta=Row(format="mp4", width=64, height=48, sample_rate=None,
                     duration_ms=3500)),
        Row(media_id=3, kind="audio", payload=None,
            meta=Row(format="wav", width=None, height=None, sample_rate=16000,
                     duration_ms=2000)),
    ]
    return spark.createDataFrame(rows, MM.MEDIA_SCHEMA)


def test_multimodal_features(spark, media):
    out = {r["media_id"]: r for r in MM.extract_features(media).collect()}
    assert out[1]["n_bytes"] == 100
    assert len(out[1]["features"]) == MM.N_FEATURES
    assert out[1]["features"][0] == pytest.approx(49.5)  # mean of 0..99
    assert out[3]["n_bytes"] == 0
    assert all(f == 0.0 for f in out[3]["features"])
    # deterministic: second run identical
    again = {r["media_id"]: r for r in MM.extract_features(media).collect()}
    assert again[2]["features"] == out[2]["features"]


def test_multimodal_real_decoder_stubbed(spark, media):
    with pytest.raises(NotImplementedError):
        MM.extract_features(media, decoder="real")


def test_frame_sample_plan(spark, media):
    frames = MM.frame_sample_plan(media, every_ms=1000).collect()
    # 3500ms video at 1 fps -> frames 0,1,2 (n = floor(3.5) - 1 + 1)
    idxs = sorted(r["frame_idx"] for r in frames)
    assert idxs == [0, 1, 2]
    assert all(r["media_id"] == 2 for r in frames)
    assert {r["frame_ts_ms"] for r in frames} == {0, 1000, 2000}


def test_resize_meta(spark, media):
    out = MM.resize_meta(media, 32, 32).filter(F.col("media_id") == 1).collect()[0]
    assert out["meta"]["width"] == 32 and out["meta"]["height"] == 32
    assert out["meta"]["format"] == "png"


def test_dedup_stream_across_microbatches(spark, tmp_path):
    """Streaming exact dedup keeps the FIRST occurrence of a content hash
    even when the duplicate arrives in a later micro-batch (stateful
    dropDuplicates)."""
    import time

    from qudo_etl_pipeline_spark.streaming.sessions import dedup_stream

    d = str(tmp_path / "docs_in")
    spark.createDataFrame(
        [(0, "alpha beta"), (1, "gamma delta")], "doc_id long, text string"
    ).coalesce(1).write.parquet(d + "/b1")
    time.sleep(1.1)  # distinct mtimes -> file source orders b1 before b2
    spark.createDataFrame(
        [(2, "alpha beta"), (3, "epsilon zeta")], "doc_id long, text string"
    ).coalesce(1).write.parquet(d + "/b2")

    schema = spark.read.parquet(d + "/b1").schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(d)
    )
    q = (
        dedup_stream(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("dedup_stream_t")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = sorted(
        (r["doc_id"], r["text"]) for r in spark.table("dedup_stream_t").collect()
    )
    assert len(q.recentProgress) >= 2  # genuinely cross-batch
    assert rows == [(0, "alpha beta"), (1, "gamma delta"), (3, "epsilon zeta")]


def test_stateful_running_counts_stream(spark, tmp_path):
    import pandas as pd

    src = str(tmp_path / "events_in")
    import os

    os.makedirs(src, exist_ok=True)
    pd.DataFrame(
        {"user_id": [1, 1, 2, 2, 2], "value": [1.0] * 5}
    ).to_parquet(src + "/part0.parquet")

    from qudo_etl_pipeline_spark.streaming.sessions import (
        running_user_counts_stream,
    )

    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).parquet(src)
    out = running_user_counts_stream(stream)
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName("running_counts")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    res = {
        r["user_id"]: r["total_events"]
        for r in spark.sql("SELECT * FROM running_counts").collect()
    }
    assert res == {1: 2, 2: 3}


def test_star_cc_matches_label_propagation(spark):
    """Alternating large-star/small-star contraction must produce the
    SAME components as min-label propagation — on random graphs and on
    the pathological long chain where it converges in O(log n) rounds
    (label propagation needs O(diameter))."""
    import random

    rng = random.Random(13)
    edges = {(rng.randrange(0, 60), rng.randrange(0, 60)) for _ in range(80)}
    edges = [(a, b) for a, b in edges if a != b]
    g = spark.createDataFrame(edges, "id_a long, id_b long")
    by_label = {r["doc_id"]: r["group_id"]
                for r in D.neardup_groups(g, method="label").collect()}
    by_star = {r["doc_id"]: r["group_id"]
               for r in D.neardup_groups(g, method="star").collect()}
    assert by_star == by_label

    # 60-node chain: diameter 59. Star contraction must finish within
    # 10 rounds; label propagation with the same budget cannot.
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 60)], "id_a long, id_b long"
    )
    star = {r["doc_id"]: r["group_id"]
            for r in D.neardup_groups(chain, method="star", max_iter=10).collect()}
    assert set(star.values()) == {1} and len(star) == 60
    with pytest.raises(RuntimeError, match="did not converge"):
        D.neardup_groups(chain, method="label", max_iter=10)


def test_curate_corpus_hand_planted(spark):
    """Each curation stage fires on a planted doc: low-quality (short),
    wrong-language, exact duplicate, near duplicate — and the survivor
    keeps 'kept'. Stage ORDER matters: the exact dup of a rejected doc
    is judged by its own gate, not dedup."""
    from qudo_etl_pipeline_spark.operators.curation import curate_corpus

    # >= 50 tokens so the length factor of the quality score saturates
    base = ("the quick brown fox jumps over the lazy dog and then "
            "the dog chases the fox around the big green field while "
            "the farmer watches from the gate and the birds fly over "
            "the barn to the river where the cattle drink in the shade "
            "of the old oak tree near the fence")
    good = base + " again"
    near = base + " today"
    spanish = ("el perro corre por la casa grande y el gato duerme en la "
               "cama de la madre mientras los ninos juegan en el patio "
               "con la pelota roja y el abuelo lee su libro favorito "
               "cerca de la ventana abierta donde entra el aire fresco "
               "de la manana clara junto al jardin verde y tranquilo")
    docs = spark.createDataFrame(
        [
            (1, good),         # kept (survivor, min id)
            (2, good),         # exact_dup of 1
            (3, near),         # near_dup of 1 (high jaccard)
            (4, "too short"),  # low_quality (< 5 tokens)
            (5, spanish),      # language (passes quality, fails langid)
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["drop_reason"] for r in curate_corpus(docs).collect()}
    assert out == {
        1: "kept",
        2: "exact_dup",
        3: "near_dup",
        4: "low_quality",
        5: "language",
    }


def test_decontaminate_flags_ngram_collisions(spark):
    from qudo_etl_pipeline_spark.operators.curation import decontaminate

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "completely different words appear here in this text"),
            (3, "we saw the quick brown fox jumps again today"),
        ],
        "doc_id: long, text: string",
    )
    bench = spark.createDataFrame(
        [(100, "a tale where the quick brown fox jumps at dawn")],
        "doc_id: long, text: string",
    )
    hit = {r["doc_id"]: r["n_hits"] for r in decontaminate(docs, bench).collect()}
    # docs 1 and 3 share the 5-gram "the quick brown fox jumps"
    assert 1 in hit and 3 in hit and 2 not in hit
    assert all(n >= 1 for n in hit.values())


def test_token_budget_sample_greedy_prefix(spark):
    from qudo_etl_pipeline_spark.operators.curation import (
        token_budget_sample,
    )

    # quality ascends with length here (score = min(1, n/50) factor),
    # so selection order is by score desc then id asc
    docs = spark.createDataFrame(
        [
            (1, " ".join(["the"] * 40)),   # 40 tokens, high stopword ratio
            (2, " ".join(["the"] * 30)),
            (3, " ".join(["the"] * 20)),
            (4, "tiny"),                   # < 5 tokens -> score 0
        ],
        "doc_id: long, text: string",
    )
    out = token_budget_sample(docs, budget_tokens=60).orderBy("cum_tokens")
    rows = out.collect()
    ids = [r["doc_id"] for r in rows]
    # 40 + 30 crosses the 60-token line AT doc 2 -> doc 2 still kept,
    # doc 3 (cum 90 before it = 70 >= 60) dropped
    assert ids == [1, 2]
    assert rows[-1]["cum_tokens"] == 70


def test_source_mixture_weights_math(spark):
    from qudo_etl_pipeline_spark.operators.curation import (
        source_mixture_weights,
    )

    docs = spark.createDataFrame(
        [
            (1, "a b c d e f g h i j", "web"),     # 10 tokens
            (2, "a b c d e f g h i j", "web"),     # 10 tokens
            (3, "a b c d e", "books"),             # 5 tokens
        ],
        "doc_id: long, text: string, source: string",
    )
    rows = {
        r["source"]: r for r in source_mixture_weights(docs, alpha=0.3).collect()
    }
    assert rows["web"]["n_tokens"] == 20 and rows["books"]["n_tokens"] == 5
    assert rows["web"]["token_share"] == 0.8
    # alpha < 1 upsamples the small domain: books weight > its share
    assert rows["books"]["mixture_weight"] > 0.2
    total = rows["web"]["mixture_weight"] + rows["books"]["mixture_weight"]
    assert abs(total - 1.0) < 1e-6


def test_repetition_stats_hand_computed(spark):
    rows = [
        (0, "a b a b a"),       # tokens: 5, uniq 2; bigrams: ab ba ab ba -> top 2/4, all dup 4/4
        (1, "x y z w"),          # no repetition: bigrams xy yz zw all unique
        (2, "q"),                # 1-token degenerate: single 'q' "bigram"
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in TX.repetition_stats(df).collect()}
    assert out[0]["n_tokens"] == 5
    assert out[0]["dup_word_frac"] == pytest.approx(3 / 5)
    assert out[0]["top_2gram_frac"] == pytest.approx(0.5)
    assert out[0]["dup_2gram_frac"] == pytest.approx(1.0)
    assert out[1]["dup_word_frac"] == 0.0
    assert out[1]["top_2gram_frac"] == pytest.approx(1 / 3)
    assert out[1]["dup_2gram_frac"] == 0.0
    assert out[2]["n_tokens"] == 1
    assert out[2]["top_2gram_frac"] == 1.0


def test_pii_redact_counts_and_hash(spark):
    rows = [
        (0, "mail me at a.b-c@site.org or x@y.io now"),
        (1, "call 555-123-4567 and 555-000-1111"),
        (2, "clean text no pii"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in TX.pii_redact(df).collect()}
    assert out[0]["n_emails"] == 2 and out[0]["n_phones"] == 0
    assert out[1]["n_emails"] == 0 and out[1]["n_phones"] == 2
    assert out[2]["n_emails"] == 0 and out[2]["n_phones"] == 0
    red0 = "mail me at [EMAIL] or [EMAIL] now"
    assert out[0]["redacted_hash"] == ref_hash64("13:" + red0)
    assert out[2]["redacted_hash"] == ref_hash64("13:clean text no pii")


def test_line_dedup_first_occurrence_wins(spark):
    from qudo_etl_pipeline_spark.operators.curation import line_dedup_stats

    seg = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"
    rows = [
        (0, seg + " unique tail of doc zero x y"),   # line0=seg, line1=tail
        (1, seg),                                     # line0 dups doc0's line0
        (2, "totally different ten token line goes right here now ok"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in line_dedup_stats(df).collect()}
    assert out[0]["n_lines"] == 2 and out[0]["n_dup_lines"] == 0
    assert out[1]["n_lines"] == 1 and out[1]["n_dup_lines"] == 1
    assert out[1]["kept_line_frac"] == 0.0
    assert out[2]["n_dup_lines"] == 0


def test_pack_boundary_math(spark):
    from qudo_etl_pipeline_spark.operators.packing import pack_boundary

    # one shard (n_shards=1): docs of 300/300/600 tokens at seq_len 512
    rows = [(i, " ".join(["t"] * n)) for i, n in [(0, 300), (1, 300), (2, 600)]]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in
           pack_boundary(df, seq_len=512, n_shards=1).collect()}
    assert (out[0]["seq_idx"], out[0]["offset_in_seq"], out[0]["spans_boundary"]) == (0, 0, 0)
    # doc1 starts at 300, crosses the 512 cut
    assert (out[1]["seq_idx"], out[1]["offset_in_seq"], out[1]["spans_boundary"]) == (0, 300, 1)
    # doc2 starts at 600 -> seq 1 offset 88, crosses into seq 2
    assert (out[2]["seq_idx"], out[2]["offset_in_seq"], out[2]["spans_boundary"]) == (1, 88, 1)


def test_pack_greedy_never_straddles(spark):
    from qudo_etl_pipeline_spark.operators.packing import (
        pack_greedy,
        packing_efficiency,
    )

    # 300+300 > 512 -> doc1 opens seq 1; 700-token doc gets its own overfull seq
    rows = [(i, " ".join(["t"] * n))
            for i, n in [(0, 300), (1, 300), (2, 100), (3, 700), (4, 10)]]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in
           pack_greedy(df, seq_len=512, n_shards=1).collect()}
    assert [out[i]["seq_idx"] for i in range(5)] == [0, 1, 1, 2, 3]
    assert out[3]["seq_fill"] == 700
    eff = packing_efficiency(
        pack_greedy(df, seq_len=512, n_shards=1), seq_len=512
    ).collect()[0]
    assert eff["n_seqs"] == 4 and eff["n_tokens"] == 1410
    assert eff["fill_ratio"] == pytest.approx(1410 / (4 * 512), abs=1e-6)


def test_stratified_sample_deterministic_and_rated(spark):
    from qudo_etl_pipeline_spark.operators.curation import stratified_sample

    rows = [(i, "t", "en" if i % 2 == 0 else "de") for i in range(400)]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    kept1 = sorted(r["doc_id"] for r in
                   stratified_sample(df, rates={"en": 1.0}, default_rate=0.0)
                   .collect())
    kept2 = sorted(r["doc_id"] for r in
                   stratified_sample(df, rates={"en": 1.0}, default_rate=0.0)
                   .collect())
    assert kept1 == kept2                       # deterministic across runs
    assert kept1 == list(range(0, 400, 2))      # rate 1.0 keeps all en, 0.0 drops de
    half = stratified_sample(df, rates={"en": 0.5}, default_rate=0.0).count()
    assert 60 <= half <= 140                    # ~100 of 200 en docs


def test_corpus_top_ngrams_hand_computed(spark):
    rows = [
        (0, "the quick brown fox jumps"),
        (1, "the quick brown dog sits"),
        (2, "the quick brown fox runs"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = TX.corpus_top_ngrams(df, n=3, k=2).collect()
    assert out[0]["ngram"] == "the quick brown"
    assert out[0]["n_docs"] == 3 and out[0]["n_occurrences"] == 3
    assert out[1]["ngram"] == "quick brown fox" and out[1]["n_docs"] == 2


def test_tfidf_top_terms_math(spark):
    import math

    rows = [
        (0, "apple apple banana"),
        (1, "banana cherry"),
        (2, "cherry cherry cherry date"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {(r["doc_id"], r["term"]): r for r in
           TX.tfidf_top_terms(df, k=3).collect()}
    # doc0: apple tf=2 df=1 -> 2*(ln(4/2)+1); banana tf=1 df=2 -> ln(4/3)+1
    s_apple = 2 * (math.log(4 / 2) + 1)
    assert out[(0, "apple")]["score6"] == pytest.approx(round(s_apple, 6))
    assert out[(0, "apple")]["rank"] == 1
    assert out[(0, "banana")]["rank"] == 2
    # doc2 top term is cherry (tf=3)
    assert out[(2, "cherry")]["rank"] == 1 and out[(2, "cherry")]["tf"] == 3


def test_embedding_quantize_roundtrip(spark):
    rows = [
        (0, [1.0, -2.0, 0.5, 4.0]),     # mx=4 -> scale=4/127; 4 -> 127
        (1, [0.0, 0.0]),                # zero vector -> all-zero, scale 0
        (2, [-3.0]),                    # single component -> -127
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {r["vec_id"]: r for r in SIM.embedding_quantize(df).collect()}
    assert out[0]["q"] == [round(x * 127 / 4.0) for x in [1.0, -2.0, 0.5, 4.0]]
    assert out[0]["scale6"] == pytest.approx(round(4.0 / 127, 6))
    assert out[1]["q"] == [0, 0] and out[1]["scale6"] == 0.0
    assert out[2]["q"] == [-127]
    # dequantized values stay within half a quantization step
    for x, q in zip([1.0, -2.0, 0.5, 4.0], out[0]["q"]):
        assert abs(q * (4.0 / 127) - x) <= 0.5 * 4.0 / 127 + 1e-9


def test_semantic_dedup_verdicts(spark):
    cents = [[1.0, 0.0], [0.0, 1.0]]
    rows = [
        (0, [1.0, 0.01]),    # cell 0 keeper
        (1, [0.9, 0.05]),    # cell 0, cos(0,1) ~ 1 -> dup_of 0
        (2, [0.0, 1.0]),     # cell 1 keeper
        (3, [-1.0, 0.0]),    # cell 1 (cos -1 vs cell0, 0 vs cell1); far from 2
        (4, [0.95, 0.02]),   # cell 0, dup of BOTH 0 and 1 -> dup_of = min = 0
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {r["vec_id"]: r for r in SIM.semantic_dedup(df, cents, 0.9).collect()}
    assert [out[i]["cell"] for i in range(5)] == [0, 0, 1, 1, 0]
    assert out[0]["keep"] == 1 and out[0]["dup_of"] is None
    assert out[1]["keep"] == 0 and out[1]["dup_of"] == 0
    assert out[2]["keep"] == 1
    assert out[3]["keep"] == 1  # same cell as 2 but cosine 0 < 0.9
    assert out[4]["keep"] == 0 and out[4]["dup_of"] == 0


def test_quantized_topk_full_rerank_equals_bruteforce(spark):
    import random

    rng = random.Random(7)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(40)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = df.filter(F.col("vec_id") < 3)
    exact = SIM.brute_force_topk(df, q, k=5).collect()
    two_stage = SIM.quantized_topk(df, q, k=5, rerank=39).collect()
    key = lambda r: (r["query_id"], r["rank"])
    assert sorted(
        [(r["query_id"], r["rank"], r["neighbor_id"], r["cosine"]) for r in exact]
    ) == sorted(
        [
            (r["query_id"], r["rank"], r["neighbor_id"], r["cosine"])
            for r in two_stage
        ]
    )


def test_unigram_logprob_math(spark):
    import math

    rows = [(0, "a a b"), (1, "b c")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in TX.unigram_logprob(df).collect()}
    # counts: a=2 b=2 c=1, T=5, V=3 -> p(a)=p(b)=3/8, p(c)=2/8
    lp_ab = round(math.log(3 / 8), 9)
    lp_c = round(math.log(2 / 8), 9)
    assert out[0]["n_tokens"] == 3
    assert out[0]["mean_logprob"] == pytest.approx(round(lp_ab, 6))
    assert out[0]["ppl"] == pytest.approx(round(math.exp(-lp_ab), 6))
    assert out[1]["n_tokens"] == 2
    assert out[1]["mean_logprob"] == pytest.approx(
        round((lp_ab + lp_c) / 2, 6)
    )


def test_attribution_join_batch_semantics(spark):
    """Interval-join semantics on a hand-built fixture: touches strictly
    inside (ts-horizon, ts] attribute; later or too-old touches don't."""
    from datetime import datetime

    from qudo_etl_pipeline_spark.streaming.sessions import attribution_join

    t0 = datetime(2024, 1, 1, 12, 0, 0)

    def ev(eid, user, mins, etype, value=0.0):
        return (eid, datetime(2024, 1, 1, 12, mins, 0), user, etype, value)

    rows = [
        ev(0, 1, 0, "click"),        # 10 min before purchase -> attributed
        ev(1, 1, 5, "click"),        # 5 min before -> attributed
        ev(2, 1, 10, "purchase", 9.5),
        ev(3, 1, 11, "click"),       # AFTER the purchase -> no
        ev(4, 2, 10, "click"),       # other user -> no
        ev(5, 3, 0, "click"),        # 25 min before user-3 purchase -> too old
        ev(6, 3, 25, "purchase", 1.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    out = attribution_join(
        df.filter("event_type = 'purchase'"),
        df.filter("event_type = 'click'"),
        horizon="10 minutes",
    ).collect()
    pairs = sorted((r["trigger_id"], r["touch_id"], r["gap_us"]) for r in out)
    assert pairs == [(2, 0, 600_000_000), (2, 1, 300_000_000)]
    assert all(r["value"] == 9.5 for r in out)


def test_dedup_stream_parquet_sink_restart_exactly_once(spark, tmp_path):
    """Durable streaming sink: dedup_stream -> parquet files with a
    checkpoint. After the first drain, RESTART the query over a source
    that grew by one new + one duplicate doc: the checkpoint must skip
    the already-committed batch and the dedup state must drop the
    cross-restart duplicate, so the sink holds each unique text once."""
    import time

    from qudo_etl_pipeline_spark.streaming.sessions import dedup_stream

    src = str(tmp_path / "src")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    spark.createDataFrame(
        [(0, "alpha beta"), (1, "gamma delta")], "doc_id long, text string"
    ).coalesce(1).write.parquet(src + "/b1")
    schema = spark.read.parquet(src + "/b1").schema

    def drain():
        q = (
            dedup_stream(
                spark.readStream.schema(schema)
                .option("recursiveFileLookup", "true")
                .parquet(src)
            )
            .writeStream.outputMode("append")
            .format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    drain()
    assert spark.read.parquet(sink).count() == 2

    time.sleep(1.1)
    spark.createDataFrame(
        [(2, "alpha beta"), (3, "epsilon zeta")], "doc_id long, text string"
    ).coalesce(1).write.parquet(src + "/b2")
    drain()  # restarted query: same checkpoint, grown source

    rows = sorted(
        (r["doc_id"], r["text"]) for r in spark.read.parquet(sink).collect()
    )
    assert rows == [(0, "alpha beta"), (1, "gamma delta"), (3, "epsilon zeta")]


def test_shuffle_shard_is_seeded_permutation(spark):
    from qudo_etl_pipeline_spark.operators.packing import shuffle_shard

    df = spark.createDataFrame(
        [(i, "x") for i in range(40)], "doc_id long, text string"
    )
    a = shuffle_shard(df, n_shards=4, seed=42).collect()
    # every doc exactly once; per-shard positions are dense 0..n-1
    assert sorted(r["doc_id"] for r in a) == list(range(40))
    by_shard: dict = {}
    for r in a:
        by_shard.setdefault(r["shard"], []).append(r["pos"])
    assert set(by_shard) <= {0, 1, 2, 3}
    for poss in by_shard.values():
        assert sorted(poss) == list(range(len(poss)))
    # deterministic across calls; a different seed permutes differently
    b = shuffle_shard(df, n_shards=4, seed=42).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    c = {r["doc_id"]: (r["shard"], r["pos"]) for r in
         shuffle_shard(df, n_shards=4, seed=7).collect()}
    a_map = {r["doc_id"]: (r["shard"], r["pos"]) for r in a}
    assert any(a_map[i] != c[i] for i in range(40))
    # the order is NOT ascending id within a shard (it's actually shuffled)
    ids_in_order = [
        r["doc_id"]
        for r in sorted(a, key=lambda r: (r["shard"], r["pos"]))
        if r["shard"] == 0
    ]
    assert ids_in_order != sorted(ids_in_order)


def test_span_dedup_planted_coverage(spark):
    from qudo_etl_pipeline_spark.operators.spans import span_dedup_stats

    # doc 0 and 1 share an exact 6-token span; doc 2 repeats its own
    # 5-token span twice; doc 3 is all-unique; doc 4 is shorter than k.
    shared = "alpha beta gamma delta epsilon zeta"
    docs = spark.createDataFrame(
        [
            (0, f"{shared} one two three"),
            (1, f"pre1 pre2 {shared} post1"),
            (2, "r1 r2 r3 r4 r5 mid r1 r2 r3 r4 r5"),
            (3, "u1 u2 u3 u4 u5 u6 u7 u8"),
            (4, "tiny doc"),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r for r in span_dedup_stats(docs, k=5).collect()
    }
    # shared 6-token span -> both 5-gram windows dup -> 6 covered tokens
    assert out[0]["dup_tokens"] == 6 and out[0]["n_tokens"] == 9
    assert out[1]["dup_tokens"] == 6 and out[1]["n_tokens"] == 9
    # self-repeat: both copies covered (within-doc repeats count)
    assert out[2]["dup_tokens"] == 10 and out[2]["n_tokens"] == 11
    assert out[3]["dup_tokens"] == 0
    assert out[4]["dup_tokens"] == 0 and out[4]["n_tokens"] == 2
    assert out[2]["dup_fraction"] == round(10 / 11, 6)


def test_span_dedup_merges_overlapping_islands(spark):
    from qudo_etl_pipeline_spark.operators.spans import span_dedup_stats

    # one 8-token duplicated run -> 4 overlapping 5-gram windows that
    # must merge to 8 covered tokens, not 4*5
    run = "a b c d e f g h"
    docs = spark.createDataFrame(
        [(0, f"{run} x1 x2"), (1, f"y1 {run} y2")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in span_dedup_stats(docs, k=5).collect()}
    assert out[0]["dup_tokens"] == 8
    assert out[1]["dup_tokens"] == 8


def test_dsir_ranks_targetlike_docs_first(spark):
    from pyspark.sql import functions as F

    from qudo_etl_pipeline_spark.operators.importance import (
        dsir_select,
        dsir_weights,
    )

    # target domain speaks vocab-A; raw also contains vocab-B docs.
    # A held-out vocab-A doc must outweigh every vocab-B doc.
    a = "apple berry cherry date elder fig grape"
    b = "zeta yotta xray warp vector ultra torque"
    rows = [(i, a, True) for i in range(5)]        # target docs
    rows += [(10, a, False)]                       # target-like, unlabeled
    rows += [(20 + i, b, False) for i in range(5)]  # off-domain
    docs = spark.createDataFrame(rows, "doc_id long, text string, tgt boolean")
    wts = dsir_weights(docs, target=F.col("tgt"), n_buckets=1000)
    ranked = dsir_select(wts, k=11).collect()
    by_id = {r["doc_id"]: r for r in ranked}
    # absolute sign is smoothing-dominated on an 11-doc fixture (the +1
    # Laplace mass over 1000 buckets outweighs counts of 5-6); the
    # ORDERING is the method's contract: target-like >> off-domain
    assert by_id[10]["dsir_logratio"] == by_id[0]["dsir_logratio"]
    for i in range(5):
        assert by_id[10]["dsir_logratio"] > by_id[20 + i]["dsir_logratio"]
    # ranks are dense 1..11 and ordered by weight desc
    assert sorted(r["sel_rank"] for r in ranked) == list(range(1, 12))


def test_pagerank_hub_dominates_and_cycle_is_uniform(spark):
    from qudo_etl_pipeline_spark.operators.graph import (
        FP_SCALE,
        pagerank_fixed_point,
    )

    # star: 1,2,3 all link to 0 -> 0 must outrank the leaves
    star = spark.createDataFrame(
        [(1, 0), (2, 0), (3, 0)], "src long, dst long"
    )
    pr = {r["node"]: r["rank_fp"] for r in pagerank_fixed_point(star).collect()}
    assert pr[0] > pr[1] == pr[2] == pr[3]

    # 4-cycle: perfect symmetry -> all ranks equal, = 1/N (fixed point
    # of the uniform start, up to integer truncation)
    cyc = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (3, 0)], "src long, dst long"
    )
    prc = {r["node"]: r["rank_fp"] for r in pagerank_fixed_point(cyc).collect()}
    assert len(set(prc.values())) == 1
    assert abs(next(iter(prc.values())) - FP_SCALE // 4) <= 10

    # duplicate and self-loop edges are ignored
    noisy = spark.createDataFrame(
        [(1, 0), (1, 0), (2, 0), (3, 0), (0, 0)], "src long, dst long"
    )
    prn = {r["node"]: r["rank_fp"] for r in pagerank_fixed_point(noisy).collect()}
    assert prn == pr


def test_bm25_semantics(spark):
    from qudo_etl_pipeline_spark.operators.index import bm25_topk

    docs = spark.createDataFrame(
        [
            (0, "rare common filler filler"),        # rare term once, short
            (1, "rare rare common filler filler filler filler filler"),
            (2, "common filler filler filler"),      # no rare term
            (3, "filler stuff other words"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc"]: r for r in bm25_topk(docs, ["rare", "common"], k=4).collect()}
    # doc 3 matches nothing -> absent
    assert 3 not in out
    # both rare-term docs outrank the common-only doc
    assert out[0]["bm25"] > out[2]["bm25"]
    assert out[1]["bm25"] > out[2]["bm25"]
    # hand-computed (k1=1.2, b=0.75, avgdl=5): doc0 = 1.1435 beats
    # doc1 = 1.1014 — its rare tf=2 gain is outweighed by length
    # normalization on the common term (dl=8 vs 4)
    assert out[0]["rank"] == 1 and out[1]["rank"] == 2
    assert out[0]["bm25"] == pytest.approx(1.1435, abs=1e-3)
    assert out[1]["bm25"] == pytest.approx(1.1014, abs=1e-3)
    # ranks are dense from 1
    assert sorted(r["rank"] for r in out.values()) == [1, 2, 3]


def _raw_png(width, height, colortype, scanlines: bytes) -> bytes:
    """Hand-assemble a PNG from already-filtered scanline bytes — spec
    framing only, fully independent of png_encode."""
    import struct
    import zlib

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, colortype, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(scanlines))
        + chunk(b"IEND", b"")
    )


def test_png_decoder_against_spec_filters():
    import numpy as np
    import pytest as _pytest

    from qudo_etl_pipeline_spark.operators.media_codecs import png_decode

    # Sub (filter 1), 3x1 grey: deltas 10,10,10 -> pixels 10,20,30
    px = png_decode(_raw_png(3, 1, 0, b"\x01\x0a\x0a\x0a"))
    assert px[:, :, 0].tolist() == [[10, 20, 30]]
    # Up (filter 2): row0 plain [5,7]; row1 deltas [1,2] -> [6,9]
    px = png_decode(_raw_png(2, 2, 0, b"\x00\x05\x07\x02\x01\x02"))
    assert px[:, :, 0].tolist() == [[5, 7], [6, 9]]
    # Average (filter 3): row0 [10,20]; row1 raw [2,3]
    #   x0: 2+(0+10)//2=7; x1: 3+(7+20)//2=16
    px = png_decode(_raw_png(2, 2, 0, b"\x00\x0a\x14\x03\x02\x03"))
    assert px[:, :, 0].tolist() == [[10, 20], [7, 16]]
    # Paeth (filter 4): row0 [10,20]; row1 raw [3,4]
    #   x0: pred=up=10 -> 13; x1: p=13+20-10=23 -> pred=up=20 -> 24
    px = png_decode(_raw_png(2, 2, 0, b"\x00\x0a\x14\x04\x03\x04"))
    assert px[:, :, 0].tolist() == [[10, 20], [13, 24]]
    # error paths
    with _pytest.raises(ValueError):
        png_decode(b"not a png at all")
    import struct as _s
    import zlib as _z

    bad_depth = _raw_png(1, 1, 0, b"\x00\x01").replace(
        _s.pack(">IIBBBBB", 1, 1, 8, 0, 0, 0, 0),
        _s.pack(">IIBBBBB", 1, 1, 16, 0, 0, 0, 0),
    )
    # fix the IHDR crc after tampering
    ihdr = _s.pack(">IIBBBBB", 1, 1, 16, 0, 0, 0, 0)
    bad = (
        b"\x89PNG\r\n\x1a\n"
        + _s.pack(">I", len(ihdr)) + b"IHDR" + ihdr
        + _s.pack(">I", _z.crc32(b"IHDR" + ihdr) & 0xFFFFFFFF)
    )
    with _pytest.raises(NotImplementedError):
        png_decode(bad)


def test_png_roundtrip_every_filter_and_channel():
    import numpy as np

    from qudo_etl_pipeline_spark.operators.media_codecs import png_decode, png_encode

    rng = np.random.default_rng(7)
    for ch in (1, 3, 4):
        for f in range(5):
            a = rng.integers(0, 256, size=(6, 5, ch), dtype=np.uint8)
            assert np.array_equal(png_decode(png_encode(a, filter_type=f)), a)


def test_png_extract_features_spark(spark):
    from qudo_etl_pipeline_spark.operators.multimodal import (
        extract_features,
        synthetic_png_media,
    )

    ids = spark.range(12).selectExpr("id AS media_id")
    out = {
        r["media_id"]: r["features"]
        for r in extract_features(
            synthetic_png_media(ids), decoder="png"
        ).collect()
    }
    # image 3: 7x4 RGB, pixel = (21 + 3x + 5y + 11c) % 256
    w, h = 4 + 3 % 5, 4 + 3 % 7
    total = sum(
        (3 * 7 + 3 * x + 5 * y + 11 * c) % 256
        for x in range(w) for y in range(h) for c in range(3)
    )
    f = out[3]
    assert (f[0], f[1], f[2]) == (w, h, 3)
    assert f[3] == total


def test_wav_roundtrip_and_error_paths():
    import numpy as np
    import pytest as _pytest

    from qudo_etl_pipeline_spark.operators.media_codecs import (
        wav_decode,
        wav_encode,
    )

    rng = np.random.default_rng(3)
    for ch in (1, 2):
        a = rng.integers(-32768, 32768, size=(120, ch), dtype=np.int16)
        rate, b = wav_decode(wav_encode(a, 22050))
        assert rate == 22050 and np.array_equal(a, b)
    with _pytest.raises(ValueError):
        wav_decode(b"RIFFxxxxNOPE")
    # hand-built 8-bit WAV (unsupported profile) raises NotImplementedError
    import struct as _s

    fmt = _s.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8)
    body = (b"WAVE" + b"fmt " + _s.pack("<I", len(fmt)) + fmt
            + b"data" + _s.pack("<I", 2) + b"\x00\x00")
    with _pytest.raises(NotImplementedError):
        wav_decode(b"RIFF" + _s.pack("<I", len(body)) + body)


def test_wav_extract_features_spark(spark):
    from qudo_etl_pipeline_spark.operators.multimodal import (
        extract_features,
        synthetic_wav_media,
    )

    ids = spark.range(6).selectExpr("id AS media_id")
    out = {
        r["media_id"]: r["features"]
        for r in extract_features(
            synthetic_wav_media(ids), decoder="wav"
        ).collect()
    }
    # clip 2: rate 8002, 52 samples, s(n) = (26 + 7n) % 201 - 100
    n = 50 + 2 % 17
    samples = [(2 * 13 + 7 * i) % 201 - 100 for i in range(n)]
    f = out[2]
    assert (f[0], f[1], f[2]) == (8002, n, 1)
    assert f[3] == sum(samples)
    assert f[4] == min(samples) and f[5] == max(samples)


def test_resize_images_identity_and_nn_map(spark):
    import numpy as np

    from qudo_etl_pipeline_spark.operators.media_codecs import (
        png_decode,
        png_encode,
    )
    from qudo_etl_pipeline_spark.operators.multimodal import resize_images

    rng = np.random.default_rng(11)
    a = rng.integers(0, 256, size=(4, 4, 3), dtype=np.uint8)
    media = spark.createDataFrame(
        [(0, "image", bytearray(png_encode(a)), None)],
        "media_id long, kind string, payload binary, "
        "meta struct<format:string,width:int,height:int,"
        "sample_rate:int,duration_ms:int>",
    )
    # same-size resize is the identity (src index map is 0..n-1)
    same = resize_images(media, 4, 4).collect()[0]
    assert np.array_equal(png_decode(bytes(same["payload"])), a)
    assert same["meta"]["width"] == 4
    # 2x upscale: each source pixel becomes a 2x2 block
    up = png_decode(bytes(resize_images(media, 8, 8).collect()[0]["payload"]))
    assert np.array_equal(up[::2, ::2], a) and np.array_equal(up[1::2, 1::2], a)
    # junk payload passes through as null, no crash
    junk = spark.createDataFrame(
        [(1, "image", bytearray(b"nope"), None)], media.schema
    )
    assert resize_images(junk, 4, 4).collect()[0]["payload"] is None


def test_bm25_matches_python_reference_on_random_corpus(spark):
    import math
    import random

    from qudo_etl_pipeline_spark.operators.index import bm25_topk

    rng = random.Random(19)
    vocab = [f"w{i}" for i in range(30)]
    corpus = {
        i: [rng.choice(vocab) for _ in range(rng.randint(3, 40))]
        for i in range(60)
    }
    docs = spark.createDataFrame(
        [(i, " ".join(ws)) for i, ws in corpus.items()],
        "doc_id long, text string",
    )
    q = ["w1", "w2", "w3"]
    k1, b = 1.2, 0.75
    n = len(corpus)
    avgdl = sum(len(ws) for ws in corpus.values()) / n
    df = {t: sum(1 for ws in corpus.values() if t in ws) for t in q}

    def score(ws):
        s = 0.0
        for t in q:
            tf = ws.count(t)
            idf = round(math.log((n - df[t] + 0.5) / (df[t] + 0.5) + 1.0), 9)
            s += idf * (tf * (k1 + 1.0)
                        / (tf + k1 * (1.0 - b + b * len(ws) / avgdl)))
        return round(s, 6)

    expected = sorted(
        ((i, score(ws)) for i, ws in corpus.items() if any(t in ws for t in q)),
        key=lambda r: (-r[1], r[0]),
    )[:10]
    got = [
        (r["doc"], r["bm25"])
        for r in sorted(
            bm25_topk(docs, q, k=10).collect(), key=lambda r: r["rank"]
        )
    ]
    assert got == expected


def test_hash_split_deterministic_and_consistent(spark):
    import pytest as _pytest

    from qudo_etl_pipeline_spark.operators.curation import hash_split

    docs = spark.createDataFrame(
        [(i,) for i in range(500)], "doc_id long"
    )
    w = {"train": 0.8, "val": 0.1, "test": 0.1}
    a = {r["doc_id"]: r["split"] for r in hash_split(docs, w).collect()}
    b = {r["doc_id"]: r["split"] for r in
         hash_split(docs.repartition(7), w).collect()}
    assert a == b  # partitioning-independent
    # a derived table keyed by the same id gets the SAME assignment
    chunks = spark.createDataFrame(
        [(i, c) for i in range(500) for c in range(2)],
        "doc_id long, chunk int",
    )
    c = {(r["doc_id"], r["chunk"]): r["split"]
         for r in hash_split(chunks, w).collect()}
    assert all(c[(i, 0)] == a[i] and c[(i, 1)] == a[i] for i in range(500))
    # proportions near the weights
    from collections import Counter
    counts = Counter(a.values())
    assert 0.7 < counts["train"] / 500 < 0.9
    with _pytest.raises(ValueError):
        hash_split(docs, {"train": 0.5, "val": 0.2})


def test_new_ops_null_and_empty_text_robustness(spark):
    """NULL/empty text must degrade to NULL/absent rows, never throw
    (ANSI mode is on in the test session)."""
    from qudo_etl_pipeline_spark.operators.importance import dsir_weights
    from qudo_etl_pipeline_spark.operators.index import bm25_topk
    from qudo_etl_pipeline_spark.operators.spans import span_dedup_stats

    docs = spark.createDataFrame(
        [(0, "a b c d e f g"), (1, None), (2, "")],
        "doc_id long, text string",
    )
    span = {r["doc_id"]: r for r in span_dedup_stats(docs, k=5).collect()}
    assert span[1]["n_tokens"] is None and span[1]["dup_fraction"] is None
    assert span[0]["dup_tokens"] == 0 and span[2]["dup_tokens"] == 0
    # null/empty docs contribute no features; real doc still weighted
    dsir = dsir_weights(docs, F.lit(True)).collect()
    assert [r["doc_id"] for r in dsir] == [0]
    # retrieval sees only the matching doc
    hits = bm25_topk(docs, ["a"]).collect()
    assert [r["doc"] for r in hits] == [0]


def test_hash_split_boundary_rounding(spark):
    """0.01+0.09 float-cumulates to 0.09999999999999999; the boundary
    must still be exactly 100000 (round, not truncate) so an oracle
    written with exact bounds agrees on every bucket."""
    from qudo_etl_pipeline_spark.operators.curation import hash_split

    docs = spark.createDataFrame([(i,) for i in range(2000)], "doc_id long")
    w = {"a": 0.01, "b": 0.09, "c": 0.9}
    got = {r["doc_id"]: r["split"] for r in hash_split(docs, w).collect()}
    # recompute with exact integer boundaries
    import hashlib

    def bucket(i):
        return int(hashlib.md5(f"split:{i}".encode()).hexdigest()[:15], 16) % 1_000_000

    for i in range(2000):
        b = bucket(i)
        expect = "a" if b < 10_000 else ("b" if b < 100_000 else "c")
        assert got[i] == expect, (i, b, got[i], expect)


def test_extract_features_decoder_dispatch_is_strict(spark):
    import pytest as _pytest

    from qudo_etl_pipeline_spark.operators.multimodal import extract_features

    df = spark.createDataFrame(
        [(0, "image", bytearray(b"x"), None)],
        "media_id long, kind string, payload binary, "
        "meta struct<format:string,width:int,height:int,"
        "sample_rate:int,duration_ms:int>",
    )
    with _pytest.raises(ValueError, match="unknown decoder"):
        extract_features(df, decoder="jpg")
    with _pytest.raises(NotImplementedError):
        extract_features(df, decoder="real")


def test_pagerank_empty_graph_returns_empty(spark):
    from qudo_etl_pipeline_spark.operators.graph import pagerank_fixed_point

    only_self = spark.createDataFrame([(1, 1)], "src long, dst long")
    assert pagerank_fixed_point(only_self).count() == 0
    # the distributed fallback's empty path must agree
    assert (
        pagerank_fixed_point(only_self, max_collect_edges=0).count() == 0
    )


def test_pagerank_driver_contraction_matches_distributed(spark):
    """The collected driver fast path and the distributed Pregel loop
    must be bit-identical on every column — rank_fp integers AND the
    rounded pagerank double — and max_collect_edges must dispatch to
    the distributed loop without changing a single rank."""
    from qudo_etl_pipeline_spark.operators.graph import pagerank_fixed_point

    # dense-ish multigraph with dangling nodes, duplicate edges and
    # self-loops; 6 rounds keeps the test fast while exercising the
    # damping + truncation recurrence well past the first step
    edges = spark.createDataFrame(
        [(i % 23, (i * 7 + 3) % 19) for i in range(400)]
        + [(97, 98), (98, 98)],
        "src long, dst long",
    )
    fast = sorted(
        tuple(r) for r in pagerank_fixed_point(edges, n_iter=6).collect()
    )
    dist = sorted(
        tuple(r)
        for r in pagerank_fixed_point(
            edges, n_iter=6, max_collect_edges=0
        ).collect()
    )
    assert fast == dist and len(fast) > 20


def test_boolean_and_query_all_terms_absent(spark):
    from qudo_etl_pipeline_spark.operators.index import (
        boolean_and_query,
        inverted_index,
    )

    docs = spark.createDataFrame(
        [(0, "alpha beta"), (1, "beta gamma")], "doc_id long, text string"
    )
    idx = inverted_index(docs)
    assert boolean_and_query(idx, ["qqq", "zzz"]).collect() == []
    assert boolean_and_query(idx, ["beta", "zzz"]).collect() == []
    assert sorted(
        r["doc"] for r in boolean_and_query(idx, ["beta"]).collect()
    ) == [0, 1]


def test_sketch_lookups_drop_null_probe_keys(spark):
    from qudo_etl_pipeline_spark.operators.sketches import (
        bloom_build,
        bloom_lookup,
        cms_build,
        cms_lookup,
    )

    base = spark.createDataFrame([("a",), ("a",), ("b",)], "k string")
    probes = spark.createDataFrame([("a",), (None,), ("zz",)], "k string")
    cms = cms_build(base, "k")
    est = {r["k"]: r["est"] for r in cms_lookup(cms, probes, "k").collect()}
    assert est["a"] == 2 and None not in est
    bloom = bloom_build(base, "k")
    hits = {r["k"]: r["hit"] for r in bloom_lookup(bloom, probes, "k").collect()}
    assert hits["a"] == 1 and None not in hits


def test_packers_handle_null_text_and_negative_ids(spark):
    from qudo_etl_pipeline_spark.operators.packing import (
        pack_boundary,
        pack_greedy,
    )

    docs = spark.createDataFrame(
        [(-3, "a b c"), (1, None), (2, "d e f g")],
        "doc_id long, text string",
    )
    pb = pack_boundary(docs, seq_len=4, n_shards=2).collect()
    assert sorted(r["doc_id"] for r in pb) == [-3, 2]  # NULL text dropped
    assert all(0 <= r["shard"] < 2 for r in pb)  # pmod, not %
    pg = pack_greedy(docs, seq_len=8, n_shards=2).collect()
    assert sorted(r["doc_id"] for r in pg) == [-3, 2]


def test_decontaminate_strategies_plan_and_equivalence(spark):
    """The size-gated benchmark join: broadcast and shuffle strategies
    must produce identical hits, with plan evidence that the strategy
    actually switched (round-4 verdict item: a many-benchmark suite can
    exceed broadcast limits, so the fallback must exist and be gated)."""
    from qudo_etl_pipeline_spark.operators.curation import decontaminate

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "completely different words appear here in this text"),
            (3, "we saw the quick brown fox jumps again today"),
        ],
        "doc_id: long, text: string",
    )
    bench = spark.createDataFrame(
        [(100, "a tale where the quick brown fox jumps at dawn")],
        "doc_id: long, text: string",
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        bcast = decontaminate(docs, bench, bench_strategy="broadcast")
        shuf = decontaminate(docs, bench, bench_strategy="shuffle")
        assert "broadcast" in bcast._jdf.queryExecution().optimizedPlan().toString().lower()
        assert "broadcast" not in shuf._jdf.queryExecution().optimizedPlan().toString().lower()
        b = {tuple(r) for r in bcast.collect()}
        s = {tuple(r) for r in shuf.collect()}
        assert b == s and len(b) == 2
        # auto with a tiny benchmark resolves to broadcast and matches too
        auto = decontaminate(docs, bench, bench_strategy="auto")
        assert {tuple(r) for r in auto.collect()} == b
        # auto with a zero limit must take the shuffle path
        auto_shuf = decontaminate(
            docs, bench, bench_strategy="auto", bench_broadcast_limit=0
        )
        assert (
            "broadcast"
            not in auto_shuf._jdf.queryExecution().optimizedPlan().toString().lower()
        )
        assert {tuple(r) for r in auto_shuf.collect()} == b
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_wav_decode_chunk_order_and_malformed(spark):
    """RIFF does not guarantee fmt-before-data; out-of-order chunks must
    decode, and every malformed shape must raise the documented
    ValueError (not TypeError/struct.error) so per-row callers filtering
    on ValueError keep the job alive."""
    import struct

    import numpy as np
    import pytest as _pytest

    from qudo_etl_pipeline_spark.operators.media_codecs import (
        wav_decode,
        wav_encode,
    )

    samples = (np.arange(8, dtype="<i2") * 100).reshape(-1, 2)
    good = wav_encode(samples, 8000)

    # reorder: move the data chunk before fmt
    def chunks(payload):
        pos, out = 12, []
        while pos + 8 <= len(payload):
            (length,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
            out.append(payload[pos : pos + 8 + length + (length & 1)])
            pos += 8 + length + (length & 1)
        return out

    fmt_c, data_c = chunks(good)
    body = b"WAVE" + data_c + fmt_c
    reordered = b"RIFF" + struct.pack("<I", len(body)) + body
    rate, arr = wav_decode(reordered)
    assert rate == 8000 and np.array_equal(arr, samples)

    # truncated fmt body -> ValueError
    short_fmt = b"fmt " + struct.pack("<I", 4) + b"\x01\x00\x02\x00"
    body = b"WAVE" + short_fmt + data_c
    with _pytest.raises(ValueError):
        wav_decode(b"RIFF" + struct.pack("<I", len(body)) + body)

    # data with no fmt at all -> ValueError
    body = b"WAVE" + data_c
    with _pytest.raises(ValueError):
        wav_decode(b"RIFF" + struct.pack("<I", len(body)) + body)

    # ragged data length (not a whole number of frames) -> ValueError
    ragged_data = b"data" + struct.pack("<I", 6) + b"\x00" * 6
    body = b"WAVE" + fmt_c + ragged_data
    with _pytest.raises(ValueError):
        wav_decode(b"RIFF" + struct.pack("<I", len(body)) + body)


def test_resize_images_corrupt_png_passes_through_null(spark):
    """A payload with a valid PNG signature but corrupt body (zlib/
    struct errors inside the decoder) must yield a null row, not fail
    the Spark job."""
    from qudo_etl_pipeline_spark.operators.media_codecs import png_encode
    from qudo_etl_pipeline_spark.operators.multimodal import resize_images

    import numpy as np

    good = png_encode(np.zeros((4, 4, 3), dtype=np.uint8))
    corrupt = good[:20] + b"\x00" * 10  # signature intact, body garbage
    df = spark.createDataFrame(
        [
            (1, "image", bytearray(good), None),
            (2, "image", bytearray(corrupt), None),
        ],
        "media_id: long, kind: string, payload: binary, "
        "meta: struct<format:string,width:int,height:int,"
        "sample_rate:int,duration_ms:int>",
    )
    rows = {r["media_id"]: r for r in resize_images(df, 2, 2).collect()}
    assert rows[1]["payload"] is not None and rows[1]["meta"]["width"] == 2
    assert rows[2]["payload"] is None and rows[2]["meta"] is None


def test_mixture_entropy_hand_computed(spark):
    from qudo_etl_pipeline_spark.operators.curation import mixture_entropy

    rows = (
        [("en", "web")] * 2 + [("en", "books")] + [("en", "code")]
        + [("fr", "web")] * 3
    )
    df = spark.createDataFrame(rows, "lang string, source string")
    out = {r["lang"]: r for r in mixture_entropy(df).collect()}
    # en: p = (0.5, 0.25, 0.25) -> H = 1.039721 nats, H/ln3 = 0.946395,
    # gini = 1 - (0.25 + 0.0625 + 0.0625) = 0.625
    en = out["en"]
    assert en["n_categories"] == 3
    assert abs(en["entropy"] - 1.039721) < 1e-6
    assert abs(en["norm_entropy"] - 0.946395) < 1e-6
    assert abs(en["gini"] - 0.625) < 1e-6
    # single-source group: entropy exactly 0, normalized undefined
    fr = out["fr"]
    assert fr["n_categories"] == 1
    assert fr["entropy"] == 0.0
    assert fr["norm_entropy"] is None
    assert fr["gini"] == 0.0


def test_rrf_fuse_hand_computed(spark):
    from qudo_etl_pipeline_spark.operators.index import rrf_fuse

    a = spark.createDataFrame(
        [(10, 1), (20, 2), (30, 3)], "doc long, rank long"
    )
    b = spark.createDataFrame(
        [(20, 1), (10, 2), (40, 3)], "doc long, rank long"
    )
    out = rrf_fuse([a, b], k=4).collect()
    got = [(r["id"], r["n_systems"], r["rrf9"], r["rank"]) for r in out]
    s = lambda *ranks: round(sum(round(1.0 / (60 + r), 9) for r in ranks), 9)
    # doc 10: ranks 1,2 -> ties doc 20 (ranks 2,1) exactly; id breaks tie
    assert got == [
        (10, 2, s(1, 2), 1),
        (20, 2, s(2, 1), 2),
        (30, 1, s(3), 3),
        (40, 1, s(3), 4),
    ]


def test_weighted_sample_bias_and_determinism(spark):
    from qudo_etl_pipeline_spark.operators.curation import weighted_sample

    # 500 light items (w=1) + 500 heavy (w=50): a 100-item ES sample
    # must be dominated by heavy items (E[heavy] ~= 98)
    rows = [(i, 1.0) for i in range(500)] + [
        (i, 50.0) for i in range(500, 1000)
    ]
    df = spark.createDataFrame(rows, "id long, w double")
    got = weighted_sample(df, "id", "w", k=100).collect()
    assert len(got) == 100
    heavy = sum(1 for r in got if r["id"] >= 500)
    assert heavy > 85
    # same seed -> identical sample; different seed -> different draw
    again = weighted_sample(df, "id", "w", k=100).collect()
    assert [r["id"] for r in got] == [r["id"] for r in again]
    other = weighted_sample(df, "id", "w", k=100, seed=7).collect()
    assert [r["id"] for r in got] != [r["id"] for r in other]
    # zero/negative weights never sampled
    df2 = df.union(spark.createDataFrame([(2000, 0.0), (2001, -1.0)],
                                         "id long, w double"))
    ids = {r["id"] for r in weighted_sample(df2, "id", "w", k=1100).collect()}
    assert 2000 not in ids and 2001 not in ids


def test_triangle_counts_hand_computed(spark):
    from qudo_etl_pipeline_spark.operators.graph import triangle_counts

    # K4 on {1,2,3,4} (4 triangles, every node in 3, clustering 1.0),
    # a pendant 5-1 (degree-1, no triangle), one triangle {6,7,8},
    # plus noise the canonicalization must absorb: duplicates, reversed
    # duplicates, self-loops, NULL endpoints.
    k4 = [(a, b) for a in range(1, 5) for b in range(1, 5) if a < b]
    edges = k4 + [(5, 1), (1, 5), (6, 7), (7, 8), (8, 6), (6, 6), (None, 9)]
    df = spark.createDataFrame(edges, "src: long, dst: long")
    got = {r["node"]: r for r in triangle_counts(df).collect()}
    # node 9 vanishes (its only edge had a NULL end); 5 is a pendant
    assert set(got) == {1, 2, 3, 4, 5, 6, 7, 8}
    for n in (2, 3, 4):
        assert got[n]["degree"] == 3 and got[n]["triangles"] == 3
        assert got[n]["clustering"] == 1.0
    # node 1 also touches the pendant: degree 4, still 3 triangles,
    # clustering 2*3/(4*3) = 0.5
    assert got[1]["degree"] == 4 and got[1]["triangles"] == 3
    assert got[1]["clustering"] == 0.5
    assert got[5]["degree"] == 1 and got[5]["triangles"] == 0
    assert got[5]["clustering"] == 0.0
    for n in (6, 7, 8):
        assert got[n]["degree"] == 2 and got[n]["triangles"] == 1
        assert got[n]["clustering"] == 1.0
    # global count from per-node credit: each triangle counted 3x
    assert sum(r["triangles"] for r in got.values()) == 3 * 5


def test_similarity_join_exact_vs_bruteforce(spark):
    """Prefix filtering must lose NO qualifying pair (the exactness
    guarantee LSH banding gives up): compare against brute-force
    all-pairs Jaccard on a corpus with planted near-dups, unique docs,
    and shared common tokens."""
    from itertools import combinations

    from qudo_etl_pipeline_spark.operators.dedup import (
        prefix_filter_candidates,
        similarity_join,
    )

    docs = [
        (1, "the quick brown fox jumps"),
        (2, "the quick brown fox leaps"),      # ~0.67 with 1
        (3, "the quick brown wolf jumps"),     # ~0.67 with 1
        (4, "entirely different tokens here"),
        (5, "the quick brown fox jumps"),      # exact dup of 1
        (6, "lorem ipsum dolor sit amet"),
        (7, "the and of to in"),               # all-common tokens
        (8, "the and of to on"),               # 0.67 with 7
    ]
    df = spark.createDataFrame(docs, "doc_id: long, text: string")

    def jac(a, b):
        sa, sb = set(a.split()), set(b.split())
        return len(sa & sb) / len(sa | sb)

    for t in (0.5, 0.7, 0.9):
        truth = {
            (i, j)
            for (i, ta), (j, tb) in combinations(docs, 2)
            if round(jac(ta, tb), 6) >= t
        }
        got = {
            (r["id_a"], r["id_b"])
            for r in similarity_join(df, t).collect()
        }
        assert got == truth, (t, got ^ truth)

    # candidate set is a SUPERSET of the truth but not all-pairs here
    cands = {
        (r["id_a"], r["id_b"])
        for r in prefix_filter_candidates(df, 0.9).collect()
    }
    assert {(1, 5)} <= cands
    assert (4, 6) not in cands  # no shared token at all

    import pytest as _pt

    with _pt.raises(ValueError, match="threshold"):
        prefix_filter_candidates(df, 0.0)


def test_js_divergence_bounds_and_mirror(spark):
    import math

    from qudo_etl_pipeline_spark.operators.text import source_js_divergence

    docs = spark.createDataFrame(
        [
            (1, "a a b c", "s1"),
            (2, "a b b d", "s1"),
            (3, "x x y z", "s2"),   # disjoint vocabulary
            (4, "a b c d", "s3"),   # close to pooled
        ],
        "doc_id bigint, text string, source string",
    )
    out = {r["source"]: r["js"] for r in
           source_js_divergence(docs).collect()}
    # symmetric-bounded: 0 <= JS <= ln 2
    for v in out.values():
        assert -1e-9 <= v <= math.log(2) + 1e-9
    # the disjoint-vocab source must diverge most
    assert out["s2"] == max(out.values())

    # plain-python mirror for s3
    import collections

    alltoks = "a a b c a b b d x x y z a b c d".split()
    s3 = "a b c d".split()
    pc = collections.Counter(alltoks)
    sc = collections.Counter(s3)
    t, ts = len(alltoks), len(s3)
    js = 0.0
    for tok, c in sc.items():
        p_s, p = c / ts, pc[tok] / t
        m = (p_s + p) / 2
        js += round(
            0.5 * p_s * math.log(p_s / m) + 0.5 * p * math.log(p / m), 9
        )
    cov = sum(pc[tok] for tok in sc)
    js += 0.5 * math.log(2) * (1 - cov / t)
    assert abs(out["s3"] - round(js, 6)) < 2e-6


def test_lsh_band_verdicts_stream_state_across_batches(spark, tmp_path):
    """First-arrival-wins must hold ACROSS micro-batches: a second
    file's doc landing in a bucket occupied during batch 1 is flagged
    via GroupState, not same-batch comparison; and exactly one survivor
    exists per bucket even when the later arrival has a smaller id."""
    import os
    import pandas as pd

    src = str(tmp_path / "bands_in")
    os.makedirs(src, exist_ok=True)
    # batch 1: bucket (0, 7) taken by doc 10; bucket (0, 8) by doc 11
    pd.DataFrame(
        {"band": [0, 0], "bucket": [7, 8], "doc_id": [10, 11]}
    ).to_parquet(src + "/b0.parquet")
    # batch 2: doc 3 (smaller id, later arrival) hits taken bucket 7;
    # doc 12 opens bucket 9
    pd.DataFrame(
        {"band": [0, 0], "bucket": [7, 9], "doc_id": [3, 12]}
    ).to_parquet(src + "/b1.parquet")

    from qudo_etl_pipeline_spark.streaming.sessions import (
        lsh_band_verdicts_stream,
    )

    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        lsh_band_verdicts_stream(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("lsh_verdicts_xbatch")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = {
        (r["band"], r["bucket"], r["doc_id"]): r["dup_in_bucket"]
        for r in spark.sql("SELECT * FROM lsh_verdicts_xbatch").collect()
    }
    assert rows == {
        (0, 7, 10): 0,  # batch-1 opener survives
        (0, 8, 11): 0,
        (0, 7, 3): 1,   # later arrival, smaller id: still flagged
        (0, 9, 12): 0,
    }


def test_demo_centroids_guard_and_spread_distinctness():
    """demo_centroids aliases cells mod 7 (c and c+7 are the same
    vector), which once let a 64-cell SemDeDup request collapse onto 7
    effective cells and hid a quadratic pair stage — requests past the
    alias period must fail loudly and point at spread_centroids."""
    with pytest.raises(ValueError, match="spread_centroids"):
        SIM.demo_centroids(8, 16)
    assert len(SIM.demo_centroids(7, 16)) == 7  # at the cap: allowed
    spread = SIM.spread_centroids(64, 16)
    assert len({tuple(c) for c in spread}) == 64


def test_semantic_dedup_cache_is_scope_released(spark):
    """semantic_dedup's tagged-frame cache goes through the operator
    cache registry: repeat calls with the same input reuse ONE entry,
    and prefix_cache_scope exit releases it (the old bare .persist()
    leaked one CacheManager entry per call for the session lifetime)."""
    from qudo_etl_pipeline_spark.operators import prefix as P

    P.clear_prefix_caches()
    cents = [[1.0, 0.0], [0.0, 1.0]]
    rows = [(i, [float(i % 3), 1.0]) for i in range(30)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    with P.prefix_cache_scope():
        SIM.semantic_dedup(df, cents, 0.5).collect()
        SIM.semantic_dedup(df, cents, 0.5).collect()
        assert sum(len(v) for v in P._REGISTRY.values()) == 1
        frame = next(iter(P._REGISTRY.values()))[0]
        assert frame.storageLevel.useMemory
    assert not P._REGISTRY
    assert not frame.storageLevel.useMemory
