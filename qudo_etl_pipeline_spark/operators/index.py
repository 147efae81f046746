"""Inverted index: token -> sorted posting list of document ids.

Extension scope (no reference counterpart): the retrieval-side primitive
of a corpus pipeline — keyword search, boolean filtering, and
df-statistics all read an inverted index instead of scanning text.

Scale shape: ONE explode feeds a distinct + groupBy(token); posting
lists are per-token arrays whose length is the token's document
frequency, so hot stopwords produce big rows — ``max_df_ratio`` drops
them (they carry no selectivity anyway, the standard IR practice). The
boolean AND query then intersects the two smallest posting lists —
array work on two rows, no scan of the corpus at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["inverted_index", "boolean_and_query", "bm25_topk", "rrf_fuse"]


def _postings(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    # no distinct() here: collect_set downstream deduplicates per
    # token anyway, and an explicit distinct would add a full shuffle
    # of the exploded token stream — the largest intermediate in the
    # index build — for identical output. An id-less document cannot
    # appear in a posting list, so it is dropped at the scan (NULL text
    # already explodes to zero rows).
    return docs.filter(F.col(id_col).isNotNull()).select(
        F.col(id_col).alias("doc"),
        F.explode(F.split(F.lower(F.col(text_col)), " ")).alias("tok"),
    ).filter(F.col("tok") != "")


def inverted_index(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_df: int = 1,
    max_df_ratio: float = 1.0,
) -> DataFrame:
    """Build (tok, df, postings) with postings ascending by doc id.
    Tokens with df < min_df or df > max_df_ratio * n_docs are dropped
    (rare-noise and stopword gates)."""
    idx = (
        _postings(docs, id_col, text_col)
        .groupBy("tok")
        .agg(F.sort_array(F.collect_set("doc")).alias("postings"))
        .select(
            "tok",
            F.size("postings").cast("bigint").alias("df"),
            "postings",
        )
    )
    if min_df > 1:
        idx = idx.filter(F.col("df") >= min_df)
    if max_df_ratio < 1.0:
        # corpus size only needed for the stopword gate: keep the plan
        # build job-free on the default path
        n_docs = docs.select(id_col).distinct().count()
        idx = idx.filter(F.col("df") <= int(max_df_ratio * n_docs))
    return idx


def boolean_and_query(
    index: DataFrame, terms: list[str]
) -> DataFrame:
    """Documents containing ALL ``terms``: intersect their posting
    lists (array work over len(terms) index rows). Returns (doc,) —
    empty if any term is absent from the index."""
    if not terms:
        raise ValueError("need at least one term")
    rows = index.filter(F.col("tok").isin([t.lower() for t in terms]))
    merged = rows.agg(
        F.count(F.lit(1)).alias("n_terms"),
        F.aggregate(
            # fold: intersect all posting lists; seed with the first.
            # try_element_at: when NO term matched the index the agg
            # still emits one row with an empty collect_list, and
            # element_at(empty, 1) throws under ANSI — the NULL seed
            # instead flows into the n_terms filter, returning empty
            F.slice(F.collect_list("postings"), 2, 1_000_000),
            F.try_element_at(F.collect_list("postings"), F.lit(1)),
            lambda acc, p: F.array_intersect(acc, p),
        ).alias("docs"),
    )
    return (
        merged.filter(F.col("n_terms") == len(terms))
        .select(F.explode("docs").alias("doc"))
    )


def bm25_topk(
    docs: DataFrame,
    terms: list[str],
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-``k`` documents by BM25 for a bag-of-terms query.

    Lucene-variant idf = ln((N - df + 0.5)/(df + 0.5) + 1) (always
    positive), Robertson tf saturation with ``k1``/``b`` length
    normalization. Cross-engine determinism: idf is rounded to 9
    decimals before scoring (ln is the one libm-dependent op), the
    final score to 6, ties break on ascending id; the per-term score
    sum is a fixed-order column expression, not an aggregation.

    Scale shape: a query has a handful of terms, so term frequencies
    PIVOT into per-term columns — ONE groupBy(doc) over the token
    stream yields doc length and every tf; document frequencies, N and
    avgdl fall out of a single 1-row aggregate of that table, broadcast
    back. One full-data shuffle total, then a distributed TakeOrdered —
    no per-term joins, no global sort.
    """
    if not terms:
        raise ValueError("need at least one term")
    q = list(dict.fromkeys(t.lower() for t in terms))
    toks = docs.select(
        F.col(id_col).alias("doc"),
        F.explode(F.split(F.lower(F.col(text_col)), " ")).alias("tok"),
    ).filter(F.col("tok") != "")

    per_doc = toks.groupBy("doc").agg(
        F.count(F.lit(1)).alias("dl"),
        *[
            F.sum(F.when(F.col("tok") == t, 1).otherwise(0)).alias(f"tf{i}")
            for i, t in enumerate(q)
        ],
    )
    stats = per_doc.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        (F.sum("dl") / F.count(F.lit(1))).alias("avgdl"),
        *[
            F.sum((F.col(f"tf{i}") > 0).cast("long")).alias(f"df{i}")
            for i in range(len(q))
        ],
    )

    matched = per_doc.filter(
        sum(F.col(f"tf{i}") for i in range(len(q))) > 0
    ).crossJoin(F.broadcast(stats))
    score = None
    for i in range(len(q)):
        idf = F.round(
            F.log(
                (F.col("n_docs") - F.col(f"df{i}") + 0.5)
                / (F.col(f"df{i}") + 0.5)
                + 1.0
            ),
            9,
        )
        sat = (
            F.col(f"tf{i}")
            * (k1 + 1.0)
            / (
                F.col(f"tf{i}")
                + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
            )
        )
        term = idf * sat
        score = term if score is None else score + term

    out = matched.select("doc", F.round(score, 6).alias("bm25"))
    order = [F.desc("bm25"), F.asc("doc")]
    top = out.orderBy(*order).limit(k)
    w = Window.orderBy(*order)
    return top.select(
        "doc",
        "bm25",
        F.row_number().over(w).cast("bigint").alias("rank"),
    )


def rrf_fuse(
    rankings: list[DataFrame],
    id_col: str = "doc",
    rank_col: str = "rank",
    c: int = 60,
    k: int = 10,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack/Clarke/Buettcher, SIGIR'09) of
    N retrieval rankings: score(d) = Σ over systems of 1/(c + rank_d),
    items absent from a system contribute nothing. The standard hybrid-
    retrieval combiner (BM25 + dense ANN) — score scales never need
    calibrating because only ranks enter.

    Scale shape: inputs are top-k lists, so everything here is
    k·N-sized — one union + one tiny groupBy; the final row_number
    window runs on ≤ Σk_i rows.

    Cross-engine determinism: each 1/(c+rank) term is cos9-rounded and
    summed as DECIMAL(18,9) (summation order across systems can't
    perturb the score); ties break on ascending id.
    """
    if not rankings:
        raise ValueError("need at least one ranking")
    tagged = [
        r.select(
            F.col(id_col).alias("id"), F.col(rank_col).alias("rank")
        )
        for r in rankings
    ]
    u = tagged[0]
    for t in tagged[1:]:
        u = u.unionByName(t)
    term = F.round(
        F.lit(1.0) / (F.lit(float(c)) + F.col("rank").cast("double")), 9
    ).cast("decimal(18,9)")
    scored = (
        u.select("id", term.alias("_t"))
        .groupBy("id")
        .agg(
            F.sum("_t").cast("double").alias("rrf"),
            F.count(F.lit(1)).cast("bigint").alias("n_systems"),
        )
    )
    order = [F.desc("rrf"), F.asc("id")]
    w = Window.orderBy(*order)
    return (
        scored.orderBy(*order)
        .limit(k)
        .select(
            "id",
            "n_systems",
            F.round("rrf", 9).alias("rrf9"),
            F.row_number().over(w).cast("bigint").alias("rank"),
        )
    )
