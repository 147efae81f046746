"""Deduplication operators for large-scale text corpora.

Beyond-reference operators (BASELINE.json north star): exact-hash dedup,
MinHash signatures + LSH banding, SimHash, and n-gram Jaccard. All the
per-document work is expressed with JVM-side higher-order array functions
(split/transform/array_min) so signature computation is a narrow map with
no shuffle; only candidate generation (groupBy bucket / self-join) shuffles,
and it shuffles signatures (tiny) rather than documents.

Scale design (100 TB corpus):
- signatures are O(docs x n_seeds) longs — the self-join for candidates
  happens on banded buckets, so each comparison group is tiny unless data
  is pathologically self-similar; AQE skew-join handles hot buckets.
- hashes are the cross-engine md5-prefix family (functions/hashing.py) so
  every stage is oracle-checkable in DuckDB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from qudo_etl_pipeline_spark.functions.hashing import hash64

# Spark-SQL fragment of the seeded 60-bit md5 hash, for use inside
# higher-order-function lambdas (F.md5 etc. can't be used there directly
# when building from strings).
def _hash64_frag(expr: str, seed: int) -> str:
    return (
        f"cast(conv(substring(md5(concat('{seed}:', {expr})), 1, 15), 16, 10) "
        f"as bigint)"
    )


def _hash64_raw_frag(expr: str) -> str:
    return f"cast(conv(substring(md5({expr}), 1, 15), 16, 10) as bigint)"


# Universal-hash family for MinHash: every shingle is md5-hashed ONCE,
# then each of the n signature components is a cheap affine transform
# h_s(x) = (a_s * x + b_s) mod P over the 31-bit reduction of that base
# hash. This replaces n md5 passes per shingle with one (the md5 is the
# dominant per-row cost) and is the standard MinHash construction
# (Broder 1997). All operands stay < 2^62, so the arithmetic is exact,
# ANSI-safe, and bit-identical in DuckDB for the oracle.
MINHASH_MOD = 2_147_483_647  # 2^31 - 1 (prime)
MINHASH_RANGE = 2_147_483_648  # 2^31


def minhash_params(seed: int) -> tuple[int, int]:
    """Deterministic (a, b) for signature component `seed` (a != 0)."""
    a = (seed * 2_654_435_761 + 1) % MINHASH_MOD
    b = (seed * 1_013_904_223 + 12_345) % MINHASH_MOD
    return (a or 1, b)


def _affine_frag(hvar: str, seed: int) -> str:
    a, b = minhash_params(seed)
    return f"(({a}L * {hvar} + {b}L) % {MINHASH_MOD}L)"


def tokens_col(text_col: str = "text", sep: str = " ") -> Column:
    return F.split(F.col(text_col), sep)


def exact_dup_hash(text_col: str = "text") -> Column:
    """Content hash for exact dedup (group equal hashes, keep min id)."""
    return hash64(F.col(text_col))


def _shingles_frag(text_col: str, k: int, sep: str = " ") -> str:
    """Spark-SQL fragment: word k-shingles of a text column.

    Shingling (not single words) is what makes MinHash discriminative:
    over a small vocabulary nearly every document contains the
    globally-minimal word, collapsing all buckets into one. Documents
    shorter than k words yield one (padded) shingle; out-of-range
    element_at is null and concat_ws skips nulls — same semantics in the
    DuckDB oracle.
    """
    if k <= 1:
        return f"split({text_col}, '{sep}')"
    words = f"split({text_col}, '{sep}')"
    parts = ", ".join(f"try_element_at({words}, i + {j})" for j in range(k))
    return (
        f"transform(sequence(1, greatest(size({words}) - {k - 1}, 1)), "
        f"i -> concat_ws(' ', {parts}))"
    )


def minhash_col(
    text_col: str, seed: int, sep: str = " ", shingle_size: int = 3
) -> Column:
    """MinHash signature component: min over word-shingles of the affine
    universal hash over the md5 base hash (same family as
    minhash_signatures).

    A narrow expression (split -> shingle -> transform -> array_min): no
    explode, no shuffle; whole-stage codegen keeps it JVM-side.
    """
    base = f"({_hash64_raw_frag('t')} % {MINHASH_RANGE}L)"
    return F.expr(
        f"array_min(transform({_shingles_frag(text_col, shingle_size, sep)}, "
        f"t -> {_affine_frag(base, seed)}))"
    )


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int = 4,
    shingle_size: int = 3,
) -> DataFrame:
    """doc_id + mh0..mh{n-1} MinHash signature columns over k-shingles.

    The shingle array materializes ONCE per row behind a projection
    barrier, then the md5 base-hash array materializes ONCE more; each
    signature component pays only an affine transform + array_min over
    the cached base hashes. Without the barriers Spark re-derives
    split+shingle+md5 per seed inside every lambda — md5 being the
    dominant per-row cost, that multiplies the hot path by n_hashes.
    """
    with_words = df.select(
        id_col, F.split(F.col(text_col), " ").alias("_w")
    )
    if shingle_size <= 1:
        shingle_expr = "_w"
    else:
        parts = ", ".join(
            f"try_element_at(_w, i + {j})" for j in range(shingle_size)
        )
        shingle_expr = (
            f"transform(sequence(1, greatest(size(_w) - {shingle_size - 1}, 1)), "
            f"i -> concat_ws(' ', {parts}))"
        )
    with_sh = with_words.select(id_col, F.expr(shingle_expr).alias("_sh"))
    base = f"({_hash64_raw_frag('t')} % {MINHASH_RANGE}L)"
    with_base = with_sh.select(
        id_col, F.expr(f"transform(_sh, t -> {base})").alias("_hb")
    )
    return with_base.select(
        id_col,
        *[
            F.expr(
                f"array_min(transform(_hb, h -> {_affine_frag('h', s)}))"
            ).alias(f"mh{s}")
            for s in range(n_hashes)
        ],
    )


def lsh_bands(
    signatures: DataFrame,
    id_col: str = "doc_id",
    n_hashes: int = 4,
    band_size: int = 2,
) -> DataFrame:
    """Long-form (doc_id, band, bucket): hash of each band's signature slice.

    Docs sharing (band, bucket) are near-dup candidates; the candidate
    self-join happens on this tiny frame, never on document text.

    All bands come from ONE ``stack`` pass over the signature row — a
    per-band union would re-derive the (expensive) signature expression
    once per band, and the self-join downstream would double that again.
    """
    pairs = []
    for b in range(n_hashes // band_size):
        cols = [f"mh{b * band_size + i}" for i in range(band_size)]
        concat = " || '_' || ".join(f"cast(`{c}` as string)" for c in cols)
        bucket = (
            f"cast(conv(substring(md5({concat}), 1, 15), 16, 10) as bigint)"
        )
        pairs.append(f"cast({b} as bigint), {bucket}")
    stack = (
        f"stack({n_hashes // band_size}, "
        + ", ".join(pairs)
        + ") as (band, bucket)"
    )
    return signatures.select(F.col(id_col), F.expr(stack))


def lsh_candidate_pairs(
    bands: DataFrame,
    id_col: str = "doc_id",
    max_bucket_size: int | None = 10_000,
) -> DataFrame:
    """Distinct candidate pairs (a < b) sharing any LSH bucket.

    Hot-bucket guard: within-bucket pairing is |bucket|² and a web
    corpus reliably plants mega-buckets (boilerplate-identical
    headers/footers hash whole swaths of the corpus into one
    (band, bucket)), so buckets past ``max_bucket_size`` are EVICTED
    before the self-join — the ``entity.candidate_pairs`` block-guard
    device: one aggregation sizes the buckets, the pair join then does
    at most ``max_bucket_size² / 2`` work per surviving bucket, never
    all-pairs. Standard banding math keeps recall for genuinely
    near-duplicate pairs: they agree on MANY band slices, so an
    evicted pathological bucket's pairs are still produced by their
    other, normally-sized buckets; what eviction drops is exactly the
    pair whose ONLY agreement is the boilerplate slice — the false
    positives verification would reject anyway. Pass ``None`` to
    disable (exact small-corpus mode).
    """
    if max_bucket_size is not None:
        # Materialize the bands frame ONCE (3 int columns) — the guard
        # needs it three times (sizing pass + both self-join children)
        # and left lazy each reference re-derives the md5-heavy
        # shingle->minhash chain: ReuseExchange never fired on the
        # aliased subtrees (a repartition-based sharing attempt
        # measured 2.4x the unguarded join at sf0.1; an eager sizing
        # pass without the shared materialization still 2.0x). The
        # materialization goes through the operator cache registry
        # (plan-keyed, scope-released) rather than a per-call
        # localCheckpoint: same intra-plan sharing, and a repeated
        # pipeline (bench passes, a driver re-running the dedup stage)
        # reuses the entry instead of re-deriving the whole chain —
        # the md5 pass is deterministic, so lineage-based recompute on
        # eviction is safe. The sizing count is a
        # map-side-combined streaming aggregate — a mega bucket is
        # counted, never buffered (a count WINDOW would funnel its
        # rows through ONE task, the exact pathology the guard exists
        # for). On a healthy corpus the hot set is EMPTY (at most
        # rows/cap entries ever) and the eager take(1) short-circuits
        # the anti-join entirely, so the join plan is bit-identical to
        # unguarded mode. No forced broadcast on the anti-join: in the
        # everything-is-boilerplate worst case AQE falls back to a
        # shuffle anti-join instead of OOMing the driver.
        from qudo_etl_pipeline_spark.operators.prefix import (
            acquire_operator_cache,
        )

        bands = acquire_operator_cache(bands)
        hot = (
            bands.groupBy("band", "bucket")
            .agg(F.count(F.lit(1)).alias("_bs"))
            .filter(F.col("_bs") > max_bucket_size)
            .select("band", "bucket")
        )
        if len(hot.take(1)) > 0:
            bands = bands.join(hot, ["band", "bucket"], "left_anti")
    left = bands.select(
        F.col("band"), F.col("bucket"), F.col(id_col).alias("id_a")
    )
    right = bands.select(
        F.col("band"), F.col("bucket"), F.col(id_col).alias("id_b")
    )
    return (
        left.join(right, ["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def verified_pairs(
    df: DataFrame,
    pairs: DataFrame,
    threshold: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """LSH candidates verified by true token Jaccard >= threshold.

    The second stage of the canonical near-dup pipeline: candidate
    generation touched only signatures; verification joins the (small)
    candidate set back to the token arrays — payload re-enters the plan
    only for rows that survived banding.
    """
    toks = df.select(
        F.col(id_col).alias("_vid"),
        F.array_distinct(F.split(F.col(text_col), " ")).alias("_vt"),
    )
    a = toks.select(F.col("_vid").alias("id_a"), F.col("_vt").alias("_ta"))
    b = toks.select(F.col("_vid").alias("id_b"), F.col("_vt").alias("_tb"))
    return (
        pairs.join(a, "id_a")
        .join(b, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(jaccard_tokens(F.col("_ta"), F.col("_tb")), 6).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def neardup_groups(
    pairs: DataFrame,
    id_col: str = "doc_id",
    max_iter: int = 20,
    method: str = "label",
) -> DataFrame:
    """Connected components over verified dup pairs: (doc_id, group_id)
    with group_id = min doc id reachable through the pair graph.

    ``method="label"`` (default): iterative min-label propagation — per
    iteration one join + one aggregation over the PAIR set (never the
    corpus), converging in O(diameter) rounds; near-dup clusters are
    tiny cliques in practice so this terminates in 2-3 rounds.

    ``method="star"``: alternating large-star/small-star contraction
    (the classic MapReduce connected-components construction) —
    converges in O(log n) rounds regardless of diameter, the right
    choice for pathological corpora whose dup graph contains long
    chains (templated documents each near-duplicating the next
    revision). Same output, property-tested equal to the label method.

    Driver holds only the convergence flag; lineage is cut with
    localCheckpoint per round so plans don't nest. Not SQL-expressible
    (data-dependent iteration) — verified by unit tests on
    hand-computed components.
    """
    if method == "star":
        return _star_cc(pairs, id_col=id_col, max_iter=max_iter)
    if method != "label":
        raise ValueError(f"unknown method {method!r} (label|star)")
    edges = (
        pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
        .union(pairs.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst")))
        .distinct()
        .localCheckpoint()
    )
    labels = (
        edges.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("label", F.col("id"))
        .localCheckpoint()
    )
    for _ in range(max_iter):
        # candidate label per node: min over its own and neighbors' labels
        neighbor = (
            edges.join(labels, edges.dst == labels.id)
            .select(F.col("src").alias("id"), F.col("label"))
        )
        new_labels = (
            labels.select("id", "label")
            .union(neighbor)
            .groupBy("id")
            .agg(F.min("label").alias("label"))
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.label") != F.col("o.label"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    else:
        raise RuntimeError(
            f"neardup_groups did not converge in {max_iter} iterations "
            "(a component's diameter exceeds max_iter); raise max_iter — "
            "returning partial labels would silently split dup groups"
        )
    return labels.select(F.col("id").alias(id_col), F.col("label").alias("group_id"))


def _star_cc(
    pairs: DataFrame, id_col: str = "doc_id", max_iter: int = 20
) -> DataFrame:
    """Alternating large-star/small-star connected components.

    Each round: large-star hangs every neighbor larger than ``u`` onto
    ``m(u) = min(neighbors(u) + {u})``; small-star then hangs ``u`` and
    its (now all-smaller) neighbors onto their minimum. The edge set
    contracts toward star graphs rooted at each component's minimum id
    in O(log n) rounds — diameter-independent, unlike label
    propagation. Convergence = the (count, hash-sum) signature of the
    edge set repeating.
    """
    edges = (
        pairs.select(F.col("id_a").alias("u"), F.col("id_b").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint()
    )
    prev_sig = None
    for _ in range(max_iter):
        # large-star over the symmetric adjacency
        adj = edges.union(
            edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        mins = adj.groupBy("u").agg(
            F.least(F.min("v"), F.first("u")).alias("m")
        )
        large = (
            adj.join(mins, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )
        # small-star: every edge now points big -> small, so per u all
        # neighbors v are < u and m = min(v)
        mins2 = large.groupBy("u").agg(F.min("v").alias("m"))
        small = (
            large.join(mins2, "u")
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .union(mins2.select(F.col("u"), F.col("m").alias("v")))
            .filter(F.col("u") != F.col("v"))
            .distinct()
            .localCheckpoint()
        )
        # bit_xor: order-independent, no ANSI long-sum overflow
        sig_row = small.agg(
            F.count(F.lit(1)).alias("n"),
            F.bit_xor(F.xxhash64("u", "v")).alias("h"),
        ).collect()[0]
        sig = (sig_row["n"], sig_row["h"])
        edges = small
        if sig == prev_sig:
            break
        prev_sig = sig
    else:
        raise RuntimeError(
            f"star contraction did not converge in {max_iter} rounds"
        )
    # fixpoint edges are (member, root); roots label themselves
    labels = (
        edges.select(F.col("u").alias(id_col), F.col("v").alias("group_id"))
        .union(
            edges.select(
                F.col("v").alias(id_col), F.col("v").alias("group_id")
            )
        )
        .groupBy(id_col)
        .agg(F.min("group_id").alias("group_id"))
    )
    return labels


def jaccard_tokens(a_tokens: Column, b_tokens: Column) -> Column:
    """Jaccard similarity of two token-array columns (distinct tokens)."""
    a = F.array_distinct(a_tokens)
    b = F.array_distinct(b_tokens)
    inter = F.size(F.array_intersect(a, b))
    union = F.size(F.array_union(a, b))
    return F.when(union > 0, inter / union).otherwise(F.lit(0.0))


def simhash16(text_col: str = "text", sep: str = " ") -> Column:
    """16-bit SimHash over distinct tokens as a pure column expression.

    bit_i(fingerprint) = 1 iff sum over tokens of (+1 if bit_i(hash64(t))
    else -1) > 0. Uses aggregate() over the token array — narrow, no
    shuffle, oracle-expressible in DuckDB with the same md5 hash family.
    """
    th = f"transform(array_distinct(split({text_col}, '{sep}')), t -> {_hash64_frag('t', 0)})"
    bit_sums = ", ".join(
        f"sum(case when (shiftright(h, {i}) & 1) = 1 then 1 else -1 end)"
        for i in range(16)
    )
    # aggregate token-hash array into 16 bit-vote counters, then pack bits
    votes = f"""
      aggregate({th},
                array_repeat(0L, 16),
                (acc, h) -> transform(acc, (v, i) ->
                    v + (case when (shiftright(h, i) & 1) = 1 then 1L else -1L end)))
    """
    packed = f"""
      aggregate(zip_with({votes}, sequence(0, 15), (v, i) -> struct(v as v, i as i)),
                0L,
                (acc, s) -> acc + (case when s.v > 0 then shiftleft(1L, s.i) else 0L end))
    """
    return F.expr(packed)


def exact_dedup(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Exact dedup: one keeper row (min id) per distinct content hash."""
    return (
        df.select(F.col(id_col), exact_dup_hash(text_col).alias("text_hash"))
        .groupBy("text_hash")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min(id_col).alias("keeper_id"),
        )
    )


# --- prefix-filtering exact similarity join -------------------------------


def prefix_filter_candidates(
    df: DataFrame,
    threshold: float,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Candidate pairs for an EXACT Jaccard-similarity join by prefix
    filtering (PPJoin family, Xiao et al. WWW'08 — public technique).

    Each document's distinct tokens are ordered by GLOBAL frequency
    (rarest first, ties by token); a pair with Jaccard >= t must share
    a token among each side's first ``n - ceil(t*n) + 1`` tokens, so
    joining on prefix tokens alone loses NO qualifying pair — the
    exactness LSH banding gives up. Because prefixes hold each doc's
    rarest tokens, the candidate join's key skew is structurally
    bounded: a corpus-common token enters a prefix only for docs made
    almost entirely of common tokens.

    Cost: one token-frequency aggregate, one frequency join back, ONE
    doc-keyed window shuffle (rank + per-doc count), and the
    prefix-token equi-join. Output: distinct (id_a, id_b), id_a < id_b.
    """
    if not 0.0 < threshold <= 1.0:
        raise ValueError(f"threshold {threshold} outside (0, 1]")
    toks = df.select(
        F.col(id_col).alias("id"),
        F.explode(
            F.array_distinct(F.split(F.col(text_col), " "))
        ).alias("tok"),
    )
    freq = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("f"))
    wd = Window.partitionBy("id")
    wr = wd.orderBy(F.col("f").asc(), F.col("tok").asc())
    from qudo_etl_pipeline_spark.operators.prefix import (
        acquire_operator_cache,
    )

    # cached once: BOTH sides of the candidate self-join consume the
    # prefix table, and without a cache each side re-ran the explode +
    # frequency join + doc window from the source scan; the frame holds
    # only each doc's prefix tokens (n - ceil(t·n) + 1 per doc)
    prefix = acquire_operator_cache(
        toks.join(freq, "tok")
        .select(
            "id",
            "tok",
            F.row_number().over(wr).alias("rn"),
            F.count(F.lit(1)).over(wd).alias("n"),
        )
        .filter(
            F.col("rn")
            <= F.col("n")
            - F.ceil(F.lit(float(threshold)) * F.col("n"))
            + F.lit(1)
        )
        .select("id", "tok")
    )
    a, b = prefix.alias("a"), prefix.alias("b")
    return (
        a.join(
            b,
            (F.col("a.tok") == F.col("b.tok"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b")
        )
        .distinct()
    )


def similarity_join(
    df: DataFrame,
    threshold: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """EXACT all-pairs token-Jaccard join at ``threshold``: prefix-filter
    candidates (:func:`prefix_filter_candidates` — no false negatives
    by the prefix theorem) verified by true Jaccard
    (:func:`verified_pairs`). Unlike the MinHash/LSH pipeline this
    returns EVERY qualifying pair; unlike all-pairs it never compares
    documents sharing no rare token."""
    cand = prefix_filter_candidates(df, threshold, id_col, text_col)
    return verified_pairs(
        df, cand, threshold, id_col=id_col, text_col=text_col
    )
