"""Similarity search over embedding columns (training-data-pipeline op).

* brute-force cosine top-k — correctness baseline; JVM-side zip_with dot
  products, window top-k.
* LSH-bucketed ANN — the scale path: random-hyperplane signatures bucket
  vectors; only same-bucket pairs are scored. At 10^9 vectors the bucket
  join replaces the O(n²) cross join; recall is tunable via n_planes /
  n_tables.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def _as_double(col: str = "embedding"):
    return F.expr(f"transform({col}, x -> cast(x as double))")


def brute_force_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
) -> DataFrame:
    """Exact cosine top-k of `queries` (vec_id, embedding) against the
    corpus. Ties broken by vec_id for determinism."""
    corpus = embeddings.select(
        F.col("vec_id").alias("cand_id"), _as_double().alias("e2")
    ).withColumn("n2", F.expr("sqrt(aggregate(e2, 0d, (acc, x) -> acc + x * x))"))
    qs = queries.select(
        F.col("vec_id").alias("query_id"), _as_double().alias("e1")
    ).withColumn("n1", F.expr("sqrt(aggregate(e1, 0d, (acc, x) -> acc + x * x))"))

    scored = (
        qs.crossJoin(F.broadcast(corpus) if corpus is not qs else corpus)
        .where(F.col("query_id") != F.col("cand_id"))
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
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("cand_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("int"))
        .where(F.col("rk") <= k)
        .select("query_id", "cand_id", "cosine", "rk")
    )


def hyperplane_buckets(
    embeddings: DataFrame, n_planes: int = 8, seed: int = 7, dim: int | None = None
) -> DataFrame:
    """Random-hyperplane LSH: sign pattern of <v, r_j> over n_planes
    deterministic pseudo-random planes → bucket id. Planes are generated
    from a hash of (plane, dim index) so executors need no broadcast."""
    # plane component r[j][d] = ((j * 10007 + d * 379 + seed) % 2001 - 1000) / 1000
    sig = F.expr(
        f"""aggregate(
                sequence(0, {n_planes - 1}),
                cast(0 as bigint),
                (acc, j) -> acc * 2 + if(
                    aggregate(
                        zip_with(transform(embedding, x -> cast(x as double)),
                                 sequence(0, size(embedding) - 1),
                                 (x, d) -> x * (((j * 10007 + d * 379 + {seed}) % 2001) - 1000) / 1000.0),
                        0d, (a, x) -> a + x) >= 0, 1, 0))"""
    )
    return embeddings.select("vec_id", "embedding", sig.alias("bucket"))


def lsh_ann_pairs(embeddings: DataFrame, n_planes: int = 8, min_cosine: float = 0.8) -> DataFrame:
    """ANN near-neighbor pairs: bucket join + exact cosine verification of
    same-bucket pairs only."""
    b = hyperplane_buckets(embeddings, n_planes)
    withd = b.withColumn("e", _as_double()).withColumn(
        "nrm", F.expr("sqrt(aggregate(e, 0d, (acc, x) -> acc + x * x))")
    )
    a = withd.select("bucket", F.col("vec_id").alias("vec_id1"), F.col("e").alias("e1"), F.col("nrm").alias("n1"))
    c = withd.select("bucket", F.col("vec_id").alias("vec_id2"), F.col("e").alias("e2"), F.col("nrm").alias("n2"))
    return (
        a.join(c, "bucket")
        .where(F.col("vec_id1") < F.col("vec_id2"))
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
        .where(F.col("cosine") >= min_cosine)
        .select("vec_id1", "vec_id2", "cosine")
        .distinct()
    )
