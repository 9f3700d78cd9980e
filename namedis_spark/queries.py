"""Driver-contract query registry: Spark implementation + DuckDB oracle SQL
for every operator from SURVEY.md §2 that is SQL-expressible.

Each entry runs the *real* namedis_spark operator on a transcripts table
derived deterministically from the driver's `events` parquet (same
derivation in both engines), and pairs it with an independent ANSI-SQL
oracle for DuckDB. Column names and rounding (round 6 on doubles) match on
both sides — the driver hashes values after sorting columns by name.

Conventions:
* no map/timestamp output columns (ints, strings, rounded doubles only)
* counts cast to bigint on both sides (DuckDB sum() yields HUGEINT)
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from namedis_spark.functions.sqlexpr import (
    content_terms_expr,
    fingerprint_expr,
    lemma_case,
    norm_name_expr,
    stopword_list_sql,
    tokens_expr,
)

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def transcripts_sql(dialect: str) -> str:
    """Deterministic transcript derivation from `events` — identical
    semantics in Spark SQL and DuckDB SQL (input_hint shape)."""
    s = "string" if dialect == "spark" else "varchar"
    return f"""
        SELECT CAST(user_id AS {s}) AS conv_id,
               CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS int) AS turn_idx,
               event_type AS role,
               concat(event_type, ' v', CAST(CAST(floor(value / 10) AS int) AS {s}),
                      ' ', coalesce(props, '')) AS text,
               CASE WHEN event_id % 3 = 0 THEN event_type ELSE NULL END AS tool,
               ts
        FROM events
    """


def register_views(spark: SparkSession, sf_dir: str) -> None:
    for t in TABLES:
        spark.read.parquet(f"{sf_dir}/{t}.parquet").createOrReplaceTempView(t)


def load_transcripts(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(transcripts_sql("spark"))


def _features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from namedis_spark.operators.features import conversation_features

    return conversation_features(load_transcripts(spark, sf_dir))


_DUCK_TRANSCRIPTS = f"WITH transcripts AS ({transcripts_sql('duckdb')})"

# DuckDB per-conversation feature CTE used by several oracles: focus name,
# ordered full text, years, venue.
_DUCK_FEATURES = (
    _DUCK_TRANSCRIPTS
    + f""",
    base AS (
        SELECT conv_id,
               min(CASE WHEN turn_idx = 0 THEN {norm_name_expr('role', 'duckdb')} END) AS focus_name,
               string_agg(text, ' ' ORDER BY turn_idx) AS full_text,
               CAST(year(min(ts)) AS int) AS year_from,
               CAST(year(max(ts)) AS int) AS year_to,
               CAST(count(*) AS bigint) AS n_turns
        FROM transcripts GROUP BY conv_id
    ),
    venues AS (
        SELECT conv_id, tool AS venue,
               row_number() OVER (PARTITION BY conv_id ORDER BY count(*) DESC, tool ASC) AS rk
        FROM transcripts WHERE tool IS NOT NULL GROUP BY conv_id, tool
    ),
    roles AS (
        SELECT DISTINCT conv_id, {norm_name_expr('role', 'duckdb')} AS norm_role
        FROM transcripts
    ),
    feats AS (
        SELECT b.conv_id, b.focus_name, b.full_text, b.year_from, b.year_to, b.n_turns,
               coalesce(v.venue, 'UNKNOWN') AS venue,
               (SELECT count(*) FROM roles r
                 WHERE r.conv_id = b.conv_id AND r.norm_role <> b.focus_name) AS n_coauthors
        FROM base b LEFT JOIN (SELECT conv_id, venue FROM venues WHERE rk = 1) v
          ON b.conv_id = v.conv_id
    )
"""
)


@dataclass
class QuerySpec:
    spark_fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # None → rows-only check


REGISTRY: dict[str, QuerySpec] = {}


def q(name: str, oracle: str | None):
    def deco(fn):
        REGISTRY[name] = QuerySpec(spark_fn=fn, oracle=oracle)
        return fn

    return deco


# ---------------------------------------------------------------------------
# §2.1/2.4 scans + aggregations
# ---------------------------------------------------------------------------


@q(
    "count_by_year",
    "SELECT CAST(year(ts) AS int) AS year, CAST(count(*) AS bigint) AS n_events "
    "FROM events GROUP BY 1",
)
def count_by_year(spark, sf_dir):
    """count-by-year report (clean.pl:350,398-404)."""
    register_views(spark, sf_dir)
    return spark.sql(
        "SELECT CAST(year(ts) AS int) AS year, CAST(count(*) AS bigint) AS n_events "
        "FROM events GROUP BY 1"
    )


@q(
    "top_focus_names",
    _DUCK_TRANSCRIPTS
    + """
    SELECT focus AS focus_name, CAST(count(*) AS bigint) AS n_convs
    FROM (SELECT conv_id, min(CASE WHEN turn_idx = 0 THEN role END) AS focus
          FROM transcripts GROUP BY conv_id)
    GROUP BY 1 ORDER BY n_convs DESC, focus_name ASC LIMIT 100
    """,
)
def top_focus_names(spark, sf_dir):
    """count-by-name top-100 (clean.pl:352-418) over focus speakers."""
    t = load_transcripts(spark, sf_dir)
    return (
        t.groupBy("conv_id")
        .agg(F.min_by("role", "turn_idx").alias("focus_name"))
        .groupBy("focus_name")
        .agg(F.count(F.lit(1)).alias("n_convs"))
        .orderBy(F.desc("n_convs"), F.asc("focus_name"))
        .limit(100)
    )


@q(
    "normalize_name_keys",
    _DUCK_TRANSCRIPTS
    + f"""
    SELECT {norm_name_expr('role', 'duckdb')} AS norm_key,
           CAST(count(*) AS bigint) AS n_turns
    FROM transcripts GROUP BY 1
    """,
)
def normalize_name_keys(spark, sf_dir):
    """blocking-key normalizer (standardizeChineseName analog,
    NLPUtil.pm:1854-1876)."""
    t = load_transcripts(spark, sf_dir)
    return t.groupBy(
        F.expr(norm_name_expr("role", "spark")).alias("norm_key")
    ).agg(F.count(F.lit(1)).alias("n_turns"))


@q(
    "conversation_features",
    _DUCK_FEATURES
    + """
    SELECT conv_id, focus_name, venue, year_from, year_to, n_turns,
           CAST(n_coauthors AS bigint) AS n_coauthors
    FROM feats
    """,
)
def conversation_features_q(spark, sf_dir):
    """per-conversation feature row (SURVEY.md §1.4 mapping)."""
    f = _features(spark, sf_dir)
    return f.select(
        "conv_id",
        "focus_name",
        "venue",
        "year_from",
        "year_to",
        "n_turns",
        F.size("coauthors").cast("bigint").alias("n_coauthors"),
    )


@q(
    "term_frequencies",
    _DUCK_TRANSCRIPTS
    + f"""
    SELECT term, CAST(count(*) AS bigint) AS freq FROM (
        SELECT unnest({content_terms_expr('text', 'duckdb')}) AS term
        FROM transcripts
    ) GROUP BY 1
    """,
)
def term_frequencies(spark, sf_dir):
    """content-term frequency table (extractTitleGrams analog,
    NLPUtil.pm:2477-2506; stopword removal + lemma rules)."""
    t = load_transcripts(spark, sf_dir)
    return (
        t.select(F.explode(F.expr(content_terms_expr("text", "spark"))).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


@q(
    "bigram_frequencies",
    _DUCK_TRANSCRIPTS
    + f"""
    SELECT bigram, CAST(count(*) AS bigint) AS freq FROM (
        SELECT unnest(list_transform(
                   list_filter(range(1, len(toks)), i -> i < len(toks)),
                   i -> concat(toks[i], ' ', toks[i + 1]))) AS bigram
        FROM (SELECT {tokens_expr('text', 'duckdb')} AS toks FROM transcripts)
    ) GROUP BY 1
    """,
)
def bigram_frequencies(spark, sf_dir):
    """bigram extraction (extractTitleWords, NLPUtil.pm:2238-2295)."""
    t = load_transcripts(spark, sf_dir)
    toks = F.expr(tokens_expr("text", "spark"))
    # sequence() is inclusive and reverses when start > stop, so clamp and
    # re-filter for 0/1-token rows
    ts = tokens_expr("text", "spark")
    bigrams = F.expr(
        f"""transform(
                filter(sequence(1, greatest(size({ts}) - 1, 1)),
                       i -> i + 1 <= size({ts})),
                i -> concat(element_at({ts}, i), ' ', element_at({ts}, i + 1)))"""
    )
    return (
        t.select(F.explode(bigrams).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


@q(
    "coauthor_cooccurrence",
    _DUCK_TRANSCRIPTS
    + f"""
    , roles AS (
        SELECT DISTINCT conv_id, {norm_name_expr('role', 'duckdb')} AS name
        FROM transcripts
    )
    SELECT a.name AS name1, b.name AS name2, CAST(count(*) AS bigint) AS n_convs
    FROM roles a JOIN roles b ON a.conv_id = b.conv_id AND a.name < b.name
    GROUP BY 1, 2
    """,
)
def coauthor_cooccurrence(spark, sf_dir):
    """coauthor co-occurrence counts (arriveAuthorTuple,
    cnambig.pl:353-371)."""
    t = load_transcripts(spark, sf_dir)
    roles = t.select(
        "conv_id", F.expr(norm_name_expr("role", "spark")).alias("name")
    ).distinct()
    a, b = roles.alias("a"), roles.alias("b")
    return (
        a.join(b, "conv_id")
        .where(F.col("a.name") < F.col("b.name"))
        .groupBy(F.col("a.name").alias("name1"), F.col("b.name").alias("name2"))
        .agg(F.count(F.lit(1)).alias("n_convs"))
    )


# ---------------------------------------------------------------------------
# §2.5/2.6 joins + similarity
# ---------------------------------------------------------------------------

# role-frequency vectors + block assignment, shared by jaccard/flagship
_DUCK_RF = f"""
    rf AS (
        SELECT conv_id, {norm_name_expr('role', 'duckdb')} AS role,
               CAST(count(*) AS bigint) AS f
        FROM transcripts GROUP BY 1, 2
    ),
    tot AS (SELECT conv_id, sum(f) AS s FROM rf GROUP BY 1),
    blocks AS (
        SELECT conv_id,
               min(CASE WHEN turn_idx = 0 THEN {norm_name_expr('role', 'duckdb')} END) AS block_key
        FROM transcripts GROUP BY conv_id
    ),
    jacc AS (
        SELECT ba.block_key, a.conv_id AS conv_id1, b.conv_id AS conv_id2,
               round(sum(least(a.f, b.f))
                     / (any_value(ta.s) + any_value(tb.s) - sum(least(a.f, b.f))), 6)
                   AS jaccard
        FROM rf a
        JOIN rf b ON a.role = b.role AND a.conv_id < b.conv_id
        JOIN blocks ba ON ba.conv_id = a.conv_id
        JOIN blocks bb ON bb.conv_id = b.conv_id AND ba.block_key = bb.block_key
        JOIN tot ta ON ta.conv_id = a.conv_id
        JOIN tot tb ON tb.conv_id = b.conv_id
        GROUP BY 1, 2, 3
    )
"""


def _spark_jaccard_pairs(spark, sf_dir):
    t = load_transcripts(spark, sf_dir)
    rf = (
        t.groupBy("conv_id", F.expr(norm_name_expr("role", "spark")).alias("role"))
        .agg(F.count(F.lit(1)).alias("f"))
    )
    tot = rf.groupBy("conv_id").agg(F.sum("f").alias("s"))
    blocks = t.groupBy("conv_id").agg(
        F.min_by(F.expr(norm_name_expr("role", "spark")), "turn_idx").alias("block_key")
    )
    a = rf.select(F.col("conv_id").alias("conv_id1"), "role", F.col("f").alias("f1"))
    b = rf.select(F.col("conv_id").alias("conv_id2"), "role", F.col("f").alias("f2"))
    shared = (
        a.join(b, "role")
        .where(F.col("conv_id1") < F.col("conv_id2"))
        .groupBy("conv_id1", "conv_id2")
        .agg(F.sum(F.least("f1", "f2")).alias("inter"))
    )
    out = (
        shared.join(blocks.withColumnRenamed("conv_id", "conv_id1").withColumnRenamed("block_key", "bk1"), "conv_id1")
        .join(blocks.withColumnRenamed("conv_id", "conv_id2").withColumnRenamed("block_key", "bk2"), "conv_id2")
        .where(F.col("bk1") == F.col("bk2"))
        .join(tot.withColumnRenamed("conv_id", "conv_id1").withColumnRenamed("s", "s1"), "conv_id1")
        .join(tot.withColumnRenamed("conv_id", "conv_id2").withColumnRenamed("s", "s2"), "conv_id2")
        .select(
            F.col("bk1").alias("block_key"),
            "conv_id1",
            "conv_id2",
            F.round(
                F.col("inter") / (F.col("s1") + F.col("s2") - F.col("inter")), 6
            ).alias("jaccard"),
        )
    )
    return out


@q(
    "jaccard_pairs",
    _DUCK_TRANSCRIPTS + ", " + _DUCK_RF + " SELECT * FROM jacc",
)
def jaccard_pairs(spark, sf_dir):
    """weighted Jaccard over per-conversation role-frequency vectors within
    blocks (jaccard, NLPUtil.pm:3172-3252; freq mode) — JVM-side
    explode+join formulation: Σmin / (S1 + S2 − Σmin)."""
    return _spark_jaccard_pairs(spark, sf_dir)


_FLAGSHIP_THRESHOLD = 0.5

_DUCK_FLAGSHIP = (
    "WITH RECURSIVE transcripts AS ("
    + transcripts_sql("duckdb")
    + "), "
    + _DUCK_RF
    + f""",
    edges AS (
        SELECT conv_id1 AS src, conv_id2 AS dst FROM jacc
        WHERE jaccard >= {_FLAGSHIP_THRESHOLD}
    ),
    sym AS (SELECT src, dst FROM edges UNION SELECT dst, src FROM edges),
    reach(a, b) AS (
        SELECT src, dst FROM sym
        UNION
        SELECT r.a, e.dst FROM reach r JOIN sym e ON r.b = e.src
    ),
    comp AS (SELECT a AS node, least(a, min(b)) AS cluster_id FROM reach GROUP BY a)
    SELECT bl.block_key, bl.conv_id,
           coalesce(c.cluster_id, bl.conv_id) AS cluster_id
    FROM blocks bl LEFT JOIN comp c ON c.node = bl.conv_id
"""
)


@q("flagship_linkage", _DUCK_FLAGSHIP)
def flagship_linkage(spark, sf_dir):
    """Flagship: blocking → Jaccard pair scoring → large-star/small-star
    connected components → cluster assignments (the pipeline's shape on the
    driver's events-derived transcripts; oracle uses a recursive-CTE
    transitive closure)."""
    from namedis_spark.operators.cluster import connected_components

    jacc = _spark_jaccard_pairs(spark, sf_dir)
    edges = jacc.where(F.col("jaccard") >= _FLAGSHIP_THRESHOLD).select(
        F.col("conv_id1").alias("src"), F.col("conv_id2").alias("dst")
    )
    cc = connected_components(spark, edges)
    t = load_transcripts(spark, sf_dir)
    blocks = t.groupBy("conv_id").agg(
        F.min_by(F.expr(norm_name_expr("role", "spark")), "turn_idx").alias("block_key")
    )
    return blocks.join(cc, blocks["conv_id"] == cc["node"], "left").select(
        "block_key",
        "conv_id",
        F.coalesce(F.col("cluster_id"), F.col("conv_id")).alias("cluster_id"),
    )


@q(
    "cluster_sizes",
    _DUCK_FLAGSHIP.replace(
        """SELECT bl.block_key, bl.conv_id,
           coalesce(c.cluster_id, bl.conv_id) AS cluster_id
    FROM blocks bl LEFT JOIN comp c ON c.node = bl.conv_id""",
        """SELECT cluster_id, CAST(count(*) AS bigint) AS n_convs FROM (
           SELECT coalesce(c.cluster_id, bl.conv_id) AS cluster_id
           FROM blocks bl LEFT JOIN comp c ON c.node = bl.conv_id
       ) GROUP BY 1""",
    ),
)
def cluster_sizes(spark, sf_dir):
    """cluster-size report (saveClusters sort-by-size, clust.pl:675-725)."""
    return (
        flagship_linkage(spark, sf_dir)
        .groupBy("cluster_id")
        .agg(F.count(F.lit(1)).alias("n_convs"))
    )


@q(
    "pairwise_f1",
    _DUCK_FLAGSHIP.replace(
        """SELECT bl.block_key, bl.conv_id,
           coalesce(c.cluster_id, bl.conv_id) AS cluster_id
    FROM blocks bl LEFT JOIN comp c ON c.node = bl.conv_id""",
        f""", assign AS (
        SELECT bl.block_key, bl.conv_id,
               coalesce(c.cluster_id, bl.conv_id) AS cluster_id
        FROM blocks bl LEFT JOIN comp c ON c.node = bl.conv_id
    ),
    truth AS (
        SELECT conv_id,
               CAST(CAST(conv_id AS bigint) % 7 AS varchar) AS entity_id
        FROM blocks
    ),
    j AS (SELECT a.block_key, a.conv_id, a.cluster_id, t.entity_id
          FROM assign a JOIN truth t USING (conv_id)),
    pred AS (SELECT block_key, CAST(sum(n * (n - 1) / 2) AS double) AS pred_pairs
             FROM (SELECT block_key, cluster_id, count(*) AS n FROM j GROUP BY 1, 2)
             GROUP BY 1),
    tru AS (SELECT block_key, CAST(sum(n * (n - 1) / 2) AS double) AS truth_pairs
            FROM (SELECT block_key, entity_id, count(*) AS n FROM j GROUP BY 1, 2)
            GROUP BY 1),
    corr AS (SELECT block_key, CAST(sum(n * (n - 1) / 2) AS double) AS correct_pairs
             FROM (SELECT block_key, cluster_id, entity_id, count(*) AS n
                   FROM j GROUP BY 1, 2, 3) GROUP BY 1)
    SELECT p.block_key, p.pred_pairs, t.truth_pairs, c.correct_pairs,
           round(CASE WHEN p.pred_pairs > 0 THEN c.correct_pairs / p.pred_pairs ELSE 1 END, 6) AS precision,
           round(CASE WHEN t.truth_pairs > 0 THEN c.correct_pairs / t.truth_pairs ELSE 1 END, 6) AS recall,
           round(CASE WHEN (CASE WHEN p.pred_pairs > 0 THEN c.correct_pairs / p.pred_pairs ELSE 1 END)
                         + (CASE WHEN t.truth_pairs > 0 THEN c.correct_pairs / t.truth_pairs ELSE 1 END) > 0
                      THEN 2 * (CASE WHEN p.pred_pairs > 0 THEN c.correct_pairs / p.pred_pairs ELSE 1 END)
                             * (CASE WHEN t.truth_pairs > 0 THEN c.correct_pairs / t.truth_pairs ELSE 1 END)
                           / ((CASE WHEN p.pred_pairs > 0 THEN c.correct_pairs / p.pred_pairs ELSE 1 END)
                            + (CASE WHEN t.truth_pairs > 0 THEN c.correct_pairs / t.truth_pairs ELSE 1 END))
                      ELSE 0 END, 6) AS f1
    FROM pred p JOIN tru t USING (block_key) JOIN corr c USING (block_key)""",
    ),
)
def pairwise_f1_q(spark, sf_dir):
    """pairwise P/R/F1 evaluation (calcPerf, clust.pl:727-836) of the
    flagship clusters against a deterministic pseudo-truth partition."""
    from namedis_spark.operators.evaluate import pairwise_prf

    assign = flagship_linkage(spark, sf_dir)
    truth = assign.select(
        "block_key",
        "conv_id",
        (F.col("conv_id").cast("bigint") % 7).cast("string").alias("entity_id"),
    )
    return pairwise_prf(assign, truth.drop("block_key").join(
        assign.select("block_key", "conv_id"), "conv_id"
    ))


def entries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.spark_fn for name, spec in REGISTRY.items()}


def oracles() -> dict[str, str]:
    return {
        name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle is not None
    }
