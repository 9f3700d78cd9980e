"""Round-6 optimization parity tests.

Each optimization that rewrote an operator's internals gets a focused
check that the fast path is value-identical to the reference form it
replaced (the slow forms are kept in the module as the documented
arithmetic reference)."""

from __future__ import annotations

import pytest

import pyspark.sql.functions as F


# ---------------------------------------------------------------------------
# similarity: literal-plane signatures vs the arithmetic expression form
# ---------------------------------------------------------------------------


def test_plane_coeff_matches_sql(spark):
    from namedis_spark.operators import similarity as S

    cells = []
    args = []
    for t in (0, 3, 11):
        for j in (0, 5, 11):
            for d in (0, 1, 63, 129):
                cells.append(S.plane_component("spark", str(t), str(j), str(d), 7))
                args.append((t, j, d))
    # the bare component is DECIMAL in SQL; in the signature expression it
    # is consumed in a double product — compare at that type
    row = spark.sql(
        "SELECT "
        + ", ".join(f"cast({c} as double) AS c{i}" for i, c in enumerate(cells))
    ).head()
    for i, (t, j, d) in enumerate(args):
        assert row[f"c{i}"] == S._plane_coeff(t, j, d, 7), (t, j, d)


def test_resolve_planes_matches_sql_expr(spark):
    from namedis_spark.operators import similarity as S

    counts = [2, 7, 8, 9, 15, 16, 17, 127, 128, 129, 1023, 1024, 1025, 10**6]
    sel = ", ".join(
        f"({S.adaptive_planes_expr(str(c))}) AS p{i}" for i, c in enumerate(counts)
    )
    row = spark.sql(f"SELECT {sel}").head()
    for i, c in enumerate(counts):
        assert row[f"p{i}"] == S._resolve_planes(spark, None, c), c


def test_table_buckets_matches_arithmetic_form(spark):
    from namedis_spark.operators import similarity as S

    emb = spark.createDataFrame(
        [(i, [((i * 37 + d * 11) % 19 - 9) / 3.0 for d in range(8)]) for i in range(40)],
        "vec_id long, embedding array<double>",
    )
    fast = S.table_buckets(emb, n_tables=4, n_planes=5)
    planes = "5"
    sigs = F.expr(
        f"transform(sequence(0, 3), t -> {S.sig_expr_spark('t', planes, S.HYPERPLANE_SEED)})"
    )
    ref = emb.select("vec_id", F.posexplode(sigs).alias("tbl", "bucket"))
    diff = (
        fast.alias("a")
        .join(ref.alias("b"), ["vec_id", "tbl"])
        .where("a.bucket <> b.bucket")
        .count()
    )
    assert diff == 0
    assert fast.count() == 160


# ---------------------------------------------------------------------------
# dedup: Arrow-batched shingling vs the SQL md5 chain
# ---------------------------------------------------------------------------


def test_python_shingles_match_sql_chain(spark):
    from namedis_spark.operators.dedup import _shingles_df
    from namedis_spark.functions.sqlexpr import tokens_expr

    rows = [
        (1, "The quick brown fox! Jumps over 42 lazy dogs."),
        (2, "ab"),  # shorter than one gram
        (3, ""),  # empty
        (4, None),  # null text
        (5, "aaaaaa"),  # heavy duplicate grams
        (6, "Ünïcode größe 文字 test"),  # non-ascii survives tokenization rules
        (7, "one two one two one"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    fast = {
        r["doc_id"]: r["shingles"]
        for r in _shingles_df(docs, "text").collect()
    }

    toks = tokens_expr("text", "spark")
    norm = docs.select(
        "doc_id", F.expr(f"array_join({toks}, ' ')").alias("_norm")
    )
    grams = (
        "transform(filter(sequence(1, greatest(length(_norm) - 2, 1)),"
        " i -> i + 2 <= length(_norm)), i -> substring(_norm, i, 3))"
    )
    ref = {
        r["doc_id"]: r["shingles"]
        for r in norm.select(
            "doc_id",
            F.expr(
                f"array_distinct(transform({grams},"
                f" g -> cast(conv(substring(md5(g), 1, 7), 16, 10) as bigint)))"
            ).alias("shingles"),
        ).collect()
    }
    assert fast == ref  # values AND first-occurrence order


# ---------------------------------------------------------------------------
# pipeline: over-bound ambiguity fallback must not collect block keys
# ---------------------------------------------------------------------------


def test_fallback_path_never_collects_block_keys(spark, tmp_path, monkeypatch):
    from pyspark.sql import DataFrame

    from namedis_spark import pipeline
    from namedis_spark.datagen import generate_transcripts
    from namedis_spark.operators import corpus

    # force the over-bound regime: the bounded pull declines
    monkeypatch.setattr(
        corpus, "key_ambiguity_pdf_bounded", lambda *a, **k: None
    )

    orig_collect = DataFrame.collect

    def spy(self):
        if [f.lower() for f in self.columns] == ["block_key"]:
            raise AssertionError(
                "fallback path collected the block-key table to the driver"
            )
        return orig_collect(self)

    monkeypatch.setattr(DataFrame, "collect", spy)

    t, _ = generate_transcripts(spark, n_blocks=3, seed=7, hot_blocks=0)
    res = pipeline.run(spark, t, str(tmp_path / "ckpt"))
    assert res.assignments.count() > 0


# ---------------------------------------------------------------------------
# taxonomy: driver-BFS fast path vs the distributed frontier-join loop
# ---------------------------------------------------------------------------


def test_closure_driver_path_matches_distributed(spark):
    from namedis_spark.operators.taxonomy import ancestor_closure

    edges = spark.createDataFrame(
        [
            ("a", "m1"), ("a", "m2"), ("b", "m1"), ("c", "m2"),
            ("m1", "top"), ("m2", "mid"), ("mid", "top"), ("top", "ROOT"),
            ("lonely", None),
        ],
        "term string, parent string",
    )
    extra = spark.createDataFrame([("orphan",)], "term string")
    s_fast: dict = {}
    s_slow: dict = {}
    fast = ancestor_closure(edges, extra_nodes=extra, stats=s_fast).collect()
    slow = ancestor_closure(
        edges, extra_nodes=extra, stats=s_slow, driver_edge_bound=0
    ).collect()
    assert s_fast.get("driver_path") is True
    assert "driver_path" not in s_slow
    key = lambda r: (r["term"], r["ancestor"], r["depth"])
    assert sorted(map(key, fast)) == sorted(map(key, slow))
    assert s_fast["rounds"] == s_slow["rounds"]


# ---------------------------------------------------------------------------
# cslr pair scoring: per-block enumeration vs distributed-join route
# ---------------------------------------------------------------------------


def test_cslr_block_routes_agree(spark, monkeypatch):
    """The size-routed pair scorer must produce the identical pair table
    whichever side of CSLR_BLOCK_ENUM_CAP a block lands on."""
    import namedis_spark.queries as Q

    sf = "/root/testdata/sf0.001"
    from namedis_spark.functions.core import cslr_v2_log

    small = _sorted(Q._cslr_scored_pairs(spark, sf, cslr_v2_log).collect())
    monkeypatch.setattr(Q, "CSLR_BLOCK_ENUM_CAP", 0)  # force the join route
    big = _sorted(Q._cslr_scored_pairs(spark, sf, cslr_v2_log).collect())
    assert small == big
    assert len(small) > 0


def _sorted(rows):
    return sorted(tuple(r) for r in rows)
