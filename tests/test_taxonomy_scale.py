"""Reference-scale taxonomy exercise (~113k nodes — csmathling.txt is
~100k terms; /root/reference/wikipedia/csmathling.txt:1-15 schema).

Checks the things only scale reveals: closure round count equals DAG
height (frontier convergence), closure/LCS cardinalities match an
independent DuckDB recursive-CTE replay, the pass-up mass invariant
(root accumulates the exact corpus mass — every shortest-root-path
attenuation is 1), and LCS gate selectivity (the depth-sum<=3 gate keeps
pairs to the shared-mid cone, orders of magnitude under all-pairs)."""

from __future__ import annotations

import duckdb
import pyspark.sql.functions as F
import pytest

from namedis_spark.operators.taxonomy import (
    ROOT,
    ancestor_closure,
    large_dag_edges,
    large_dag_term_freqs,
    lcs_closeness,
    term_ic_dag,
    with_attenuation,
)

N_TERMS = 100_000


@pytest.fixture(scope="module")
def dag(spark):
    edges = large_dag_edges(spark, n_terms=N_TERMS)
    tf = large_dag_term_freqs(spark, n_terms=N_TERMS)
    stats: dict = {}
    closure = ancestor_closure(edges, stats=stats)
    catt = with_attenuation(closure).persist()
    catt.count()
    yield edges, tf, stats, catt
    catt.unpersist()


def test_closure_rounds_equal_height(dag):
    _, _, stats, _ = dag
    # term → mid → subcat → cat → supercat → ROOT
    assert stats["rounds"] == 5


def test_closure_matches_duckdb_recursive_cte(dag):
    edges, _, _, catt = dag
    con = duckdb.connect()
    con.register("edges", edges.toPandas())
    got = con.sql(
        """
        WITH RECURSIVE nodes AS (
            SELECT term AS n FROM edges UNION SELECT parent FROM edges
        ),
        paths(term, ancestor, depth) AS (
            SELECT n, n, 0 FROM nodes
            UNION
            SELECT p.term, e.parent, p.depth + 1
            FROM paths p JOIN edges e ON p.ancestor = e.term
        )
        SELECT count(*) AS n_rows, sum(md) AS depth_mass FROM (
            SELECT term, ancestor, min(depth) AS md FROM paths GROUP BY 1, 2
        )
        """
    ).fetchone()
    spark_rows = catt.count()
    spark_mass = catt.agg(F.sum("depth")).collect()[0][0]
    assert spark_rows == got[0]
    assert spark_mass == got[1]


def test_passup_root_mass_invariant(dag):
    _, tf, _, catt = dag
    ics = term_ic_dag(tf, catt)
    root_freq = ics.where(F.col("term") == ROOT).collect()[0]["freq"]
    # ROOT lies on every shortest root path → atten 1 → exact corpus mass
    total = tf.agg(F.sum("freq")).collect()[0][0]
    assert root_freq == pytest.approx(total, abs=1e-3)
    # IC of the root is 0 (it IS the max-frequency node)
    root_ic = ics.where(F.col("term") == ROOT).collect()[0]["ic"]
    assert root_ic == 0.0


def test_lcs_gate_selectivity(dag):
    _, tf, _, catt = dag
    pairs = lcs_closeness(tf, catt).persist()
    n = pairs.count()
    # all surviving pairs meet the gate
    assert pairs.where(F.col("depth_sum") > 3).count() == 0
    # leaves sit at uniform rootdepth 5, so the only gate-passing LCS is a
    # shared mid (1+1); the pair count equals the shared-mid cone —
    # orders of magnitude below all-pairs C(100k, 2) ≈ 5e9
    assert 0 < n < 2_000_000
    mids = pairs.select("lcs").distinct().collect()
    assert all(r["lcs"].startswith("m") for r in mids)
    pairs.unpersist()
