"""End-to-end parity gate: pairwise F1 >= 0.99 on the labeled fixture at
identical blocking keys (BASELINE.json metric), plus resume equality."""

from __future__ import annotations

import shutil

import pytest

from namedis_spark import pipeline
from namedis_spark.datagen import generate_transcripts


@pytest.fixture(scope="module")
def fixture_data(spark):
    t, l = generate_transcripts(spark, n_blocks=4, seed=42, hot_blocks=0)
    t.cache().count()
    l.cache().count()
    return t, l


def test_pipeline_f1_above_099(spark, fixture_data, tmp_path_factory):
    t, l = fixture_data
    ckpt = str(tmp_path_factory.mktemp("ckpt"))
    res = pipeline.run(spark, t, ckpt, labels=l)
    m = res.metrics
    assert m["macro_f1"] >= 0.99, m
    assert m["micro_f1"] >= 0.99, m
    assert m["macro_p"] >= 0.99, m


def test_pipeline_resume_identical_assignments(spark, fixture_data, tmp_path_factory):
    """Re-entering the pipeline from checkpoints yields byte-identical
    final clusters (FIXTURES.md §5.4)."""
    t, l = fixture_data
    ckpt = str(tmp_path_factory.mktemp("ckpt_resume"))
    first = pipeline.run(spark, t, ckpt, labels=None)
    a1 = sorted(map(tuple, first.assignments.collect()))

    # wipe the final assignment snapshot and resume: features/scored/cc
    # rounds are reused, result must be identical
    shutil.rmtree(f"{ckpt}/assignments", ignore_errors=True)
    second = pipeline.run(spark, t, ckpt, labels=None, resume=True)
    a2 = sorted(map(tuple, second.assignments.collect()))
    assert a1 == a2


def test_pipeline_determinism_two_runs(spark, fixture_data, tmp_path_factory):
    t, _ = fixture_data
    r1 = pipeline.run(spark, t, str(tmp_path_factory.mktemp("d1")))
    r2 = pipeline.run(spark, t, str(tmp_path_factory.mktemp("d2")))
    assert sorted(map(tuple, r1.assignments.collect())) == sorted(
        map(tuple, r2.assignments.collect())
    )
