"""Structured-Streaming ingest: transcript file drops → incremental
per-conversation feature extraction, exactly-once via the stream
checkpoint (streaming/ingest.py)."""

from __future__ import annotations

from namedis_spark.datagen import generate_transcripts
from namedis_spark.operators.features import conversation_features
from namedis_spark.streaming.ingest import start_feature_ingest


def test_stream_matches_batch_features(spark, tmp_path):
    t, _ = generate_transcripts(spark, n_blocks=2, seed=11, hot_blocks=0)
    src = str(tmp_path / "drops")
    sink = str(tmp_path / "feats")
    ckpt = str(tmp_path / "ckpt")

    # two file drops (arriving "batches"); conversations arrive whole
    convs = t.select("conv_id").distinct()
    half = convs.sample(0.5, seed=1)
    t.join(half, "conv_id").write.mode("append").parquet(src)
    t.join(half, "conv_id", "left_anti").write.mode("append").parquet(src)

    q = start_feature_ingest(spark, src, sink, ckpt, available_now=True)
    q.awaitTermination(120)

    got = spark.read.parquet(sink)
    want = conversation_features(t)
    assert got.count() == want.count()
    # per-conv equality on scalar channels
    g = {r["conv_id"]: (r["focus_name"], r["n_turns"], r["year_from"]) for r in got.collect()}
    w = {r["conv_id"]: (r["focus_name"], r["n_turns"], r["year_from"]) for r in want.collect()}
    assert g == w

    # restart with the same checkpoint: no new batches → no duplicate rows
    q2 = start_feature_ingest(spark, src, sink, ckpt, available_now=True)
    q2.awaitTermination(120)
    assert spark.read.parquet(sink).count() == want.count()
