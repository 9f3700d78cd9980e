#!/usr/bin/env python
"""Benchmark harness (driver contract).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Also reports pipeline throughput (turns/sec) on a synthetic transcript
table sized to the bench tier; the two-parallelism scaling evidence lives
in scripts/scaling_bench.py → BENCH.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

# headline queries: the flagship linkage + the heavy operator families
HEADLINE = [
    "conversation_features",
    "tfiaf_weights",
    "cslr_role_pairs",
    "tfidf_cosine_pairs",
    "jaccard_pairs",
    "flagship_linkage",
    "term_frequencies",
    "tool_similarity",
    "simhash_fingerprints",
    "dedup_exact",
    "minhash_signatures",
    # round-2 scale paths: LSH banding with bucket caps, candidates-path
    # ngram verify, multi-table hyperplane dedup/top-k, DAG taxonomy IC
    "minhash_lsh_candidates",
    "ngram_jaccard_dups",
    "embedding_cosine_dups",
    # all three ANN variants (brute / LSH / IVF) ride one tagged union
    "ann_topk",
    "term_ic",
]


def main() -> None:
    from namedis_spark.queries import REGISTRY
    from namedis_spark.session import get_spark

    spark = get_spark(
        app_name="namedis-bench",
        master=f"local[{CPUS}]",
        shuffle_partitions=2 * CPUS,
    )
    sf = SF_DIR.rstrip("/").split("sf")[-1]

    timings: dict[str, float] = {}
    total = 0.0
    for name in HEADLINE:
        fn = REGISTRY[name].spark_fn
        t0 = time.time()
        df = fn(spark, SF_DIR)
        n = df.count()
        dt = round(time.time() - t0, 3)
        timings[name] = dt
        total += dt
        print(f"# {name}: {n} rows in {dt}s", file=sys.stderr)

    # taxonomy machinery at reference scale (~113k-node DAG, csmathling.txt
    # shape): closure → attenuation → IC pass-up → depth-gated LCS
    from namedis_spark.operators.taxonomy import (
        ancestor_closure,
        large_dag_edges,
        large_dag_term_freqs,
        lcs_closeness,
        with_attenuation,
    )

    t0 = time.time()
    tax_edges = large_dag_edges(spark)
    tax_tf = large_dag_term_freqs(spark)
    tax_catt = with_attenuation(ancestor_closure(tax_edges)).persist()
    n_lcs = lcs_closeness(tax_tf, tax_catt).count()
    tax_catt.unpersist()
    dt = round(time.time() - t0, 3)
    timings["taxonomy_100k"] = dt
    total += dt
    print(f"# taxonomy_100k: {n_lcs} LCS pairs in {dt}s", file=sys.stderr)

    # pipeline throughput on the synthetic transcript tier
    from namedis_spark import pipeline
    from namedis_spark.datagen import generate_transcripts

    import shutil
    import tempfile

    ckpt = tempfile.mkdtemp(prefix="bench_ckpt_")
    t, _ = generate_transcripts(spark, n_blocks=24, seed=42, hot_blocks=1)
    t.cache()
    n_turns = t.count()
    t0 = time.time()
    res = pipeline.run(spark, t, ckpt)
    res.assignments.count()
    pipe_dt = round(time.time() - t0, 3)
    timings["pipeline_e2e"] = pipe_dt
    total += pipe_dt
    turns_per_sec = round(n_turns / pipe_dt, 1)
    shutil.rmtree(ckpt, ignore_errors=True)

    # streaming incremental linkage (applyInPandasWithState keyed on the
    # blocking key): features written as parquet drops, consumed in
    # micro-batches (maxFilesPerTrigger=4), stateful per-block assignment
    import pyspark.sql.functions as F

    from namedis_spark.operators.features import conversation_features
    from namedis_spark.streaming.linkage import start_incremental_linkage

    sdir = tempfile.mkdtemp(prefix="bench_stream_")
    src, sink, sckpt = f"{sdir}/src", f"{sdir}/sink", f"{sdir}/ckpt"
    feats = conversation_features(t)
    feats.repartition(16).write.parquet(src)
    t0 = time.time()
    q = start_incremental_linkage(spark, src, sink, sckpt, available_now=True)
    q.awaitTermination()
    dt = round(time.time() - t0, 3)
    timings["streaming_linkage"] = dt
    total += dt
    out = spark.read.parquet(sink)
    n_assigned = out.count()
    st = (
        out.groupBy("block_key")
        .agg(F.countDistinct("cluster_id").alias("c"))
        .agg(F.max("c").alias("mx"), F.round(F.avg("c"), 1).alias("mean"))
        .collect()[0]
    )
    print(
        f"# streaming_linkage: {n_assigned} convs in {dt}s"
        f" ({n_assigned / dt:.0f} convs/s; clusters/block"
        f" max {st['mx']} mean {st['mean']})",
        file=sys.stderr,
    )
    shutil.rmtree(sdir, ignore_errors=True)

    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": round(total, 3),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf),
                "pipeline_turns": n_turns,
                "pipeline_turns_per_sec": turns_per_sec,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
