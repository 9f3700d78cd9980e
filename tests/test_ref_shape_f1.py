"""Reference-shaped truth fixture: the pipeline must hold F1 >= 0.99 on a
block replaying the reference's hottest labeled block exactly — 'wei wang'
(current-truth-all/wei wang-labels.txt): 279 clusters / 853 records, two
~100-record giants and a 174-singleton tail. Per-block F1 is reported as a
table so regressions name the block they broke."""

from __future__ import annotations

import pytest

from namedis_spark import pipeline
from namedis_spark.datagen import generate_transcripts, ref_cluster_sizes


def test_ref_hist_sums_to_wei_wang():
    sizes = ref_cluster_sizes()
    assert len(sizes) == 279
    assert sum(sizes) == 853
    assert sizes[0] == 102 and sizes.count(1) == 174


def test_pipeline_f1_on_reference_shaped_block(spark, tmp_path_factory):
    t, l = generate_transcripts(
        spark, n_blocks=4, seed=42, hot_blocks=0, ref_blocks=1
    )
    t.cache().count()
    l.cache().count()
    ckpt = str(tmp_path_factory.mktemp("ref_ckpt"))
    res = pipeline.run(spark, t, ckpt, labels=l)

    from namedis_spark.operators.evaluate import pairwise_prf

    per_block = {
        r["block_key"]: r
        for r in pairwise_prf(res.assignments, l).collect()
    }
    # the ref block is block 0 → focus 'wei wang' → key 'wang wei'
    table = "\n".join(
        f"  {k:<16} P={v['precision']:.4f} R={v['recall']:.4f} F1={v['f1']:.4f}"
        for k, v in sorted(per_block.items())
    )
    print(f"\nper-block F1 on reference-shaped fixture:\n{table}")
    hot = per_block["wang wei"]
    assert hot["f1"] >= 0.99, dict(hot.asDict())
    for k, v in per_block.items():
        assert v["f1"] >= 0.97, (k, dict(v.asDict()))
