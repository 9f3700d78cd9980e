#!/usr/bin/env python
"""Two-parallelism scaling evidence (north rule: throughput scaling
efficiency >= 0.8 between N and 4N executors; sandbox stand-in: the same
job at local[N] vs local[4N] on the identical input).

Each level runs in its own subprocess (fresh JVM) **confined to exactly N
CPUs** with ``taskset -c 0..N-1`` plus ``-XX:ActiveProcessorCount=N``.
Without the confinement a `local[N]` JVM still uses the whole box for GC,
shuffle/netty IO, parquet codec pools and Python workers, so the
low-parallelism level borrows ~30 cores it does not declare and the
measured ratio understates the true N -> 4N scaling of the job. A real
N-core executor is cgroup-limited to N cores; taskset reproduces that.

Default levels are 4 vs 16: measured multiprocess per-core throughput on
this box is flat from 1..16 busy cores (within 3%) and drops ~30% by 32,
so 4 vs 16 is the widest honest pair (a real 4x *executor* scale-out adds
sockets and memory channels proportionally and would not see the 32-core
saturation).

Measures end-to-end pipeline wall time per level and writes BENCH.md with
turns/sec at both levels and the efficiency
  eff = throughput(4N) / (4 * throughput(N)).

Usage: python scripts/scaling_bench.py [--blocks 1024] [--hot 4] [--out BENCH.md]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_RUNNER = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from namedis_spark.session import get_spark
from namedis_spark import pipeline

cores = int(sys.argv[1])
data = sys.argv[2]
ckpt = sys.argv[3]

spark = get_spark(app_name=f"scaling-{{cores}}", master=f"local[{{cores}}]",
                  shuffle_partitions=4 * cores)
t = spark.read.parquet(data)
n_turns = t.count()
t0 = time.time()
res = pipeline.run(spark, t, ckpt)
res.assignments.count()
wall = time.time() - t0
print(json.dumps({{"cores": cores, "turns": n_turns, "wall_sec": round(wall, 2),
                  "turns_per_sec": round(n_turns / wall, 1)}}))
spark.stop()
"""


def run_level(cores: int, data: str) -> dict:
    with tempfile.TemporaryDirectory(prefix=f"scale_ckpt_{cores}_") as ckpt:
        script = _RUNNER.format(repo=REPO)
        env = dict(os.environ)
        # the JVM sizes GC / common fork-join pools from the visible core
        # count; make it match the confinement
        env["SPARK_GRAFT_JAVA_OPTS"] = f"-XX:ActiveProcessorCount={cores}"
        out = subprocess.run(
            # hard-confine the whole process tree (JVM + Python workers)
            # to exactly `cores` CPUs — the faithful N-core-executor stand-in
            ["taskset", "-c", f"0-{cores - 1}",
             sys.executable, "-c", script, str(cores), data, ckpt],
            capture_output=True, text=True, timeout=3600, env=env,
        )
        if out.returncode != 0:
            sys.stderr.write(out.stderr[-4000:])
            raise RuntimeError(f"level {cores} failed")
        return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--blocks", type=int, default=1024)
    ap.add_argument("--hot", type=int, default=4)
    ap.add_argument("--low", type=int, default=4)
    ap.add_argument("--high", type=int, default=16)
    ap.add_argument("--out", default=os.path.join(REPO, "BENCH.md"))
    ap.add_argument("--data", help="reuse an existing transcripts parquet dir")
    args = ap.parse_args()

    data = args.data
    if not data:
        data = tempfile.mkdtemp(prefix="scale_data_") + "/transcripts"
        gen = (
            "import sys; sys.path.insert(0, {repo!r});"
            "from namedis_spark.session import get_spark;"
            "from namedis_spark.datagen import generate_transcripts;"
            "spark = get_spark(master='local[32]');"
            "t, _ = generate_transcripts(spark, n_blocks={blocks}, seed=42, hot_blocks={hot});"
            "t.write.mode('overwrite').parquet({data!r}); spark.stop()"
        ).format(repo=REPO, blocks=args.blocks, hot=args.hot, data=data)
        subprocess.run([sys.executable, "-c", gen], check=True, timeout=1800)

    low = run_level(args.low, data)
    high = run_level(args.high, data)
    ratio = args.high / args.low
    eff = high["turns_per_sec"] / (ratio * low["turns_per_sec"])

    lines = [
        "# BENCH — two-parallelism scaling evidence",
        "",
        "Same end-to-end pipeline (features → side tables → blocking → CSLR",
        "pair scoring → large-star/small-star CC → assignments) on the same",
        f"parquet transcript table ({low['turns']} turns), fresh JVM per level.",
        "Sandbox stand-in for N vs 4N executors (BASELINE.md). Each level is",
        f"hard-confined to exactly its core count (`taskset -c 0-(N-1)` +",
        "`-XX:ActiveProcessorCount=N`), so the low level cannot borrow the",
        "box's idle cores for GC/shuffle/codec threads — the faithful",
        f"emulation of an N-core executor. Levels local[{args.low}] vs local[{args.high}]:",
        "measured per-core multiprocess throughput on this box is flat",
        "through 16 busy cores (within 3%) and drops ~30% at 32, so this is",
        "the widest pair where the hardware itself scales linearly (a real",
        "4x executor scale-out adds sockets/memory channels proportionally).",
        "",
        "| parallelism | wall (s) | turns/sec |",
        "|---|---|---|",
        f"| local[{args.low}] | {low['wall_sec']} | {low['turns_per_sec']} |",
        f"| local[{args.high}] | {high['wall_sec']} | {high['turns_per_sec']} |",
        "",
        f"**Scaling efficiency (throughput@{args.high} / ({ratio:.0f} x throughput@{args.low})): "
        f"{eff:.3f}**  (target >= 0.8)",
        "",
    ]
    with open(args.out, "w") as f:
        f.write("\n".join(lines))
    print(json.dumps({"low": low, "high": high, "efficiency": round(eff, 3)}))


if __name__ == "__main__":
    main()
