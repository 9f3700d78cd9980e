"""Deterministic synthetic transcript generator (FIXTURES.md §1).

Generates the ``transcripts`` table (conv_id, turn_idx, role, text, tool, ts)
plus the ``labels`` ground truth (block_key, conv_id, entity_id).

Distribution-friendly by construction: generation fans out over *block ids*
with ``mapInPandas``; each block is produced by its own ``RandomState(seed ^
block_id)``, so output is byte-deterministic regardless of partitioning or
parallelism level — the property the determinism invariant (FIXTURES.md §5.2)
and the two-parallelism scaling bench both rely on.

Shape mirrors the reference truth sets (2-50 entities per ambiguous key,
43-853 records per key; one hot 'wei wang'-like block to exercise skew
salting — current-truth-all/wei wang-labels.txt has 279 clusters/853 pubs).

Convention: the role of ``turn_idx == 0`` is the conversation's *focus
speaker* (≙ the ambiguous author name under disambiguation); its normalized
form is the blocking key.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
import pyspark.sql.types as T

TRANSCRIPT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), False),
        T.StructField("text", T.StringType(), False),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), False),
    ]
)

LABEL_SCHEMA = T.StructType(
    [
        T.StructField("block_key", T.StringType(), False),
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("entity_id", T.StringType(), False),
    ]
)

# Pinyin-flavored syllable pools for synthetic person names (the reference's
# ambiguity lives in Chinese names — pinyin.txt; we only need the *shape*).
_SURNAMES = [
    "wang", "li", "zhang", "liu", "chen", "yang", "huang", "zhao", "wu",
    "zhou", "xu", "sun", "ma", "zhu", "hu", "guo", "he", "lin", "gao", "luo",
]
_GIVENS = [
    "wei", "min", "jun", "ying", "jing", "lei", "qiang", "yan", "tao",
    "ming", "hua", "ping", "gang", "bo", "hui", "feng", "lin", "yu", "chao",
    "xin", "mei", "fang", "kai", "long", "peng",
]
_WESTERN = [
    "john smith", "maria garcia", "david miller", "anna schmidt",
    "james wilson", "sofia rossi", "peter novak", "emma dubois",
    "lucas brown", "sara cohen", "tom baker", "nina petrov",
]
_TOOLS = [f"tool_{i:02d}" for i in range(30)]

# Globally famous collaborators: appear across many entities/blocks, so
# their corpus-wide coauthor counts are large — exactly the weak-evidence
# shape the coauthor-evidence-error machinery exists to discount
# (NLPUtil.pm:4096-4137: high cnCoauthorCount ⇒ high error ⇒ no merge).
_FAMOUS = [f"famous star {chr(97 + i)}{chr(97 + i)}" for i in range(8)]

# Topic vocabulary: per-entity pools draw from this; plus shared background.
_TOPIC_VOCAB = [f"term{i:04d}" for i in range(2000)]
_BACKGROUND = [
    "please", "help", "need", "question", "thanks", "check", "result",
    "run", "look", "issue", "data", "file", "code", "error", "output",
]

_EPOCH_2018 = pd.Timestamp("2018-01-01").value // 10**9  # seconds

# The reference's hottest truth block, as a size histogram: 'wei wang'
# (current-truth-all/wei wang-labels.txt) has 279 clusters over 853 pubs —
# two ~100-pub giants, a handful of mid-size clusters and a long singleton
# tail. (size, count) pairs; Σ size·count = 853.
REF_CLUSTER_HIST: tuple[tuple[int, int], ...] = (
    (102, 1), (100, 1), (46, 1), (35, 1), (24, 1), (15, 1), (14, 1),
    (12, 2), (10, 1), (9, 1), (8, 1), (7, 2), (6, 5), (5, 11), (4, 12),
    (3, 19), (2, 44), (1, 174),
)


def ref_cluster_sizes() -> list[int]:
    """The 279 cluster sizes of the reference's 'wei wang' block,
    largest first (deterministic order)."""
    out: list[int] = []
    for size, cnt in REF_CLUSTER_HIST:
        out.extend([size] * cnt)
    return out


def _alpha(n: int) -> str:
    """Base-26 alphabetic encoding — survives the letters-only normalizer."""
    s = ""
    n = int(n)
    while True:
        s = chr(97 + n % 26) + s
        n //= 26
        if n == 0:
            return s


def _block_frames(
    seed: int, block_id: int, hot: bool, ref: bool = False
) -> tuple[pd.DataFrame, pd.DataFrame]:
    """Generate one block's transcripts + labels deterministically."""
    rng = np.random.RandomState((seed * 1_000_003 + block_id * 7919) % (2**31 - 1))

    # Ambiguous focus name for this block; surface variants exercise the
    # normalizer (reversed order ≙ isNameReverse, stray punctuation/case).
    # The (given, surname) grid has period lcm(25, 20) = 100, so beyond 100
    # blocks a per-cycle alphabetic suffix keeps block keys distinct —
    # otherwise growing the corpus silently merges generator blocks into
    # ever-bigger effective blocks and candidate pairs grow quadratically
    # with corpus size (real corpora grow the name vocabulary instead;
    # block-size distribution must be stationary for throughput-vs-size
    # comparisons to mean anything). Suffix is empty for block_id < 100, so
    # small fixtures are byte-identical to before.
    cycle = block_id // 100
    given = _GIVENS[block_id % len(_GIVENS)] + ("" if cycle == 0 else _alpha(cycle - 1))
    surname = _SURNAMES[(block_id * 7) % len(_SURNAMES)]
    focus_canonical = f"{given} {surname}"
    variants = [
        focus_canonical,
        f"{surname} {given}",           # reversed name order
        focus_canonical.title(),        # capitalization
        f"{given}-{surname}",           # punctuation
    ]
    block_key = " ".join(sorted(focus_canonical.split()))

    sizes: list[int] | None = None
    if ref:
        # replay the reference's 'wei wang' cluster-size distribution
        # exactly (279 clusters / 853 conversations, singleton-heavy tail
        # + two ~100-record giants) — the skew shape real truth data has
        sizes = ref_cluster_sizes()
        n_entities = len(sizes)
        convs_per_entity = None
    elif hot:
        n_entities = int(rng.randint(100, 140))
        convs_per_entity = (4, 12)
    else:
        n_entities = int(rng.randint(2, 31))
        convs_per_entity = (2, 9)

    t_rows: list[tuple] = []
    l_rows: list[tuple] = []
    for e in range(n_entities):
        entity_id = f"b{block_id:05d}e{e:04d}"
        n_collab = int(rng.randint(5, 12))
        # unique alphabetic suffix per collaborator: normalization keeps it
        collabs = [
            f"{_WESTERN[int(rng.randint(len(_WESTERN)))]} "
            f"{_alpha(block_id)}q{_alpha(e)}z{_alpha(k)}"
            for k in range(n_collab)
        ]
        # cross-entity noise: a famous collaborator shared with many other
        # entities across blocks
        if rng.rand() < 0.45:
            collabs.append(_FAMOUS[int(rng.randint(len(_FAMOUS)))])
        topic = [ _TOPIC_VOCAB[i] for i in rng.choice(len(_TOPIC_VOCAB), size=int(rng.randint(10, 21)), replace=False) ]
        tools = [_TOOLS[i] for i in rng.choice(len(_TOOLS), size=int(rng.randint(1, 4)), replace=False)]
        t0 = _EPOCH_2018 + int(rng.randint(0, 6 * 365)) * 86400
        span = int(rng.randint(180, 4 * 365)) * 86400

        n_convs = sizes[e] if sizes is not None else int(rng.randint(*convs_per_entity))
        for c in range(n_convs):
            conv_id = f"b{block_id:05d}-{e:04d}-{c:04d}"
            l_rows.append((block_key, conv_id, entity_id))
            n_turns = int(rng.randint(3, 16))
            conv_ts = t0 + int(rng.randint(0, max(1, span)))
            # participants of this conversation: 2-4 of the entity's
            # collaborators (sampled without replacement)
            k = min(len(collabs), int(rng.randint(2, 5)))
            participants = [collabs[i] for i in rng.choice(len(collabs), size=k, replace=False)]
            focus_surface = variants[int(rng.randint(len(variants)))]
            for t in range(n_turns):
                if t == 0:
                    role = focus_surface
                else:
                    role = participants[int(rng.randint(len(participants)))]
                n_words = int(rng.randint(5, 13))
                words = [
                    topic[int(rng.randint(len(topic)))] if rng.rand() < 0.6
                    else _BACKGROUND[int(rng.randint(len(_BACKGROUND)))]
                    for _ in range(n_words)
                ]
                text = " ".join(words)
                tool = tools[int(rng.randint(len(tools)))] if rng.rand() < 0.5 else None
                ts = pd.Timestamp(conv_ts + t * 60, unit="s")
                t_rows.append((conv_id, t, role, text, tool, ts))

    tdf = pd.DataFrame(t_rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"])
    tdf["turn_idx"] = tdf["turn_idx"].astype("int32")
    ldf = pd.DataFrame(l_rows, columns=["block_key", "conv_id", "entity_id"])
    return tdf, ldf


def generate_transcripts(
    spark: SparkSession,
    n_blocks: int = 20,
    seed: int = 42,
    hot_blocks: int = 1,
    ref_blocks: int = 0,
) -> tuple[DataFrame, DataFrame]:
    """Distributed deterministic generation: one task per block id.

    Returns (transcripts, labels) DataFrames. The first ``ref_blocks``
    blocks replay the reference's 'wei wang' cluster-size distribution
    exactly (279 clusters / 853 conversations); the next ``hot_blocks``
    are generic hot blocks (100+ entities, 800+ conversations) to
    exercise skew handling.
    """
    blocks = spark.range(n_blocks).withColumnRenamed("id", "block_id")

    def gen_t(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for b in pdf["block_id"].tolist():
                yield _block_frames(
                    seed, int(b), ref_blocks <= b < ref_blocks + hot_blocks,
                    b < ref_blocks,
                )[0]

    def gen_l(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for b in pdf["block_id"].tolist():
                yield _block_frames(
                    seed, int(b), ref_blocks <= b < ref_blocks + hot_blocks,
                    b < ref_blocks,
                )[1]

    # repartition so each task generates a handful of blocks (parallel, and
    # identical output no matter the parallelism level)
    nparts = max(1, min(n_blocks, spark.sparkContext.defaultParallelism))
    blocks = blocks.repartition(nparts, "block_id")
    transcripts = blocks.mapInPandas(gen_t, schema=TRANSCRIPT_SCHEMA)
    labels = blocks.mapInPandas(gen_l, schema=LABEL_SCHEMA)
    return transcripts, labels


def generate_local(n_blocks: int = 4, seed: int = 42, hot_blocks: int = 0) -> tuple[pd.DataFrame, pd.DataFrame]:
    """Driver-side pandas variant for unit tests (same per-block output)."""
    ts, ls = [], []
    for b in range(n_blocks):
        t, l = _block_frames(seed, b, b < hot_blocks)
        ts.append(t)
        ls.append(l)
    return pd.concat(ts, ignore_index=True), pd.concat(ls, ignore_index=True)
