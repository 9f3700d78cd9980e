"""Coauthor-sharing seed merge + collaborator clustering.

Batch-first re-expressions of the two reference routines that round 4
left intentionally unported:

* ``seedMergeSharingCoauthor`` (NLPUtil.pm:3943-4090) — greedy global
  fixpoint that pulls "ion" clusters (stage-1 clusters dissociated from
  any groundtruth seed) into seed clusters whenever they share >= 2
  coauthor names, one merge per iteration (the reference recomputes the
  global argmax after every merge because the absorbing seed's
  coauthor-name union grows). The reference resolves ties among candidate
  seeds by prompting a human on STDERR/STDIN (clust.pl:956 is a
  groundtruth-labeling aid, "seeds are to assist in building the ground
  truth file ... not used in the testing"); a batch engine cannot prompt,
  so this port resolves ties deterministically (lowest seed id) and marks
  every conversation whose merge went through a tie with
  ``ambiguous=true`` so a labeling UI can surface exactly the rows the
  reference would have asked about. The Perl picks the tie-ion via hash
  iteration order (``each %closestPairs`` — unordered in modern Perl),
  so any deterministic choice is within reference behavior.

* ``clusterAuthors`` (NLPUtil.pm:3714-3755) — partition a name list by
  the direct-collaborator relation. The reference's greedy
  absorb-and-rescan loop computes exactly the connected components of the
  collaborator graph restricted to the list (absorption is commutative
  and the outer scan revisits every surviving cluster), so the Spark
  re-expression is: restrict the row-local coauthor pair explode to the
  requested names and reuse the alternating large-star/small-star CC —
  no per-pair driver loop, order-independent, deterministic.

Scale shape: ``seed_merge_sharing_coauthor`` runs the greedy fixpoint
*per block* (the reference's scope is a single focus name's pubset) via
``applyInPandas`` — per-task state is bounded by block size exactly like
the pair-scoring stage, and blocks proceed in parallel.
``cluster_names_by_coauthorship`` builds its edge set with the same
join-free double explode as ``coauthor_stats`` and hands it to the
shared CC operator, so it inherits that operator's O(log n) round bound.
"""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F
import pyspark.sql.types as T
from pyspark.sql import DataFrame, SparkSession

__all__ = [
    "merge_sharing_coauthor_sets",
    "seed_merge_block",
    "seed_merge_sharing_coauthor",
    "cluster_names_by_coauthorship",
]


def _names_of(convs, conv_coauthors) -> set:
    out: set = set()
    for c in convs:
        out |= conv_coauthors.get(c, set())
    return out


def merge_sharing_coauthor_sets(clusters, conv_coauthors):
    """Pure-python fixpoint of ``mergeSharingCoauthor``
    (NLPUtil.pm:3904-3941): absorb cluster j into i when their coauthor
    NAME-SET UNIONS share >= 2 names, then rescan i (the Perl ``$i--;
    last;``) because the union may unlock further absorptions.

    This is deliberately NOT plain pairwise CC: two clusters sharing only
    one name each with an absorbed third can still end up merged once the
    absorber's union carries both names. ``clusters`` is an ordered list
    of (cluster_id, [conv_id, ...]); scan order follows list order (the
    reference follows input order — callers pass sorted ids for
    determinism). Returns the surviving list of (cluster_id, [convs]).
    """
    clusts = [(cid, list(convs)) for cid, convs in clusters]
    names = [_names_of(convs, conv_coauthors) for _, convs in clusts]
    alive = [True] * len(clusts)
    i = 0
    while i < len(clusts):
        if not alive[i]:
            i += 1
            continue
        absorbed = False
        for j in range(len(clusts)):
            if j == i or not alive[j]:
                continue
            if len(names[i] & names[j]) >= 2:
                clusts[i][1].extend(clusts[j][1])
                names[i] |= names[j]
                alive[j] = False
                absorbed = True
                break
        if not absorbed:
            i += 1
    return [clusts[k] for k in range(len(clusts)) if alive[k]]


def seed_merge_block(ions, seeds, conv_coauthors):
    """Pure-python core of ``seedMergeSharingCoauthor``
    (NLPUtil.pm:3943-4090) for one block.

    ``ions``/``seeds``: ordered lists of (cluster_id, [conv_id, ...]).
    Steps, mirroring the reference:

    1. Drop from every ion any conversation already present in a seed
       (:3956-3963).
    2. Greedy fixpoint: find the global max shared-coauthor count between
       any live ion's name-union and any seed's name-union; while that
       max > 1, merge ONE ion into its best seed and recompute (the
       absorbing seed's union grew, :3992-4058). Tie among argmax ions →
       lowest ion id (reference: hash order); tie among candidate seeds →
       lowest seed id, every conv of that ion flagged ambiguous
       (reference: interactive prompt, :4011-4039).
    3. Leftover ions run the plain union-fixpoint merge
       (``mergeSharingCoauthor``, :4066). NOTE: the reference call site
       as shipped passes arguments shifted against mergeSharingCoauthor's
       ($origClusters, $title_Coauthors, $context) signature and would
       die on $context->{focusName}; this step therefore implements the
       INTENDED semantics of that (broken) call, not observable reference
       behavior.

    Returns (assignment, n_merged) where assignment maps conv_id ->
    (cluster_label, is_seed, ambiguous); merged ions adopt their seed's
    label.
    """
    seed_convs = {c for _, convs in seeds for c in convs}
    live_ions = []
    for cid, convs in ions:
        kept = [c for c in convs if c not in seed_convs]
        if kept:
            live_ions.append((cid, kept))

    ion_names = {cid: _names_of(convs, conv_coauthors) for cid, convs in live_ions}
    seed_names = {cid: _names_of(convs, conv_coauthors) for cid, convs in seeds}
    seed_members = {cid: list(convs) for cid, convs in seeds}
    ion_members = dict(live_ions)
    ambiguous_convs: set = set()
    n_merged = 0

    while ion_members:
        best = 0
        best_ion = None
        best_seeds: list = []
        for icid in sorted(ion_members):
            for scid in sorted(seed_members):
                shared = len(ion_names[icid] & seed_names[scid])
                if shared > best:
                    best, best_ion, best_seeds = shared, icid, [scid]
                elif shared == best and icid == best_ion:
                    best_seeds.append(scid)
        if best <= 1:
            break
        chosen = min(best_seeds)
        if len(best_seeds) > 1:
            ambiguous_convs.update(ion_members[best_ion])
        n_merged += len(ion_members[best_ion])
        seed_members[chosen].extend(ion_members[best_ion])
        seed_names[chosen] |= ion_names[best_ion]
        del ion_members[best_ion], ion_names[best_ion]

    leftovers = merge_sharing_coauthor_sets(
        sorted(ion_members.items()), conv_coauthors
    )

    assignment = {}
    for cid, convs in seed_members.items():
        for c in convs:
            assignment[c] = (f"seed:{cid}", True, c in ambiguous_convs)
    for cid, convs in leftovers:
        for c in convs:
            assignment[c] = (f"ion:{cid}", False, False)
    return assignment, n_merged


_SEED_MERGE_SCHEMA = T.StructType(
    [
        T.StructField("block_key", T.StringType()),
        T.StructField("conv_id", T.StringType()),
        T.StructField("cluster_id", T.StringType()),
        T.StructField("is_seed", T.BooleanType()),
        T.StructField("ambiguous", T.BooleanType()),
    ]
)


def seed_merge_sharing_coauthor(
    features: DataFrame, ion_assign: DataFrame, seed_assign: DataFrame
) -> DataFrame:
    """Distributed ``seedMergeSharingCoauthor``: one greedy fixpoint per
    block (clust.pl:946-957 runs it per focus name).

    ``features``: conversation_features output (conv_id, block_key,
    coauthors, ...). ``ion_assign``: (conv_id, cluster_id) stage-1
    clusters. ``seed_assign``: (conv_id, seed_id) groundtruth seed
    membership. Conversations in neither table pass through as singleton
    ions (clust.pl:920-923 singleton init).

    Output: (block_key, conv_id, cluster_id, is_seed, ambiguous) —
    ``ambiguous`` marks rows the reference would have escalated to its
    interactive prompt.
    """
    base = (
        features.select("block_key", "conv_id", "coauthors")
        .join(ion_assign.select("conv_id", "cluster_id"), "conv_id", "left")
        .join(
            seed_assign.select("conv_id", F.col("seed_id").cast("string")),
            "conv_id",
            "left",
        )
        .withColumn("cluster_id", F.coalesce("cluster_id", "conv_id"))
    )

    def run_block(pdf: pd.DataFrame) -> pd.DataFrame:
        conv_co = {
            r.conv_id: (set(r.coauthors) if r.coauthors is not None else set())
            for r in pdf.itertuples(index=False)
        }
        seeds: dict = {}
        ions: dict = {}
        for r in pdf.itertuples(index=False):
            if r.seed_id is not None and not pd.isna(r.seed_id):
                seeds.setdefault(str(r.seed_id), []).append(r.conv_id)
            else:
                ions.setdefault(str(r.cluster_id), []).append(r.conv_id)
        assignment, _ = seed_merge_block(
            sorted(ions.items()), sorted(seeds.items()), conv_co
        )
        block = pdf["block_key"].iloc[0]
        rows = [
            (block, conv, label, is_seed, amb)
            for conv, (label, is_seed, amb) in assignment.items()
        ]
        return pd.DataFrame(rows, columns=[f.name for f in _SEED_MERGE_SCHEMA])

    return base.groupBy("block_key").applyInPandas(run_block, _SEED_MERGE_SCHEMA)


def cluster_names_by_coauthorship(
    spark: SparkSession, features: DataFrame, names
) -> DataFrame:
    """``clusterAuthors`` (NLPUtil.pm:3714-3755): partition ``names`` by
    the direct-collaborator relation = connected components of the
    coauthor-pair graph restricted to the list.

    Intentional fixpoint-completion deviation: the reference's greedy
    absorb loop (NLPUtil.pm:3727-3752) does NOT rescan after an
    absorption (no $i--/last, unlike mergeSharingCoauthor), so on some
    edge orders it under-merges — e.g. clusters [a],[b],[c],[d] with
    collab edges a-d, b-c, c-d end as {a,d},{b,c} there but form ONE
    component here. This port deliberately computes the complete
    connected-component partition (the fixpoint the greedy loop
    approximates); the Spark form is the shared large-star/small-star CC
    over a broadcast-restricted edge set: join-free double explode of each
    conversation's row-local author array (the same shape as
    ``coauthor_stats``), filtered to ``names`` before the distinct, one
    exchange total ahead of the CC rounds.

    ``names``: list[str] or a single-column DataFrame. Output:
    (name, cluster_name) where cluster_name is the component's
    lexicographic minimum — every requested name appears, collaborators
    share a cluster_name, isolated names are their own cluster.
    """
    # A python list is driver-bounded by construction → broadcast hint.
    # A DataFrame's size is unknown (could be a 10^8-name table at corpus
    # scale) → leave the strategy to Catalyst/AQE, which still picks a
    # broadcast when the side fits and a shuffle semijoin when it doesn't.
    if isinstance(names, DataFrame):
        name_df = names.toDF("name").distinct()
        hint = lambda df: df  # noqa: E731
    else:
        name_df = spark.createDataFrame([(n,) for n in names], "name string").distinct()
        hint = F.broadcast

    authors = F.array_union(F.array("focus_name"), "coauthors")
    pairs = (
        features.select(F.explode(authors).alias("src"), authors.alias("_a"))
        .select("src", F.explode("_a").alias("dst"))
        .where((F.col("src") < F.col("dst")) & (F.col("src") != ""))
    )
    restricted = (
        pairs.join(hint(name_df.select(F.col("name").alias("src"))), "src", "leftsemi")
        .join(hint(name_df.select(F.col("name").alias("dst"))), "dst", "leftsemi")
        .distinct()
    )

    from namedis_spark.operators.cluster import connected_components

    cc = connected_components(spark, restricted)
    return (
        name_df.join(cc, name_df.name == cc.node, "left")
        .select("name", F.coalesce("cluster_id", "name").alias("cluster_name"))
    )
