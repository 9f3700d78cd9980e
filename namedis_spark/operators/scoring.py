"""Batched pandas-UDF pairwise scoring (SURVEY.md §7 M3).

One Arrow-batched pandas UDF over the candidate-pair DataFrame computes, per
pair, every similarity channel of the reference plus the north-star's
string/vector terms:

* stage-1 coauthor merge predicates (probMergeSharingCoauthor,
  NLPUtil.pm:4173-4342; mergeSharingCoauthor, :3904-3941)
* CSLR v2 over coauthor and tool frequency vectors with tool expansion
  (isSameCategorical2, NLPUtil.pm:3486-3712; expandSimilarVenues,
  :3011-3102)
* Jaro-Winkler on raw focus-name surfaces, TF-IDF cosine over turn text,
  taxonomy category-overlap cosine with IC weights (north star)
* year-range discount (ConceptNet.pm:5442-5473), coauthor evidence
  error/boost (NLPUtil.pm:4096-4137; ConceptNet.pm:6309-6358)
* evidence gate: idf mass of shared terms vs log(ambiguity)
  (ICSum >= ICSumThres, NLPUtil.pm:3822-3825, ConceptNet.pm:5842)

Side tables travel as SparkContext broadcasts of plain dicts — small by
construction, exactly like the reference's in-memory hashes, but replicated
once per executor instead of loaded per process.
"""

from __future__ import annotations

import math
import re
from dataclasses import dataclass, field

import pandas as pd
import pyspark.sql.functions as F
import pyspark.sql.types as T
from pyspark.sql import DataFrame, SparkSession

from namedis_spark.functions.core import (
    coauthor_evidence_error,
    cslr_v2,
    evidence_thresholds,
    jaro_winkler,
    make_tool_expander,
    overestimate_ambig,
    shared_coauthor_boost,
    tfidf_cosine,
    weighted_jaccard,
    year_diff_discount,
    year_range_diff,
)

_TERM_CAT_RE = re.compile(r"^term(\d+)$")


def category_of(term: str) -> str | None:
    """Deterministic synthetic-taxonomy mapping (mirrors
    corpus.term_category): termXXXX → cat_{XXXX mod 40}."""
    m = _TERM_CAT_RE.match(term)
    if not m:
        return None
    return f"cat_{int(m.group(1)) % 40:02d}"


@dataclass
class ScoringParams:
    # stage-1 (clust.pl:11-12)
    error_tolerance: float = 0.05
    same_mn_odds_thres: float = 1.0
    plain_min_shared: int = 2  # mergeSharingCoauthor >= 2 shared
    # stage-2 combination weights (north-star channels)
    w_content: float = 0.5
    w_taxonomy: float = 0.3
    w_jw: float = 0.2
    venue_boost_floor: float = 0.6
    venue_boost_cap: float = 1.5
    coauthor_boost_cap: float = 2.0
    # evidence gate: shared idf mass must reach log(overestimated ambiguity)
    ic_gate_scale: float = 1.0
    threshold: float = 0.6


SCORE_SCHEMA = T.StructType(
    [
        T.StructField("stage1_mergeable", T.BooleanType(), False),
        T.StructField("stage1_reason", T.StringType(), True),
        T.StructField("cslr_coauthor", T.DoubleType(), False),
        T.StructField("cslr_tool", T.DoubleType(), False),
        T.StructField("jw", T.DoubleType(), False),
        T.StructField("content_cos", T.DoubleType(), False),
        T.StructField("taxonomy_cos", T.DoubleType(), False),
        T.StructField("year_discount", T.DoubleType(), False),
        T.StructField("coauthor_boost", T.DoubleType(), False),
        T.StructField("ic_sum", T.DoubleType(), False),
        T.StructField("gate_passed", T.BooleanType(), False),
        T.StructField("score", T.DoubleType(), False),
    ]
)


def _as_dict(x) -> dict:
    if x is None:
        return {}
    if isinstance(x, dict):
        return dict(x)
    return dict(x)


def _freq_map(names) -> dict[str, int]:
    d: dict[str, int] = {}
    if names is None:
        return d
    for n in names:
        d[n] = d.get(n, 0) + 1
    return d


def score_one_pair(
    f1: dict,
    f2: dict,
    *,
    ambig: dict[str, float],
    cn_counts: dict[str, float],
    ambig_sum_total: float,
    idf: dict[str, float],
    tool_simi_map: dict[str, list[tuple[str, float]]],
    cat_ic: dict[str, float],
    params: ScoringParams,
) -> dict:
    """Score a single conversation pair. Pure Python — unit-testable oracle;
    the pandas UDF below maps it over Arrow batches."""
    focus = f1["focus_name"]
    co1 = _freq_map(f1["coauthors"])
    co2 = _freq_map(f2["coauthors"])
    shared = [c for c in co1 if c in co2]

    is_ambiguous = focus in ambig

    # ---- stage 1: coauthor-evidence merge predicates -------------------
    mergeable = False
    reason = None
    if not is_ambiguous:
        # western focus name: >= 2 shared coauthors merge
        # (mergeSharingCoauthor, NLPUtil.pm:3904-3941)
        if len(shared) >= params.plain_min_shared:
            mergeable, reason = True, "shared>=2"
    elif shared:
        if len(shared) == len(co1) or len(shared) == len(co2):
            # subset rule (NLPUtil.pm:4231-4238)
            mergeable, reason = True, "subset"
        else:
            errors = {
                c: coauthor_evidence_error(focus, c, ambig, cn_counts, ambig_sum_total)
                for c in shared
            }
            if min(errors.values()) <= params.error_tolerance:
                mergeable, reason = True, "evidence-error"

    cslr_co = 0.0
    if not mergeable and is_ambiguous and shared:
        # CSLR odds on strong-evidence-filtered coauthor vectors
        # (NLPUtil.pm:4259-4297; filter :4207-4217)
        cnt_thres, amb_thres = evidence_thresholds(
            focus, params.error_tolerance, ambig, cn_counts, ambig_sum_total
        )

        def keep(c: str) -> bool:
            if c not in cn_counts:
                return True
            return cn_counts[c] <= cnt_thres and overestimate_ambig(c, ambig) <= amb_thres

        k1 = {c: f for c, f in co1.items() if keep(c)}
        k2 = {c: f for c, f in co2.items() if keep(c)}
        if len(k1) <= 2:
            k1 = co1
        if len(k2) <= 2:
            k2 = co2
        if len(k1) > 1 and len(k2) > 1:
            _, cslr_co = cslr_v2(k1, k2, min_odds=0.0, max_counted_freq=4)
            if cslr_co >= params.same_mn_odds_thres:
                mergeable, reason = True, "cslr-odds"
    elif shared:
        _, cslr_co = cslr_v2(co1, co2, min_odds=0.0, max_counted_freq=4)

    # ---- stage 2 channels ----------------------------------------------
    tools1 = _as_dict(f1.get("tool_freq")) or {f1["venue"]: 1}
    tools2 = _as_dict(f2.get("tool_freq")) or {f2["venue"]: 1}
    expander = make_tool_expander(tool_simi_map) if tool_simi_map else None
    _, cslr_tool_plain = cslr_v2(tools1, tools2, min_odds=0.0, max_counted_freq=4)
    cslr_tool = cslr_tool_plain
    if expander is not None:
        _, cslr_tool_exp = cslr_v2(
            tools1, tools2, outcome_expander=expander, min_odds=0.0, max_counted_freq=4
        )
        # venue boost = max(expanded, plain) (ConceptNet.pm:5888-5907)
        cslr_tool = max(cslr_tool_plain, cslr_tool_exp)

    jw = jaro_winkler(f1.get("focus_raw") or focus, f2.get("focus_raw") or focus)

    tf1 = _as_dict(f1["term_freq"])
    tf2 = _as_dict(f2["term_freq"])
    v1 = {t: f * idf.get(t, 0.0) for t, f in tf1.items()}
    v2 = {t: f * idf.get(t, 0.0) for t, f in tf2.items()}
    content = tfidf_cosine(v1, v2)

    # taxonomy category-overlap: IC-weighted cosine of category vectors
    def cat_vec(tf: dict[str, int]) -> dict[str, float]:
        cv: dict[str, float] = {}
        for t, f in tf.items():
            c = category_of(t)
            if c is not None:
                cv[c] = cv.get(c, 0.0) + f * cat_ic.get(c, 0.0)
        return cv

    taxonomy = tfidf_cosine(cat_vec(tf1), cat_vec(tf2))

    ydiff = year_range_diff(
        f1["year_from"], f1["year_to"], f2["year_from"], f2["year_to"]
    )
    ydisc = year_diff_discount(ydiff)

    boost = shared_coauthor_boost(focus, shared, ambig, cn_counts, ambig_sum_total)
    boost = min(boost, params.coauthor_boost_cap)

    ic_sum = sum(idf.get(t, 0.0) for t in tf1 if t in tf2)
    gate_thres = params.ic_gate_scale * math.log(max(overestimate_ambig(focus, ambig), math.e))
    gate = ic_sum >= gate_thres

    venue_boost = min(max(cslr_tool, params.venue_boost_floor), params.venue_boost_cap)
    base = params.w_content * content + params.w_taxonomy * taxonomy + params.w_jw * jw
    score = base * venue_boost * boost * ydisc if gate else 0.0

    return {
        "stage1_mergeable": bool(mergeable),
        "stage1_reason": reason,
        "cslr_coauthor": float(cslr_co),
        "cslr_tool": float(cslr_tool),
        "jw": float(jw),
        "content_cos": float(content),
        "taxonomy_cos": float(taxonomy),
        "year_discount": float(ydisc),
        "coauthor_boost": float(boost),
        "ic_sum": float(ic_sum),
        "gate_passed": bool(gate),
        "score": float(score),
    }


@dataclass
class SideTables:
    """Broadcastable side inputs for the scorer."""

    ambig: dict[str, float] = field(default_factory=dict)
    cn_counts: dict[str, float] = field(default_factory=dict)
    ambig_sum_total: float = 1.0
    idf: dict[str, float] = field(default_factory=dict)
    tool_simi_map: dict[str, list[tuple[str, float]]] = field(default_factory=dict)
    cat_ic: dict[str, float] = field(default_factory=dict)


def collect_side_tables(
    features: DataFrame,
    ambiguity: DataFrame | None = None,
    coauthor_counts: DataFrame | None = None,
    idf: DataFrame | None = None,
    tool_similarity: DataFrame | None = None,
    ic: DataFrame | None = None,
) -> SideTables:
    """Materialize the (small) corpus side tables into broadcast dicts."""
    st = SideTables()
    if ambiguity is not None:
        st.ambig = {r["name"]: float(r["ambig"]) for r in ambiguity.collect()}
        st.ambig_sum_total = max(1.0, sum(st.ambig.values()))
    if coauthor_counts is not None:
        st.cn_counts = {
            r["name"]: float(r["n_coauthors"]) for r in coauthor_counts.collect()
        }
    if idf is not None:
        st.idf = {r["term"]: float(r["idf"]) for r in idf.collect()}
    if tool_similarity is not None:
        m: dict[str, list[tuple[str, float]]] = {}
        for r in tool_similarity.collect():
            m.setdefault(r["tool1"], []).append((r["tool2"], float(r["linreg_simi"])))
        for v in m.values():
            v.sort(key=lambda kv: (-kv[1], kv[0]))
        st.tool_simi_map = m
    if ic is not None:
        st.cat_ic = {
            r["term"]: float(r["ic"]) for r in ic.collect() if r["term"].startswith("cat_")
        }
    return st


def score_pairs(
    spark: SparkSession,
    pairs_with_features: DataFrame,
    side: SideTables,
    params: ScoringParams | None = None,
) -> DataFrame:
    """Apply the scoring UDF to (block_key, conv_id1, conv_id2, f1, f2).

    Returns the pair table with all score components flattened in. The UDF
    is Arrow-batched (mapInPandas); side tables ride a SparkContext
    broadcast so each executor deserializes them once.
    """
    params = params or ScoringParams()
    bc = spark.sparkContext.broadcast(
        {
            "ambig": side.ambig,
            "cn_counts": side.cn_counts,
            "ambig_sum_total": side.ambig_sum_total,
            "idf": side.idf,
            "tool_simi_map": side.tool_simi_map,
            "cat_ic": side.cat_ic,
            "params": params,
        }
    )

    in_schema = pairs_with_features.schema
    out_schema = T.StructType(list(in_schema.fields) + list(SCORE_SCHEMA.fields))
    pass_cols = [f.name for f in in_schema.fields]

    def scorer(batches):
        sv = bc.value
        p: ScoringParams = sv["params"]
        kw = dict(
            ambig=sv["ambig"],
            cn_counts=sv["cn_counts"],
            ambig_sum_total=sv["ambig_sum_total"],
            idf=sv["idf"],
            tool_simi_map=sv["tool_simi_map"],
            cat_ic=sv["cat_ic"],
            params=p,
        )
        for pdf in batches:
            if len(pdf) == 0:
                continue
            results = [
                score_one_pair(f1, f2, **kw)
                for f1, f2 in zip(pdf["f1"], pdf["f2"])
            ]
            res = pd.DataFrame(results)
            out = pd.concat([pdf[pass_cols].reset_index(drop=True), res], axis=1)
            yield out

    return pairs_with_features.mapInPandas(scorer, schema=out_schema)


def edges_above_threshold(scored: DataFrame, params: ScoringParams | None = None) -> DataFrame:
    """Edge list for transitive closure: stage-1 mergeable OR stage-2 score
    above threshold (the gate filter is already inside the score)."""
    params = params or ScoringParams()
    return scored.where(
        F.col("stage1_mergeable") | (F.col("score") >= params.threshold)
    ).select("block_key", "conv_id1", "conv_id2")
