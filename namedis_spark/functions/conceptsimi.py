"""Concept-vector shared-term precision guards (calcConceptVectorSimi).

Pure-Python ports of the reference's shared-term machinery, operating on
reference-shaped per-cluster concept vectors::

    cv[concept] = {"w": weight, "lemmas": [[lemma, ...], ...],
                   "tokens": [(title_sn, [token_sn, ...]), ...]}

(the per-cluster vector layout of ``titleSetToVector``,
ConceptNet.pm:6209-6219: per concept, the matched lemma sequences and the
(title, token-position) spans the concept was matched on).

* ``shared_term_simi`` — the per-shared-concept similarity term with the
  exact-lemma-match override (ConceptNet.pm:5946-5988): the discount is
  w1·w2·BOOST, but when the two sides matched the concept via an
  identical lemma sequence the discount is at least min(w1, w2) —
  a surface-exact match is full-strength evidence even when both weights
  are small.
* ``remove_overlap_terms`` — token-overlap dedup (``removeOverlapTerms``
  ConceptNet.pm:5698-5786): two shared concepts matched on overlapping
  token spans must not both count (a span like "support vector machine"
  matching both "support vector machine" and "vector machine" is ONE
  piece of evidence). Terms claim their token spans in order; a term
  steals spans from already-counted conflicting terms only if its IC is
  higher (or equal IC and higher similarity); terms left holding no
  claim are dropped. Deviation (documented): the reference updates BOTH
  sides' marks into side 1's mark table (ConceptNet.pm:5779-5780 passes
  ``titlesTokensMark1`` twice — an apparent transcription slip); this
  port keeps the two sides' mark tables separate as the surrounding code
  intends.

These are worker-side helpers (pure, no Spark): per-cluster vectors are
top-N-pruned (≤100 dims, ConceptNet.pm:69-71), so the guards run inside
the pair-scoring pandas UDF in O(dims) per pair.
"""

from __future__ import annotations

IC_OFFSET = 3.5  # setICOffset (clust.pl:277)
BOOST_SHARED_TERMS_WEIGHT = 3.0  # ConceptNet.pm:5812


def _trunc(ndigits: int, x: float) -> float:
    """Reference `trunc` (NLPUtil.pm:939): truncation toward zero, not
    rounding."""
    scale = 10**ndigits
    return int(x * scale) / scale


def lemma_sequences_intersect(lemmas1, lemmas2) -> bool:
    """intersectArrayOfArray (NLPUtil.pm:2708-2730): join on the
    serialized lemma sequence."""
    s1 = {tuple(seq) for seq in (lemmas1 or [])}
    return any(tuple(seq) in s1 for seq in (lemmas2 or []))


def shared_term_simi(
    ic: float,
    w1: float,
    w2: float,
    lemmas1=None,
    lemmas2=None,
    year_discount: float = 1.0,
    ic_offset: float = IC_OFFSET,
    boost: float = BOOST_SHARED_TERMS_WEIGHT,
) -> float:
    """Per-shared-concept similarity (ConceptNet.pm:5946-5988):
    max(IC − ICOffset, 0) × matchDiscount × yearDiffDiscount, truncated
    to 4 decimals (reference trunc(4, ·)); matchDiscount = w1·w2·boost,
    raised to min(w1, w2) on an exact lemma-sequence match."""
    double_discount = w1 * w2 * boost
    if lemma_sequences_intersect(lemmas1, lemmas2):
        match_discount = max(min(w1, w2), double_discount)
    else:
        match_discount = double_discount
    simi = max(ic - ic_offset, 0.0) * match_discount * year_discount
    return _trunc(4, simi)


def remove_overlap_terms(
    shared_terms: list[tuple],
    cv1: dict,
    cv2: dict,
) -> list[tuple]:
    """Token-overlap dedup (removeOverlapTerms, ConceptNet.pm:5698-5786).

    ``shared_terms``: list of (concept, shared_term_simi, year_diff, ic)
    tuples, as accumulated by the shared-concept loop. Returns the tuples
    that survive span ownership."""
    marks1: dict[tuple[int, int], tuple] = {}  # (title_sn, token_sn) → tuple
    marks2: dict[tuple[int, int], tuple] = {}
    counted: dict = {}

    def spans(cv: dict, concept) -> list[tuple[int, int]]:
        out = []
        for title_sn, token_list in (cv.get(concept, {}).get("tokens") or []):
            for token_sn in token_list:
                out.append((title_sn, token_sn))
        return out

    for tup in shared_terms:
        concept, simi, _year_diff, ic = tup
        sp1 = spans(cv1, concept)
        sp2 = spans(cv2, concept)
        conflicts: dict = {}
        for key in sp1:
            old = marks1.get(key)
            if old is not None and counted.get(old[0]):
                conflicts[old[0]] = old
        for key in sp2:
            old = marks2.get(key)
            if old is not None and counted.get(old[0]):
                conflicts[old[0]] = old
        conflict_ic = sum(c[3] for c in conflicts.values())
        conflict_simi = sum(c[1] for c in conflicts.values())
        if conflict_ic < ic or (conflict_ic == ic and conflict_simi < simi):
            for key in sp1:
                old = marks1.get(key)
                if old is not None:
                    counted[old[0]] = False
                marks1[key] = tup
            for key in sp2:
                old = marks2.get(key)
                if old is not None:
                    counted[old[0]] = False
                marks2[key] = tup
            counted[concept] = True

    return [t for t in shared_terms if counted.get(t[0])]


# ---------------------------------------------------------------------------
# Full combined cluster similarity (calcConceptVectorSimi,
# ConceptNet.pm:5815-6150) — taxonomy mode, every channel and guard:
# venue boost (CSLR with/without expansion, max), shared-term sum with
# exact-lemma override + year discounts, best cross-term LCS with the
# generalization discount and corpus-frequency gate, token-overlap dedup,
# single-shared-term veto, empty-vector prior, similarity floor, ICSum
# evidence gate, final (sharedSum + maxDiff) × venueBoost × coauthorBoost.
# Pure Python: runs per candidate pair inside a scoring pandas UDF over
# top-N-pruned cluster vectors (≤100 dims, ConceptNet.pm:69-71).
# ---------------------------------------------------------------------------

MIN_SAME_VENUE_MN_ODDS_RATIO = 0.1  # ConceptNet.pm:5813
GENERALIZATION_DISCOUNT_PER_STEP = 0.7  # ConceptNet.pm:73
MAX_EMPTY_CONCEPT_VEC_SIMI_PRIOR = 0.5  # ConceptNet.pm:5804
MAX_AMBIGUITY_OF_SHARED_SINGLE_CONCEPT = 0.5  # ConceptNet.pm:5799
BOOST_SHARE_TERM_CHANCE_FROM_RANDOMNESS = 3.0  # ConceptNet.pm:5806


def calc_concept_vector_simi(
    cv1: dict,
    cv2: dict,
    vv1: dict,
    vv2: dict,
    *,
    ics: dict,
    freqs: dict,
    mc: float,
    ambig: float,
    closeness_fn=None,
    venue_expander=None,
    coauthor_boost: float = 1.0,
    empty_prior: float = MAX_EMPTY_CONCEPT_VEC_SIMI_PRIOR,
    ic_offset: float = IC_OFFSET,
    use_lower_bound: bool = True,
) -> dict:
    """Combined cluster similarity over reference-shaped per-cluster
    concept vectors (cv[c] = {"w", "f", "t", "lemmas", "tokens"}) and
    venue vectors (venue → freq).

    ``closeness_fn(c1, c2) → (lcs_simi, attenuation, lcs, least_depth)``
    supplies calcTermCloseness over the taxonomy DAG (see
    operators.taxonomy.lcs_closeness for the distributed twin); None
    disables the cross-term channel. Returns the full diagnostic tuple
    the reference carries (simi, ICSum, ICSumThres, venue boost,
    shared-term sum, best diff-term, surviving shared terms)."""
    import math

    from namedis_spark.functions.core import (
        cslr_v2,
        term_freq_thres_by_ambig,
        year_diff_discount,
        year_range_diff,
    )

    empty_prior = min(empty_prior, MAX_EMPTY_CONCEPT_VEC_SIMI_PRIOR)
    freq_sum_thres = (
        mc * MAX_AMBIGUITY_OF_SHARED_SINGLE_CONCEPT
        / (ambig * BOOST_SHARE_TERM_CHANCE_FROM_RANDOMNESS)
    )
    ic_sum_thres = math.log(ambig)  # + log(MAX_AMBIG_SHARED)=log(1)=0

    # venue boost: CSLR with expansion vs without, take the larger
    # (ConceptNet.pm:5888-5907)
    _, vb1 = cslr_v2(
        dict(vv1), dict(vv2),
        outcome_expander=venue_expander,
        min_odds=MIN_SAME_VENUE_MN_ODDS_RATIO, max_counted_freq=4,
    )
    _, vb2 = cslr_v2(
        dict(vv1), dict(vv2),
        min_odds=MIN_SAME_VENUE_MN_ODDS_RATIO, max_counted_freq=4,
    )
    venue_boost = max(vb1, vb2)

    def ydisc(h1: dict, h2: dict) -> tuple[float, float]:
        yd = year_range_diff(
            h1.get("f", 0), h1.get("t", 0), h2.get("f", 0), h2.get("t", 0)
        )
        return yd, year_diff_discount(yd)

    fthres = min(
        term_freq_thres_by_ambig(
            [freqs[c] for c in cv1 if c in freqs], freq_sum_thres
        ),
        term_freq_thres_by_ambig(
            [freqs[c] for c in cv2 if c in freqs], freq_sum_thres
        ),
    )
    freq_sum_thres = _trunc(2, freq_sum_thres)

    # ---- shared-concept channel (:5946-5988) --------------------------
    shared_terms: list[tuple] = []
    shared_set: set = set()
    for c, h1 in cv1.items():
        h2 = cv2.get(c)
        if h2 is None or not ics.get(c):
            continue
        yd, d = ydisc(h1, h2)
        simi = shared_term_simi(
            ics[c], h1.get("w", 0.0), h2.get("w", 0.0),
            h1.get("lemmas"), h2.get("lemmas"),
            year_discount=d, ic_offset=ic_offset,
        )
        shared_terms.append((c, simi, yd, ics[c] * d))
        shared_set.add(c)

    # ---- best cross-term LCS channel (:5990-6035) ---------------------
    max_diff = 0.0
    diff_ic = 0.0
    closest = None
    if closeness_fn is not None:
        for c1, h1 in cv1.items():
            for c2, h2 in cv2.items():
                if c1 == c2 or c1 in shared_set or c2 in shared_set:
                    continue
                res = closeness_fn(c1, c2)
                if not res:
                    continue
                lcs_simi, atten, lcs, least_depth = res
                if not lcs_simi or lcs in shared_set:
                    continue
                _, d = ydisc(h1, h2)
                ic_discount = (
                    GENERALIZATION_DISCOUNT_PER_STEP**least_depth * d
                    if least_depth is not None
                    else d
                )
                diff = (
                    lcs_simi * atten * h1.get("w", 0.0) * h2.get("w", 0.0)
                    * ic_discount
                )
                if diff > max_diff and freqs.get(lcs, 0.0) <= freq_sum_thres:
                    max_diff = diff
                    diff_ic = ics.get(lcs, 0.0) * ic_discount
                    closest = (lcs, lcs_simi, atten, least_depth, c1, c2)

    # ---- priors / dedup / veto / sums (:6038-6089) --------------------
    if not cv1 or not cv2:
        maxsimi = empty_prior
        ic_sum = ic_sum_thres  # gate auto-passes
        shared_sum = 0.0
    else:
        shared_terms = remove_overlap_terms(shared_terms, cv1, cv2)
        vetoed = False
        if len(shared_terms) == 1:
            c = shared_terms[0][0]
            if freqs.get(c, 0.0) > fthres:
                vetoed = True
        if vetoed:
            shared_sum = 0.0
            ic_sum = 0.0
        else:
            shared_sum = sum(t[1] for t in shared_terms)
            ic_sum = sum(t[3] for t in shared_terms)
        maxsimi = max_diff + shared_sum
        if diff_ic:
            ic_sum += diff_ic
        if use_lower_bound and 0.0 < maxsimi < empty_prior:
            maxsimi = empty_prior

    simi = maxsimi * venue_boost * coauthor_boost
    return {
        "simi": simi,
        "ic_sum": ic_sum,
        "ic_sum_thres": ic_sum_thres,
        "gate_passed": ic_sum >= ic_sum_thres,
        "venue_boost": venue_boost,
        "coauthor_boost": coauthor_boost,
        "shared_sum": shared_sum,
        "max_diff": max_diff,
        "shared_terms": shared_terms,
        "closest": closest,
    }


# ---------------------------------------------------------------------------
# Per-pair LCS + nearby-term merging (compactConceptVector /
# mergeNearbyTerms, ConceptNet.pm:5657-5694, 3365-3465): concepts matched
# on overlapping snippets collapse onto their close common subsumer before
# cluster vectors are compared. Pure Python over per-term ancestor dicts
# (term → {ancestor: (depth, atten)}) — the broadcastable slice of the
# distributed closure (operators.taxonomy.ancestors_map_from_df).
# ---------------------------------------------------------------------------

MIN_ANCESTOR_DEPTH = 2  # ConceptNet.pm:19


def weight_ratio(a: float, b: float) -> float:
    """min/max ratio, 0 for non-positives (NLPUtil.pm:1079)."""
    if a <= 0 or b <= 0:
        return 0.0
    return min(a, b) / max(a, b)


def least_common_subsumer(
    anc1: dict, anc2: dict, max_depth_sum: int | None = None
):
    """leastCommonSubsumer (ConceptNet.pm:3283-3361) over two ancestor
    dicts {ancestor: (depth, atten)}: the common ancestor minimizing the
    depth sum, ties broken by the attenuated depth sum (depth/atten, i.e.
    recAttenuateByBatch-weighted) then lexically (determinism the
    reference's hash-order loop lacks). Returns
    (lcs, depth_sum, atten_product, d1, d2) or None."""
    best = None
    for a, (d1, at1) in anc1.items():
        o = anc2.get(a)
        if o is None:
            continue
        d2, at2 = o
        ds = d1 + d2
        if max_depth_sum is not None and ds > max_depth_sum:
            continue
        ads = (d1 / at1 if at1 else float("inf")) + (
            d2 / at2 if at2 else float("inf")
        )
        key = (ds, ads, a)
        if best is None or key < best[0]:
            best = (key, (a, ds, at1 * at2, d1, d2))
    return best[1] if best else None


def merge_nearby_terms(
    weights: dict,
    ancestors: dict,
    rootdepth: dict,
    max_nearby_depth_diff: int = 1,
    min_ancestor_depth: int = MIN_ANCESTOR_DEPTH,
) -> dict:
    """mergeNearbyTerms (ConceptNet.pm:3365-3465): iteratively collapse
    concept pairs whose LCS lies within the depth budget onto that LCS.

    Round r admits pairs with depth-sum ≤ r whose weight ratio is at
    least 1 − 1/r (tiny matches must not drag significant ones); terms or
    subsumers shallower than ``min_ancestor_depth`` never merge (too
    general). Weights accumulate on the subsumer across merges. Returns
    {concept: (lcs, depth_from_concept)} for every merged concept.

    Deterministic re-expression: the reference mutates its posting array
    in visit order; this port processes candidate pairs in sorted order
    each round, which fixes one canonical outcome of the same merge
    relation."""
    w = dict(weights)
    alive = {c for c in w}
    merge_map: dict = {}
    for max_dd in range(1, max_nearby_depth_diff + 1):
        least_ratio = 1.0 - 1.0 / max_dd
        changed = True
        while changed:
            changed = False
            for p1 in sorted(alive):
                if rootdepth.get(p1, 0) < min_ancestor_depth:
                    continue
                for p2 in sorted(alive):
                    if p2 == p1 or rootdepth.get(p2, 0) < min_ancestor_depth:
                        continue
                    if weight_ratio(w[p1], w[p2]) < least_ratio:
                        continue
                    res = least_common_subsumer(
                        ancestors.get(p1, {}), ancestors.get(p2, {}),
                        max_nearby_depth_diff,
                    )
                    if res is None:
                        continue
                    lcs, ds, _at, d1, d2 = res
                    if ds > max_dd or rootdepth.get(lcs, 0) < min_ancestor_depth:
                        continue
                    if lcs != p1:
                        merge_map[p1] = (lcs, d1)
                    if lcs != p2:
                        merge_map[p2] = (lcs, d2)
                    w[lcs] = w[p1] + w[p2]
                    alive.discard(p1)
                    alive.discard(p2)
                    alive.add(lcs)
                    ancestors.setdefault(lcs, {lcs: (0, 1.0)})
                    changed = True
                    break
                if changed:
                    break
    return merge_map


def compact_concept_vector(cv: dict, merge_map: dict) -> dict:
    """compactConceptVector (ConceptNet.pm:5657-5694): apply a merge map
    to a full cluster vector — the subsumer entry accumulates weight,
    widens its year range and concatenates token/lemma provenance, while
    the original merged concepts are ALSO kept (the reference keeps both:
    the subsumer carries the combined evidence, the specific concept its
    own)."""
    out: dict = {}
    for c, h in cv.items():
        target = merge_map.get(c, (c, 0))[0]
        t = out.setdefault(
            target, {"w": 0.0, "f": None, "t": None, "lemmas": [], "tokens": []}
        )
        t["w"] += h.get("w", 0.0)
        for k, pick in (("f", min), ("t", max)):
            v = h.get(k)
            if v is not None:
                t[k] = v if t[k] is None else pick(t[k], v)
        t["lemmas"] = list(t["lemmas"]) + list(h.get("lemmas") or [])
        t["tokens"] = list(t["tokens"]) + list(h.get("tokens") or [])
        if target != c and c not in out:
            out[c] = h
    return out


# ---------------------------------------------------------------------------
# titleSetToVector (ConceptNet.pm:6154-6285): per-title concept matches →
# one per-cluster concept vector + venue vector.
# ---------------------------------------------------------------------------

CONCEPT_VEC_TOP_N_TO_CLUST_SIZE_RATIO = 3  # ConceptNet.pm:69
CONCEPT_VEC_LEAST_TOP_N = 20  # :70
CONCEPT_VEC_MOST_TOP_N = 100  # :71


def hash_top_n(d: dict, n: int, accessor) -> dict:
    """hashTopN (NLPUtil.pm:2817-2838): keep the top-n entries by the
    accessor, KEEPING TIES at the cutoff value."""
    if len(d) <= n:
        return dict(d)
    vals = sorted((accessor(v) for v in d.values()), reverse=True)
    cutoff = vals[n - 1]
    return {k: v for k, v in d.items() if accessor(v) >= cutoff}


def title_set_to_vector(
    title_matches: list[dict],
    venues: list[str | None],
    years: list[int | None],
    ancestors: dict | None = None,
    rootdepth: dict | None = None,
) -> tuple[dict, dict]:
    """Aggregate per-title matches into the cluster (concept, venue)
    vector pair (titleSetToVector, ConceptNet.pm:6154-6285).

    ``title_matches[i]`` = {concept: (weight, token_indices, lemmas)} —
    the ``match_title_full`` output for title i. Per concept: weights
    summed, per-title token spans recorded as (title_sn, [token_sn]),
    count and year range maintained; then w /= sqrt(c) · max(1, log S),
    keep-ties top-N prune (N = clamp(3·S, 20, 100)), and — when ancestor
    maps are supplied — compactConceptVector's nearby-term merge."""
    import math

    s_sz = len(title_matches)
    cv: dict = {}
    vv: dict = {}
    for sn, (matches, venue, year) in enumerate(zip(title_matches, venues, years)):
        vv[venue or "UNKNOWN"] = vv.get(venue or "UNKNOWN", 0) + 1
        for concept, (w, tok_idx, lem) in (matches or {}).items():
            h = cv.setdefault(
                concept, {"w": 0.0, "c": 0, "f": None, "t": None,
                          "tokens": [], "lemmas": []}
            )
            h["w"] += w
            h["c"] += 1
            h["tokens"].append((sn, list(tok_idx)))
            h["lemmas"].append(list(lem))
            if year is not None:
                h["f"] = year if h["f"] is None else min(h["f"], year)
                h["t"] = year if h["t"] is None else max(h["t"], year)

    big_w = max(1.0, math.log(s_sz)) if s_sz else 1.0
    for h in cv.values():
        h["w"] /= math.sqrt(h["c"]) * big_w

    kept_n = int(
        min(
            max(CONCEPT_VEC_TOP_N_TO_CLUST_SIZE_RATIO * s_sz, CONCEPT_VEC_LEAST_TOP_N),
            CONCEPT_VEC_MOST_TOP_N,
        )
    )
    cv = hash_top_n(cv, kept_n, lambda h: h["w"])

    if ancestors is not None and rootdepth is not None:
        mm = merge_nearby_terms(
            {c: h["w"] for c, h in cv.items()},
            {c: dict(ancestors.get(c, {c: (0, 1.0)})) for c in cv},
            rootdepth,
            max_nearby_depth_diff=1,
        )
        cv = compact_concept_vector(cv, mm)
    return cv, vv
