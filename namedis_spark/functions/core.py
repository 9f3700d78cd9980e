"""Pure-Python similarity core — the math of the reference, re-implemented.

These functions are the single source of truth used (a) inside Arrow-batched
pandas UDFs on executors and (b) directly by pytest golden tests. They carry
`file:line` citations into /root/reference for parity auditing; the code is a
from-scratch re-expression of the documented semantics, not a translation.

Numeric notes: real-valued factorials/combinations go through
``math.lgamma`` (C libm — bit-identical to DuckDB's ``lgamma``, which the
oracle SQL uses), matching the reference's Math::GammaFunction usage
(NLPUtil.pm:2878-2940).
"""

from __future__ import annotations

import math
from collections.abc import Callable

# Reference constants (NLPUtil.pm:44-47, 207-208; ConceptNet.pm:75-77).
CAT_PRIOR = 0.5
UNSEEN_REDUCTION_FRAC = 0.3334
BIG_AMBIG_EST_BOOST = 1.5
SMALL_AMBIG_EST_BOOST = 2.5
YEAR_TOLERANCE = 2
YEARLY_ATTENUATE = 0.7
MAX_YEAR_DIFF = 6


def log_factorial(x: float) -> float:
    """Real-valued log(x!) via lgamma (NLPUtil.pm:2900-2916)."""
    return math.lgamma(x + 1.0)


def factorial(x: float) -> float:
    return math.exp(math.lgamma(x + 1.0))


def log_combination(n: float, k: float) -> float:
    """Real-valued log C(n, k) (NLPUtil.pm:2918-2940)."""
    return math.lgamma(n + 1.0) - math.lgamma(k + 1.0) - math.lgamma(n - k + 1.0)


def combination(n: float, k: float) -> float:
    return math.exp(log_combination(n, k))


def cslr_v2(
    vv1: dict[str, float],
    vv2: dict[str, float],
    known_prior: float = CAT_PRIOR,
    unknown_prior: float = 0.0,
    unseen_prior: float = CAT_PRIOR,
    unseen_reduction_frac: float = UNSEEN_REDUCTION_FRAC,
    outcome_expander: Callable[[dict, dict, float], dict] | None = None,
    min_odds: float = 0.0,
    max_counted_freq: float = 4.0,
    _return_log: bool = False,
) -> tuple[float, float]:
    """CSLR v2 — Categorical Sampling Likelihood Ratio.

    Multinomial likelihood-ratio test that the smaller frequency vector is a
    sample drawn from the larger one's categorical distribution. Semantics
    from ``isSameCategorical2`` (NLPUtil.pm:3486-3712):

    * the bigger vector (by freq sum, tie-broken by key count) is the
      multinomial template (:3501-3513);
    * multinomial per-outcome freqs are capped at ``max_counted_freq``
      (:3527-3533), 'UNKNOWN' excluded;
    * optional outcome expansion (venue-similarity injection) on both sides
      (:3535-3538);
    * sample outcomes absent from the multinomial are pooled into an
      'UNSEEN' slot (:3540-3553);
    * Dirichlet-like priors are added to multinomial outcomes; 'UNKNOWN' /
      'UNSEEN' slots get dedicated prior handling (:3555-3588);
    * the sample's UNSEEN freq is reduced by ``int(N * frac)`` (:3638-3643);
    * multinomial probability of the sample, in log space when N > 20
      (:3648-3689); likelihood ratio = prob * C(M+N-1, N);
    * floor logic: a ratio below ``min_odds`` is raised to ``min_odds`` when
      within 100x of it, else to ``min_odds/100`` (:3692-3706).

    Returns ``(prob, likelihood_ratio)``.
    """
    s1, s2 = sum(vv1.values()), sum(vv2.values())
    if s1 < s2 or (s1 == s2 and len(vv1) < len(vv2)):
        multinomial, sample = dict(vv2), dict(vv1)
    else:
        multinomial, sample = dict(vv1), dict(vv2)

    unknown_sam = sample.get("UNKNOWN", 0) or 0

    for k in multinomial:
        if k != "UNKNOWN" and multinomial[k] > max_counted_freq:
            multinomial[k] = max_counted_freq

    if outcome_expander is not None:
        multinomial = outcome_expander(multinomial, sample, BASE_SET_EXPANSION_LEAST_SIMI)
        sample = outcome_expander(sample, multinomial, SAMPLED_SET_EXPANSION_LEAST_SIMI)

    unseen_count = 0
    unseen_freq_sum = 0.0
    for k in list(sample.keys()):
        if k == "UNKNOWN":
            continue
        if k not in multinomial:
            unseen_freq_sum += sample[k]
            unseen_count += 1
            del sample[k]
    if unseen_freq_sum > 0:
        sample["UNSEEN"] = unseen_freq_sum

    for k in multinomial:
        if k != "UNKNOWN":
            multinomial[k] += known_prior

    if unseen_count:
        if unknown_sam:
            if not multinomial.get("UNKNOWN"):
                denom = unknown_prior + unseen_prior
                multinomial["UNKNOWN"] = unknown_prior * unseen_prior / denom
                multinomial["UNSEEN"] = unseen_prior * unseen_prior / denom
            else:
                multinomial["UNKNOWN"] += unknown_prior
                multinomial["UNSEEN"] = unseen_prior
        else:
            multinomial["UNSEEN"] = unseen_prior
    else:
        if unknown_sam:
            multinomial["UNKNOWN"] = multinomial.get("UNKNOWN", 0) + unknown_prior
        multinomial["UNSEEN"] = unseen_prior

    s = sum(multinomial.values())
    probs = {k: f / s for k, f in multinomial.items()}

    n = sum(sample.values())
    unseen_reduction = int(n * unseen_reduction_frac)
    if sample.get("UNSEEN"):
        sample["UNSEEN"] -= min(unseen_reduction, sample["UNSEEN"])
    n = sum(sample.values())

    m = len(multinomial)
    if n > 20:
        log_coeff = log_factorial(n)
        log_prob = 0.0
        for k, f in sample.items():
            log_coeff -= log_factorial(f)
            p_k = probs[k]
            # zero-prior outcome → probability 0; agree with the linear
            # branch's 0**f instead of raising on log(0)
            log_prob += math.log(p_k) * f if p_k > 0 else float("-inf")
        log_prob += log_coeff
        log_support = log_combination(m + n - 1, n)
        prob = math.exp(log_prob) if log_prob > float("-inf") else 0.0
        log_lr = log_prob + log_support
        lr = math.exp(log_lr) if log_lr > float("-inf") else 0.0
    else:
        coeff = factorial(n)
        prob = 1.0
        for k, f in sample.items():
            coeff /= factorial(f)
            prob *= probs[k] ** f
        prob *= coeff
        lr = prob * combination(m + n - 1, n)
        log_lr = math.log(lr) if lr > 0 else float("-inf")

    if _return_log:
        return prob, lr, log_lr
    if lr < min_odds:
        lr = min_odds if lr * 100 >= min_odds else min_odds / 100
    return prob, lr


def cslr_v1(
    vv1: dict[str, float],
    vv2: dict[str, float],
    known_prior: float = CAT_PRIOR,
    unknown_prior: float = 0.0,
    unseen_prior: float = CAT_PRIOR,
    seen_cancel_unseen_ratio: float = 0.5,
    outcome_expander: Callable[[dict, dict, float], dict] | None = None,
    min_odds: float = 0.0,
    max_counted_freq: float = 4.0,
    _return_log: bool = False,
):
    """CSLR v1 — the obsolete-but-selectable earlier variant
    (``isSameCategorical``, NLPUtil.pm:3255-3480; version switch
    clust.pl:95-104). Differences from v2:

    * template pick is a plain OR — smaller freq sum OR fewer outcome types
      becomes the sample (:3268-3276; v2 guards the key-count test with
      freq-sum equality, :3501-3513);
    * the sample's UNSEEN slot holds the unseen outcome *type count*, not
      the freq sum (:3330-3333);
    * seen-cancels-unseen: UNSEEN reduced by ⌊seenTypes × ratio⌋ (:3350-3355)
      instead of v2's ⌊N × 0.3334⌋;
    * UNKNOWN cancel: sample UNKNOWN freq minus the known-outcome freq sum,
      capped to the known type count, floored at 1 when positive (:3337-3348);
    * multinomial priors are added BEFORE the per-outcome freq cap, and the
      cap applies to the prior-inflated value (:3362-3369; v2 caps the raw
      freq first, :3527-3533).

    Returns ``(prob, likelihood_ratio)`` (or with log appended when
    ``_return_log``), with the same ×100 floor logic as v2 (:3461-3476).
    """
    s1, s2 = sum(vv1.values()), sum(vv2.values())
    if s1 < s2 or len(vv1) < len(vv2):
        multinomial, sample = dict(vv2), dict(vv1)
    else:
        multinomial, sample = dict(vv1), dict(vv2)

    unknown_sam = sample.get("UNKNOWN", 0) or 0

    if outcome_expander is not None:
        multinomial = outcome_expander(multinomial, sample, BASE_SET_EXPANSION_LEAST_SIMI)
        sample = outcome_expander(sample, multinomial, SAMPLED_SET_EXPANSION_LEAST_SIMI)

    known_sum = 0.0
    known_cnt = 0
    seen_cnt = 0
    unseen_cnt = 0
    for k in list(sample.keys()):
        if k == "UNKNOWN":
            continue
        known_sum += sample[k]
        known_cnt += 1
        if k not in multinomial:
            unseen_cnt += 1
            del sample[k]
        else:
            seen_cnt += 1
    if unseen_cnt > 0:
        sample["UNSEEN"] = unseen_cnt

    if sample.get("UNKNOWN"):
        after_cancel = sample["UNKNOWN"] - known_sum
        if after_cancel > 0:
            sample["UNKNOWN"] = max(1, min(after_cancel, known_cnt))
        else:
            del sample["UNKNOWN"]
    if sample.get("UNSEEN"):
        reduced = max(0, sample["UNSEEN"] - int(seen_cnt * seen_cancel_unseen_ratio))
        if reduced > 0:
            sample["UNSEEN"] = reduced
        else:
            del sample["UNSEEN"]

    for k in multinomial:
        if k != "UNKNOWN":
            multinomial[k] = min(multinomial[k] + known_prior, max_counted_freq)

    if unseen_cnt:
        if unknown_sam:
            if not multinomial.get("UNKNOWN"):
                denom = unknown_prior + unseen_prior
                multinomial["UNKNOWN"] = unknown_prior * unseen_prior / denom
                multinomial["UNSEEN"] = unseen_prior * unseen_prior / denom
            else:
                multinomial["UNKNOWN"] += unknown_prior
                multinomial["UNSEEN"] = unseen_prior
        else:
            multinomial["UNSEEN"] = unseen_prior
    else:
        if unknown_sam:
            multinomial["UNKNOWN"] = multinomial.get("UNKNOWN", 0) + unknown_prior
        multinomial["UNSEEN"] = unseen_prior

    s = sum(multinomial.values())
    probs = {k: f / s for k, f in multinomial.items()}

    n = sum(sample.values())
    m = len(multinomial)
    if n > 20:
        log_coeff = log_factorial(n)
        log_prob = 0.0
        for k, f in sample.items():
            log_coeff -= log_factorial(f)
            p_k = probs[k]
            # a zero-prior outcome (e.g. UNKNOWN with unknown_prior=0) has
            # zero probability: the linear branch yields prob 0 via 0**f;
            # the log branch must agree, not raise on log(0)
            log_prob += math.log(p_k) * f if p_k > 0 else float("-inf")
        log_prob += log_coeff
        log_support = log_combination(m + n - 1, n)
        prob = math.exp(log_prob) if log_prob > float("-inf") else 0.0
        log_lr = log_prob + log_support
        lr = math.exp(log_lr) if log_lr > float("-inf") else 0.0
    else:
        coeff = factorial(n)
        prob = 1.0
        for k, f in sample.items():
            coeff /= factorial(f)
            prob *= probs[k] ** f
        prob *= coeff
        lr = prob * combination(m + n - 1, n)
        log_lr = math.log(lr) if lr > 0 else float("-inf")

    if _return_log:
        return prob, lr, log_lr
    if lr < min_odds:
        lr = min_odds if lr * 100 >= min_odds else min_odds / 100
    return prob, lr


def cslr_v1_log(vv1: dict[str, float], vv2: dict[str, float], **kw) -> float:
    """log(likelihood ratio) of cslr_v1 (no min_odds floor)."""
    kw.pop("min_odds", None)
    return cslr_v1(vv1, vv2, min_odds=0.0, _return_log=True, **kw)[2]


def cslr_v2_log(vv1: dict[str, float], vv2: dict[str, float], **kw) -> float:
    """log(likelihood ratio) of cslr_v2, computed without exp/underflow
    (no min_odds floor — the floor is linear-space semantics)."""
    kw.pop("min_odds", None)
    return cslr_v2(vv1, vv2, min_odds=0.0, _return_log=True, **kw)[2]


# Venue/tool-expansion least-similarity gates (NLPUtil.pm:3003-3004).
BASE_SET_EXPANSION_LEAST_SIMI = 0.5
SAMPLED_SET_EXPANSION_LEAST_SIMI = 0.8

# Expansion constants (NLPUtil.pm:2942-2951).
EXPANSION_DISCOUNT = 0.7
EXPANSION_FREQ_CAP = 1.0
EXPANSION_BUDGET_FRAC = 0.5


def make_tool_expander(simi_map: dict[str, list[tuple[str, float]]]):
    """Outcome expander à la ``expandSimilarVenues`` (NLPUtil.pm:3011-3102).

    Injects tools similar (linregSimi >= least_simi) to those present into a
    tool-frequency vector: injected freq = min(freq, 1) * 0.7 * simi, total
    injected mass capped at 0.5x the original mass. ``simi_map`` maps
    tool -> [(similar_tool, simi)] sorted by simi desc.
    """

    def expand(vec: dict[str, float], other: dict[str, float], least_simi: float) -> dict[str, float]:
        out = dict(vec)
        orig_mass = sum(v for k, v in vec.items() if k != "UNKNOWN")
        budget = EXPANSION_BUDGET_FRAC * orig_mass
        injected = 0.0
        for tool, freq in sorted(vec.items()):
            if tool == "UNKNOWN":
                continue
            for sim_tool, simi in simi_map.get(tool, ()):
                if simi < least_simi or sim_tool in out:
                    continue
                add = min(freq, EXPANSION_FREQ_CAP) * EXPANSION_DISCOUNT * simi
                if injected + add > budget:
                    continue
                out[sim_tool] = add
                injected += add
        return out

    return expand


def weighted_jaccard(
    vv1: dict[str, float],
    vv2: dict[str, float],
    min_simi: float = 0.0,
    use_freq: bool = True,
) -> float:
    """Weighted Jaccard over two frequency maps (NLPUtil.pm:3172-3252).

    'UNKNOWN' entries never match — each side's UNKNOWN mass goes to the
    union only. freq-mode: sum(min)/sum(max); type-mode: |∩|/|∪|. The result
    is floored at ``min_simi``.
    """
    union_freq = inter_freq = 0.0
    union_types = inter_types = 0
    u1, u2 = vv1.get("UNKNOWN", 0), vv2.get("UNKNOWN", 0)
    if u1:
        union_freq += u1
        union_types += 1
    if u2:
        union_freq += u2
        union_types += 1
    for k, f1 in vv1.items():
        if k == "UNKNOWN":
            continue
        if k in vv2:
            f2 = vv2[k]
            inter_freq += min(f1, f2)
            union_freq += max(f1, f2)
            inter_types += 1
            union_types += 1
        else:
            union_freq += f1
            union_types += 1
    for k, f2 in vv2.items():
        if k == "UNKNOWN" or k in vv1:
            continue
        union_freq += f2
        union_types += 1
    if union_freq == 0:
        simi = 0.0
    elif use_freq:
        simi = inter_freq / union_freq
    else:
        simi = inter_types / union_types
    return max(simi, min_simi)


def jaro_winkler(s1: str, s2: str, prefix_weight: float = 0.1, boost_threshold: float = 0.7) -> float:
    """Jaro-Winkler similarity (standard definition; matches DuckDB's
    ``jaro_winkler_similarity``). Used on normalized speaker keys — the
    north-star's string-similarity term alongside CSLR."""
    if s1 == s2:
        return 1.0
    len1, len2 = len(s1), len(s2)
    if len1 == 0 or len2 == 0:
        return 0.0
    match_window = max(len1, len2) // 2 - 1
    if match_window < 0:
        match_window = 0
    flags1 = [False] * len1
    flags2 = [False] * len2
    matches = 0
    for i, c1 in enumerate(s1):
        lo = max(0, i - match_window)
        hi = min(len2, i + match_window + 1)
        for j in range(lo, hi):
            if not flags2[j] and s2[j] == c1:
                flags1[i] = True
                flags2[j] = True
                matches += 1
                break
    if matches == 0:
        return 0.0
    transpositions = 0
    j = 0
    for i in range(len1):
        if flags1[i]:
            while not flags2[j]:
                j += 1
            if s1[i] != s2[j]:
                transpositions += 1
            j += 1
    transpositions //= 2
    jaro = (
        matches / len1 + matches / len2 + (matches - transpositions) / matches
    ) / 3.0
    if jaro <= boost_threshold:
        return jaro
    prefix = 0
    for c1, c2 in zip(s1, s2):
        if c1 != c2 or prefix == 4:
            break
        prefix += 1
    return jaro + prefix * prefix_weight * (1.0 - jaro)


def tfidf_cosine(v1: dict[str, float], v2: dict[str, float]) -> float:
    """Cosine similarity of two sparse TF-IDF maps (north-star term)."""
    if not v1 or not v2:
        return 0.0
    if len(v2) < len(v1):
        v1, v2 = v2, v1
    dot = 0.0
    for k, w in v1.items():
        w2 = v2.get(k)
        if w2 is not None:
            dot += w * w2
    if dot == 0.0:
        return 0.0
    n1 = math.sqrt(sum(w * w for w in v1.values()))
    n2 = math.sqrt(sum(w * w for w in v2.values()))
    return dot / (n1 * n2)


def year_range_diff(from1: float, to1: float, from2: float, to2: float) -> float:
    """Gap between two closed ranges (ConceptNet.pm:5442-5458)."""
    if to1 < from2:
        return from2 - to1
    if to2 < from1:
        return from1 - to2
    return 0.0


def year_diff_discount(year_diff: float) -> float:
    """0 beyond 6y, free <= 2y, 0.7^extra (ConceptNet.pm:5461-5473)."""
    if year_diff > MAX_YEAR_DIFF:
        return 0.0
    year_diff -= YEAR_TOLERANCE
    if year_diff <= 0:
        return 1.0
    return YEARLY_ATTENUATE**year_diff


def overestimate_ambig(name: str, ambig: dict[str, float]) -> float:
    """Deliberately over-estimated ambiguity (NLPUtil.pm:4072-4093)."""
    if name not in ambig:
        return 0.0
    a = ambig[name]
    if a > 200:
        return max(a, 1.0)
    if a > 50:
        a *= BIG_AMBIG_EST_BOOST
    else:
        a *= SMALL_AMBIG_EST_BOOST
    return max(a, 1.0)


def overestimate_ambig_values(a):
    """Vectorized ``overestimate_ambig`` over an array of ambiguity values
    (NLPUtil.pm:4072-4093) — used by the side-table significance pruner."""
    import numpy as np

    a = np.asarray(a, dtype=np.float64)
    out = np.where(
        a > 200.0,
        a,
        np.where(a > 50.0, a * BIG_AMBIG_EST_BOOST, a * SMALL_AMBIG_EST_BOOST),
    )
    return np.maximum(out, 1.0)


def coauthor_evidence_error(
    author: str,
    coauthor: str,
    ambig: dict[str, float],
    cn_coauthor_count: dict[str, float],
    ambig_sum_total: float,
) -> float:
    """P(two clusters sharing coauthor c belong to different people)
    (NLPUtil.pm:4096-4137): symmetric max of
    ``(cnCoauthorCount(x)+1) * overestimatedAmbig(y) / ambigSumTotal / 2``.
    """
    if author not in ambig:
        return 0.0
    if author not in cn_coauthor_count or coauthor not in cn_coauthor_count:
        return 0.0
    e1 = (cn_coauthor_count[coauthor] + 1) * overestimate_ambig(author, ambig) / ambig_sum_total / 2
    e2 = (cn_coauthor_count[author] + 1) * overestimate_ambig(coauthor, ambig) / ambig_sum_total / 2
    return max(e1, e2)


def evidence_thresholds(
    author: str,
    error_tolerance: float,
    ambig: dict[str, float],
    cn_coauthor_count: dict[str, float],
    ambig_sum_total: float,
) -> tuple[float, float]:
    """Dual thresholds derived from the error tolerance
    (NLPUtil.pm:4141-4170): (cn_coauthor_count_thres, coauthor_ambig_thres).
    """
    author_ambig = overestimate_ambig(author, ambig)
    cnt_thres = (
        error_tolerance * 2 * ambig_sum_total / author_ambig - 1 if author_ambig else 0.0
    )
    if not cn_coauthor_count.get(author):
        amb_thres = 0.0
    else:
        amb_thres = error_tolerance * 2 * ambig_sum_total / (cn_coauthor_count[author] + 1)
    return cnt_thres, amb_thres


def shared_coauthor_boost(
    focus: str,
    shared: list[str],
    ambig: dict[str, float],
    cn_coauthor_count: dict[str, float],
    ambig_sum_total: float,
) -> float:
    """Stage-2 evidence boost (ConceptNet.pm:6309-6358): max over shared
    coauthors of min(ambigSumTotal/((cnt(c)+1)*ambig(focus)),
    ambigSumTotal/((cnt(focus)+1)*ambig(c))), floored at 1."""
    if focus not in ambig or not shared:
        return 1.0
    author_ambig = overestimate_ambig(focus, ambig)
    best = 1.0
    for c in shared:
        b1 = ambig_sum_total / (cn_coauthor_count.get(c, 0) + 1) / author_ambig
        c_ambig = overestimate_ambig(c, ambig)
        if c_ambig > 0:
            b2 = ambig_sum_total / (cn_coauthor_count.get(focus, 0) + 1) / c_ambig
            b1 = min(b1, b2)
        best = max(best, b1)
    return best


def term_freq_thres_by_ambig(freqs: list[float], freq_sum_thres: float) -> float:
    """Per-vector single-shared-term frequency threshold
    (getTermFreqThresByAmbig, ConceptNet.pm:5475-5497): walk the vector's
    term corpus-frequencies ascending, accumulating; the threshold is the
    last frequency whose running sum stays <= freq_sum_thres (when the sum
    first exceeds it, the threshold backs off to that frequency - 1)."""
    thres = 0.0
    running = 0.0
    for f in sorted(freqs):
        running += f
        if running > freq_sum_thres:
            thres = f - 1
            break
        thres = f
    return thres
