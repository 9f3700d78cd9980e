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
