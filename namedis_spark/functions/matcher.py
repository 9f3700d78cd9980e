"""Fuzzy taxonomy concept matcher — the ``matchTitle`` family (SURVEY §2.7).

Re-expresses the reference's windowed taxonomy-term matcher as a pure-Python
core designed to run inside Arrow-batched pandas UDFs (broadcast matcher
object, vectorized over title batches) and to be unit-tested directly:

* ``extract_tokens``    ≙ extractTitleTokens  (NLPUtil.pm:2303-2475):
  piece/word tokenization with stopword-gap counts and weights.
* ``match_snippet``     ≙ matchSnippet        (ConceptNet.pm:3648-3822):
  subset enumeration over a ≤4-token window via posting-list intersection;
  maximal match sets, stopword-gap constraint + gap discount, cover rule.
* ``calc_match_score``  ≙ calcMatchScore      (ConceptNet.pm:4366-4736):
  TFIAF-weighted token overlap with context / suffix / unknown-token /
  unmatched-stopword / 1-of-N / inversion discounts and hard vetoes.
* ``distribute_matches``≙ distributeMatches   (ConceptNet.pm:3870-4041):
  normalize a window's term scores to sum ≤ 1 with the perfect-match
  reserve, floor pruning, and the all-bad-matches discount.
* ``match_title``       ≙ matchTitle          (ConceptNet.pm:4043-4364):
  slide the window, keep per-term best scores (recordBestMatches,
  ConceptNet.pm:3822-3845).

Deliberate simplifications (documented deviations, not omissions of
semantics the pipeline relies on): no posting/bigram caches (broadcast dict
lookups are cheap; ConceptNet.pm:3581-3646), no hyphen/'re-'-prefix token
splitting (NLPUtil.pm:2368-2440), no reliant-lemma list, and
``mergeNearbyTerms`` collapses via an explicit parent map only when one is
supplied (our synthetic taxonomy is flat at the term level).

All constants carry their reference values (ConceptNet.pm:30-63,3866-3868).
"""

from __future__ import annotations

import re

from namedis_spark.functions.text import STOPWORDS, lemma

# ConceptNet.pm:30-63
MATCH_TERM_WINDOW = 4
TOKEN_MAX_MATCH_TERMS = 800
INVERSION_DISCOUNT = 0.3
CONTEXT_MATCH_DISCOUNT = 0.5
UNMATCHED_STOPWORD_DISCOUNT = 0.7
DIFF_SUFFIX_DISCOUNT = 0.6
DIFF_SUFFIX_1_TOKEN_DISCOUNT = 0.4
MIN_VALID_1_QUERY_TOKEN_TFIAF = 1.0
MATCH_UNKNOWN_TOKEN_WEIGHT = 4.0
MATCH_1_OF_N_TOKENS_DISCOUNT = 0.4
MATCH_1_MISS_CONTEXT_DISCOUNT = 0.6
MATCH_MISS_TOKEN_PUNISHMENT = 3.0
MATCH_1_TOKEN_QUERY_DISCOUNT = 0.7
MATCH_1_TOKEN_QUERY_TO_TERM_WITH_CONTEXT_DISCOUNT = 0.7
MAX_STOPWORD_GAP_WEIGHT_IN_QUERY = 1.5
MATCH_LEAST_FREQ_AFTER_ENTROPY_DISCOUNT = 0.05
# ConceptNet.pm:3866-3868
PERFECT_MATCH_LEAST_SCORE = 0.7
SIGNIFICANT_MATCH_LEAST_SCORE = 0.5
ALL_BAD_MATCHES_DISCOUNT = 0.5

# suffix classes (reference enum NLPUtil.pm:2052-2177: NONE/ING/ED/STOPWORD;
# our deterministic lemmatizer adds the plural classes its rules produce)
SUF_NONE, SUF_ING, SUF_ED, SUF_S, SUF_Y, SUF_STOPWORD = 0, 1, 2, 3, 4, 9

# stopword gap weights (NLPUtil.pm:285-287): default 1, 'and' 0.2,
# articles 0.1
_GAP_WEIGHT = {w: 1.0 for w in STOPWORDS}
_GAP_WEIGHT["and"] = 0.2
for _a in ("a", "an", "the"):
    _GAP_WEIGHT[_a] = 0.1

_PIECE_SPLIT = re.compile(r"[,;:`\"()?!{}]|--+|\s-\s|''|\.\s|\.$|\.\.+")
_WORD_SPLIT = re.compile(r"[^A-Za-z0-9'-]+")


def lemma_suffix(word: str, stop: set[str] | None = None) -> tuple[str, int]:
    """(lemma, suffix class) for a lowercase word — the lemma-cache record
    (surfaceForm → lemma, suffixEnum; NLPUtil.pm:408-441)."""
    stop = stop if stop is not None else _STOPSET
    if word in stop:
        return word, SUF_STOPWORD
    base = lemma(word)
    if base == word:
        return base, SUF_NONE
    if word.endswith("ing"):
        return base, SUF_ING
    if word.endswith("ed"):
        return base, SUF_ED
    if word.endswith("ies"):
        return base, SUF_Y
    return base, SUF_S


_STOPSET = set(STOPWORDS)


class ConceptMatcher:
    """Broadcastable matcher over a taxonomy term list.

    ``terms`` are phrase strings, optionally with a parenthesized
    disambiguation context: ``"data structure (computer science)"``.
    ``tfiaf`` maps lemma → TF·IAF weight (the unigram table,
    exterm.pl:435-480); lemmas absent from it are "unknown" tokens.
    ``parent`` optionally maps term index → parent term index for
    mergeNearbyTerms-style collapsing of imperfect matches.
    """

    def __init__(
        self,
        terms: list[str],
        tfiaf: dict[str, float],
        parent: dict[int, int] | None = None,
    ):
        self.terms = list(terms)
        self.tfiaf = dict(tfiaf)
        self.parent = parent or {}
        # per term: [(lemma, suffix)], context start index
        self.term_tokens: list[list[tuple[str, int]]] = []
        self.context_start: list[int] = []
        self.inv: dict[str, set[int]] = {}
        for tid, t in enumerate(self.terms):
            m = re.match(r"^(.*?)\s*\(([^)]*)\)\s*$", t)
            main, ctx = (m.group(1), m.group(2)) if m else (t, "")
            toks = []
            for w in _WORD_SPLIT.split(main.lower()):
                if w:
                    toks.append(lemma_suffix(w))
            cstart = len(toks)
            for w in _WORD_SPLIT.split(ctx.lower()):
                if w:
                    toks.append(lemma_suffix(w))
            self.term_tokens.append(toks)
            self.context_start.append(cstart)
            for lem, suf in toks:
                if suf != SUF_STOPWORD:
                    self.inv.setdefault(lem, set()).add(tid)

    # -- extractTitleTokens (NLPUtil.pm:2303-2475) -------------------------
    def extract_tokens(
        self, title: str
    ) -> tuple[list[tuple[str, int]], list[int], list[float]]:
        """Kept (non-stop) tokens with per-token counts/weights of the
        stopwords skipped immediately before each; a piece boundary adds a
        +10 gap so no query window straddles it (NLPUtil.pm:2460-2466)."""
        lemmas: list[tuple[str, int]] = []
        gap_nums: list[int] = []
        gap_weights: list[float] = []
        gap_n, gap_w = 0, 0.0
        first_piece_token = True
        for piece in _PIECE_SPLIT.split(title or ""):
            if not piece or not re.search(r"[A-Za-z0-9]", piece):
                continue
            words = [w for w in _WORD_SPLIT.split(piece.lower()) if w]
            emitted = False
            for w in words:
                if w in _STOPSET:
                    gap_n += 1
                    gap_w += _GAP_WEIGHT.get(w, 1.0)
                    continue
                lemmas.append(lemma_suffix(w))
                gap_nums.append(gap_n)
                gap_weights.append(gap_w)
                gap_n, gap_w = 0, 0.0
                emitted = True
            if emitted or not first_piece_token:
                gap_n += 10
                gap_w += 10.0
            first_piece_token = False
        return lemmas, gap_nums, gap_weights

    # -- matchSnippet (ConceptNet.pm:3648-3822) ----------------------------
    def match_snippet(
        self,
        lemmas: list[tuple[str, int]],
        gap_nums: list[int],
        gap_weights: list[float],
    ) -> list[tuple[tuple[int, ...], list[int], float]]:
        """Maximal subsets of the window (last token required) whose
        posting-list intersections are non-empty. Returns
        [(token_positions, postings, gap_discount)]."""
        n = len(lemmas)
        if n == 0 or n > MATCH_TERM_WINDOW:
            return []
        words = [ls[0] for ls in lemmas]
        if len(set(words)) != n:  # duplicate word in window: empty result
            return []
        fixword = words[-1]
        if fixword not in self.inv or fixword not in self.tfiaf:
            return []
        fix_bit = 1 << (n - 1)
        posting_sets: dict[int, set[int]] = {fix_bit: self.inv[fixword]}
        for pos in range(n - 1):
            w = words[pos]
            if w not in self.inv or w not in self.tfiaf:
                continue
            domain = self.inv[w] & self.inv[fixword]
            if not domain:
                continue
            bit = 1 << pos
            for j in range(bit, bit * 2):
                comp = (j - bit) + fix_bit
                if comp == fix_bit:
                    posting_sets[j + fix_bit] = domain
                elif posting_sets.get(comp):
                    inter = domain & posting_sets[comp]
                    if inter:
                        posting_sets[j + fix_bit] = inter

        out: list[tuple[tuple[int, ...], list[int], float]] = []
        maxsets: list[int] = []
        covable: set[int] = set()
        for j in range((1 << n) - 1, fix_bit - 1, -1):
            postings = posting_sets.get(j)
            if not postings:
                continue
            idx = [p for p in range(n) if j >> p & 1]
            nonstop = 0
            gap_total_w = 0.0
            for a, b in zip(idx, idx[1:]):
                nonstop += b - a - 1
                for k in range(a + 1, b + 1):
                    gap_total_w += gap_weights[k]
            if nonstop * 2 + gap_total_w * 1.5 > 1.3 * len(idx):
                continue
            gap_discount = 1 - (nonstop * 2 + gap_total_w * 1.5) / (
                1 + 1.3 * len(idx)
            )
            covered = any(
                (j & sup) == j and (bin(j).count("1") < 2 or sup in covable)
                for sup in maxsets
            )
            if covered:
                continue
            maxsets.append(j)
            if bin(j).count("1") <= 2:
                covable.add(j)
            else:
                snip = {lemmas[p][0] for p in idx}
                for tid in postings:
                    cs = self.context_start[tid]
                    main_lems = {
                        lm
                        for lm, sf in self.term_tokens[tid][:cs]
                        if sf != SUF_STOPWORD
                    }
                    if not snip - main_lems:
                        covable.add(j)
                        break
            out.append((tuple(idx), sorted(postings), round(gap_discount, 2)))
        return out

    # -- calcMatchScore (ConceptNet.pm:4366-4736) --------------------------
    def calc_match_score(
        self, tid: int, q_lemmas: list[tuple[str, int]]
    ) -> float:
        toks = self.term_tokens[tid]
        cstart = self.context_start[tid]
        t_len = len(toks)
        w = len(q_lemmas)
        term_has_context = t_len > cstart
        suffix_discount = 1.0

        if w == 1:
            q_lem, q_suf = q_lemmas[0]
            lem0, suf0 = toks[0]
            # no partial match for 1-token queries (:4407-4412)
            if cstart > 1:
                return 0.0
            if cstart == 1:
                if q_suf == SUF_STOPWORD:
                    single_tfiaf = 0.0
                elif q_lem not in self.tfiaf:
                    single_tfiaf = MIN_VALID_1_QUERY_TOKEN_TFIAF + 1
                else:
                    single_tfiaf = self.tfiaf[q_lem]
                if (
                    t_len > 1
                    and re.search(r"[a-z]", q_lem)
                    and single_tfiaf < MIN_VALID_1_QUERY_TOKEN_TFIAF
                ):
                    return 0.0
                if lem0 != q_lem:  # matches only in context (:4445-4450)
                    return 0.0
                if suf0 != q_suf:  # diff-suffix single-token veto (:4456-4462)
                    return 0.0
                score = MATCH_1_TOKEN_QUERY_DISCOUNT
                if term_has_context:
                    score *= MATCH_1_TOKEN_QUERY_TO_TERM_WITH_CONTEXT_DISCOUNT
                return score * suffix_discount

        querywords = {lem: i + 1 for i, (lem, _s) in enumerate(q_lemmas)}
        w2 = sum(1 for _l, s in q_lemmas if s != SUF_STOPWORD)

        miss_weight = 0.0
        known = 0.0
        unknown = 0.0
        unmatched_stop_main = 0
        stop_main = 0
        match_seq: list[int] = []
        best_main: dict[str, float] = {}
        best_ctx: dict[str, float] = {}
        for i, (lem, suf) in enumerate(toks):
            in_ctx = i >= cstart
            ctx_disc = CONTEXT_MATCH_DISCOUNT if in_ctx else 1.0
            if suf == SUF_STOPWORD and not in_ctx:
                stop_main += 1
            qpos = querywords.get(lem)
            if qpos:
                q_suf = q_lemmas[qpos - 1][1]
                if suf == SUF_STOPWORD:
                    continue  # matched stopwords contribute nothing (:4527-4532)
                if suf == q_suf:
                    sms = 1.0
                else:
                    sms = DIFF_SUFFIX_DISCOUNT
                    suffix_discount *= DIFF_SUFFIX_DISCOUNT
                if not in_ctx:
                    match_seq.append(qpos)
                    if lem not in best_main or sms > best_main[lem]:
                        best_main[lem] = sms
                elif lem not in best_main:
                    match_seq.append(qpos)
                    if lem not in best_ctx or sms > best_ctx[lem]:
                        best_ctx[lem] = sms
            else:
                if lem in self.tfiaf:
                    known += ctx_disc
                    miss_weight += self.tfiaf[lem] * ctx_disc
                elif suf == SUF_STOPWORD:
                    if not in_ctx:
                        unmatched_stop_main += 1
                else:
                    unknown += ctx_disc

        main_wc = len(best_main)
        ctx_wc = len(best_ctx)
        if main_wc == 0:  # context-only match veto (:4598-4603)
            return 0.0
        if unknown >= 2:  # ≥2 unknown-token veto (:4605-4610)
            return 0.0

        full_weight = miss_weight * MATCH_MISS_TOKEN_PUNISHMENT
        match_weight = 0.0
        for lem in best_main:
            known += 1
            full_weight += self.tfiaf.get(lem, 0.0)
            match_weight += self.tfiaf.get(lem, 0.0)
        for lem in best_ctx:
            known += CONTEXT_MATCH_DISCOUNT
            full_weight += self.tfiaf.get(lem, 0.0) * CONTEXT_MATCH_DISCOUNT
            match_weight += self.tfiaf.get(lem, 0.0) * CONTEXT_MATCH_DISCOUNT
        if match_weight == 0 and miss_weight == 0:
            return 0.0

        unknown_weight_est = 0.0
        if unknown > 0 and known > 0:
            unknown_weight_est = (
                MATCH_UNKNOWN_TOKEN_WEIGHT * unknown * full_weight / known
            )
        frac = (
            suffix_discount
            * UNMATCHED_STOPWORD_DISCOUNT**unmatched_stop_main
            * match_weight
            / (full_weight + unknown_weight_est)
        )

        # 1-of-N partial match (:4676-4692)
        if main_wc == 1 and cstart > main_wc + stop_main:
            if w2 > 1:
                return 0.0
            if unknown == 0:
                frac *= MATCH_1_OF_N_TOKENS_DISCOUNT
        # single-token diff-suffix global discount (:4696-4703)
        if w == 1 and cstart == 1 and toks[0][1] != q_lemmas[0][1]:
            frac *= DIFF_SUFFIX_1_TOKEN_DISCOUNT
        # matched 1 main token, 0 context, term has context (:4705-4707)
        if main_wc == 1 and ctx_wc == 0 and term_has_context and cstart > 1:
            frac *= MATCH_1_MISS_CONTEXT_DISCOUNT

        inv = _inversions(match_seq)
        if inv:
            frac *= INVERSION_DISCOUNT**inv
        return round(frac, 4)

    # -- distributeMatches (ConceptNet.pm:3870-4041) -----------------------
    def distribute_matches(
        self, postings: list[int], scores: list[float], weight_thres: float = 0.01
    ) -> tuple[list[int], list[float]]:
        weight_thres = weight_thres or 0.01
        perfect = [p for p, s in zip(postings, scores) if s == 1.0]
        sel = {
            p: s
            for p, s in zip(postings, scores)
            if weight_thres <= s < 1.0
        }
        counted = sum(sel.values())
        perfect_scores: dict[int, float] = {}
        if perfect:
            if counted <= 1 - PERFECT_MATCH_LEAST_SCORE:
                share = (1 - counted) / len(perfect)
            else:
                scale = (1 - PERFECT_MATCH_LEAST_SCORE) / counted
                sel = {p: s * scale for p, s in sel.items()}
                share = PERFECT_MATCH_LEAST_SCORE / len(perfect)
            perfect_scores = {p: share for p in perfect}
        elif counted > 1:
            sel = {p: s / counted for p, s in sel.items()}
        if not sel and not perfect_scores:
            return [], []

        merged: dict[int, float] = {}
        for p, s in sel.items():
            tgt = self.parent.get(p, p)
            merged[tgt] = merged.get(tgt, 0.0) + s
        for p, s in perfect_scores.items():
            merged[p] = merged.get(p, 0.0) + s

        ordered = sorted(merged.items(), key=lambda kv: (-kv[1], kv[0]))
        out_p: list[int] = []
        out_s: list[float] = []
        for p, s in ordered:
            if s < MATCH_LEAST_FREQ_AFTER_ENTROPY_DISCOUNT:
                break
            out_p.append(p)
            out_s.append(s)
        if out_s and max(out_s) < SIGNIFICANT_MATCH_LEAST_SCORE:
            out_s = [s * ALL_BAD_MATCHES_DISCOUNT for s in out_s]
        return out_p, out_s

    # -- matchTitle (ConceptNet.pm:4043-4364) ------------------------------
    def match_title(
        self, title: str, weight_thres: float = 0.3
    ) -> dict[int, float]:
        """title → {term_id: best score} (recordBestMatches semantics:
        per-term max over windows, ConceptNet.pm:3822-3845)."""
        return {
            tid: w for tid, (w, _, _) in self.match_title_full(title, weight_thres).items()
        }

    def match_title_full(
        self, title: str, weight_thres: float = 0.3
    ) -> dict[int, tuple[float, tuple[int, ...], tuple[str, ...]]]:
        """title → {term_id: (best score, matched token indices, matched
        lemma sequence)} — the provenance the per-title concept vector
        carries (conceptVector hash value = [weight, token_indices,
        lemmas], ConceptNet.pm:6209-6219), feeding titleSetToVector's
        tokens/lemmas bookkeeping and removeOverlapTerms."""
        lemmas, gap_nums, gap_weights = self.extract_tokens(title)
        best: dict[int, tuple[float, tuple[int, ...], tuple[str, ...]]] = {}
        nw = len(lemmas)
        i = j = 0
        windows = []
        while j < nw:
            windows.append((i, j))
            if j >= MATCH_TERM_WINDOW - 1:
                i += 1
            j += 1
        for i, j in reversed(windows):
            for idx, postings, gap_discount in self.match_snippet(
                lemmas[i : j + 1], gap_nums[i : j + 1], gap_weights[i : j + 1]
            ):
                tok_idx = [p + i for p in idx]
                if len(tok_idx) > 1:
                    max_gap_w = max(gap_weights[p] for p in tok_idx[1:])
                    if max_gap_w > MAX_STOPWORD_GAP_WEIGHT_IN_QUERY:
                        continue
                if len(postings) > TOKEN_MAX_MATCH_TERMS:
                    continue
                win_lemmas = [lemmas[p] for p in tok_idx]
                scores = [
                    self.calc_match_score(tid, win_lemmas) * gap_discount
                    for tid in postings
                ]
                tids, freqs = self.distribute_matches(
                    postings, scores, weight_thres
                )
                for tid, f in zip(tids, freqs):
                    if f > 0 and (tid not in best or f > best[tid][0]):
                        best[tid] = (f, tuple(tok_idx), tuple(win_lemmas))
        return best


def _inversions(seq: list[int]) -> int:
    """Pairwise inversion count (calcMisalignment / calcInvNum0,
    ConceptNet.pm:4774-4840, duplicate-free path)."""
    inv = 0
    for a in range(len(seq)):
        for b in range(a + 1, len(seq)):
            if seq[a] > seq[b]:
                inv += 1
    return inv
