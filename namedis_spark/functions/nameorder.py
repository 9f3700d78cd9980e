"""Chinese-name order (reversal) vote — testChnNameReverse port.

The reference decides PER PUBLICATION whether its Chinese author names are
written surname-first ("reversed") or given-name-first ("forward"), using
three signals (NLPUtil.pm:1750-1851):

* hyphenation: a hyphenated part is a two-char given name — hyphen in the
  first part ⇒ forward, in the second ⇒ reversed;
* a two-syllable (concatenated) part that is not a two-char surname and
  not a single Cantonese syllable is a given name — in the second
  position ⇒ reversed, in the first ⇒ forward;
* for plain single-syllable/single-syllable names, the surname/givenname
  log-likelihood vote: forwardLL += logP_surname(second) +
  logP_given(first), reverseLL += logP_surname(first) + logP_given(second),
  accumulated over all the record's Chinese names; a part missing from a
  probability table forces the corresponding sure-flag.

Verdict: -1 when the sure-flags conflict (suspicious record), 1 when
reversed, 0 otherwise (forward wins log-likelihood ties).

Log-likelihood contributions are accumulated in 1e-6 fixed point so the
verdict is bit-stable across engines and summation orders (the DuckDB
oracle replays the same integer sums).
"""

from __future__ import annotations

import math

from namedis_spark.functions.text import (
    TWOCHAR_SURNAMES,
    _C_SYLLABLES,
    _SYLLABLES,
    _syllable_count,
    chinese_name_chars,
)


def _micro(x: float) -> int:
    """round-half-up in 1e-6 fixed point (identical to the SQL twin's
    CAST(floor(x * 1e6 + 0.5) AS bigint))."""
    return math.floor(x * 1e6 + 0.5)


def name_reverse_vote(
    names: list[str],
    log_surname_prob: dict[str, float],
    log_given_prob: dict[str, float],
) -> int:
    """Port of testChnNameReverse (NLPUtil.pm:1750-1851) over one record's
    name list. Returns -1 (conflicting evidence), 1 (reversed:
    surname-first), or 0 (forward / undecidable / no Chinese names)."""
    sure_reversed = False
    sure_not_reversed = False
    chn_count = 0
    forward_ll = 0
    reverse_ll = 0

    for name in names or []:
        if not name:
            continue
        name = name.strip()
        if not chinese_name_chars(name):
            continue
        chn_count += 1
        parts = name.lower().split()
        if len(parts) != 2:
            continue
        first, second = parts
        if "-" in first and "-" not in second:
            sure_not_reversed = True
        if "-" in second and "-" not in first:
            sure_reversed = True
        first = first.replace("-", "")
        second = second.replace("-", "")
        pin1 = _syllable_count(first, _SYLLABLES)
        pin2 = _syllable_count(second, _SYLLABLES)
        if pin2 == 2 and second not in TWOCHAR_SURNAMES:
            if _syllable_count(second, _C_SYLLABLES) != 1:
                sure_reversed = True
        if pin1 == 2 and first not in TWOCHAR_SURNAMES:
            if _syllable_count(first, _C_SYLLABLES) != 1:
                sure_not_reversed = True
        if (log_surname_prob or log_given_prob) and pin1 == 1 and pin2 == 1:
            asymmetric = False
            if second not in log_surname_prob or first not in log_given_prob:
                sure_reversed = True
                asymmetric = True
            if first not in log_surname_prob or second not in log_given_prob:
                sure_not_reversed = True
                asymmetric = True
            if not asymmetric:
                forward_ll += _micro(log_surname_prob[second]) + _micro(
                    log_given_prob[first]
                )
                reverse_ll += _micro(log_surname_prob[first]) + _micro(
                    log_given_prob[second]
                )

    if chn_count == 0:
        return 0
    if sure_reversed and sure_not_reversed:
        return -1
    if sure_reversed:
        return 1
    if sure_not_reversed:
        return 0
    return 0 if forward_ll >= reverse_ll else 1


def orient_name(surface: str | None, vote: int) -> str | None:
    """Canonical given-name-first orientation of a two-part surface:
    swap the parts when the record's vote says reversed. Non-two-part
    surfaces and non-positive votes pass through unchanged."""
    if not surface or vote != 1:
        return surface
    parts = surface.split()
    if len(parts) != 2:
        return surface
    return parts[1] + " " + parts[0]


# ---------------------------------------------------------------------------
# Deterministic pinyin-surface derivation for the registered vote query:
# the events-derived transcripts carry no Chinese name surfaces, so the
# query derives two per conversation from a portable md5 hash over a fixed
# 64-syllable pool — every 7th conversation gets a hyphenated given name
# ("mei-ling chen" shape), every 11th a concatenated two-syllable second
# part ("wang xiaoming" shape), the rest plain single/single names. Both
# engines regenerate identical surfaces from the same arithmetic.
# ---------------------------------------------------------------------------


def name_pool() -> tuple[str, ...]:
    """64 deterministic pool syllables (sorted multi-letter pinyin)."""
    from namedis_spark.functions.text import pinyin_syllables

    return tuple(sorted(s for s in pinyin_syllables() if len(s) >= 2))[:64]


def derived_name_exprs(dialect: str, conv: str = "conv_id") -> tuple[str, str]:
    """SQL for the two derived surfaces (name1 typed by the hash, name2
    always plain). Identical integer arithmetic in both dialects."""
    pool = name_pool()
    if dialect == "spark":
        arr = "array(" + ", ".join(f"'{s}'" for s in pool) + ")"
        h1 = f"cast(conv(substring(md5({conv}), 1, 7), 16, 10) as bigint)"
        h2 = f"cast(conv(substring(md5(concat({conv}, '#2')), 1, 7), 16, 10) as bigint)"
        el = lambda k: f"element_at({arr}, cast({k} as int) + 1)"  # noqa: E731
        div = "div"
    else:
        arr = "[" + ", ".join(f"'{s}'" for s in pool) + "]"
        h1 = f"CAST(concat('0x', substring(md5({conv}), 1, 7)) AS bigint)"
        h2 = f"CAST(concat('0x', substring(md5({conv} || '#2'), 1, 7)) AS bigint)"
        el = lambda k: f"{arr}[CAST({k} AS int) + 1]"  # noqa: E731
        div = "//"
    a = el(f"(({h1} {div} 2) % 64)")
    b = el(f"(({h1} {div} 128) % 64)")
    c = el(f"(({h1} {div} 8192) % 64)")
    d = el(f"(({h2} {div} 2) % 64)")
    e = el(f"(({h2} {div} 128) % 64)")
    name1 = (
        f"CASE WHEN {h1} % 7 = 0 THEN {a} || '-' || {b} || ' ' || {c}"
        f" WHEN {h1} % 11 = 0 THEN {a} || ' ' || {b} || {c}"
        f" ELSE {a} || ' ' || {b} END"
    )
    name2 = f"{d} || ' ' || {e}"
    return name1, name2
