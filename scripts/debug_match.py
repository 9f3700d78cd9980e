#!/usr/bin/env python
"""One-shot matcher triage: show how a snippet tokenizes and which
taxonomy concepts it matches, with full provenance.

Batch replacement for the reference's interactive debug-match REPL
(clust.pl:1094-1229 `debugMatch`; ConceptNet.pm:6360+): instead of a
long-lived prompt, run one text through the exact production
`ConceptMatcher` and dump every intermediate the REPL would have shown —
kept tokens with lemma/suffix and stopword-gap bookkeeping, the inverted
index's candidate terms, and the per-term best match with score, matched
token indices, and matched lemma sequence.

No Spark session needed by default: the taxonomy is the same
deterministic `_CONCEPT_TERMS` list the registered queries use, and the
tfiaf table falls back to uniform weights unless a corpus directory is
given (then idf weights are computed from documents.parquet via DuckDB —
same formula as `concept_match_titles`, no JVM startup for a triage
one-liner).

Usage:
    python scripts/debug_match.py "streaming hash join over row groups"
    python scripts/debug_match.py --sf-dir /root/testdata/sf0.01 "..."
    echo "text" | python scripts/debug_match.py
"""

from __future__ import annotations

import argparse
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from namedis_spark.functions.matcher import (  # noqa: E402
    SUF_ED,
    SUF_ING,
    SUF_NONE,
    SUF_S,
    SUF_STOPWORD,
    SUF_Y,
    ConceptMatcher,
    lemma_suffix,
)

_SUF_NAMES = {
    SUF_NONE: "exact",
    SUF_ING: "-ing",
    SUF_ED: "-ed",
    SUF_S: "-s",
    SUF_Y: "-ies",
    SUF_STOPWORD: "stopword",
}


def _tfiaf_from_corpus(sf_dir: str, terms: list[str]) -> dict[str, float]:
    """idf + 0.5 over documents.parquet, restricted to taxonomy vocabulary
    (the same pruned-df construction as queries.concept_match_titles)."""
    import duckdb

    words = {
        w for t in terms for w in t.replace("(", " ").replace(")", " ").lower().split()
    }
    vocab = sorted(words | {lemma_suffix(w)[0] for w in words})
    con = duckdb.connect()
    placeholders = ", ".join("?" for _ in vocab)
    rows = con.execute(
        f"""
        WITH w AS (
            SELECT unnest(string_split(lower(text), ' ')) AS w
            FROM '{sf_dir}/documents.parquet'
        )
        SELECT w, count(*) AS df FROM w
        WHERE w <> '' AND w IN ({placeholders}) GROUP BY w
        """,
        vocab,
    ).fetchall()
    n = con.execute(
        f"SELECT count(*) FROM '{sf_dir}/documents.parquet'"
    ).fetchone()[0]
    return {w: round(math.log(float(n) / df) + 0.5, 6) for w, df in rows}


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("text", nargs="*", help="snippet to match (default: stdin)")
    ap.add_argument("--sf-dir", help="corpus dir for idf weights (else uniform 1.0)")
    ap.add_argument("--terms-file", help="newline-separated taxonomy override")
    ap.add_argument("--weight-thres", type=float, default=0.3)
    args = ap.parse_args()

    text = " ".join(args.text) if args.text else sys.stdin.read()
    text = text.strip()
    if not text:
        ap.error("no input text")

    if args.terms_file:
        with open(args.terms_file) as f:
            terms = [ln.strip() for ln in f if ln.strip()]
    else:
        from namedis_spark.queries import _CONCEPT_TERMS as terms  # type: ignore

    if args.sf_dir:
        tfiaf = _tfiaf_from_corpus(args.sf_dir, terms)
    else:
        tfiaf = {}
        for t in terms:
            for w in t.replace("(", " ").replace(")", " ").lower().split():
                tfiaf.setdefault(lemma_suffix(w)[0], 1.0)

    m = ConceptMatcher(terms, tfiaf)

    lemmas, gap_nums, gap_weights = m.extract_tokens(text)
    print(f"input: {text!r}")
    print(f"\ntokens ({len(lemmas)} kept):")
    print(f"  {'#':>3} {'lemma':<20} {'kind':<9} {'gap_n':>5} {'gap_w':>6} tfiaf")
    for i, ((lem, suf), gn, gw) in enumerate(zip(lemmas, gap_nums, gap_weights)):
        print(
            f"  {i:>3} {lem:<20} {_SUF_NAMES.get(suf, suf):<9} {gn:>5} {gw:>6.1f}"
            f" {m.tfiaf.get(lem, float('nan')):.4f}"
        )

    cand = sorted({tid for (lem, _suf) in lemmas for tid in m.inv.get(lem, ())})
    print(f"\ninverted-index candidates ({len(cand)}):")
    for tid in cand:
        print(f"  [{tid:>2}] {m.terms[tid]}")

    best = m.match_title_full(text, weight_thres=args.weight_thres)
    print(f"\nmatches at weight_thres={args.weight_thres} ({len(best)}):")
    for tid, (score, tok_idx, win_lemmas) in sorted(
        best.items(), key=lambda kv: -kv[1][0]
    ):
        toks = ", ".join(f"{i}:{l[0]}" for i, l in zip(tok_idx, win_lemmas))
        print(f"  {score:7.4f}  [{tid:>2}] {m.terms[tid]:<40} via {toks}")
    if not best:
        print("  (none)")


if __name__ == "__main__":
    main()
