#!/usr/bin/env python
"""Regenerate the committed goldens for the non-SQL-expressible queries.

The driver can only rows-check queries without a DuckDB oracle;
`queries._assert_golden` turns that into a value check by comparing the
query output against these committed CSVs whenever the input dir has one.
Run this after an INTENTIONAL scoring change, eyeball the diff, and
commit: an unintentional change then fails the registered query loudly.

Usage: python scripts/regen_goldens.py [sf_dir ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

GOLDEN_QUERIES = ["concept_pair_simi", "concept_match_titles"]
DEFAULT_SF_DIRS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]


def main() -> None:
    from namedis_spark.queries import REGISTRY
    from namedis_spark.session import close_session, get_spark

    sf_dirs = sys.argv[1:] or DEFAULT_SF_DIRS
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "namedis_spark",
        "goldens",
    )
    os.makedirs(out_dir, exist_ok=True)

    spark = get_spark(app_name="regen-goldens", master="local[8]", shuffle_partitions=16)
    for sf_dir in sf_dirs:
        base = os.path.basename(sf_dir.rstrip("/"))
        for name in GOLDEN_QUERIES:
            # write the RAW query output (the assert wrapper normalizes);
            # temporarily bypass the wrapper by removing any stale golden
            path = os.path.join(out_dir, f"{name}_{base}.csv")
            if os.path.exists(path):
                os.remove(path)
            pdf = REGISTRY[name].spark_fn(spark, sf_dir).toPandas()
            pdf = pdf.sort_values(sorted(pdf.columns)).reset_index(drop=True)
            pdf.to_csv(path, index=False)
            print(f"wrote {path}: {len(pdf)} rows")
    close_session(spark)


if __name__ == "__main__":
    main()
