"""Driver contract for the spark-graft builder (PySpark target).

Thin wrapper over namedis_spark.queries — the registry pairing every
SQL-expressible operator from SURVEY.md §2 with a DuckDB oracle. The
flagship `entry` runs the blocking → scoring-lite → connected-components
linkage over transcripts derived from the sf0.001 events table.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from namedis_spark.queries import REGISTRY

    return REGISTRY["flagship_linkage"].spark_fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from namedis_spark.queries import entries

    return entries()


def oracle_sql() -> dict[str, str]:
    from namedis_spark.queries import oracles

    return oracles()
