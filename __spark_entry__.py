"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over :mod:`nbi_oedi_etl_v2_spark.workload`, the named-query
registry that binds every implemented SURVEY §2 operator (plus the
north-star extensions) to the driver's synthetic tables, each paired
with its DuckDB oracle SQL.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from nbi_oedi_etl_v2_spark import workload  # noqa: E402

FLAGSHIP_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return workload.REGISTRY["q1_pricing_summary"].fn(spark, FLAGSHIP_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return workload.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL for each SQL-expressible query."""
    return workload.oracle_sql()
