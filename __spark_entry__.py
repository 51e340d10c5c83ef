"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship KG pipeline at sf0.001; ``queries()`` /
``oracle_sql()`` expose one entry per implemented operator from SURVEY.md §2
(plus the training-data dedup/similarity/text-analysis operators), each with
a DuckDB-checkable ANSI-SQL oracle where SQL can express it.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full KG construction (mentions -> triples -> linking ->
    references -> canonicalization) over transcripts derived from the
    sf0.001 events table; returns the edges (triple) table."""
    from jcpg_spark.packaging import ship_package
    from jcpg_spark.plans.driver_queries import q_kg_full_pipeline

    ship_package(spark)
    return q_kg_full_pipeline(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from jcpg_spark.packaging import ship_package
    from jcpg_spark.plans.driver_queries import REGISTRY

    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            ship_package(spark)
            return fn(spark, sf_dir)

        return run

    return {name: wrap(fn) for name, (fn, _sql) in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    from jcpg_spark.plans.driver_queries import REGISTRY

    return {name: sql for name, (_fn, sql) in REGISTRY.items() if sql is not None}
