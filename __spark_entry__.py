"""Driver contract for the spark-graft builder (PySpark target).

``queries()``/``oracle_sql()`` are generated from the engine's query
catalog (slurm2sql_spark/catalog.py): one entry per implemented operator
from SURVEY.md §2, each paired with a DuckDB oracle twin where the
semantics are SQL-expressible.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from slurm2sql_spark.catalog import QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: synthesized sacct strings -> full ingest transform ->
    eff per-job efficiency rollup, at sf0.001."""
    return QUERIES["sacct_eff"].spark(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.spark for name, spec in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: spec.oracle
        for name, spec in QUERIES.items()
        if spec.oracle is not None
    }
