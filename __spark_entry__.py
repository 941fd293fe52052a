"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship fused-search query at sf0.001;
``queries()`` / ``oracle_sql()`` expose every implemented operator
from SURVEY.md §2 for the driver's DuckDB differential check.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from fuserank_spark import queries as _q
from fuserank_spark import ext_queries as _ext  # noqa: F401 — registers extension queries

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: fused multimodal vector search over documents+embeddings
    (falls back to the relational join flagship until the fused path lands).
    """
    try:
        from fuserank_spark.flagship import flagship_query

        return flagship_query(spark, SF0001)
    except ImportError:
        return _q.q_join(spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _q.queries()


def oracle_sql() -> dict[str, str]:
    return _q.oracle_sql()
