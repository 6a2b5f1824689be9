"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

All implementations live in the ``nyc_bikeshare_datawarehouse_spark``
package; this module only adapts them to the driver's interface.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from nyc_bikeshare_datawarehouse_spark.plans.oracles import ORACLES
from nyc_bikeshare_datawarehouse_spark.plans.queries import QUERIES, flagship


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Star join (lineitem ⋈ orders ⋈ customer ⋈ nation ⋈ region) with
    monthly revenue rollup — the reference warehouse's core analytical
    shape (SURVEY §7.1).
    """
    return flagship(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (see
    nyc_bikeshare_datawarehouse_spark/plans/queries.py)."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query; the LSH/ANN lattices, approx
    sketches, composed text pipeline, applyInPandas PCA, the image-DCT
    pHash, and the WAV audio codecs are intentionally absent
    (non-SQL-expressible -> rows-only checks, each pinned against a
    pure-Python replay in pytest)."""
    return dict(ORACLES)
