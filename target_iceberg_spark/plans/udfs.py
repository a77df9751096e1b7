"""User-defined function plans (SURVEY.md §2B).

The reference has NO user-extensible function surface (SURVEY §2 end)
— this is the engine's. Both demos are Arrow-batched pandas UDFs
(vectorized transfer, never row-at-a-time pickling); they exist to
prove the UDF machinery, with the explicit note that for these
particular computations the built-in expressions used everywhere else
in plans/ are the right choice — UDFs are the slow path.
"""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.functions import pandas_udf

from target_iceberg_spark.plans.registry import register
from target_iceberg_spark.sources.tables import load_table


def _make_net_price():
    """Series->Series scalar pandas UDF (per-row arithmetic is exact, so
    the DuckDB oracle matches bit-for-bit). Built lazily — pandas_udf
    type resolution needs an active session."""

    @pandas_udf("double")
    def _net_price(price: pd.Series, discount: pd.Series) -> pd.Series:
        return price * (1.0 - discount)

    return _net_price


@register(
    "udf_scalar",
    oracle="""
SELECT l_orderkey, l_linenumber,
       l_extendedprice * (1 - l_discount) AS net_price
FROM lineitem
WHERE l_quantity >= 48
""",
    tags=("udf",),
)
def udf_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar pandas UDF: discounted price, Arrow-batched."""
    li = load_table(spark, sf_dir, "lineitem")
    net_price = _make_net_price()
    return li.where(F.col("l_quantity") >= 48).select(
        "l_orderkey",
        "l_linenumber",
        net_price("l_extendedprice", "l_discount").alias("net_price"),
    )


def _make_weighted_avg_price():
    """Grouped-agg pandas UDF: quantity-weighted mean price."""

    @pandas_udf("double")
    def _weighted_avg_price(price: pd.Series, qty: pd.Series) -> float:
        return float((price * qty).sum() / qty.sum())

    return _weighted_avg_price


@register(
    "udf_grouped_agg",
    oracle="""
SELECT l_returnflag,
       ROUND(SUM(l_extendedprice * l_quantity) / SUM(l_quantity), 2) AS wavg_price
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
    tags=("udf",),
)
def udf_grouped_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-aggregate pandas UDF (one Arrow batch per group)."""
    li = load_table(spark, sf_dir, "lineitem")
    wavg = _make_weighted_avg_price()
    return (
        li.groupBy("l_returnflag")
        .agg(F.round(wavg("l_extendedprice", "l_quantity"), 2).alias("wavg_price"))
        .orderBy("l_returnflag")
    )
