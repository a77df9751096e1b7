"""Skyline (Pareto-front) query — the multi-criteria shortlist
operator (SURVEY.md §2B engine extension, after the EDBT 2023
Spark-SQL skyline integration retrieved in PAPERS.md).

"Cheapest-and-biggest" shortlists with no scoring function: a line
item is on the skyline iff no other item is at-most-as-expensive AND
at-least-as-large with one strict. `operators/skyline.py` runs it as
the distributive two-phase sweep; the oracle mirrors the same
O(n log n) window formulation instead of the O(N²) NOT EXISTS."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from target_iceberg_spark.plans.registry import register
from target_iceberg_spark.sources.tables import load_table


@register(
    "skyline_pareto",
    oracle="""
WITH pts AS (
    SELECT l_orderkey, l_linenumber,
           l_extendedprice AS price, l_quantity AS qty
    FROM lineitem
    WHERE l_extendedprice IS NOT NULL AND l_quantity IS NOT NULL
),
g AS (
    SELECT *, MAX(qty) OVER (PARTITION BY price) AS gmax FROM pts
),
d AS (SELECT DISTINCT price, gmax FROM g),
p AS (
    SELECT price,
           MAX(gmax) OVER (ORDER BY price
                           ROWS BETWEEN UNBOUNDED PRECEDING
                           AND 1 PRECEDING) AS pmax
    FROM d
)
SELECT g.l_orderkey, g.l_linenumber, g.price, g.qty
FROM g JOIN p USING (price)
WHERE g.qty = g.gmax AND (p.pmax IS NULL OR g.qty > p.pmax)
ORDER BY g.price, g.l_orderkey, g.l_linenumber
""",
    tags=("skyline", "pareto"),
)
def skyline_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto front of line items: minimize extended price, maximize
    quantity — every row no other row beats on both axes (ties on
    both coordinates all kept; standard strict-in-one dominance).

    Scale shape (`operators/skyline.py`): skyline is DISTRIBUTIVE, so
    phase 1 sweeps each partition locally (Arrow-batched O(n log n),
    ZERO shuffle) and phase 2 re-sweeps only the union of the tiny
    local fronts in one small task — the naive NOT-EXISTS dominance
    self-join is O(N²) and never planned. The oracle mirrors the same
    sweep with two window passes (per-price group max + prefix max
    over strictly cheaper prices), which is how the answer stays
    hash-exact without the quadratic oracle either."""
    from target_iceberg_spark.operators.skyline import skyline_2d

    li = (
        load_table(spark, sf_dir, "lineitem")
        .select(
            "l_orderkey",
            "l_linenumber",
            F.col("l_extendedprice").alias("price"),
            F.col("l_quantity").alias("qty"),
        )
    )
    return skyline_2d(li, "price", "qty").orderBy(
        "price", "l_orderkey", "l_linenumber"
    )
