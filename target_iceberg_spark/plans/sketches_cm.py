"""Count-Min sketch point queries with an exact audit (SURVEY.md §2B
sketch tier, round 10).

The sketch tier has HLL++ (distinct), KLL-ish percentiles, bloom
membership and space-saving heavy hitters; the missing classic is
Cormode & Muthukrishnan's Count-Min (J. Algorithms 2005, public) —
the frequency-estimate sketch a 100 TB pipeline uses when the key
space (users, URLs, shingles) is too large for an exact count map.
CM's two properties are exactly hash-checkable one-sided contracts:
estimates NEVER undercount, and overcount at most eN/w with
probability 1 - e^-d.

Determinism: the d hash rows are md5(salt:key) — both engines derive
identical buckets, the sketch is a plain groupBy, and the audit joins
the exact top-N back against it, so the whole operator is
oracle-exact (no RNG anywhere).
"""

from __future__ import annotations

import math

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from target_iceberg_spark.plans.registry import register
from target_iceberg_spark.sources.tables import load_table

CM_D = 3  # hash rows (failure prob e^-3 ~ 5%)
CM_W = 256  # buckets per row (eps = e/w ~ 1.06%)
CM_TOP = 10  # exact heavy keys audited against the sketch
# e*N/w overcount bound, applied to the concrete N in-query:
CM_E = round(math.e, 6)


def _bucket_sql(salt_expr: str, key_expr: str) -> str:
    return (
        f"('0x' || substr(md5({salt_expr} || ':' || {key_expr}), 1, 8))::BIGINT"
        f" % {CM_W}"
    )


@register(
    "agg_countmin_sketch",
    oracle=f"""
WITH n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM events),
salts(salt) AS (VALUES (0), (1), (2)),
cells AS (
    SELECT s.salt,
           {_bucket_sql("s.salt", "e.user_id")} AS bucket,
           CAST(COUNT(*) AS BIGINT) AS cell
    FROM events e CROSS JOIN salts s
    GROUP BY 1, 2
),
exact AS (
    SELECT user_id, CAST(COUNT(*) AS BIGINT) AS exact_cnt
    FROM events GROUP BY user_id
    ORDER BY exact_cnt DESC, user_id LIMIT {CM_TOP}
),
est AS (
    SELECT x.user_id, x.exact_cnt, MIN(c.cell) AS cm_est
    FROM exact x CROSS JOIN salts s
    JOIN cells c
      ON c.salt = s.salt
     AND c.bucket = {_bucket_sql("s.salt", "x.user_id")}
    GROUP BY x.user_id, x.exact_cnt
)
SELECT e.user_id, e.exact_cnt, e.cm_est,
       e.cm_est >= e.exact_cnt AS no_underestimate,
       e.cm_est - e.exact_cnt
           <= CAST(CEIL({CM_E} * n.n / {CM_W}) AS BIGINT) AS within_eps_bound
FROM est e CROSS JOIN n
ORDER BY e.exact_cnt DESC, e.user_id
""",
    tags=("sketch", "approx", "frequency"),
)
def agg_countmin_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CM sketch over event user_ids (d={CM_D} md5 rows, w={CM_W}
    buckets) audited on the exact top-{CM_TOP} heavy users: point
    estimate = min over rows of the hashed cell, checked for the two
    CM contracts (no underestimate; overcount <= ceil(e*N/w)).

    Scale shape: the sketch build is ONE combinable groupBy of d*w
    bounded cells (the d-fold row expansion is a literal-array
    explode, map-side); the exact arm is a combinable count +
    TakeOrdered({CM_TOP}); the probe join broadcasts {CM_TOP}*d rows
    against the d*w-row sketch. Nothing in the plan grows with the
    key-space — that is the point of the sketch."""
    ev = load_table(spark, sf_dir, "events")
    salts = F.explode(F.array(*[F.lit(i) for i in range(CM_D)])).alias("salt")

    def bucket(salt_col, key_col):
        return (
            F.conv(
                F.substring(
                    F.md5(F.concat(salt_col.cast("string"), F.lit(":"), key_col.cast("string"))),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("bigint")
            % CM_W
        )

    cells = (
        ev.select("user_id", salts)
        .groupBy("salt", bucket(F.col("salt"), F.col("user_id")).alias("bucket"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("cell"))
    )
    exact = (
        ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("exact_cnt"))
        .orderBy(F.desc("exact_cnt"), "user_id")
        .limit(CM_TOP)
    )
    probes = exact.select("user_id", "exact_cnt", salts).select(
        "user_id",
        "exact_cnt",
        "salt",
        bucket(F.col("salt"), F.col("user_id")).alias("bucket"),
    )
    est = (
        F.broadcast(probes)
        .join(cells, ["salt", "bucket"])
        .groupBy("user_id", "exact_cnt")
        .agg(F.min("cell").alias("cm_est"))
    )
    n = ev.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    return (
        est.crossJoin(F.broadcast(n))
        .select(
            "user_id",
            "exact_cnt",
            "cm_est",
            (F.col("cm_est") >= F.col("exact_cnt")).alias("no_underestimate"),
            (
                F.col("cm_est") - F.col("exact_cnt")
                <= F.ceil(F.lit(CM_E) * F.col("n") / F.lit(CM_W)).cast("bigint")
            ).alias("within_eps_bound"),
        )
        .orderBy(F.desc("exact_cnt"), "user_id")
    )
