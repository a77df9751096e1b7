"""Bloom-filter join-pruning audit (SURVEY.md §2B profiling tier,
round-6 post-window).

At 100 TB the cheapest join optimization is often a Bloom filter built
on the small side's keys and pushed into the big side's scan (Spark's
own runtime row-group filtering does exactly this). This query builds
the filter AS RELATIONAL ALGEBRA — k md5-derived bit positions per
key, OR-folded into a words x 32-bit bitmap — probes it with known
non-members, and reports the OBSERVED false-positive rate next to the
theoretical (1 - e^{-kn/m})^k, so an engineer can size m/k before
trusting the pruning. Because the hash positions are md5-derived, the
entire filter and its audit are bit-reproducible across engines.
"""

from __future__ import annotations

import math

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from target_iceberg_spark.plans.registry import register
from target_iceberg_spark.sources.tables import load_table

BLOOM_M = 1 << 16  # bits (2048 x 32-bit words: max shift 31, which is
# overflow-safe as a signed BIGINT shift in BOTH engines — DuckDB
# raises on 1::BIGINT << 63, Spark silently wraps)
BLOOM_K = 4  # hash functions
BLOOM_PROBES = 4096  # known non-member probe keys


def _positions_sql(key_expr: str) -> str:
    """k bit positions per key: disjoint 8-hex-char words of one md5."""
    cols = []
    for j in range(BLOOM_K):
        h = (
            f"CAST(concat('0x', substr(md5(CAST({key_expr} AS VARCHAR)),"
            f" {j * 8 + 1}, 8)) AS BIGINT)"
        )
        cols.append(f"{h} % {BLOOM_M}")
    return ", ".join(cols)


@register(
    "profile_bloom_fpr",
    oracle=f"""
WITH member_pos AS (
    SELECT unnest([{_positions_sql("c_custkey")}]) AS p
    FROM customer
),
filter_words AS (
    SELECT p // 32 AS w, bit_or(1::BIGINT << CAST(p % 32 AS INT)) AS bits
    FROM member_pos GROUP BY p // 32
),
probes AS (
    SELECT 1000000 + unnest(range(0, {BLOOM_PROBES})) AS probe_key
),
probe_pos AS (
    SELECT probe_key, unnest([{_positions_sql("probe_key")}]) AS p
    FROM probes
),
probe_hits AS (
    SELECT pp.probe_key,
           CAST(COUNT(*) FILTER (
               WHERE fw.bits IS NOT NULL
                 AND (fw.bits >> CAST(pp.p % 32 AS INT)) & 1 = 1
           ) AS BIGINT) AS n_set
    FROM probe_pos pp
    LEFT JOIN filter_words fw ON pp.p // 32 = fw.w
    GROUP BY pp.probe_key
),
audit AS (
    SELECT CAST(COUNT(*) FILTER (WHERE n_set = {BLOOM_K}) AS BIGINT)
               AS false_positives,
           CAST(COUNT(*) AS BIGINT) AS n_probes
    FROM probe_hits
),
sizes AS (
    SELECT CAST(COUNT(DISTINCT c_custkey) AS BIGINT) AS n_keys FROM customer
)
SELECT n_keys,
       CAST((SELECT COUNT(*) FROM filter_words) AS BIGINT) AS words_used,
       false_positives, n_probes,
       ROUND(CAST(false_positives AS DOUBLE) / n_probes, 4) AS observed_fpr,
       ROUND(pow(1 - exp(-{BLOOM_K}.0 * n_keys / {BLOOM_M}), {BLOOM_K}), 4)
           AS theoretical_fpr
FROM audit, sizes
""",
    tags=("profiling", "bloom", "join-pruning"),
)
def profile_bloom_fpr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build a {BLOOM_M}-bit / {BLOOM_K}-hash Bloom filter over the
    customer keys as pure relational algebra (each key contributes
    {BLOOM_K} md5-derived bit positions; ONE combinable bit_or folds
    them into a 2048-word bitmap), probe it with {BLOOM_PROBES} keys
    known to be absent (offset past the key range), and report the
    observed false-positive rate next to the theoretical
    (1-e^(-kn/m))^k — the audit that decides whether a Bloom
    pre-filter is worth pushing into a 100 TB join's scan side, built
    so the filter itself is reusable relational state.

    Scale shape: positions leave each row as k integers (no strings
    shuffle); the bitmap is a combinable bit_or into at most m/32
    words (8 KB total — broadcastable to every probe task, which is
    the whole point of Bloom pruning); the probe side joins the word
    table on the word index and one grouped count per probe finishes
    the audit. All arithmetic is integer; the two output rates round
    exact ratios, so the row is engine-exact."""
    cust = load_table(spark, sf_dir, "customer")

    def positions(df: DataFrame, key: str) -> DataFrame:
        pos = F.array(
            *[
                F.expr(
                    f"cast(conv(substring(md5(cast({key} as string)),"
                    f" {j * 8 + 1}, 8), 16, 10) as bigint) % {BLOOM_M}"
                )
                for j in range(BLOOM_K)
            ]
        )
        return df.select(key, F.explode(pos).alias("p"))

    member_pos = positions(cust.select("c_custkey"), "c_custkey")
    filter_words = member_pos.groupBy(
        (F.col("p") / 32).cast("bigint").alias("w")
    ).agg(
        F.expr("bit_or(shiftleft(cast(1 as bigint), cast(p % 32 as int)))")
        .alias("bits")
    )
    probes = spark.range(0, BLOOM_PROBES).select(
        (F.col("id") + 1000000).alias("probe_key")
    )
    probe_pos = positions(probes, "probe_key")
    probe_hits = (
        probe_pos.join(
            F.broadcast(filter_words),
            (F.col("p") / 32).cast("bigint") == F.col("w"),
            "left",
        )
        .groupBy("probe_key")
        .agg(
            F.expr(
                "cast(count(if(bits is not null and"
                " (shiftright(bits, cast(p % 32 as int)) & 1) = 1,"
                " 1, null)) as bigint)"
            ).alias("n_set")
        )
    )
    audit = probe_hits.agg(
        F.count(F.when(F.col("n_set") == BLOOM_K, 1))
        .cast("bigint")
        .alias("false_positives"),
        F.count(F.lit(1)).cast("bigint").alias("n_probes"),
    )
    sizes = cust.agg(
        F.countDistinct("c_custkey").cast("bigint").alias("n_keys")
    )
    words_used = filter_words.agg(
        F.count(F.lit(1)).cast("bigint").alias("words_used")
    )
    theo = F.round(
        F.pow(
            F.lit(1.0)
            - F.exp(-F.lit(float(BLOOM_K)) * F.col("n_keys") / F.lit(BLOOM_M)),
            F.lit(BLOOM_K),
        ),
        4,
    )
    return (
        audit.crossJoin(F.broadcast(sizes))
        .crossJoin(F.broadcast(words_used))
        .select(
            "n_keys",
            "words_used",
            "false_positives",
            "n_probes",
            F.round(
                F.col("false_positives").cast("double") / F.col("n_probes"), 4
            ).alias("observed_fpr"),
            theo.alias("theoretical_fpr"),
        )
    )


assert BLOOM_M % 32 == 0
assert math.log2(BLOOM_M) == int(math.log2(BLOOM_M))
