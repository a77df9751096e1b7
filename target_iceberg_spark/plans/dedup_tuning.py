"""LSH operating-point tuning for the MinHash dedup pipeline
(SURVEY.md §2B dedup tier, round-6 post-window).

Choosing the band count is THE precision/recall dial of MinHash LSH:
with H hashes split into b bands of r = H/b rows, a pair of Jaccard
similarity s collides with probability 1 − (1 − s^r)^b (the S-curve;
Leskovec-Rajaraman-Ullman MMDS ch.3, public). Operators pick b by
measuring, not by faith — this query computes, from ONE shared
signature pass, the observed candidate volume and bucket-occupancy
profile of every candidate configuration, which is exactly the
evidence needed to set the dial before a 100 TB dedup run.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from target_iceberg_spark.operators.dedup import (
    lsh_band_keys,
    minhash_signatures,
    shingle_table,
)
from target_iceberg_spark.plans.dedup_sql import NUM_HASHES, _shingle_cte
from target_iceberg_spark.plans.registry import register
from target_iceberg_spark.sources.tables import load_table

SWEEP_BANDS = (2, 4, 8)  # rows/band = 8, 4, 2 over the 16-hash signature


def _sweep_oracle() -> str:
    mins = ",\n           ".join(
        f"MIN((h1 + {j} * h2) % 4294967296) AS s{j}"
        for j in range(NUM_HASHES)
    )
    per_cfg = []
    for b in SWEEP_BANDS:
        rows = NUM_HASHES // b
        long_form = "\n        UNION ALL ".join(
            "SELECT doc_id, "
            f"{i} AS band_idx, md5("
            + " || ':' || ".join(
                f"s{i * rows + r}::VARCHAR" for r in range(rows)
            )
            + ") AS band_key FROM sig"
            for i in range(b)
        )
        per_cfg.append(
            f"""
    SELECT {b} AS bands, {rows} AS rows_per_band,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM (
               SELECT band_idx, band_key FROM ({long_form})
               GROUP BY band_idx, band_key HAVING COUNT(*) >= 2))
               AS n_multi_buckets,
           (SELECT CAST(MAX(n) AS BIGINT) FROM (
               SELECT COUNT(*) AS n FROM ({long_form})
               GROUP BY band_idx, band_key)) AS max_bucket,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM (
               SELECT DISTINCT a.doc_id, b.doc_id FROM
                   ({long_form}) a JOIN ({long_form}) b
                 ON a.band_idx = b.band_idx AND a.band_key = b.band_key
                AND a.doc_id < b.doc_id)) AS n_cand_pairs"""
        )
    return f"""
WITH {_shingle_cte()},
shh AS (
    SELECT doc_id,
           ('0x' || substr(md5(shingle), 1, 8))::BIGINT AS h1,
           (('0x' || substr(md5(shingle), 9, 8))::BIGINT | 1) AS h2
    FROM sh
),
sig AS (
    SELECT doc_id,
           {mins}
    FROM shh GROUP BY doc_id
)
SELECT * FROM ({" UNION ALL ".join(per_cfg)})
ORDER BY bands
"""


@register(
    "dedup_lsh_band_sweep",
    oracle=_sweep_oracle(),
    tags=("dedup", "lsh", "tuning"),
)
def dedup_lsh_band_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Operating-point sweep for MinHash LSH over the SAME
    {NUM_HASHES}-hash signatures: for every band count in
    {SWEEP_BANDS} (rows/band = {NUM_HASHES}/b), the occupied
    multi-member bucket count, the largest bucket (the skew unit a
    bucket cap must bound), and the DISTINCT candidate-pair volume —
    more bands = lower similarity threshold = more candidates; this
    row set is the measured version of the 1−(1−s^r)^b curve that
    decides the production dial.

    Scale shape: the expensive stages run ONCE — one shingle pass and
    one combinable signature aggregate (localCheckpoint'ed: every
    config re-reads the |docs| x {NUM_HASHES} signature frame, not the
    corpus); each config then re-keys signatures map-side (md5 over
    r columns), counts buckets combinably, and counts distinct pairs
    through the SAME bucket equi-join dedup_minhash runs — bounded by
    bucket occupancy, never all-pairs. Configs are independent
    branches unioned into a {len(SWEEP_BANDS)}-row report."""
    docs = load_table(spark, sf_dir, "documents")
    sig = minhash_signatures(
        shingle_table(docs, "doc_id", "text", n=3), "doc_id", NUM_HASHES
    ).localCheckpoint()
    out = None
    for b in SWEEP_BANDS:
        keys = lsh_band_keys(sig, "doc_id", NUM_HASHES, b)
        buckets = keys.groupBy("band_idx", "band_key").agg(
            F.count(F.lit(1)).alias("n")
        )
        occupancy = buckets.agg(
            F.lit(b).alias("bands"),
            F.lit(NUM_HASHES // b).alias("rows_per_band"),
            F.sum(F.when(F.col("n") >= 2, 1).otherwise(0))
            .cast("bigint")
            .alias("n_multi_buckets"),
            F.max("n").cast("bigint").alias("max_bucket"),
        )
        a, c = keys.alias("a"), keys.alias("c")
        pairs = (
            a.join(
                c,
                (F.col("a.band_idx") == F.col("c.band_idx"))
                & (F.col("a.band_key") == F.col("c.band_key"))
                & (F.col("a.doc_id") < F.col("c.doc_id")),
            )
            .select(F.col("a.doc_id").alias("x"), F.col("c.doc_id").alias("y"))
            .distinct()
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_cand_pairs"))
        )
        row = occupancy.crossJoin(F.broadcast(pairs))
        out = row if out is None else out.unionAll(row)
    return out.orderBy("bands")
