"""DoReMi-style domain-mixture reweighting (SURVEY.md §2B curation
north star, round 12).

The mixing tier so far is STATIC optimizers — proportional/temperature
shares (curation_domain_mix, curation_mix_temperature), fractional
knapsack (curation_mix_knapsack), two-phase anneal
(curation_mix_anneal). DoReMi (Xie et al., "DoReMi: Optimizing Data
Mixtures Speeds Up Language Model Pretraining", NeurIPS 2023 — public)
closes the loop: domain weights follow an EXPONENTIATED-GRADIENT
ascent on per-domain EXCESS LOSS (how much worse the proxy model does
on a domain than the reference), so hard-for-the-model domains get
upweighted. This query is that update rule, unrolled:

    excess_s = max(ce_s - ce_ref, 0)            (clipped excess loss)
    alpha_0  = baseline token share
    alpha_t+1 ∝ alpha_t * exp(eta * excess_s)    (EG step, renormalized)
    weight   = (1 - eps) * alpha_T + eps / |S|   (uniform smoothing)

The loss signal is the SAME per-doc KN cross-entropy the perplexity
filter scores (text_kn_perplexity / text_kneser_ney's shared stage) —
corpus-fit KN as the "reference", per-source mean ce as the domain
loss, corpus mean ce as the reference loss. With a static excess the
unrolled EG converges toward the softmax-tilted share; the point here
is the faithful update SHAPE with every step's arithmetic
oracle-checked (each step rounds alpha to 6 so both engines enter the
next step with identical doubles — the agg_gmm_em / IRLS discipline).

Scale shape: the only corpus-sized stages are the shared KN scoring
join, ONE combinable per-doc aggregate, and ONE rollup pass that emits
the per-source rows and the all-docs reference row together; the
rollup result is localCheckpoint-ed at |sources|+1 rows, so the
{DR_STEPS} EG steps and their one-row normalizer crosses never re-run
the corpus pipeline (no unpartitioned windows on the Spark side; the
oracle's SUM() OVER () runs over the same |sources| rows).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from target_iceberg_spark.plans.registry import register
from target_iceberg_spark.plans.text_kneser_ney import KN_SCORED_CTES, kn_scored

DR_ETA = 1.0  # EG step size (eta in Xie et al. 2023 Algorithm 1)
DR_STEPS = 4  # unrolled update steps
DR_EPS = 0.05  # uniform smoothing mass on the final weights


def _eg_steps_sql() -> str:
    """s1..sT CTEs: one renormalized EG step each, alpha rounded to 6
    at every boundary (identical to the Spark loop below)."""
    ctes = []
    for t in range(1, DR_STEPS + 1):
        ctes.append(
            f"""s{t} AS (
    SELECT source, n_docs, n_tokens, ce, share, excess, tilt,
           ROUND(ROUND(alpha * tilt, 6)
                 / SUM(ROUND(alpha * tilt, 6)) OVER (), 6) AS alpha
    FROM s{t - 1}
)"""
        )
    return ",\n".join(ctes)


@register(
    "curation_domain_reweight",
    oracle=f"""
WITH {KN_SCORED_CTES},
per_doc AS (
    SELECT source, doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_bg,
           ROUND(AVG(nll), 6) AS ce
    FROM scored GROUP BY source, doc_id
),
ref AS (SELECT ROUND(AVG(ce), 6) AS ce_ref FROM per_doc),
dom AS (
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_bg) AS BIGINT) AS n_tokens,
           ROUND(AVG(ce), 6) AS ce
    FROM per_doc GROUP BY source
),
tot AS (
    SELECT CAST(SUM(n_tokens) AS DOUBLE) AS tot_tokens,
           CAST(COUNT(*) AS DOUBLE) AS k
    FROM dom
),
s0 AS (
    SELECT d.source, d.n_docs, d.n_tokens, d.ce,
           ROUND(d.n_tokens / t.tot_tokens, 6) AS share,
           ROUND(GREATEST(d.ce - r.ce_ref, 0), 6) AS excess,
           ROUND(EXP({DR_ETA!r}
                     * ROUND(GREATEST(d.ce - r.ce_ref, 0), 6)), 6) AS tilt,
           ROUND(d.n_tokens / t.tot_tokens, 6) AS alpha
    FROM dom d CROSS JOIN ref r CROSS JOIN tot t
),
{_eg_steps_sql()}
SELECT s.source, s.n_docs, s.n_tokens, s.ce, s.share, s.excess,
       s.alpha AS alpha_eg,
       ROUND((1 - {DR_EPS!r}) * s.alpha + {DR_EPS!r} / t.k, 6) AS weight,
       ROUND(ROUND((1 - {DR_EPS!r}) * s.alpha + {DR_EPS!r} / t.k, 6)
             / s.share, 4) AS boost
FROM s{DR_STEPS} s CROSS JOIN tot t
ORDER BY s.source
""",
    tags=("curation", "mixing", "doremi", "eg", "lm"),
)
def curation_domain_reweight(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source DoReMi mixture weights: {DR_STEPS} unrolled
    exponentiated-gradient steps (eta {DR_ETA}) on clipped KN
    excess loss (per-source mean ce minus corpus mean ce), initialized
    at the baseline token share and smoothed with {DR_EPS} uniform
    mass — plus the boost ratio against the proportional baseline.

    Scale shape: shared KN scoring join + one per-doc aggregate + one
    checkpointed rollup (per-source rows and the reference row in a
    single pass) are the only corpus-sized stages; the EG loop runs
    over the |sources|-row table with broadcast one-row normalizers,
    alpha re-rounded to 6 at every step boundary so the oracle's
    identical unrolled steps see identical doubles."""
    scored = kn_scored(spark, sf_dir)
    per_doc = scored.groupBy("source", "doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_bg"),
        F.round(F.avg("nll"), 6).alias("ce"),
    )
    # ONE corpus pass: rollup gives every per-source row AND the
    # all-docs total row (the reference loss) in the same aggregate;
    # the checkpoint cuts lineage at |sources|+1 rows so the EG loop's
    # normalizers never re-run the KN scoring pipeline.
    roll = (
        per_doc.rollup("source")
        .agg(
            F.max(F.grouping("source")).alias("is_total"),
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_bg").cast("bigint").alias("n_tokens"),
            F.round(F.avg("ce"), 6).alias("ce"),
        )
        .localCheckpoint()
    )
    dom = roll.where(F.col("is_total") == 0).select(
        "source", "n_docs", "n_tokens", "ce"
    )
    ref = roll.where(F.col("is_total") == 1).select(
        F.col("ce").alias("ce_ref")
    )
    tot = dom.agg(
        F.sum("n_tokens").cast("double").alias("tot_tokens"),
        F.count(F.lit(1)).cast("double").alias("k"),
    )
    excess = F.round(F.greatest(F.col("ce") - F.col("ce_ref"), F.lit(0.0)), 6)
    cur = (
        dom.crossJoin(F.broadcast(ref))
        .crossJoin(F.broadcast(tot))
        .select(
            "source",
            "n_docs",
            "n_tokens",
            "ce",
            F.round(F.col("n_tokens") / F.col("tot_tokens"), 6).alias("share"),
            excess.alias("excess"),
            F.round(F.exp(F.lit(DR_ETA) * excess), 6).alias("tilt"),
            F.round(F.col("n_tokens") / F.col("tot_tokens"), 6).alias("alpha"),
        )
    )
    for _ in range(DR_STEPS):
        u = F.round(F.col("alpha") * F.col("tilt"), 6)
        z = cur.agg(F.sum(u).alias("z"))
        cur = (
            cur.crossJoin(F.broadcast(z))
            .withColumn("alpha", F.round(u / F.col("z"), 6))
            .drop("z")
        )
    weight = F.round(
        (1 - DR_EPS) * F.col("alpha") + F.lit(DR_EPS) / F.col("k"), 6
    )
    return (
        cur.crossJoin(F.broadcast(tot.select("k")))
        .select(
            "source",
            "n_docs",
            "n_tokens",
            "ce",
            "share",
            "excess",
            F.col("alpha").alias("alpha_eg"),
            weight.alias("weight"),
            F.round(weight / F.col("share"), 4).alias("boost"),
        )
        .orderBy("source")
    )
