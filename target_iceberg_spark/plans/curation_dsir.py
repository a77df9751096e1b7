"""DSIR — Data Selection with Importance Resampling (Xie et al.,
"Data Selection for Language Models via Importance Resampling",
NeurIPS 2023 — public) (SURVEY.md §2B curation tier, round 10;
VERDICT r9 task 3).

The canonical data-SELECTION operator beside the mixing/budgeting
operators already present (curation_mix_temperature,
curation_token_budget): given a small TARGET corpus (the distribution
you want more of) and a large RAW pool, pick the raw documents whose
hashed-n-gram profile looks most target-like — importance resampling
under a bag-of-hashed-ngrams model.

The recipe, each step md5-deterministic and SQL-expressible:
  1. FEATURES — unigram + bigram shingles hash into {DSIR_BUCKETS}
     buckets (md5-hex-prefix mod B; the text_hashing_vectorizer
     placement, identical in both engines).
  2. MODELS — bucket unigram models with Laplace smoothing:
     p_b = (t_b + 1)/(T + B) over the target, q_b = (r_b + 1)/(R + B)
     over the raw pool; the log-likelihood ratio
     lambda_b = ln p_b − ln q_b is a B-row broadcast table.
  3. WEIGHTS — log w_i = Σ_b c_ib · lambda_b per raw document (one
     combinable (doc, bucket) count + a broadcast join + a sum).
  4. RESAMPLE — Gumbel top-k: key_i = log w_i − ln(−ln u_i) with
     u_i an md5-uniform in (0,1) derived from the doc id, so the
     stochastic resampling of the paper is exactly reproducible on
     both engines (same trick as sample_fixed_k / sample_weighted).

Scale shape: the gram explode feeds a {DSIR_BUCKETS}-ary combinable
count (bucket space is CONSTANT — no vocabulary table at any corpus
size, the whole point of hashing); lambda is a B-row plan-side
broadcast; per-doc features are a (doc_id, bucket) combinable
groupBy (≤ B rows per doc); the only global operator is the final
top-k (TakeOrdered, no full sort). At 100 TB the target model is fit
once and reused; selection is one linear pass over the raw pool.

Ranking is on the ROUNDED Gumbel key (repo discipline: cross-engine
float sums may differ in the last ulp; rounding at 6 decimals with a
doc_id tiebreak makes the selected set boundary-stable).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from target_iceberg_spark.functions.hashing import hex_int, hex_int_sql
from target_iceberg_spark.functions.textfns import ngrams_of, tokens
from target_iceberg_spark.plans.registry import register
from target_iceberg_spark.sources.tables import load_table

DSIR_BUCKETS = 64  # hashed feature space (paper uses 10k; B is a knob)
DSIR_TARGET_SOURCE = "src0"  # the planted "target distribution"
DSIR_K = 50  # documents selected from the raw pool
DSIR_SALT = "dsir"  # Gumbel noise stream id
_U32 = 4294967296.0  # 2^32


def dsir_select(
    docs: DataFrame,
    is_target,
    k: int = DSIR_K,
    buckets: int = DSIR_BUCKETS,
    salt: str = DSIR_SALT,
) -> DataFrame:
    """Core DSIR selection: ``docs`` must carry (doc_id, source, text);
    ``is_target`` is a boolean Column splitting target from raw pool.
    Returns the k raw docs with the largest Gumbel-perturbed
    importance weight: (doc_id, source, logw, gumbel_key)."""
    toked = docs.select(
        "doc_id", "source", is_target.alias("_t"), tokens("text").alias("_toks")
    )
    grams = toked.select(
        "doc_id",
        "_t",
        F.explode(
            F.concat(F.col("_toks"), ngrams_of("_toks", 2))
        ).alias("g"),
    ).select(
        "doc_id",
        "_t",
        (hex_int(F.md5("g")).cast("bigint") % buckets)
        .cast("int")
        .alias("bucket"),
    )
    # Pre-aggregate the gram stream ONCE to (doc_id, _t, bucket, c) and
    # localCheckpoint it: tcnt/rcnt/T/R/docb are all exact integer
    # re-aggregations of these counts, and without the cut each of the
    # five consumers re-ran the corpus-sized tokenize + explode + md5
    # (the text_nb_langid per-(doc,tok) pre-agg discipline).
    dbc = (
        grams.groupBy("doc_id", "_t", "bucket")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint()
    )
    tgt = dbc.where("_t")
    raw = dbc.where(~F.col("_t"))
    tcnt = tgt.groupBy("bucket").agg(F.sum("c").alias("tc"))
    rcnt = raw.groupBy("bucket").agg(F.sum("c").alias("rc"))
    tot = tgt.agg(F.sum("c").alias("T")).crossJoin(
        raw.agg(F.sum("c").alias("R"))
    )
    lam = (
        rcnt.join(tcnt, "bucket", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "bucket",
            (
                F.log(
                    (F.coalesce(F.col("tc"), F.lit(0)) + 1.0)
                    / (F.col("T") + float(buckets))
                )
                - F.log((F.col("rc") + 1.0) / (F.col("R") + float(buckets)))
            ).alias("lam"),
        )
    )
    docb = raw.select("doc_id", "bucket", "c")
    w = (
        docb.join(F.broadcast(lam), "bucket")
        .groupBy("doc_id")
        .agg(F.sum(F.col("c") * F.col("lam")).alias("logw"))
    )
    u = (
        hex_int(
            F.md5(F.concat(F.lit(salt), F.col("doc_id").cast("string")))
        ).cast("double")
        + 0.5
    ) / _U32
    keyed = w.select(
        "doc_id",
        "logw",
        (F.col("logw") - F.log(-F.log(u))).alias("key"),
    )
    return (
        keyed.join(docs.select("doc_id", "source"), "doc_id")
        .orderBy(F.round(F.col("key"), 6).desc(), "doc_id")
        .limit(k)
        .select(
            "doc_id",
            "source",
            F.round("logw", 4).alias("logw"),
            F.round("key", 4).alias("gumbel_key"),
        )
    )


def _dsir_oracle() -> str:
    b = DSIR_BUCKETS
    uhash = hex_int_sql(
        f"md5(concat('{DSIR_SALT}', CAST(doc_id AS VARCHAR)))"
    )
    return f"""
WITH toked AS (
    SELECT doc_id, source, source = '{DSIR_TARGET_SOURCE}' AS t,
           string_split(lower(text), ' ') AS toks
    FROM documents
),
grams AS (
    SELECT doc_id, t, unnest(toks) AS g FROM toked
    UNION ALL
    SELECT doc_id, t,
           unnest(list_transform(range(1, len(toks)),
                  i -> toks[i] || ' ' || toks[i+1]))
    FROM toked
),
bkt AS (
    SELECT doc_id, t,
           CAST({hex_int_sql("md5(g)")} % {b} AS INT) AS bucket
    FROM grams
),
tcnt AS (SELECT bucket, COUNT(*) AS tc FROM bkt WHERE t GROUP BY bucket),
rcnt AS (SELECT bucket, COUNT(*) AS rc FROM bkt WHERE NOT t GROUP BY bucket),
tot AS (SELECT (SELECT COUNT(*) FROM bkt WHERE t) AS T,
               (SELECT COUNT(*) FROM bkt WHERE NOT t) AS R),
lam AS (
    SELECT r.bucket,
           LN((COALESCE(t.tc, 0) + 1.0) / (tot.T + {b}))
         - LN((r.rc + 1.0) / (tot.R + {b})) AS lam
    FROM rcnt r LEFT JOIN tcnt t ON r.bucket = t.bucket, tot
),
docb AS (
    SELECT doc_id, bucket, COUNT(*) AS c
    FROM bkt WHERE NOT t GROUP BY doc_id, bucket
),
w AS (
    SELECT d.doc_id, SUM(d.c * lam.lam) AS logw
    FROM docb d JOIN lam ON d.bucket = lam.bucket
    GROUP BY d.doc_id
),
keyed AS (
    SELECT doc_id, logw,
           logw - LN(-LN((CAST({uhash} AS DOUBLE) + 0.5) / {_U32})) AS key
    FROM w
)
SELECT k.doc_id, d.source,
       ROUND(k.logw, 4) AS logw,
       ROUND(k.key, 4) AS gumbel_key
FROM keyed k JOIN documents d ON k.doc_id = d.doc_id
ORDER BY ROUND(k.key, 6) DESC, k.doc_id
LIMIT {DSIR_K}
"""


@register("curation_dsir", oracle=_dsir_oracle(), tags=("curation", "text", "sampling"))
def curation_dsir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR selection over the documents table: target = the
    {DSIR_TARGET_SOURCE} source, raw pool = every other source; the
    {DSIR_K} selected docs (with their importance log-weights and
    Gumbel keys) are the batch a training pipeline would admit. See
    module docstring for the recipe and scale shape; planted-target
    recovery is pinned in tests/test_round10_ops.py."""
    docs = load_table(spark, sf_dir, "documents")
    return dsir_select(docs, F.col("source") == DSIR_TARGET_SOURCE)
