"""RHO-LOSS learnability selection (SURVEY.md §2B curation north
star, round 12).

The selection tier so far ranks documents by STATIC signals — heuristic
quality (text_gopher_rules), a trained classifier (text_quality_trained),
model perplexity (text_kn_perplexity), distributional importance
(curation_dsir). RHO-LOSS (Mindermann et al., "Prioritized Training on
Points that are Learnable, Worth Learning, and Not Yet Learnt",
ICML 2022 — public) ranks by the REDUCIBLE HOLDOUT LOSS instead:

    rho(x) = L(x; training model) - L(x; holdout model)

High training loss alone selects noise (gibberish is hard under ANY
model); subtracting the loss of a model fit on held-out data cancels
the irreducible part, leaving points the current model has not learnt
but COULD — exactly the docs worth the next gradient step. Here both
models are add-alpha unigram LMs over the shared corpus vocabulary:
the "training" model fit on the candidate pool itself, the "holdout"
model fit on an md5-selected disjoint 25% split, and the query emits
the top-{RHO_TOP_K} pool docs by rho (rounded-6 rho, doc_id tiebreak).

 - memorized/common docs: low ce under both models -> low rho;
 - gibberish: high ce under both -> the subtraction cancels it;
 - learnable docs (patterns the holdout knows that the pool has few
   of): high ce_pool, low ce_holdout -> top of the ranking.

Scale shape: ONE tokenize+explode corpus pass feeds ONE combinable
groupBy(token) holding BOTH models' counts (conditional sums over the
md5 split flag — vocabulary-bounded, Zipf-distributed); scoring is the
occurrence-vs-vocab equi-join every text_* LM query uses, followed by
a combinable per-doc aggregate and a TakeOrdered top-k (no full sort,
no window). Nothing in the model grows with corpus size, only with
vocabulary.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from target_iceberg_spark.functions.hashing import (
    MD5_QUARTER_HEX,
    md5_quarter,
    md5_quarter_sql,
)
from target_iceberg_spark.functions.textfns import tokens
from target_iceberg_spark.plans.registry import register
from target_iceberg_spark.sources.tables import load_table

RHO_ALPHA = 0.1  # add-alpha smoothing over the shared vocabulary
RHO_TOP_K = 150  # selection budget
# holdout split: the shared deterministic md5-prefix quarter
# (functions/hashing.py — same split family as the approx-distinct
# audit sample in plans/relational_extra.py)
RHO_HOLDOUT_HEX = MD5_QUARTER_HEX


@register(
    "curation_rho_loss",
    oracle=f"""
WITH t AS (
    SELECT doc_id, source,
           unnest(string_split(lower(text), ' ')) AS tok,
           {md5_quarter_sql("doc_id")} AS is_h
    FROM documents
),
tc AS (
    SELECT tok,
           CAST(SUM(CASE WHEN is_h THEN 1 ELSE 0 END) AS DOUBLE) AS c_h,
           CAST(SUM(CASE WHEN is_h THEN 0 ELSE 1 END) AS DOUBLE) AS c_p
    FROM t GROUP BY tok
),
tot AS (
    SELECT SUM(c_h) AS n_h, SUM(c_p) AS n_p,
           CAST(COUNT(*) AS DOUBLE) AS v
    FROM tc
),
pd AS (
    SELECT t.doc_id, t.source,
           CAST(COUNT(*) AS BIGINT) AS n_toks,
           ROUND(AVG(-LN((tc.c_p + {RHO_ALPHA})
                         / (tot.n_p + {RHO_ALPHA} * tot.v))), 6) AS ce_pool,
           ROUND(AVG(-LN((tc.c_h + {RHO_ALPHA})
                         / (tot.n_h + {RHO_ALPHA} * tot.v))), 6) AS ce_holdout
    FROM t JOIN tc USING (tok) CROSS JOIN tot
    WHERE NOT t.is_h
    GROUP BY t.doc_id, t.source
)
SELECT doc_id, source, n_toks, ce_pool, ce_holdout,
       ROUND(ce_pool - ce_holdout, 6) AS rho
FROM pd
ORDER BY rho DESC, doc_id
LIMIT {RHO_TOP_K}
""",
    tags=("curation", "selection", "rho-loss", "lm"),
)
def curation_rho_loss(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{RHO_TOP_K} pool documents by reducible holdout loss:
    per-doc cross-entropy under the pool-fit add-{RHO_ALPHA} unigram
    model minus cross-entropy under the holdout-fit model (shared
    corpus vocabulary, md5 25% holdout split), rho rounded to 6 with
    doc_id as the deterministic tiebreak.

    Scale shape: one explode pass, one vocabulary-bounded groupBy
    carrying both models' counts as conditional sums, the standard
    occurrence-vs-vocab scoring join, a combinable per-doc aggregate,
    and orderBy+limit (TakeOrderedAndProject — per-partition top-k
    then a {RHO_TOP_K}-row driver merge, never a full sort)."""
    docs = load_table(spark, sf_dir, "documents")
    is_h = md5_quarter(F.col("doc_id"))
    t = docs.select(
        "doc_id", "source", F.explode(tokens("text")).alias("tok"), is_h.alias("is_h")
    )
    tc = t.groupBy("tok").agg(
        F.sum(F.when(F.col("is_h"), 1).otherwise(0)).cast("double").alias("c_h"),
        F.sum(F.when(F.col("is_h"), 0).otherwise(1)).cast("double").alias("c_p"),
    )
    tot = tc.agg(
        F.sum("c_h").alias("n_h"),
        F.sum("c_p").alias("n_p"),
        F.count(F.lit(1)).cast("double").alias("v"),
    )
    ce = lambda c, n: -F.log(  # noqa: E731
        (F.col(c) + F.lit(RHO_ALPHA)) / (F.col(n) + F.lit(RHO_ALPHA) * F.col("v"))
    )
    pd = (
        t.where(~F.col("is_h"))
        .join(tc, "tok")
        .crossJoin(F.broadcast(tot))
        .groupBy("doc_id", "source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_toks"),
            F.round(F.avg(ce("c_p", "n_p")), 6).alias("ce_pool"),
            F.round(F.avg(ce("c_h", "n_h")), 6).alias("ce_holdout"),
        )
    )
    return (
        pd.withColumn("rho", F.round(F.col("ce_pool") - F.col("ce_holdout"), 6))
        .orderBy(F.desc("rho"), "doc_id")
        .limit(RHO_TOP_K)
    )
