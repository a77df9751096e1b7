"""Cohen's kappa between two quality raters (SURVEY.md §2B stats
tier, round 10).

Curation pipelines stack rule-based "raters" (length gates, stopword
gates, model scores); before trusting two of them interchangeably you
measure chance-corrected agreement — Cohen's kappa (Educ. Psychol.
Meas. 1960, public), the standard label-QA statistic. Raw agreement
overstates: two rules that both pass 90% of docs agree 82% by chance
alone. kappa = (p_o - p_e)/(1 - p_e) corrects with the marginal
product.

The two raters here are deterministic document-quality rules (a
length gate and a stopword-ratio gate), so the whole operator —
ratings, 2x2 contingency, marginals, kappa — is one pass + algebra,
exactly reproducible in both engines.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from target_iceberg_spark.plans.registry import register
from target_iceberg_spark.sources.tables import load_table

KAPPA_MIN_CHARS = 200  # rater A: document length gate
KAPPA_STOPWORDS = ("the", "a", "of", "and", "to")  # rater B vocabulary
KAPPA_MIN_STOP_RATIO = 0.05  # rater B: stopword-share gate


def _stop_list_sql() -> str:
    return ", ".join(f"'{w}'" for w in KAPPA_STOPWORDS)


@register(
    "agg_cohens_kappa",
    oracle=f"""
WITH rated AS (
    SELECT doc_id,
           CASE WHEN n_chars >= {KAPPA_MIN_CHARS} THEN 1 ELSE 0 END AS ra,
           CASE WHEN len(list_filter(string_split(lower(text), ' '),
                         t -> t IN ({_stop_list_sql()})))
                     / CAST(len(string_split(lower(text), ' ')) AS DOUBLE)
                    >= {KAPPA_MIN_STOP_RATIO}
                THEN 1 ELSE 0 END AS rb
    FROM documents
),
cells AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CASE WHEN ra = 1 AND rb = 1 THEN 1 ELSE 0 END) AS BIGINT) AS both_pass,
           CAST(SUM(CASE WHEN ra = 0 AND rb = 0 THEN 1 ELSE 0 END) AS BIGINT) AS both_fail,
           CAST(SUM(ra) AS BIGINT) AS a_pass,
           CAST(SUM(rb) AS BIGINT) AS b_pass
    FROM rated
)
SELECT n, both_pass, both_fail, a_pass, b_pass,
       ROUND((both_pass + both_fail) / CAST(n AS DOUBLE), 6) AS p_observed,
       ROUND(((CAST(a_pass AS DOUBLE) * b_pass)
              + (CAST(n - a_pass AS DOUBLE) * (n - b_pass)))
             / (CAST(n AS DOUBLE) * n), 6) AS p_chance,
       ROUND(((both_pass + both_fail) / CAST(n AS DOUBLE)
              - ((CAST(a_pass AS DOUBLE) * b_pass)
                 + (CAST(n - a_pass AS DOUBLE) * (n - b_pass)))
                / (CAST(n AS DOUBLE) * n))
             / (1 - ((CAST(a_pass AS DOUBLE) * b_pass)
                     + (CAST(n - a_pass AS DOUBLE) * (n - b_pass)))
                   / (CAST(n AS DOUBLE) * n)), 6) AS kappa
FROM cells
""",
    tags=("stats", "agreement", "curation", "quality"),
)
def agg_cohens_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chance-corrected agreement between the length gate
    (n_chars >= {KAPPA_MIN_CHARS}) and the stopword-share gate
    (ratio >= {KAPPA_MIN_STOP_RATIO}): 2x2 cells, observed agreement
    p_o, chance agreement p_e from the marginal products, kappa =
    (p_o - p_e)/(1 - p_e).

    Scale shape: both ratings compute map-side in one projection (the
    stopword share is a codegen filter/size over the token array — no
    explode), then ONE global sufficient-statistic aggregate; kappa
    is arithmetic on that single row. Nothing shuffles but five
    counters."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.lower(F.col("text")), " ")
    stop_arr = F.array(*[F.lit(w) for w in KAPPA_STOPWORDS])
    rated = docs.select(
        F.when(F.col("n_chars") >= KAPPA_MIN_CHARS, 1).otherwise(0).alias("ra"),
        F.when(
            F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t)))
            / F.size(toks).cast("double")
            >= KAPPA_MIN_STOP_RATIO,
            1,
        )
        .otherwise(0)
        .alias("rb"),
    )
    cells = rated.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.when((F.col("ra") == 1) & (F.col("rb") == 1), 1).otherwise(0))
        .cast("bigint")
        .alias("both_pass"),
        F.sum(F.when((F.col("ra") == 0) & (F.col("rb") == 0), 1).otherwise(0))
        .cast("bigint")
        .alias("both_fail"),
        F.sum("ra").cast("bigint").alias("a_pass"),
        F.sum("rb").cast("bigint").alias("b_pass"),
    )
    n_d = F.col("n").cast("double")
    p_o = (F.col("both_pass") + F.col("both_fail")) / n_d
    p_e = (
        F.col("a_pass").cast("double") * F.col("b_pass")
        + (F.col("n") - F.col("a_pass")).cast("double") * (F.col("n") - F.col("b_pass"))
    ) / (n_d * F.col("n"))
    return cells.select(
        "n",
        "both_pass",
        "both_fail",
        "a_pass",
        "b_pass",
        F.round(p_o, 6).alias("p_observed"),
        F.round(p_e, 6).alias("p_chance"),
        F.round((p_o - p_e) / (1 - p_e), 6).alias("kappa"),
    )
