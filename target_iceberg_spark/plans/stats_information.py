"""Information-theoretic dependence and divergence measures
(SURVEY.md §2B analytics/profiling tier, round-5 post-window).

agg_mutual_info quantifies association between two categorical
columns (mutual information + chi-square + Cramer's V from ONE
contingency pass) — the feature-selection / leakage-detection staple.
text_jsd_sources measures how far each source's token distribution
sits from the corpus mixture (Jensen-Shannon divergence) — the
standard domain-shift lens a data-mixing pipeline reads before
choosing sampling weights (profile_drift_psi is the numeric-column
counterpart; this is the vocabulary one).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from target_iceberg_spark.plans.registry import register
from target_iceberg_spark.sources.tables import load_table


@register(
    "agg_mutual_info",
    oracle="""
WITH cells AS (
    SELECT o_orderstatus AS x, o_orderpriority AS y,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM orders GROUP BY o_orderstatus, o_orderpriority
),
marg AS (
    SELECT x, y, n,
           SUM(n) OVER (PARTITION BY x) AS nx,
           SUM(n) OVER (PARTITION BY y) AS ny,
           SUM(n) OVER () AS nt,
           COUNT(DISTINCT x) OVER () AS r,
           COUNT(DISTINCT y) OVER () AS c
    FROM cells
)
SELECT ROUND(SUM((CAST(n AS DOUBLE) / nt)
             * ln((CAST(n AS DOUBLE) * nt)
                  / (CAST(nx AS DOUBLE) * ny))), 6) AS mutual_info,
       ROUND(SUM(pow(n - CAST(nx AS DOUBLE) * ny / nt, 2)
             / (CAST(nx AS DOUBLE) * ny / nt)), 4) AS chi2,
       ROUND(sqrt(SUM(pow(n - CAST(nx AS DOUBLE) * ny / nt, 2)
             / (CAST(nx AS DOUBLE) * ny / nt))
             / (MAX(nt) * (least(MAX(r), MAX(c)) - 1))), 6) AS cramers_v,
       CAST(MAX(nt) AS BIGINT) AS n_rows
FROM marg
""",
    tags=("aggregate", "statistics", "information"),
)
def agg_mutual_info(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dependence between order status and order priority from one
    contingency table: mutual information (nats), the chi-square
    statistic, and Cramer's V — the triple a feature-selection or
    data-leakage audit reads per column pair.

    Scale shape: the ONLY full-data stage is the combinable cell
    count; marginals, totals, and domain cardinalities all come from
    windows over the <= |X|x|Y| cell table (15 rows here) — the
    aggregate-bounded class, domain-product-bounded by construction.
    At 100 TB a whole-schema pairwise audit is just this plan mapped
    over column pairs, each costing one scan."""
    orders = load_table(spark, sf_dir, "orders")
    cells = orders.groupBy(
        F.col("o_orderstatus").alias("x"), F.col("o_orderpriority").alias("y")
    ).agg(F.count(F.lit(1)).alias("n"))
    w_all = Window.partitionBy()
    marg = cells.select(
        "n",
        F.sum("n").over(Window.partitionBy("x")).alias("nx"),
        F.sum("n").over(Window.partitionBy("y")).alias("ny"),
        F.sum("n").over(w_all).alias("nt"),
        F.size(F.collect_set("x").over(w_all)).alias("r"),
        F.size(F.collect_set("y").over(w_all)).alias("c"),
    )
    nd = F.col("n").cast("double")
    e = F.col("nx").cast("double") * F.col("ny") / F.col("nt")
    chi2 = F.sum(F.pow(F.col("n") - e, F.lit(2)) / e)
    return marg.agg(
        F.round(
            F.sum(
                (nd / F.col("nt"))
                * F.log(nd * F.col("nt") / (F.col("nx").cast("double") * F.col("ny")))
            ),
            6,
        ).alias("mutual_info"),
        F.round(chi2, 4).alias("chi2"),
        F.round(
            F.sqrt(
                chi2 / (F.max("nt") * (F.least(F.max("r"), F.max("c")) - 1))
            ),
            6,
        ).alias("cramers_v"),
        F.max("nt").cast("bigint").alias("n_rows"),
    )


@register(
    "text_jsd_sources",
    oracle="""
WITH tok AS (
    SELECT source, unnest(string_split(text, ' ')) AS word FROM documents
),
sw AS (
    SELECT source, word, CAST(COUNT(*) AS BIGINT) AS n
    FROM tok GROUP BY source, word
),
stot AS (SELECT source, SUM(n) AS s_tot FROM sw GROUP BY source),
gw AS (SELECT word, SUM(n) AS gn FROM sw GROUP BY word),
gtot AS (SELECT SUM(n) AS g_tot FROM sw),
grid AS (
    SELECT s.source, w.word, s.s_tot, w.gn, g.g_tot
    FROM stot s, gw w, gtot g
),
terms AS (
    SELECT grid.source,
           COALESCE(CAST(sw.n AS DOUBLE) / grid.s_tot, 0.0) AS q,
           CAST(grid.gn AS DOUBLE) / grid.g_tot AS p
    FROM grid LEFT JOIN sw
      ON sw.source = grid.source AND sw.word = grid.word
)
SELECT source,
       ROUND(SUM(
           CASE WHEN q > 0 THEN 0.5 * q * ln(q / ((p + q) / 2)) ELSE 0 END
           + CASE WHEN p > 0 THEN 0.5 * p * ln(p / ((p + q) / 2)) ELSE 0 END
       ), 6) AS jsd
FROM terms
GROUP BY source
ORDER BY source
""",
    tags=("text", "divergence", "mixing"),
)
def text_jsd_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jensen-Shannon divergence of each source's token distribution
    from the corpus-wide mixture — bounded in [0, ln 2], symmetric,
    finite even for vocabulary the source never uses (unlike raw KL),
    which is exactly why data-mixing audits report JSD per domain.

    Scale shape: token counts are two stacked combinable aggregations;
    the divergence itself evaluates on the #sources x #vocab grid
    (built from two tiny aggregates plus the one-row total — the
    whitelisted scalar-cross class) LEFT-joined against per-source
    counts so absent words contribute their p-side mass. Nothing
    after the token count touches row-scale data. The df-cap caveat
    from sim_tfidf_pairs applies to the grid at open-vocabulary scale:
    cap or hash the long tail first (text_hashing_vectorizer)."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "source", F.explode(F.split("text", " ")).alias("word")
    )
    sw = tok.groupBy("source", "word").agg(F.count(F.lit(1)).alias("n"))
    stot = sw.groupBy("source").agg(F.sum("n").alias("s_tot"))
    gw = sw.groupBy("word").agg(F.sum("n").alias("gn"))
    gtot = sw.agg(F.sum("n").alias("g_tot"))
    grid = stot.crossJoin(F.broadcast(gw)).crossJoin(F.broadcast(gtot))
    terms = grid.join(sw, ["source", "word"], "left").select(
        "source",
        F.coalesce(F.col("n").cast("double") / F.col("s_tot"), F.lit(0.0)).alias("q"),
        (F.col("gn").cast("double") / F.col("g_tot")).alias("p"),
    )
    m = (F.col("p") + F.col("q")) / 2
    contrib = F.when(
        F.col("q") > 0, 0.5 * F.col("q") * F.log(F.col("q") / m)
    ).otherwise(0.0) + F.when(
        F.col("p") > 0, 0.5 * F.col("p") * F.log(F.col("p") / m)
    ).otherwise(0.0)
    return (
        terms.groupBy("source")
        .agg(F.round(F.sum(contrib), 6).alias("jsd"))
        .orderBy("source")
    )


@register(
    "fn_lambda",
    oracle="""
SELECT vec_id,
       CAST(len(list_filter(embedding, x -> x > 0)) AS INT) AS n_pos,
       (len(list_filter(embedding, x -> x > 1.5)) > 0) AS any_big,
       (len(list_filter(embedding, x -> abs(x) >= 3.0)) = 0) AS all_small,
       ROUND(list_sum(list_transform(embedding,
             x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), 4) AS energy
FROM embeddings
WHERE vec_id < 100
ORDER BY vec_id
""",
    tags=("function", "lambda", "array"),
)
def fn_lambda(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The higher-order-function family fn_array leaves out: exists /
    forall / filter / fold over an array column, entirely inside
    whole-stage codegen — the idioms that keep per-element logic OUT
    of Python UDFs (the 10-100x slow path) at 100 TB.

    DuckDB has no exists/forall builtins, so the oracle states both as
    list_filter cardinality tests — which is also their formal
    definition, making the semantic mapping explicit. The fold (sum of
    squares in double) mirrors functions/vectors.py's sequential-fold
    discipline so both engines accumulate in the same order."""
    emb = load_table(spark, sf_dir, "embeddings")
    return (
        emb.where(F.col("vec_id") < 100)
        .select(
            "vec_id",
            F.size(F.filter("embedding", lambda x: x > 0)).alias("n_pos"),
            F.exists("embedding", lambda x: x > 1.5).alias("any_big"),
            F.forall("embedding", lambda x: F.abs(x) < 3.0).alias("all_small"),
            F.round(
                F.aggregate(
                    "embedding",
                    F.lit(0.0),
                    lambda acc, x: acc + x.cast("double") * x.cast("double"),
                ),
                4,
            ).alias("energy"),
        )
        .orderBy("vec_id")
    )
