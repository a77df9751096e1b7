"""Log-likelihood (G2) keyness analysis per source (SURVEY.md §2B
text tier, round 9).

"Which words characterize THIS source against the rest of the
corpus?" is keyness analysis, and the standard statistic is Dunning's
log-likelihood ratio G2 (Dunning, Computational Linguistics 1993,
public) — PMI's well-behaved sibling: PMI explodes on rare words,
G2 weights evidence by volume, which is why corpus linguistics and
quality forensics (what vocabulary does this crawl segment
over-represent?) default to it. G2 = 2 * sum over the 2x2 table of
O*ln(O/E), zero cells contributing zero.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from target_iceberg_spark.plans.registry import register
from target_iceberg_spark.sources.tables import load_table

KEYNESS_MIN_CORPUS = 50  # df cap: skip words too rare to rank
KEYNESS_PER_SOURCE = 3  # keywords reported per source


def _g2_sql(a: str, b: str, c: str, d: str) -> str:
    """2 * sum O*ln(O/E) over the 2x2 cells, 0*ln(0)=0."""
    n = f"({a} + {b} + {c} + {d})"
    cells = []
    for o, rtot, ctot in (
        (a, f"({a} + {b})", f"({a} + {c})"),
        (b, f"({a} + {b})", f"({b} + {d})"),
        (c, f"({c} + {d})", f"({a} + {c})"),
        (d, f"({c} + {d})", f"({b} + {d})"),
    ):
        e = f"(CAST({rtot} AS DOUBLE) * {ctot} / {n})"
        cells.append(f"CASE WHEN {o} > 0 THEN {o} * ln({o} / {e}) ELSE 0 END")
    return "2 * (" + " + ".join(cells) + ")"


def _keyness_oracle() -> str:
    g2 = _g2_sql("a", "b", "c", "d")
    return f"""
WITH tok AS (
    SELECT source, unnest(string_split(text, ' ')) AS w FROM documents
),
sw AS (
    SELECT source, w, COUNT(*) AS a FROM tok GROUP BY 1, 2
),
wt AS (
    SELECT w, SUM(a) AS cw FROM sw GROUP BY 1
    HAVING SUM(a) >= {KEYNESS_MIN_CORPUS}
),
st AS (SELECT source, SUM(a) AS cs FROM sw GROUP BY 1),
n AS (SELECT SUM(a) AS nn FROM sw),
cells AS (
    SELECT sw.source, sw.w,
           sw.a,
           wt.cw - sw.a AS b,
           st.cs - sw.a AS c,
           n.nn - wt.cw - st.cs + sw.a AS d
    FROM sw JOIN wt ON sw.w = wt.w
    JOIN st ON sw.source = st.source, n
),
scored AS (
    SELECT source, w,
           CAST(a AS BIGINT) AS n_in_source,
           ROUND({g2}, 4) AS g2
    FROM cells
)
SELECT source, w AS word, n_in_source, g2 FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY source
                                 ORDER BY g2 DESC, w) AS rn
    FROM scored
) WHERE rn <= {KEYNESS_PER_SOURCE}
ORDER BY source, g2 DESC, word
"""


@register(
    "text_keyness_g2",
    oracle=_keyness_oracle(),
    tags=("text", "keyness", "statistics"),
)
def text_keyness_g2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{KEYNESS_PER_SOURCE} keywords per source by Dunning G2
    against the rest of the corpus: per-(source, word) counts form the
    2x2 observed table (word-in-source / word-elsewhere /
    other-words-in-source / other-words-elsewhere), G2 folds the four
    O*ln(O/E) cells, and a per-source window keeps the top keywords.
    Words under {KEYNESS_MIN_CORPUS} corpus occurrences are dropped
    BEFORE scoring (the df cap — rare words rank meaninglessly and
    dominate the long tail).

    Scale shape: one combinable (source, word) count is the only
    token-volume stage; word totals, source totals, and the corpus
    total are reductions of it; the scoring join fans back through
    word keys (uniform after the df cap) and the final window
    partitions by source. Token arrays never shuffle; the G2 math is
    whole-stage codegen."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "source", F.explode(F.split("text", " ")).alias("w")
    )
    sw = tok.groupBy("source", "w").agg(F.count(F.lit(1)).alias("a"))
    wt = (
        sw.groupBy("w")
        .agg(F.sum("a").alias("cw"))
        .where(F.col("cw") >= KEYNESS_MIN_CORPUS)
    )
    st = sw.groupBy("source").agg(F.sum("a").alias("cs"))
    n = sw.agg(F.sum("a").alias("nn"))
    cells = (
        sw.join(wt, "w")
        .join(F.broadcast(st), "source")
        .crossJoin(F.broadcast(n))
        .select(
            "source",
            "w",
            F.col("a"),
            (F.col("cw") - F.col("a")).alias("b"),
            (F.col("cs") - F.col("a")).alias("c"),
            (F.col("nn") - F.col("cw") - F.col("cs") + F.col("a")).alias("d"),
        )
    )
    nn = (
        F.col("a") + F.col("b") + F.col("c") + F.col("d")
    ).cast("double")

    def term(o: F.Column, rtot: F.Column, ctot: F.Column) -> F.Column:
        e = rtot.cast("double") * ctot / nn
        return F.when(o > 0, o * F.log(o / e)).otherwise(F.lit(0.0))

    a, b, c, d = F.col("a"), F.col("b"), F.col("c"), F.col("d")
    g2 = 2 * (
        term(a, a + b, a + c)
        + term(b, a + b, b + d)
        + term(c, c + d, a + c)
        + term(d, c + d, b + d)
    )
    scored = cells.select(
        "source",
        "w",
        F.col("a").cast("bigint").alias("n_in_source"),
        F.round(g2, 4).alias("g2"),
    )
    win = Window.partitionBy("source").orderBy(F.desc("g2"), "w")
    return (
        scored.withColumn("rn", F.row_number().over(win))
        .where(F.col("rn") <= KEYNESS_PER_SOURCE)
        .select("source", F.col("w").alias("word"), "n_in_source", "g2")
        .orderBy("source", F.desc("g2"), "word")
    )
