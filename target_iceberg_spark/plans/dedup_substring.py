"""Exact shared-substring (token-run) detection (SURVEY.md §2B dedup
north star, round 8).

Lee et al., "Deduplicating Training Data Makes Language Models
Better" (ACL'22, public) showed EXACT SUBSTRING dedup — removing long
verbatim token runs shared across documents — beats whole-document
near-dup for LLM corpora: memorized passages hide inside otherwise
distinct pages. Their implementation builds a corpus-wide suffix
array, which does not distribute; the standard scale-out equivalent
is POSITIONAL GRAM ALIGNMENT: hash every k-token gram with its
position, equi-join on the hash, and collapse matches with equal
position-offset into runs — two documents sharing an L-token run
(L >= k) produce exactly L-k+1 consecutive matches at one diff, so
run length is recovered exactly, from grams alone.

Complements the family: dedup_minhash (whole-doc similarity),
text_winnowing (sampled fingerprints — finds THAT docs share a
passage), this query (exact run EXTENT — how long, how many), the
input the actual cut-the-span dedup transform needs.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from target_iceberg_spark.functions.textfns import ngrams_of, tokens
from target_iceberg_spark.plans.registry import register
from target_iceberg_spark.sources.tables import load_table

RUN_K = 5  # tokens per aligned gram
RUN_DF_CAP = 20  # grams in more docs are boilerplate: excluded
RUN_MIN_TOKENS = 8  # report pairs sharing a run at least this long
RUN_TOP = 20


@register(
    "text_shared_runs",
    oracle=f"""
WITH t AS (
    SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents
),
grams AS (
    SELECT doc_id, i AS p,
           md5(list_aggregate(toks[i:i+{RUN_K - 1}], 'string_agg', ' ')) AS h
    FROM t, unnest(range(1, len(toks) - {RUN_K - 2})) AS u(i)
    WHERE len(toks) >= {RUN_K}
),
dfh AS (SELECT h, COUNT(DISTINCT doc_id) AS df FROM grams GROUP BY h),
keep AS (SELECT h FROM dfh WHERE df BETWEEN 2 AND {RUN_DF_CAP}),
m AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.p AS pa, a.p - b.p AS d
    FROM grams a JOIN keep USING (h)
    JOIN grams b ON a.h = b.h AND a.doc_id < b.doc_id
),
runs AS (
    SELECT doc_a, doc_b, d, pa,
           pa - ROW_NUMBER() OVER (
               PARTITION BY doc_a, doc_b, d ORDER BY pa) AS isl
    FROM m
),
rl AS (
    SELECT doc_a, doc_b, CAST(COUNT(*) + {RUN_K} - 1 AS BIGINT) AS run_tokens
    FROM runs GROUP BY doc_a, doc_b, d, isl
)
SELECT doc_a, doc_b,
       MAX(run_tokens) AS max_run_tokens,
       CAST(COUNT(*) AS BIGINT) AS n_runs
FROM rl
GROUP BY doc_a, doc_b
HAVING MAX(run_tokens) >= {RUN_MIN_TOKENS}
ORDER BY max_run_tokens DESC, doc_a, doc_b
LIMIT {RUN_TOP}
""",
    tags=("text", "dedup", "substring"),
)
def text_shared_runs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest exact shared token runs per document pair: every
    {RUN_K}-gram is md5-hashed WITH its position, boilerplate grams
    (> {RUN_DF_CAP} docs) are excluded, matching positions join on
    the digest, and matches with equal position-offset collapse into
    runs by the islands trick (pos - row_number is constant along a
    consecutive match run) — recovering the exact shared-substring
    length L as grams_in_run + k - 1. Pairs sharing a run of
    >= {RUN_MIN_TOKENS} tokens are reported with their longest run
    and run count — the span inventory an exact-substring dedup pass
    (Lee et al. ACL'22) cuts from the corpus.

    Scale shape: positions travel as (digest, int) pairs — never
    text; the df cap bounds every posting list (the sim_tfidf_pairs
    discipline) so the alignment join cannot go quadratic; the
    islands window partitions by (doc_a, doc_b, d) — millions of tiny
    partitions, no global window; every aggregate is combinable and
    the finisher is TakeOrderedAndProject. The corpus-wide suffix
    array this replaces is the part of Lee et al. that does NOT
    distribute."""
    # fanout: the positional-gram pass (tokenize + 5-gram shingle +
    # md5) is heavy narrow compute fused onto the single-split
    # documents scan, and the grams subtree executes for the df pass
    # and both alignment-join sides (guide §2.5).
    docs = load_table(spark, sf_dir, "documents", fanout=True)
    t = docs.select("doc_id", tokens("text").alias("toks"))
    grams = t.select(
        "doc_id",
        F.posexplode(F.transform(ngrams_of("toks", RUN_K), F.md5)).alias(
            "p", "h"
        ),
    )
    dfh = grams.groupBy("h").agg(F.countDistinct("doc_id").alias("df"))
    keep = dfh.where(
        (F.col("df") >= 2) & (F.col("df") <= RUN_DF_CAP)
    ).select("h")
    a = grams.alias("a")
    b = grams.alias("b")
    m = (
        a.join(keep, "h")
        .join(b, "h")
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.p").alias("pa"),
            (F.col("a.p") - F.col("b.p")).alias("d"),
        )
    )
    isl_w = Window.partitionBy("doc_a", "doc_b", "d").orderBy("pa")
    runs = m.select(
        "doc_a",
        "doc_b",
        "d",
        (F.col("pa") - F.row_number().over(isl_w)).alias("isl"),
    )
    rl = runs.groupBy("doc_a", "doc_b", "d", "isl").agg(
        (F.count(F.lit(1)) + RUN_K - 1).cast("bigint").alias("run_tokens")
    )
    return (
        rl.groupBy("doc_a", "doc_b")
        .agg(
            F.max("run_tokens").alias("max_run_tokens"),
            F.count(F.lit(1)).cast("bigint").alias("n_runs"),
        )
        .where(F.col("max_run_tokens") >= RUN_MIN_TOKENS)
        .orderBy(F.desc("max_run_tokens"), "doc_a", "doc_b")
        .limit(RUN_TOP)
    )
