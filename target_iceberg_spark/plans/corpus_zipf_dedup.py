"""Zipf-corpus twins of the n-gram dedup tier (SURVEY.md §2B
text/dedup, round 8 — the round-7 verdict's generalization item).

Round 7 pointed the lexical RETRIEVAL tier (BM25, tf-idf pairs) at a
derived Zipf corpus so their df valves run ACTIVE (plans/
corpus_zipf.py). This module does the same for the two n-gram DEDUP
shapes whose df caps matter most at 100 TB:

  * text_winnowing_zipf  — MOSS winnowing fingerprints where the
                           boilerplate DF cap actually kills hashes
                           (the uniform corpus never pushes a
                           fingerprint past the cap), with the kill
                           rate REPORTED IN THE OUTPUT.
  * text_dup_ngram_zipf  — the RefinedWeb duplicated-n-gram fraction
                           with a boilerplate ceiling: grams crossing
                           it are scored as a separate boiler_frac
                           instead of polluting dup_frac, and the
                           corpus-wide kill count is in the output.

Both use a SMALLER vocabulary (V=100) than the retrieval twins
(V=1000): n-gram collision probability falls as V^-k, so the head of
a 1000-word Zipf never repeats 3-grams at test scale while a 100-word
head produces the realistic boilerplate band (measured at sf0.01:
winnowing df up to 32 with 27 hashes past the cap; dup 3-grams up to
80 docs with 16 grams past the ceiling). The derivation is the same
md5 inverse-CDF idiom as corpus_zipf.zipf_tokens, computed HERE as a
pure array expression — floor(exp(u·lnV)) per token position inside
one F.transform — so the whole fingerprint pipeline up to the
DISTINCT is a single stateless projection: no explode of raw tokens,
no per-doc window, nothing shuffles until the selected fingerprints
(a ~2/(w+1) density fraction, Schleimer et al. SIGMOD'03) leave the
document as md5 digests.
"""

from __future__ import annotations

import math

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from target_iceberg_spark.functions.hashing import hex_int_sql
from target_iceberg_spark.plans.registry import register
from target_iceberg_spark.sources.tables import load_table

ZLEX_V = 100  # vocabulary for the n-gram twins (see module docstring)
ZWIN_K = 3  # tokens per winnowing k-gram
ZWIN_W = 4  # winnowing window of consecutive k-gram hashes
ZWIN_DF_CAP = 10  # fingerprints in more docs are boilerplate: killed
ZWIN_MIN_SHARED = 2  # report pairs sharing >= this many fingerprints
ZDUP_N = 3  # tokens per duplicated-gram
ZDUP_BOIL_CAP = 25  # grams in more docs score as boilerplate, not dup


def _zipf_words(doc_id_col: str = "doc_id") -> F.Column:
    """array<string> of Zipf({ZLEX_V}) words, one per token position of
    `text`, as ONE projection: position i (1-based) draws u from the
    md5 of "doc_id:i" and maps through the inverse CDF
    floor(exp(u·lnV)) — bit-identical to the oracle's derivation and
    to corpus_zipf.zipf_tokens (same seed string, different V)."""
    return F.transform(
        F.split("text", " "),
        lambda _t, idx: F.floor(
            F.exp(
                (
                    (
                        F.conv(
                            F.substring(
                                F.md5(
                                    F.concat(
                                        F.col(doc_id_col).cast("string"),
                                        F.lit(":"),
                                        (idx + 1).cast("string"),
                                    )
                                ),
                                1,
                                8,
                            ),
                            16,
                            10,
                        ).cast("double")
                        + 0.5
                    )
                    / F.lit(4294967296.0)
                )
                * F.lit(math.log(ZLEX_V))
            )
        )
        .cast("int")
        .cast("string"),
    )


def _zipf_sql_seq() -> str:
    """DuckDB CTE: (doc_id, source, ws) with ws the per-doc ordered
    list of Zipf words — mirrors :func:`_zipf_words`."""
    h = hex_int_sql("md5(CAST(doc_id AS VARCHAR) || ':' || CAST(i AS VARCHAR))")
    u = f"(({h} + 0.5) / 4294967296.0)"
    return f"""
    SELECT doc_id, source,
           list(CAST(CAST(floor(exp({u} * ln({ZLEX_V}))) AS INT) AS VARCHAR)
                ORDER BY i) AS ws
    FROM (SELECT doc_id, source, string_split(text, ' ') AS t
          FROM documents),
         LATERAL (SELECT unnest(range(1, len(t) + 1)) AS i)
    GROUP BY doc_id, source
"""


@register(
    "text_winnowing_zipf",
    oracle=f"""
WITH seq AS ({_zipf_sql_seq()}),
grams AS (
    SELECT doc_id,
           md5(list_aggregate(ws[i:i+{ZWIN_K - 1}], 'string_agg', ' ')) AS h,
           i
    FROM seq, unnest(range(1, len(ws) - {ZWIN_K - 2})) AS u(i)
    WHERE len(ws) >= {ZWIN_K}
),
wmins AS (
    SELECT doc_id,
           MIN(h) OVER (PARTITION BY doc_id ORDER BY i
                        ROWS BETWEEN CURRENT ROW
                        AND {ZWIN_W - 1} FOLLOWING) AS h,
           i,
           COUNT(*) OVER (PARTITION BY doc_id) AS n_grams
    FROM grams
),
fps AS (
    SELECT DISTINCT doc_id, h FROM wmins WHERE i <= n_grams - {ZWIN_W - 1}
),
dfh AS (SELECT h, CAST(COUNT(*) AS BIGINT) AS df FROM fps GROUP BY h),
rare AS (SELECT h FROM dfh WHERE df BETWEEN 2 AND {ZWIN_DF_CAP}),
pairs AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM fps a JOIN fps b ON a.h = b.h AND a.doc_id < b.doc_id
    JOIN rare ON rare.h = a.h
    GROUP BY a.doc_id, b.doc_id
    HAVING COUNT(*) >= {ZWIN_MIN_SHARED}
)
SELECT CAST((SELECT COUNT(*) FROM dfh) AS BIGINT) AS n_fp_hashes,
       CAST((SELECT COUNT(*) FROM dfh WHERE df >= 2) AS BIGINT)
           AS n_shared_hashes,
       CAST((SELECT COUNT(*) FROM dfh WHERE df > {ZWIN_DF_CAP}) AS BIGINT)
           AS n_killed,
       ROUND(CAST((SELECT COUNT(*) FROM dfh WHERE df > {ZWIN_DF_CAP})
                  AS DOUBLE)
             / NULLIF((SELECT COUNT(*) FROM dfh WHERE df >= 2), 0), 4)
           AS kill_rate,
       CAST((SELECT COUNT(*) FROM pairs) AS BIGINT) AS n_pairs
""",
    tags=("text", "dedup", "fingerprint", "zipf"),
)
def text_winnowing_zipf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """text_winnowing on the derived Zipf({ZLEX_V}) corpus with the
    boilerplate DF cap ACTIVE and its kill rate in the output: head
    k-grams ("1 1 1" and friends) land in dozens of documents, cross
    the {ZWIN_DF_CAP}-doc cap, and are EXCLUDED from the pair join —
    the valve a production corpus needs (cf. text_winnowing, where
    the uniform fixture never populates the killed band). The output
    row reports the fingerprint census: total winnowed hashes, hashes
    shared by >= 2 docs, hashes killed by the cap, the kill rate, and
    the surviving candidate-pair count.

    Scale shape: the derivation is array expressions (transform /
    slice / array_min) — no token explode, no per-doc WindowExec; the
    first shuffle carries only winnowed 32-char digests at the paper's
    ~2/(w+1) density. The ws and grams arrays are localCheckpointed
    between stages: CollapseProject would otherwise INLINE the
    upstream array into every downstream lambda invocation — the Zipf
    array (n md5+exp) re-derived per gram and the gram array (n md5)
    re-derived per window position, an O(n²)-md5-per-doc plan
    (measured: the two-stage inline form timed out where the
    checkpointed form runs in seconds). This is exactly the round-7
    checkpoint rule: materialize when the shared subtree is the
    dominant map CPU (md5 pipelines), and these checkpoints are
    per-doc arrays, linear in the corpus. The pair join is capped by
    the same rare-band discipline as text_winnowing; every aggregate
    is combinable."""
    docs = load_table(spark, sf_dir, "documents")
    seq = docs.select("doc_id", _zipf_words().alias("ws")).localCheckpoint()
    ws = F.col("ws")
    n = F.size(ws)
    grams_expr = F.when(
        n >= ZWIN_K,
        F.transform(
            F.sequence(F.lit(1), n - ZWIN_K + 1),
            lambda i: F.md5(F.array_join(F.slice(ws, i, ZWIN_K), " ")),
        ),
    ).otherwise(F.array().cast("array<string>"))
    gdf = seq.select("doc_id", grams_expr.alias("grams")).localCheckpoint()
    grams = F.col("grams")
    ng = F.size(grams)
    wmins = F.when(
        ng >= ZWIN_W,
        F.transform(
            F.sequence(F.lit(1), ng - ZWIN_W + 1),
            lambda p: F.array_min(F.slice(grams, p, ZWIN_W)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    # Round-13 ckpt A/Bs, both REJECTED (alternating fresh-JVM mins):
    # a full fps checkpoint cost +0.7 s (the corpus-fingerprint-sized
    # materialization outweighs the re-executed parallel transform),
    # and a dfh-only checkpoint cost +0.8 s — the groupBy(h) exchange
    # is already REUSED between the census and the rare band, so the
    # eager checkpoint job was pure overhead on top of a shuffle that
    # materializes once anyway. The plan stays as written.
    fps = gdf.select(
        "doc_id", F.explode(F.array_distinct(wmins)).alias("h")
    )
    dfh = fps.groupBy("h").agg(F.count(F.lit(1)).alias("df"))
    census = dfh.agg(
        F.count(F.lit(1)).alias("n_fp_hashes"),
        F.count(F.when(F.col("df") >= 2, 1)).alias("n_shared_hashes"),
        F.count(F.when(F.col("df") > ZWIN_DF_CAP, 1)).alias("n_killed"),
    ).select(
        "n_fp_hashes",
        "n_shared_hashes",
        "n_killed",
        F.round(
            F.col("n_killed")
            / F.nullif(F.col("n_shared_hashes"), F.lit(0)).cast("double"),
            4,
        ).alias("kill_rate"),
    )
    rare = dfh.where(
        (F.col("df") >= 2) & (F.col("df") <= ZWIN_DF_CAP)
    ).select("h")
    a, b = fps.alias("a"), fps.alias("b")
    pairs = (
        a.join(rare, "h")
        .join(b, "h")
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(F.col("a.doc_id"), F.col("b.doc_id"))
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .where(F.col("n_shared") >= ZWIN_MIN_SHARED)
    )
    n_pairs = pairs.agg(F.count(F.lit(1)).alias("n_pairs"))
    return census.crossJoin(F.broadcast(n_pairs))


@register(
    "text_dup_ngram_zipf",
    oracle=f"""
WITH seq AS ({_zipf_sql_seq()}),
grams AS (
    SELECT doc_id, source,
           md5(list_aggregate(ws[i:i+{ZDUP_N - 1}], 'string_agg', ' ')) AS g
    FROM seq, unnest(range(1, len(ws) - {ZDUP_N - 2})) AS u(i)
    WHERE len(ws) >= {ZDUP_N}
),
gram_docs AS (
    SELECT g, COUNT(DISTINCT doc_id) AS nd FROM grams GROUP BY g
),
per_doc AS (
    SELECT gr.doc_id, gr.source,
           CAST(COUNT(*) FILTER (WHERE gd.nd > 1
                                 AND gd.nd <= {ZDUP_BOIL_CAP}) AS DOUBLE)
               / COUNT(*) AS dup_frac,
           CAST(COUNT(*) FILTER (WHERE gd.nd > {ZDUP_BOIL_CAP}) AS DOUBLE)
               / COUNT(*) AS boiler_frac
    FROM grams gr JOIN gram_docs gd ON gr.g = gd.g
    GROUP BY gr.doc_id, gr.source
),
kills AS (
    SELECT CAST(COUNT(*) FILTER (WHERE nd > {ZDUP_BOIL_CAP}) AS BIGINT)
               AS n_boiler_grams
    FROM gram_docs
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       ROUND(AVG(dup_frac), 4) AS avg_dup_frac,
       ROUND(AVG(boiler_frac), 4) AS avg_boiler_frac,
       (SELECT n_boiler_grams FROM kills) AS n_boiler_grams
FROM per_doc
GROUP BY source
ORDER BY source
""",
    tags=("text", "dedup", "curation", "zipf"),
)
def text_dup_ngram_zipf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """text_dup_ngram_fraction on the derived Zipf({ZLEX_V}) corpus
    with the boilerplate ceiling ACTIVE: a {ZDUP_N}-gram occurring in
    more than {ZDUP_BOIL_CAP} documents is template/boilerplate — at
    100 TB joining through such hot grams is the skew hazard — so it
    scores into a separate per-doc boiler_frac while dup_frac keeps
    only the genuine 2..{ZDUP_BOIL_CAP} duplication band; the
    corpus-wide boilerplate-gram count rides along so the valve's
    kill volume is part of the checked output.

    Scale shape: same as text_dup_ngram_fraction (digest-only
    shuffles, combinable two-phase per-gram doc count, one equi-join
    back) with the Zipf words derived as an in-row array expression —
    raw tokens never explode; only {ZDUP_N}-gram md5s do. The ws
    array is localCheckpointed before the gram transform references
    it (see text_winnowing_zipf: inlined, it would be re-derived per
    gram — O(n²) md5 per doc)."""
    docs = load_table(spark, sf_dir, "documents")
    seq = docs.select(
        "doc_id", "source", _zipf_words().alias("ws")
    ).localCheckpoint()
    ws = F.col("ws")
    n = F.size(ws)
    gram_arr = F.when(
        n >= ZDUP_N,
        F.transform(
            F.sequence(F.lit(1), n - ZDUP_N + 1),
            lambda i: F.md5(F.array_join(F.slice(ws, i, ZDUP_N), " ")),
        ),
    ).otherwise(F.array().cast("array<string>"))
    # Pre-aggregate the gram stream ONCE to (doc, source, g, c) and
    # localCheckpoint it (round 13, the curation_dsir discipline):
    # gram_docs and the per-doc scoring join both consumed the raw
    # occurrence stream, so the md5 gram transform + explode over the
    # checkpointed ws arrays ran TWICE. Every downstream number is an
    # exact integer re-aggregation of the counts: nd = COUNT(*) over
    # the distinct (doc, g) rows, occurrence totals = SUM(c) — the
    # fractions divide the identical integers, so results are
    # bit-exact (parity-verified at sf0.01 and sf0.1).
    # INVARIANT (ADVICE r13): nd = COUNT(*) over (doc_id, source, g)
    # groups equals the oracle's COUNT(DISTINCT doc_id) per g ONLY
    # because doc_id is the documents table's primary key, so
    # doc_id -> source is functional and (doc_id, source, g) groups
    # are 1:1 with (doc_id, g) groups. One row per doc_id holds in
    # every fixture (FIXTURES.md §A: documents is one row per
    # document); a corpus with duplicate doc_ids would need gcnt
    # grouped by (doc_id, g) with source carried via first() instead.
    gcnt = (
        seq.select("doc_id", "source", F.explode(gram_arr).alias("g"))
        .groupBy("doc_id", "source", "g")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint()
    )
    gram_docs = gcnt.groupBy("g").agg(F.count(F.lit(1)).alias("nd"))
    per_doc = (
        gcnt.join(gram_docs, "g")
        .groupBy("doc_id", "source")
        .agg(
            (
                F.sum(
                    F.when(
                        (F.col("nd") > 1) & (F.col("nd") <= ZDUP_BOIL_CAP),
                        F.col("c"),
                    ).otherwise(F.lit(0))
                ).cast("double")
                / F.sum("c")
            ).alias("dup_frac"),
            (
                F.sum(
                    F.when(F.col("nd") > ZDUP_BOIL_CAP, F.col("c")).otherwise(
                        F.lit(0)
                    )
                ).cast("double")
                / F.sum("c")
            ).alias("boiler_frac"),
        )
    )
    kills = gram_docs.agg(
        F.count(F.when(F.col("nd") > ZDUP_BOIL_CAP, 1)).alias(
            "n_boiler_grams"
        )
    )
    return (
        per_doc.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("dup_frac"), 4).alias("avg_dup_frac"),
            F.round(F.avg("boiler_frac"), 4).alias("avg_boiler_frac"),
        )
        .crossJoin(F.broadcast(kills))
        .select(
            "source", "n_docs", "avg_dup_frac", "avg_boiler_frac",
            "n_boiler_grams",
        )
        .orderBy("source")
    )
