"""Training-data curation plans: TF-IDF, benchmark decontamination,
deterministic stratified sampling, a composed keep/drop pipeline, and
GROUPING SETS reporting (SURVEY.md §2B north star — the operations a
large-scale LLM-data pipeline runs between ingestion and training).

Everything is built-in expression API; the randomness-free designs
(md5-ordered sampling, md5 n-gram hashing) keep every query inside the
strict DuckDB oracle gate.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from target_iceberg_spark.functions.hashing import hex_int_sql
from target_iceberg_spark.functions.textfns import (
    LANG_MARKERS,
    marker_hits,
    ngrams_of,
    tokens,
)
from target_iceberg_spark.plans.registry import register
from target_iceberg_spark.sources.tables import load_table

TFIDF_DOC_LIMIT = 50  # score the full corpus, report top terms for docs < 50
TFIDF_TOP_TERMS = 3
DECON_EVAL_MOD = 97  # doc_id % 97 == 0 -> held-out "benchmark" set
DECON_NGRAM = 5
STRATA_SAMPLE_N = 20


@register(
    "text_tfidf",
    oracle=f"""
WITH t AS (
    SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term FROM documents
),
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM t GROUP BY doc_id, term),
idf AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
n AS (SELECT COUNT(*) AS n FROM documents),
scored AS (
    SELECT doc_id, term,
           ROUND(tf * ln((n + 1.0) / (df + 1.0)), 6) AS tfidf
    FROM tf JOIN idf USING (term) CROSS JOIN n
    WHERE doc_id < {TFIDF_DOC_LIMIT}
)
SELECT doc_id, term, tfidf FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                                 ORDER BY tfidf DESC, term) AS rn
    FROM scored
) WHERE rn <= {TFIDF_TOP_TERMS}
""",
    tags=("text", "curation"),
)
def text_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top TF-IDF terms per document: term frequencies and document
    frequencies over the FULL corpus (two map-side-combinable groupBys),
    smoothed idf = ln((N+1)/(df+1)), per-doc top-k via window. The
    1-row corpus count is broadcast; the df table joins on term —
    at 100 TB both stay shuffle-light (vocab << corpus)."""
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select("doc_id", F.explode(tokens("text")).alias("term"))
    tf = t.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    idf = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n = docs.agg(F.count(F.lit(1)).alias("n"))
    scored = (
        tf.where(F.col("doc_id") < TFIDF_DOC_LIMIT)
        .join(idf, "term")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "term",
            F.round(
                F.col("tf") * F.log((F.col("n") + 1.0) / (F.col("df") + 1.0)), 6
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), "term")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= TFIDF_TOP_TERMS)
        .select("doc_id", "term", "tfidf")
    )


def _decon_shingle_sql() -> str:
    parts = " || ' ' || ".join(f"toks[i+{k}]" for k in range(DECON_NGRAM))
    return f"""
w AS (SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents),
sh AS (
    SELECT DISTINCT doc_id, md5(g) AS gh FROM (
        SELECT doc_id,
               unnest(list_transform(range(1, len(toks) - {DECON_NGRAM - 2}),
                      i -> {parts.replace("toks[i+0]", "toks[i]")})) AS g
        FROM w
    )
)"""


@register(
    "text_decontaminate",
    oracle=f"""
WITH {_decon_shingle_sql()}
SELECT a.doc_id AS train_doc, b.doc_id AS eval_doc, COUNT(*) AS n_shared
FROM sh a JOIN sh b ON a.gh = b.gh
WHERE a.doc_id % {DECON_EVAL_MOD} <> 0 AND b.doc_id % {DECON_EVAL_MOD} = 0
GROUP BY 1, 2
""",
    tags=("text", "curation", "dedup"),
)
def text_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: count distinct {n}-gram collisions
    between every training document and a held-out eval set — the
    standard pre-training hygiene check. Shingles are md5-hashed and
    the overlap is an equi-join on the hash: work scales with shingle
    collisions, never |train| x |eval|. At 100 TB the eval side is tiny
    and broadcastable; here both sides derive from one shingle scan."""
    docs = load_table(spark, sf_dir, "documents", fanout=True)
    sh = (
        docs.withColumn("_toks", tokens("text"))
        .select(
            "doc_id",
            F.explode(F.array_distinct(ngrams_of("_toks", DECON_NGRAM))).alias("g"),
        )
        .select("doc_id", F.md5("g").alias("gh"))
    )
    train = sh.where(F.col("doc_id") % DECON_EVAL_MOD != 0)
    ev = sh.where(F.col("doc_id") % DECON_EVAL_MOD == 0)
    return (
        train.alias("a")
        .join(ev.alias("b"), F.col("a.gh") == F.col("b.gh"))
        .groupBy(
            F.col("a.doc_id").alias("train_doc"),
            F.col("b.doc_id").alias("eval_doc"),
        )
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )


@register(
    "sample_stratified",
    oracle=f"""
SELECT lang, doc_id, CAST(rn AS INT) AS strat_rank FROM (
    SELECT lang, doc_id,
           ROW_NUMBER() OVER (PARTITION BY lang
                              ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
    FROM documents
) WHERE rn <= {STRATA_SAMPLE_N}
""",
    tags=("sampling", "curation"),
)
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sample: exactly N docs per language,
    chosen by md5(doc_id) order — a seedless, engine-portable uniform
    draw (hash order is uncorrelated with any data attribute), so the
    same rows are selected on every engine and every run. One window
    shuffle on the stratum key; no sample() nondeterminism."""
    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    return (
        docs.select("lang", "doc_id", F.row_number().over(w).alias("strat_rank"))
        .where(F.col("strat_rank") <= STRATA_SAMPLE_N)
    )


def _curation_oracle() -> str:
    hits = [
        f"len(list_filter(string_split(lower(text), ' '), t -> t IN "
        f"({', '.join(chr(39) + m + chr(39) for m in LANG_MARKERS[lang])}))) AS h_{lang}"
        for lang in LANG_MARKERS
    ]
    others = " AND ".join(f"h_en >= h_{o}" for o in LANG_MARKERS if o != "en")
    return f"""
WITH f AS (
    SELECT doc_id, source,
           len(string_split(text, ' ')) AS n_tok,
           len(list_distinct(string_split(lower(text), ' '))) AS n_types,
           md5(lower(text)) AS th,
           {", ".join(hits)}
    FROM documents
),
k AS (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY th ORDER BY doc_id) AS keep_rn
    FROM f
)
SELECT source, COUNT(*) AS n_kept, CAST(SUM(n_tok) AS BIGINT) AS total_tokens
FROM k
WHERE keep_rn = 1
  AND n_tok BETWEEN 20 AND 80 AND n_types * 4 >= n_tok
  AND h_en > 0 AND {others}
GROUP BY source ORDER BY source
"""


@register("curation_pipeline", oracle=_curation_oracle(), tags=("curation",))
def curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed keep/drop pipeline a pre-training corpus runs:
    exact-dedup keep rule (first doc per normalized-text hash) AND
    quality gate (token count + type/token ratio) AND language filter
    (marker-lexicon English), reported as kept docs + token budget per
    source. One scan, one dedup window, one combinable groupBy —
    filters all run before the aggregation shuffle."""
    docs = load_table(spark, sf_dir, "documents")
    f = docs.withColumn("_toks", tokens("text")).select(
        "doc_id",
        "source",
        F.size(F.split("text", " ")).alias("n_tok"),
        F.size(F.array_distinct(F.col("_toks"))).alias("n_types"),
        F.md5(F.lower("text")).alias("th"),
        *[
            marker_hits("text", lang, token_array="_toks").alias(f"h_{lang}")
            for lang in LANG_MARKERS
        ],
    )
    w = Window.partitionBy("th").orderBy("doc_id")
    en_best = (F.col("h_en") > 0) & F.expr(
        " AND ".join(f"h_en >= h_{o}" for o in LANG_MARKERS if o != "en")
    )
    return (
        f.withColumn("keep_rn", F.row_number().over(w))
        .where(
            (F.col("keep_rn") == 1)
            & F.col("n_tok").between(20, 80)
            & (F.col("n_types") * 4 >= F.col("n_tok"))
            & en_best
        )
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.sum("n_tok").alias("total_tokens"),
        )
        .orderBy("source")
    )


@register(
    "agg_grouping_sets",
    oracle="""
SELECT l_returnflag, l_linestatus,
       ROUND(SUM(l_quantity), 2) AS sum_qty,
       ROUND(SUM(l_extendedprice), 2) AS sum_price,
       COUNT(*) AS n_rows
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_linestatus), ())
""",
    tags=("aggregate", "grouping"),
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arbitrary GROUPING SETS — the asymmetric set list
    ((flag, status), (status), ()) that neither rollup nor cube can
    express. Spark expands to one hash aggregate over an Expand node
    (each input row feeds every set) — a single shuffle, same as a
    plain groupBy. Grouping columns are non-null in lineitem, so NULL
    unambiguously marks the grouped-out dimension."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupingSets(
            [["l_returnflag", "l_linestatus"], ["l_linestatus"], []],
            "l_returnflag",
            "l_linestatus",
        )
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


@register(
    "curation_domain_mix",
    oracle="""
WITH s AS (
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS src_tokens
    FROM documents GROUP BY source
)
SELECT source, n_docs, src_tokens,
       ROUND(CAST(src_tokens AS DOUBLE) / SUM(src_tokens) OVER (), 6) AS share,
       ROUND((1.0 / COUNT(*) OVER ())
             / (CAST(src_tokens AS DOUBLE) / SUM(src_tokens) OVER ()), 6) AS mix_weight
FROM s
ORDER BY source
""",
    tags=("curation",),
)
def curation_domain_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-mixing weights: per-source token share and the resampling
    weight that flattens the mix to uniform (weight = target_share /
    actual_share — the knob a training-data pipeline turns to re-balance
    sources). One map-side-combinable groupBy; the share denominators
    are unpartitioned window aggregates over the tiny per-source frame,
    so no second scan of the corpus."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    s = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(F.split("text", " "))).alias("src_tokens"),
    )
    w = Window.partitionBy()
    share = F.col("src_tokens").cast("double") / F.sum("src_tokens").over(w)
    target = F.lit(1.0) / F.count(F.lit(1)).over(w)
    return s.select(
        "source",
        "n_docs",
        "src_tokens",
        F.round(share, 6).alias("share"),
        F.round(target / share, 6).alias("mix_weight"),
    ).orderBy("source")


@register(
    "text_perplexity",
    oracle="""
WITH toks AS (
    SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok
    FROM documents
),
freq AS (
    SELECT tok, COUNT(*) AS c FROM toks GROUP BY tok
),
p AS (
    SELECT tok, CAST(c AS DOUBLE) / SUM(c) OVER () AS p FROM freq
)
SELECT t.doc_id,
       COUNT(*) AS n_tokens,
       ROUND(-AVG(ln(p.p)), 4) AS cross_entropy
FROM toks t JOIN p ON t.tok = p.tok
GROUP BY t.doc_id
""",
    tags=("curation", "quality"),
)
def text_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM cross-entropy per document — the cheap stand-in for
    the perplexity quality filter every LLM data pipeline runs (docs
    full of rare tokens score high; perplexity = exp(cross_entropy)).
    The LM is fit on the corpus itself in the same job: token explode ->
    combinable frequency groupBy -> probability by dividing by the
    corpus token total, computed as a separate ONE-ROW aggregate over
    per-document token counts (a narrow scan; sum of sizes == sum of
    unigram counts) and broadcast via crossJoin. On a 100 TB web corpus
    the distinct-token table is billions of rows, so the previous
    unpartitioned SUM-over-all window — which funnels the whole vocab
    through one task — is exactly the shape this avoids. The occurrence
    join back to probabilities shuffles on the token key."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.explode(tokens("text")).alias("tok"))
    freq = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    total = docs.agg(F.sum(F.size(tokens("text"))).cast("double").alias("_w"))
    p = freq.crossJoin(F.broadcast(total)).select(
        "tok", (F.col("c").cast("double") / F.col("_w")).alias("p")
    )
    return (
        toks.join(p, "tok")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(-F.avg(F.log("p")), 4).alias("cross_entropy"),
        )
    )


PACK_CAPACITY = 2048


@register(
    "curation_pack_sequences",
    oracle=f"""
WITH d AS (
    SELECT doc_id, source,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
    FROM documents
),
c AS (
    SELECT doc_id, source, n_tokens,
           SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                               ROWS UNBOUNDED PRECEDING) AS cum
    FROM d
)
SELECT source,
       CAST(FLOOR((cum - n_tokens) / {PACK_CAPACITY}) AS INT) AS pack_id,
       COUNT(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS pack_tokens
FROM c
GROUP BY source, CAST(FLOOR((cum - n_tokens) / {PACK_CAPACITY}) AS INT)
ORDER BY source, pack_id
""",
    tags=("curation", "packing"),
)
def curation_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing for pretraining: docs are binned into
    fixed-token-budget packs by their running-token offset within each
    source shard (deterministic doc_id order); a doc straddling a
    boundary spills into the pack its START offset falls in
    (best-effort fill, documented overflow). Output is the per-pack
    manifest a downstream tokenizer consumes.

    Scale shape (r11 rewrite): the running offset is a per-source
    prefix sum over EVERY doc, so a source-partitioned window would
    serialize corpus/|sources| rows into one task; instead the offsets
    compute with the distributed exact-prefix-sum recipe
    (agg_decile_lift's): range-repartition on (source, doc_id) with
    pinned assignment, within-partition cumsums, per-partition totals
    cumulated over <= partitions x sources rows and broadcast back.
    Identical values; no single task sees more than a range slice."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    d = docs.select(
        "doc_id", "source", F.size(F.split("text", " ")).cast("long").alias("n_tokens")
    )
    parts = (
        d.repartitionByRange(32, "source", "doc_id")
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint()  # pin assignment: offsets and local cumsums
        # must see the same partition bounds on re-execution
    )
    w_local = (
        Window.partitionBy("_pid", "source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = parts.withColumn("_lcum", F.sum("n_tokens").over(w_local))
    offsets = (
        parts.groupBy("source", "_pid")
        .agg(F.sum("n_tokens").alias("_pt"))
        .select(
            "source",
            "_pid",
            F.coalesce(
                F.sum("_pt").over(
                    Window.partitionBy("source")
                    .orderBy("_pid")
                    .rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ).alias("_off"),
        )
    )
    c = local.join(F.broadcast(offsets), ["source", "_pid"]).withColumn(
        "cum", F.col("_lcum") + F.col("_off")
    )
    return (
        c.groupBy(
            "source",
            F.floor((F.col("cum") - F.col("n_tokens")) / PACK_CAPACITY)
            .cast("int")
            .alias("pack_id"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("pack_tokens"),
        )
        .orderBy("source", "pack_id")
    )


# Smoothing exponent α (shares raised to α directly): α < 1 flattens
# the mix toward uniform (upsamples small sources), α = 1 is natural.
MIX_TEMPERATURE = 0.7


@register(
    "curation_mix_temperature",
    oracle=f"""
WITH s AS (
    SELECT source, CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS src_tokens
    FROM documents GROUP BY source
),
sh AS (
    SELECT source, src_tokens,
           CAST(src_tokens AS DOUBLE) / SUM(src_tokens) OVER () AS share
    FROM s
)
SELECT source, src_tokens,
       ROUND(share, 6) AS share,
       ROUND(pow(share, {MIX_TEMPERATURE})
             / SUM(pow(share, {MIX_TEMPERATURE})) OVER (), 6) AS t_share,
       ROUND((pow(share, {MIX_TEMPERATURE})
             / SUM(pow(share, {MIX_TEMPERATURE})) OVER ()) / share, 6)
           AS resample_weight
FROM sh
ORDER BY source
""",
    tags=("curation", "mixing"),
)
def curation_mix_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled domain mixing (the Pile/ROOTS /
    multilingual-BERT exponential-smoothing recipe): sampling share ∝
    natural_share^α with α = MIX_TEMPERATURE = 0.7 < 1, which FLATTENS
    the distribution — small sources are upsampled toward (but not all
    the way to) uniform; α=1 keeps natural proportions, α=0 is uniform.
    resample_weight = t_share / share is the per-source multiplier a
    sampler applies. Same single-scan + tiny-frame-window shape as
    curation_domain_mix."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy()
    s = docs.groupBy("source").agg(
        F.sum(F.size(F.split("text", " "))).alias("src_tokens")
    )
    share = F.col("src_tokens").cast("double") / F.sum("src_tokens").over(w)
    sh = s.select("source", "src_tokens", share.alias("share"))
    powed = F.pow(F.col("share"), MIX_TEMPERATURE)
    t_share = powed / F.sum(powed).over(w)
    return sh.select(
        "source",
        "src_tokens",
        F.round("share", 6).alias("share"),
        F.round(t_share, 6).alias("t_share"),
        F.round(t_share / F.col("share"), 6).alias("resample_weight"),
    ).orderBy("source")


# Per-tier keep rates expressed as 8-hex-digit md5-prefix thresholds:
# P(keep) = int(threshold, 16) / 2^32. Lexicographic comparison of the
# fixed-width lowercase-hex prefix IS numeric comparison, and md5 hex
# is identical across engines — a seedless, portable Bernoulli draw
# with NO window shuffle (contrast rank-based sampling, which would
# funnel the corpus through |tiers| partitions).
RESAMPLE_MID_THRESHOLD = "80000000"  # ~0.5
RESAMPLE_LOW_THRESHOLD = "19999999"  # ~0.1


@register(
    "curation_quality_resample",
    oracle=f"""
WITH f AS (
    SELECT doc_id, source,
           len(string_split(text, ' ')) AS n_tok,
           len(list_distinct(string_split(lower(text), ' '))) AS n_types,
           substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS h
    FROM documents
),
t AS (
    SELECT *,
           CASE WHEN n_tok BETWEEN 20 AND 80 AND n_types * 4 >= n_tok
                THEN 'high'
                WHEN n_tok >= 10 THEN 'mid'
                ELSE 'low' END AS tier
    FROM f
),
k AS (
    SELECT *,
           CASE tier WHEN 'high' THEN TRUE
                     WHEN 'mid'  THEN h < '{RESAMPLE_MID_THRESHOLD}'
                     ELSE             h < '{RESAMPLE_LOW_THRESHOLD}'
           END AS keep
    FROM t
)
SELECT source, tier,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       CAST(SUM(CASE WHEN keep THEN n_tok ELSE 0 END) AS BIGINT) AS kept_tokens
FROM k
GROUP BY source, tier
ORDER BY source, tier
""",
    tags=("curation", "sampling"),
)
def curation_quality_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-weighted deterministic downsampling (the
    keep-the-good-data stage: high-quality docs kept wholesale,
    mid-quality thinned to ~50%, junk to ~10%): each document draws a
    portable Bernoulli from its md5(doc_id) hex prefix compared against
    a per-tier threshold, and the audit reports docs/kept/tokens per
    (source, tier).

    Scale shape: pure scan + codegen expressions + one
    map-side-combinable groupBy — no window, no join, no shuffle wider
    than the (sources x tiers)-row final aggregate. The same predicate
    applied as a filter (instead of an audit aggregate) IS the
    production sampler."""
    docs = load_table(spark, sf_dir, "documents")
    n_tok = F.size(F.split("text", " "))
    n_types = F.size(F.array_distinct(F.split(F.lower("text"), " ")))
    h = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8)
    tier = (
        F.when((n_tok.between(20, 80)) & (n_types * 4 >= n_tok), "high")
        .when(n_tok >= 10, "mid")
        .otherwise("low")
    )
    keep = (
        F.when(F.col("tier") == "high", F.lit(True))
        .when(F.col("tier") == "mid", F.col("h") < RESAMPLE_MID_THRESHOLD)
        .otherwise(F.col("h") < RESAMPLE_LOW_THRESHOLD)
    )
    return (
        docs.select(
            "source", n_tok.alias("n_tok"), tier.alias("tier"), h.alias("h")
        )
        .withColumn("keep", keep)
        .groupBy("source", "tier")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(F.when(F.col("keep"), 1).otherwise(0)).cast("long").alias("n_kept"),
            F.sum(F.when(F.col("keep"), F.col("n_tok")).otherwise(0))
            .cast("long")
            .alias("kept_tokens"),
        )
        .orderBy("source", "tier")
    )


# Deterministic split fractions out of 100 md5 buckets:
# [0, 90) train / [90, 95) val / [95, 100) test.
SPLIT_VAL_LO = 90
SPLIT_TEST_LO = 95


@register(
    "curation_split",
    oracle=f"""
WITH b AS (
    SELECT source,
           len(string_split(text, ' ')) AS n_tok,
           {hex_int_sql("md5(CAST(doc_id AS VARCHAR))")} % 100 AS bucket
    FROM documents
),
s AS (
    SELECT source, n_tok,
           CASE WHEN bucket < {SPLIT_VAL_LO} THEN 'train'
                WHEN bucket < {SPLIT_TEST_LO} THEN 'val'
                ELSE 'test' END AS split
    FROM b
)
SELECT source, split,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
       ROUND(COUNT(*) * 1.0 /
             SUM(COUNT(*)) OVER (PARTITION BY source), 6) AS doc_share
FROM s
GROUP BY source, split
ORDER BY source, split
""",
    tags=("curation", "splitting"),
)
def curation_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test split audit — the dataset-split
    stage of a training pipeline. Each document lands in one of 100
    md5(doc_id) buckets (engine-portable hex-prefix integer, the same
    idiom as the feature hasher); buckets [0,90) are train, [90,95)
    val, the rest test. Hash-based splitting is the 100 TB recipe:
    membership is a pure function of the document id — stable across
    reruns, data growth and engine — with no global sort, no sampling
    state, and no shuffle beyond the audit aggregate itself. The
    doc_share window partitions per source over <= 3 rows."""
    from pyspark.sql import Window

    from target_iceberg_spark.functions.hashing import hex_int

    docs = load_table(spark, sf_dir, "documents")
    bucket = hex_int(F.md5(F.col("doc_id").cast("string"))).cast("bigint") % 100
    split = (
        F.when(bucket < SPLIT_VAL_LO, "train")
        .when(bucket < SPLIT_TEST_LO, "val")
        .otherwise("test")
    )
    per_source = Window.partitionBy("source")
    return (
        docs.select(
            "source",
            split.alias("split"),
            F.size(F.split("text", " ")).alias("n_tok"),
        )
        .groupBy("source", "split")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_tok").cast("long").alias("n_tokens"),
        )
        .withColumn(
            "doc_share",
            F.round(
                F.col("n_docs") * 1.0 / F.sum("n_docs").over(per_source), 6
            ),
        )
        .orderBy("source", "split")
    )


from target_iceberg_spark.plans.dedup_sql import _minhash_ctes


@register(
    "curation_neardup_pipeline",
    oracle=f"""
WITH {_minhash_ctes()},
losers AS (SELECT DISTINCT id_b AS doc_id FROM cand),
kept AS (
    SELECT d.source, len(string_split(d.text, ' ')) AS n_tok
    FROM documents d
    LEFT JOIN losers l ON l.doc_id = d.doc_id
    WHERE l.doc_id IS NULL
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_kept,
       CAST(SUM(n_tok) AS BIGINT) AS total_tokens
FROM kept
WHERE n_tok BETWEEN 20 AND 80
GROUP BY source
ORDER BY source
""",
    tags=("curation", "dedup", "pipeline"),
)
def curation_neardup_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The NEAR-dup curation composite — the canonical pre-training
    shape (MinHash LSH -> drop dominated docs -> quality gate ->
    per-source token budget) as ONE lazy plan. A doc is dropped when
    any LSH candidate pair partners it with a smaller doc_id (the
    cheap keep-smallest rule; `dedup_clusters` is the full
    connected-components variant), spelled as a LEFT ANTI join against
    the distinct id_b side. Scale shape: candidate generation is the
    band-key equi-join (never O(N²)), the anti join shuffles only
    (doc_id) keys, the length gate runs before the final combinable
    per-source aggregate — every stage is the one `dedup_minhash` /
    `curation_pipeline` already proved at their own scale, composed
    end-to-end."""
    from target_iceberg_spark.operators.dedup import minhash_candidate_pairs
    from target_iceberg_spark.plans.dedup_sql import BANDS, NUM_HASHES

    docs = load_table(spark, sf_dir, "documents", fanout=True)
    pairs = minhash_candidate_pairs(
        docs, "doc_id", "text", n=3, num_hashes=NUM_HASHES, bands=BANDS
    )
    losers = pairs.select(F.col("id_b").alias("doc_id")).distinct()
    return (
        docs.join(losers, "doc_id", "left_anti")
        .select("source", F.size(F.split("text", " ")).alias("n_tok"))
        .where(F.col("n_tok").between(20, 80))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.sum("n_tok").alias("total_tokens"),
        )
        .orderBy("source")
    )
