"""Filter-threshold sweeps and peak detection (SURVEY.md §2B curation
/ events tiers, round-6 post-window).

curation_filter_sweep answers the question every corpus-curation
review starts with: "if we set the minimum-length cutoff at X, how
much data survives?" — computed for the whole threshold grid in ONE
scan, the way a production pipeline tunes its Gopher-style filters
(per-threshold retention curves, not one-at-a-time reruns).

events_peaks is the classic local-maximum detector over a daily
series (a day strictly above both neighbors AND above its trailing
baseline) — the first-pass signal for launch spikes, incident
retrospectives, and burst labeling (complements events_burst's
Kleinberg-style episode detection and events_level_shift's mean-shift
test).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from target_iceberg_spark.plans.registry import register
from target_iceberg_spark.sources.tables import load_table

SWEEP_THRESHOLDS = (50, 100, 200, 400, 800)

PEAK_BASELINE_DAYS = 3
PEAK_RATIO = 1.25


@register(
    "curation_filter_sweep",
    oracle=f"""
WITH thr AS (
    SELECT UNNEST([{", ".join(str(t) for t in SWEEP_THRESHOLDS)}])
        AS min_chars
),
tot AS (
    SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs,
           CAST(SUM(n_chars) AS DOUBLE) AS n_chars
    FROM documents
)
SELECT t.min_chars,
       CAST(COUNT(*) FILTER (WHERE d.n_chars >= t.min_chars) AS BIGINT)
           AS kept_docs,
       ROUND(COUNT(*) FILTER (WHERE d.n_chars >= t.min_chars) / tot.n_docs, 6)
           AS doc_retention,
       ROUND(COALESCE(SUM(d.n_chars) FILTER (WHERE d.n_chars >= t.min_chars), 0)
             / tot.n_chars, 6) AS char_retention
FROM documents d
CROSS JOIN thr t
CROSS JOIN tot
GROUP BY t.min_chars, tot.n_docs, tot.n_chars
ORDER BY t.min_chars
""",
    tags=("curation", "quality", "sweep"),
)
def curation_filter_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retention curve for a minimum-length filter: for every cutoff
    in {SWEEP_THRESHOLDS}, the documents kept, the document-retention
    fraction, and the character-retention fraction (characters stand
    in for tokens — the budget that actually matters when the corpus
    feeds a tokenizer).

    Scale shape: ONE scan of documents exploded against the
    |thresholds|-row literal grid (a broadcast-able constant — the
    row multiplication is x{len(SWEEP_THRESHOLDS)}, map-side, and
    never shuffles raw text: only (threshold, n_chars) pairs leave the
    row), then one combinable conditional aggregate per threshold and
    a 1-row totals broadcast for the fractions. Retentions are ratios
    of exact integers rounded at 6. The alternative shape — one
    filtered pass per threshold — rescans the corpus
    {len(SWEEP_THRESHOLDS)}x; this is the one-pass rewrite."""
    docs = load_table(spark, sf_dir, "documents").select("n_chars")
    tot = docs.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        F.sum("n_chars").cast("double").alias("total_chars"),
    )
    thr = F.explode(
        F.array(*[F.lit(t) for t in SWEEP_THRESHOLDS])
    ).alias("min_chars")
    exploded = docs.select("n_chars", thr)
    kept = F.when(F.col("n_chars") >= F.col("min_chars"), 1).otherwise(0)
    return (
        exploded.groupBy("min_chars")
        .agg(
            F.sum(kept).alias("kept_raw"),
            F.sum(F.col("n_chars") * kept).alias("kept_chars"),
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "min_chars",
            F.col("kept_raw").cast("bigint").alias("kept_docs"),
            F.round(F.col("kept_raw") / F.col("n_docs"), 6).alias(
                "doc_retention"
            ),
            F.round(F.col("kept_chars") / F.col("total_chars"), 6).alias(
                "char_retention"
            ),
        )
        .orderBy("min_chars")
    )


OVERLAP_MIN_CHARS = 200


@register(
    "curation_filter_overlap",
    oracle=f"""
WITH feats AS (
    SELECT doc_id,
           n_chars < {OVERLAP_MIN_CHARS} AS length_fail,
           NOT (len(string_split(text, ' ')) BETWEEN 20 AND 80
                AND len(list_distinct(string_split(lower(text), ' '))) * 4
                    >= len(string_split(text, ' '))) AS quality_fail,
           md5(lower(text)) AS h
    FROM documents
),
dups AS (
    SELECT h, MIN(doc_id) AS keep_id, COUNT(*) AS n
    FROM feats GROUP BY h
),
flagged AS (
    SELECT f.length_fail, f.quality_fail,
           (d.n > 1 AND f.doc_id <> d.keep_id) AS dup_fail
    FROM feats f JOIN dups d ON f.h = d.h
),
tot AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_total FROM flagged)
SELECT length_fail, quality_fail, dup_fail,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       ROUND(COUNT(*) / tot.n_total, 6) AS share
FROM flagged CROSS JOIN tot
GROUP BY length_fail, quality_fail, dup_fail, tot.n_total
ORDER BY length_fail, quality_fail, dup_fail
""",
    tags=("curation", "quality", "audit"),
)
def curation_filter_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Venn decomposition of the curation pipeline's three kill rules
    — minimum length (< {OVERLAP_MIN_CHARS} chars), the text_quality
    gate (token count outside 20..80 or type-token ratio < 1/4), and
    exact-duplicate non-survivorship (same normalized hash, not the
    min-doc_id keeper) — as one row per flag combination with counts
    and shares. The pipeline-debugging view: whether filters kill
    DISJOINT populations (each earns its keep) or the same docs twice
    (redundant rule), and what fraction survives everything
    (false/false/false).

    Scale shape: the per-doc flags are in-row codegen off ONE scan;
    duplicate survivorship is ONE combinable hash-count aggregate
    joined back on the 16-byte digest (the dedup_exact shape — raw
    text never shuffles); the Venn rollup groups 3 booleans = <= 8
    cells, map-side combinable; shares are exact-integer ratios
    against the 1-row total broadcast."""
    docs = load_table(spark, sf_dir, "documents")
    n_tok = F.size(F.split("text", " "))
    n_types = F.size(F.array_distinct(F.split(F.lower("text"), " ")))
    feats = docs.select(
        "doc_id",
        (F.col("n_chars") < OVERLAP_MIN_CHARS).alias("length_fail"),
        (~(n_tok.between(20, 80) & (n_types * 4 >= n_tok))).alias(
            "quality_fail"
        ),
        F.md5(F.lower("text")).alias("h"),
    )
    dups = feats.groupBy("h").agg(
        F.min("doc_id").alias("keep_id"), F.count(F.lit(1)).alias("n")
    )
    flagged = feats.join(dups, "h").select(
        "length_fail",
        "quality_fail",
        ((F.col("n") > 1) & (F.col("doc_id") != F.col("keep_id"))).alias(
            "dup_fail"
        ),
    )
    tot = flagged.agg(F.count(F.lit(1)).cast("double").alias("n_total"))
    return (
        flagged.groupBy("length_fail", "quality_fail", "dup_fail")
        .agg(F.count(F.lit(1)).alias("n_raw"))
        .crossJoin(F.broadcast(tot))
        .select(
            "length_fail",
            "quality_fail",
            "dup_fail",
            F.col("n_raw").cast("bigint").alias("n_docs"),
            F.round(F.col("n_raw") / F.col("n_total"), 6).alias("share"),
        )
        .orderBy("length_fail", "quality_fail", "dup_fail")
    )


UPW_CLIP_LO, UPW_CLIP_HI = 0.2, 5.0


@register(
    "curation_upsample_weights",
    oracle=f"""
WITH per_source AS (
    SELECT source, COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS DOUBLE) AS chars
    FROM documents GROUP BY source
),
tot AS (
    SELECT CAST(SUM(chars) AS DOUBLE) AS all_chars,
           CAST(COUNT(*) AS DOUBLE) AS n_sources
    FROM per_source
),
w AS (
    SELECT source, n_docs, chars / all_chars AS char_share,
           LEAST({UPW_CLIP_HI},
                 GREATEST({UPW_CLIP_LO},
                          (1.0 / n_sources) / (chars / all_chars)))
               AS weight,
           all_chars, n_sources
    FROM per_source CROSS JOIN tot
)
SELECT source, CAST(n_docs AS BIGINT) AS n_docs,
       ROUND(char_share, 6) AS char_share,
       ROUND(weight, 6) AS weight,
       ROUND(weight * char_share
             / SUM(weight * char_share) OVER (), 6) AS reweighted_share
FROM w
ORDER BY source
""",
    tags=("curation", "sampling", "weights"),
)
def curation_upsample_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverse-propensity sampling weights that pull the corpus toward
    a UNIFORM per-source token budget without dropping documents:
    weight_s = clip(target_share / observed_char_share,
    [{UPW_CLIP_LO}, {UPW_CLIP_HI}]), plus the share each source would
    hold AFTER reweighting — the honest report of what the clip leaves
    unbalanced (an unclipped weight on a tiny source would explode its
    repeat count; the clip is what production mixers like
    temperature sampling actually ship). 1-D sibling of
    curation_ipf_raking's 2-D quota solver.

    Scale shape: ONE combinable per-source aggregate (the only pass
    over documents), a 1-row totals broadcast, and an OVER () window
    on the |sources|-row frame (bounded — the CI sweep's unpartitioned-
    window rule exempts group-count-sized frames). Shares and weights
    are ratios of exact integer char counts, rounded once."""
    docs = load_table(spark, sf_dir, "documents")
    per_source = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("double").alias("chars"),
    )
    tot = per_source.agg(
        F.sum("chars").cast("double").alias("all_chars"),
        F.count(F.lit(1)).cast("double").alias("n_sources"),
    )
    share = F.col("chars") / F.col("all_chars")
    weight = F.least(
        F.lit(UPW_CLIP_HI),
        F.greatest(F.lit(UPW_CLIP_LO), (1.0 / F.col("n_sources")) / share),
    )
    w = per_source.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_docs",
        share.alias("char_share"),
        weight.alias("weight"),
    )
    total_mass = Window.partitionBy()
    return w.select(
        "source",
        F.col("n_docs").cast("bigint").alias("n_docs"),
        F.round("char_share", 6).alias("char_share"),
        F.round("weight", 6).alias("weight"),
        F.round(
            (F.col("weight") * F.col("char_share"))
            / F.sum(F.col("weight") * F.col("char_share")).over(total_mass),
            6,
        ).alias("reweighted_share"),
    ).orderBy("source")


@register(
    "events_peaks",
    oracle=f"""
WITH daily AS (
    SELECT event_type,
           strftime(date_trunc('day', CAST(ts AS TIMESTAMP)), '%Y-%m-%d')
               AS day,
           COUNT(*) AS n
    FROM events
    GROUP BY 1, 2
),
w AS (
    SELECT event_type, day, n,
           LAG(n) OVER (PARTITION BY event_type ORDER BY day) AS prev_n,
           LEAD(n) OVER (PARTITION BY event_type ORDER BY day) AS next_n,
           AVG(n) OVER (PARTITION BY event_type ORDER BY day
                        ROWS BETWEEN {PEAK_BASELINE_DAYS} PRECEDING
                        AND 1 PRECEDING) AS baseline
    FROM daily
)
SELECT event_type, day, CAST(n AS BIGINT) AS n_events,
       ROUND(n / baseline, 4) AS over_baseline
FROM w
WHERE n > prev_n AND n > next_n AND n > {PEAK_RATIO} * baseline
ORDER BY event_type, day
""",
    tags=("analytics", "events", "peaks"),
)
def events_peaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local-maximum days per event type: a day whose count strictly
    exceeds both neighboring days AND {PEAK_RATIO}x its trailing
    {PEAK_BASELINE_DAYS}-day average — the neighbor test kills
    plateaus, the baseline test kills noise wiggles on a flat series.
    First/last days have a NULL neighbor and never qualify (three-
    valued logic, identical in both engines).

    Scale shape: the daily rollup is ONE combinable count (the only
    pass over raw events); lag/lead/trailing-avg are three frame
    specs over the SAME partitioned window sort (event_type, day) —
    Spark computes them in a single WindowExec over the tiny
    per-type daily frame. The baseline average is a ratio of exact
    integer counts, rounded at 4."""
    daily = (
        load_table(spark, sf_dir, "events")
        .groupBy(
            "event_type",
            F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias(
                "day"
            ),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.partitionBy("event_type").orderBy("day")
    wbase = w.rowsBetween(-PEAK_BASELINE_DAYS, -1)
    flagged = daily.select(
        "event_type",
        "day",
        "n",
        F.lag("n").over(w).alias("prev_n"),
        F.lead("n").over(w).alias("next_n"),
        F.avg("n").over(wbase).alias("baseline"),
    )
    return (
        flagged.where(
            (F.col("n") > F.col("prev_n"))
            & (F.col("n") > F.col("next_n"))
            & (F.col("n") > PEAK_RATIO * F.col("baseline"))
        )
        .select(
            "event_type",
            "day",
            F.col("n").cast("bigint").alias("n_events"),
            F.round(F.col("n") / F.col("baseline"), 4).alias("over_baseline"),
        )
        .orderBy("event_type", "day")
    )
