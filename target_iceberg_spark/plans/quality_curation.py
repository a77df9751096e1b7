"""Round-5 curation & data-quality tier: URL canonicalization dedup,
per-source token-budget packing, quality-aware near-dup survivor
pipeline, distribution-drift (PSI) profiling, and CDC changelog apply
(SURVEY.md §2B north-star extensions; the reference implements none of
this — it is an append-only ingestion tool, sinks.py:100).

Every query here is a composition of combinable aggregates, equi-joins
on compact keys, and per-source-partitioned windows — no unpartitioned
window, no all-pairs join, nothing driver-side. Oracle strings mirror
each plan expression-for-expression (same regex anchors, same double
promotions, same rounding) so the DuckDB hash check stays exact.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from target_iceberg_spark.plans.registry import register
from target_iceberg_spark.sources.tables import load_table

# --------------------------------------------------------------------
# dedup_url — URL canonicalization dedup
# --------------------------------------------------------------------

# Deterministic synthetic URL per event (the tables ship no URL column):
# scheme + optional www + host from event_type + path from user_id +
# optional tracking query + optional trailing slash. The VARIANTS are
# the point — the same canonical page appears under many raw spellings.
_URL_SQL = (
    "concat('https://', CASE WHEN event_id % 3 = 0 THEN 'www.' ELSE '' END, "
    "event_type, '.example.com/item/', CAST(user_id % 100 AS STRING), "
    "CASE WHEN event_id % 5 = 0 THEN '/' ELSE '' END, "
    "CASE WHEN event_id % 2 = 0 "
    "THEN concat('?utm_campaign=c', CAST(event_id % 7 AS STRING)) ELSE '' END)"
)
_URL_SQL_DUCK = _URL_SQL.replace(" AS STRING", " AS VARCHAR")

# Canonicalization: strip scheme, strip leading www., drop query+fragment,
# drop trailing slashes. Anchored patterns behave identically under
# Spark's replace-all and DuckDB's replace-first semantics.
_CANON_STEPS = [
    ("^https?://", ""),
    (r"^www\.", ""),
    (r"[?#].*$", ""),
    ("/+$", ""),
]


def _canon_sql(col: str) -> str:
    out = col
    for pat, rep in _CANON_STEPS:
        out = f"regexp_replace({out}, '{pat}', '{rep}')"
    return out


@register(
    "dedup_url",
    oracle=f"""
WITH u AS (
    SELECT event_type, {_URL_SQL_DUCK} AS url FROM events
),
c AS (
    SELECT event_type, url, {_canon_sql('url')} AS canonical FROM u
)
SELECT event_type,
       CAST(COUNT(DISTINCT url) AS BIGINT) AS n_raw,
       CAST(COUNT(DISTINCT canonical) AS BIGINT) AS n_canonical,
       ROUND(1.0 - CAST(COUNT(DISTINCT canonical) AS DOUBLE)
                   / COUNT(DISTINCT url), 4) AS dup_rate
FROM c
GROUP BY event_type
ORDER BY event_type
""",
    tags=("dedup", "url", "curation"),
)
def dedup_url(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization dedup — the crawl-curation step that runs
    BEFORE any content dedup: scheme/www/tracking-param/trailing-slash
    variants of the same page collapse to one canonical key, so the
    fetch list (and every downstream text pass) shrinks without reading
    a single body byte.

    Scale shape: canonicalization is four anchored codegen
    regexp_replace ops per row (no Python, no shuffle); the dedup
    itself is count(DISTINCT) inside a per-host-group aggregate —
    Spark expands multi-distinct into one expand + partial aggregate,
    shuffling only (group, url) pairs. At 100 TB the same canonical
    expression becomes the dropDuplicates / MERGE key; this query is
    the audit form (how much does canonicalization shrink the corpus),
    which is what you run to pick the rules."""
    ev = load_table(spark, sf_dir, "events")
    url = F.expr(_URL_SQL)
    canon = url
    for pat, rep in _CANON_STEPS:
        canon = F.regexp_replace(canon, pat, rep)
    return (
        ev.select("event_type", url.alias("url"), canon.alias("canonical"))
        .groupBy("event_type")
        .agg(
            F.countDistinct("url").alias("n_raw"),
            F.countDistinct("canonical").alias("n_canonical"),
            F.round(
                F.lit(1.0)
                - F.countDistinct("canonical").cast("double")
                / F.countDistinct("url"),
                4,
            ).alias("dup_rate"),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------
# curation_token_budget — per-source budget packing
# --------------------------------------------------------------------

TOKEN_BUDGET_PER_SOURCE = 2000


@register(
    "curation_token_budget",
    oracle=f"""
WITH scored AS (
    SELECT source, doc_id,
           len(string_split(text, ' ')) AS n_tok
    FROM documents
),
packed AS (
    SELECT source, n_tok,
           SUM(n_tok) OVER (PARTITION BY source
                            ORDER BY n_tok DESC, doc_id
                            ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND CURRENT ROW) AS cum_tok
    FROM scored
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tok) AS BIGINT) AS tokens_packed
FROM packed
WHERE cum_tok <= {TOKEN_BUDGET_PER_SOURCE}
GROUP BY source
ORDER BY source
""",
    tags=("curation", "budget"),
)
def curation_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget packing: each source contributes at most
    TOKEN_BUDGET_PER_SOURCE tokens to the training mix, filled
    greedily in deterministic priority order (longest doc first, then
    doc_id) — the "cap every domain" step that keeps one giant crawl
    slice from dominating a mixture, dual of curation_domain_mix's
    proportional sampler.

    Scale shape (r11 rewrite): the greedy longest-first cutoff never
    depends on doc IDENTITY within an equal-length tie group, so the
    exact pack is computable from the per-(source, length) HISTOGRAM —
    one combinable groupBy, a cumulative window over the length-
    bounded histogram (distinct doc lengths per source, not docs), and
    per-group integer arithmetic: a length-L group with prior
    cumulative P contributes m = clamp(floor((B - P) / L), 0, count)
    docs. The oracle keeps the doc-level window form; the values are
    identical by the tie-group argument. No task ever sees
    corpus/|sources| rows — the earlier per-source doc window did."""
    docs = load_table(spark, sf_dir, "documents")
    scored = docs.select(
        "source", F.size(F.split("text", " ")).alias("n_tok")
    )
    hist = scored.groupBy("source", "n_tok").agg(
        F.count(F.lit(1)).alias("c")
    )
    w = (
        Window.partitionBy("source")
        .orderBy(F.desc("n_tok"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = hist.withColumn(
        "prev_tok",
        F.sum(F.col("n_tok") * F.col("c")).over(w) - F.col("n_tok") * F.col("c"),
    )
    m = F.greatest(
        F.lit(0),
        F.least(
            F.col("c"),
            F.floor(
                (F.lit(TOKEN_BUDGET_PER_SOURCE) - F.col("prev_tok"))
                / F.col("n_tok")
            ),
        ),
    )
    return (
        cum.select("source", "n_tok", m.alias("m"))
        .groupBy("source")
        .agg(
            F.sum("m").alias("n_docs"),
            F.sum(F.col("m") * F.col("n_tok")).alias("tokens_packed"),
        )
        .where(F.col("n_docs") > 0)
        .orderBy("source")
    )


# --------------------------------------------------------------------
# curation_neardup_keepbest — survivor-policy near-dup pipeline
# --------------------------------------------------------------------

from target_iceberg_spark.plans.dedup_sql import (  # noqa: E402
    BANDS,
    NUM_HASHES,
    _minhash_ctes,
)


@register(
    "curation_neardup_keepbest",
    oracle=f"""
WITH RECURSIVE {_minhash_ctes().lstrip()},
edges AS (
    SELECT id_a AS a, id_b AS b FROM cand
    UNION
    SELECT id_b AS a, id_a AS b FROM cand
),
reach(src, dst) AS (
    SELECT a, b FROM edges
    UNION
    SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a
),
comps AS (
    SELECT src AS doc_id, LEAST(MIN(dst), src) AS cluster_id
    FROM reach GROUP BY src
),
ranked AS (
    SELECT c.doc_id,
           ROW_NUMBER() OVER (PARTITION BY c.cluster_id
                              ORDER BY d.n_chars DESC, c.doc_id) AS rn
    FROM comps c JOIN documents d USING (doc_id)
),
losers AS (SELECT doc_id FROM ranked WHERE rn > 1),
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
def curation_neardup_keepbest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """curation_neardup_pipeline with dedup_keep_best's survivor
    policy wired in: instead of the cheap keep-smallest-id rule, each
    near-dup CLUSTER (connected components over the LSH candidate
    graph) keeps its LONGEST member (ties -> lowest doc_id) and drops
    the rest, then the same quality gate + per-source token rollup
    runs over the survivors — the full production shape when
    duplicates differ by truncation and you must keep the fullest
    copy, closing the gap between the dedup primitives and the
    curation composite.

    Scale shape: candidate generation is the band-key equi-join;
    components is the distributed label-propagation loop already
    scale-argued in operators/components.py; survivor choice is ONE
    combinable per-cluster max_by (no window on the Spark side — the
    oracle's ROW_NUMBER is mirror-only); the drop is a LEFT ANTI join
    shuffling bare doc_ids. Every stage is a proven piece
    (dedup_minhash, dedup_keep_best, curation_neardup_pipeline)
    composed end-to-end as one lazy plan."""
    from target_iceberg_spark.operators.components import connected_components
    from target_iceberg_spark.operators.dedup import minhash_candidate_pairs

    docs = load_table(spark, sf_dir, "documents")
    pairs = minhash_candidate_pairs(
        docs, "doc_id", "text", n=3, num_hashes=NUM_HASHES, bands=BANDS
    )
    comp = connected_components(pairs, "id_a", "id_b")
    members = comp.join(
        docs.select("doc_id", "n_chars"), comp.vertex == F.col("doc_id")
    )
    keep = members.groupBy("component").agg(
        F.max_by("doc_id", F.struct(F.col("n_chars"), (-F.col("doc_id")))).alias(
            "keep_id"
        )
    )
    losers = (
        members.join(keep, "component")
        .where(F.col("doc_id") != F.col("keep_id"))
        .select("doc_id")
    )
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


# --------------------------------------------------------------------
# profile_drift_psi — population stability index between periods
# --------------------------------------------------------------------

DRIFT_SPLIT_DATE = "1998-07-01"
DRIFT_BUCKET_WIDTH = 50_000
DRIFT_N_BUCKETS = 10
_PSI_EPS = 1e-4  # smoothing so an empty bucket cannot produce ln(0)


@register(
    "profile_drift_psi",
    oracle=f"""
WITH bucketed AS (
    SELECT LEAST({DRIFT_N_BUCKETS - 1},
                 CAST(FLOOR(o_totalprice / {DRIFT_BUCKET_WIDTH}) AS BIGINT))
               AS bucket,
           o_orderdate < DATE '{DRIFT_SPLIT_DATE}' AS is_ref
    FROM orders
),
per_bucket AS (
    SELECT bucket,
           CAST(COUNT(*) FILTER (WHERE is_ref) AS BIGINT) AS n_ref,
           CAST(COUNT(*) FILTER (WHERE NOT is_ref) AS BIGINT) AS n_cur
    FROM bucketed GROUP BY bucket
),
tot AS (
    SELECT SUM(n_ref) AS t_ref, SUM(n_cur) AS t_cur FROM per_bucket
)
SELECT bucket, n_ref, n_cur,
       ROUND((CAST(n_cur AS DOUBLE) / t_cur + {_PSI_EPS})
             - (CAST(n_ref AS DOUBLE) / t_ref + {_PSI_EPS}), 6) AS pct_shift,
       ROUND(((CAST(n_cur AS DOUBLE) / t_cur + {_PSI_EPS})
              - (CAST(n_ref AS DOUBLE) / t_ref + {_PSI_EPS}))
             * LN((CAST(n_cur AS DOUBLE) / t_cur + {_PSI_EPS})
                  / (CAST(n_ref AS DOUBLE) / t_ref + {_PSI_EPS})), 6)
           AS psi_contrib
FROM per_bucket, tot
ORDER BY bucket
""",
    tags=("profile", "drift"),
)
def profile_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution drift between two periods as a Population
    Stability Index breakdown: order values bucketed into fixed bands,
    reference period (< DRIFT_SPLIT_DATE) vs current period compared
    per bucket, PSI contribution = (p_cur - p_ref) * ln(p_cur/p_ref)
    with epsilon smoothing — the monitoring query an ML data pipeline
    runs per ingest to catch feature drift before a model does.

    Scale shape: ONE pass over the fact table into a combinable
    conditional-count aggregate keyed by bucket (<= DRIFT_N_BUCKETS
    groups), a 1-row totals aggregate broadcast back onto the
    <=10-row bucket table, and codegen arithmetic — no window, no
    second scan, nothing proportional to row count after the first
    aggregate. Transcendental LN is rounded on both sides (libm vs
    JVM last-ulp)."""
    orders = load_table(spark, sf_dir, "orders")
    bucketed = orders.select(
        F.least(
            F.lit(DRIFT_N_BUCKETS - 1),
            F.floor(F.col("o_totalprice") / DRIFT_BUCKET_WIDTH),
        ).alias("bucket"),
        (F.col("o_orderdate") < F.lit(DRIFT_SPLIT_DATE).cast("date")).alias(
            "is_ref"
        ),
    )
    per_bucket = bucketed.groupBy("bucket").agg(
        F.count(F.when(F.col("is_ref"), 1)).alias("n_ref"),
        F.count(F.when(~F.col("is_ref"), 1)).alias("n_cur"),
    )
    tot = per_bucket.agg(
        F.sum("n_ref").alias("t_ref"), F.sum("n_cur").alias("t_cur")
    )
    p_ref = F.col("n_ref").cast("double") / F.col("t_ref") + _PSI_EPS
    p_cur = F.col("n_cur").cast("double") / F.col("t_cur") + _PSI_EPS
    return (
        per_bucket.crossJoin(F.broadcast(tot))
        .select(
            "bucket",
            "n_ref",
            "n_cur",
            F.round(p_cur - p_ref, 6).alias("pct_shift"),
            F.round((p_cur - p_ref) * F.log(p_cur / p_ref), 6).alias(
                "psi_contrib"
            ),
        )
        .orderBy("bucket")
    )


# --------------------------------------------------------------------
# cdc_apply_changelog — keyed changelog apply onto a base snapshot
# --------------------------------------------------------------------


@register(
    "cdc_apply_changelog",
    oracle="""
WITH ranked AS (
    SELECT o_custkey,
           o_orderpriority LIKE '1-%' AS is_delete,
           o_totalprice,
           ROW_NUMBER() OVER (PARTITION BY o_custkey
                              ORDER BY o_orderdate DESC, o_orderkey DESC)
               AS rn
    FROM orders
),
compacted AS (
    SELECT o_custkey, is_delete, o_totalprice FROM ranked WHERE rn = 1
),
applied AS (
    SELECT CASE WHEN g.o_custkey IS NULL THEN 'kept_unchanged'
                WHEN g.is_delete THEN 'deleted'
                ELSE 'kept_updated'
           END AS action,
           CASE WHEN g.o_custkey IS NULL THEN c.c_acctbal
                WHEN g.is_delete THEN NULL
                ELSE g.o_totalprice
           END AS final_value
    FROM customer c
    LEFT JOIN compacted g ON g.o_custkey = c.c_custkey
)
SELECT action,
       CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(SUM(final_value), 2) AS total_value
FROM applied
GROUP BY action
ORDER BY action
""",
    tags=("cdc", "merge"),
)
def cdc_apply_changelog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The WRITE side of CDC as a query: compact a keyed changelog to
    its last operation per key (last-writer-wins on event order), then
    apply it to a base snapshot — upserts override the base value,
    deletes drop the row, untouched keys pass through. This is
    exactly the dataflow `writer.py`'s MERGE upsert executes inside
    Iceberg (reference's silent append-only gap, sinks.py:25) and the
    verification dual of cdc_snapshot_diff: diff(base, apply(base,
    log)) must classify precisely the applied changes.

    Changelog derivation (tables ship no op column): each customer's
    orders are its change stream ordered by (o_orderdate, o_orderkey);
    urgent-priority last orders act as deletes, the rest as value
    upserts.

    Scale shape: compaction is a combinable per-key max_by (struct
    ordering reproduces the oracle's two-level DESC sort exactly — no
    window on the Spark side); the apply is ONE left equi-join on the
    snapshot key, the same co-partitionable shape MERGE itself
    shuffles; the final rollup is 3 groups. O(changelog) + O(snapshot),
    which is the steady-state CDC cost model."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    compacted = orders.groupBy(F.col("o_custkey")).agg(
        F.max_by(
            F.struct(
                F.col("o_orderpriority").like("1-%").alias("is_delete"),
                F.col("o_totalprice"),
            ),
            F.struct(F.col("o_orderdate"), F.col("o_orderkey")),
        ).alias("last")
    )
    applied = cust.join(
        compacted, F.col("o_custkey") == F.col("c_custkey"), "left"
    ).select(
        F.when(F.col("o_custkey").isNull(), F.lit("kept_unchanged"))
        .when(F.col("last.is_delete"), F.lit("deleted"))
        .otherwise(F.lit("kept_updated"))
        .alias("action"),
        F.when(F.col("o_custkey").isNull(), F.col("c_acctbal"))
        .when(F.col("last.is_delete"), F.lit(None).cast("double"))
        .otherwise(F.col("last.o_totalprice"))
        .alias("final_value"),
    )
    return (
        applied.groupBy("action")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("final_value"), 2).alias("total_value"),
        )
        .orderBy("action")
    )


# --------------------------------------------------------------------
# curation_corpus_report — the per-source "datacard" composition report
# --------------------------------------------------------------------


@register(
    "curation_corpus_report",
    oracle="""
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COUNT(DISTINCT md5(text)) AS BIGINT) AS n_unique_texts,
       ROUND(1.0 - CAST(COUNT(DISTINCT md5(text)) AS DOUBLE) / COUNT(*),
             6) AS exact_dup_rate,
       CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
       ROUND(CAST(SUM(len(string_split(text, ' '))) AS DOUBLE)
             / COUNT(*), 2) AS mean_doc_tokens,
       CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs
FROM documents
GROUP BY source
ORDER BY source
""",
    tags=("curation", "report", "datacard"),
)
def curation_corpus_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source corpus composition report — the "datacard" table
    every published training corpus ships: document count, exact-
    duplicate rate (via text content hash), token totals and means,
    and language coverage, in ONE aggregation pass per source.

    Scale shape: whitespace token counts are row-local (size of
    split — no explode), the content hash is md5 computed in the scan
    projection, and every statistic is a combinable COUNT/SUM or a
    two-phase partial DISTINCT over the same shuffle — the report
    costs one scan regardless of corpus size. This is the summary the
    dedup / quality / mix queries in this tier feed into; at 100 TB
    it is the only affordable first look at a new crawl drop."""
    docs = load_table(spark, sf_dir, "documents")
    tokens = F.size(F.split("text", " "))
    return (
        docs.select("source", "lang", F.md5("text").alias("h"), tokens.alias("tok"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("h").alias("n_unique_texts"),
            F.round(
                1.0 - F.countDistinct("h").cast("double") / F.count(F.lit(1)),
                6,
            ).alias("exact_dup_rate"),
            F.sum("tok").alias("total_tokens"),
            F.round(
                F.sum("tok").cast("double") / F.count(F.lit(1)), 2
            ).alias("mean_doc_tokens"),
            F.countDistinct("lang").alias("n_langs"),
        )
        .orderBy("source")
    )
