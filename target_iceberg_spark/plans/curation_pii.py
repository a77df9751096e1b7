"""PII detection audit (SURVEY.md §2B curation tier, round-6
post-window).

Privacy filtering is a mandatory pass in every public LLM data recipe
(e.g. the BigScience ROTS / FineWeb PII steps, public): scan text for
emails, phone numbers, and IP addresses, report per-source incidence,
and gate shards on it. The synthetic corpus contains no organic PII,
so the query INJECTS deterministic markers first (pure column algebra
on doc_id, identical in both engines) and then audits them with the
regex machinery that would run on real data — the
profile_bloom_fpr discipline: plant known truth, verify the detector
end-to-end, keep every stage hash-checkable.

Regex patterns stay in the conservative common subset (character
classes, bounded repetition) that Java regex (Spark) and RE2 (DuckDB)
interpret identically.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from target_iceberg_spark.plans.registry import register
from target_iceberg_spark.sources.tables import load_table

PII_EMAIL_MOD = 3  # docs with doc_id % 3 == 0 get an email
PII_PHONE_MOD = 5  # ... % 5 == 0 a phone number
PII_IP_MOD = 7  # ... % 7 == 0 an IP address

RE_EMAIL = r"[a-z0-9._]+@[a-z0-9.-]+\.[a-z]{2,4}"
RE_PHONE = r"[0-9]{3}-[0-9]{3}-[0-9]{4}"
RE_IP = r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}"


@register(
    "curation_pii_audit",
    oracle=f"""
WITH injected AS (
    SELECT doc_id, source,
           text
           || CASE WHEN doc_id % {PII_EMAIL_MOD} = 0
                   THEN ' contact user' || doc_id || '@example.com'
                   ELSE '' END
           || CASE WHEN doc_id % {PII_PHONE_MOD} = 0
                   THEN ' call 555-' || lpad(CAST(doc_id % 1000 AS VARCHAR),
                                            3, '0') || '-0199'
                   ELSE '' END
           || CASE WHEN doc_id % {PII_IP_MOD} = 0
                   THEN ' host 10.0.' || CAST(doc_id % 256 AS VARCHAR)
                        || '.7'
                   ELSE '' END AS text
    FROM documents
),
hits AS (
    SELECT source,
           CAST(len(regexp_extract_all(text, '{RE_EMAIL}')) AS BIGINT)
               AS n_email,
           CAST(len(regexp_extract_all(text, '{RE_PHONE}')) AS BIGINT)
               AS n_phone,
           CAST(len(regexp_extract_all(text, '{RE_IP}')) AS BIGINT) AS n_ip
    FROM injected
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COUNT(*) FILTER (WHERE n_email + n_phone + n_ip > 0) AS BIGINT)
           AS docs_with_pii,
       CAST(SUM(n_email) AS BIGINT) AS n_emails,
       CAST(SUM(n_phone) AS BIGINT) AS n_phones,
       CAST(SUM(n_ip) AS BIGINT) AS n_ips,
       ROUND(COUNT(*) FILTER (WHERE n_email + n_phone + n_ip > 0)
             * 1.0 / COUNT(*), 4) AS pii_rate
FROM hits
GROUP BY source
ORDER BY source
""",
    tags=("curation", "pii", "privacy"),
)
def curation_pii_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source PII incidence audit — the shard-gating report of a
    privacy pass: count emails / phone numbers / IP addresses per
    document via regex extraction and roll up per source the document
    count, PII-document count, per-type totals, and PII rate. Markers
    are injected deterministically from doc_id (every doc_id % 3/5/7
    gets an email/phone/IP) so the ground truth is known and the whole
    detector chain — pattern compile, extraction count, rollup — is
    verified exactly, not just smoke-run; on real data only the
    injection projection disappears.

    Scale shape: injection and regex counting are row-local
    projections inside codegen (regexp_count; no UDF, no shuffle);
    the rollup is ONE combinable per-source aggregation. Nothing
    scales with match count but the integer counters. The regexes
    avoid constructs where Java regex and RE2 diverge (no backrefs,
    no lookaround, no \\b) so both engines count identical matches."""
    docs = load_table(spark, sf_dir, "documents")
    injected = docs.select(
        "doc_id",
        "source",
        F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % PII_EMAIL_MOD == 0,
                F.concat(
                    F.lit(" contact user"),
                    F.col("doc_id").cast("string"),
                    F.lit("@example.com"),
                ),
            ).otherwise(F.lit("")),
            F.when(
                F.col("doc_id") % PII_PHONE_MOD == 0,
                F.concat(
                    F.lit(" call 555-"),
                    F.lpad((F.col("doc_id") % 1000).cast("string"), 3, "0"),
                    F.lit("-0199"),
                ),
            ).otherwise(F.lit("")),
            F.when(
                F.col("doc_id") % PII_IP_MOD == 0,
                F.concat(
                    F.lit(" host 10.0."),
                    (F.col("doc_id") % 256).cast("string"),
                    F.lit(".7"),
                ),
            ).otherwise(F.lit("")),
        ).alias("text"),
    )
    hits = injected.select(
        "source",
        F.regexp_count("text", F.lit(RE_EMAIL)).cast("bigint").alias("n_email"),
        F.regexp_count("text", F.lit(RE_PHONE)).cast("bigint").alias("n_phone"),
        F.regexp_count("text", F.lit(RE_IP)).cast("bigint").alias("n_ip"),
    )
    any_pii = (F.col("n_email") + F.col("n_phone") + F.col("n_ip")) > 0
    return (
        hits.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.count(F.when(any_pii, 1)).cast("bigint").alias("docs_with_pii"),
            F.sum("n_email").cast("bigint").alias("n_emails"),
            F.sum("n_phone").cast("bigint").alias("n_phones"),
            F.sum("n_ip").cast("bigint").alias("n_ips"),
            F.round(
                F.count(F.when(any_pii, 1)) * 1.0 / F.count(F.lit(1)), 4
            ).alias("pii_rate"),
        )
        .orderBy("source")
    )
