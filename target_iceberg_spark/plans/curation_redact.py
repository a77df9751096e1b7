"""PII redaction transform (SURVEY.md §2B curation tier, round 8).

curation_pii_audit REPORTS incidence; this is the pass that actually
SHIPS — rewrite every detected span to a typed placeholder and prove,
in the same query, that (a) redaction is complete (the detectors find
ZERO hits in the redacted corpus) and (b) nothing else changed (the
redacted corpus checksums deterministically). Same injected ground
truth, same conservative Java-regex/RE2 common-subset patterns as the
audit — the placeholder tokens contain '[' ']' which neither pattern
class can match, so redaction is idempotent by construction.

The per-document checksum folds into an ORDER-INSENSITIVE corpus
checksum (sum of the md5 head as int) so the transform's full output
is hash-pinned without shipping 50k redacted texts through the
compare.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from target_iceberg_spark.plans.curation_pii import (
    PII_EMAIL_MOD,
    PII_IP_MOD,
    PII_PHONE_MOD,
    RE_EMAIL,
    RE_IP,
    RE_PHONE,
)
from target_iceberg_spark.plans.registry import register
from target_iceberg_spark.sources.tables import load_table


@register(
    "curation_redact",
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
red AS (
    SELECT doc_id, source,
           regexp_replace(
               regexp_replace(
                   regexp_replace(text, '{RE_EMAIL}', '[EMAIL]', 'g'),
                   '{RE_PHONE}', '[PHONE]', 'g'),
               '{RE_IP}', '[IP]', 'g') AS rtext,
           CAST(len(regexp_extract_all(text, '{RE_EMAIL}')) AS BIGINT)
               AS n_email,
           CAST(len(regexp_extract_all(text, '{RE_PHONE}')) AS BIGINT)
               AS n_phone,
           CAST(len(regexp_extract_all(text, '{RE_IP}')) AS BIGINT) AS n_ip
    FROM injected
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_email) AS BIGINT) AS n_emails,
       CAST(SUM(n_phone) AS BIGINT) AS n_phones,
       CAST(SUM(n_ip) AS BIGINT) AS n_ips,
       CAST(SUM(len(regexp_extract_all(rtext, '{RE_EMAIL}'))
                + len(regexp_extract_all(rtext, '{RE_PHONE}'))
                + len(regexp_extract_all(rtext, '{RE_IP}'))) AS BIGINT)
           AS residual_hits,
       CAST(SUM(CAST(('0x' || substr(md5(rtext), 1, 8)) AS BIGINT))
            AS BIGINT) AS corpus_checksum
FROM red
GROUP BY source
ORDER BY source
""",
    tags=("curation", "pii", "privacy", "transform"),
)
def curation_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Redact emails/phones/IPs to typed placeholders and verify the
    pass in-query: per source, the redaction counts, the RESIDUAL
    detector hits over the redacted text (must be 0 — asserted in
    tests and visible to the driver hash), and an order-insensitive
    md5-head checksum of the redacted corpus pinning the transform's
    exact output. The audit tells you how dirty the shard is; this is
    the pass that makes it shippable and PROVES it shipped clean.

    Scale shape: injection, three regexp_replace passes, re-detection
    and the md5 checksum are all row-local projections inside one
    codegen stage; the only shuffle is the per-source rollup of six
    numbers."""
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
            ).otherwise(""),
            F.when(
                F.col("doc_id") % PII_PHONE_MOD == 0,
                F.concat(
                    F.lit(" call 555-"),
                    F.lpad((F.col("doc_id") % 1000).cast("string"), 3, "0"),
                    F.lit("-0199"),
                ),
            ).otherwise(""),
            F.when(
                F.col("doc_id") % PII_IP_MOD == 0,
                F.concat(
                    F.lit(" host 10.0."),
                    (F.col("doc_id") % 256).cast("string"),
                    F.lit(".7"),
                ),
            ).otherwise(""),
        ).alias("text"),
    )
    rtext = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("text"), RE_EMAIL, "[EMAIL]"),
            RE_PHONE,
            "[PHONE]",
        ),
        RE_IP,
        "[IP]",
    )

    def nhits(col, pat):
        # column function, NOT F.expr: a SQL string literal would eat
        # the backslash in '\\.' (legacy escape parsing) and turn the
        # IP pattern's literal dots into match-anything
        return F.size(F.regexp_extract_all(F.col(col), F.lit(pat), F.lit(0)))

    red = injected.select(
        "source",
        rtext.alias("rtext"),
        nhits("text", RE_EMAIL).cast("bigint").alias("n_email"),
        nhits("text", RE_PHONE).cast("bigint").alias("n_phone"),
        nhits("text", RE_IP).cast("bigint").alias("n_ip"),
    )
    return (
        red.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_email").cast("bigint").alias("n_emails"),
            F.sum("n_phone").cast("bigint").alias("n_phones"),
            F.sum("n_ip").cast("bigint").alias("n_ips"),
            F.sum(
                nhits("rtext", RE_EMAIL)
                + nhits("rtext", RE_PHONE)
                + nhits("rtext", RE_IP)
            )
            .cast("bigint")
            .alias("residual_hits"),
            F.sum(
                F.conv(F.substring(F.md5("rtext"), 1, 8), 16, 10).cast(
                    "bigint"
                )
            )
            .cast("bigint")
            .alias("corpus_checksum"),
        )
        .orderBy("source")
    )
