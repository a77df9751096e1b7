"""Range-frame window + timestamp scalar family (SURVEY.md §2B
extensions).

The range frame orders on integer day offsets (Spark range frames need
a numeric ordering column); the 30-day trailing spend is the classic
sliding-aggregate shape. DuckDB computes windowed sums with a segment
tree (different addition order than Spark's running buffer) — the
2-decimal ROUND absorbs the ulp-level difference.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from target_iceberg_spark.plans.registry import register
from target_iceberg_spark.sources.tables import load_table


@register(
    "agg_collect",
    oracle="""
SELECT event_type,
       array_to_string(list_sort(list_distinct(array_agg(user_id))), ',') AS user_ids,
       COUNT(DISTINCT user_id) AS n_users
FROM events
GROUP BY event_type
ORDER BY event_type
""",
    tags=("aggregate", "collect"),
)
def agg_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array aggregation: the distinct user set per event type as a
    SORTED, comma-joined string (collect order is nondeterministic in
    both engines; sorting makes the value comparable, and serializing
    scalar-side keeps the result hashable for pandas canonicalizers
    that cannot factorize list columns)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.array_join(F.sort_array(F.collect_set("user_id")), ",").alias(
                "user_ids"
            ),
            F.countDistinct("user_id").alias("n_users"),
        )
        .orderBy("event_type")
    )


@register(
    "fn_regexp",
    oracle="""
SELECT doc_id,
       regexp_extract(source, '([0-9]+)', 1) AS src_num,
       regexp_matches(text, 'spark (query|table|join)') AS has_spark_phrase,
       CAST(len(regexp_extract_all(text, '\\b(fast|slow)\\b')) AS INT) AS speed_hits,
       regexp_replace(substr(text, 1, 40), '[aeiou]', '_', 'g') AS redacted_head
FROM documents
""",
    tags=("function", "regexp"),
)
def fn_regexp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex scalar family — extract / match / count / global replace.
    Patterns restricted to the syntax subset where Java regex (Spark)
    and RE2 (DuckDB) agree: char classes, alternation, word boundaries;
    no backrefs or lookarounds. regexp_count maps to DuckDB
    len(regexp_extract_all); Spark's regexp_replace is global by
    default, matching DuckDB's 'g' flag."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.regexp_extract("source", r"([0-9]+)", 1).alias("src_num"),
        F.col("text").rlike("spark (query|table|join)").alias("has_spark_phrase"),
        F.regexp_count("text", F.lit(r"\b(fast|slow)\b")).alias("speed_hits"),
        F.regexp_replace(F.substring("text", 1, 40), "[aeiou]", "_").alias(
            "redacted_head"
        ),
    )


@register(
    "fn_array_setops",
    oracle="""
WITH t AS (
    SELECT doc_id,
           list_distinct(string_split(lower(text), ' ')) AS toks,
           string_split('the a data value table', ' ') AS probe
    FROM documents
)
SELECT doc_id,
       COALESCE(array_to_string(list_sort(list_intersect(toks, probe)), ','), '') AS common,
       COALESCE(array_to_string(list_sort(list_filter(toks, x -> NOT list_contains(probe, x))), ','), '')
           AS only_doc,
       CAST(len(list_intersect(toks, probe)) AS INT) AS n_common
FROM t
""",
    tags=("function", "array"),
)
def fn_array_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array set algebra (intersect / except / cardinality) against a
    probe vocabulary — serialized sorted so the result is order-
    canonical in both engines (Spark's array_intersect preserves left
    order, DuckDB's list_intersect doesn't guarantee one)."""
    docs = load_table(spark, sf_dir, "documents")
    probe = F.split(F.lit("the a data value table"), " ")
    toks = F.array_distinct(F.split(F.lower("text"), " "))
    t = docs.select("doc_id", toks.alias("toks"), probe.alias("probe"))
    return t.select(
        "doc_id",
        F.array_join(F.array_sort(F.array_intersect("toks", "probe")), ",").alias(
            "common"
        ),
        F.array_join(F.array_sort(F.array_except("toks", "probe")), ",").alias(
            "only_doc"
        ),
        F.size(F.array_intersect("toks", "probe")).alias("n_common"),
    )
