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
