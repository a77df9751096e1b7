"""Filtered vector search: pre-filter vs post-filter (SURVEY.md §2B
similarity tier, round 11, post-window).

Production retrieval is rarely unfiltered — "nearest neighbors WHERE
label = X" is the filtered-search problem every vector store documents
(pre-filtering vs post-filtering trade-off; e.g. the public
Qdrant/Milvus/pgvector filtering docs and FAISS issue threads). The
two strategies differ observably:

  - PRE-filter: restrict the candidate set to the predicate first,
    then take top-k — always returns k results (if the segment has k),
    and the filter pushes into the scan.
  - POST-filter: take the GLOBAL top-k, then apply the predicate —
    cheap, but returns fewer than k when the neighborhood is dominated
    by other labels: the recall hole this query makes visible.

Both arms plus the unfiltered global baseline in one result, exact
brute-force cosine (oracle-identical), probe = vec_id {PROBE}, filter
= the probe's own label.

Scale shape: each arm is broadcast-1-row-probe -> JVM fold cosine ->
TakeOrderedAndProject; the pre-filter arm's label predicate reaches
the scan (pushdown-eligible). No windows, no shuffles beyond top-k.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from target_iceberg_spark.functions.vectors import cosine, cosine_sql
from target_iceberg_spark.plans.registry import register
from target_iceberg_spark.sources.tables import load_table

PROBE = 0  # probe vector id (same as sim_cosine_topk)
FILTER_K = 8  # top-k per arm


@register(
    "sim_filtered_topk",
    oracle=f"""
WITH probe AS (
    SELECT embedding AS p, label AS probe_label FROM embeddings
    WHERE vec_id = {PROBE}
),
scored AS (
    SELECT e.vec_id, e.label, pr.probe_label,
           ROUND({cosine_sql("e.embedding", "pr.p")}, 6) AS cos_sim
    FROM embeddings e, probe pr
    WHERE e.vec_id <> {PROBE}
),
global_top AS (
    SELECT 'a_global' AS arm, vec_id, label, cos_sim
    FROM scored ORDER BY cos_sim DESC, vec_id LIMIT {FILTER_K}
),
prefilter AS (
    SELECT 'b_prefilter' AS arm, vec_id, label, cos_sim
    FROM scored WHERE label = probe_label
    ORDER BY cos_sim DESC, vec_id LIMIT {FILTER_K}
),
postfilter AS (
    SELECT 'c_postfilter' AS arm, vec_id, label, cos_sim
    FROM global_top WHERE label = (SELECT probe_label FROM probe)
)
SELECT arm, vec_id, label, cos_sim FROM global_top
UNION ALL SELECT arm, vec_id, label, cos_sim FROM prefilter
UNION ALL SELECT arm, vec_id, label, cos_sim FROM postfilter
ORDER BY arm, cos_sim DESC, vec_id
""",
    tags=("similarity", "filtered-search", "retrieval"),
)
def sim_filtered_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three retrieval arms against probe {PROBE} with the probe's own
    label as the filter: the unfiltered global top-{FILTER_K}
    (a_global), the PRE-filtered top-{FILTER_K} within the label
    segment (b_prefilter — always full-length), and the POST-filtered
    global list (c_postfilter — the subset of a_global matching the
    label, usually SHORTER: the documented post-filter recall hole).

    Scale shape: one broadcast 1-row probe, exact fold cosine, one
    TakeOrderedAndProject per filtered arm; the pre-filter predicate
    is scan-pushable. The post-filter arm derives from the global arm
    without rescoring."""
    emb = load_table(spark, sf_dir, "embeddings")
    probe = emb.where(F.col("vec_id") == PROBE).select(
        F.col("embedding").alias("p"), F.col("label").alias("probe_label")
    )
    scored = (
        emb.where(F.col("vec_id") != PROBE)
        .crossJoin(F.broadcast(probe))
        .select(
            "vec_id",
            "label",
            "probe_label",
            F.round(cosine("embedding", "p"), 6).alias("cos_sim"),
        )
    )
    global_top = (
        scored.orderBy(F.desc("cos_sim"), "vec_id")
        .limit(FILTER_K)
        .select(
            F.lit("a_global").alias("arm"), "vec_id", "label", "cos_sim",
            "probe_label",
        )
    )
    prefilter = (
        scored.where(F.col("label") == F.col("probe_label"))
        .orderBy(F.desc("cos_sim"), "vec_id")
        .limit(FILTER_K)
        .select(
            F.lit("b_prefilter").alias("arm"), "vec_id", "label", "cos_sim",
            "probe_label",
        )
    )
    postfilter = global_top.where(
        F.col("label") == F.col("probe_label")
    ).select(F.lit("c_postfilter").alias("arm"), "vec_id", "label", "cos_sim",
             "probe_label")
    return (
        global_top.unionAll(prefilter)
        .unionAll(postfilter)
        .select("arm", "vec_id", "label", "cos_sim")
        .orderBy("arm", F.desc("cos_sim"), "vec_id")
    )
