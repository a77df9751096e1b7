"""Data-mining plans (SURVEY.md §2B, round 5): weighted sampling,
triangle counting, and cross-document boilerplate removal.

All three are training-data-pipeline staples the reference's users
would otherwise hand-roll: weighted corpus subsampling, graph
structure mining over co-occurrence, and C4/RefinedWeb-style removal
of text spans shared across documents.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from target_iceberg_spark.functions.hashing import hex_int, hex_int_sql
from target_iceberg_spark.plans.registry import register
from target_iceberg_spark.sources.tables import load_table

SAMPLE_K = 5
SAMPLE_SALTS = 32

TRIANGLE_MIN_SUPPORT = 2
TRIANGLE_TOP = 10

SEG_WORDS = 5  # boilerplate segment width (non-overlapping word 5-grams)
BOILER_MIN_DOCS = 2


@register(
    "sample_weighted",
    oracle=f"""
WITH scored AS (
    SELECT c_mktsegment AS segment, c_custkey, c_acctbal,
           ln(({hex_int_sql("md5(CAST(c_custkey AS VARCHAR))")} + 0.5)
              / 4294967296.0) / c_acctbal AS es_key
    FROM customer
    WHERE c_acctbal > 0
)
SELECT segment, c_custkey, ROUND(c_acctbal, 2) AS weight,
       CAST(rnk AS INT) AS rnk
FROM (
    SELECT *, row_number() OVER (
        PARTITION BY segment ORDER BY es_key DESC, c_custkey) AS rnk
    FROM scored
)
WHERE rnk <= {SAMPLE_K}
""",
    tags=("sampling", "curation"),
)
def sample_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling without replacement (Efraimidis–Spirakis
    A-Res): each row draws a deterministic uniform u from md5 of its
    key and ranks by ln(u)/w — the top-k per group is then an exact
    weighted sample, reproducible across engines AND across reruns
    (the property curation pipelines need for auditable subsampling;
    F.rand would give neither).

    Scale shape: TWO-PHASE top-k — a first row_number over
    (segment, salt) cuts each of the 32 salt slices to its local
    top-k, so the final per-segment window sorts at most k x salts
    rows, never the whole group. A single window over a 5-segment key
    would funnel n/5 rows into 5 tasks at 100 TB; the salted pre-cut
    keeps every task bounded. The oracle runs the single-window form —
    both produce the identical final top-k, which is precisely the
    claim the hash checks.

    The ranking key is deliberately NOT rounded (unlike output-column
    transcendentals): only the O(k) comparisons around each segment's
    selection boundary affect the result, their key gaps are
    macroscopic for random md5 draws, and rounding would CREATE
    boundary cases (a value within an ulp of a rounding edge flips
    sides between libms) far more often than raw ulp-adjacent keys
    occur."""
    cust = load_table(spark, sf_dir, "customer").where(F.col("c_acctbal") > 0)
    u = (
        hex_int(F.md5(F.col("c_custkey").cast("string"))).cast("double") + 0.5
    ) / F.lit(2.0**32)
    scored = cust.select(
        F.col("c_mktsegment").alias("segment"),
        "c_custkey",
        "c_acctbal",
        (F.log(u) / F.col("c_acctbal")).alias("es_key"),
        F.pmod(F.crc32(F.col("c_custkey").cast("string")), F.lit(SAMPLE_SALTS)).alias(
            "salt"
        ),
    )
    local = Window.partitionBy("segment", "salt").orderBy(
        F.desc("es_key"), "c_custkey"
    )
    survivors = (
        scored.withColumn("local_rn", F.row_number().over(local))
        .where(F.col("local_rn") <= SAMPLE_K)
        .drop("local_rn", "salt")
    )
    final = Window.partitionBy("segment").orderBy(F.desc("es_key"), "c_custkey")
    return (
        survivors.withColumn("rnk", F.row_number().over(final))
        .where(F.col("rnk") <= SAMPLE_K)
        .select("segment", "c_custkey", F.round("c_acctbal", 2).alias("weight"), "rnk")
    )


@register(
    "graph_triangles",
    oracle=f"""
WITH items AS (
    SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
),
edges AS (
    SELECT a.l_partkey AS pa, b.l_partkey AS pb
    FROM items a
    JOIN items b ON a.l_orderkey = b.l_orderkey
                AND a.l_partkey < b.l_partkey
    GROUP BY pa, pb
    HAVING COUNT(*) >= {TRIANGLE_MIN_SUPPORT}
),
tri AS (
    SELECT e1.pa AS a, e1.pb AS b, e2.pb AS c
    FROM edges e1
    JOIN edges e2 ON e1.pb = e2.pa
    JOIN edges e3 ON e3.pa = e1.pa AND e3.pb = e2.pb
),
members AS (
    SELECT a AS part_key FROM tri
    UNION ALL SELECT b FROM tri
    UNION ALL SELECT c FROM tri
)
SELECT part_key, CAST(COUNT(*) AS BIGINT) AS n_triangles
FROM members
GROUP BY part_key
ORDER BY n_triangles DESC, part_key
LIMIT {TRIANGLE_TOP}
""",
    tags=("graph", "triangles"),
)
def graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle counting over the co-purchase graph (parts bought
    together in >= 2 orders): the classic
    graph-mining primitive behind clustering coefficients and
    community seeds. Canonical orientation (pa < pb) makes every
    triangle (a<b<c) appear exactly once, so the count is a pure
    3-way EQUI-join chain — never an undirected-edge explosion.

    Scale shape: the support threshold does the heavy lifting — it
    cuts the quadratic pair space down to recurrent edges BEFORE any
    triangle join (the same cut agg_copurchase makes), and each join
    in the chain is an equi-join shuffled on a part key. The edge
    subtree appears three times in the LOGICAL plan but runs ONCE:
    AQE's shuffle-stage reuse serves the e1/e2/e3 arms from the same
    materialized exchange (ReusedExchange in the final adaptive plan,
    pinned in tests/test_plans.py) — at 100 TB the same edge list
    would additionally be persisted across whole queries, and
    degree-capping hub nodes bounds the e1xe2 expansion exactly like
    dedup_minhash_capped bounds LSH buckets."""
    items = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a, b = items.alias("a"), items.alias("b")
    edges = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .select(
            F.col("a.l_partkey").alias("pa"), F.col("b.l_partkey").alias("pb")
        )
        .groupBy("pa", "pb")
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") >= TRIANGLE_MIN_SUPPORT)
        .select("pa", "pb")
    )
    e1, e2, e3 = edges.alias("e1"), edges.alias("e2"), edges.alias("e3")
    tri = (
        e1.join(e2, F.col("e1.pb") == F.col("e2.pa"))
        .join(
            e3,
            (F.col("e3.pa") == F.col("e1.pa")) & (F.col("e3.pb") == F.col("e2.pb")),
        )
        .select(
            F.col("e1.pa").alias("a"),
            F.col("e1.pb").alias("b"),
            F.col("e2.pb").alias("c"),
        )
    )
    members = tri.select(
        F.explode(F.array("a", "b", "c")).alias("part_key")
    )
    return (
        members.groupBy("part_key")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
        .orderBy(F.desc("n_triangles"), "part_key")
        .limit(TRIANGLE_TOP)
    )


@register(
    "text_boilerplate_strip",
    oracle=f"""
WITH w AS (
    SELECT doc_id, string_split(text, ' ') AS words FROM documents
),
idx AS (
    SELECT doc_id, words,
           unnest(range(0, CAST(ceil(len(words) / {SEG_WORDS}.0) AS INT))) AS i
    FROM w
),
seg AS (
    SELECT doc_id, i,
           array_to_string(words[i * {SEG_WORDS} + 1 : i * {SEG_WORDS} + {SEG_WORDS}],
                           ' ') AS seg
    FROM idx
),
cnt AS (
    SELECT seg, COUNT(DISTINCT doc_id) AS nd FROM seg GROUP BY seg
),
j AS (
    SELECT s.doc_id, s.i, s.seg, c.nd >= {BOILER_MIN_DOCS} AS boiler
    FROM seg s JOIN cnt c USING (seg)
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_seg,
       CAST(SUM(CASE WHEN boiler THEN 1 ELSE 0 END) AS BIGINT) AS n_boiler,
       COALESCE(string_agg(CASE WHEN NOT boiler THEN seg END, ' ' ORDER BY i),
                '') AS clean_text
FROM j
GROUP BY doc_id
""",
    tags=("text", "dedup", "curation"),
)
def text_boilerplate_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4/RefinedWeb-style boilerplate REMOVAL: documents are cut into
    non-overlapping 5-word segments, any segment occurring in
    >= 2 distinct documents (nav bars, license
    footers, templated spans) is dropped, and the surviving segments
    are stitched back in order — the surgical sibling of
    text_dup_ngram_fraction, which only MEASURES the overlap, and of
    doc-level dedup, which can only drop whole documents.

    Scale shape: segments shuffle as 16-byte md5 digests, never text
    (one digest equi-join rejoins each doc's segments to the verdict);
    the per-segment doc count is a combinable partial aggregate; and
    reconstruction sorts only each document's OWN bounded segment list
    (array_sort over collect_list inside a per-doc group — no window).
    At 100 TB the segment-frequency side is the persisted artifact
    incremental batches join against, exactly like the n-gram side of
    text_dup_ngram_fraction."""
    docs = load_table(spark, sf_dir, "documents", fanout=True)
    words = F.split("text", " ")
    segs = F.transform(
        F.sequence(
            F.lit(0), F.floor((F.size(words) - 1) / F.lit(SEG_WORDS)).cast("int")
        ),
        lambda i: F.array_join(F.slice(words, i * SEG_WORDS + 1, SEG_WORDS), " "),
    )
    exploded = docs.select(
        "doc_id", F.posexplode(segs).alias("i", "seg")
    ).withColumn("d", F.md5("seg"))
    counts = exploded.groupBy("d").agg(
        (F.count_distinct("doc_id") >= BOILER_MIN_DOCS).alias("boiler")
    )
    j = exploded.join(counts, "d")
    kept = F.when(~F.col("boiler"), F.struct("i", "seg"))
    return j.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_seg"),
        F.sum(F.col("boiler").cast("long")).alias("n_boiler"),
        F.array_join(
            F.transform(F.array_sort(F.collect_list(kept)), lambda x: x["seg"]),
            " ",
        ).alias("clean_text"),
    )
