"""Deduplication plans — exact, keyed, MinHash+LSH, n-gram Jaccard,
SimHash, embedding-cosine (SURVEY.md §2B north star).

Every pipeline is blocked/bucketed so candidate generation is an
equi-join, never an O(N^2) cross product — the property that survives
a 100 TB corpus. Hashes are md5 (engine-portable hex) so the complete
pipelines, including LSH banding and SimHash bit math, run identically
in the DuckDB oracle.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from target_iceberg_spark.functions.vectors import cosine_sql, sign_bucket_sql
from target_iceberg_spark.operators.dedup import (
    SIMHASH_BITS,
    embedding_band_pairs,
    jaccard_on_pairs,
    lsh_band_keys,
    minhash_candidate_pairs,
    minhash_signatures,
    shingle_table,
    simhash_fingerprints,
    simhash_pairs,
)
from target_iceberg_spark.plans.dedup_sql import (
    BANDS,
    NUM_HASHES,
    _minhash_capped_ctes,
    _minhash_ctes,
    _shingle_cte,
)
from target_iceberg_spark.plans.registry import register
from target_iceberg_spark.sources.tables import load_table
EMB_COS_THRESHOLD = 0.4  # test embeddings are random (max pair cos ~0.51)


@register(
    "dedup_exact",
    oracle="""
SELECT md5(lower(text)) AS text_hash,
       CAST(MIN(doc_id) AS BIGINT) AS keep_id,
       COUNT(*) AS n_copies
FROM documents
GROUP BY md5(lower(text))
""",
    tags=("dedup",),
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup by normalized text hash: one group per distinct
    (lowercased) text, keeping the smallest doc_id. Map-side-combinable
    groupBy — the cheapest dedup at any scale."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(F.md5(F.lower("text")).alias("text_hash"), "doc_id")
        .groupBy("text_hash")
        .agg(F.min("doc_id").alias("keep_id"), F.count(F.lit(1)).alias("n_copies"))
    )


@register(
    "dedup_keyed",
    oracle="""
SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts
FROM (
    SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
           ROW_NUMBER() OVER (PARTITION BY user_id
                              ORDER BY ts DESC, event_id DESC) AS rn
    FROM events
)
WHERE rn = 1
""",
    tags=("dedup",),
)
def dedup_keyed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyed dedup: latest event per user (window + rn=1 — the
    last-write-wins pattern the writer's upsert uses)."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        ev.select("user_id", "event_id", "ts", F.row_number().over(w).alias("rn"))
        .where(F.col("rn") == 1)
        .drop("rn")
    )


@register(
    "dedup_minhash",
    oracle=f"WITH {_minhash_ctes()}\nSELECT id_a, id_b FROM cand",
    tags=("dedup", "lsh"),
)
def dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup candidates over word-trigram shingles:
    shingle -> 16 md5-minima signature -> 4 band keys -> band-bucket
    equi-join. The shuffle key is the band hash, so work scales with
    bucket occupancy, not N^2."""
    docs = load_table(spark, sf_dir, "documents")
    return minhash_candidate_pairs(
        docs, "doc_id", "text", n=3, num_hashes=NUM_HASHES, bands=BANDS
    )


# Small enough to bind at test SF (a handful of size-3 buckets exist at
# sf0.01, so the capped result observably differs from dedup_minhash);
# at corpus scale the cap is set orders of magnitude higher and only
# skips degenerate boilerplate buckets.
MINHASH_BUCKET_CAP = 2


@register(
    "dedup_minhash_capped",
    oracle=f"WITH {_minhash_capped_ctes(MINHASH_BUCKET_CAP)}\n"
    "SELECT id_a, id_b FROM capped_cand",
    tags=("dedup", "lsh"),
)
def dedup_minhash_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH candidates with the degenerate-bucket safety valve
    engaged (operators/dedup.py::candidate_pairs max_bucket_size): a
    band bucket of m members emits m^2/2 pairs, so one million-doc
    boilerplate bucket at 100 TB would alone produce ~5*10^11 pairs;
    capping occupancy bounds candidate work per bucket while the other
    bands — or the exact-dedup pass — still catch the skipped members.
    The oracle mirrors the cap (bucket-count CTE <= cap), so the gate
    verifies the valve's exact semantics, not just its existence."""
    docs = load_table(spark, sf_dir, "documents")
    sh = shingle_table(docs, "doc_id", "text", n=3)
    sig = minhash_signatures(sh, "doc_id", NUM_HASHES)
    # localCheckpoint: under the cap, candidate_pairs consumes the
    # band-key table FOUR times (bucket-size count + the capped join,
    # on both self-join sides) — without it the shingle→minhash chain,
    # the query's dominant map CPU, re-executes per consumer (the
    # dedup_incremental discipline; at scale this materialization is
    # the persisted signature/band table).
    keys = lsh_band_keys(sig, "doc_id", NUM_HASHES, BANDS).localCheckpoint()
    from target_iceberg_spark.operators.dedup import candidate_pairs

    return candidate_pairs(keys, "doc_id", max_bucket_size=MINHASH_BUCKET_CAP)


@register(
    "dedup_ngram_jaccard",
    oracle=f"""
WITH {_minhash_ctes()},
ex AS (SELECT DISTINCT doc_id, shingle FROM sh),
sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM ex GROUP BY doc_id)
SELECT c.id_a, c.id_b,
       COUNT(*) AS n_int,
       CAST(MIN(sa.n_sh) AS BIGINT) AS n_a,
       CAST(MIN(sb.n_sh) AS BIGINT) AS n_b,
       CAST(COUNT(*) AS DOUBLE) / (MIN(sa.n_sh) + MIN(sb.n_sh) - COUNT(*)) AS jaccard
FROM cand c
JOIN ex x ON x.doc_id = c.id_a
JOIN ex y ON y.doc_id = c.id_b AND y.shingle = x.shingle
JOIN sizes sa ON sa.doc_id = c.id_a
JOIN sizes sb ON sb.doc_id = c.id_b
GROUP BY c.id_a, c.id_b
""",
    tags=("dedup", "jaccard"),
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact trigram-set Jaccard, computed ONLY for LSH candidate pairs
    (the verify step after dedup_minhash's probabilistic filter)."""
    docs = load_table(spark, sf_dir, "documents")
    # one materialized shingle table feeds signature AND verify branches
    # (no cross-branch CSE in Catalyst — see minhash_candidate_pairs)
    sh = shingle_table(docs, "doc_id", "text", n=3).localCheckpoint()
    pairs = minhash_candidate_pairs(
        docs, "doc_id", "text", n=3, num_hashes=NUM_HASHES, bands=BANDS, shingles=sh
    )
    res = jaccard_on_pairs(pairs, sh, "doc_id")
    return res.select(
        "id_a",
        "id_b",
        F.col("n_int").alias("n_int"),
        F.col("n_a").cast("long").alias("n_a"),
        F.col("n_b").cast("long").alias("n_b"),
        "jaccard",
    )


def _simhash_ctes() -> str:
    bit_sums = ",\n           ".join(
        f"SUM(CASE WHEN (h >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS b{b}"
        for b in range(SIMHASH_BITS)
    )
    fp_sum = " + ".join(
        f"(CASE WHEN b{b} > 0 THEN {1 << b} ELSE 0 END)" for b in range(SIMHASH_BITS)
    )
    # 3 segments (max_hamming=2 pigeonhole): bits 0-4, 5-9, 10-15
    segs = " UNION ALL ".join(
        f"SELECT doc_id, simhash, {s} AS seg_idx, "
        f"(simhash >> {s * 5}) & {(1 << (6 if s == 2 else 5)) - 1} AS seg_val FROM fp"
        for s in range(3)
    )
    return f"""
t AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok FROM documents),
th AS (SELECT doc_id, ('0x' || substr(md5(tok), 1, 4))::INTEGER AS h FROM t),
bs AS (SELECT doc_id, {bit_sums} FROM th GROUP BY doc_id),
fp AS (SELECT doc_id, ({fp_sum})::INTEGER AS simhash FROM bs),
segl AS ({segs}),
cand AS (
    SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
           a.simhash AS sh_a, b.simhash AS sh_b
    FROM segl a JOIN segl b
      ON a.seg_idx = b.seg_idx AND a.seg_val = b.seg_val AND a.doc_id < b.doc_id
)"""


@register(
    "dedup_simhash",
    oracle=f"""
WITH {_simhash_ctes()}
SELECT id_a, id_b, CAST(bit_count(xor(sh_a, sh_b)::BIGINT) AS INT) AS hamming
FROM cand
WHERE bit_count(xor(sh_a, sh_b)::BIGINT) <= 2
""",
    tags=("dedup", "simhash"),
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup: 16-bit md5-derived fingerprints, pigeonhole
    segment blocking (3 segments => any pair at Hamming distance <= 2
    shares a segment), Hamming verify on candidates only."""
    docs = load_table(spark, sf_dir, "documents")
    fps = simhash_fingerprints(docs, "doc_id", "text")
    return simhash_pairs(fps, "doc_id", max_hamming=2)


@register(
    "dedup_clusters",
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
)
SELECT src AS doc_id,
       LEAST(MIN(dst), src) AS cluster_id,
       (LEAST(MIN(dst), src) = src) AS is_survivor
FROM reach
GROUP BY src
""",
    tags=("dedup", "clusters"),
)
def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-cluster assignment: MinHash candidate pairs -> connected
    components (distributed min-label propagation,
    operators/components.py) -> survivor = min doc_id per cluster. The
    DuckDB oracle computes the same components with a recursive CTE —
    feasible there because near-dup clusters are tiny; the Spark side
    is the one that scales."""
    from target_iceberg_spark.operators.components import connected_components

    docs = load_table(spark, sf_dir, "documents", fanout=True)
    pairs = minhash_candidate_pairs(
        docs, "doc_id", "text", n=3, num_hashes=NUM_HASHES, bands=BANDS
    )
    comp = connected_components(pairs, "id_a", "id_b")
    return comp.select(
        F.col("vertex").alias("doc_id"),
        F.col("component").alias("cluster_id"),
        (F.col("component") == F.col("vertex")).alias("is_survivor"),
    )


@register(
    "dedup_keep_best",
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
j AS (
    SELECT c.cluster_id, c.doc_id, d.n_chars
    FROM comps c JOIN documents d USING (doc_id)
),
r AS (
    SELECT cluster_id, doc_id, n_chars,
           ROW_NUMBER() OVER (PARTITION BY cluster_id
                              ORDER BY n_chars DESC, doc_id) AS rn
    FROM j
)
SELECT cluster_id,
       CAST(COUNT(*) AS BIGINT) AS n_members,
       MAX(CASE WHEN rn = 1 THEN doc_id END) AS keep_id,
       CAST(MAX(n_chars) AS BIGINT) AS keep_chars
FROM r
GROUP BY cluster_id
ORDER BY cluster_id
""",
    tags=("dedup", "clusters", "curation"),
)
def dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware survivor selection: per near-dup cluster keep the
    LONGEST member (ties -> lowest doc_id) instead of dedup_clusters'
    min-id convention — the curation policy that preserves the fullest
    copy when duplicates differ by truncation/boilerplate stripping.

    Scale shape: same candidate graph + distributed label propagation
    as dedup_clusters, then ONE equi-join to attach each member's
    length and a combinable per-cluster ``max_by(doc_id,
    struct(n_chars, -doc_id))`` argmax — no window, no per-cluster
    sort; the struct tiebreak reproduces the oracle's ORDER BY
    n_chars DESC, doc_id exactly. Output is cluster-level (id, size,
    kept doc, kept length), bounded by #clusters."""
    from target_iceberg_spark.operators.components import connected_components

    docs = load_table(spark, sf_dir, "documents")
    pairs = minhash_candidate_pairs(
        docs, "doc_id", "text", n=3, num_hashes=NUM_HASHES, bands=BANDS
    )
    comp = connected_components(pairs, "id_a", "id_b")
    members = comp.join(
        docs.select("doc_id", "n_chars"),
        comp.vertex == F.col("doc_id"),
    )
    return (
        members.groupBy(F.col("component").alias("cluster_id"))
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.max_by(
                "doc_id", F.struct(F.col("n_chars"), (-F.col("doc_id")))
            ).alias("keep_id"),
            F.max("n_chars").alias("keep_chars"),
        )
        .orderBy("cluster_id")
    )


def _embedding_oracle(bands: int, bits: int, threshold: float) -> str:
    """DuckDB mirror of operators/dedup.py::embedding_band_pairs,
    generated from the same (bands, bits) parameters and the bit-exact
    cosine/sign-bucket SQL mirrors — UNION (not UNION ALL) plays the
    role of the Spark distinct."""
    cos = f"ROUND({cosine_sql('a.v', 'b.v')}, 6)"
    bkts = ", ".join(
        f"{sign_bucket_sql('embedding', bits, offset=t * bits)} AS bkt{t}"
        for t in range(bands)
    )
    selects = [
        f"""SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, {cos} AS cos_sim
FROM e a JOIN e b
  ON a.label = b.label AND a.bkt{t} = b.bkt{t} AND a.vec_id < b.vec_id
WHERE {cos} >= {threshold}"""
        for t in range(bands)
    ]
    return (
        f"WITH e AS (SELECT vec_id, label, embedding AS v, {bkts} FROM embeddings)\n"
        + "\nUNION\n".join(selects)
    )


EMB_BANDS = 4
EMB_BAND_BITS = 4


@register(
    "dedup_embedding",
    oracle=_embedding_oracle(EMB_BANDS, EMB_BAND_BITS, EMB_COS_THRESHOLD),
    tags=("dedup", "embedding"),
)
def dedup_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup with banded sign-LSH blocking
    (operators/dedup.py::embedding_band_pairs): AND over `bits` sign
    planes within a band, OR across `bands` bands. Per-band blocks
    shrink 2x per added bit while OR-amplification keeps near-dup
    recall high — `bits` grows with log2(corpus) via
    recommended_band_bits, so candidate work stays ~linear at scale
    (the r1 2-bit single-table variant had a constant 4x blocking
    factor — quadratic at 100x data). Cosine is a JVM-side fold."""
    emb = load_table(spark, sf_dir, "embeddings")
    return embedding_band_pairs(
        emb.select("vec_id", "label", "embedding"),
        bands=EMB_BANDS,
        bits=EMB_BAND_BITS,
        threshold=EMB_COS_THRESHOLD,
    )


# Incremental split: docs below are the "existing corpus", docs at or
# above are the "new ingest batch" (all current test SFs have ids 0..N
# with N >= 499, so the batch is non-empty everywhere).
INCR_SPLIT_ID = 400


def _incremental_oracle() -> str:
    long_form = "\n    UNION ALL ".join(
        f"SELECT doc_id, {b} AS band_idx, b{b} AS band_key FROM bands"
        for b in range(BANDS)
    )
    return f"""WITH {_minhash_ctes()},
bl AS (
    {long_form}
),
m AS (
    SELECT n.doc_id,
           COUNT(DISTINCT CASE WHEN e.doc_id < {INCR_SPLIT_ID}
                               THEN e.doc_id END) AS n_dup_existing,
           COUNT(DISTINCT CASE WHEN e.doc_id >= {INCR_SPLIT_ID}
                               THEN e.doc_id END) AS n_dup_batch
    FROM bl n
    JOIN bl e ON n.band_idx = e.band_idx AND n.band_key = e.band_key
             AND e.doc_id < n.doc_id
    WHERE n.doc_id >= {INCR_SPLIT_ID}
    GROUP BY n.doc_id
)
SELECT d.doc_id,
       CAST(COALESCE(m.n_dup_existing, 0) AS BIGINT) AS n_dup_existing,
       CAST(COALESCE(m.n_dup_batch, 0) AS BIGINT) AS n_dup_batch,
       CAST(CASE WHEN COALESCE(m.n_dup_existing, 0)
                    + COALESCE(m.n_dup_batch, 0) > 0
                 THEN 1 ELSE 0 END AS INT) AS is_dup
FROM (SELECT doc_id FROM documents WHERE doc_id >= {INCR_SPLIT_ID}) d
LEFT JOIN m USING (doc_id)
ORDER BY d.doc_id
"""


@register(
    "dedup_incremental",
    oracle=_incremental_oracle(),
    tags=("dedup", "lsh", "incremental"),
)
def dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental MinHash dedup — the steady-state shape of a 100 TB
    ingestion pipeline: each NEW batch is checked against the existing
    corpus AND its own earlier members WITHOUT re-pairing the corpus
    against itself. Only the new docs' shingles are hashed fresh; the
    existing side joins in as (doc_id, band_idx, band_key) rows —
    which at scale come straight from the PERSISTED signature/band
    table the previous runs wrote (the same artifact-persistence
    discipline as the IVF index), so per-batch cost is O(batch) map
    work + one band-key equi-join, never O(corpus).

    The join is asymmetric: new-side keys against all earlier-id keys
    (existing + earlier batch members), partner counts split by side,
    clean docs preserved via the left join with zero counts. Here the
    'existing' keys are derived in-plan because the test corpus ships
    as one parquet table; the split id plays the batch boundary."""
    docs = load_table(spark, sf_dir, "documents")
    sh = shingle_table(docs, "doc_id", "text", n=3)
    sig = minhash_signatures(sh, "doc_id", NUM_HASHES)
    # localCheckpoint: the band-key table feeds BOTH sides of the
    # self-join below, and Catalyst does no cross-branch CSE on
    # DataFrame subplans — without it the whole shingle→md5→minhash
    # pipeline (the dominant map-side CPU) runs twice. At scale this
    # materialization IS the persisted signature table the docstring
    # describes.
    keys = lsh_band_keys(sig, "doc_id", NUM_HASHES, BANDS).localCheckpoint()
    new_keys = keys.where(F.col("doc_id") >= INCR_SPLIT_ID).alias("n")
    earlier = keys.alias("e")
    matches = new_keys.join(
        earlier,
        (F.col("n.band_idx") == F.col("e.band_idx"))
        & (F.col("n.band_key") == F.col("e.band_key"))
        & (F.col("e.doc_id") < F.col("n.doc_id")),
    )
    per_new = matches.groupBy(F.col("n.doc_id").alias("doc_id")).agg(
        F.countDistinct(
            F.when(F.col("e.doc_id") < INCR_SPLIT_ID, F.col("e.doc_id"))
        ).alias("_ex"),
        F.countDistinct(
            F.when(F.col("e.doc_id") >= INCR_SPLIT_ID, F.col("e.doc_id"))
        ).alias("_ba"),
    )
    new_docs = docs.where(F.col("doc_id") >= INCR_SPLIT_ID).select("doc_id")
    ex = F.coalesce(F.col("_ex"), F.lit(0))
    ba = F.coalesce(F.col("_ba"), F.lit(0))
    return (
        new_docs.join(per_new, "doc_id", "left")
        .select(
            "doc_id",
            ex.cast("long").alias("n_dup_existing"),
            ba.cast("long").alias("n_dup_batch"),
            F.when(ex + ba > 0, 1).otherwise(0).cast("int").alias("is_dup"),
        )
        .orderBy("doc_id")
    )


@register(
    "dedup_containment",
    oracle=f"""
WITH {_minhash_ctes()},
ex AS (SELECT DISTINCT doc_id, shingle FROM sh),
sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM ex GROUP BY doc_id)
SELECT c.id_a, c.id_b,
       COUNT(*) AS n_int,
       CAST(COUNT(*) AS DOUBLE) / LEAST(MIN(sa.n_sh), MIN(sb.n_sh))
           AS containment
FROM cand c
JOIN ex x ON x.doc_id = c.id_a
JOIN ex y ON y.doc_id = c.id_b AND y.shingle = x.shingle
JOIN sizes sa ON sa.doc_id = c.id_a
JOIN sizes sb ON sb.doc_id = c.id_b
GROUP BY c.id_a, c.id_b
""",
    tags=("dedup", "containment"),
)
def dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Max-containment C(A,B) = |sh(A) ∩ sh(B)| / min(|sh(A)|,|sh(B)|)
    on LSH candidate pairs — the ASYMMETRIC near-dup signal Jaccard
    misses: a short doc fully quoted inside a long one has low Jaccard
    (union is big) but containment ≈ 1, which is what contamination
    and quote/boilerplate detection need. Same scale shape as
    dedup_ngram_jaccard: exact set math only on LSH candidates, one
    shared checkpointed shingle table feeding both branches. The
    division is integers-in/double-out, so it is bit-identical across
    engines with no rounding."""
    docs = load_table(spark, sf_dir, "documents")
    sh = shingle_table(docs, "doc_id", "text", n=3).localCheckpoint()
    pairs = minhash_candidate_pairs(
        docs, "doc_id", "text", n=3, num_hashes=NUM_HASHES, bands=BANDS, shingles=sh
    )
    res = jaccard_on_pairs(pairs, sh, "doc_id")
    return res.select(
        "id_a",
        "id_b",
        "n_int",
        (F.col("n_int").cast("double") / F.least("n_a", "n_b")).alias("containment"),
    )


def _minhash_est_match_sql(num_hashes: int) -> str:
    return " + ".join(
        f"CASE WHEN sa.s{j} = sb.s{j} THEN 1 ELSE 0 END"
        for j in range(num_hashes)
    )


@register(
    "dedup_minhash_estimate",
    oracle=f"""
WITH {_minhash_ctes()},
ex AS (SELECT DISTINCT doc_id, shingle FROM sh),
sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM ex GROUP BY doc_id),
exact AS (
    SELECT c.id_a, c.id_b,
           CAST(COUNT(*) AS DOUBLE)
               / (MIN(sa.n_sh) + MIN(sb.n_sh) - COUNT(*)) AS jaccard
    FROM cand c
    JOIN ex x ON x.doc_id = c.id_a
    JOIN ex y ON y.doc_id = c.id_b AND y.shingle = x.shingle
    JOIN sizes sa ON sa.doc_id = c.id_a
    JOIN sizes sb ON sb.doc_id = c.id_b
    GROUP BY c.id_a, c.id_b
),
est AS (
    SELECT c.id_a, c.id_b,
           CAST({_minhash_est_match_sql(NUM_HASHES)} AS DOUBLE)
               / {NUM_HASHES} AS jaccard_est
    FROM cand c
    JOIN sig sa ON sa.doc_id = c.id_a
    JOIN sig sb ON sb.doc_id = c.id_b
)
SELECT e.id_a, e.id_b, e.jaccard_est,
       x.jaccard,
       ROUND(ABS(e.jaccard_est - x.jaccard), 6) AS est_err
FROM est e JOIN exact x ON x.id_a = e.id_a AND x.id_b = e.id_b
""",
    tags=("dedup", "minhash", "audit"),
)
def dedup_minhash_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-quality audit: for every LSH candidate pair, the MinHash
    Jaccard ESTIMATE (fraction of agreeing signature components —
    E[est] = J by the MinHash property) side-by-side with the exact
    shingle-set Jaccard and the absolute estimator error. This is the
    calibration pass that tells you whether NUM_HASHES is adequate
    before trusting the sketch at full scale, where the exact join is
    only affordable on a sample. Scale shape: the estimate needs ONLY
    the signature table (16 ints per doc — no shingle re-join), so it
    costs two broadcast-sized joins on candidate keys; the exact side
    reuses the shared checkpointed shingle table as in
    dedup_ngram_jaccard. Estimate and exact are integer-ratio doubles
    (bit-identical); only the error difference is rounded."""
    from target_iceberg_spark.operators.dedup import candidate_pairs

    docs = load_table(spark, sf_dir, "documents")
    sh = shingle_table(docs, "doc_id", "text", n=3).localCheckpoint()
    # Round 13 (guide §2.4): sig feeds THREE consumers (band keys, the
    # sa join, the sb join) and pairs feeds two (exact + estimate);
    # divergent pushed join-key filters stop Catalyst from reusing the
    # subtrees, so the NUM_HASHES-fold minhash aggregation re-executed
    # per consumer (profiled: two identical 5 MB shuffle writes at
    # sf0.1). Both tables are small — one row per doc / per candidate
    # pair — so cut the lineage once each; deterministic md5 folds,
    # results unchanged.
    sig = minhash_signatures(sh, "doc_id", NUM_HASHES).localCheckpoint()
    pairs = candidate_pairs(
        lsh_band_keys(sig, "doc_id", NUM_HASHES, BANDS), "doc_id"
    ).localCheckpoint()
    exact = jaccard_on_pairs(pairs, sh, "doc_id").select("id_a", "id_b", "jaccard")
    match_count = sum(
        F.when(F.col(f"sa.s{j}") == F.col(f"sb.s{j}"), 1).otherwise(0)
        for j in range(NUM_HASHES)
    )
    est = (
        pairs.join(sig.alias("sa"), F.col("id_a") == F.col("sa.doc_id"))
        .join(sig.alias("sb"), F.col("id_b") == F.col("sb.doc_id"))
        .select(
            "id_a",
            "id_b",
            (match_count.cast("double") / NUM_HASHES).alias("jaccard_est"),
        )
    )
    return est.join(exact, ["id_a", "id_b"]).select(
        "id_a",
        "id_b",
        "jaccard_est",
        "jaccard",
        F.round(F.abs(F.col("jaccard_est") - F.col("jaccard")), 6).alias("est_err"),
    )
