"""Near-duplicate detection operators: MinHash+LSH and SimHash.

Design for 100 TB: never materialize the O(N^2) pair space. Both
families generate candidate pairs through equi-joins on compact keys
(LSH band hash / SimHash segment), so the heavy step is an ordinary
shuffle join Catalyst already knows how to distribute, and the exact
verification (Jaccard / Hamming) runs only on candidates.

Hashing is md5-based — NOT Spark's hash()/xxhash64 — deliberately:
md5 produces identical hex in every engine, which makes the whole
pipeline expressible in the DuckDB oracle and therefore subject to the
strict correctness gate. Per-hash-function minima are taken over the
*lexicographic* order of fixed-width hex strings, which equals numeric
order — no hex->int conversion needed.

MLlib's MinHashLSH offers a same-shaped alternative; this
implementation is preferred because it is engine-portable and keeps
the signature layout explicit (one column per hash).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from target_iceberg_spark.functions.hashing import hex_int
from target_iceberg_spark.functions.textfns import ngrams_of, tokens


def shingle_table(df: DataFrame, id_col: str, text_col: str, n: int = 3) -> DataFrame:
    """(id, shingle) pairs — one row per occurrence; downstream MIN/COUNT
    DISTINCT make duplicates harmless. Tokens are materialized into a
    column before shingling (see functions/textfns.py::ngrams_of for
    the O(tokens^2) trap this avoids)."""
    return (
        df.select(F.col(id_col), tokens(text_col).alias("_toks"))
        .select(F.col(id_col), F.explode(ngrams_of("_toks", n)).alias("shingle"))
    )


def minhash_signatures(
    shingles: DataFrame, id_col: str, num_hashes: int = 16
) -> DataFrame:
    """One column per hash function via the Carter-Wegman family:
    ONE md5 per shingle yields h1 (hex digits 1-8) and h2 (digits 9-16,
    forced odd), then g_j = (h1 + j*h2) mod 2^32 and s_j = MIN(g_j).
    A single map-side-combinable groupBy. One md5 + num_hashes integer
    ops per row — the naive per-j md5 costs num_hashes digests per
    shingle occurrence, the dominant map-side CPU at corpus scale.
    Integer arithmetic is engine-portable, so the DuckDB oracle mirrors
    it exactly."""
    h = F.md5(F.col("shingle"))
    hashed = shingles.select(
        F.col(id_col),
        hex_int(h, 1, 8).cast("long").alias("_h1"),
        hex_int(h, 9, 8).cast("long").bitwiseOR(F.lit(1)).alias("_h2"),
    )
    aggs = [
        F.min((F.col("_h1") + F.lit(j) * F.col("_h2")) % F.lit(4294967296)).alias(f"s{j}")
        for j in range(num_hashes)
    ]
    return hashed.groupBy(id_col).agg(*aggs)


def lsh_band_keys(
    signatures: DataFrame, id_col: str, num_hashes: int = 16, bands: int = 4
) -> DataFrame:
    """Collapse each band of num_hashes/bands signature columns to one
    md5 band key; output long-form (id, band_idx, band_key) so candidate
    generation is ONE equi-join regardless of band count."""
    if num_hashes % bands != 0:
        raise ValueError(
            f"num_hashes ({num_hashes}) must be divisible by bands ({bands})"
        )
    rows_per_band = num_hashes // bands
    band_cols = []
    for b in range(bands):
        cols = [F.col(f"s{b * rows_per_band + r}") for r in range(rows_per_band)]
        # ':' separator: signature values are variable-width decimal
        # strings, so bare concat would alias e.g. (1,23) with (12,3)
        band_cols.append(
            F.struct(
                F.lit(b).alias("band_idx"),
                F.md5(F.concat_ws(":", *cols)).alias("band_key"),
            )
        )
    return (
        signatures.select(F.col(id_col), F.explode(F.array(*band_cols)).alias("bk"))
        .select(id_col, "bk.band_idx", "bk.band_key")
    )


def candidate_pairs(
    band_keys: DataFrame, id_col: str, max_bucket_size: int | None = None
) -> DataFrame:
    """Distinct (id_a < id_b) pairs sharing >= 1 band: self-equi-join on
    (band_idx, band_key) — shuffle-partitioned by band key, no cross
    product. Output columns: id_a, id_b.

    ``max_bucket_size`` is the 100 TB safety valve: one degenerate band
    bucket of m members yields m^2/2 pairs (a million boilerplate docs
    sharing a band => 5*10^11 pairs from ONE key), so production dedup
    caps bucket size and skips oversized buckets — members of such a
    bucket are near-identical enough that other bands, or the exact
    dedup pass, still catch them. The cap costs one extra
    map-side-combinable count per (band_idx, band_key). None = uncapped
    (the test-SF default, keeping the DuckDB oracle exact)."""
    if max_bucket_size is not None:
        sizes = band_keys.groupBy("band_idx", "band_key").agg(
            F.count(F.lit(1)).alias("_bucket_n")
        )
        band_keys = (
            band_keys.join(sizes, ["band_idx", "band_key"])
            .where(F.col("_bucket_n") <= max_bucket_size)
            .drop("_bucket_n")
        )
    a = band_keys.alias("a")
    b = band_keys.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .distinct()
    )


def minhash_candidate_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
    shingles: DataFrame | None = None,
) -> DataFrame:
    """Full MinHash+LSH pipeline: shingle -> signature -> band -> pairs.

    Pass a precomputed (and ideally checkpointed) ``shingles`` table
    when the caller also consumes the shingles (e.g. Jaccard verify) —
    Catalyst does no cross-branch CSE on DataFrame subplans, so sharing
    one materialized shingle table avoids re-tokenizing the corpus per
    branch."""
    sh = shingles if shingles is not None else shingle_table(df, id_col, text_col, n)
    sig = minhash_signatures(sh, id_col, num_hashes)
    # localCheckpoint: candidate_pairs consumes the band-key table on
    # BOTH self-join sides, and Catalyst does no cross-branch CSE on
    # DataFrame subplans — without it the whole shingle→minhash chain
    # (the dominant map-side CPU of every caller) executes twice. The
    # materialized table is |docs| x bands rows of (id, band_idx,
    # band_key) — at scale it IS the persisted signature/band artifact
    # the incremental pipeline reads (see dedup_incremental).
    keys = lsh_band_keys(sig, id_col, num_hashes, bands).localCheckpoint()
    return candidate_pairs(keys, id_col)


def jaccard_on_pairs(
    pairs: DataFrame, shingles: DataFrame, id_col: str
) -> DataFrame:
    """Exact shingle-set Jaccard for candidate pairs only (the verify
    step after LSH). Returns id_a, id_b, n_int, n_a, n_b, jaccard."""
    sizes = shingles.groupBy(id_col).agg(
        F.countDistinct("shingle").alias("n_sh")
    )
    ex = shingles.select(F.col(id_col), "shingle").distinct()
    inter = (
        pairs.join(ex.alias("x"), F.col("id_a") == F.col(f"x.{id_col}"))
        .join(
            ex.alias("y"),
            (F.col("id_b") == F.col(f"y.{id_col}"))
            & (F.col("x.shingle") == F.col("y.shingle")),
        )
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_int"))
    )
    return (
        inter.join(sizes.alias("sa"), F.col("id_a") == F.col(f"sa.{id_col}"))
        .join(sizes.alias("sb"), F.col("id_b") == F.col(f"sb.{id_col}"))
        .select(
            "id_a",
            "id_b",
            "n_int",
            F.col("sa.n_sh").alias("n_a"),
            F.col("sb.n_sh").alias("n_b"),
            (
                F.col("n_int").cast("double")
                / (F.col("sa.n_sh") + F.col("sb.n_sh") - F.col("n_int"))
            ).alias("jaccard"),
        )
    )


# ---------------------------------------------------------------------------
# SimHash (16-bit, md5-derived) — Hamming-distance near-dup family.
# ---------------------------------------------------------------------------

SIMHASH_BITS = 16


def simhash_fingerprints(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """16-bit SimHash per document: each token hashes to 16 bits (first 4
    hex chars of md5); fingerprint bit b is 1 iff more tokens set bit b
    than clear it. Engine-portable: hex parse + bit ops exist in both
    Spark ('conv') and DuckDB ('0x..'::INTEGER)."""
    sh = df.select(F.col(id_col), F.explode(tokens(text_col)).alias("tok"))
    th = sh.withColumn(
        "h", hex_int(F.md5("tok"), 1, 4).cast("int")
    )
    bit_sums = th.groupBy(id_col).agg(
        *[
            F.sum(
                F.when(F.shiftright(F.col("h"), b).bitwiseAND(1) == 1, 1).otherwise(-1)
            ).alias(f"b{b}")
            for b in range(SIMHASH_BITS)
        ]
    )
    fp = F.lit(0)
    for b in range(SIMHASH_BITS):
        fp = fp + F.when(F.col(f"b{b}") > 0, F.lit(1 << b)).otherwise(F.lit(0))
    return bit_sums.select(F.col(id_col), fp.cast("int").alias("simhash"))


def simhash_pairs(fps: DataFrame, id_col: str, max_hamming: int = 2) -> DataFrame:
    """Pairs with Hamming distance <= max_hamming. Pigeonhole blocking:
    split the 16-bit fingerprint into (max_hamming + 1) segments — any
    pair within distance max_hamming agrees on >= 1 segment, so
    candidates come from segment-equality equi-joins, never O(N^2)."""
    n_seg = max_hamming + 1
    seg_bits = SIMHASH_BITS // n_seg  # last segment takes the remainder
    segs = []
    for s in range(n_seg):
        shift = s * seg_bits
        width = SIMHASH_BITS - shift if s == n_seg - 1 else seg_bits
        mask = (1 << width) - 1
        segs.append(
            F.struct(
                F.lit(s).alias("seg_idx"),
                F.shiftright(F.col("simhash"), shift).bitwiseAND(mask).alias("seg_val"),
            )
        )
    long_form = fps.select(
        F.col(id_col), F.col("simhash"), F.explode(F.array(*segs)).alias("sg")
    ).select(id_col, "simhash", "sg.seg_idx", "sg.seg_val")
    a, b = long_form.alias("a"), long_form.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.seg_idx") == F.col("b.seg_idx"))
            & (F.col("a.seg_val") == F.col("b.seg_val"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col("a.simhash").alias("sh_a"),
            F.col("b.simhash").alias("sh_b"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return cand.select(
        "id_a", "id_b", hamming.cast("int").alias("hamming")
    ).where(F.col("hamming") <= max_hamming)


# ---------------------------------------------------------------------------
# Embedding near-dup — banded sign-LSH blocking.
# ---------------------------------------------------------------------------


def recommended_band_bits(
    n_rows: int, n_blocks: int = 1, target_block_rows: int = 512
) -> int:
    """Sign-plane count per band so the expected block occupancy stays
    ~``target_block_rows``: bits = log2(N / (blocks * target)). THE
    scale knob — with bits growing as log2(N), per-band candidate work
    B * N^2 / (blocks * 2^bits) stays ~linear in N instead of
    quadratic. Clamped to [2, 24]."""
    import math

    per_block = max(1, n_rows // max(1, n_blocks))
    bits = math.ceil(math.log2(max(2, per_block / target_block_rows)))
    return min(24, max(2, bits))


def embedding_band_pairs(
    e: DataFrame,
    bands: int,
    bits: int,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_col: str = "label",
) -> DataFrame:
    """Near-duplicate embedding pairs via banded sign-LSH blocking.

    Each band hashes ``bits`` disjoint vector components to a sign
    bucket (axis-aligned random-hyperplane LSH); candidates are pairs
    agreeing on (block_col, band bucket) for ANY band — the classic
    AND-within-band / OR-across-bands amplification, so recall for
    truly-parallel near-dups stays high while per-band blocks shrink
    2x per added bit. Every band is an equi-join; no cross product.
    Duplicate pairs colliding in several bands carry identical rounded
    cosines, so the final ``distinct`` collapses them exactly.
    """
    from target_iceberg_spark.functions.vectors import sign_bucket

    # long-form (id, block, band_idx, bucket) keys -> ONE self-equi-join
    # for candidate generation (the lsh_band_keys/candidate_pairs shape):
    # the embedding table is scanned once for keys and the join shuffles
    # only the compact key rows — never the vectors — vs the naive
    # one-join-per-band form (bands x 2 corpus scans + per-band cosine).
    band_structs = F.array(
        *[
            F.struct(
                F.lit(t).alias("band_idx"),
                sign_bucket(vec_col, bits, offset=t * bits).alias("bucket"),
            )
            for t in range(bands)
        ]
    )
    keys = e.select(
        F.col(id_col), F.col(block_col), F.explode(band_structs).alias("bk")
    ).select(id_col, block_col, "bk.band_idx", "bk.bucket")
    a, b = keys.alias("a"), keys.alias("b")
    pairs = (
        a.join(
            b,
            (F.col(f"a.{block_col}") == F.col(f"b.{block_col}"))
            & (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("vec_a"), F.col(f"b.{id_col}").alias("vec_b")
        )
        .distinct()  # pairs colliding in several bands dedupe BEFORE the cosine
    )
    # Per-VECTOR squared norms (N folds) instead of per-PAIR (2 folds
    # per candidate): cosine() is dot/sqrt(sq_norm*sq_norm), so
    # dividing the pair dot by sqrt(_n2_a * _n2_b) is the IDENTICAL
    # float expression — bit-exact, with 2 of the 3 array folds moved
    # off the verify stage (measured 3x less verify CPU at sf0.1).
    from target_iceberg_spark.functions.vectors import dot, sq_norm

    vecs = e.select(
        F.col(id_col), F.col(vec_col), sq_norm(vec_col).alias("_n2")
    )
    return (
        pairs.join(vecs.alias("va"), F.col("vec_a") == F.col(f"va.{id_col}"))
        .join(vecs.alias("vb"), F.col("vec_b") == F.col(f"vb.{id_col}"))
        .select(
            "vec_a",
            "vec_b",
            F.round(
                dot(F.col(f"va.{vec_col}"), F.col(f"vb.{vec_col}"))
                / F.sqrt(F.col("va._n2") * F.col("vb._n2")),
                6,
            ).alias("cos_sim"),
        )
        .where(F.col("cos_sim") >= threshold)
    )
