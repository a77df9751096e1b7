"""Product quantization (PQ) for compressed approximate nearest
neighbor — the memory-side complement to the IVF operator.

The PQ recipe (Jégou, Douze, Schmid, "Product Quantization for Nearest
Neighbor Search", TPAMI 2011):
  1. TRAIN: split each d-dim vector into M subvectors of d/M dims; fit
     an independent K-centroid k-means codebook per subspace on a
     bounded sample.
  2. ENCODE: each vector becomes M small codes (argmin sub-centroid
     per subspace) — d floats compress to M bytes (for K<=256), a
     32x shrink at d=64/M=8, which is what lets a 100 TB embedding
     corpus's index live in memory.
  3. SEARCH (ADC — asymmetric distance): the probe precomputes an
     M x K lookup table of squared sub-distances; a candidate's
     approximate distance is the sum of M table lookups on its codes —
     no float vector ever touched at scan time.

Spark mapping: the fit runs driver-side on a bounded seeded sample
(numpy — same split as the IVF quantizer fit); encoding is ONE
vectorized Arrow pass (mapInPandas, numpy broadcast over the batch);
the ADC scan is pure JVM codegen — the probe's lookup table ships as a
plan literal and each candidate folds its M codes over it with
element_at + aggregate. Codes are corpus-persistable like any column;
this module keeps encode-on-the-fly for the registered query and
documents the persist path.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from target_iceberg_spark.bounded import bounded_collect

PQ_TRAIN_SAMPLE_ROWS = 20_000


# Session-scoped codebook memo: the fit is DETERMINISTIC for a fixed
# (corpus, m, k, seed), so caching by key changes nothing but skips
# the count + sample-collect + Lloyd jobs on re-invocation — the
# in-process analogue of the IVF index's on-disk cache
# (operators/ivf.py::build_or_load_ivf). Keyed by the caller-supplied
# corpus identity (a source path) PLUS an on-disk freshness stamp
# (total byte size + newest mtime of the files under the path), so
# rewriting the parquet at the same path within a session invalidates
# both the codebooks and the knob-sizing vector count instead of
# serving stale ones. Never keyed by DataFrame object.
_CODEBOOK_MEMO: dict[tuple, np.ndarray] = {}
_COUNT_MEMO: dict[tuple, int] = {}


def _freshness(path: str) -> tuple[int, int]:
    """(total_bytes, max_mtime_ns) over the file or directory at
    ``path``; (0, 0) when the key is not a filesystem path (the memo
    then degrades to identity-by-key, matching pre-freshness behavior).
    """
    import os

    try:
        if os.path.isfile(path):
            st = os.stat(path)
            return st.st_size, st.st_mtime_ns
        if os.path.isdir(path):
            size = mtime = 0
            for root, _dirs, files in os.walk(path):
                for f in files:
                    st = os.stat(os.path.join(root, f))
                    size += st.st_size
                    mtime = max(mtime, st.st_mtime_ns)
            return size, mtime
    except OSError:
        pass
    return 0, 0


def corpus_count(emb: DataFrame, cache_key: str | None = None) -> int:
    """emb.count() with the same session-scoped memo discipline —
    the knob-sizing count is pure corpus metadata."""
    key = (cache_key, _freshness(cache_key)) if cache_key is not None else None
    if key is not None and key in _COUNT_MEMO:
        return _COUNT_MEMO[key]
    n = emb.count()
    if key is not None:
        _COUNT_MEMO[key] = n
    return n


def fit_pq_codebooks(
    emb: DataFrame,
    vec_col: str = "embedding",
    m: int = 8,
    k: int = 16,
    seed: int = 42,
    iters: int = 10,
    cache_key: str | None = None,
) -> np.ndarray:
    """Fit M independent K-centroid sub-codebooks on a bounded
    deterministic sample; returns ndarray [M, K, d/M].

    Plain Lloyd's iterations in numpy — the sample is bounded
    (PQ_TRAIN_SAMPLE_ROWS) and DETERMINISTIC (seeded Bernoulli sample,
    not an unordered limit() whose rows depend on task completion
    order), so the fit is a driver-side constant cost exactly like the
    IVF quantizer fit; at 100 TB you fit once on a sample and reuse the
    codebooks for every encode/search."""
    memo_key = (
        (cache_key, _freshness(cache_key), vec_col, m, k, seed, iters)
        if cache_key
        else None
    )
    if memo_key is not None and memo_key in _CODEBOOK_MEMO:
        return _CODEBOOK_MEMO[memo_key]
    total = emb.count()
    if total > PQ_TRAIN_SAMPLE_ROWS:
        # no trailing limit(): a limit over the sample would re-introduce
        # task-completion-order dependence; the seeded fraction alone is
        # deterministic for fixed partition contents and bounded (~5%
        # over target)
        frac = min(1.0, PQ_TRAIN_SAMPLE_ROWS * 1.05 / total)
        sample = emb.select(vec_col).sample(fraction=frac, seed=seed)
    else:
        sample = emb.select(vec_col)
    frac_rows = bounded_collect(
        sample,
        cap=2 * PQ_TRAIN_SAMPLE_ROWS,
        why="seeded Bernoulli training sample targeting "
        "PQ_TRAIN_SAMPLE_ROWS (or the whole sub-threshold corpus)",
        structural=False,
    )
    if not frac_rows:
        raise ValueError("cannot fit PQ codebooks on an empty corpus")
    x = np.asarray([r[0] for r in frac_rows], dtype=np.float64)
    n, d = x.shape
    if d % m != 0:
        raise ValueError(f"dim {d} not divisible by m={m}")
    if n < k:
        raise ValueError(
            f"PQ fit needs at least k={k} training vectors, got {n} — "
            "lower k or supply more data"
        )
    sub = d // m
    rng = np.random.default_rng(seed)
    books = np.empty((m, k, sub))
    for j in range(m):
        xs = x[:, j * sub : (j + 1) * sub]
        centers = xs[rng.choice(n, size=k, replace=False)]
        for _ in range(iters):
            d2 = ((xs[:, None, :] - centers[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)
            for c in range(k):
                pts = xs[assign == c]
                if len(pts):
                    centers[c] = pts.mean(axis=0)
        books[j] = centers
    if memo_key is not None:
        _CODEBOOK_MEMO[memo_key] = books
    return books


def encode_pq(
    emb: DataFrame,
    codebooks: np.ndarray,
    vec_col: str = "embedding",
    code_col: str = "pq_codes",
) -> DataFrame:
    """Append the M-code PQ encoding of ``vec_col`` as an array<int>.

    One vectorized Arrow pass: per batch, numpy broadcasting computes
    all (rows x K) sub-distances per subspace — no per-row Python. At
    scale, write the result once (codes are ~M bytes/vector) and search
    against the persisted codes table."""
    import pandas as pd

    m, k, sub = codebooks.shape
    out_fields = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in emb.schema.fields
    )
    schema = f"{out_fields}, {code_col} array<int>"
    books = codebooks  # captured; shipped once per task via pickling

    def encode(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            x = np.asarray(list(pdf[vec_col]), dtype=np.float64)
            if x.shape[1] != m * sub:
                raise ValueError(
                    f"vector dim {x.shape[1]} != codebook dim {m * sub} "
                    f"(m={m} x sub={sub}) — wrong codebooks for this corpus"
                )
            codes = np.empty((len(pdf), m), dtype=np.int32)
            for j in range(m):
                xs = x[:, j * sub : (j + 1) * sub]
                d2 = ((xs[:, None, :] - books[j][None, :, :]) ** 2).sum(axis=2)
                codes[:, j] = d2.argmin(axis=1)
            pdf = pdf.copy()
            pdf[code_col] = list(codes)
            yield pdf

    return emb.mapInPandas(encode, schema=schema)


def adc_distance_expr(
    probe: np.ndarray, codebooks: np.ndarray, code_col: str = "pq_codes"
) -> F.Column:
    """JVM-side asymmetric distance: the probe's M x K squared
    sub-distance table flattens into ONE literal array in the plan and
    each candidate sums M element_at lookups indexed by its codes —
    whole-stage codegen, no Python, no vector reads at scan time."""
    m, k, sub = codebooks.shape
    lut = np.empty(m * k)
    for j in range(m):
        ps = probe[j * sub : (j + 1) * sub]
        lut[j * k : (j + 1) * k] = ((codebooks[j] - ps[None, :]) ** 2).sum(axis=1)
    # ONE Literal node: F.array(*2048 literals) builds a CreateArray
    # whose children every analysis pass re-walks — and this column is
    # embedded in a zip_with lambda, multiplying the tree. The numpy
    # literal is a single node (same fix as plans/joins_bloom.py).
    lut_col = F.lit(np.ascontiguousarray(lut, dtype=np.float64))
    # dist = sum_j lut[j*k + code_j]  (element_at is 1-based)
    return F.aggregate(
        F.zip_with(
            F.col(code_col),
            F.sequence(F.lit(0), F.lit(m - 1)),
            lambda code, j: F.element_at(lut_col, (j * k + code + 1).cast("int")),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


# --- corpus-sized knobs (round 12) -----------------------------------
# Fixed (K=16, C=100) holds the 0.8 recall floor only on the tiny
# driver fixtures: at sf0.1 (2000 vectors) the 4-bit-per-subspace
# codebook's quantization error puts true top-10 neighbors outside a
# 100-row ADC shortlist and recall@10 drops below the floor (found by
# the full sf0.1 oracle-parity sweep of sim_ann_quality). The fix is
# the same NDV-derived-sizing discipline as similarity_mutual.rknn_bits
# and joins_bloom.sized_m: resolution follows corpus size, with floors
# that keep the driver-checked small-SF instantiation bit-identical.

PQ_MIN_K = 16  # the sf0.001/sf0.01 instantiation (<= 512 vectors)
PQ_MAX_K = 256  # one-byte codes — the production PQ ceiling
PQ_MAX_SHORTLIST = 2000  # exact re-rank stays a bounded join


def pq_codebook_k(n_vectors: int) -> int:
    """Sub-codebook size that grows with corpus density: one centroid
    per ~32 vectors, power-of-two, floored at the small-fixture K and
    capped at 256 (one-byte codes — beyond that the production lever
    is IVF composition, operators/ivf.py + plans/similarity_ivfpq.py,
    not a wider flat codebook)."""
    import math

    raw = 2 ** math.ceil(math.log2(max(n_vectors, 1) / 32)) if n_vectors > 32 else PQ_MIN_K
    return max(PQ_MIN_K, min(PQ_MAX_K, raw))


def pq_shortlist(n_vectors: int, floor: int = 100) -> int:
    """ADC shortlist depth: for FIXED codebook resolution the number
    of competitors inside quantization-error distance of the true
    top-k boundary grows with N, so C follows N/10 — floored at the
    driver-fixture C and capped at {PQ_MAX_SHORTLIST} rows (the exact
    re-rank must stay a bounded broadcast join; past the cap the
    recall lever is pq_codebook_k's finer codes and IVFADC routing)."""
    return max(floor, min(PQ_MAX_SHORTLIST, -(-n_vectors // 10)))
