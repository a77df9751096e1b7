#!/usr/bin/env python
"""Generate an sf1-equivalent dataset by replicating the driver's
sf0.1 tables 10x with consistent key shifts — the one-off input for
the scale-growth audit (tools/scale_audit.py, BENCH_SF1 artifact).

Why replication, not synthesis: the driver's generator is the ground
truth for distributions; shifting every key column by a per-replica
offset preserves referential integrity and per-key cardinalities
exactly (each replica is an isomorphic copy), so a query's cost model
sees a faithful 10x: 10x rows, 10x join fan-in, 10x groups on key
columns, constant groups on categorical columns — the same growth a
real corpus has. TPC-H itself scales this way (region/nation stay
fixed; facts and their dimension keys grow).

Two tables need more than a key shift to avoid DEGENERATE 10x:

- documents.text: an exact copy per replica would make every doc a
  10-deep duplicate cluster and blow near-dup candidate volume
  quadratically (10-deep LSH buckets -> 100x pairs — a different
  workload, not a bigger one). Two deterministic transforms per
  replica:
  (a) a word shuffle, destroying cross-replica word ORDER;
  (b) tail-vocabulary remapping (round-8, after the sf1 audit showed
      the ~100-word synthetic vocabulary inflating n-gram collision
      rates): the top-N most frequent corpus words stay unchanged —
      in a real corpus the head of the Zipf curve is shared by every
      document too — while every TAIL word gets a replica-keyed
      md5 suffix. Vocabulary now grows with the replica count
      (Heaps' law: real vocab grows ~n^0.5; per-replica-distinct
      tails grow faster, which is CONSERVATIVE — fewer accidental
      collisions than real growth), in-replica duplicate structure
      is untouched (the mapping is per-word deterministic), unigram
      quality statistics survive (stopword/langid ratios live in the
      unchanged head), and cross-replica shingle collisions collapse
      to head-only shingles — the ones real corpora share as well.
- embeddings.embedding: an exact copy would put 10 identical vectors
  in every ANN bucket (same degenerate blowup). Rotating the
  dimension order by the replica index preserves norms and all
  in-replica geometry while decorrelating replicas.

Output: {out}/sf1/{table}.parquet/ directories, one part file per
replica (>=10 input splits per table so local[32] parallelizes the
scans). Run once:

    python tools/make_scale_data.py [--src /root/testdata/sf0.1] \
        [--out .scaledata] [--replicas 10]
"""

from __future__ import annotations

import argparse
import os
import random

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]

# key column -> (owning table, primary column) defining its offset
# stride; FK columns share the PK's stride so joins stay aligned
KEY_STRIDES = {
    "c_custkey": ("customer", "c_custkey"),
    "s_suppkey": ("supplier", "s_suppkey"),
    "p_partkey": ("part", "p_partkey"),
    "o_orderkey": ("orders", "o_orderkey"),
    "o_custkey": ("customer", "c_custkey"),
    "l_orderkey": ("orders", "o_orderkey"),
    "l_partkey": ("part", "p_partkey"),
    "l_suppkey": ("supplier", "s_suppkey"),
    "event_id": ("events", "event_id"),
    "user_id": ("events", "user_id"),
    "doc_id": ("documents", "doc_id"),
    "vec_id": ("embeddings", "vec_id"),
}

# region/nation are fixed dimensions (real TPC-H does not scale them)
FIXED = {"region", "nation"}


HEAD_VOCAB = 64  # most-frequent words kept identical in every replica


def _shuffle_words(text: str, rng_seed: int) -> str:
    words = text.split()
    random.Random(rng_seed).shuffle(words)
    return " ".join(words)


def _head_words(texts) -> set:
    """Top-HEAD_VOCAB corpus words by total frequency — the shared
    Zipf head (stopwords and near-stopwords) every replica keeps."""
    from collections import Counter

    counts = Counter()
    for t in texts:
        counts.update(t.split())
    return {w for w, _ in counts.most_common(HEAD_VOCAB)}


def _remap_tail(text: str, r: int, head: set) -> str:
    """Replica-keyed tail remap: head words pass through, tail words
    gain a deterministic md5-derived suffix unique to the replica, so
    the scaled corpus's vocabulary grows with the replica count and
    shingles containing any tail word can never collide across
    replicas."""
    import hashlib

    out = []
    for w in text.split():
        if w in head:
            out.append(w)
        else:
            out.append(
                w + hashlib.md5(f"{w}|{r}".encode()).hexdigest()[:4]
            )
    return " ".join(out)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default=".scaledata")
    ap.add_argument("--replicas", type=int, default=10)
    args = ap.parse_args()

    out_sf = os.path.join(args.out, "sf1")
    tabs = {t: pd.read_parquet(f"{args.src}/{t}.parquet") for t in TABLES}
    head = _head_words(tabs["documents"]["text"])
    # strides: one above the max key so shifted ranges never collide
    stride = {
        col: int(tabs[src_table][pk].max()) + 1
        for col, (src_table, pk) in KEY_STRIDES.items()
    }

    for t in TABLES:
        dest = os.path.join(out_sf, f"{t}.parquet")
        os.makedirs(dest, exist_ok=True)
        base = tabs[t]
        n_rep = 1 if t in FIXED else args.replicas
        for r in range(n_rep):
            df = base.copy()
            if r > 0:
                for col in df.columns:
                    if col in stride:
                        df[col] = df[col] + r * stride[col]
                if t == "documents":
                    df["text"] = [
                        _remap_tail(
                            _shuffle_words(s, r * 1_000_003 + len(s)), r, head
                        )
                        for s in df["text"]
                    ]
                    df["n_chars"] = df["text"].str.len().astype("int64")
                if t == "embeddings":
                    df["embedding"] = [
                        np.roll(np.asarray(v, dtype=np.float32), r).tolist()
                        for v in df["embedding"]
                    ]
            table = pa.Table.from_pandas(df, preserve_index=False)
            if t == "embeddings":  # keep list<float> (pandas widens to double)
                schema = pq.read_schema(f"{args.src}/{t}.parquet")
                table = table.cast(schema)
            pq.write_table(table, os.path.join(dest, f"part-{r:02d}.parquet"))
        print(f"{t}: {len(base) * n_rep} rows in {n_rep} part(s)")


if __name__ == "__main__":
    main()
