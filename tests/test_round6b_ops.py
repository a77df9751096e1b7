"""Independent recomputations for the second round-6 query batch
(ANOVA, Spearman, association rules, HITS, filter sweep, peak
detection, GEMM retrieval).

Each test re-derives the registered query's claim with a SEPARATE
implementation (pure python / numpy) so a shared misconception between
the Spark plan and its DuckDB oracle cannot pass silently — the same
discipline as tests/test_round6_ops.py.
"""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import duckdb

from target_iceberg_spark.plans.registry import all_specs

SPECS = all_specs()


# -- agg_anova_f -------------------------------------------------------------


def test_anova_f_matches_pure_python(spark, sf_smoke):
    rows = SPECS["agg_anova_f"].builder(spark, sf_smoke).collect()
    assert len(rows) == 1
    r = rows[0]
    data = duckdb.sql(
        f"SELECT l_returnflag, l_quantity FROM "
        f"read_parquet('{sf_smoke}/lineitem.parquet')"
    ).fetchall()
    groups: dict = defaultdict(list)
    for flag, q in data:
        groups[flag].append(q)
    n = len(data)
    k = len(groups)
    grand = sum(q for _, q in data) / n
    ssb = sum(len(v) * (sum(v) / len(v) - grand) ** 2 for v in groups.values())
    ssw = sum(
        sum((x - sum(v) / len(v)) ** 2 for x in v) for v in groups.values()
    )
    f = (ssb / (k - 1)) / (ssw / (n - k))
    assert r["n_rows"] == n
    assert r["n_groups"] == k
    assert abs(r["ss_between"] - ssb) < 1e-2
    assert abs(r["ss_within"] - ssw) < 1e-2
    assert abs(r["f_stat"] - f) < 1e-4


# -- agg_spearman ------------------------------------------------------------


def _midranks(values):
    """value -> tie-averaged (min-rank + (ties-1)/2) rank."""
    sorted_v = sorted(values)
    first = {}
    for i, v in enumerate(sorted_v):
        if v not in first:
            first[v] = i + 1
    cnt = Counter(values)
    return {v: first[v] + (cnt[v] - 1) / 2.0 for v in cnt}


def test_spearman_matches_pure_python(spark, sf_oracle):
    from target_iceberg_spark.plans.stats_rank import SPEARMAN_MIN_N

    rows = {
        r["nationkey"]: r
        for r in SPECS["agg_spearman"].builder(spark, sf_oracle).collect()
    }
    assert rows, "no nation cleared the minimum-size filter"
    per_cust = duckdb.sql(
        f"""
        SELECT c.c_nationkey, c.c_acctbal, COUNT(o.o_orderkey) AS n_orders
        FROM read_parquet('{sf_oracle}/customer.parquet') c
        LEFT JOIN read_parquet('{sf_oracle}/orders.parquet') o
          ON c.c_custkey = o.o_custkey
        GROUP BY c.c_custkey, c.c_nationkey, c.c_acctbal
        """
    ).fetchall()
    by_nation: dict = defaultdict(list)
    for nk, bal, cnt in per_cust:
        by_nation[nk].append((bal, cnt))
    for nk, pairs in by_nation.items():
        if len(pairs) < SPEARMAN_MIN_N:
            assert nk not in rows
            continue
        ra_map = _midranks([b for b, _ in pairs])
        rb_map = _midranks([c for _, c in pairs])
        ra = [ra_map[b] for b, _ in pairs]
        rb = [rb_map[c] for _, c in pairs]
        n = len(pairs)
        sa, sb = sum(ra), sum(rb)
        saa = sum(x * x for x in ra)
        sbb = sum(x * x for x in rb)
        sab = sum(x * y for x, y in zip(ra, rb))
        rho = (n * sab - sa * sb) / math.sqrt(
            (n * saa - sa * sa) * (n * sbb - sb * sb)
        )
        assert rows[nk]["n_customers"] == n
        assert abs(rows[nk]["spearman_rho"] - rho) < 1e-5


# -- mining_association_rules ------------------------------------------------


def test_association_rules_match_pure_python(spark, sf_smoke):
    from target_iceberg_spark.plans.mining_rules import RULE_SUPPORT, RULE_TOP

    rows = (
        SPECS["mining_association_rules"].builder(spark, sf_smoke).collect()
    )
    assert 0 < len(rows) <= RULE_TOP
    items = set(
        duckdb.sql(
            f"SELECT DISTINCT l_orderkey, l_partkey FROM "
            f"read_parquet('{sf_smoke}/lineitem.parquet')"
        ).fetchall()
    )
    baskets: dict = defaultdict(set)
    for ok, pk in items:
        baskets[ok].add(pk)
    n_orders = len(baskets)
    item_n = Counter(pk for _, pk in items)
    pair_n: Counter = Counter()
    for parts in baskets.values():
        ps = sorted(parts)
        for i in range(len(ps)):
            for j in range(i + 1, len(ps)):
                pair_n[(ps[i], ps[j])] += 1
    rules = []
    for (a, b), nab in pair_n.items():
        if nab < RULE_SUPPORT:
            continue
        for ant, con in ((a, b), (b, a)):
            lift = nab * n_orders / (item_n[ant] * item_n[con])
            rules.append((round(lift, 6), ant, con, nab))
    rules.sort(key=lambda t: (-t[0], t[1], t[2]))
    expect = rules[: len(rows)]
    for r, (lift, ant, con, nab) in zip(rows, expect):
        assert (r["antecedent"], r["consequent"]) == (ant, con)
        assert r["n_both"] == nab
        assert abs(r["lift"] - lift) < 1e-6
        assert abs(r["confidence"] - nab / item_n[ant]) < 1e-6


# -- graph_hits --------------------------------------------------------------


def test_hits_matches_pure_python(spark, sf_smoke):
    from target_iceberg_spark.plans.graph_hits import HITS_TOP

    rows = SPECS["graph_hits"].builder(spark, sf_smoke).collect()
    assert 0 < len(rows) <= HITS_TOP
    edges = set(
        duckdb.sql(
            f"SELECT DISTINCT l_suppkey, l_partkey FROM "
            f"read_parquet('{sf_smoke}/lineitem.parquet')"
        ).fetchall()
    )
    h = Counter(s for s, _ in edges)  # h1 = out-degree (a0 = 1)
    a: Counter = Counter()
    for s, p in edges:
        a[p] += h[s]  # a1
    h2: Counter = Counter()
    for s, p in edges:
        h2[s] += a[p]
    a2: Counter = Counter()
    n_supp: Counter = Counter()
    for s, p in edges:
        a2[p] += h2[s]
        n_supp[p] += 1
    tot = sum(a2.values())
    ranked = sorted(
        ((round(v / tot, 9), p) for p, v in a2.items()),
        key=lambda t: (-t[0], t[1]),
    )
    for r, (score, p) in zip(rows, ranked[: len(rows)]):
        assert r["part_key"] == p
        assert r["n_suppliers"] == n_supp[p]
        assert abs(r["authority"] - score) < 1e-9


# -- curation_filter_sweep ---------------------------------------------------


def test_filter_sweep_matches_pure_python(spark, sf_smoke):
    from target_iceberg_spark.plans.curation_sweep import SWEEP_THRESHOLDS

    rows = {
        r["min_chars"]: r
        for r in SPECS["curation_filter_sweep"].builder(spark, sf_smoke).collect()
    }
    assert set(rows) == set(SWEEP_THRESHOLDS)
    lengths = [
        n
        for (n,) in duckdb.sql(
            f"SELECT n_chars FROM read_parquet('{sf_smoke}/documents.parquet')"
        ).fetchall()
    ]
    total_chars = sum(lengths)
    for t in SWEEP_THRESHOLDS:
        kept = [n for n in lengths if n >= t]
        r = rows[t]
        assert r["kept_docs"] == len(kept)
        assert abs(r["doc_retention"] - len(kept) / len(lengths)) < 1e-6
        assert abs(r["char_retention"] - sum(kept) / total_chars) < 1e-6
    # monotone: higher cutoff never keeps more
    kept_seq = [rows[t]["kept_docs"] for t in sorted(SWEEP_THRESHOLDS)]
    assert kept_seq == sorted(kept_seq, reverse=True)


# -- events_peaks ------------------------------------------------------------


def test_events_peaks_match_pure_python(spark, sf_smoke):
    from target_iceberg_spark.plans.curation_sweep import (
        PEAK_BASELINE_DAYS,
        PEAK_RATIO,
    )

    rows = SPECS["events_peaks"].builder(spark, sf_smoke).collect()
    daily = duckdb.sql(
        f"""
        SELECT event_type,
               strftime(date_trunc('day', CAST(ts AS TIMESTAMP)),
                        '%Y-%m-%d') AS day,
               COUNT(*) AS n
        FROM read_parquet('{sf_smoke}/events.parquet')
        GROUP BY 1, 2 ORDER BY 1, 2
        """
    ).fetchall()
    by_type: dict = defaultdict(list)
    for et, day, n in daily:
        by_type[et].append((day, n))
    expect = []
    for et, series in by_type.items():
        for i in range(1, len(series) - 1):
            day, n = series[i]
            window = [x for _, x in series[max(0, i - PEAK_BASELINE_DAYS) : i]]
            if not window:
                continue
            baseline = sum(window) / len(window)
            if (
                n > series[i - 1][1]
                and n > series[i + 1][1]
                and n > PEAK_RATIO * baseline
            ):
                expect.append((et, day, n, round(n / baseline, 4)))
    expect.sort()
    got = [
        (r["event_type"], r["day"], r["n_events"], r["over_baseline"])
        for r in rows
    ]
    assert got == expect


# -- curation_upsample_weights -----------------------------------------------


def test_upsample_weights_match_pure_python(spark, sf_smoke):
    from target_iceberg_spark.plans.curation_sweep import (
        UPW_CLIP_HI,
        UPW_CLIP_LO,
    )

    rows = {
        r["source"]: r
        for r in SPECS["curation_upsample_weights"]
        .builder(spark, sf_smoke)
        .collect()
    }
    data = duckdb.sql(
        f"SELECT source, n_chars FROM "
        f"read_parquet('{sf_smoke}/documents.parquet')"
    ).fetchall()
    chars: dict = defaultdict(int)
    ndocs: dict = defaultdict(int)
    for src, n in data:
        chars[src] += n
        ndocs[src] += 1
    all_chars = sum(chars.values())
    k = len(chars)
    weights = {
        s: min(UPW_CLIP_HI, max(UPW_CLIP_LO, (1 / k) / (c / all_chars)))
        for s, c in chars.items()
    }
    mass = sum(weights[s] * chars[s] / all_chars for s in chars)
    assert set(rows) == set(chars)
    for s in chars:
        r = rows[s]
        assert r["n_docs"] == ndocs[s]
        assert abs(r["char_share"] - chars[s] / all_chars) < 1e-6
        assert abs(r["weight"] - weights[s]) < 1e-6
        assert (
            abs(
                r["reweighted_share"]
                - weights[s] * (chars[s] / all_chars) / mass
            )
            < 1e-6
        )
    # reweighted shares are a distribution and strictly flatter than raw
    assert abs(sum(r["reweighted_share"] for r in rows.values()) - 1) < 1e-4


# -- multimodal_scene_cuts ---------------------------------------------------


def test_scene_cuts_match_pure_python(spark, sf_smoke):
    from target_iceberg_spark.plans.multimodal_scenes import (
        SC_BLOCK_BYTES,
        SC_BLOCKS,
        SC_CUT_HAM,
        SC_FRAME_BYTES,
        SC_MIN_FRAMES,
    )

    rows = {
        r["doc_id"]: r
        for r in SPECS["multimodal_scene_cuts"].builder(spark, sf_smoke).collect()
    }
    docs = duckdb.sql(
        f"SELECT doc_id, text FROM "
        f"read_parquet('{sf_smoke}/documents.parquet')"
    ).fetchall()
    n_eligible = 0
    for doc_id, text in docs:
        raw = text.encode("utf-8")
        n_frames = len(raw) // SC_FRAME_BYTES
        if len(raw) < SC_MIN_FRAMES * SC_FRAME_BYTES:
            assert doc_id not in rows
            continue
        n_eligible += 1
        hashes = []
        for f in range(n_frames):
            frame = raw[f * SC_FRAME_BYTES : (f + 1) * SC_FRAME_BYTES]
            blocks = [
                sum(frame[k * SC_BLOCK_BYTES : (k + 1) * SC_BLOCK_BYTES])
                for k in range(SC_BLOCKS)
            ]
            tot = sum(blocks)
            fh = sum(
                1 << k
                for k, b in enumerate(blocks)
                if SC_BLOCKS * b > tot
            )
            hashes.append(fh)
        cuts = sum(
            1
            for a, b in zip(hashes, hashes[1:])
            if bin(a ^ b).count("1") >= SC_CUT_HAM
        )
        r = rows[doc_id]
        assert r["n_frames"] == n_frames
        assert r["n_cuts"] == cuts
        assert abs(r["cut_rate"] - cuts / (n_frames - 1)) < 1e-6
    assert n_eligible > 0 and len(rows) == n_eligible


# -- scan_python_datasource --------------------------------------------------


def test_python_datasource_round_trips_written_jsonl(spark, tmp_path):
    """The pure-Python connector must read back exactly what Spark's
    json writer produced, split one-partition-per-file."""
    from target_iceberg_spark.sources.pyds import JsonlDataSource

    df = spark.createDataFrame(
        [(i, f"name{i}", i % 3) for i in range(20)], "a int, b string, c int"
    )
    out = str(tmp_path / "jl")
    df.repartition(4).write.json(out)
    spark.dataSource.register(JsonlDataSource)
    back = (
        spark.read.format("graft_jsonl")
        .schema("a int, b string, c int")
        .option("path", out)
        .load()
    )
    assert back.rdd.getNumPartitions() == 4  # one split per part file
    assert sorted((r.a, r.b, r.c) for r in back.collect()) == sorted(
        (i, f"name{i}", i % 3) for i in range(20)
    )
    # missing keys surface as NULL, not an error (explicit-schema policy)
    missing = (
        spark.read.format("graft_jsonl")
        .schema("a int, b string, zzz int")
        .option("path", out)
        .load()
    )
    assert all(r.zzz is None for r in missing.collect())


def test_python_datasource_requires_path_and_files(spark, tmp_path):
    from pyspark.errors.exceptions.captured import (  # noqa: F401
        PythonException,
    )

    from target_iceberg_spark.sources.pyds import JsonlDataSource

    spark.dataSource.register(JsonlDataSource)
    import pytest as _pytest

    with _pytest.raises(Exception, match="path"):
        (
            spark.read.format("graft_jsonl")
            .schema("a int")
            .load()
            .collect()
        )
    empty = str(tmp_path / "empty")
    import os

    os.makedirs(empty)
    with _pytest.raises(Exception, match="no \\*\\.json"):
        (
            spark.read.format("graft_jsonl")
            .schema("a int")
            .option("path", empty)
            .load()
            .collect()
        )


# -- graph_assortativity -----------------------------------------------------


def test_assortativity_matches_pure_python(spark, sf_smoke):
    from target_iceberg_spark.plans.graph_assortativity import ASSORT_SUPPORT

    rows = SPECS["graph_assortativity"].builder(spark, sf_smoke).collect()
    assert len(rows) == 1
    r = rows[0]
    items = set(
        duckdb.sql(
            f"SELECT DISTINCT l_orderkey, l_partkey FROM "
            f"read_parquet('{sf_smoke}/lineitem.parquet')"
        ).fetchall()
    )
    baskets: dict = defaultdict(set)
    for ok, pk in items:
        baskets[ok].add(pk)
    pair_n: Counter = Counter()
    for parts in baskets.values():
        ps = sorted(parts)
        for i in range(len(ps)):
            for j in range(i + 1, len(ps)):
                pair_n[(ps[i], ps[j])] += 1
    edges = [e for e, n in pair_n.items() if n >= ASSORT_SUPPORT]
    deg: Counter = Counter()
    for a, b in edges:
        deg[a] += 1
        deg[b] += 1
    xs, ys = [], []
    for a, b in edges:
        xs += [deg[a], deg[b]]
        ys += [deg[b], deg[a]]
    n = len(xs)
    sx, sxx = sum(xs), sum(x * x for x in xs)
    sxy = sum(x * y for x, y in zip(xs, ys))
    rho = (n * sxy - sx * sx) / (n * sxx - sx * sx)
    assert r["n_edges"] == len(edges)
    assert abs(r["mean_end_degree"] - sx / n) < 1e-4
    assert abs(r["assortativity"] - rho) < 1e-6
    assert -1 <= r["assortativity"] <= 1


# -- curation_filter_overlap -------------------------------------------------


def test_filter_overlap_matches_pure_python(spark, sf_smoke):
    import hashlib

    from target_iceberg_spark.plans.curation_sweep import OVERLAP_MIN_CHARS

    rows = {
        (r["length_fail"], r["quality_fail"], r["dup_fail"]): r
        for r in SPECS["curation_filter_overlap"].builder(spark, sf_smoke).collect()
    }
    docs = duckdb.sql(
        f"SELECT doc_id, text, n_chars FROM "
        f"read_parquet('{sf_smoke}/documents.parquet')"
    ).fetchall()
    by_hash: dict = defaultdict(list)
    for doc_id, text, _ in docs:
        by_hash[hashlib.md5(text.lower().encode()).hexdigest()].append(doc_id)
    cells: Counter = Counter()
    for doc_id, text, n_chars in docs:
        toks = text.split(" ")
        types = {t.lower() for t in toks}
        length_fail = n_chars < OVERLAP_MIN_CHARS
        quality_fail = not (
            20 <= len(toks) <= 80 and len(types) * 4 >= len(toks)
        )
        copies = by_hash[hashlib.md5(text.lower().encode()).hexdigest()]
        dup_fail = len(copies) > 1 and doc_id != min(copies)
        cells[(length_fail, quality_fail, dup_fail)] += 1
    n = len(docs)
    assert set(rows) == set(cells)
    for cell, cnt in cells.items():
        assert rows[cell]["n_docs"] == cnt
        assert abs(rows[cell]["share"] - cnt / n) < 1e-6
    assert sum(r["n_docs"] for r in rows.values()) == n


# -- dedup_lsh_band_sweep ----------------------------------------------------


def test_lsh_band_sweep_matches_pure_python(spark, sf_smoke):
    import hashlib

    from target_iceberg_spark.plans.dedup_sql import NUM_HASHES
    from target_iceberg_spark.plans.dedup_tuning import SWEEP_BANDS

    rows = {
        r["bands"]: r
        for r in SPECS["dedup_lsh_band_sweep"].builder(spark, sf_smoke).collect()
    }
    assert set(rows) == set(SWEEP_BANDS)
    docs = duckdb.sql(
        f"SELECT doc_id, text FROM "
        f"read_parquet('{sf_smoke}/documents.parquet')"
    ).fetchall()
    sigs: dict = {}
    for doc_id, text in docs:
        toks = text.lower().split(" ")
        shingles = {
            " ".join(toks[i : i + 3]) for i in range(len(toks) - 2)
        }
        if not shingles:
            continue
        mins = [2**33] * NUM_HASHES
        for sh in shingles:
            hx = hashlib.md5(sh.encode()).hexdigest()
            h1 = int(hx[:8], 16)
            h2 = int(hx[8:16], 16) | 1
            for j in range(NUM_HASHES):
                g = (h1 + j * h2) % 4294967296
                if g < mins[j]:
                    mins[j] = g
        sigs[doc_id] = mins
    for b in SWEEP_BANDS:
        r_per = NUM_HASHES // b
        buckets: dict = defaultdict(list)
        for doc_id, s in sigs.items():
            for i in range(b):
                key = ":".join(
                    str(s[i * r_per + r]) for r in range(r_per)
                )
                buckets[(i, key)].append(doc_id)
        multi = [v for v in buckets.values() if len(v) >= 2]
        pairs = set()
        for v in multi:
            sv = sorted(v)
            for i in range(len(sv)):
                for j in range(i + 1, len(sv)):
                    pairs.add((sv[i], sv[j]))
        r = rows[b]
        assert r["rows_per_band"] == r_per
        assert r["n_multi_buckets"] == len(multi)
        assert r["max_bucket"] == max(len(v) for v in buckets.values())
        assert r["n_cand_pairs"] == len(pairs)
    # more bands (shorter rows) must never produce fewer candidates
    cands = [rows[b]["n_cand_pairs"] for b in sorted(SWEEP_BANDS)]
    assert cands == sorted(cands)


# -- emb_silhouette ----------------------------------------------------------


def test_silhouette_matches_numpy(spark, sf_smoke):
    import numpy as np

    from target_iceberg_spark.plans.embeddings import KMEANS_K

    rows = {
        r["cluster_id"]: r
        for r in SPECS["emb_silhouette"].builder(spark, sf_smoke).collect()
    }
    data = duckdb.sql(
        f"SELECT vec_id, embedding FROM "
        f"read_parquet('{sf_smoke}/embeddings.parquet') ORDER BY vec_id"
    ).fetchall()
    ids = np.array([i for i, _ in data])
    X = np.array([e for _, e in data], dtype=np.float64)
    cents = X[ids < KMEANS_K]
    cids = np.arange(KMEANS_K)

    def assign(C, C_ids):
        d2 = np.round(((X[:, None, :] - C[None, :, :]) ** 2).sum(2), 6)
        order = np.lexsort((np.broadcast_to(C_ids, d2.shape), d2), axis=1)
        return d2, order

    d2, order = assign(cents, cids)
    own = cids[order[:, 0]]
    refit = np.stack([X[own == c].mean(0) for c in cids])
    d2, order = assign(refit, cids)
    own = cids[order[:, 0]]
    a2 = d2[np.arange(len(X)), order[:, 0]]
    b2 = d2[np.arange(len(X)), order[:, 1]]
    a, b = np.sqrt(a2), np.sqrt(b2)
    denom = np.maximum(a, b)
    s = np.where(denom == 0, 0.0, np.round((b - a) / np.where(denom == 0, 1, denom), 6))
    total = 0
    for c in cids:
        mask = own == c
        if not mask.any():
            assert c not in rows
            continue
        r = rows[c]
        assert r["n_vecs"] == int(mask.sum())
        assert abs(r["mean_silhouette"] - s[mask].mean()) < 1e-3
        assert abs(r["worst_silhouette"] - s[mask].min()) < 1e-3
        total += int(mask.sum())
    assert total == len(X)
    # silhouette is bounded
    assert all(-1 <= r["mean_silhouette"] <= 1 for r in rows.values())


# -- sim_gemm_topk -----------------------------------------------------------


def test_gemm_topk_matches_numpy_bruteforce(spark, sf_smoke):
    import numpy as np

    from target_iceberg_spark.plans.similarity_gemm import GEMM_K, GEMM_PROBES

    rows = SPECS["sim_gemm_topk"].builder(spark, sf_smoke).collect()
    data = duckdb.sql(
        f"SELECT vec_id, embedding FROM "
        f"read_parquet('{sf_smoke}/embeddings.parquet') ORDER BY vec_id"
    ).fetchall()
    ids = np.array([i for i, _ in data], dtype=np.int64)
    X = np.array([e for _, e in data], dtype=np.float64)
    Xu = X / np.sqrt((X * X).sum(axis=1, keepdims=True))
    expect = []
    for pid in range(GEMM_PROBES):
        p = Xu[ids == pid][0]
        cos = np.round(Xu @ p, 6)
        cand = [(c, i) for c, i in zip(cos, ids) if i != pid]
        cand.sort(key=lambda t: (-t[0], t[1]))
        expect.extend(
            (pid, int(i), float(c)) for c, i in cand[:GEMM_K]
        )
    got = [(r["probe_id"], r["neighbor_id"], r["cos"]) for r in rows]
    assert len(got) == GEMM_PROBES * GEMM_K
    for (gp, gn, gc), (ep, en, ec) in zip(got, expect):
        assert (gp, gn) == (ep, en)
        assert abs(gc - ec) < 1e-9
