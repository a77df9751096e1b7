"""Independent recomputations for the round-6 query tier (stats tests,
cumulative-series diagnostics, label propagation, embedding outliers,
tokenizer/readability stats).

Each test re-derives the registered query's claim with a SEPARATE
implementation (pure python / pandas / hashlib) so a shared
misconception between the Spark plan and its DuckDB oracle cannot pass
silently — the same discipline as tests/test_session4_ops.py.
"""

from __future__ import annotations

import hashlib
import math
from collections import Counter

import duckdb
import pytest

from target_iceberg_spark.plans.registry import all_specs

SPECS = all_specs()


# -- agg_chi_square --------------------------------------------------------


def test_chi_square_matches_pure_python(spark, sf_smoke):
    rows = SPECS["agg_chi_square"].builder(spark, sf_smoke).collect()
    assert len(rows) == 1
    r = rows[0]
    con = duckdb.connect()
    data = con.execute(
        f"SELECT o_orderstatus, o_orderpriority FROM "
        f"read_parquet('{sf_smoke}/orders.parquet')"
    ).fetchall()
    obs = Counter(data)
    row_t = Counter(s for s, _ in data)
    col_t = Counter(p for _, p in data)
    n = len(data)
    chi2 = sum(
        (obs.get((s, p), 0) - row_t[s] * col_t[p] / n) ** 2
        / (row_t[s] * col_t[p] / n)
        for s in row_t
        for p in col_t
    )
    assert r["n"] == n
    assert r["dof"] == (len(row_t) - 1) * (len(col_t) - 1)
    assert abs(r["chi2"] - chi2) < 1e-3
    v = math.sqrt(chi2 / (n * min(len(row_t) - 1, len(col_t) - 1)))
    assert abs(r["cramers_v"] - v) < 1e-5


# -- agg_mann_whitney ------------------------------------------------------


def test_mann_whitney_matches_naive_ranks(spark, sf_smoke):
    """Recompute U and z with the naive pooled midrank assignment (sort
    the raw values, average tied ranks) — the textbook O(n log n)
    single-machine form the distinct-value sweep must equal."""
    rows = {
        r["pri"]: r
        for r in SPECS["agg_mann_whitney"].builder(spark, sf_smoke).collect()
    }
    con = duckdb.connect()
    data = con.execute(
        f"SELECT o_orderpriority, o_orderstatus, o_totalprice FROM "
        f"read_parquet('{sf_smoke}/orders.parquet') "
        f"WHERE o_orderstatus IN ('F', 'O')"
    ).fetchall()
    by_pri: dict = {}
    for pri, st, v in data:
        by_pri.setdefault(pri, []).append((v, st))
    for pri, vals in by_pri.items():
        vals.sort()
        # midranks with tie averaging
        ranks: dict = {}
        i = 0
        while i < len(vals):
            j = i
            while j < len(vals) and vals[j][0] == vals[i][0]:
                j += 1
            mid = (i + 1 + j) / 2.0
            ranks[vals[i][0]] = mid
            i = j
        n_f = sum(1 for _, st in vals if st == "F")
        n_o = len(vals) - n_f
        r_f = sum(ranks[v] for v, st in vals if st == "F")
        u = r_f - n_f * (n_f + 1) / 2.0
        n = len(vals)
        tie3 = 0
        for _, cnt in Counter(v for v, _ in vals).items():
            tie3 += cnt**3 - cnt
        var_u = n_f * n_o / 12.0 * ((n + 1) - tie3 / (n * (n - 1)))
        z = (u - n_f * n_o / 2.0) / math.sqrt(var_u)
        got = rows[pri]
        assert got["n_f"] == n_f and got["n_o"] == n_o
        assert abs(got["u_stat"] - u) < 0.51  # u rounded to 2dp
        assert abs(got["z"] - z) < 1e-3, pri


# -- agg_bootstrap_ci ------------------------------------------------------


def test_bootstrap_weights_match_hashlib(spark, sf_smoke):
    """Re-derive replicate-0's weighted mean for one priority with
    hashlib md5 — pins the engine's hash/substring indexing to the
    spec (4 uniforms per digest, word b%4, digest b//4)."""
    import pyspark.sql.functions as F

    from target_iceberg_spark.plans import stats_tests as st

    con = duckdb.connect()
    data = con.execute(
        f"SELECT o_orderkey, o_orderpriority, o_totalprice FROM "
        f"read_parquet('{sf_smoke}/orders.parquet')"
    ).fetchall()

    def weight(key: int, b: int) -> float:
        h = hashlib.md5(f"{key}_{b // 4}".encode()).hexdigest()
        word = h[(b % 4) * 8 : (b % 4) * 8 + 8]
        u = (int(word, 16) + 0.5) / 2**32
        return -math.log(u)

    # expected CI inputs: all B replicate means for one priority
    pris = sorted({p for _, p, _ in data})
    pri = pris[0]
    sub = [(k, v) for k, p, v in data if p == pri]
    means = []
    for b in range(st.BOOT_B):
        ws = [weight(k, b) for k, _ in sub]
        means.append(
            sum(w * v for w, (_, v) in zip(ws, sub)) / sum(ws)
        )
    est = sum(means) / len(means)
    mvar = sum((m - est) ** 2 for m in means) / (len(means) - 1)
    se = math.sqrt(mvar)
    got = {
        r["pri"]: r
        for r in SPECS["agg_bootstrap_ci"].builder(spark, sf_smoke).collect()
    }[pri]
    assert abs(got["est"] - est) < 1e-3
    assert abs(got["se"] - se) < 1e-3
    assert abs(got["ci_lo"] - (est - st.BOOT_Z * se)) < 2e-3
    assert abs(got["ci_hi"] - (est + st.BOOT_Z * se)) < 2e-3


# -- events_cusum / events_drawdown ----------------------------------------


def _daily(sf_dir: str, agg: str):
    con = duckdb.connect()
    return con.execute(
        f"SELECT event_type, CAST(ts AS DATE) AS day, ROUND({agg}, 6) "
        f"FROM read_parquet('{sf_dir}/events.parquet') "
        f"GROUP BY 1, 2 ORDER BY 1, 2"
    ).fetchall()


def test_cusum_matches_pandas(spark, sf_smoke):
    rows = {
        r["event_type"]: r
        for r in SPECS["events_cusum"].builder(spark, sf_smoke).collect()
    }
    series: dict = {}
    for et, day, x in _daily(sf_smoke, "AVG(value)"):
        series.setdefault(et, []).append((day, x))
    for et, pts in series.items():
        m = sum(x for _, x in pts) / len(pts)
        s, best = 0.0, None
        for day, x in pts:  # pts already day-ordered
            s += x - m
            sr = round(s, 6)
            if best is None or abs(sr) > abs(best[1]) + 1e-12:
                best = (day, sr)
        got = rows[et]
        assert got["cp_day"] == best[0], et
        assert abs(got["max_abs_cusum"] - abs(best[1])) < 1e-3
        assert got["n_days"] == len(pts)


def test_drawdown_matches_pure_python(spark, sf_smoke):
    rows = {
        r["event_type"]: r
        for r in SPECS["events_drawdown"].builder(spark, sf_smoke).collect()
    }
    series: dict = {}
    for et, day, x in _daily(sf_smoke, "SUM(value)"):
        series.setdefault(et, []).append((day, x))
    for et, pts in series.items():
        c, peak, best = 0.0, -math.inf, None
        for day, x in pts:
            c = round(c + x, 6)
            peak = max(peak, c)
            draw = round(peak - c, 6)
            if best is None or draw > best[1] + 1e-12:
                best = (day, draw)
        got = rows[et]
        assert got["trough_day"] == best[0], et
        assert abs(got["max_drawdown"] - best[1]) < 1e-3


# -- graph_label_propagation -----------------------------------------------


def test_lpa_final_round_bounds_components(spark, sf_smoke):
    """After k rounds, labels are min node ids within k hops, so the
    label count is >= the true component count and <= the node count;
    recompute both with a pure-python BFS over the same edge set and
    check the per-round label counts are monotonically decreasing
    toward the component count."""
    from target_iceberg_spark.plans import graph_communities as gc

    out = {
        r["round"]: r
        for r in SPECS["graph_label_propagation"]
        .builder(spark, sf_smoke)
        .collect()
    }
    con = duckdb.connect()
    edges = con.execute(
        f"""
        WITH it AS (SELECT DISTINCT l_orderkey, l_partkey
                    FROM read_parquet('{sf_smoke}/lineitem.parquet'))
        SELECT a.l_partkey, b.l_partkey
        FROM it a JOIN it b ON a.l_orderkey = b.l_orderkey
                   AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2 HAVING COUNT(*) >= {gc.LPA_SUPPORT}
        """
    ).fetchall()
    adj: dict = {}
    nodes = set()
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
        nodes.update((a, b))
    # BFS component count
    seen: set = set()
    n_comp = 0
    for n in nodes:
        if n in seen:
            continue
        n_comp += 1
        stack = [n]
        seen.add(n)
        while stack:
            v = stack.pop()
            for w in adj.get(v, ()):
                if w not in seen:
                    seen.add(w)
                    stack.append(w)
    assert out[0]["n_labels"] == len(nodes)
    counts = [out[i]["n_labels"] for i in range(gc.LPA_ROUNDS + 1)]
    assert counts == sorted(counts, reverse=True)
    assert counts[-1] >= n_comp
    # exact k-hop min-label simulation for the final round
    labels = {n: n for n in nodes}
    for _ in range(gc.LPA_ROUNDS):
        labels = {
            n: min([labels[n]] + [labels[w] for w in adj.get(n, ())])
            for n in nodes
        }
    assert out[gc.LPA_ROUNDS]["n_labels"] == len(set(labels.values()))
    assert out[gc.LPA_ROUNDS]["largest"] == max(
        Counter(labels.values()).values()
    )


# -- emb_outliers ----------------------------------------------------------


def test_emb_outliers_matches_numpy(spark, sf_smoke):
    np = pytest.importorskip("numpy")
    rows = SPECS["emb_outliers"].builder(spark, sf_smoke).collect()
    assert rows
    con = duckdb.connect()
    data = con.execute(
        f"SELECT vec_id, label, embedding FROM "
        f"read_parquet('{sf_smoke}/embeddings.parquet')"
    ).fetchall()
    by_label: dict = {}
    for vid, lbl, emb in data:
        by_label.setdefault(lbl, []).append((vid, np.array(emb, dtype=np.float64)))
    z_all = {}
    for lbl, vecs in by_label.items():
        cent = np.round(np.mean([v for _, v in vecs], axis=0), 6)
        dists = {
            vid: round(float(np.sqrt(((v - cent) ** 2).sum())), 6)
            for vid, v in vecs
        }
        dvals = np.array(list(dists.values()))
        mu, sd = dvals.mean(), dvals.std(ddof=1)
        for vid, d in dists.items():
            z_all[vid] = (lbl, d, (d - mu) / sd)
    for r in rows:
        lbl, d, z = z_all[r["vec_id"]]
        assert r["label"] == lbl
        assert abs(r["dist"] - d) < 1e-3
        assert abs(r["z"] - z) < 1e-3
    # the report is the true global top by z
    want = sorted(z_all.items(), key=lambda kv: (-round(kv[1][2], 4), kv[0]))
    assert [r["vec_id"] for r in rows] == [vid for vid, _ in want[: len(rows)]]


# -- text_bpe_merges / text_readability ------------------------------------


def test_bpe_merges_match_counter(spark, sf_smoke):
    rows = SPECS["text_bpe_merges"].builder(spark, sf_smoke).collect()
    con = duckdb.connect()
    texts = [
        t
        for t, in con.execute(
            f"SELECT text FROM read_parquet('{sf_smoke}/documents.parquet')"
        ).fetchall()
    ]
    pairs: Counter = Counter()
    for t in texts:
        toks = t.split(" ")
        pairs.update(
            f"{a} {b}" for a, b in zip(toks, toks[1:])
        )
    want = sorted(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[: len(rows)]
    assert [(r["pair"], r["cnt"]) for r in rows] == want


def test_readability_matches_pure_python(spark, sf_smoke):
    import re

    rows = {
        r["source"]: r
        for r in SPECS["text_readability"].builder(spark, sf_smoke).collect()
    }
    con = duckdb.connect()
    data = con.execute(
        f"SELECT source, text FROM "
        f"read_parquet('{sf_smoke}/documents.parquet')"
    ).fetchall()
    per_source: dict = {}
    for src, t in data:
        words = len(t.split(" "))
        sentences = max(len(re.findall(r"[.!?]", t)), 1)
        syllables = len(re.findall(r"[aeiouy]+", t.lower()))
        fl = round(
            206.835 - 1.015 * (words / sentences) - 84.6 * (syllables / words),
            4,
        )
        per_source.setdefault(src, []).append((words, fl))
    for src, vals in per_source.items():
        got = rows[src]
        assert got["n_docs"] == len(vals)
        assert abs(got["avg_words"] - sum(w for w, _ in vals) / len(vals)) < 0.01
        assert abs(got["avg_flesch"] - sum(f for _, f in vals) / len(vals)) < 0.01
        assert abs(got["min_flesch"] - min(f for _, f in vals)) < 0.01
        assert abs(got["max_flesch"] - max(f for _, f in vals)) < 0.01


# -- agg_ks_test -----------------------------------------------------------


def test_ks_matches_naive_ecdf(spark, sf_smoke):
    rows = {
        r["pri"]: r
        for r in SPECS["agg_ks_test"].builder(spark, sf_smoke).collect()
    }
    con = duckdb.connect()
    data = con.execute(
        f"SELECT o_orderpriority, o_orderstatus, o_totalprice FROM "
        f"read_parquet('{sf_smoke}/orders.parquet') "
        f"WHERE o_orderstatus IN ('F', 'O')"
    ).fetchall()
    by_pri: dict = {}
    for pri, st, v in data:
        by_pri.setdefault(pri, {"F": [], "O": []})[st].append(v)
    for pri, d in by_pri.items():
        f, o = sorted(d["F"]), sorted(d["O"])
        grid = sorted(set(f) | set(o))
        import bisect

        dmax = max(
            abs(
                bisect.bisect_right(f, v) / len(f)
                - bisect.bisect_right(o, v) / len(o)
            )
            for v in grid
        )
        got = rows[pri]
        assert got["n_f"] == len(f) and got["n_o"] == len(o)
        assert abs(got["d_stat"] - dmax) < 1e-5, pri
        scaled = dmax * math.sqrt(len(f) * len(o) / (len(f) + len(o)))
        assert abs(got["ks_scaled"] - scaled) < 1e-3


# -- text_ngram_novelty ----------------------------------------------------


def test_ngram_novelty_matches_pure_python(spark, sf_smoke):
    from target_iceberg_spark.plans import corpus_novelty as cn

    rows = {
        r["bucket"]: r
        for r in SPECS["text_ngram_novelty"].builder(spark, sf_smoke).collect()
    }
    con = duckdb.connect()
    data = con.execute(
        f"SELECT doc_id, text FROM "
        f"read_parquet('{sf_smoke}/documents.parquet')"
    ).fetchall()
    doc_grams = {}
    for did, t in data:
        toks = t.split(" ")
        if len(toks) < cn.NOV_N:
            continue
        doc_grams[did] = {
            " ".join(toks[i : i + cn.NOV_N])
            for i in range(len(toks) - cn.NOV_N + 1)
        }
    firsts: dict = {}
    for did in sorted(doc_grams):
        for g in doc_grams[did]:
            firsts.setdefault(g, did)
    mx = max(did for did, _ in data)
    per_bucket: dict = {}
    for did, grams in doc_grams.items():
        nov = sum(1 for g in grams if firsts[g] == did) / len(grams)
        per_bucket.setdefault(did * cn.NOV_BUCKETS // (mx + 1), []).append(nov)
    for bucket, novs in per_bucket.items():
        got = rows[bucket]
        assert got["n_docs"] == len(novs)
        assert abs(got["avg_novelty"] - sum(novs) / len(novs)) < 1e-3
        assert abs(got["min_novelty"] - min(novs)) < 1e-3
    # novelty must decay from the first to the last ingest decile
    assert rows[0]["avg_novelty"] >= rows[max(rows)]["avg_novelty"]


# -- text_zipf_skewed ------------------------------------------------------


def test_zipf_skewed_slope_near_minus_one(spark, sf_smoke):
    """The derived corpus is Zipf(1) by construction, so the fitted
    log-log slope must land near -1 with a tight fit — and the
    hottest synthetic rank must dominate, proving the derivation
    actually produced skew (the fixture corpus itself is uniform)."""
    rows = SPECS["text_zipf_skewed"].builder(spark, sf_smoke).collect()
    assert len(rows) == 1
    r = rows[0]
    assert -1.35 < r["zipf_slope"] < -0.7, r
    assert r["fit_r2"] > 0.9
    assert r["vocab"] <= 1000 and r["n_tokens"] > r["vocab"]


def test_zipf_skewed_draw_matches_hashlib(spark, sf_smoke):
    """Pin the md5 -> uniform -> rank derivation to the spec for one
    document's first token."""
    import pyspark.sql.functions as F

    from target_iceberg_spark.plans import corpus_novelty as cn

    con = duckdb.connect()
    did, text = con.execute(
        f"SELECT doc_id, text FROM "
        f"read_parquet('{sf_smoke}/documents.parquet') ORDER BY doc_id LIMIT 1"
    ).fetchone()
    h = hashlib.md5(f"{did}:1".encode()).hexdigest()
    u = (int(h[:8], 16) + 0.5) / 2**32
    want = int(math.floor(math.exp(u * math.log(cn.ZIPF_V))))
    got = (
        spark.createDataFrame([(did, 1)], "doc_id long, i int")
        .select(
            F.floor(
                F.exp(
                    F.expr(
                        "(cast(conv(substring(md5(concat(cast(doc_id as string),"
                        " ':', cast(i as string))), 1, 8), 16, 10) as double)"
                        " + 0.5) / 4294967296.0"
                    )
                    * F.lit(math.log(cn.ZIPF_V))
                )
            ).cast("int")
        )
        .collect()[0][0]
    )
    assert got == want


# -- graph_link_prediction -------------------------------------------------


def test_link_prediction_matches_pure_python(spark, sf_smoke):
    from target_iceberg_spark.plans import graph_linkpred as lp

    rows = SPECS["graph_link_prediction"].builder(spark, sf_smoke).collect()
    con = duckdb.connect()
    edges = con.execute(
        f"""
        WITH it AS (SELECT DISTINCT l_orderkey, l_partkey
                    FROM read_parquet('{sf_smoke}/lineitem.parquet'))
        SELECT a.l_partkey, b.l_partkey
        FROM it a JOIN it b ON a.l_orderkey = b.l_orderkey
                   AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2 HAVING COUNT(*) >= {lp.LP_SUPPORT}
        """
    ).fetchall()
    adj: dict = {}
    eset = set()
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
        eset.add((a, b))
    centers = {n for n, ns in adj.items() if len(ns) <= lp.LP_DEG_CAP}
    cand: dict = {}
    for c in centers:
        nbrs = sorted(adj[c])
        for i, a in enumerate(nbrs):
            for b in nbrs[i + 1 :]:
                cand[(a, b)] = cand.get((a, b), 0) + 1
    scored = []
    for (a, b), cn_ in cand.items():
        if (a, b) in eset:
            continue
        j = cn_ / (len(adj[a]) + len(adj[b]) - cn_)
        scored.append((round(j, 6), a, b, cn_))
    scored.sort(key=lambda t: (-t[0], t[1], t[2]))
    want = scored[: len(rows)]
    got = [
        (r["jaccard"], r["part_a"], r["part_b"], r["common_nbrs"])
        for r in rows
    ]
    assert got == [(j, a, b, cn_) for j, a, b, cn_ in want]


# -- emb_drift_snapshots ---------------------------------------------------


def test_emb_drift_matches_numpy(spark, sf_smoke):
    np = pytest.importorskip("numpy")
    rows = {
        r["label"]: r
        for r in SPECS["emb_drift_snapshots"].builder(spark, sf_smoke).collect()
    }
    con = duckdb.connect()
    data = con.execute(
        f"SELECT vec_id, label, embedding FROM "
        f"read_parquet('{sf_smoke}/embeddings.parquet')"
    ).fetchall()
    by: dict = {}
    for vid, lbl, emb in data:
        by.setdefault((lbl, vid % 2), []).append(
            np.array(emb, dtype=np.float64)
        )
    for lbl in {l for l, _ in by}:
        ca = np.round(np.mean(by[(lbl, 0)], axis=0), 6)
        cb = np.round(np.mean(by[(lbl, 1)], axis=0), 6)
        cos = float(ca @ cb / (np.linalg.norm(ca) * np.linalg.norm(cb)))
        l2 = float(np.linalg.norm(ca - cb))
        got = rows[lbl]
        assert got["n_a"] == len(by[(lbl, 0)])
        assert got["n_b"] == len(by[(lbl, 1)])
        assert abs(got["cos_sim"] - cos) < 1e-5
        assert abs(got["l2_dist"] - l2) < 1e-3
        # NOTE: no "cos near 1" sanity bound — the fixture embeddings
        # are near-zero-mean, so half-split centroids are tiny vectors
        # whose directions are noise; the operator's claim is the
        # exact arithmetic above, not the fixture's stability.


# -- events_burst ----------------------------------------------------------


def test_burst_episodes_match_pure_python(spark, sf_smoke):
    from target_iceberg_spark.plans import analytics_burst as ab

    rows = [
        (r["event_type"], r["start_h"], r["end_h"], r["n_hours"], r["n_events"])
        for r in SPECS["events_burst"].builder(spark, sf_smoke).collect()
    ]
    con = duckdb.connect()
    hourly = con.execute(
        f"SELECT event_type, date_trunc('hour', ts) AS h, COUNT(*) "
        f"FROM read_parquet('{sf_smoke}/events.parquet') "
        f"GROUP BY 1, 2 ORDER BY 1, 2"
    ).fetchall()
    series: dict = {}
    for et, h, c in hourly:
        series.setdefault(et, []).append((h, c))
    want = []
    from datetime import timedelta

    for et, pts in series.items():
        mean = sum(c for _, c in pts) / len(pts)
        hot = [(h, c) for h, c in pts if c > ab.BURST_MULT * mean]
        # group maximal consecutive-hour runs
        runs: list = []
        for h, c in hot:
            if runs and h - runs[-1][-1][0] == timedelta(hours=1):
                runs[-1].append((h, c))
            else:
                runs.append([(h, c)])
        for run in runs:
            if len(run) >= ab.BURST_MIN_HOURS:
                want.append(
                    (
                        et,
                        run[0][0],
                        run[-1][0],
                        len(run),
                        sum(c for _, c in run),
                    )
                )
    want.sort()
    assert rows == want
    assert rows  # the fixture must actually contain bursts


# -- profile_bloom_fpr -----------------------------------------------------


def test_bloom_filter_matches_hashlib(spark, sf_smoke):
    """Rebuild the whole filter with hashlib and recompute the probe
    verdicts — pins the md5-word indexing, the 32-bit word layout,
    and the all-k membership rule."""
    from target_iceberg_spark.plans import profiling_bloom as pb

    rows = SPECS["profile_bloom_fpr"].builder(spark, sf_smoke).collect()
    assert len(rows) == 1
    r = rows[0]
    con = duckdb.connect()
    keys = [
        k
        for k, in con.execute(
            f"SELECT DISTINCT c_custkey FROM "
            f"read_parquet('{sf_smoke}/customer.parquet')"
        ).fetchall()
    ]

    def positions(key: int):
        h = hashlib.md5(str(key).encode()).hexdigest()
        return [
            int(h[j * 8 : j * 8 + 8], 16) % pb.BLOOM_M
            for j in range(pb.BLOOM_K)
        ]

    words: dict = {}
    for k in keys:
        for p in positions(k):
            words[p // 32] = words.get(p // 32, 0) | (1 << (p % 32))
    fp = 0
    for probe in range(1000000, 1000000 + pb.BLOOM_PROBES):
        if all(
            (words.get(p // 32, 0) >> (p % 32)) & 1 for p in positions(probe)
        ):
            fp += 1
    assert r["n_keys"] == len(keys)
    assert r["words_used"] == len(words)
    assert r["false_positives"] == fp
    assert r["n_probes"] == pb.BLOOM_PROBES
    assert abs(r["observed_fpr"] - fp / pb.BLOOM_PROBES) < 1e-4
    theo = (1 - math.exp(-pb.BLOOM_K * len(keys) / pb.BLOOM_M)) ** pb.BLOOM_K
    assert abs(r["theoretical_fpr"] - theo) < 1e-4
    # the audit must be informative: observed within a loose factor of
    # theoretical (md5 behaves like a uniform hash)
    if theo > 0.01:
        assert 0.5 * theo < r["observed_fpr"] < 2.0 * theo


# -- profile_cms_error -----------------------------------------------------


def test_cms_matches_hashlib_and_is_one_sided(spark, sf_smoke):
    """Rebuild the whole count-min sketch with hashlib and recompute
    every top-K estimate — pins the md5-word hashing, the min-over-
    depth rule, and the CMS one-sided guarantee est >= true."""
    from target_iceberg_spark.plans import profiling_sketch as ps

    rows = [
        (r["o_custkey"], r["true_cnt"], r["est_cnt"], r["overest"])
        for r in SPECS["profile_cms_error"].builder(spark, sf_smoke).collect()
    ]
    con = duckdb.connect()
    cnts = dict(
        con.execute(
            f"SELECT o_custkey, COUNT(*) FROM "
            f"read_parquet('{sf_smoke}/orders.parquet') GROUP BY o_custkey"
        ).fetchall()
    )

    def positions(key: int):
        h = hashlib.md5(str(key).encode()).hexdigest()
        return [
            (d, int(h[d * 8 : d * 8 + 8], 16) % ps.CMS_W)
            for d in range(ps.CMS_D)
        ]

    counters: Counter = Counter()
    for k, c in cnts.items():
        for dp in positions(k):
            counters[dp] += c
    est = {k: min(counters[dp] for dp in positions(k)) for k in cnts}
    topk = sorted(cnts, key=lambda k: (-cnts[k], k))[: ps.CMS_TOP]
    want = [(k, cnts[k], est[k], est[k] - cnts[k]) for k in topk]
    assert rows == want
    for _, true_cnt, est_cnt, overest in rows:
        assert est_cnt >= true_cnt  # CMS never underestimates
        assert overest == est_cnt - true_cnt


# -- profile_kmv_jaccard ---------------------------------------------------


def test_kmv_matches_hashlib(spark, sf_smoke):
    """Recompute the bottom-k sketch with hashlib: exact cohort sets,
    the k smallest hashes, and both estimators — including the
    degenerate union<k path where the sketch must return the exact
    union count."""
    from target_iceberg_spark.plans import profiling_sketch as ps

    rows = SPECS["profile_kmv_jaccard"].builder(spark, sf_smoke).collect()
    assert len(rows) == 1
    r = rows[0]
    con = duckdb.connect()
    data = con.execute(
        f"SELECT o_custkey, year(o_orderdate) FROM "
        f"read_parquet('{sf_smoke}/orders.parquet') "
        f"WHERE year(o_orderdate) IN ({ps.KMV_YEAR_A}, {ps.KMV_YEAR_B})"
    ).fetchall()
    a = {k for k, y in data if y == ps.KMV_YEAR_A}
    b = {k for k, y in data if y == ps.KMV_YEAR_B}
    union = a | b
    assert r["n_a"] == len(a) and r["n_b"] == len(b)
    assert r["n_union"] == len(union) and r["n_inter"] == len(a & b)
    assert r["jaccard_exact"] == round(len(a & b) / len(union), 4)

    def hv(k: int) -> int:
        return int(hashlib.md5(str(k).encode()).hexdigest()[:8], 16)

    bottom = sorted(union, key=lambda k: (hv(k), k))[: ps.KMV_K]
    n_both = sum(1 for k in bottom if k in a and k in b)
    assert r["jaccard_est"] == round(n_both / len(bottom), 4)
    if len(union) < ps.KMV_K:
        assert r["union_est"] == len(union)  # sketch IS the set
    else:
        h_k = max(hv(k) for k in bottom)
        assert r["union_est"] == math.floor(
            (ps.KMV_K - 1) * 4294967296.0 / h_k
        )
        # the estimator must be informative on a real population
        assert 0.5 * len(union) < r["union_est"] < 2.0 * len(union)


# -- join_spatial_grid -----------------------------------------------------


def test_spatial_grid_matches_brute_force(spark, sf_smoke):
    """Brute-force O(n*m) recomputation of the radius join — pins the
    md5 coordinate derivation AND the grid-blocking no-miss guarantee
    (cell size = R means the 3x3 neighborhood covers every possible
    within-R pair)."""
    from target_iceberg_spark.plans import joins_spatial as js

    rows = [
        (r["c_custkey"], r["s_suppkey"], r["dist2"])
        for r in SPECS["join_spatial_grid"].builder(spark, sf_smoke).collect()
    ]
    con = duckdb.connect()
    custs = [
        k
        for k, in con.execute(
            f"SELECT c_custkey FROM read_parquet('{sf_smoke}/customer.parquet')"
        ).fetchall()
    ]
    supps = [
        k
        for k, in con.execute(
            f"SELECT s_suppkey FROM read_parquet('{sf_smoke}/supplier.parquet')"
        ).fetchall()
    ]

    def coord(prefix: str, key: int) -> tuple[float, float]:
        h = hashlib.md5(f"{prefix}{key}".encode()).hexdigest()
        return (
            int(h[:8], 16) / 4294967296.0,
            int(h[8:16], 16) / 4294967296.0,
        )

    want = []
    r2 = js.GRID_R * js.GRID_R
    for c in custs:
        cx, cy = coord("c", c)
        for s in supps:
            sx, sy = coord("s", s)
            d2 = (cx - sx) * (cx - sx) + (cy - sy) * (cy - sy)
            if d2 <= r2:
                want.append((c, s, d2))
    want.sort()
    assert sorted(rows) == want
    assert rows  # fixture must produce at least one within-R pair


# -- text_bigram_lm --------------------------------------------------------


def test_bigram_lm_matches_pure_python(spark, sf_smoke):
    """Refit the add-k bigram LM with collections.Counter and rescore
    every document — pins the smoothing formula, the context-count
    derivation, and the two-level averaging."""
    from target_iceberg_spark.plans import text_lm as tl

    rows = {
        r["source"]: r
        for r in SPECS["text_bigram_lm"].builder(spark, sf_smoke).collect()
    }
    con = duckdb.connect()
    docs = con.execute(
        f"SELECT doc_id, source, lower(text) FROM "
        f"read_parquet('{sf_smoke}/documents.parquet')"
    ).fetchall()
    c12: Counter = Counter()
    vocab: set = set()
    doc_bgs: dict = {}
    for doc_id, source, text in docs:
        toks = text.split(" ")
        vocab.update(toks)
        bgs = [f"{toks[i]} {toks[i+1]}" for i in range(len(toks) - 1)]
        doc_bgs[(source, doc_id)] = bgs
        c12.update(bgs)
    c1: Counter = Counter()
    for bg, c in c12.items():
        c1[bg.split(" ")[0]] += c
    v = float(len(vocab))
    per_source: dict = {}
    for (source, _doc_id), bgs in doc_bgs.items():
        if not bgs:
            continue
        ce = sum(
            -math.log((c12[bg] + tl.LM_K) / (c1[bg.split(" ")[0]] + tl.LM_K * v))
            for bg in bgs
        ) / len(bgs)
        per_source.setdefault(source, []).append((len(bgs), ce))
    assert set(rows) == set(per_source)
    for source, docs_ce in per_source.items():
        r = rows[source]
        assert r["n_docs"] == len(docs_ce)
        assert r["n_bigrams"] == sum(n for n, _ in docs_ce)
        mean_ce = sum(ce for _, ce in docs_ce) / len(docs_ce)
        assert abs(r["mean_cross_entropy"] - round(mean_ce, 4)) <= 1e-4
        assert r["mean_cross_entropy"] > 0


# -- graph_modularity ------------------------------------------------------


def test_modularity_matches_pure_python(spark, sf_smoke):
    """Re-run min-label propagation and the Newman Q formula in pure
    python over the same support-thresholded co-purchase graph."""
    from target_iceberg_spark.plans import graph_communities as gc

    rows = SPECS["graph_modularity"].builder(spark, sf_smoke).collect()
    assert len(rows) == 1
    r = rows[0]
    con = duckdb.connect()
    pairs = con.execute(
        f"""
        WITH it AS (SELECT DISTINCT l_orderkey, l_partkey
                    FROM read_parquet('{sf_smoke}/lineitem.parquet'))
        SELECT a.l_partkey, b.l_partkey
        FROM it a JOIN it b ON a.l_orderkey = b.l_orderkey
         AND a.l_partkey < b.l_partkey
        """
    ).fetchall()
    cnt = Counter(pairs)
    edges = [e for e, c in cnt.items() if c >= gc.LPA_SUPPORT]
    nodes = {n for e in edges for n in e}
    lbl = {n: n for n in nodes}
    adj: dict = {n: set() for n in nodes}
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    for _ in range(gc.LPA_ROUNDS):
        lbl = {
            n: min([lbl[n]] + [lbl[x] for x in adj[n]]) for n in nodes
        }
    m = len(edges)
    deg = {n: len(adj[n]) for n in nodes}
    e_c: Counter = Counter()
    d_c: Counter = Counter()
    for a, b in edges:
        if lbl[a] == lbl[b]:
            e_c[lbl[a]] += 1
    for n in nodes:
        d_c[lbl[n]] += deg[n]
    comms = set(lbl.values())
    q = sum(
        e_c[c] / m - (d_c[c] / (2 * m)) ** 2 for c in comms
    )
    assert r["n_edges"] == m
    assert r["n_nodes"] == len(nodes)
    assert r["n_communities"] == len(comms)
    assert abs(r["modularity"] - round(q, 4)) <= 1e-4
    # LPA's fixpoint is connected components, where e_c = m_c and
    # d_c = 2*m_c give Q = 1 - sum((m_c/m)^2) >= 0 — exactly 0 when a
    # single component swallows the graph (the sf0.001 case)
    assert r["modularity"] >= 0


# -- sim_hard_negatives ----------------------------------------------------


def test_hard_negatives_match_numpy(spark, sf_smoke):
    import numpy as np

    from target_iceberg_spark.plans import similarity_mining as sm

    rows = [
        (r["probe_id"], r["vec_id"], r["neg_label"], r["cos_sim"])
        for r in SPECS["sim_hard_negatives"].builder(spark, sf_smoke).collect()
    ]
    con = duckdb.connect()
    data = con.execute(
        f"SELECT vec_id, label, embedding FROM "
        f"read_parquet('{sf_smoke}/embeddings.parquet') ORDER BY vec_id"
    ).fetchall()
    vecs = {k: np.array(v, dtype=np.float64) for k, _, v in data}
    labels = {k: lb for k, lb, _ in data}
    want = []
    for pid in sorted(k for k in vecs if k < sm.HN_PROBES):
        p = vecs[pid]
        scored = []
        for k, v in vecs.items():
            if k < sm.HN_PROBES or labels[k] == labels[pid]:
                continue
            cs = float(v @ p) / math.sqrt(float(v @ v) * float(p @ p))
            scored.append((round(cs, 6), k))
        scored.sort(key=lambda t: (-t[0], t[1]))
        want.extend(
            (pid, k, labels[k], cs) for cs, k in scored[: sm.HN_K]
        )
    assert len(rows) == len(want)
    for got, exp in zip(rows, want):
        assert got[:3] == exp[:3]
        assert abs(got[3] - exp[3]) <= 2e-6  # fold-order ulp wiggle
    # every mined negative must be labeled differently from its anchor
    for pid, _vid, neg_label, _cs in rows:
        assert neg_label != labels[pid]


# -- events_cohort_ltv -----------------------------------------------------


def test_cohort_ltv_matches_pure_python(spark, sf_smoke):
    from datetime import timedelta

    rows = [
        (
            r["cohort_week"],
            r["age_week"],
            r["cohort_users"],
            r["n_active"],
            r["retention"],
            r["ltv_per_user"],
        )
        for r in SPECS["events_cohort_ltv"].builder(spark, sf_smoke).collect()
    ]
    con = duckdb.connect()
    data = con.execute(
        f"SELECT user_id, ts, value FROM "
        f"read_parquet('{sf_smoke}/events.parquet')"
    ).fetchall()

    def week_of(ts):
        d = ts.date() - timedelta(days=ts.weekday())
        import datetime as dt

        return dt.datetime(d.year, d.month, d.day)

    firsts: dict = {}
    for u, ts, _v in data:
        if u not in firsts or ts < firsts[u]:
            firsts[u] = ts
    cohort = {u: week_of(ts) for u, ts in firsts.items()}
    sizes = Counter(cohort.values())
    cells: dict = {}
    for u, ts, v in data:
        cw = cohort[u]
        age = (week_of(ts) - cw).days // 7
        users, vsum = cells.setdefault((cw, age), (set(), [0.0]))
        users.add(u)
        vsum[0] += v
    want = []
    for cw in sorted(sizes):
        cum = 0.0
        ages = sorted(a for c, a in cells if c == cw)
        for age in ages:
            users, vsum = cells[(cw, age)]
            cum += vsum[0]
            want.append(
                (
                    cw,
                    age,
                    sizes[cw],
                    len(users),
                    round(len(users) / sizes[cw], 4),
                    round(cum / sizes[cw], 4),
                )
            )
    assert len(rows) == len(want)
    for got, exp in zip(rows, want):
        assert got[:4] == exp[:4]
        assert abs(got[4] - exp[4]) <= 1e-4
        assert abs(got[5] - exp[5]) <= 1e-3  # double-sum order wiggle
    # retention must start at 1.0 for age 0 of every cohort
    for cw, age, _cu, _na, ret, _ltv in rows:
        if age == 0:
            assert ret == 1.0


# -- curation_pii_audit ----------------------------------------------------


def test_pii_audit_matches_planted_truth(spark, sf_smoke):
    """The injection schedule IS the ground truth: recount expected
    emails/phones/IPs per source straight from doc_id arithmetic and
    require the regex detector to find exactly those (the synthetic
    corpus is lowercase word salad with no organic matches)."""
    from target_iceberg_spark.plans import curation_pii as cp

    rows = {
        r["source"]: r
        for r in SPECS["curation_pii_audit"].builder(spark, sf_smoke).collect()
    }
    con = duckdb.connect()
    docs = con.execute(
        f"SELECT doc_id, source FROM "
        f"read_parquet('{sf_smoke}/documents.parquet')"
    ).fetchall()
    per_source: dict = {}
    for doc_id, source in docs:
        e = doc_id % cp.PII_EMAIL_MOD == 0
        p = doc_id % cp.PII_PHONE_MOD == 0
        i = doc_id % cp.PII_IP_MOD == 0
        n, w, ne, np_, ni = per_source.get(source, (0, 0, 0, 0, 0))
        per_source[source] = (
            n + 1,
            w + (1 if e or p or i else 0),
            ne + e,
            np_ + p,
            ni + i,
        )
    assert set(rows) == set(per_source)
    for source, (n, w, ne, np_, ni) in per_source.items():
        r = rows[source]
        assert r["n_docs"] == n
        assert r["docs_with_pii"] == w
        assert r["n_emails"] == ne
        assert r["n_phones"] == np_
        assert r["n_ips"] == ni
        assert abs(r["pii_rate"] - round(w / n, 4)) <= 1e-4
        assert r["pii_rate"] > 0  # schedule plants into every source
    # corpus-wide the schedule flags ~54% (1 - 2/3*4/5*6/7), never all
    tot_docs = sum(n for n, *_ in per_source.values())
    tot_pii = sum(w for _, w, *_ in per_source.values())
    assert 0 < tot_pii < tot_docs


# -- profile_zorder_clustering ---------------------------------------------


def test_zorder_tightens_both_dimensions(spark, sf_smoke):
    """Recompute both layouts' per-file spans in pure python (manual
    bit interleave) and pin the audit's POINT: z-order keeps both
    dimensions' spans far below the date-sort layout's full-width
    customer span."""
    from target_iceberg_spark.plans import profiling_layout as pl

    rows = {
        r["layout"]: r
        for r in SPECS["profile_zorder_clustering"]
        .builder(spark, sf_smoke)
        .collect()
    }
    assert set(rows) == {"zorder", "bydate"}
    con = duckdb.connect()
    data = con.execute(
        f"SELECT o_custkey, o_orderdate FROM "
        f"read_parquet('{sf_smoke}/orders.parquet')"
    ).fetchall()
    min_ck = min(k for k, _ in data)
    max_ck = max(k for k, _ in data)
    min_d = min(d for _, d in data)
    max_d = max(d for _, d in data)
    dom = 1 << pl.Z_BITS
    pts = []
    for ck, d in data:
        x = math.floor((ck - min_ck) * (dom - 1) / (max_ck - min_ck))
        y = math.floor(
            (d - min_d).days * (dom - 1) / (max_d - min_d).days
        )
        z = 0
        for i in range(pl.Z_BITS):
            z += ((x >> i) & 1) << (2 * i)
            z += ((y >> i) & 1) << (2 * i + 1)
        pts.append((x, y, z))
    for layout, key in (
        ("zorder", lambda p: p[2] >> (2 * pl.Z_BITS - pl.Z_FILE_BITS)),
        ("bydate", lambda p: p[1] >> (pl.Z_BITS - pl.Z_FILE_BITS)),
    ):
        files: dict = {}
        for p in pts:
            files.setdefault(key(p), []).append(p)
        ck_spans = [
            (max(x for x, _, _ in v) - min(x for x, _, _ in v) + 1) / dom
            for v in files.values()
        ]
        d_spans = [
            (max(y for _, y, _ in v) - min(y for _, y, _ in v) + 1) / dom
            for v in files.values()
        ]
        r = rows[layout]
        assert r["n_files"] == len(files)
        assert abs(r["avg_custkey_span"] - round(sum(ck_spans) / len(ck_spans), 6)) <= 1e-6
        assert abs(r["avg_date_span"] - round(sum(d_spans) / len(d_spans), 6)) <= 1e-6
    # the layout decision the audit exists to inform:
    assert (
        rows["zorder"]["avg_custkey_span"]
        < 0.5 * rows["bydate"]["avg_custkey_span"]
    )
    assert rows["bydate"]["avg_date_span"] < rows["zorder"]["avg_date_span"]


# -- text_winnowing --------------------------------------------------------


def test_winnowing_matches_pure_python(spark, sf_smoke):
    """Re-run the Schleimer/Schmidt/Aiken selection in pure python
    (hashlib 5-gram digests, per-window min, df cap, pair counts)."""
    from target_iceberg_spark.plans import text_winnowing as tw

    rows = [
        (r["doc_a"], r["doc_b"], r["n_shared"])
        for r in SPECS["text_winnowing"].builder(spark, sf_smoke).collect()
    ]
    con = duckdb.connect()
    docs = con.execute(
        f"SELECT doc_id, lower(text) FROM "
        f"read_parquet('{sf_smoke}/documents.parquet')"
    ).fetchall()
    fps: dict = {}
    for doc_id, text in docs:
        toks = text.split(" ")
        hs = [
            hashlib.md5(
                " ".join(toks[i : i + tw.WIN_K]).encode()
            ).hexdigest()
            for i in range(len(toks) - tw.WIN_K + 1)
        ]
        sel = {
            min(hs[i : i + tw.WIN_W])
            for i in range(len(hs) - tw.WIN_W + 1)
        }
        if sel:
            fps[doc_id] = sel
    df: Counter = Counter()
    for sel in fps.values():
        df.update(sel)
    keep = {h for h, c in df.items() if 2 <= c <= tw.WIN_DF_CAP}
    pair_counts: Counter = Counter()
    by_hash: dict = {}
    for doc_id, sel in fps.items():
        for h in sel & keep:
            by_hash.setdefault(h, []).append(doc_id)
    for h, ids in by_hash.items():
        ids.sort()
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                pair_counts[(ids[i], ids[j])] += 1
    want = sorted(
        (a, b, c)
        for (a, b), c in pair_counts.items()
        if c >= tw.WIN_MIN_SHARED
    )
    assert rows == want
    assert rows  # the fixture's planted near-dups must surface


# -- sample_fixed_k --------------------------------------------------------


def test_fixed_k_sample_matches_hashlib(spark, sf_smoke):
    """The md5-priority sample is a pure function of the data: re-rank
    every group with hashlib and require the EXACT same k rows — this
    also proves the scale prefilter never drops a selected row."""
    from target_iceberg_spark.plans import sampling_fixed as sf_

    rows = [
        (r["c_mktsegment"], r["rk"], r["c_custkey"], r["c_acctbal"])
        for r in SPECS["sample_fixed_k"].builder(spark, sf_smoke).collect()
    ]
    con = duckdb.connect()
    custs = con.execute(
        f"SELECT c_custkey, c_mktsegment, c_acctbal FROM "
        f"read_parquet('{sf_smoke}/customer.parquet')"
    ).fetchall()
    by_seg: dict = {}
    for k, seg, bal in custs:
        hv = int(hashlib.md5(str(k).encode()).hexdigest()[:8], 16)
        by_seg.setdefault(seg, []).append((hv, k, bal))
    want = []
    for seg in sorted(by_seg):
        members = sorted(by_seg[seg])
        for rk, (_hv, k, bal) in enumerate(members[: sf_.SAMPLE_K], 1):
            want.append((seg, rk, k, bal))
    assert rows == want
    # groups smaller than k must be returned whole, never padded
    for seg, members in by_seg.items():
        got_n = sum(1 for s, *_ in rows if s == seg)
        assert got_n == min(len(members), sf_.SAMPLE_K)


# -- events_decay_features -------------------------------------------------


def test_decay_features_match_pure_python(spark, sf_smoke):
    from target_iceberg_spark.plans import features_decay as fd

    rows = {
        r["user_id"]: r
        for r in SPECS["events_decay_features"].builder(spark, sf_smoke).collect()
    }
    con = duckdb.connect()
    data = con.execute(
        f"SELECT user_id, ts, value FROM "
        f"read_parquet('{sf_smoke}/events.parquet')"
    ).fetchall()
    t_ref = max(ts for _, ts, _ in data)
    per_user: dict = {}
    for u, ts, v in data:
        age_d = (int(t_ref.timestamp()) - int(ts.timestamp())) / 86400.0
        n, dc, dv, mn = per_user.get(u, (0, 0.0, 0.0, math.inf))
        w = math.exp(-fd._LAMBDA * age_d)
        per_user[u] = (n + 1, dc + w, dv + v * w, min(mn, age_d))
    assert set(rows) == set(per_user)
    for u, (n, dc, dv, mn) in per_user.items():
        r = rows[u]
        assert r["n_events"] == n
        assert abs(r["decayed_count"] - dc) < 1e-3
        assert abs(r["decayed_value"] - dv) < 1e-2
        assert abs(r["last_seen_days"] - mn) < 1e-3
        # decay must actually discount: decayed_count < raw count
        assert r["decayed_count"] < n


# -- curation_ipf_raking ---------------------------------------------------


def test_ipf_raking_matches_pure_python(spark, sf_smoke):
    """Re-run the alternating Deming-Stephan scaling in pure python
    and verify both the weights and the raking POINT: after the
    final source step, weighted source marginals match the target
    exactly, and lang marginals are near-target."""
    from target_iceberg_spark.plans import curation_raking as cr

    rows = {
        (r["lang"], r["source"]): r
        for r in SPECS["curation_ipf_raking"].builder(spark, sf_smoke).collect()
    }
    con = duckdb.connect()
    data = con.execute(
        f"SELECT lang, source, COUNT(*) FROM "
        f"read_parquet('{sf_smoke}/documents.parquet') GROUP BY 1, 2"
    ).fetchall()
    cells = {(lg, s): float(c) for lg, s, c in data}
    langs = sorted({lg for lg, _ in cells})
    sources = sorted({s for _, s in cells})
    total = sum(cells.values())
    t_lang = total / len(langs)
    t_source = total / len(sources)
    w = {k: 1.0 for k in cells}
    for _ in range(cr.IPF_ROUNDS):
        for lg in langs:
            s_l = sum(w[k] * cells[k] for k in cells if k[0] == lg)
            for k in cells:
                if k[0] == lg:
                    w[k] = w[k] * t_lang / s_l
        for s in sources:
            s_s = sum(w[k] * cells[k] for k in cells if k[1] == s)
            for k in cells:
                if k[1] == s:
                    w[k] = w[k] * t_source / s_s
    assert set(rows) == set(cells)
    for k, wk in w.items():
        r = rows[k]
        assert r["n_docs"] == int(cells[k])
        assert abs(r["weight"] - round(wk, 6)) <= 1e-6
        assert abs(r["expected_docs"] - round(wk * cells[k], 2)) <= 0.011
    # after the closing source step, source marginals are EXACT
    for s in sources:
        m = sum(w[k] * cells[k] for k in cells if k[1] == s)
        assert abs(m - t_source) < 1e-6
    # lang marginals have converged to within 2% of target
    for lg in langs:
        m = sum(w[k] * cells[k] for k in cells if k[0] == lg)
        assert abs(m - t_lang) / t_lang < 0.02


# -- sim_ndcg_audit --------------------------------------------------------


def test_ndcg_matches_numpy(spark, sf_smoke):
    import numpy as np

    from target_iceberg_spark.plans import similarity_eval as se

    rows = {
        r["probe_id"]: r
        for r in SPECS["sim_ndcg_audit"].builder(spark, sf_smoke).collect()
    }
    con = duckdb.connect()
    data = con.execute(
        f"SELECT vec_id, label, embedding FROM "
        f"read_parquet('{sf_smoke}/embeddings.parquet') ORDER BY vec_id"
    ).fetchall()
    vecs = {k: np.array(v, dtype=np.float64) for k, _, v in data}
    labels = {k: lb for k, lb, _ in data}
    for pid in sorted(k for k in vecs if k < se.NDCG_PROBES):
        p = vecs[pid]
        scored = sorted(
            (
                -round(
                    float(v @ p)
                    / math.sqrt(float(v @ v) * float(p @ p)),
                    6,
                ),
                k,
            )
            for k, v in vecs.items()
            if k >= se.NDCG_PROBES
        )
        n_rel = sum(
            1
            for k in vecs
            if k >= se.NDCG_PROBES and labels[k] == labels[pid]
        )
        topk = scored[: se.NDCG_K]
        dcg = sum(
            1.0 / math.log2(i + 2)
            for i, (_, k) in enumerate(topk)
            if labels[k] == labels[pid]
        )
        idcg = sum(
            1.0 / math.log2(i + 2)
            for i in range(min(n_rel, se.NDCG_K))
        )
        r = rows[pid]
        assert r["n_rel"] == n_rel
        assert abs(r["dcg"] - dcg) < 1e-5
        assert abs(r["idcg"] - idcg) < 1e-5
        assert abs(r["ndcg"] - dcg / idcg) < 1e-5
        assert 0.0 <= r["ndcg"] <= 1.0


# -- multimodal_phash_neardup ----------------------------------------------


def test_phash_neardup_matches_pure_python(spark, sf_smoke):
    """Recompute every aHash signature and the banded candidate/verify
    chain in pure python over the raw utf-8 payloads — pins the block
    thresholding, the band keys, and the pigeonhole guarantee (a
    brute-force Hamming scan finds NO pair the bands missed)."""
    from target_iceberg_spark.plans import multimodal_phash as mp

    rows = [
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in SPECS["multimodal_phash_neardup"]
        .builder(spark, sf_smoke)
        .collect()
    ]
    con = duckdb.connect()
    docs = con.execute(
        f"SELECT doc_id, text FROM "
        f"read_parquet('{sf_smoke}/documents.parquet') "
        f"WHERE n_chars >= {mp.PH_MIN_BYTES}"
    ).fetchall()
    sigs = {}
    for doc_id, text in docs:
        raw = text.encode("utf-8")
        blocks = [
            sum(raw[j * mp.PH_BLOCK_BYTES : (j + 1) * mp.PH_BLOCK_BYTES])
            for j in range(mp.PH_BLOCKS)
        ]
        tot = sum(blocks)
        sigs[doc_id] = sum(
            1 << j
            for j, b in enumerate(blocks)
            if mp.PH_BLOCKS * b > tot
        )
    ids = sorted(sigs)
    want = []
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            ham = bin(sigs[a] ^ sigs[b]).count("1")
            if ham <= mp.PH_HAM_MAX:
                want.append((a, b, ham))
    # brute force == banded: the pigeonhole blocking must miss nothing
    assert rows == want
    assert rows  # planted near-dups must collide perceptually


# -- sim_hamming_fidelity --------------------------------------------------


def test_hamming_fidelity_matches_numpy(spark, sf_smoke):
    """Recompute both arms with numpy/pure python: pack sign bits,
    Hamming-rank, cosine-rank, and verify the overlap the audit
    reports — plus the arm's usefulness floor (the shortlist must
    catch at least half the exact top-k on this corpus)."""
    import numpy as np

    from target_iceberg_spark.plans import similarity_binary as sb

    rows = SPECS["sim_hamming_fidelity"].builder(spark, sf_smoke).collect()
    assert len(rows) == 1
    r = rows[0]
    con = duckdb.connect()
    data = con.execute(
        f"SELECT vec_id, embedding FROM "
        f"read_parquet('{sf_smoke}/embeddings.parquet') ORDER BY vec_id"
    ).fetchall()
    vecs = {k: np.array(v, dtype=np.float64) for k, v in data}
    p = vecs[sb.PROBE_VEC_ID]

    def sig(v):
        return tuple(1 if x >= 0 else 0 for x in v)

    ps = sig(p)
    ham_rank = sorted(
        (sum(a != b for a, b in zip(sig(v), ps)), k)
        for k, v in vecs.items()
        if k != sb.PROBE_VEC_ID
    )
    shortlist = {k for _, k in ham_rank[: sb.FID_CAND]}
    cos_rank = sorted(
        (
            -round(
                float(v @ p) / math.sqrt(float(v @ v) * float(p @ p)), 6
            ),
            k,
        )
        for k, v in vecs.items()
        if k != sb.PROBE_VEC_ID
    )
    exact_k = {k for _, k in cos_rank[: sb.TOP_K]}
    overlap = len(exact_k & shortlist)
    assert r["n_overlap"] == overlap
    assert r["k"] == sb.TOP_K and r["shortlist"] == sb.FID_CAND
    assert abs(r["recall_at_k"] - round(overlap / sb.TOP_K, 4)) <= 1e-4
    assert r["n_overlap"] >= sb.TOP_K // 2  # binary arm stays useful
