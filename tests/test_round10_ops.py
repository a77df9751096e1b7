"""Round-10 operator pins: IVFADC (sim_ann_ivfpq) recall + structure,
DSIR planted-target recovery."""

from __future__ import annotations

import pyspark.sql.functions as F

from target_iceberg_spark.functions.vectors import l2_dist
from target_iceberg_spark.plans.similarity import PROBE_VEC_ID, TOP_K
from target_iceberg_spark.plans.similarity_ivfpq import (
    IVFPQ_SHORTLIST,
    ivfpq_search,
)
from target_iceberg_spark.sources.tables import load_table


def _exact_l2_topk(spark, sf_dir, k=TOP_K):
    emb = load_table(spark, sf_dir, "embeddings")
    probe = emb.where(F.col("vec_id") == PROBE_VEC_ID).select(
        F.col("embedding").alias("p")
    )
    return (
        emb.where(F.col("vec_id") != PROBE_VEC_ID)
        .crossJoin(F.broadcast(probe))
        .select("vec_id", l2_dist("embedding", "p").alias("d"))
        .orderBy("d", "vec_id")
        .limit(k)
    )


def test_ivfpq_recall_floor(spark, sf_oracle):
    """The composed IVF+PQ arm meets the same 0.8 recall@10 floor the
    three parent arms pin (sim_ann_quality's hashed contract)."""
    got = {r["vec_id"] for r in ivfpq_search(spark, sf_oracle).collect()}
    exact = {r["vec_id"] for r in _exact_l2_topk(spark, sf_oracle).collect()}
    assert len(got) == TOP_K
    recall = len(got & exact) / TOP_K
    assert recall >= 0.8, f"IVFADC recall@{TOP_K} = {recall}"


def test_ivfpq_more_probes_not_worse(spark, sf_oracle):
    """Probing every coarse cluster turns routing exhaustive: recall
    can only be limited by the PQ shortlist, so the all-clusters run
    must recall at least as much as the serving nprobe=8 run."""
    exact = {r["vec_id"] for r in _exact_l2_topk(spark, sf_oracle).collect()}
    r8 = {
        r["vec_id"]
        for r in ivfpq_search(spark, sf_oracle, nprobe=8).collect()
    }
    r16 = {
        r["vec_id"]
        for r in ivfpq_search(spark, sf_oracle, nprobe=16).collect()
    }
    assert len(r16 & exact) >= len(r8 & exact)


def test_ivfpq_result_within_probed_clusters(spark, sf_oracle):
    """Structure pin: every returned id must come from a probed
    posting list (routing prunes, never rescues), and the result is
    exactly the exact-L2 top-k of the ADC shortlist."""
    import os

    import numpy as np

    from target_iceberg_spark.operators.ivf import (
        build_or_load_ivf,
        index_cache_path,
    )
    from target_iceberg_spark.plans.similarity_ivfpq import IVFPQ_NPROBE

    emb = load_table(spark, sf_oracle, "embeddings")
    source = os.path.join(sf_oracle, "embeddings.parquet")
    index = build_or_load_ivf(
        spark,
        emb,
        index_cache_path(source, "embedding", 16, 42),
        k=16,
        seed=42,
        source=source,
    )
    probe = np.asarray(
        emb.where(F.col("vec_id") == PROBE_VEC_ID).collect()[0]["embedding"]
    )
    dists = np.linalg.norm(index.centroids - probe, axis=1)
    probed = {int(c) for c in np.argsort(dists)[:IVFPQ_NPROBE]}
    member = {
        r["vec_id"]: r["cluster"]
        for r in index.postings.select("vec_id", "cluster").collect()
    }
    got = [r["vec_id"] for r in ivfpq_search(spark, sf_oracle).collect()]
    assert got, "empty IVFADC result"
    for vid in got:
        assert member[vid] in probed, (
            f"vec {vid} from unprobed cluster {member[vid]}"
        )
    assert IVFPQ_SHORTLIST >= len(got)


def test_dsir_recovers_planted_target(spark):
    """DSIR must recover a planted target distribution: raw docs
    written in the target's vocabulary outscore (and are selected
    over) raw docs from a disjoint vocabulary."""
    import pyspark.sql.functions as F

    from target_iceberg_spark.plans.curation_dsir import dsir_select

    vocab_a = ["alpha", "beta", "gamma", "delta", "epsilon"]
    vocab_b = ["zeta", "eta", "theta", "iota", "kappa"]

    def doc(words, i, n=30):
        return " ".join(words[(i + j) % len(words)] for j in range(n))

    rows = []
    for i in range(5):  # target: vocab A
        rows.append((i, "target", doc(vocab_a, i)))
    for i in range(10):  # raw pool, target-like
        rows.append((100 + i, "poolA", doc(vocab_a, i + 1)))
    for i in range(40):  # raw pool, off-target
        rows.append((200 + i, "poolB", doc(vocab_b, i)))
    docs = spark.createDataFrame(
        rows, "doc_id long, source string, text string"
    )
    got = dsir_select(
        docs, F.col("source") == "target", k=10
    ).collect()
    assert len(got) == 10
    from_a = [r for r in got if r["source"] == "poolA"]
    assert len(from_a) >= 8, (
        f"planted target not recovered: {[r['source'] for r in got]}"
    )
    # every target-vocab doc outweighs every off-target doc
    wa = min(r["logw"] for r in got if r["source"] == "poolA")
    wb = [r["logw"] for r in got if r["source"] == "poolB"]
    assert all(wa > w for w in wb) or not wb


# ---------------------------------------------------------------------------
# Round-10 stats tier: independent NumPy/pure-Python re-derivations
# (the DuckDB oracle is checked separately by test_oracle_parity.py;
# these pin the STATISTIC against a from-scratch implementation so a
# shared plan/oracle mistake cannot self-confirm).
# ---------------------------------------------------------------------------


def _events_pdf(sf_oracle):
    import duckdb

    return duckdb.connect().execute(
        f"SELECT event_type, value, event_id FROM '{sf_oracle}/events.parquet'"
    ).df()


def test_chi2_independence_matches_numpy(spark, sf_oracle):
    import numpy as np

    from target_iceberg_spark.plans.registry import all_specs
    from target_iceberg_spark.plans.stats_contingency import CHI2_SPLIT

    row = all_specs()["agg_chi2_independence"].builder(spark, sf_oracle).collect()[0]
    pdf = _events_pdf(sf_oracle)
    pdf["hi"] = (pdf["value"] >= CHI2_SPLIT).astype(int)
    obs = pdf.groupby(["event_type", "hi"]).size().unstack(fill_value=0).to_numpy()
    exp = obs.sum(1, keepdims=True) * obs.sum(0, keepdims=True) / obs.sum()
    chi2 = float(((obs - exp) ** 2 / exp).sum())
    assert row["dof"] == (obs.shape[0] - 1) * (obs.shape[1] - 1)
    assert abs(row["chi2"] - round(chi2, 6)) < 1e-4
    assert row["reject_independence"] == (row["chi2"] >= row["chi2_crit"])


def test_levene_bf_matches_numpy(spark, sf_oracle):
    import numpy as np

    from target_iceberg_spark.plans.registry import all_specs

    row = all_specs()["agg_levene_bf"].builder(spark, sf_oracle).collect()[0]
    pdf = _events_pdf(sf_oracle)
    groups = [
        np.abs(g["value"].to_numpy() - round(float(np.median(g["value"])), 6))
        for _, g in pdf.groupby("event_type")
    ]
    k = len(groups)
    n = sum(len(g) for g in groups)
    zbar = sum(g.sum() for g in groups) / n
    ssb = sum(len(g) * (g.mean() - zbar) ** 2 for g in groups)
    ssw = sum(((g - g.mean()) ** 2).sum() for g in groups)
    f = (ssb / (k - 1)) / (ssw / (n - k))
    assert row["dof_between"] == k - 1
    assert row["dof_within"] == n - k
    assert abs(row["f_stat"] - f) < 1e-4


def test_kendall_tau_matches_pure_python(spark, sf_oracle):
    import duckdb

    from target_iceberg_spark.plans.registry import all_specs
    from target_iceberg_spark.plans.stats_kendall import KENDALL_N

    row = all_specs()["agg_kendall_tau"].builder(spark, sf_oracle).collect()[0]
    samp = duckdb.connect().execute(
        f"""SELECT o_totalprice AS x,
                   CAST(date_diff('day', DATE '1970-01-01',
                                  CAST(o_orderdate AS DATE)) AS BIGINT) AS y
            FROM '{sf_oracle}/orders.parquet'
            ORDER BY md5(CAST(o_orderkey AS VARCHAR)), o_orderkey
            LIMIT {KENDALL_N}"""
    ).fetchall()
    c = d = tx = ty = 0
    for i in range(len(samp)):
        for j in range(i + 1, len(samp)):
            dx = (samp[i][0] > samp[j][0]) - (samp[i][0] < samp[j][0])
            dy = (samp[i][1] > samp[j][1]) - (samp[i][1] < samp[j][1])
            if dx == 0:
                tx += 1
            if dy == 0:
                ty += 1
            if dx * dy == 1:
                c += 1
            elif dx * dy == -1:
                d += 1
    n0 = len(samp) * (len(samp) - 1) // 2
    tau = (c - d) / ((n0 - tx) * (n0 - ty)) ** 0.5
    assert row["pairs"] == n0
    assert (row["concordant"], row["discordant"]) == (c, d)
    assert abs(row["tau_b"] - tau) < 1e-5
    assert -1.0 <= row["tau_b"] <= 1.0


def test_median_order_ci_brackets_and_ranks(spark, sf_oracle):
    import numpy as np

    from target_iceberg_spark.plans.registry import all_specs
    from target_iceberg_spark.plans.stats_order_ci import Z95

    rows = all_specs()["agg_median_order_ci"].builder(spark, sf_oracle).collect()
    pdf = _events_pdf(sf_oracle)
    assert len(rows) == pdf["event_type"].nunique()
    for r in rows:
        vals = np.sort(
            pdf.loc[pdf["event_type"] == r["event_type"], "value"].to_numpy()
        )
        n = len(vals)
        lo = max(int(np.floor((n - Z95 * np.sqrt(n)) / 2)), 1)
        hi = min(int(np.ceil(1 + (n + Z95 * np.sqrt(n)) / 2)), n)
        med = int(np.ceil(n / 2))
        assert r["n"] == n
        assert abs(r["ci_lo"] - round(float(vals[lo - 1]), 6)) < 1e-9
        assert abs(r["ci_hi"] - round(float(vals[hi - 1]), 6)) < 1e-9
        assert abs(r["median_os"] - round(float(vals[med - 1]), 6)) < 1e-9
        assert r["ci_lo"] <= r["median_os"] <= r["ci_hi"]


def test_countmin_contracts_and_exactness(spark, sf_oracle):
    """CM contracts from an independent dict-based sketch build."""
    import duckdb

    from target_iceberg_spark.plans.registry import all_specs
    from target_iceberg_spark.plans.sketches_cm import CM_D, CM_TOP, CM_W

    rows = all_specs()["agg_countmin_sketch"].builder(spark, sf_oracle).collect()
    assert len(rows) == CM_TOP
    import hashlib
    from collections import Counter

    uids = [
        r[0]
        for r in duckdb.connect()
        .execute(f"SELECT user_id FROM '{sf_oracle}/events.parquet'")
        .fetchall()
    ]
    sketch = Counter()
    for u in uids:
        for s in range(CM_D):
            h = int(hashlib.md5(f"{s}:{u}".encode()).hexdigest()[:8], 16) % CM_W
            sketch[(s, h)] += 1
    exact = Counter(uids)
    for r in rows:
        u = r["user_id"]
        est = min(
            sketch[
                (s, int(hashlib.md5(f"{s}:{u}".encode()).hexdigest()[:8], 16) % CM_W)
            ]
            for s in range(CM_D)
        )
        assert r["exact_cnt"] == exact[u]
        assert r["cm_est"] == est
        assert r["no_underestimate"] and r["cm_est"] >= r["exact_cnt"]


def test_changepoint_matches_numpy_scan(spark, sf_oracle):
    import duckdb
    import numpy as np

    from target_iceberg_spark.plans.registry import all_specs

    row = all_specs()["events_changepoint"].builder(spark, sf_oracle).collect()[0]
    daily = duckdb.connect().execute(
        f"""SELECT CAST(ts AS DATE) AS day, ROUND(AVG(value), 6) AS x
            FROM '{sf_oracle}/events.parquet' GROUP BY 1 ORDER BY day"""
    ).fetchall()
    x = np.array([d[1] for d in daily])
    tt = len(x)
    best = None
    for t in range(1, tt):
        sse = ((x[:t] - x[:t].mean()) ** 2).sum() + ((x[t:] - x[t:].mean()) ** 2).sum()
        if best is None or sse < best[1] - 1e-9:
            best = (t, sse)
    assert row["split_t"] == best[0]
    assert row["n_days"] == tt
    assert abs(row["cost"] - best[1]) < 1e-3
    total = ((x - x.mean()) ** 2).sum()
    assert abs(row["var_reduction"] - (1 - best[1] / total)) < 1e-4


def test_neighbor_jaccard_is_valid_and_unlinked(spark, sf_oracle):
    from target_iceberg_spark.plans.graph_edges import copurchase_edges
    from target_iceberg_spark.plans.graph_jaccard import NJ_SUPPORT, NJ_TOP
    from target_iceberg_spark.plans.registry import all_specs

    rows = all_specs()["graph_neighbor_jaccard"].builder(spark, sf_oracle).collect()
    assert 0 < len(rows) <= NJ_TOP
    edges = {
        (r["pa"], r["pb"])
        for r in copurchase_edges(spark, sf_oracle, support=NJ_SUPPORT).collect()
    }
    jac = [r["jaccard"] for r in rows]
    assert jac == sorted(jac, reverse=True)
    for r in rows:
        assert (r["part_a"], r["part_b"]) not in edges
        assert 0.0 < r["jaccard"] <= 1.0
        assert r["common_nbrs"] <= r["union_nbrs"]


def test_kneser_ney_beats_unsmoothed_on_probability_mass(spark, sf_oracle):
    """Model sanity: every scored bigram probability is in (0,1], and
    the discounted+backoff mass for a seen bigram is strictly positive
    (the KN log argument can never hit zero on same-corpus scoring)."""
    from target_iceberg_spark.plans.registry import all_specs

    rows = all_specs()["text_kneser_ney"].builder(spark, sf_oracle).collect()
    assert len(rows) >= 2
    for r in rows:
        assert r["n_docs"] > 0 and r["n_bigrams"] >= r["n_docs"]
        # mean -ln P > 0 <=> all P < 1 on average; finite => P > 0
        assert 0.0 < r["mean_kn_cross_entropy"] < 50.0


def test_kneser_ney_matches_pure_python(spark, sf_oracle):
    """Statistic pin: recompute interpolated-KN per-source cross
    entropy from scratch in Python (dict counts) and compare."""
    import duckdb
    from collections import Counter, defaultdict

    from target_iceberg_spark.plans.registry import all_specs
    from target_iceberg_spark.plans.text_kneser_ney import KN_D
    import math

    rows = {
        r["source"]: r
        for r in all_specs()["text_kneser_ney"].builder(spark, sf_oracle).collect()
    }
    docs = duckdb.connect().execute(
        f"SELECT doc_id, source, lower(text) FROM '{sf_oracle}/documents.parquet'"
    ).fetchall()
    c12, per_doc_bgs = Counter(), {}
    for doc_id, source, text in docs:
        t = text.split(" ")
        bgs = [(t[i], t[i + 1]) for i in range(len(t) - 1)]
        per_doc_bgs[(doc_id, source)] = bgs
        c12.update(bgs)
    c1, fwd, bwd = Counter(), Counter(), Counter()
    for (w1, w2), c in c12.items():
        c1[w1] += c
        fwd[w1] += 1
        bwd[w2] += 1
    n_types = len(c12)
    ces = defaultdict(list)
    for (doc_id, source), bgs in per_doc_bgs.items():
        if not bgs:
            continue
        nll = [
            -math.log(
                max(c12[b] - KN_D, 0) / c1[b[0]]
                + KN_D * fwd[b[0]] / c1[b[0]] * bwd[b[1]] / n_types
            )
            for b in bgs
        ]
        ces[source].append(sum(nll) / len(nll))
    for source, ce_list in ces.items():
        assert rows[source]["n_docs"] == len(ce_list)
        assert abs(rows[source]["mean_kn_cross_entropy"] - sum(ce_list) / len(ce_list)) < 1e-3


def test_nb_langid_confusion_is_doc_complete(spark, sf_oracle):
    """Every doc lands in exactly one confusion cell. (The fixture's
    lang column is independent of its text — all tokens occur in all
    languages — so NO classifier can beat the prior here; separating
    power is pinned on the planted corpus below.)"""
    import duckdb

    from target_iceberg_spark.plans.registry import all_specs

    rows = all_specs()["text_nb_langid"].builder(spark, sf_oracle).collect()
    n_docs = duckdb.connect().execute(
        f"SELECT COUNT(*) FROM '{sf_oracle}/documents.parquet'"
    ).fetchone()[0]
    assert sum(r["n"] for r in rows) == n_docs


def test_nb_separates_planted_languages(spark):
    """Algorithm pin: on a corpus whose two languages have disjoint
    vocabulary (plus shared stopwords), the same NB plan must produce
    a perfect diagonal — and a doc of mixed tokens goes to the class
    contributing more of them."""
    from target_iceberg_spark.plans.text_nb_classifier import nb_confusion

    rows = []
    for i in range(20):
        rows.append((i, "aa", "alpha beta gamma the of alpha beta"))
    for i in range(20, 40):
        rows.append((i, "bb", "uno dos tres the of uno dos"))
    # mixed doc: 3 aa-tokens vs 1 bb-token => predicted aa
    rows.append((40, "bb", "alpha beta gamma uno"))
    docs = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    out = {
        (r["true_lang"], r["pred_lang"]): r["n"]
        for r in nb_confusion(docs).collect()
    }
    assert out[("aa", "aa")] == 20
    assert out[("bb", "bb")] == 20
    assert out[("bb", "aa")] == 1  # the planted mixed doc


def test_whitening_identity_contract(spark, sf_oracle):
    """All audit booleans true, and the whitened scores really have
    ~unit variance when recomputed via numpy on the collected corpus."""
    import numpy as np

    from target_iceberg_spark.operators.pca import fit_pca
    from target_iceberg_spark.plans.registry import all_specs
    from target_iceberg_spark.sources.tables import load_table

    rows = all_specs()["emb_whitening"].builder(spark, sf_oracle).collect()
    assert all(
        r["unit_variance"] and r["centered"] and r["decorrelated"] for r in rows
    )
    emb = load_table(spark, sf_oracle, "embeddings")
    X = np.array(
        [r["embedding"] for r in emb.select("embedding").collect()], dtype=np.float64
    )
    mean, comps, eigs = fit_pca(emb, "embedding", k=2)
    Y = (X - np.asarray(mean)) @ np.asarray(comps).T / np.sqrt(np.asarray(eigs))
    assert np.allclose(Y.var(axis=0, ddof=1), 1.0, rtol=1e-3)
    assert abs(np.cov(Y.T, ddof=1)[0, 1]) < 1e-4


def test_compaction_plan_respects_target_and_conserves_bytes(spark, sf_oracle):
    """Every bin except a partition's last holds >= target bytes
    (next-fit never closes a bin early), no file is split, and total
    bytes across bins equals the inventory total."""
    import duckdb

    from target_iceberg_spark.plans.lakehouse_compaction import (
        ROW_BYTES,
        TARGET_BYTES,
    )
    from target_iceberg_spark.plans.registry import all_specs

    rows = all_specs()["lakehouse_compaction_plan"].builder(spark, sf_oracle).collect()
    total = sum(r["bin_bytes"] for r in rows)
    expect = duckdb.connect().execute(
        f"SELECT COUNT(*) * {ROW_BYTES} FROM '{sf_oracle}/orders.parquet'"
    ).fetchone()[0]
    assert total == expect
    from collections import defaultdict

    by_part = defaultdict(list)
    for r in rows:
        by_part[r["part"]].append(r)
    for part, bins in by_part.items():
        bins.sort(key=lambda r: r["bin"])
        assert [r["bin"] for r in bins] == list(range(len(bins)))
        for r in bins[:-1]:
            # interior bins overflow the target by design (next-fit
            # closes a bin only once the running sum crosses it)
            assert r["bin_bytes"] >= TARGET_BYTES


def test_semantic_order_is_cluster_contiguous_and_centroid_out(spark, sf_oracle):
    from target_iceberg_spark.plans.registry import all_specs

    rows = all_specs()["curation_semantic_order"].builder(spark, sf_oracle).collect()
    ranks = [r["curriculum_rank"] for r in rows]
    assert ranks == list(range(1, len(rows) + 1))
    # cluster ids never decrease along the curriculum; distance is
    # non-decreasing within a cluster (coherent-core-first)
    for a, b in zip(rows, rows[1:]):
        assert b["cluster"] >= a["cluster"]
        if b["cluster"] == a["cluster"]:
            assert b["dist2"] >= a["dist2"]
    # the centroid seed of the first cluster present sits at distance 0
    first = rows[0]
    assert first["dist2"] == 0.0 and first["vec_id"] == first["cluster"]


def test_equidepth_buckets_are_balanced_and_ordered(spark, sf_oracle):
    import duckdb

    from target_iceberg_spark.plans.profiling_equidepth import ED_B
    from target_iceberg_spark.plans.registry import all_specs

    rows = all_specs()["profile_equidepth_histogram"].builder(spark, sf_oracle).collect()
    assert [r["bucket"] for r in rows] == list(range(ED_B))
    n_total = duckdb.connect().execute(
        f"SELECT COUNT(*) FROM '{sf_oracle}/orders.parquet'"
    ).fetchone()[0]
    assert sum(r["n"] for r in rows) == n_total
    # equi-depth: every bucket within 2% of N/B (continuous values,
    # ties cannot pile up)
    for r in rows:
        assert abs(r["n"] - n_total / ED_B) <= 0.02 * n_total
    # ranges tile without overlap
    for a, b in zip(rows, rows[1:]):
        assert a["hi"] <= b["lo"]


def test_snaive_backtest_matches_pandas(spark, sf_oracle):
    import duckdb

    from target_iceberg_spark.plans.analytics_forecast import (
        SNAIVE_HOLDOUT,
        SNAIVE_SEASON,
    )
    from target_iceberg_spark.plans.registry import all_specs

    rows = {
        r["event_type"]: r
        for r in all_specs()["events_snaive_backtest"].builder(spark, sf_oracle).collect()
    }
    daily = duckdb.connect().execute(
        f"""SELECT event_type, CAST(ts AS DATE) d, ROUND(SUM(value),6) y
            FROM '{sf_oracle}/events.parquet' GROUP BY 1,2 ORDER BY 1,2"""
    ).df()
    for et, g in daily.groupby("event_type"):
        y = g["y"].tolist()
        days = g["d"].tolist()
        last = days[-1]
        errs = [
            (y[i], y[i - SNAIVE_SEASON])
            for i in range(SNAIVE_SEASON, len(y))
            if (last - days[i]).days < SNAIVE_HOLDOUT
        ]
        mae = sum(abs(a - b) for a, b in errs) / len(errs)
        mape = sum(abs(a - b) / abs(a) for a, b in errs) / len(errs)
        assert rows[et]["n_days"] == len(errs)
        assert abs(rows[et]["mae"] - mae) < 1e-5
        assert abs(rows[et]["mape"] - mape) < 1e-5


def test_dataset_card_is_single_pass_consistent(spark, sf_oracle):
    import duckdb

    from target_iceberg_spark.plans.registry import all_specs

    rows = all_specs()["curation_dataset_card"].builder(spark, sf_oracle).collect()
    con = duckdb.connect()
    truth = {
        r[0]: r
        for r in con.execute(
            f"""SELECT source, COUNT(*), SUM(len(string_split(lower(text),' '))),
                       COUNT(DISTINCT lang), COUNT(DISTINCT md5(text))
                FROM '{sf_oracle}/documents.parquet' GROUP BY source"""
        ).fetchall()
    }
    assert len(rows) == len(truth)
    for r in rows:
        t = truth[r["source"]]
        assert r["n_docs"] == t[1]
        assert r["total_tokens"] == t[2]
        assert r["n_langs"] == t[3]
        assert abs(r["exact_dup_rate"] - (1 - t[4] / t[1])) < 1e-6
        assert 0.0 <= r["exact_dup_rate"] < 1.0


def test_welch_anova_matches_numpy(spark, sf_oracle):
    import numpy as np

    from target_iceberg_spark.plans.registry import all_specs

    row = all_specs()["agg_welch_anova"].builder(spark, sf_oracle).collect()[0]
    pdf = _events_pdf(sf_oracle)
    groups = [g["value"].to_numpy() for _, g in pdf.groupby("event_type")]
    k = len(groups)
    w = np.array([len(g) / g.var(ddof=1) for g in groups])
    m = np.array([g.mean() for g in groups])
    n = np.array([len(g) for g in groups])
    mw = (w * m).sum() / w.sum()
    num = (w * (m - mw) ** 2).sum() / (k - 1)
    lam = ((1 - w / w.sum()) ** 2 / (n - 1)).sum()
    f = num / (1 + 2 * (k - 2) / (k**2 - 1) * lam)
    assert row["dof1"] == k - 1
    assert abs(row["f_welch"] - f) < 1e-4
    assert abs(row["dof2"] - (k**2 - 1) / (3 * lam)) < 0.02


def test_cohens_kappa_matches_pure_python(spark, sf_oracle):
    import duckdb

    from target_iceberg_spark.plans.registry import all_specs
    from target_iceberg_spark.plans.stats_kappa import (
        KAPPA_MIN_CHARS,
        KAPPA_MIN_STOP_RATIO,
        KAPPA_STOPWORDS,
    )

    row = all_specs()["agg_cohens_kappa"].builder(spark, sf_oracle).collect()[0]
    docs = duckdb.connect().execute(
        f"SELECT n_chars, lower(text) FROM '{sf_oracle}/documents.parquet'"
    ).fetchall()
    stops = set(KAPPA_STOPWORDS)
    n = bp = bf = ap = bp2 = 0
    for n_chars, text in docs:
        toks = text.split(" ")
        ra = 1 if n_chars >= KAPPA_MIN_CHARS else 0
        rb = 1 if sum(t in stops for t in toks) / len(toks) >= KAPPA_MIN_STOP_RATIO else 0
        n += 1
        ap += ra
        bp2 += rb
        if ra and rb:
            bp += 1
        if not ra and not rb:
            bf += 1
    assert (row["n"], row["both_pass"], row["both_fail"]) == (n, bp, bf)
    assert (row["a_pass"], row["b_pass"]) == (ap, bp2)
    p_o = (bp + bf) / n
    p_e = (ap * bp2 + (n - ap) * (n - bp2)) / (n * n)
    assert abs(row["kappa"] - (p_o - p_e) / (1 - p_e)) < 1e-5
    assert -1.0 <= row["kappa"] <= 1.0


def test_auc_signal_beats_null_and_matches_sklearn_free_impl(spark, sf_oracle):
    import duckdb

    from target_iceberg_spark.plans.eval_auc import AUC_LABEL_CHARS
    from target_iceberg_spark.plans.registry import all_specs

    rows = {
        r["scorer"]: r
        for r in all_specs()["agg_auc_roc"].builder(spark, sf_oracle).collect()
    }
    assert rows["signal"]["auc"] > 0.95 > rows["null"]["auc"] > 0.3
    # independent rank-free AUC: P(score_pos > score_neg) + 0.5 ties
    docs = duckdb.connect().execute(
        f"""SELECT CASE WHEN n_chars >= {AUC_LABEL_CHARS} THEN 1 ELSE 0 END,
                   len(string_split(lower(text), ' '))
            FROM '{sf_oracle}/documents.parquet'"""
    ).fetchall()
    pos = [s for y, s in docs if y == 1]
    neg = [s for y, s in docs if y == 0]
    wins = sum((p > n_) + 0.5 * (p == n_) for p in pos for n_ in neg)
    assert abs(rows["signal"]["auc"] - wins / (len(pos) * len(neg))) < 1e-6


def test_calibration_ece_matches_numpy(spark, sf_oracle):
    import duckdb
    import numpy as np

    from target_iceberg_spark.plans.eval_calibration import (
        ECE_BINS,
        ECE_LABEL_CHARS,
    )
    from target_iceberg_spark.plans.registry import all_specs

    row = all_specs()["agg_calibration_ece"].builder(spark, sf_oracle).collect()[0]
    docs = duckdb.connect().execute(
        f"""SELECT CASE WHEN n_chars >= {ECE_LABEL_CHARS} THEN 1 ELSE 0 END y,
                   len(string_split(lower(text), ' ')) t
            FROM '{sf_oracle}/documents.parquet'"""
    ).df()
    t = docs["t"].to_numpy(dtype=float)
    p = np.round(1 / (1 + np.exp(-((t - t.mean()) / t.std(ddof=1)))), 6)
    bins = np.minimum((p * ECE_BINS).astype(int), ECE_BINS - 1)
    ece = 0.0
    for b in np.unique(bins):
        m = bins == b
        ece += m.sum() / len(p) * abs(docs["y"].to_numpy()[m].mean() - p[m].mean())
    assert row["n_docs"] == len(p)
    assert abs(row["ece"] - ece) < 1e-4
    assert 0.0 <= row["ece"] <= row["max_bin_gap"] <= 1.0


def test_hll_intersection_contracts(spark, sf_oracle):
    from target_iceberg_spark.plans.registry import all_specs

    row = all_specs()["agg_hll_intersection"].builder(spark, sf_oracle).collect()[0]
    assert row["union_within_rtol"] and row["intersection_within_rtol"]
    assert row["exact_both"] <= min(row["exact_a"], row["exact_b"])
    assert row["exact_both"] > 0


def test_corrupt_scan_quarantines_exactly_the_planted_lines(spark, sf_oracle):
    """The quarantined count equals the planted corruption rule, and
    a clean-file control (rule never fires on keys % MOD != 0 subset)
    parses 100%: Spark neither drops nor repairs."""
    import duckdb

    from target_iceberg_spark.plans.registry import all_specs
    from target_iceberg_spark.plans.scans_corrupt import CORRUPT_MOD

    row = all_specs()["scan_jsonl_corrupt"].builder(spark, sf_oracle).collect()[0]
    truth = duckdb.connect().execute(
        f"""SELECT COUNT(*) FILTER (WHERE n_nationkey % {CORRUPT_MOD} != 0),
                   COUNT(*) FILTER (WHERE n_nationkey % {CORRUPT_MOD} = 0),
                   SUM(n_nationkey) FILTER (WHERE n_nationkey % {CORRUPT_MOD} != 0)
            FROM '{sf_oracle}/nation.parquet'"""
    ).fetchone()
    assert (row["n_clean"], row["n_quarantined"]) == (truth[0], truth[1])
    assert row["clean_key_sum"] == truth[2]
    assert 0 < row["quarantine_share"] < 1


def test_gmm_em_matches_numpy_em(spark, sf_oracle):
    """Independent EM re-derivation (numpy, same rounding discipline)
    reproduces the unrolled plan's parameters, and EM improved the fit
    (second-iteration responsibilities separate the quartile seeds)."""
    import numpy as np

    from target_iceberg_spark.plans.registry import all_specs

    row = all_specs()["agg_gmm_em"].builder(spark, sf_oracle).collect()[0]
    pdf = _events_pdf(sf_oracle)
    v = pdf["value"].to_numpy(dtype=float)
    mu1 = round(float(np.quantile(v, 0.25, method="linear")), 6)
    mu2 = round(float(np.quantile(v, 0.75, method="linear")), 6)
    s2 = round(float(v.var(ddof=1)), 6)
    w1 = 0.5
    for _ in range(2):
        d1 = np.exp(-((v - mu1) ** 2) / (2 * s2)) * w1
        d2 = np.exp(-((v - mu2) ** 2) / (2 * s2)) * (1 - w1)
        g = np.round(d1 / (d1 + d2), 6)
        w1 = round(float(g.mean()), 6)
        mu1 = round(float((g * v).sum() / g.sum()), 6)
        mu2 = round(float(((1 - g) * v).sum() / (1 - g).sum()), 6)
        s2 = round(
            float(((g * (v - mu1) ** 2).sum() + ((1 - g) * (v - mu2) ** 2).sum()) / len(v)),
            6,
        )
    assert abs(row["weight1"] - w1) < 1e-4
    assert abs(row["mean1"] - mu1) < 1e-3
    assert abs(row["mean2"] - mu2) < 1e-3
    assert abs(row["pooled_sd"] - s2**0.5) < 1e-3
    assert row["ordered_components"] and row["mean1"] < row["mean2"]
    assert 0.0 < row["weight1"] < 1.0


def test_ppr_mass_concentrates_near_seed_and_matches_numpy(spark, sf_oracle):
    """PPR from the seed beats uniform PageRank's share AT the seed,
    total mass <= 1 (dangling drop only removes), and the unrolled
    power method reproduces a numpy implementation."""
    import duckdb
    import numpy as np

    from target_iceberg_spark.plans.graph_ppr import PPR_ITERS, PPR_SEED
    from target_iceberg_spark.plans.registry import all_specs

    rows = all_specs()["graph_ppr"].builder(spark, sf_oracle).collect()
    ppr = {r["node"]: r["ppr"] for r in rows}
    assert abs(sum(ppr.values())) <= 1.0 + 1e-9
    assert ppr[PPR_SEED] == max(ppr.values())  # seed dominates at 3 rounds
    edges = duckdb.connect().execute(
        f"""WITH seq AS (
              SELECT event_type AS src,
                     LEAD(event_type) OVER (PARTITION BY user_id
                                            ORDER BY ts, event_id) AS dst
              FROM '{sf_oracle}/events.parquet')
            SELECT src, dst, COUNT(*) FROM seq
            WHERE dst IS NOT NULL GROUP BY src, dst"""
    ).fetchall()
    nodes = sorted({e[0] for e in edges} | {e[1] for e in edges})
    idx = {n: i for i, n in enumerate(nodes)}
    W = np.zeros((len(nodes), len(nodes)))
    for s, d, w in edges:
        W[idx[s], idx[d]] = w
    P = W / W.sum(axis=1, keepdims=True)
    r = np.zeros(len(nodes))
    r[idx[PPR_SEED]] = 1.0
    rank = r.copy()
    for _ in range(PPR_ITERS):
        rank = 0.15 * r + 0.85 * (P.T @ rank)
    for n in nodes:
        assert abs(ppr[n] - rank[idx[n]]) < 1e-6


def test_ppr_restart_mass_on_isolated_seed_is_dropped(spark):
    """Documented operator caveat (operators/pagerank.py): restart
    entries for nodes absent from the edge-derived node set are dropped
    by the left join, so the effective teleport sums to < 1. Pin the
    behavior so a silent change is caught."""
    from target_iceberg_spark.operators.pagerank import pagerank

    edges = spark.createDataFrame(
        [("a", "b", 1.0), ("b", "a", 1.0)], "src string, dst string, weight double"
    )
    # Half the restart mass sits on an isolated node 'z' (no edges).
    restart = spark.createDataFrame(
        [("a", 0.5), ("z", 0.5)], "node string, r double"
    )
    rows = pagerank(edges, iterations=2, restart=restart).collect()
    got = {r["node"]: r["rank"] for r in rows}
    assert "z" not in got  # dropped, not ranked
    # With z's mass gone the system conserves only the surviving 0.5.
    assert abs(sum(got.values()) - 0.5) < 1e-12

    # ADVICE r11: strict_restart turns the silent drop into a fail-fast.
    import pytest

    with pytest.raises(ValueError, match="outside the edge-derived"):
        pagerank(edges, iterations=2, restart=restart, strict_restart=True)
    # ...and stays silent when every seed is in the node domain.
    ok = spark.createDataFrame([("a", 1.0)], "node string, r double")
    strict_rows = pagerank(
        edges, iterations=2, restart=ok, strict_restart=True
    ).collect()
    assert {r["node"] for r in strict_rows} == {"a", "b"}


def test_dp_counts_mechanism_algebra(spark, sf_oracle):
    """The Laplace inverse-CDF reproduces in pure Python from the same
    md5 uniform, and dp_n = exact + noise exactly."""
    import hashlib
    import math

    from target_iceberg_spark.plans.curation_dp import DP_B
    from target_iceberg_spark.plans.registry import all_specs

    rows = all_specs()["curation_dp_counts"].builder(spark, sf_oracle).collect()
    assert len(rows) >= 2
    for r in rows:
        u = (int(hashlib.md5(f"{r['source']}:dp".encode()).hexdigest()[:8], 16) + 0.5) / 2**32
        noise = round(
            DP_B * math.log(2 * u) if u < 0.5 else -DP_B * math.log(2 * (1 - u)), 6
        )
        assert abs(r["dp_n"] - round(r["exact_n"] + noise, 6)) < 1e-9
        assert r["within_95_interval"] == (abs(noise) <= 2.995732)


def test_knapsack_allocation_is_optimal_and_budget_exact(spark, sf_oracle):
    """Budget exactly exhausted (or all tokens taken), monotone
    take-shares along the quality order, and the greedy allocation
    matches a pure-Python fractional knapsack."""
    import duckdb

    from target_iceberg_spark.plans.curation_knapsack import (
        KNAP_BUDGET,
        KNAP_STOPS,
    )
    from target_iceberg_spark.plans.registry import all_specs

    rows = all_specs()["curation_mix_knapsack"].builder(spark, sf_oracle).collect()
    total_alloc = sum(r["allocated"] for r in rows)
    total_tokens = sum(r["tokens"] for r in rows)
    assert total_alloc == min(KNAP_BUDGET, total_tokens)
    shares = [r["take_share"] for r in rows]
    assert all(a >= b - 1e-9 for a, b in zip(shares, shares[1:]))
    stops = ", ".join(f"'{w}'" for w in KNAP_STOPS)
    src = duckdb.connect().execute(
        f"""WITH per_doc AS (
              SELECT source, len(string_split(lower(text),' ')) nt,
                     len(list_filter(string_split(lower(text),' '),
                         t -> t IN ({stops})))
                     / CAST(len(string_split(lower(text),' ')) AS DOUBLE) q
              FROM '{sf_oracle}/documents.parquet')
            SELECT source, SUM(nt), ROUND(AVG(q),6) FROM per_doc
            GROUP BY source ORDER BY 3 DESC, 1"""
    ).fetchall()
    budget = KNAP_BUDGET
    expect = {}
    for source, tokens, _q in src:
        take = min(tokens, max(budget, 0))
        expect[source] = take
        budget -= tokens
    for r in rows:
        assert r["allocated"] == expect[r["source"]]
