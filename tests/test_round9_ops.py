"""Round-9 operator tests: the events_sequence_dataset serialization
fix, the sim_ivf_recall_curve audit-row reduction, the Markov
state-universe/zero-row hardening (ADVICE r8), and the round-9 query
additions."""

from __future__ import annotations

import duckdb
import pyspark.sql.functions as F

from target_iceberg_spark.plans.registry import all_specs
from tests.oracle_harness import compare_frames

SPECS = all_specs()


# ---------------------------------------------------------------------------
# events_sequence_dataset: driver-hashable serialization (VERDICT r8 #1)
# ---------------------------------------------------------------------------


def test_sequence_dataset_context_cells_exact(spark, sf_oracle):
    """The cell-exact ARRAY assertion the registered query no longer
    carries (it serializes for the driver's canonicalizer): every
    context array must hold exactly the CTX_LEN event types preceding
    the label in (ts, event_id) stream order."""
    from target_iceberg_spark.plans.dataset_builder import (
        CTX_LEN,
        _sequence_rows,
    )
    from target_iceberg_spark.sources.tables import load_table

    rows = _sequence_rows(spark, sf_oracle).collect()
    assert rows
    users = {r["user_id"] for r in rows}
    ev = (
        load_table(spark, sf_oracle, "events")
        .where(F.col("user_id").isin(list(users)))
        .select("user_id", "ts", "event_id", "event_type")
        .collect()
    )
    streams: dict[int, list] = {}
    for e in sorted(ev, key=lambda e: (e["ts"], e["event_id"])):
        streams.setdefault(e["user_id"], []).append(e)
    pos = {
        (e["user_id"], e["event_id"]): i
        for s in streams.values()
        for i, e in enumerate(s)
    }
    for r in rows:
        i = pos[(r["user_id"], r["event_id"])]
        assert i >= CTX_LEN  # gate: context is full
        expect = [
            e["event_type"] for e in streams[r["user_id"]][i - CTX_LEN : i]
        ]
        assert list(r["context"]) == expect
        assert r["label"] == streams[r["user_id"]][i]["event_type"]


def test_sequence_dataset_serializes_the_same_rows(spark, sf_oracle):
    """The registered query must be exactly _sequence_rows with the
    context array '>'-joined — no other transformation."""
    ser = SPECS["events_sequence_dataset"].builder(spark, sf_oracle).collect()
    from target_iceberg_spark.plans.dataset_builder import _sequence_rows

    arr = {
        (r["user_id"], r["event_id"]): (list(r["context"]), r["label"])
        for r in _sequence_rows(spark, sf_oracle).collect()
    }
    assert len(ser) == len(arr)
    for r in ser:
        ctx, label = arr[(r["user_id"], r["event_id"])]
        assert r["context"] == ">".join(ctx)
        assert r["label"] == label
        assert isinstance(r["context"], str)  # hashable by the driver


# ---------------------------------------------------------------------------
# events_markov_stationary: ADVICE r8 hardening
# ---------------------------------------------------------------------------

_MARKOV_EDGE_ROWS = [
    # user 1: a -> b -> dead_end (dead_end has NO outgoing bigram
    # anywhere: it is every emitting user's final event)
    (1, "2024-01-01 00:00:00", 1, "a"),
    (2, "2024-01-01 00:01:00", 1, "b"),
    (3, "2024-01-01 00:02:00", 1, "dead_end"),
    # user 2: b -> a -> dead_end
    (4, "2024-01-01 00:00:00", 2, "b"),
    (5, "2024-01-01 00:01:00", 2, "a"),
    (6, "2024-01-01 00:02:00", 2, "dead_end"),
    # user 3: the SOLE-event user — 'lonely' appears in no bigram at
    # all, so it must still be a state (oracle's SELECT DISTINCT)
    (7, "2024-01-01 00:00:00", 3, "lonely"),
]


def _write_edge_events(spark, tmp_path) -> str:
    df = spark.createDataFrame(
        [
            (eid, ts, uid, et, 1.0, "{}")
            for eid, ts, uid, et in _MARKOV_EDGE_ROWS
        ],
        "event_id LONG, ts STRING, user_id LONG, event_type STRING, "
        "value DOUBLE, props STRING",
    ).withColumn("ts", F.to_timestamp("ts"))
    out = str(tmp_path / "events.parquet")
    df.coalesce(1).write.parquet(out)
    return str(tmp_path)


def test_markov_survives_terminal_and_sole_states(spark, tmp_path):
    """ADVICE r8 (analytics_markov.py): a state with no outgoing
    bigram must not divide by zero / NaN-poison the chain, and a type
    occurring only as a user's sole event must still be a state. The
    Spark arm must keep matching the recursive-CTE oracle on exactly
    this corpus."""
    spec = SPECS["events_markov_stationary"]
    sf = _write_edge_events(spark, tmp_path)
    spark_pdf = spec.builder(spark, sf).toPandas()

    assert sorted(spark_pdf["event_type"]) == ["a", "b", "dead_end", "lonely"]
    assert not spark_pdf["stationary_prob"].isna().any()
    # dead_end absorbs mass OUT of the chain each round (inner-join
    # semantics in the oracle); after 50 rounds everything has leaked
    assert (spark_pdf["stationary_prob"] >= 0).all()
    assert spark_pdf["stationary_prob"].sum() <= 1.0 + 1e-9

    con = duckdb.connect()
    try:
        con.sql(
            "CREATE VIEW events AS SELECT * FROM "
            f"read_parquet('{sf}/events.parquet/*.parquet')"
        )
        duck_pdf = con.sql(spec.oracle).df()
    finally:
        con.close()
    compare_frames("events_markov_stationary[edge]", spark_pdf, duck_pdf)


# ---------------------------------------------------------------------------
# round-9 stats tier
# ---------------------------------------------------------------------------


def _per_user_conv(spark, sf_oracle):
    from target_iceberg_spark.plans.stats_sprt import CONV_MIN_PURCHASES
    from target_iceberg_spark.sources.tables import load_table

    rows = (
        load_table(spark, sf_oracle, "events")
        .groupBy("user_id")
        .agg(
            F.sum(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ).alias("np")
        )
        .collect()
    )
    return {r["user_id"]: int(r["np"] >= CONV_MIN_PURCHASES) for r in rows}


def test_sprt_matches_sequential_recompute(spark, sf_oracle):
    """The group-sequential LLR must equal a plain-Python fold over
    id-ordered treatment users, and this corpus must actually reach
    accept_h1 (observed rate ~0.57 > P1=0.5)."""
    import math

    from target_iceberg_spark.plans.stats_sprt import (
        SPRT_ALPHA,
        SPRT_BETA,
        SPRT_CHECKPOINTS,
        SPRT_P0,
        SPRT_P1,
    )

    conv = _per_user_conv(spark, sf_oracle)
    treat = sorted(u for u in conv if u % 2 == 1)
    mx = max(treat)
    l1 = math.log(SPRT_P1 / SPRT_P0)
    l0 = math.log((1 - SPRT_P1) / (1 - SPRT_P0))
    cum: dict[int, list] = {}
    for u in treat:
        cp = int(u * SPRT_CHECKPOINTS / (mx + 1))
        cum.setdefault(cp, [0, 0])
        cum[cp][0] += 1
        cum[cp][1] += conv[u]
    rows = SPECS["agg_sprt_ab"].builder(spark, sf_oracle).collect()
    assert [r["checkpoint"] for r in rows] == sorted(cum)
    n_c = llr = convs = 0
    hi = math.log((1 - SPRT_BETA) / SPRT_ALPHA)
    lo = math.log(SPRT_BETA / (1 - SPRT_ALPHA))
    for r in rows:
        n, c = cum[r["checkpoint"]]
        n_c += n
        convs += c
        llr += c * l1 + (n - c) * l0
        assert r["n_cum"] == n_c and r["conv_cum"] == convs
        assert abs(r["llr"] - llr) < 1e-5
        want = (
            "accept_h1" if llr >= hi else "accept_h0" if llr <= lo else "continue"
        )
        assert r["state"] == want
    assert rows[-1]["state"] == "accept_h1"  # the monitor decides


def test_fisher_exact_matches_lgamma_recompute(spark, sf_oracle):
    """The in-plan ln-factorial construction must reproduce the
    classic lgamma-based Fisher p within rounding, and the 2x2 cells
    must match a direct recount."""
    import math

    conv = _per_user_conv(spark, sf_oracle)
    users = sorted(conv)  # panel = all 150 users here (N < PANEL_K)
    n = len(users)
    r1 = sum(1 for u in users if u % 2 == 1)
    c1 = sum(conv[u] for u in users)
    a = sum(conv[u] for u in users if u % 2 == 1)

    def lf(x):
        return math.lgamma(x + 1)

    def lp(k):
        return (
            lf(r1) + lf(n - r1) + lf(c1) + lf(n - c1)
            - lf(n) - lf(k) - lf(r1 - k) - lf(c1 - k)
            - lf(n - r1 - c1 + k)
        )

    lo, hi = max(0, r1 + c1 - n), min(r1, c1)
    lpo = lp(a)
    p = sum(math.exp(lp(k)) for k in range(lo, hi + 1) if lp(k) <= lpo + 1e-7)

    row = SPECS["agg_fisher_exact"].builder(spark, sf_oracle).collect()[0]
    assert (row["n_panel"], row["r1"], row["c1"], row["a"]) == (n, r1, c1, a)
    assert abs(row["p_two_sided"] - round(p, 6)) <= 2e-6
    assert 0 < row["p_two_sided"] <= 1
    assert abs(row["p_observed"] - round(math.exp(lpo), 6)) <= 2e-6
    # the arms genuinely differ on this corpus: the exact test agrees
    assert row["p_two_sided"] < 0.05


def test_theil_sen_matches_numpy_recompute(spark, sf_oracle):
    import numpy as np

    from target_iceberg_spark.sources.tables import load_table

    daily = (
        load_table(spark, sf_oracle, "events")
        .groupBy(
            F.date_trunc("day", F.col("ts").cast("timestamp"))
            .cast("date")
            .alias("d")
        )
        .agg(F.round(F.sum("value"), 6).alias("y"))
        .collect()
    )
    days = sorted((r["d"].toordinal(), r["y"]) for r in daily)
    x = np.array([d for d, _ in days], dtype=float)
    y = np.array([v for _, v in days])
    slopes = [
        (y[j] - y[i]) / (x[j] - x[i])
        for i in range(len(x))
        for j in range(i + 1, len(x))
    ]
    slope = float(np.median(slopes))
    x0 = np.datetime64("2024-01-01").astype("datetime64[D]").astype(int)
    xd = x - (np.datetime64("2024-01-01", "D").tolist().toordinal())
    intercept = float(np.median(y - slope * xd))

    row = SPECS["agg_theil_sen"].builder(spark, sf_oracle).collect()[0]
    assert row["n_days"] == len(days)
    assert row["n_pairs"] == len(slopes)
    assert abs(row["slope_per_day"] - slope) < 1e-5
    assert abs(row["intercept"] - intercept) < 1e-4


def test_winsorized_stats_matches_numpy_recompute(spark, sf_oracle):
    import numpy as np

    from target_iceberg_spark.sources.tables import load_table

    ev = (
        load_table(spark, sf_oracle, "events")
        .select("event_type", "value")
        .collect()
    )
    by_type: dict[str, list] = {}
    for r in ev:
        by_type.setdefault(r["event_type"], []).append(r["value"])
    rows = SPECS["agg_winsorized_stats"].builder(spark, sf_oracle).collect()
    assert len(rows) == len(by_type)
    for r in rows:
        v = np.array(by_type[r["event_type"]])
        lo, hi = np.quantile(v, [0.05, 0.95])  # linear interpolation
        w = np.clip(v, lo, hi)
        assert r["n"] == len(v)
        assert abs(r["mean_w"] - w.mean()) < 1e-3
        assert abs(r["sd_w"] - w.std(ddof=1)) < 1e-3
        assert r["n_clamped_lo"] == int((v < lo).sum())
        assert r["n_clamped_hi"] == int((v > hi).sum())
        # the cap genuinely bites on both tails
        assert r["n_clamped_lo"] > 0 and r["n_clamped_hi"] > 0


def test_cross_source_templates_matches_python_recompute(spark, sf_smoke):
    """Every emitted template genuinely occurs in >= MIN_SOURCES
    sources and the (n_sources, n_docs, n_occurrences) triple matches
    a from-scratch Python recount."""
    from collections import defaultdict

    from target_iceberg_spark.plans.text_templates import (
        TEMPLATE_MIN_SOURCES,
        TEMPLATE_N,
    )
    from target_iceberg_spark.sources.tables import load_table

    docs = load_table(spark, sf_smoke, "documents").collect()
    srcs: dict[str, set] = defaultdict(set)
    dids: dict[str, set] = defaultdict(set)
    occ: dict[str, int] = defaultdict(int)
    for r in docs:
        t = r["text"].split(" ")
        for i in range(len(t) - TEMPLATE_N + 1):
            g = " ".join(t[i : i + TEMPLATE_N])
            srcs[g].add(r["source"])
            dids[g].add(r["doc_id"])
            occ[g] += 1
    rows = SPECS["text_cross_source_templates"].builder(spark, sf_smoke).collect()
    assert rows, "fixture must contain cross-source templates"
    for r in rows:
        g = r["gram"]
        assert len(srcs[g]) >= TEMPLATE_MIN_SOURCES
        assert r["n_sources"] == len(srcs[g])
        assert r["n_docs"] == len(dids[g])
        assert r["n_occurrences"] == occ[g]


def test_reciprocal_knn_ranks_match_numpy_recompute(spark, sf_smoke):
    """Each emitted pair is genuinely mutual: recompute the banded
    sign-LSH candidate sets and exact cosine ranks in numpy and check
    both directions' ranks and the cosine value."""
    import numpy as np

    from target_iceberg_spark.plans.similarity_mutual import (
        RKNN_BANDS,
        RKNN_K,
        rknn_bits,
    )
    from target_iceberg_spark.sources.tables import load_table

    emb = load_table(spark, sf_smoke, "embeddings").collect()
    nb = rknn_bits(len(emb))
    ids = np.array([r["vec_id"] for r in emb])
    X = np.array([r["embedding"] for r in emb], dtype=np.float64)
    Xu = X / np.sqrt((X * X).sum(axis=1, keepdims=True))
    buckets = []
    for t in range(RKNN_BANDS):
        bits = (X[:, t * nb : (t + 1) * nb] > 0).astype(int)
        buckets.append(bits @ (1 << np.arange(nb - 1, -1, -1)))
    idx = {v: i for i, v in enumerate(ids)}

    def cand_of(i: int) -> np.ndarray:
        m = np.zeros(len(ids), dtype=bool)
        for b in buckets:
            m |= b == b[i]
        m[i] = False
        return np.where(m)[0]

    def rank_of(src: int, dst: int) -> int:
        cs = cand_of(src)
        cos = np.round(Xu[cs] @ Xu[src], 6)
        order = sorted(zip(-cos, ids[cs]))
        return [v for _, v in order].index(ids[dst]) + 1

    rows = SPECS["sim_reciprocal_knn"].builder(spark, sf_smoke).collect()
    assert rows, "fixture must contain mutual pairs"
    for r in rows:
        a, b = idx[r["va"]], idx[r["vb"]]
        assert r["va"] < r["vb"]
        got = float(np.round(Xu[a] @ Xu[b], 6))
        assert abs(r["cos_sim"] - got) < 2e-6
        assert r["rank_ab"] == rank_of(a, b) and r["rank_ab"] <= RKNN_K
        assert r["rank_ba"] == rank_of(b, a) and r["rank_ba"] <= RKNN_K


def test_isotropy_closed_form_equals_quadratic_estimator(spark, sf_smoke):
    """The closed form (|S|^2 - N)/(N(N-1)) must equal the O(N^2)
    mean pairwise cosine exactly (up to float noise far below the
    rounding quantum), per label."""
    import numpy as np

    from target_iceberg_spark.sources.tables import load_table

    emb = load_table(spark, sf_smoke, "embeddings").collect()
    by_label: dict[int, list] = {}
    for r in emb:
        by_label.setdefault(r["label"], []).append(r["embedding"])
    rows = SPECS["emb_isotropy"].builder(spark, sf_smoke).collect()
    assert len(rows) == len(by_label)
    for r in rows:
        X = np.array(by_label[r["label"]], dtype=np.float64)
        n = len(X)
        Xu = X / np.sqrt((X * X).sum(axis=1, keepdims=True))
        G = Xu @ Xu.T
        quad = (G.sum() - np.trace(G)) / (n * (n - 1))
        assert r["n_vectors"] == n
        assert abs(r["mean_pairwise_cos"] - quad) < 1e-6
        assert abs(
            r["norm_of_mean_unit"] - np.linalg.norm(Xu.sum(axis=0)) / n
        ) < 1e-6
        assert abs(
            r["mean_norm"] - np.sqrt((X * X).sum(axis=1)).mean()
        ) < 1e-6


def _events_pdf(spark, sf_dir):
    from target_iceberg_spark.sources.tables import load_table

    rows = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "value", "ts"
    ).collect()
    import pandas as pd

    return pd.DataFrame(
        {
            "user_id": [r["user_id"] for r in rows],
            "event_type": [r["event_type"] for r in rows],
            "value": [r["value"] for r in rows],
            "ts": [r["ts"] for r in rows],
        }
    )


def test_mcnemar_matches_python_recompute(spark, sf_oracle):
    from target_iceberg_spark.plans.stats_mcnemar import (
        MCN_CLICKS,
        MCN_PURCHASES,
    )

    pdf = _events_pdf(spark, sf_oracle)
    per = pdf.pivot_table(
        index="user_id", columns="event_type", values="value", aggfunc="count"
    ).fillna(0)
    a = per.get("click", 0) >= MCN_CLICKS
    b = per.get("purchase", 0) >= MCN_PURCHASES
    n_a_only = int((a & ~b).sum())
    n_b_only = int((~a & b).sum())
    row = SPECS["agg_mcnemar"].builder(spark, sf_oracle).collect()[0]
    assert row["n_users"] == len(per)
    assert row["n_a_only"] == n_a_only
    assert row["n_b_only"] == n_b_only
    assert row["n_both"] == int((a & b).sum())
    chi2 = (abs(n_a_only - n_b_only) - 1) ** 2 / (n_a_only + n_b_only)
    assert abs(row["chi2_cc"] - chi2) < 1e-6
    assert row["reject_h0"] == (chi2 > 3.841458820694124)
    # discordant cells genuinely populated on this corpus
    assert n_a_only > 0 and n_b_only > 0


def test_holm_ladder_and_stepdown_match_recompute(spark, sf_oracle):
    import numpy as np

    from target_iceberg_spark.plans.stats_multiplicity import (
        HOLM_ALPHA,
        HOLM_M,
        HOLM_Z_CRIT,
    )

    # the ladder itself: strictly decreasing, first step = Bonferroni
    from statistics import NormalDist

    assert list(HOLM_Z_CRIT) == sorted(HOLM_Z_CRIT, reverse=True)
    assert HOLM_Z_CRIT[0] == round(
        NormalDist().inv_cdf(1 - HOLM_ALPHA / (2 * HOLM_M)), 6
    )
    assert HOLM_Z_CRIT[-1] == round(
        NormalDist().inv_cdf(1 - HOLM_ALPHA / 2), 6
    )

    pdf = _events_pdf(spark, sf_oracle)
    zs = {}
    for et, g in pdf.groupby("event_type"):
        t = g[g.user_id % 2 == 1].value.to_numpy()
        c = g[g.user_id % 2 == 0].value.to_numpy()
        zs[et] = round(
            float(
                (t.mean() - c.mean())
                / np.sqrt(t.var(ddof=1) / len(t) + c.var(ddof=1) / len(c))
            ),
            6,
        )
    rows = SPECS["agg_holm_bonferroni"].builder(spark, sf_oracle).collect()
    assert len(rows) == HOLM_M
    order = sorted(zs, key=lambda k: (-abs(zs[k]), k))
    alive = True
    for r, et in zip(rows, order):
        assert r["event_type"] == et
        assert abs(r["z"] - zs[et]) < 2e-6
        assert r["z_crit"] == HOLM_Z_CRIT[r["holm_step"] - 1]
        alive = alive and abs(zs[et]) >= r["z_crit"]
        assert r["holm_reject"] == alive


def test_eb_shrinkage_pulls_toward_prior_mean(spark, sf_oracle):
    import numpy as np

    pdf = _events_pdf(spark, sf_oracle)
    per = pdf.groupby("user_id").agg(
        n=("event_type", "size"),
        x=("event_type", lambda s: (s == "purchase").sum()),
    )
    rate = per.x / per.n
    m, v = rate.mean(), rate.var(ddof=1)
    k = m * (1 - m) / v - 1
    alpha, beta = m * k, (1 - m) * k
    rows = SPECS["agg_eb_shrinkage"].builder(spark, sf_oracle).collect()
    assert len(rows) == 10
    shrunk_all = (per.x + alpha) / (per.n + alpha + beta)
    expect = sorted(
        ((round(s, 6), uid) for uid, s in shrunk_all.items()),
        key=lambda t: (-t[0], t[1]),
    )[:10]
    for r, (s, uid) in zip(rows, expect):
        assert r["user_id"] == uid
        assert abs(r["shrunk_rate"] - s) < 2e-6
        assert abs(r["prior_alpha"] - alpha) < 1e-4
        assert abs(r["prior_beta"] - beta) < 1e-4
        # shrinkage property: posterior mean sits between raw and prior
        lo, hi = sorted((r["raw_rate"], float(m)))
        assert lo - 1e-6 <= r["shrunk_rate"] <= hi + 1e-6


def test_did_matches_python_recompute(spark, sf_oracle):
    import numpy as np
    import pandas as pd

    pdf = _events_pdf(spark, sf_oracle)
    p = pdf[pdf.event_type == "purchase"].copy()
    p["treat"] = p.user_id % 2 == 1
    p["post"] = p.ts >= pd.Timestamp("2024-01-16")
    cells = {
        (t, po): g.value
        for (t, po), g in p.groupby(["treat", "post"])
    }
    did = (
        cells[(True, True)].mean() - cells[(True, False)].mean()
    ) - (cells[(False, True)].mean() - cells[(False, False)].mean())
    se = np.sqrt(
        sum(c.var(ddof=1) / len(c) for c in cells.values())
    )
    row = SPECS["agg_diff_in_diff"].builder(spark, sf_oracle).collect()[0]
    assert row["n_total"] == len(p)
    assert abs(row["did_estimate"] - did) < 1e-5
    assert abs(row["se"] - se) < 1e-5
    assert abs(row["z"] - did / se) < 1e-4
    assert row["significant"] == (abs(did / se) > 1.959963984540054)


def test_xcorr_matches_numpy_recompute(spark, sf_oracle):
    import numpy as np

    from target_iceberg_spark.plans.analytics_xcorr import (
        XCORR_MAX_LAG,
        XCORR_X,
        XCORR_Y,
    )

    pdf = _events_pdf(spark, sf_oracle)
    pdf = pdf[pdf.event_type.isin([XCORR_X, XCORR_Y])].copy()
    hr = pdf.ts.astype("int64") // (3_600 * 10**9)
    lo, hi = hr.min(), hr.max()
    grid = np.arange(lo, hi + 1)
    x = np.zeros(len(grid))
    y = np.zeros(len(grid))
    for h, et in zip(hr, pdf.event_type):
        if et == XCORR_X:
            x[h - lo] += 1
        else:
            y[h - lo] += 1
    rows = SPECS["events_xcorr"].builder(spark, sf_oracle).collect()
    assert [r["lag_hours"] for r in rows] == list(
        range(-XCORR_MAX_LAG, XCORR_MAX_LAG + 1)
    )
    for r in rows:
        lag = r["lag_hours"]
        if lag >= 0:
            a, b = x[: len(x) - lag], y[lag:]
        else:
            a, b = x[-lag:], y[: len(y) + lag]
        assert r["n_hours"] == len(a)
        assert abs(r["r"] - np.corrcoef(a, b)[0, 1]) < 1e-5


def test_srm_daily_counts_and_flag(spark, sf_oracle):
    pdf = _events_pdf(spark, sf_oracle)
    pdf["day"] = pdf.ts.dt.date
    rows = SPECS["events_srm"].builder(spark, sf_oracle).collect()
    days = sorted(pdf.day.unique())
    assert [r["day"] for r in rows] == days
    for r in rows:
        sub = pdf[pdf.day == r["day"]]
        nt = sub[sub.user_id % 2 == 1].user_id.nunique()
        nc = sub[sub.user_id % 2 == 0].user_id.nunique()
        assert (r["n_treat"], r["n_control"]) == (nt, nc)
        chi2 = (nt - nc) ** 2 / (nt + nc)
        assert abs(r["chi2"] - chi2) < 1e-6
        assert r["srm_flag"] == (chi2 > 3.841458820694124)


def test_capture_recapture_recovers_true_population(spark, sf_oracle):
    import pandas as pd

    pdf = _events_pdf(spark, sf_oracle)
    split = pd.Timestamp("2024-01-16")
    a = set(pdf[pdf.ts < split].user_id)
    b = set(pdf[pdf.ts >= split].user_id)
    row = SPECS["events_capture_recapture"].builder(spark, sf_oracle).collect()[0]
    assert row["n_a"] == len(a)
    assert row["n_b"] == len(b)
    assert row["m_overlap"] == len(a & b)
    assert row["true_distinct"] == len(a | b)
    est = (len(a) + 1) * (len(b) + 1) / (len(a & b) + 1) - 1
    assert abs(row["chapman_estimate"] - round(est, 4)) < 1e-9
    # every user is active in both halves of this corpus, so the
    # estimator must land very close to the truth
    assert row["rel_error"] < 0.05


def test_adamic_adar_matches_python_recompute(spark, sf_oracle):
    import math
    from collections import defaultdict

    from target_iceberg_spark.plans.graph_adamic import (
        AA_DEG_CAP,
        AA_SUPPORT,
    )
    from target_iceberg_spark.sources.tables import load_table

    li = (
        load_table(spark, sf_oracle, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
        .collect()
    )
    baskets: dict[int, set] = defaultdict(set)
    for r in li:
        baskets[r["l_orderkey"]].add(r["l_partkey"])
    pair_n: dict[tuple, int] = defaultdict(int)
    for parts in baskets.values():
        ps = sorted(parts)
        for i in range(len(ps)):
            for j in range(i + 1, len(ps)):
                pair_n[(ps[i], ps[j])] += 1
    edges = {p for p, n in pair_n.items() if n >= AA_SUPPORT}
    nbrs: dict[int, set] = defaultdict(set)
    for a, b in edges:
        nbrs[a].add(b)
        nbrs[b].add(a)
    aa: dict[tuple, tuple] = {}
    for z, nz in nbrs.items():
        # a degree-1 center cannot form a wedge (one adjacency row),
        # so ln(1)=0 is never evaluated in the plan either
        if len(nz) > AA_DEG_CAP or len(nz) < 2:
            continue
        w = 1.0 / math.log(len(nz))
        for a in nz:
            for b in nz:
                if a < b and (a, b) not in edges:
                    cn, s = aa.get((a, b), (0, 0.0))
                    aa[(a, b)] = (cn + 1, s + w)
    rows = SPECS["graph_adamic_adar"].builder(spark, sf_oracle).collect()
    assert rows
    expect = sorted(
        ((round(s, 6), -a, -b, cn, a, b) for (a, b), (cn, s) in aa.items()),
        key=lambda t: (-t[0], t[4], t[5]),
    )[: len(rows)]
    for r, (s, _, _, cn, a, b) in zip(rows, expect):
        assert (r["part_a"], r["part_b"]) == (a, b)
        assert r["common_nbrs"] == cn
        assert abs(r["adamic_adar"] - s) < 2e-6


def test_functional_deps_verdicts(spark, sf_oracle):
    rows = {
        (r["relation"], r["determinant"], r["dependent"]): r
        for r in SPECS["profile_functional_deps"].builder(
            spark, sf_oracle
        ).collect()
    }
    # key-driven FDs hold; the probed non-key pairs are violated
    assert rows[("nation", "n_name", "n_regionkey")]["fd_holds"]
    assert rows[("orders", "o_orderkey", "o_orderstatus")]["fd_holds"]
    assert not rows[("customer", "c_nationkey", "c_mktsegment")]["fd_holds"]
    v = rows[("orders", "o_custkey", "o_orderpriority")]
    assert not v["fd_holds"]
    assert 0 < v["n_violating_groups"] <= v["n_groups"]
    assert v["max_rhs_per_group"] > 1


def test_selectivity_estimates_track_actuals(spark, sf_oracle):
    import numpy as np

    from target_iceberg_spark.plans.profiling_selectivity import (
        SEL_BUCKETS,
        SEL_THRESHOLDS,
    )
    from target_iceberg_spark.sources.tables import load_table

    v = np.array(
        [
            r["o_totalprice"]
            for r in load_table(spark, sf_oracle, "orders")
            .select("o_totalprice")
            .collect()
        ]
    )
    lo, w = v.min(), (v.max() - v.min()) / SEL_BUCKETS
    counts = np.bincount(
        np.minimum(np.floor((v - lo) / w).astype(int), SEL_BUCKETS - 1),
        minlength=SEL_BUCKETS,
    )
    rows = SPECS["profile_selectivity_audit"].builder(spark, sf_oracle).collect()
    assert [r["threshold"] for r in rows] == list(SEL_THRESHOLDS)
    for r in rows:
        t = r["threshold"]
        est = 0.0
        for b in range(SEL_BUCKETS):
            blo, bhi = lo + b * w, lo + (b + 1) * w
            if bhi <= t:
                est += counts[b]
            elif blo < t:
                est += counts[b] * (t - blo) / w
        assert r["actual_rows"] == int((v < t).sum())
        assert abs(r["est_rows"] - est) < 1e-3
        # a uniform-ish column must estimate well (single-digit % error)
        assert r["rel_error"] < 0.1


def test_fertility_matches_python_recompute(spark, sf_oracle):
    import math
    from collections import defaultdict

    from target_iceberg_spark.plans.curation_fertility import (
        FERTILITY_HIGH,
        PIECE_LEN,
    )
    from target_iceberg_spark.sources.tables import load_table

    agg: dict[str, list] = defaultdict(lambda: [0, 0, 0, 0])
    docs = load_table(spark, sf_oracle, "documents").collect()
    for r in docs:
        words = r["text"].split(" ")
        n_sub = sum(math.ceil(len(w) / PIECE_LEN) for w in words)
        n_words = len(words)
        a = agg[r["lang"]]
        a[0] += 1
        a[1] += n_words
        a[2] += n_sub
        a[3] += 1 if n_sub / n_words > FERTILITY_HIGH else 0
    rows = SPECS["curation_tokenizer_fertility"].builder(
        spark, sf_oracle
    ).collect()
    assert len(rows) == len(agg)
    for r in rows:
        n, w, s, hi = agg[r["lang"]]
        assert (r["n_docs"], r["total_words"], r["total_subwords"]) == (n, w, s)
        assert abs(r["fertility"] - s / w) < 1e-4
        assert r["n_high_fertility"] == hi
        # the threshold genuinely splits the corpus
        assert 0 < hi < n


def test_seasonal_strength_matches_numpy_recompute(spark, sf_oracle):
    import numpy as np

    pdf = _events_pdf(spark, sf_oracle)
    hr = pdf.ts.astype("int64") // (3_600 * 10**9)
    lo, hi = hr.min(), hr.max()
    n = hi - lo + 1
    rows = SPECS["events_seasonal_strength"].builder(spark, sf_oracle).collect()
    types = sorted(pdf.event_type.unique())
    assert [r["event_type"] for r in rows] == types
    for r in rows:
        y = np.zeros(n)
        for h in hr[pdf.event_type == r["event_type"]]:
            y[h - lo] += 1
        hod = (np.arange(lo, hi + 1)) % 24
        m = np.array([y[hod == k].mean() for k in range(24)])
        resid = y - m[hod]
        vt = y.var(ddof=1)
        vr = resid.var(ddof=1)
        assert r["n_hours"] == n
        assert abs(r["var_total"] - vt) < 1e-4
        assert abs(r["var_residual"] - vr) < 1e-4
        assert abs(r["seasonal_strength"] - max(0.0, 1 - vr / vt)) < 1e-4


def test_char_entropy_matches_python_recompute(spark, sf_oracle):
    import math
    from collections import Counter, defaultdict

    from target_iceberg_spark.plans.text_entropy import (
        ENTROPY_LOW,
        ENTROPY_PREFIX,
    )
    from target_iceberg_spark.sources.tables import load_table

    per_source: dict[str, list] = defaultdict(list)
    for r in load_table(spark, sf_oracle, "documents").collect():
        prefix = r["text"][:ENTROPY_PREFIX]
        c = Counter(prefix)
        nn = len(prefix)
        h = -sum((v / nn) * math.log2(v / nn) for v in c.values())
        per_source[r["source"]].append(h)
    rows = SPECS["text_char_entropy"].builder(spark, sf_oracle).collect()
    assert len(rows) == len(per_source)
    for r in rows:
        hs = per_source[r["source"]]
        assert r["n_docs"] == len(hs)
        assert abs(r["avg_entropy"] - sum(hs) / len(hs)) < 1e-3
        assert abs(r["min_entropy"] - min(hs)) < 1e-3
        assert r["n_low_entropy"] == sum(1 for h in hs if h < ENTROPY_LOW)


def test_vshape_pattern_matches_python_recompute(spark, sf_oracle):
    from collections import defaultdict

    pdf = _events_pdf(spark, sf_oracle)
    p = pdf[pdf.event_type == "purchase"].sort_values("ts")
    per_user: dict[int, list] = defaultdict(list)
    for uid, v in zip(p.user_id, p.value):
        per_user[uid].append(v)
    counts = {}
    for uid, vs in per_user.items():
        n = sum(
            1
            for i in range(len(vs) - 3)
            if vs[i] > vs[i + 1] > vs[i + 2] < vs[i + 3]
        )
        counts[uid] = (len(vs), n)
    expect = sorted(
        ((n, uid, na) for uid, (na, n) in counts.items() if n > 0),
        key=lambda t: (-t[0], t[1]),
    )[:15]
    rows = SPECS["win_match_pattern"].builder(spark, sf_oracle).collect()
    assert len(rows) == len(expect)
    for r, (n, uid, na) in zip(rows, expect):
        assert (r["user_id"], r["n_vshapes"], r["n_anchors"]) == (uid, n, na)
        assert abs(r["vshape_rate"] - n / na) < 1e-6


def test_keyness_g2_matches_python_recompute(spark, sf_oracle):
    import math
    from collections import Counter, defaultdict

    from target_iceberg_spark.plans.text_keyness import (
        KEYNESS_MIN_CORPUS,
        KEYNESS_PER_SOURCE,
    )
    from target_iceberg_spark.sources.tables import load_table

    sw: dict[tuple, int] = Counter()
    for r in load_table(spark, sf_oracle, "documents").collect():
        for w in r["text"].split(" "):
            sw[(r["source"], w)] += 1
    wt = Counter()
    st = Counter()
    for (s, w), a in sw.items():
        wt[w] += a
        st[s] += a
    nn = sum(sw.values())

    def g2(a, b, c, d):
        total = a + b + c + d
        out = 0.0
        for o, rt, ct in (
            (a, a + b, a + c),
            (b, a + b, b + d),
            (c, c + d, a + c),
            (d, c + d, b + d),
        ):
            if o > 0:
                out += o * math.log(o / (rt * ct / total))
        return 2 * out

    per_source: dict[str, list] = defaultdict(list)
    for (s, w), a in sw.items():
        if wt[w] < KEYNESS_MIN_CORPUS:
            continue
        b = wt[w] - a
        c = st[s] - a
        d = nn - wt[w] - st[s] + a
        per_source[s].append((round(g2(a, b, c, d), 4), w, a))
    rows = SPECS["text_keyness_g2"].builder(spark, sf_oracle).collect()
    by_source: dict[str, list] = defaultdict(list)
    for r in rows:
        by_source[r["source"]].append(r)
    for s, got in by_source.items():
        want = sorted(per_source[s], key=lambda t: (-t[0], t[1]))[
            :KEYNESS_PER_SOURCE
        ]
        assert len(got) == len(want)
        for r, (score, w, a) in zip(got, want):
            assert r["word"] == w and r["n_in_source"] == a
            assert abs(r["g2"] - score) < 2e-4


def test_rknn_bits_sizing_holds_bucket_occupancy():
    """The corpus-sized bucket width: occupancy N/2^bits stays within
    [TARGET/2, TARGET] once past the floor, so within-bucket pair
    volume — quadratic in occupancy — stays CONSTANT per vector as N
    grows (the round-9 scale-audit fix)."""
    from target_iceberg_spark.plans.similarity_mutual import (
        RKNN_MAX_BITS,
        RKNN_MIN_BITS,
        RKNN_TARGET_BUCKET,
        rknn_bits,
    )

    assert rknn_bits(500) == RKNN_MIN_BITS  # the oracle's pinned SFs
    assert rknn_bits(1) == RKNN_MIN_BITS
    for n in (2_000, 20_000, 200_000, 2_000_000):
        b = rknn_bits(n)
        occ = n / (1 << b)
        if b < RKNN_MAX_BITS:
            assert occ <= RKNN_TARGET_BUCKET
            assert occ > RKNN_TARGET_BUCKET / 2
    assert rknn_bits(10**9) == RKNN_MAX_BITS  # clamp


def test_burstiness_matches_numpy_recompute(spark, sf_oracle):
    import numpy as np
    from collections import defaultdict

    pdf = _events_pdf(spark, sf_oracle)
    pdf = pdf.sort_values("ts", kind="mergesort")
    gaps: dict[str, list] = defaultdict(list)
    pairs: dict[str, list] = defaultdict(list)
    last: dict[tuple, list] = {}
    for _, r in pdf.iterrows():
        k = (r.user_id, r.event_type)
        t = r.ts.value // 1000  # microseconds
        hist = last.setdefault(k, [])
        if hist:
            gap = t - hist[-1]
            gaps[r.event_type].append(gap)
            if len(hist) >= 2:
                pairs[r.event_type].append((hist[-1] - hist[-2], gap))
        hist.append(t)
    rows = SPECS["events_burstiness"].builder(spark, sf_oracle).collect()
    assert [r["event_type"] for r in rows] == sorted(gaps)
    for r in rows:
        g = np.array(gaps[r["event_type"]], dtype=float)
        sd, mu = g.std(ddof=1), g.mean()
        assert r["n_gaps"] == len(g)
        assert abs(r["burstiness"] - (sd - mu) / (sd + mu)) < 1e-5
        pg = np.array(pairs[r["event_type"]], dtype=float)
        m = np.corrcoef(pg[:, 0], pg[:, 1])[0, 1]
        assert abs(r["memory_coef"] - m) < 1e-5
        # the synthetic corpus is Poisson-like: B pins near 0, well
        # away from the periodic (-1) and bursty (+1) extremes
        assert -0.1 < r["burstiness"] < 0.1


def test_bh_stepup_matches_recompute_and_dominates_holm(spark, sf_oracle):
    """BH rejection set must match a from-scratch step-up recompute
    and CONTAIN Holm's rejection set (FDR is never less powerful than
    FWER on the same statistics at alpha_bh >= alpha_holm)."""
    import numpy as np
    from statistics import NormalDist

    from target_iceberg_spark.plans.stats_fdr import (
        BH_ALPHA,
        BH_M,
        BH_Z_CRIT,
    )

    assert BH_Z_CRIT[0] == round(
        NormalDist().inv_cdf(1 - (1 / BH_M) * BH_ALPHA / 2), 6
    )
    # BH's ladder LOOSENS with the step (step-up), Holm's tightens
    assert list(BH_Z_CRIT) == sorted(BH_Z_CRIT, reverse=True)

    pdf = _events_pdf(spark, sf_oracle)
    zs = {}
    for et, g in pdf.groupby("event_type"):
        t = g[g.user_id % 2 == 1].value.to_numpy()
        c = g[g.user_id % 2 == 0].value.to_numpy()
        zs[et] = round(
            float(
                (t.mean() - c.mean())
                / np.sqrt(t.var(ddof=1) / len(t) + c.var(ddof=1) / len(c))
            ),
            6,
        )
    order = sorted(zs, key=lambda k: (-abs(zs[k]), k))
    passes = [abs(zs[et]) >= BH_Z_CRIT[i] for i, et in enumerate(order)]
    kmax = max((i for i, p in enumerate(passes) if p), default=-1)
    rows = SPECS["agg_benjamini_hochberg"].builder(spark, sf_oracle).collect()
    assert [r["event_type"] for r in rows] == order
    for i, r in enumerate(rows):
        assert abs(r["z"] - zs[r["event_type"]]) < 2e-6
        assert r["bh_reject"] == (i <= kmax)
    holm = {
        r["event_type"]: r["holm_reject"]
        for r in SPECS["agg_holm_bonferroni"].builder(spark, sf_oracle).collect()
    }
    for r in rows:
        if holm[r["event_type"]]:
            assert r["bh_reject"]  # BH(0.10) contains Holm(0.05)


def test_burrows_delta_matches_numpy_recompute(spark, sf_oracle):
    import numpy as np
    from collections import Counter, defaultdict

    from target_iceberg_spark.plans.text_stylometry import (
        DELTA_TOP,
        DELTA_WORDS,
    )
    from target_iceberg_spark.sources.tables import load_table

    sw: Counter = Counter()
    wtot: Counter = Counter()
    stot: Counter = Counter()
    for r in load_table(spark, sf_oracle, "documents").collect():
        for w in r["text"].split(" "):
            sw[(r["source"], w)] += 1
            wtot[w] += 1
            stot[r["source"]] += 1
    topw = sorted(wtot, key=lambda w: (-wtot[w], w))[:DELTA_WORDS]
    sources = sorted(stot)
    Fm = np.array(
        [[sw.get((s, w), 0) / stot[s] for w in topw] for s in sources]
    )
    Z = (Fm - Fm.mean(axis=0)) / Fm.std(axis=0, ddof=1)
    deltas = {}
    for i, a in enumerate(sources):
        for j in range(i + 1, len(sources)):
            deltas[(a, sources[j])] = round(
                float(np.abs(Z[i] - Z[j]).mean()), 6
            )
    want = sorted(deltas.items(), key=lambda t: (t[1], t[0]))[:DELTA_TOP]
    rows = SPECS["text_burrows_delta"].builder(spark, sf_oracle).collect()
    assert len(rows) == DELTA_TOP
    for r, ((a, b), dv) in zip(rows, want):
        assert (r["source_a"], r["source_b"]) == (a, b)
        assert abs(r["delta"] - dv) < 2e-5


def test_prf_rocchio_feedback_properties(spark, sf_oracle):
    """The expanded query must (a) keep the pseudo-relevant set highly
    ranked, (b) produce ranks that are a permutation consistent with
    the reported expanded scores, and (c) match a numpy recompute of
    both scoring rounds."""
    import numpy as np

    from target_iceberg_spark.plans.similarity import PROBE_VEC_ID
    from target_iceberg_spark.plans.similarity_prf import (
        PRF_BETA,
        PRF_FEEDBACK_K,
        PRF_TOP,
    )
    from target_iceberg_spark.sources.tables import load_table

    emb = load_table(spark, sf_oracle, "embeddings").collect()
    vecs = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64) for r in emb}
    q = vecs[PROBE_VEC_ID]
    cands = sorted(v for v in vecs if v != PROBE_VEC_ID)

    def cos(a, b):
        return round(float(a @ b / np.sqrt((a @ a) * (b @ b))), 6)

    c0 = {v: cos(vecs[v], q) for v in cands}
    order0 = sorted(cands, key=lambda v: (-c0[v], v))
    fb = order0[:PRF_FEEDBACK_K]
    qx = q + PRF_BETA * np.mean([vecs[v] for v in fb], axis=0)
    cx = {v: cos(vecs[v], qx) for v in cands}
    orderx = sorted(cands, key=lambda v: (-cx[v], v))

    rows = SPECS["sim_prf_rocchio"].builder(spark, sf_oracle).collect()
    assert len(rows) == PRF_TOP
    for i, r in enumerate(rows):
        assert r["vec_id"] == orderx[i]
        assert r["rank_new"] == i + 1
        assert abs(r["cos_expanded"] - cx[r["vec_id"]]) < 2e-6
        assert abs(r["cos_orig"] - c0[r["vec_id"]]) < 2e-6
        assert r["rank_orig"] == order0.index(r["vec_id"]) + 1
    # feedback keeps the pseudo-relevant set near the top
    new_rank = {v: i + 1 for i, v in enumerate(orderx)}
    assert all(new_rank[v] <= 2 * PRF_FEEDBACK_K for v in fb)


def test_reciprocal_knn_adaptive_width_parity_at_sf01(spark):
    """At sf0.1 the plan sizes the LSH grid wider than the registered
    (MIN_BITS) oracle — re-derive the oracle SQL at the adaptive width
    and the hash comparison must still hold, proving the adaptive
    path is the SAME query at a different grid, not new semantics."""
    import duckdb as _duck

    from target_iceberg_spark.plans.similarity_mutual import (
        RKNN_MIN_BITS,
        _rknn_oracle,
        rknn_bits,
    )
    from target_iceberg_spark.sources.tables import load_table

    sf = "/root/testdata/sf0.1"
    n = load_table(spark, sf, "embeddings").count()
    bits = rknn_bits(n)
    assert bits > RKNN_MIN_BITS  # the adaptive path is exercised
    spark_pdf = SPECS["sim_reciprocal_knn"].builder(spark, sf).toPandas()
    con = _duck.connect()
    try:
        con.sql(
            "CREATE VIEW embeddings AS SELECT * FROM "
            f"read_parquet('{sf}/embeddings.parquet')"
        )
        duck_pdf = con.sql(_rknn_oracle(bits)).df()
    finally:
        con.close()
    compare_frames("sim_reciprocal_knn[sf0.1-adaptive]", spark_pdf, duck_pdf)
