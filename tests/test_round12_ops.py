"""Round-12 operator tests: DoReMi domain reweighting."""

from __future__ import annotations

import math

from target_iceberg_spark.plans.registry import all_specs


def _write_docs(spark, tmp_path, rows):
    sf_dir = str(tmp_path / "sf_planted")
    spark.createDataFrame(
        [(i, text, "en", src, len(text)) for i, (src, text) in enumerate(rows)],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    ).coalesce(1).write.parquet(f"{sf_dir}/documents.parquet")
    return sf_dir


def test_domain_reweight_upweights_planted_hard_domain(spark, tmp_path):
    """A domain whose bigrams are RARE under the corpus-fit KN model
    (high excess loss) must gain weight over its baseline share;
    easy/common domains must lose. Plus the distribution axioms."""
    common = "the cat sat on the mat and the dog ran to the cat"
    rows = []
    # two easy domains dominated by one repeated, well-modeled sentence
    for src in ("web", "books"):
        rows += [(src, common)] * 12
    # the hard domain: each doc is a distinct bigram stream never seen
    # elsewhere, so its continuation/backoff mass is tiny
    for i in range(12):
        rows.append(
            ("junk", f"zx{i}a qq{i}b vv{i}c kk{i}d zz{i}e yy{i}f ww{i}g")
        )
    sf_dir = _write_docs(spark, tmp_path, rows)
    out = {
        r["source"]: r
        for r in all_specs()["curation_domain_reweight"]
        .builder(spark, sf_dir)
        .collect()
    }
    assert set(out) == {"web", "books", "junk"}
    junk, web = out["junk"], out["web"]
    # the planted-hard domain carries the max excess and gets boosted
    assert junk["excess"] == max(r["excess"] for r in out.values())
    assert junk["excess"] > 0
    assert junk["weight"] > junk["share"]
    assert junk["boost"] > 1.0
    # the easy domains pay for it
    assert web["weight"] < web["share"] + 1e-9
    # weights form a distribution (rounding slack at 6 dp x |sources|)
    assert abs(sum(r["weight"] for r in out.values()) - 1.0) < 5e-6
    assert abs(sum(r["alpha_eg"] for r in out.values()) - 1.0) < 5e-6


def test_domain_reweight_matches_python_eg_unroll(spark, sf_oracle):
    """The unrolled EG recurrence reproduces in plain Python from the
    query's own base columns (share/excess/tilt are emitted or
    derivable), with identical per-step rounding."""
    from target_iceberg_spark.plans.curation_reweight import (
        DR_EPS,
        DR_ETA,
        DR_STEPS,
    )

    rows = (
        all_specs()["curation_domain_reweight"]
        .builder(spark, sf_oracle)
        .collect()
    )
    assert len(rows) >= 2
    shares = [r["share"] for r in rows]
    excesses = [r["excess"] for r in rows]
    tilts = [round(math.exp(DR_ETA * e), 6) for e in excesses]
    alphas = list(shares)
    for _ in range(DR_STEPS):
        u = [round(a * t, 6) for a, t in zip(alphas, tilts)]
        z = sum(u)
        alphas = [round(x / z, 6) for x in u]
    k = float(len(rows))
    for r, a in zip(rows, alphas):
        assert abs(r["alpha_eg"] - a) < 1e-9, (r["source"], r["alpha_eg"], a)
        w = round((1 - DR_EPS) * a + DR_EPS / k, 6)
        assert abs(r["weight"] - w) < 1e-9
        assert abs(r["boost"] - round(w / r["share"], 4)) < 1e-9


def test_partition_evolution_planner_invariants(spark, sf_oracle):
    """Day pruning is exact for date predicates (amp_day = 1), the
    month spec only ever reads MORE rows but FEWER files, a
    month-aligned predicate is amplification-free under both specs,
    and the budget columns tie back to the corpus."""
    import duckdb

    from target_iceberg_spark.plans.lakehouse_evolution import EVO_ROW_BYTES

    rows = {
        r["arm"]: r
        for r in all_specs()["lakehouse_partition_evolution"]
        .builder(spark, sf_oracle)
        .collect()
    }
    assert set(rows) == {"1_week", "2_month", "3_quarter"}
    n_orders = duckdb.connect().execute(
        f"SELECT COUNT(*) FROM '{sf_oracle}/orders.parquet'"
    ).fetchone()[0]
    for r in rows.values():
        assert r["amp_day"] == 1.0  # day files contain only matching rows
        assert r["rows_read_day"] == r["rows_match"]
        assert r["amp_month"] >= r["amp_day"]
        assert r["files_read_month"] <= r["files_read_day"]
        assert r["files_saved"] >= 0
        assert r["files_month_spec"] < r["files_day_spec"]
        assert r["rewrite_bytes"] == n_orders * EVO_ROW_BYTES
    # sub-month predicate pays the amplification the planner exists to
    # expose; a month-aligned predicate is free under both specs
    assert rows["1_week"]["amp_month"] > 1.0
    assert rows["2_month"]["amp_month"] == 1.0
    # wider predicates match at least as many rows
    assert (
        rows["3_quarter"]["rows_match"]
        >= rows["2_month"]["rows_match"]
        >= rows["1_week"]["rows_match"]
    )


# ---------------------------------------------------------------------------
# round-12 batch 2: RHO-LOSS selection, IVM audit, WAP gate
# ---------------------------------------------------------------------------

import datetime
import hashlib


def _md5_holdout(doc_id: int) -> bool:
    from target_iceberg_spark.plans.curation_rho import RHO_HOLDOUT_HEX

    return hashlib.md5(str(doc_id).encode()).hexdigest()[0] in RHO_HOLDOUT_HEX


def test_rho_loss_ranks_learnable_above_common_and_noise(spark, tmp_path):
    """The RHO-LOSS axioms on a planted corpus: docs whose tokens are
    frequent in the holdout but rare in the pool (learnable, not yet
    learnt) take the top ranks; pool-memorized common docs sit near
    zero; gibberish (hard under BOTH models, harder under the holdout
    that never saw it) goes NEGATIVE — the noise-rejection property
    that plain loss-based selection lacks."""
    ids = list(range(4000))
    holdout_ids = [i for i in ids if _md5_holdout(i)]
    pool_ids = [i for i in ids if not _md5_holdout(i)]
    assert len(holdout_ids) >= 20 and len(pool_ids) >= 30

    learn = "alpha beta gamma delta epsilon zeta"
    common = "the cat sat on the mat and the dog ran"
    rows = []
    # holdout teaches `learn` heavily and knows `common`
    for i in holdout_ids[:16]:
        rows.append((i, learn))
    for i in holdout_ids[16:24]:
        rows.append((i, common))
    # pool: 2 learnable docs, 8 common docs, 3 gibberish docs
    learn_pool = pool_ids[:2]
    for i in learn_pool:
        rows.append((i, learn))
    for i in pool_ids[2:10]:
        rows.append((i, common))
    noise_pool = pool_ids[10:13]
    for i in noise_pool:
        rows.append((i, f"qq{i}x vv{i}y ww{i}z kk{i}w rr{i}v"))

    sf_dir = str(tmp_path / "sf_rho")
    spark.createDataFrame(
        [(i, text, "en", "s", len(text)) for i, text in rows],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    ).coalesce(1).write.parquet(f"{sf_dir}/documents.parquet")

    out = all_specs()["curation_rho_loss"].builder(spark, sf_dir).collect()
    by_id = {r["doc_id"]: r for r in out}
    # only pool docs are scored
    assert set(by_id) <= set(pool_ids)
    ranked = sorted(out, key=lambda r: (-r["rho"], r["doc_id"]))
    top_ids = {r["doc_id"] for r in ranked[: len(learn_pool)]}
    assert top_ids == set(learn_pool)
    for i in learn_pool:
        assert by_id[i]["rho"] > 0
    for i in noise_pool:
        assert by_id[i]["rho"] < 0  # noise rejected, not selected
        assert by_id[i]["ce_pool"] > 0


def test_rho_loss_top_k_limit(spark, sf_oracle):
    from target_iceberg_spark.plans.curation_rho import RHO_TOP_K

    out = all_specs()["curation_rho_loss"].builder(spark, sf_oracle)
    rows = out.collect()
    assert len(rows) <= RHO_TOP_K
    assert out.columns == [
        "doc_id", "source", "n_toks", "ce_pool", "ce_holdout", "rho",
    ]


def _write_orders(spark, tmp_path, rows, name):
    sf_dir = str(tmp_path / name)
    spark.createDataFrame(
        rows,
        "o_orderkey bigint, o_custkey bigint, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).coalesce(1).write.parquet(f"{sf_dir}/orders.parquet")
    return sf_dir


def test_ivm_audit_matches_recompute_and_retires_groups(spark, tmp_path):
    """Planted changelog: cust 1's only order is deleted (group must
    retire), cust 2's order is repriced (+10% reflected in cents),
    cust 3 gets a replayed insert, cust 4 is untouched — the
    incrementally-maintained MV must equal the recompute exactly."""
    d = datetime.datetime(2024, 1, 15)
    rows = [
        (97, 1, "O", 100.0, d, "1-URGENT"),   # %97 == 0 -> deleted
        (89, 2, "O", 200.0, d, "1-URGENT"),   # %89 == 0 -> repriced
        (83, 3, "O", 300.0, d, "1-URGENT"),   # %83 == 0 -> re-inserted
        (1, 4, "O", 50.0, d, "1-URGENT"),
        (2, 4, "O", 60.0, d, "1-URGENT"),
    ]
    sf_dir = _write_orders(spark, tmp_path, rows, "sf_ivm")
    out = all_specs()["cdc_incremental_agg"].builder(spark, sf_dir).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_mismatch"] == 0
    assert r["groups_retired"] == 1          # cust 1 count hit zero
    assert r["groups_with_delta"] == 3       # custs 1, 2, 3
    assert r["n_groups"] == 3                # custs 2, 3, 4 survive
    assert r["rows_after"] == 5              # 1 (c2) + 2 (c3) + 2 (c4)
    # cents: c2 220.00, c3 300 + 300, c4 50 + 60
    assert r["cents_after"] == 22000 + 60000 + 11000


def test_ivm_audit_green_on_corpus(spark, sf_oracle):
    r = all_specs()["cdc_incremental_agg"].builder(spark, sf_oracle).collect()[0]
    assert r["n_mismatch"] == 0
    assert r["groups_with_delta"] > 0
    assert r["rows_after"] > 0


def test_wap_audit_catches_planted_violations(spark, tmp_path):
    """A staged month with a replayed key, an intra-batch duplicate,
    a novel status and a negative total must fail exactly those
    checks and block the publish verdict."""
    pub_rows = []
    k = 0
    for month in (1, 2, 3, 4):
        for _ in range(10):
            k += 1
            pub_rows.append(
                (k, k, "O", 100.0, datetime.datetime(2024, month, 5), "1-URGENT")
            )
    staged = [
        # 8 clean rows (drift ratio 12/10 within [0.5, 2])
        (1000 + i, 500 + i, "O", 100.0, datetime.datetime(2024, 5, 5), "1-URGENT")
        for i in range(8)
    ] + [
        (1, 999, "O", 100.0, datetime.datetime(2024, 5, 6), "1-URGENT"),  # replay
        (2000, 998, "X", 100.0, datetime.datetime(2024, 5, 7), "1-URGENT"),  # novel
        (2000, 997, "O", -5.0, datetime.datetime(2024, 5, 8), "1-URGENT"),  # dup+neg
        (2001, 996, "O", None, datetime.datetime(2024, 5, 9), "1-URGENT"),  # null
    ]
    sf_dir = _write_orders(spark, tmp_path, pub_rows + staged, "sf_wap")
    out = {
        r["check_name"]: r
        for r in all_specs()["lakehouse_wap_audit"].builder(spark, sf_dir).collect()
    }
    assert set(out) == {
        "row_count_drift", "invalid_values", "duplicate_keys",
        "status_novelty", "publish",
    }
    assert out["row_count_drift"]["ok"] is True
    assert out["row_count_drift"]["observed"] == 1.2  # 12 staged / 10 mean
    # the negative total AND the NULL total (NULL <= 0 would silently
    # pass a bare comparison — both null arms are explicit)
    assert out["invalid_values"]["observed"] == 2.0
    assert out["invalid_values"]["ok"] is False
    # 1 replayed key + 2 rows sharing key 2000
    assert out["duplicate_keys"]["observed"] == 3.0
    assert out["duplicate_keys"]["ok"] is False
    assert out["status_novelty"]["observed"] == 1.0
    assert out["status_novelty"]["ok"] is False
    assert out["publish"]["observed"] == 3.0
    assert out["publish"]["ok"] is False


def test_wap_audit_passes_clean_batch(spark, tmp_path):
    pub_rows = []
    k = 0
    for month in (1, 2, 3, 4, 5):
        for _ in range(10):
            k += 1
            pub_rows.append(
                (k, k, "O", 100.0, datetime.datetime(2024, month, 5), "1-URGENT")
            )
    sf_dir = _write_orders(spark, tmp_path, pub_rows, "sf_wap_clean")
    out = {
        r["check_name"]: r
        for r in all_specs()["lakehouse_wap_audit"].builder(spark, sf_dir).collect()
    }
    assert all(r["ok"] for r in out.values())
    assert out["publish"]["observed"] == 0.0


def test_wap_drift_baseline_counts_missing_month_as_zero(spark, tmp_path):
    """An outage month inside the trailing window must DRAG the
    baseline down (gap = zero rows), not silently shift the window to
    older months: months {2,3,4} are the window for a month-5 batch,
    month 3 published nothing, so baseline = (10 + 0 + 10) / 3 and a
    21-row batch is a >2x drift violation."""
    rows = []
    k = 0
    for month, n in ((1, 10), (2, 10), (4, 10), (5, 21)):
        for _ in range(n):
            k += 1
            rows.append(
                (k, k, "O", 100.0, datetime.datetime(2024, month, 5), "1-URGENT")
            )
    sf_dir = _write_orders(spark, tmp_path, rows, "sf_wap_gap")
    out = {
        r["check_name"]: r
        for r in all_specs()["lakehouse_wap_audit"].builder(spark, sf_dir).collect()
    }
    assert out["row_count_drift"]["observed"] == 3.15  # 21 / (20/3)
    assert out["row_count_drift"]["ok"] is False
    assert out["publish"]["ok"] is False
