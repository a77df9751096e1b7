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
