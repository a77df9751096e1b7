"""Round-13 operator tests: semantic eval-set decontamination."""

from __future__ import annotations

import math

import pyspark.sql.functions as F

from target_iceberg_spark.plans.curation_semantic_decontam import (
    DECON_PLANT_OFFSET,
    DECON_RECALL_FLOOR,
    DECON_TAU,
)
from target_iceberg_spark.plans.registry import all_specs

SF_DIR = "/root/testdata/sf0.01"


def _report(spark):
    return {
        r["source"]: r
        for r in all_specs()["curation_semantic_decontam"]
        .builder(spark, SF_DIR)
        .collect()
    }


def test_planted_recall_floor_holds(spark):
    """Every planted near-duplicate has cosine ~0.999 to its origin
    (the scaling perturbation bounds the Rayleigh quotient at
    0.95/1.05), so the detector must catch essentially all of them —
    the report's '_planted' row IS the recall and must clear the
    floor, and recall_ok must be TRUE on every row."""
    out = _report(spark)
    planted = out["_planted"]
    assert planted["n_pool"] > 0
    assert planted["contamination_rate"] >= DECON_RECALL_FLOOR
    # the perturbed copies sit at cosine ~0.999 >> tau: expect full
    # recall, not just the floor
    assert planted["n_contaminated"] == planted["n_pool"]
    assert all(r["recall_ok"] for r in out.values())


def test_report_covers_every_source_and_counts_reconcile(spark):
    """The report partitions the pool: per-source n_pool sums to
    |non-eval vectors joined to documents| + |planted|, and rates are
    n_contaminated / n_pool exactly (portable 6-dp rounding)."""
    out = _report(spark)
    assert "_planted" in out
    real_sources = {s for s in out if s != "_planted"}
    assert real_sources  # documents' sources are represented
    for r in out.values():
        assert 0 <= r["n_contaminated"] <= r["n_pool"]
        expect = math.floor(r["n_contaminated"] / r["n_pool"] * 1e6 + 0.5) / 1e6
        assert abs(r["contamination_rate"] - expect) < 1e-12


def test_planted_copies_score_above_tau_individually(spark):
    """Plan-level check of the planted construction itself: every
    planted pool row's max cosine against the eval set is >= tau (its
    origin is IN the eval set), so detection cannot depend on luck."""
    spec = all_specs()["curation_semantic_decontam"]
    df = spec.builder(spark, SF_DIR)
    # the registered query already reduces to per-source rows; rebuild
    # the per-doc frame via the module's own internals would duplicate
    # the plan, so assert through the report: _planted is fully caught
    planted = {r["source"]: r for r in df.collect()}["_planted"]
    assert planted["n_contaminated"] == planted["n_pool"]
    assert DECON_TAU == 0.9 and DECON_PLANT_OFFSET >= 1_000_000


def test_eval_rows_never_appear_in_pool(spark):
    """Split hygiene: no real pool row carries an eval vec_id, and
    planted ids are offset out of the real id space entirely."""
    from target_iceberg_spark.functions.hashing import md5_quarter
    from target_iceberg_spark.plans.curation_semantic_decontam import (
        DECON_EVAL_HEX,
        DECON_EVAL_ID_CAP,
    )
    from target_iceberg_spark.sources.tables import load_table

    emb = load_table(spark, SF_DIR, "embeddings")
    n_eval = emb.where(
        (F.col("vec_id") < DECON_EVAL_ID_CAP)
        & md5_quarter(F.col("vec_id"), DECON_EVAL_HEX)
    ).count()
    n_total = emb.count()
    out = _report(spark)
    n_pool_real = sum(r["n_pool"] for s, r in out.items() if s != "_planted")
    # every non-eval embedding joins to a document at this SF
    assert n_pool_real == n_total - n_eval
