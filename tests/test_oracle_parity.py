"""Every oracle-backed plan must match DuckDB at the driver's scale
(sf0.01) — the same check CORRECTNESS_r{N}.json records."""

from __future__ import annotations

import pytest

from target_iceberg_spark.plans import all_specs
from tests.oracle_harness import check_query

SPECS = all_specs()


def _oracle_for(name: str, sf_dir: str) -> str:
    """The registered oracle, except where the SQL must be
    re-instantiated for the fixture's corpus-sized knobs:
    sim_reciprocal_knn's static oracle pins the RKNN_MIN_BITS LSH
    blocking (valid while embeddings <= 512 vectors — every
    driver-checked SF); at bigger fixtures (ENGINE_TEST_SF_DIR=sf0.1+)
    regenerate it at rknn_bits(N), exactly as the module docstring
    prescribes and tests/test_round9_ops.py exercises."""
    if name == "sim_reciprocal_knn":
        import duckdb

        from target_iceberg_spark.plans.similarity_mutual import (
            _rknn_oracle,
            rknn_bits,
        )

        n = duckdb.sql(
            f"SELECT COUNT(*) FROM '{sf_dir}/embeddings.parquet'"
        ).fetchone()[0]
        return _rknn_oracle(rknn_bits(n))
    return SPECS[name].oracle


@pytest.mark.parametrize("name", [n for n, s in SPECS.items() if s.oracle])
def test_oracle_parity(spark, sf_oracle, name):
    spec = SPECS[name]
    check_query(spark, sf_oracle, name, spec.builder, _oracle_for(name, sf_oracle))


@pytest.mark.parametrize("name", [n for n, s in SPECS.items() if not s.oracle])
def test_rows_only_builds(spark, sf_oracle, name):
    spec = SPECS[name]
    df = spec.builder(spark, sf_oracle)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
