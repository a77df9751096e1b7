"""QUERIES.md must match the registry (regenerate with
`python -m target_iceberg_spark.plans.catalog`)."""

import os

from target_iceberg_spark.plans.catalog import render


def test_queries_md_is_current():
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "QUERIES.md")
    with open(path) as fh:
        on_disk = fh.read()
    assert on_disk == render(), (
        "QUERIES.md is stale — run `python -m target_iceberg_spark.plans.catalog`"
    )
