"""Iceberg catalog configuration — the engine twin of the reference's
config surface (reference target.py:15-59: aws key/secret, s3 endpoint,
bucket, REST catalog URI, catalog name, namespace).

The reference re-connects this catalog on EVERY batch
(reference sinks.py:43-65: load_catalog + S3 region resolution inside
process_batch). On Spark the same settings become session conf applied
ONCE; every writeTo against `catalog.namespace.table` then reuses the
live connection. ``iceberg_catalog_conf`` is a pure function so the
mapping is unit-testable without a real catalog or network.
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class IcebergCatalogConfig:
    """Mirrors the reference's 7 config properties (target.py:17-58)."""

    aws_access_key_id: str
    aws_secret_access_key: str  # required creds (target.py:20,26)
    s3_endpoint: str            # target.py:29-33
    s3_bucket: str = "lakehouse"  # default matches target.py:36-41
    iceberg_rest_uri: str = "http://localhost:8181"  # target.py:44-47
    iceberg_catalog_name: str = "lakehouse"  # target.py:50-53
    iceberg_namespace: str = "default"  # target.py:56-58


def iceberg_catalog_conf(cfg: IcebergCatalogConfig) -> dict[str, str]:
    """Spark session conf for an Iceberg REST catalog over S3 —
    the engine equivalent of the reference's per-batch
    ``load_catalog(uri=…, s3.endpoint=…, py-io-impl=…)`` call
    (sinks.py:55-65), minus the per-batch reconnect by construction."""
    cat = cfg.iceberg_catalog_name
    return {
        f"spark.sql.catalog.{cat}": "org.apache.iceberg.spark.SparkCatalog",
        f"spark.sql.catalog.{cat}.type": "rest",
        f"spark.sql.catalog.{cat}.uri": cfg.iceberg_rest_uri,
        f"spark.sql.catalog.{cat}.io-impl": "org.apache.iceberg.aws.s3.S3FileIO",
        f"spark.sql.catalog.{cat}.s3.endpoint": cfg.s3_endpoint,
        f"spark.sql.catalog.{cat}.warehouse": f"s3://{cfg.s3_bucket}/",
        f"spark.sql.catalog.{cat}.s3.access-key-id": cfg.aws_access_key_id,
        f"spark.sql.catalog.{cat}.s3.secret-access-key": cfg.aws_secret_access_key,
        "spark.sql.extensions": (
            "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions"
        ),
    }
