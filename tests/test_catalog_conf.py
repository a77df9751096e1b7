"""Iceberg catalog conf mapping (pure function; no network)."""

from target_iceberg_spark.catalog import IcebergCatalogConfig, iceberg_catalog_conf


def test_catalog_conf_mapping():
    cfg = IcebergCatalogConfig(
        aws_access_key_id="AK",
        aws_secret_access_key="SK",
        s3_endpoint="http://minio:9000",
        s3_bucket="lake",
        iceberg_rest_uri="http://rest:8181",
        iceberg_catalog_name="mycat",
        iceberg_namespace="raw",
    )
    conf = iceberg_catalog_conf(cfg)
    assert conf["spark.sql.catalog.mycat"].endswith("SparkCatalog")
    assert conf["spark.sql.catalog.mycat.type"] == "rest"
    assert conf["spark.sql.catalog.mycat.uri"] == "http://rest:8181"
    assert conf["spark.sql.catalog.mycat.s3.endpoint"] == "http://minio:9000"
    assert conf["spark.sql.catalog.mycat.warehouse"] == "s3://lake/"
    # one entry per reference config property + engine extensions
    assert len(conf) == 9
