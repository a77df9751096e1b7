from target_iceberg_spark.plans.registry import all_specs, oracle_sql, queries

__all__ = ["all_specs", "oracle_sql", "queries"]
