import os, sys, time, json
sys.path.insert(0, '/root/repo')
from target_iceberg_spark.plans.registry import all_specs
from target_iceberg_spark.session import get_spark
spark = get_spark("scan-census")
specs = all_specs()
sf = "/root/testdata/sf0.1"
out = {}
for name, spec in sorted(specs.items()):
    if not spec.bench:
        continue
    try:
        df = spec.builder(spark, sf)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        out[name] = {
            "scans": plan.count("Scan parquet"),
            "exchanges": plan.count("Exchange"),
            "lines": plan.count("\n"),
            "existing_rdd": plan.count("ExistingRDD"),
        }
    except Exception as exc:
        out[name] = {"error": str(exc)[:100]}
json.dump(out, open("/tmp/scan_census.json", "w"), indent=1)
print("done", len(out))
