"""target_iceberg_spark — a PySpark-native analytics engine.

A ground-up, Spark-first re-expression of the capabilities of
SidetrekAI/target-iceberg (a Singer target that loads JSONL streams into
Apache Iceberg tables; see SURVEY.md), extended with the relational query
surface and LLM-data-pipeline operators (dedup, similarity search, text
analysis, multimodal columns) a large-scale training-data pipeline needs.

Layout:
  session    - SparkSession factory tuned for the engine (AQE, UTC, Arrow)
  schema     - Singer JSON Schema -> Spark StructType translator
               (parity port of reference target_iceberg/iceberg.py:9-134)
  writer     - stream -> table sink: namespace/table DDL + append/upsert
               (parity port of reference target_iceberg/sinks.py:36-100)
  sources/   - test-table loader, Singer JSONL message demux
  functions/ - reusable Column-expression helpers (similarity, text, hashing)
  operators/ - composite operators (as-of join, dedup families, ANN search)
  plans/     - the named query catalog: every operator exposed as a
               (spark, sf_dir) -> DataFrame builder plus its DuckDB oracle SQL
  streaming/ - Structured Streaming pipelines (windows, watermark, sinks)
"""

__version__ = "0.1.0"
