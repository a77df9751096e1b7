"""Source/sink format breadth: the engine reads and writes CSV and
JSONL through Spark's native sources with explicit schemas (no
inference jobs — at scale, schema inference is a full extra scan)."""

from __future__ import annotations

from target_iceberg_spark.sources.tables import load_table


def test_csv_round_trip(spark, sf_smoke, tmp_path):
    docs = load_table(spark, sf_smoke, "documents")
    out = str(tmp_path / "docs_csv")
    docs.write.option("header", True).option("quoteAll", True).csv(out)
    back = (
        spark.read.option("header", True)
        .schema("doc_id long, text string, lang string, source string, n_chars long")
        .csv(out)
    )
    assert back.count() == docs.count()
    assert back.where("lang = 'en'").count() == docs.where("lang = 'en'").count()


def test_jsonl_round_trip(spark, sf_smoke, tmp_path):
    ev = load_table(spark, sf_smoke, "events").drop("ts")  # ts covered elsewhere
    out = str(tmp_path / "events_jsonl")
    ev.write.json(out)
    back = spark.read.schema(
        "event_id long, user_id long, event_type string, value double, props string"
    ).json(out)
    assert back.count() == ev.count()
    got = back.groupBy("event_type").count().collect()
    want = ev.groupBy("event_type").count().collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))


def test_orc_round_trip(spark, sf_smoke, tmp_path):
    """ORC source/sink parity with the parquet-loaded frame."""
    from target_iceberg_spark.sources.tables import load_table

    docs = load_table(spark, sf_smoke, "documents")
    path = str(tmp_path / "docs_orc")
    docs.write.orc(path)
    back = spark.read.orc(path)
    assert back.count() == docs.count()
    assert dict(back.dtypes) == dict(docs.dtypes)


def test_merge_schema_read_across_evolved_files(spark, tmp_path):
    """Read-side schema evolution: mergeSchema=true unions file schemas
    (old files surface NULL for columns they predate) — the read-path
    complement of the writer's additive evolution."""
    import pyspark.sql.functions as F

    d = str(tmp_path / "evolving")
    spark.range(3).select(F.col("id"), F.lit("a").alias("v1")).write.parquet(
        d + "/f1"
    )
    spark.range(3, 5).select(
        F.col("id"), F.lit("b").alias("v1"), F.lit(1.5).alias("v2")
    ).write.parquet(d + "/f2")
    merged = spark.read.option("mergeSchema", "true").parquet(d + "/f1", d + "/f2")
    assert set(merged.columns) == {"id", "v1", "v2"}
    rows = {r["id"]: (r["v1"], r["v2"]) for r in merged.collect()}
    assert rows[0] == ("a", None) and rows[4] == ("b", 1.5)


def test_derived_source_sweeps_stale_generation(spark, sf_smoke, tmp_path):
    """A copy derived from a PREVIOUS testdata generation (same table,
    same sf key, different 16-hex fingerprint) must be removed when a
    fresh derivation publishes — the regex must match the REAL
    fingerprint width (it silently matched nothing when it expected 32
    hex chars, leaking every old generation forever)."""
    import os

    from target_iceberg_spark.plans.scans import _derived_nation_source

    src = _derived_nation_source(spark, sf_smoke, "jsonl")
    parent, base = os.path.split(src)
    stale = os.path.join(parent, base.replace(base.split("_")[-1], "0" * 16 + ".jsonl"))
    assert stale != src
    os.makedirs(stale, exist_ok=True)
    # force a re-derivation by removing the current copy (cheap at smoke SF)
    import shutil

    shutil.rmtree(src)
    src2 = _derived_nation_source(spark, sf_smoke, "jsonl")
    assert src2 == src and os.path.isdir(src2)
    assert not os.path.exists(stale), "stale-generation sweep did not fire"
