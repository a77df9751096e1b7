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
