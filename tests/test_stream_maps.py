"""Stream-map + flattening tests (reference capabilities A13/A14)."""

from __future__ import annotations

from target_iceberg_spark.operators.stream_maps import (
    StreamMap,
    apply_stream_map,
    flatten_records,
)


def _df(spark):
    return spark.createDataFrame(
        [(1, "alice", 10.0, {"city": "x", "geo": {"lat": 1.5}}),
         (2, "bob", -3.0, {"city": "y", "geo": {"lat": 2.5}})],
        "id long, name string, score double, addr struct<city:string, geo:struct<lat:double>>",
    )


def test_stream_map_filter_derive_rename_drop(spark):
    smap = StreamMap(
        filter="score > 0",
        columns={"name_upper": "upper(name)", "score2": "score * 2"},
        drop=("name",),
    )
    out = apply_stream_map(_df(spark), smap)
    rows = out.collect()
    assert len(rows) == 1
    assert rows[0]["name_upper"] == "ALICE"
    assert rows[0]["score2"] == 20.0
    assert "name" not in out.columns


def test_stream_map_exclusive_projection(spark):
    smap = StreamMap(columns={"key": "id", "label": "concat(name, '!')"}, keep_rest=False)
    out = apply_stream_map(_df(spark), smap)
    assert out.columns == ["key", "label"]


def test_flatten_depth_two(spark):
    out = flatten_records(_df(spark), max_depth=2)
    assert set(out.columns) == {"id", "name", "score", "addr__city", "addr__geo__lat"}
    assert out.where("addr__geo__lat = 1.5").count() == 1


def test_flatten_depth_one_leaves_inner_struct(spark):
    out = flatten_records(_df(spark), max_depth=1)
    assert "addr__city" in out.columns
    assert "addr__geo" in out.columns  # still a struct at the depth limit
    assert dict(out.dtypes)["addr__geo"].startswith("struct")