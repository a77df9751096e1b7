"""Schema-translator unit tests — one per FIXTURES.md §B fixture, each
exercising cited branches of the reference's converter
(/root/reference/target_iceberg/iceberg.py:9-134). Divergences marked ⚠
there are asserted in their *engine* (fixed) form here."""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DateType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from target_iceberg_spark.schema import json_schema_to_struct_type


def props(**kwargs):
    return {"properties": kwargs}


def test_b1_flat_primitives_and_level0_datetime():
    """FIXTURES B1 — iceberg.py:76-97."""
    st = json_schema_to_struct_type(
        props(
            id={"type": ["integer"]},
            score={"type": ["number", "null"]},
            active={"type": ["boolean", "null"]},
            name={"type": ["string", "null"]},
            signup_date={"type": ["string", "null"], "format": "date"},
            created_at={"type": ["string", "null"], "format": "date-time"},
        )
    )
    assert st == StructType(
        [
            StructField("id", LongType(), False),
            StructField("score", DoubleType(), True),
            StructField("active", BooleanType(), True),
            StructField("name", StringType(), True),
            StructField("signup_date", DateType(), True),  # ⚠ ref: date64
            StructField("created_at", TimestampType(), True),
        ]
    )


def test_b2_nested_datetime_stays_string():
    """FIXTURES B2 — iceberg.py:87-89,117-127: coercion only at level 0."""
    st = json_schema_to_struct_type(
        props(
            id={"type": ["integer"]},
            meta={
                "type": ["object", "null"],
                "properties": {
                    "created_at": {"type": ["string", "null"], "format": "date-time"},
                    "depth": {"type": ["integer", "null"]},
                },
            },
        )
    )
    meta = st["meta"].dataType
    assert isinstance(meta, StructType)
    assert meta["created_at"].dataType == StringType()  # replicated quirk
    assert meta["depth"].dataType == LongType()


def test_b3_arrays_including_struct_items():
    """FIXTURES B3 — iceberg.py:35-58,98-116."""
    st = json_schema_to_struct_type(
        props(
            tags={"type": ["array", "null"], "items": {"type": ["string"]}},
            points={
                "type": ["array", "null"],
                "items": {
                    "type": ["object"],
                    "properties": {"x": {"type": ["number"]}, "y": {"type": ["number"]}},
                },
            },
        )
    )
    assert st["tags"].dataType == ArrayType(StringType(), True)
    pts = st["points"].dataType
    assert isinstance(pts, ArrayType)
    assert isinstance(pts.elementType, StructType)
    assert pts.elementType["x"].dataType == DoubleType()


def test_b4_anyof_handling():
    """FIXTURES B4 — iceberg.py:12-33,39-41,70-74."""
    st = json_schema_to_struct_type(
        props(
            s_or_null={"anyOf": [{"type": "string", "format": "date-time"}, {"type": "null"}]},
            i_or_null={"anyOf": [{"type": "integer"}, {"type": "null"}]},
            untyped={},
        )
    )
    assert st["s_or_null"].dataType == TimestampType()  # string+format wins
    assert st["s_or_null"].nullable is True
    # ⚠ reference silently DROPS this field (iceberg.py:29-32); engine fixes:
    assert st["i_or_null"].dataType == LongType()
    assert st["i_or_null"].nullable is True
    assert st["untyped"].dataType == StringType()  # missing-type default


def test_b5_format_time_maps_to_string():
    """FIXTURES B5 — iceberg.py:92-93: reference crashes (pa.time64() with
    no unit); engine maps to StringType."""
    st = json_schema_to_struct_type(props(t={"type": ["string", "null"], "format": "time"}))
    assert st["t"].dataType == StringType()


def test_array_without_items_warns_to_string_elements():
    """iceberg.py:110-116 produces list<null>; engine diverges to string."""
    st = json_schema_to_struct_type(props(xs={"type": ["array", "null"]}))
    assert st["xs"].dataType == ArrayType(StringType(), True)


def test_empty_object_dropped():
    """iceberg.py:121-126: empty struct unsupported by parquet — dropped."""
    st = json_schema_to_struct_type(
        props(meta={"type": ["object"], "properties": {}}, id={"type": ["integer"]})
    )
    assert [f.name for f in st.fields] == ["id"]


def test_nullability_rule():
    """iceberg.py:77 et al.: nullable iff "null" in the type union."""
    st = json_schema_to_struct_type(
        props(a={"type": ["integer"]}, b={"type": ["integer", "null"]})
    )
    assert st["a"].nullable is False
    assert st["b"].nullable is True


def test_anyof_mixed_concrete_prefers_string():
    """anyOf with mixed concrete members keeps the string member,
    matching the reference (iceberg.py:29-33 retains only string/null):
    string is the only type every member's values can carry (ADVICE r1)."""
    st = json_schema_to_struct_type(
        props(
            v={"anyOf": [{"type": "integer"}, {"type": "string"}]},
            v_null={"anyOf": [{"type": "integer"}, {"type": "string"}, {"type": "null"}]},
        )
    )
    assert st["v"].dataType == StringType()
    assert st["v_null"].dataType == StringType()
    assert st["v_null"].nullable is True
