"""Property-based tests (hypothesis) for the schema translator:
arbitrary well-formed Singer JSON Schemas must translate without
crashing, and the reference's nullability rule must hold wherever it
is well-defined (SURVEY §1.2: nullable iff "null" in the type union,
reference iceberg.py:77 et al.)."""

from __future__ import annotations

import hypothesis.strategies as st
from hypothesis import given, settings
from pyspark.sql.types import StringType, StructType, TimestampType

from target_iceberg_spark.schema import json_schema_to_struct_type

_names = st.from_regex(r"[a-z][a-z0-9_]{0,7}", fullmatch=True)

_primitive = st.fixed_dictionaries(
    {
        "type": st.lists(
            st.sampled_from(["integer", "number", "boolean", "string", "null"]),
            min_size=1,
            max_size=3,
            unique=True,
        )
    },
    optional={"format": st.sampled_from(["date", "time", "date-time", "uuid"])},
)

_node = st.recursive(
    _primitive,
    lambda children: st.one_of(
        st.fixed_dictionaries(
            {"type": st.just(["array", "null"]), "items": children}
        ),
        st.fixed_dictionaries(
            {
                "type": st.just(["object", "null"]),
                "properties": st.dictionaries(_names, children, max_size=3),
            }
        ),
        st.fixed_dictionaries(
            {"anyOf": st.lists(children, min_size=1, max_size=3)}
        ),
    ),
    max_leaves=8,
)

_schema = st.fixed_dictionaries(
    {"properties": st.dictionaries(_names, _node, max_size=5)}
)


@given(_schema)
@settings(max_examples=200, deadline=None)
def test_translator_never_crashes(schema):
    st_type = json_schema_to_struct_type(schema)
    assert isinstance(st_type, StructType)
    # no duplicate field names, all fields named from the input
    names = [f.name for f in st_type.fields]
    assert len(names) == len(set(names))
    assert set(names) <= set(schema["properties"].keys())


@given(_schema)
@settings(max_examples=200, deadline=None)
def test_nullability_rule_holds_for_direct_types(schema):
    st_type = json_schema_to_struct_type(schema)
    by_name = {f.name: f for f in st_type.fields}
    for name, prop in schema["properties"].items():
        types = prop.get("type")
        if not isinstance(types, list) or name not in by_name:
            continue
        concrete = [t for t in types if t != "null"]
        if not concrete:
            continue  # pure-null falls back to nullable string by design
        assert by_name[name].nullable == ("null" in types), name


@given(st.sampled_from(["date-time", "uuid", "custom-format"]))
def test_format_coercion_only_at_top_level(fmt):
    schema = {
        "properties": {
            "top": {"type": ["string", "null"], "format": fmt},
            "wrap": {
                "type": ["object", "null"],
                "properties": {"inner": {"type": ["string", "null"], "format": fmt}},
            },
        }
    }
    st_type = json_schema_to_struct_type(schema)
    assert st_type["top"].dataType == TimestampType()
    inner = st_type["wrap"].dataType["inner"].dataType
    assert inner == StringType()  # replicated reference quirk (iceberg.py:87-89)


# -- Misra-Gries survival guarantee (operators/heavy_hitters.py) ---------


@settings(max_examples=200, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=30), min_size=1, max_size=400),
    st.integers(min_value=2, max_value=12),
    st.integers(min_value=0, max_value=400),
)
def test_misra_gries_survival_guarantee(values, capacity, split):
    """Textbook MG theorem, pinned: after one streaming pass with
    ``capacity`` counters, every key whose true frequency exceeds
    n/(capacity+1) is in the sketch — regardless of where the Arrow
    batch boundary falls (the sketch must carry across batches).
    Drives the mapInPandas body directly, no Spark session needed."""
    import pandas as pd

    from target_iceberg_spark.operators.heavy_hitters import _mg_batches

    tokens = [str(v) for v in values]
    cut = min(split, len(tokens))
    batches = [
        pd.DataFrame({"token": part})
        for part in (tokens[:cut], tokens[cut:])
        if part
    ]
    out = list(_mg_batches(capacity)(iter(batches)))
    survivors = set(out[0]["token"])
    n = len(tokens)
    from collections import Counter

    for key, freq in Counter(tokens).items():
        if freq > n / (capacity + 1):
            assert key in survivors, (
                f"freq({key})={freq} > {n}/({capacity}+1) but evicted"
            )
    assert len(survivors) <= capacity
