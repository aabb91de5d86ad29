"""Property-based round-trip tests for the DynamoDB-JSON codec
(hypothesis): serialize -> deserialize is identity modulo the documented
numeric policy (every number comes back float-valued, ints exact)."""

from __future__ import annotations

import math

from hypothesis import given, settings
from hypothesis import strategies as st

from cdc_from_sql_and_nosql_to_data_warehouse_spark.functions.dynamodb_json import (
    deserialize_item,
    deserialize_value,
    serialize_item,
    serialize_value,
)

# plain JSON-ish values: finite floats only (DynamoDB numbers are exact
# decimals; NaN/inf are unrepresentable on the wire)
scalars = st.one_of(
    st.none(),
    st.booleans(),
    st.integers(min_value=-(2**53), max_value=2**53),  # exact in double
    st.floats(allow_nan=False, allow_infinity=False, width=64),
    st.text(max_size=40),
)
values = st.recursive(
    scalars,
    lambda children: st.one_of(
        st.lists(children, max_size=5),
        st.dictionaries(st.text(min_size=1, max_size=10), children, max_size=5),
    ),
    max_leaves=20,
)


def _norm(v):
    """Expected post-roundtrip image: ints stay ints when float-exact
    (the codec returns int(f) for integral N values), floats stay."""
    if isinstance(v, bool) or v is None or isinstance(v, str):
        return v
    if isinstance(v, int):
        return v
    if isinstance(v, float):
        return int(v) if v.is_integer() else v
    if isinstance(v, list):
        return [_norm(x) for x in v]
    if isinstance(v, dict):
        return {k: _norm(x) for k, x in v.items()}
    return v


@settings(max_examples=200, deadline=None)
@given(values)
def test_roundtrip_value(v):
    assert deserialize_value(serialize_value(v)) == _norm(v)


@settings(max_examples=100, deadline=None)
@given(st.dictionaries(st.text(min_size=1, max_size=10), values, max_size=6))
def test_roundtrip_item(item):
    assert deserialize_item(serialize_item(item)) == _norm(item)


@settings(max_examples=100, deadline=None)
@given(st.floats(allow_nan=False, allow_infinity=False, width=64))
def test_number_wire_precision(f):
    # repr/float round-trip is lossless for doubles -> the T2 downcast
    # policy loses Decimal exactness but never double precision
    out = deserialize_value(serialize_value(f))
    assert out == f or (f.is_integer() and out == int(f))
