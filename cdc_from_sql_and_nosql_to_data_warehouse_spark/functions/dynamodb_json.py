"""DynamoDB wire-typed JSON decoding (T1) + Decimal->float policy (T2).

The reference decodes stream ``NewImage`` payloads with boto3's
``TypeDeserializer`` (``write_dynamodb_stream_to_s3_lambda/handler.py:29``):
a tree where every value is tagged with its wire type —
``{"S": "abc"}``, ``{"N": "110.07"}``, ``{"M": {...}}``, ``{"L": [...]}``,
``{"BOOL": true}``, ``{"NULL": true}`` — and numbers arrive as *strings*.
It then downcasts Decimal to float when serializing to NDJSON
(``handler.py:15-19``), so warehouse numeric fidelity is double (T2).

Spark-first design: for a **known target schema** (the normal warehouse
case — fixed DDL at ``load_s3_files...handler.py:74-82``) we derive the
wire-side schema mechanically, parse with ``from_json`` (JVM, codegen),
and strip the type tags with pure column expressions — zero Python in the
hot path, works at any scale. A row-level Python ``deserialize_item`` is
kept for tests and for schema discovery on unknown payloads.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

_NUMERIC = (
    T.ByteType,
    T.ShortType,
    T.IntegerType,
    T.LongType,
    T.FloatType,
    T.DoubleType,
    T.DecimalType,
)


def wire_schema_for(dt: T.DataType) -> T.DataType:
    """Target type -> schema of its DynamoDB-JSON encoding.

    ``price: double`` is encoded as ``{"N": "110.07"}`` so its wire schema
    is ``struct<N: string>``; structs nest under ``M``, arrays under ``L``.
    """
    if isinstance(dt, T.StructType):
        return T.StructType(
            [
                T.StructField(
                    "M",
                    T.StructType(
                        [
                            T.StructField(f.name, wire_schema_for(f.dataType), True)
                            for f in dt.fields
                        ]
                    ),
                    True,
                )
            ]
        )
    if isinstance(dt, T.ArrayType):
        return T.StructType(
            [T.StructField("L", T.ArrayType(wire_schema_for(dt.elementType)), True)]
        )
    if isinstance(dt, T.BooleanType):
        return T.StructType([T.StructField("BOOL", T.BooleanType(), True)])
    if isinstance(dt, _NUMERIC):
        # numbers travel as strings under "N"
        return T.StructType([T.StructField("N", T.StringType(), True)])
    if isinstance(dt, T.BinaryType):
        return T.StructType([T.StructField("B", T.StringType(), True)])
    # strings, timestamps-as-strings, everything else -> "S"
    return T.StructType([T.StructField("S", T.StringType(), True)])


def _unwrap(col: Column, dt: T.DataType) -> Column:
    """Strip the wire tag from ``col`` (typed per ``wire_schema_for``)."""
    if isinstance(dt, T.StructType):
        return F.when(
            col.getField("M").isNotNull(),
            F.struct(
                *[
                    _unwrap(col.getField("M").getField(f.name), f.dataType).alias(
                        f.name
                    )
                    for f in dt.fields
                ]
            ),
        )
    if isinstance(dt, T.ArrayType):
        return F.transform(col.getField("L"), lambda x: _unwrap(x, dt.elementType))
    if isinstance(dt, T.BooleanType):
        return col.getField("BOOL")
    if isinstance(dt, _NUMERIC):
        return col.getField("N").cast(dt)
    if isinstance(dt, T.BinaryType):
        return F.unbase64(col.getField("B"))
    return col.getField("S").cast(dt)


def decode_dynamodb_json(json_col, target_schema: T.StructType) -> Column:
    """Wire-typed JSON string column -> typed struct column.

    JVM-only pipeline: ``from_json`` with the derived wire schema, then
    tag-stripping expressions. Numeric leaves land as the target type via
    string cast, which realizes the reference's Decimal->float policy
    (T2) when the target type is double/float.
    """
    col = F.col(json_col) if isinstance(json_col, str) else json_col
    wire_root = T.StructType(
        [
            T.StructField(f.name, wire_schema_for(f.dataType), True)
            for f in target_schema.fields
        ]
    )
    parsed = F.from_json(col, wire_root)
    return F.struct(
        *[
            _unwrap(parsed.getField(f.name), f.dataType).alias(f.name)
            for f in target_schema.fields
        ]
    )


# ---------------------------------------------------------------------------
# Row-level decoder — for tests, fixtures, and schema discovery on unknown
# payloads. NOT for the hot path (use decode_dynamodb_json).
# ---------------------------------------------------------------------------
def deserialize_value(tagged: dict[str, Any]) -> Any:
    """One wire-typed value -> plain Python value (numbers as float — the
    reference's Decimal->float downcast, T2)."""
    if not isinstance(tagged, dict) or len(tagged) != 1:
        raise ValueError(f"not a DynamoDB wire value: {tagged!r}")
    tag, v = next(iter(tagged.items()))
    if tag == "S":
        return v
    if tag == "N":
        f = float(v)
        return int(f) if f.is_integer() else f
    if tag == "BOOL":
        return bool(v)
    if tag == "NULL":
        return None
    if tag == "M":
        return {k: deserialize_value(x) for k, x in v.items()}
    if tag == "L":
        return [deserialize_value(x) for x in v]
    if tag == "SS" or tag == "NS":
        return [float(x) if tag == "NS" else x for x in v]
    raise ValueError(f"unsupported wire tag: {tag}")


def deserialize_item(item: dict[str, Any]) -> dict[str, Any]:
    """A whole NewImage (map of attr -> tagged value) -> plain dict."""
    return {k: deserialize_value(v) for k, v in item.items()}


def serialize_value(value: Any) -> dict[str, Any]:
    """Plain Python value -> wire-typed value (fixture generation)."""
    if value is None:
        return {"NULL": True}
    if isinstance(value, bool):
        return {"BOOL": value}
    if isinstance(value, (int, float)):
        return {"N": repr(value)}
    if isinstance(value, str):
        return {"S": value}
    if isinstance(value, dict):
        return {"M": {k: serialize_value(v) for k, v in value.items()}}
    if isinstance(value, (list, tuple)):
        return {"L": [serialize_value(v) for v in value]}
    raise ValueError(f"unsupported value for DynamoDB wire format: {value!r}")


def serialize_item(item: dict[str, Any]) -> dict[str, Any]:
    return {k: serialize_value(v) for k, v in item.items()}
