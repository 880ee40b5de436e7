"""Typed schema declaration — the engine's equivalent of ``OrcSchema``.

The reference declares schemas as parallel arrays of field names and
Flink ``TypeInformation`` and renders an ORC DDL string
``struct<name:type,...>`` (``OrcSchema.java:12-20,35-43``). Spark's
native equivalent is ``StructType`` / DDL schema strings; this module
provides the same ten-type surface (``OrcSchema.java:45-57``) with the
reference's documented quirks fixed (SURVEY.md §1.4):

- BOOLEAN maps to a real boolean (reference write path is broken,
  ``RowOrcWriter.java:76-81``).
- SHORT maps to smallint, not the narrowing tinyint (``OrcSchema.java:50``).
- DECIMAL has a fixed (precision, scale) in the schema rather than
  per-row values (``RowOrcWriter.java:103-104``).
- No implicit string→number coercion (``RowOrcWriter.java:81,86``);
  callers cast explicitly.

Schemas are flat (the reference supports exactly one nesting level,
``OrcSchema.java:39-42``) but this module accepts nested Spark types
too — flatness is the reference's limitation, not ours.
"""

from __future__ import annotations

from pyspark.sql import types as T

# The ten reference types (OrcSchema.java:45-57) → Spark types.
# Key is the reference's Flink TypeInformation name, lowercased.
REFERENCE_TYPE_MAP: dict[str, T.DataType] = {
    "boolean": T.BooleanType(),
    "byte": T.ByteType(),
    "short": T.ShortType(),
    "int": T.IntegerType(),
    "long": T.LongType(),
    "float": T.FloatType(),
    "double": T.DoubleType(),
    "string": T.StringType(),
    "big_dec": T.DecimalType(18, 4),
    "sql_timestamp": T.TimestampType(),
}


def make_schema(
    fields: list[str],
    types: list[T.DataType | str],
    nullable: bool = True,
) -> T.StructType:
    """Build a ``StructType`` from parallel name/type arrays.

    Mirrors ``OrcSchema(String[] fieldNames, TypeInformation[] typeInfos)``
    (``OrcSchema.java:16-20``) including its all-nullable semantics
    (``RowOrcWriter.java:110-113`` marks any column nullable on write).

    ``types`` entries may be Spark ``DataType`` instances, DDL strings
    ("int", "decimal(18,4)"), or reference type names ("big_dec").
    """
    if len(fields) != len(types):
        raise ValueError(
            f"fields ({len(fields)}) and types ({len(types)}) must be parallel arrays"
        )
    resolved: list[T.DataType] = []
    for t in types:
        if isinstance(t, T.DataType):
            resolved.append(t)
        elif t.lower() in REFERENCE_TYPE_MAP:
            resolved.append(REFERENCE_TYPE_MAP[t.lower()])
        else:
            resolved.append(T._parse_datatype_string(t))
    return T.StructType(
        [T.StructField(n, t, nullable) for n, t in zip(fields, resolved)]
    )


def to_ddl(schema: T.StructType) -> str:
    """Render a schema as a DDL string (``"a INT, b STRING"``).

    The Spark-native analogue of ``OrcSchema.getSchemaString()``'s
    ``struct<a:int,b:string>`` rendering (``OrcSchema.java:35-43``);
    Spark accepts this string anywhere a schema is expected.
    """
    return ", ".join(
        f"{f.name} {f.dataType.simpleString().upper()}" for f in schema.fields
    )


def orc_struct_string(schema: T.StructType) -> str:
    """Render the exact ``struct<name:type,...>`` form the reference
    feeds to ``TypeDescription.fromString`` (``RowOrcWriter.java:35``),
    for interop tests against independent ORC readers."""
    inner = ",".join(f"{f.name}:{f.dataType.simpleString()}" for f in schema.fields)
    return f"struct<{inner}>"
