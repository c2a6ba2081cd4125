"""Type-coercion scalars: primitivize (F7), epoch→ISO datetime (F8),
null/empty-string handling — all native Column expressions.

Reference semantics:
- ``primitivize`` (`/root/reference/amaxa/amaxa.py:349-375`): booleans
  accept yes/no/y/n/t/f/true/false/1/0/"" (case-insensitive), empty
  string → null, unknown types → null;
- Bulk-JSON datetimes arrive as epoch millis and are rendered ISO-8601
  with milliseconds and a literal ``+0000``
  (`/root/reference/amaxa/api.py:150-164`).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_TRUE = ["true", "t", "yes", "y", "1"]
_FALSE = ["false", "f", "no", "n", "0", ""]


def coerce_boolean(col: Column) -> Column:
    """Boolean coercion with the reference's equivalence classes
    (`amaxa/amaxa.py:353-358`); unrecognized values → null."""
    low = F.lower(F.trim(col.cast("string")))
    return (
        F.when(low.isin(_TRUE), F.lit(True))
        .when(low.isin(_FALSE), F.lit(False))
        .otherwise(F.lit(None).cast("boolean"))
    )


def empty_to_null(col: Column) -> Column:
    """`""` → null on load (`amaxa/amaxa.py:359`)."""
    return F.nullif(col, F.lit(""))


def epoch_ms_to_iso(col: Column) -> Column:
    """Epoch-millis → `yyyy-MM-ddTHH:mm:ss.SSS+0000`
    (`amaxa/api.py:150-164`). Input: long millis."""
    return F.date_format(
        F.timestamp_millis(col.cast("long")), "yyyy-MM-dd'T'HH:mm:ss.SSS'+0000'"
    )


def format_errors(
    code: Column, message: Column, fields: Column | None = None
) -> Column:
    """F10 — error formatter: join error struct fields into one
    message string (`amaxa/amaxa.py:515-528` joins Bulk-API error
    structs as 'CODE: message (fields)')."""
    base = F.concat_ws(": ", code, message)
    if fields is None:
        return base
    return F.when(
        fields.isNotNull() & (F.size(fields) > 0),
        F.concat(base, F.lit(" ("), F.concat_ws(", ", fields), F.lit(")")),
    ).otherwise(base)


def primitivize(col: Column, type_name: str) -> Column:
    """Schema-driven coercion (F7). ``type_name`` comes from the
    registry's ``TableMeta.types``; unknown types → null
    (`amaxa/amaxa.py:372`)."""
    t = (type_name or "").lower()
    if t in ("boolean", "xsd:boolean"):
        return coerce_boolean(col)
    if t in ("int", "xsd:int"):
        return empty_to_null(col.cast("string")).cast("int")
    if t in ("double", "currency", "percent", "xsd:double"):
        return empty_to_null(col.cast("string")).cast("double")
    if t in ("date", "xsd:date"):
        return empty_to_null(col.cast("string")).cast("date")
    if t in ("datetime", "xsd:datetime"):
        return empty_to_null(col.cast("string")).cast("timestamp")
    if t in (
        "string",
        "id",
        "reference",
        "textarea",
        "phone",
        "url",
        "picklist",
        "email",
        "xsd:string",
        "tns:id",
    ):
        return empty_to_null(col.cast("string"))
    # compound / binary / unknown soap types → null (`amaxa/amaxa.py:372`;
    # address/location/base64 exclusion `loader/core.py:243-248`)
    return F.lit(None).cast("string")
