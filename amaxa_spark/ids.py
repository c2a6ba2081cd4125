"""Salesforce-style record IDs: 15→18 canonicalization and key prefixes.

The one custom scalar type of the reference engine (see
`/root/reference/amaxa/amaxa.py:55-91`, tests
`test/test_unit/test_SalesforceId.py`): a 15-char case-sensitive ID is
canonicalized to an 18-char case-insensitive form by appending a 3-char
checksum — each of the three 5-char chunks contributes one character,
indexed from a 32-char alphabet by a 5-bit mask of "is uppercase letter"
per position. The algorithm itself is public Salesforce documentation.

The engine applies normalization at ingestion so that all joins compare
canonical 18-char strings. Unlike the reference's per-object Python
method, ``normalize_sfid_col`` is a pure Column-expression chain —
JVM-side, whole-stage-codegen friendly, no Python UDF in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_ALPHABET = "ABCDEFGHIJKLMNOPQRSTUVWXYZ012345"

KEY_PREFIX_LEN = 3


def normalize_sfid(value: str) -> str:
    """Driver-side 15→18 canonicalization (reference parity helper)."""
    if value is None:
        return None
    value = str(value)
    if len(value) == 18:
        # Canonicalize case of the suffix.
        return value[:15] + value[15:].upper()
    if len(value) != 15:
        raise ValueError(f"not a valid Salesforce ID: {value!r}")
    out = value
    for chunk in range(3):
        bits = 0
        for i in range(5):
            ch = value[chunk * 5 + i]
            if "A" <= ch <= "Z":
                bits |= 1 << i
        out += _ALPHABET[bits]
    return out


def normalize_sfid_col(col: Column) -> Column:
    """15→18 normalization as a native Column expression (no UDF).

    18-char inputs pass through with the checksum uppercased; 15-char
    inputs get the 3-char suffix appended; anything else → null.
    """
    alpha_arr = F.array(*[F.lit(c) for c in _ALPHABET])

    def chunk_char(chunk: int) -> Column:
        bits = F.lit(0)
        for i in range(5):
            ch = F.substring(col, chunk * 5 + i + 1, 1)
            is_upper = (ch >= "A") & (ch <= "Z")
            bits = bits + F.when(is_upper, F.lit(1 << i)).otherwise(F.lit(0))
        return F.element_at(alpha_arr, bits + 1)

    suffix = F.concat(chunk_char(0), chunk_char(1), chunk_char(2))
    return (
        F.when(col.isNull(), F.lit(None).cast("string"))
        .when(F.length(col) == 18, F.concat(F.substring(col, 1, 15), F.upper(F.substring(col, 16, 3))))
        .when(F.length(col) == 15, F.concat(col, suffix))
        .otherwise(F.lit(None).cast("string"))
    )


def key_prefix_col(col: Column) -> Column:
    """First 3 chars of an ID — the polymorphic-lookup discriminator
    (reference `/root/reference/amaxa/api.py:63-70`)."""
    return F.substring(col, 1, KEY_PREFIX_LEN)
