"""Error-string parity with the reference loader.

Each case pairs a misconfiguration with the EXACT message the
reference emits for it — strings taken from the reference's own code
and asserted by its unit tests (cites per case) — and asserts this
engine produces the identical string. The reference's 6-stage loader
pipeline aborts on the first stage with errors (`loader/core.py:56-70`)
and reports error LISTS, which `validate_operation` /
`ExtractOperation._validate` mirror.
"""

import pytest

from amaxa_spark.config.schema import validate_operation
from amaxa_spark.operators.extract import ExtractError, ExtractOperation
from amaxa_spark.plans.plan import ExtractScope, ExtractStepPlan
from amaxa_spark.tpch import tpch_catalog, tpch_registry


def _base(version=2):
    return {
        "version": version,
        "operation": [
            {"sobject": "customer", "extract": {"all": True}},
        ],
    }


# (case, mutation of a valid doc, exact reference error string,
#  reference cite: where emitted / where its own tests assert it)
SCHEMA_PARITY = [
    (
        "missing version",
        lambda d: d.pop("version"),
        "No version number present in schema",
        "loader/core.py:36; test/test_unit/test_Loader.py:13",
    ),
    (
        "unsupported version",
        lambda d: d.update(version=99),
        "Schema version for extract-operation not present or unsupported",
        "loader/core.py:40-45; test/test_unit/test_Loader.py:19",
    ),
    (
        "duplicate fields",
        lambda d: d["operation"][0].update(
            fields=["c_name", "c_name"]
        ),
        "customer: One or more fields is specified multiple times: c_name",
        "loader/core.py:117-123; test/test_unit/test_OperationLoader.py:54",
    ),
    (
        "duplicate columns",
        lambda d: d["operation"][0].update(
            fields=[
                {"field": "c_name", "column": "X"},
                {"field": "c_phone", "column": "X"},
            ]
        ),
        "customer: One or more columns is specified multiple times: X",
        "loader/core.py:125-131",
    ),
]


@pytest.mark.parametrize(
    "case,mutate,expected,cite",
    SCHEMA_PARITY,
    ids=[c[0] for c in SCHEMA_PARITY],
)
def test_schema_error_string_parity(case, mutate, expected, cite):
    doc = _base()
    mutate(doc)
    errors = validate_operation(doc, "extract")
    assert expected in errors, (case, cite, errors)


def test_unknown_sobject_error_string_parity(spark, sf_dir):
    """loader/core.py:267-270; its test_ExtractionOperationLoader.py:125
    asserts this exact string. The registry is this engine's describe,
    so registry absence == nonexistent/unqueryable sObject."""
    op = ExtractOperation(
        spark,
        tpch_catalog(spark, sf_dir),
        tpch_registry(),
        [ExtractStepPlan("Test__c", ExtractScope.ALL_RECORDS)],
    )
    with pytest.raises(ExtractError) as e:
        op.run()
    assert (
        "sObject Test__c does not exist or does not have the correct "
        "permission (queryable)" in str(e.value)
    )


def test_load_check_only_unknown_sobject_and_missing_input(spark, sf_dir, tmp_path):
    """The load-side check-only pass returns ONE error list — an
    unknown sObject emits the reference string (createable) instead of
    a plan-build KeyError, and an unreadable input file joins the list
    instead of raising."""
    from amaxa_spark.operators.load import LoadOperation
    from amaxa_spark.plans.plan import LoadStepPlan
    from amaxa_spark.sources.catalog import TableCatalog

    catalog = TableCatalog(spark, sf_dir)
    errors = LoadOperation(
        spark,
        tpch_registry(),
        [
            LoadStepPlan("Nope__c"),
            LoadStepPlan("customer", input_path=str(tmp_path / "missing.csv")),
        ],
        catalog,
    ).validate()
    assert any(
        "sObject Nope__c does not exist or does not have the correct "
        "permission (createable)" == e
        for e in errors
    )
    assert any(e.startswith("customer: cannot open input:") for e in errors)


def test_field_entry_missing_field_key_reports_not_crashes():
    """A dict field entry without 'field' must produce an error entry,
    not a TypeError from the duplicate-name formatter."""
    errors = validate_operation(
        {
            "version": 1,
            "operation": [
                {
                    "table": "customer",
                    "fields": [{"column": "X"}, {"column": "Y"}],
                    "extract": {"all": True},
                }
            ],
        },
        "extract",
    )
    assert any("field entry missing 'field' key" in e for e in errors)


def test_unknown_field_error_string_parity(spark, sf_dir):
    """loader/core.py:210-218; its test_ExtractionOperationLoader.py:142
    asserts this exact string (no permission suffix in the extract
    path)."""
    op = ExtractOperation(
        spark,
        tpch_catalog(spark, sf_dir),
        tpch_registry(),
        [
            ExtractStepPlan(
                "customer", ExtractScope.ALL_RECORDS, fields=["Test__c"]
            )
        ],
    )
    with pytest.raises(ExtractError) as e:
        op.run()
    assert (
        "Field customer.Test__c does not exist or does not have the "
        "correct CRUD permission." in str(e.value)
    )
