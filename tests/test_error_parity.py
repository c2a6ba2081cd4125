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


def test_lookup_behavior_validity_string_parity(spark, sf_dir):
    """loader/core.py:272-289 (_validate_lookup_behaviors): a
    self-lookup behavior on a dependent lookup, and an outside-lookup
    behavior on a self lookup, each emit the reference's exact
    string — 'Lookup behavior '<v>' specified for field <T>.<f> is not
    valid for this lookup type.'"""
    from amaxa_spark.metadata import SchemaRegistry, TableMeta
    from amaxa_spark.plans.plan import OutsideLookupBehavior, SelfLookupBehavior

    # dependent lookup (o_custkey -> customer, later in step order)
    # with a SELF behavior configured
    op = ExtractOperation(
        spark,
        tpch_catalog(spark, sf_dir),
        tpch_registry(),
        [
            ExtractStepPlan(
                "orders",
                ExtractScope.ALL_RECORDS,
                self_lookup_overrides={
                    "o_custkey": SelfLookupBehavior.TRACE_NONE
                },
            ),
            ExtractStepPlan("customer", ExtractScope.DESCENDENTS),
        ],
    )
    with pytest.raises(ExtractError) as e:
        op._validate()
    assert (
        "Lookup behavior 'trace-none' specified for field "
        "orders.o_custkey is not valid for this lookup type." in str(e.value)
    )

    # self lookup with an OUTSIDE behavior configured
    reg = SchemaRegistry(
        [TableMeta("acct", pk="Id", lookups={"ParentId": ["acct"]})]
    )
    cat = {"acct": spark.createDataFrame([("001A", None)], "Id string, ParentId string")}
    op2 = ExtractOperation(
        spark,
        cat,
        reg,
        [
            ExtractStepPlan(
                "acct",
                ExtractScope.ALL_RECORDS,
                outside_lookup_behavior={
                    "ParentId": OutsideLookupBehavior.INCLUDE
                },
            )
        ],
    )
    with pytest.raises(ExtractError) as e2:
        op2._validate()
    assert (
        "Lookup behavior 'include' specified for field acct.ParentId "
        "is not valid for this lookup type." in str(e2.value)
    )

    # the load-side check-only pass reports the same string as a list
    from amaxa_spark.operators.load import LoadOperation
    from amaxa_spark.plans.plan import LoadStepPlan

    errors = LoadOperation(
        spark,
        reg,
        [
            LoadStepPlan(
                "acct",
                outside_lookup_behavior={
                    "ParentId": OutsideLookupBehavior.DROP_FIELD
                },
            )
        ],
        cat,
    ).validate()
    assert (
        "Lookup behavior 'drop-field' specified for field acct.ParentId "
        "is not valid for this lookup type." in errors
    )


def test_load_column_set_strings_parity(spark, sf_dir):
    """loader/load_operation.py:151-208 (_validate_input_file_columns):
    strict scope mismatch emits the reference's exact multi-line
    'does not match specified field scope' string (pk excluded from
    both sets, sorted comma joins, trailing newline); a field-group
    input carrying columns outside the group emits the 'excess
    columns over field group' string; input-validation none checks
    nothing."""
    from amaxa_spark.metadata import SchemaRegistry, TableMeta
    from amaxa_spark.operators.load import LoadOperation
    from amaxa_spark.plans.plan import LoadStepPlan

    catalog = tpch_catalog(spark, sf_dir)
    cust_cols = set(catalog["customer"].columns) - {"c_custkey"}
    errors = LoadOperation(
        spark,
        tpch_registry(),
        [
            LoadStepPlan(
                "customer",
                fields=["c_name", "c_phone"],
                input_validation="strict",
            )
        ],
        catalog,
    ).validate()
    expected = (
        "Input file for sObject customer does not match specified field "
        "scope.\nScope: {}\nFile Columns: {}\n".format(
            "c_name, c_phone", ", ".join(sorted(cust_cols))
        )
    )
    assert expected in errors

    # field-group input with a column outside the group scope (base64
    # columns are excluded from every group: loader/core.py:243-248)
    reg = SchemaRegistry(
        [TableMeta("doc", pk="Id", types={"Name": "string", "Body": "base64"})]
    )
    inputs = {
        "doc": spark.createDataFrame(
            [("1", "a", "b64")], "Id string, Name string, Body string"
        )
    }
    errors = LoadOperation(
        spark,
        reg,
        [LoadStepPlan("doc", field_group="writeable")],
        inputs,
    ).validate()
    assert (
        "Input file for sObject doc contains excess columns over field "
        "group 'writeable': Body" in errors
    )

    # input-validation none: the same misconfigurations check nothing
    errors = LoadOperation(
        spark,
        reg,
        [LoadStepPlan("doc", field_group="writeable", input_validation="none")],
        inputs,
    ).validate()
    assert errors == []


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


# --- transform-option validation parity (round 7) -------------------
# (case, transform spec for column 'c', exact reference string after
#  the 'c: ' prefix, reference cite)
TRANSFORM_PARITY = [
    (
        "unknown transform name",
        {"c": ["nosuch"]},
        "The transform nosuch does not exist.",
        "loader/schemas.py:54-56; test/test_unit/test_OperationLoader.py "
        "(transform validation cases)",
    ),
    (
        "missing required option",
        {"c": [{"name": "prefix"}]},
        "The options schema for transform prefix failed to validate: prefix",
        "loader/schemas.py:58-67 (message carries the failing option "
        "names — exactly what '\\n'.join(validator.errors) renders)",
    ),
    (
        "unknown option",
        {"c": [{"name": "strip", "oops": 1}]},
        "The options schema for transform strip failed to validate: oops",
        "loader/schemas.py:58-67",
    ),
    (
        "badly-typed option",
        {"c": [{"name": "suffix", "suffix": 7}]},
        "The options schema for transform suffix failed to validate: suffix",
        "loader/schemas.py:58-67",
    ),
]


@pytest.mark.parametrize(
    "case,spec,expected,cite",
    TRANSFORM_PARITY,
    ids=[c[0] for c in TRANSFORM_PARITY],
)
def test_transform_option_error_string_parity(case, spec, expected, cite):
    from amaxa_spark.functions.transforms import validate_transforms

    errors = validate_transforms(spec)
    assert f"c: {expected}" in errors, (case, cite, errors)


def test_transform_type_gating_string_parity():
    """amaxa/transforms.py:42-46 raises TransformException with this
    exact sentence (soapType interpolated); here the engine's type
    name fills the slot."""
    from amaxa_spark.functions.transforms import validate_transforms

    errors = validate_transforms(
        {"n": [{"name": "lowercase"}]}, types={"n": "int"}
    )
    assert "n: Transform lowercase is not available for fields of type int." \
        in errors


def test_plugin_import_error_string_parity(tmp_path):
    """loader/schemas.py:37-43 (_validate_import_module): a module
    that fails to import is a collected validation error, not a
    crash, with the exact string 'Unable to import module {value}'."""
    from amaxa_spark.config.loader import ConfigError, load_extract_config

    doc = {
        "version": 2,
        "plugin-modules": ["no_such_module_xyz"],
        "operation": [{"sobject": "customer", "extract": {"all": True}}],
    }
    with pytest.raises(ConfigError) as e:
        load_extract_config(doc)
    assert "Unable to import module no_such_module_xyz" in e.value.errors


# --- reference state-loader parity (round 7) ------------------------
# (case, state doc, exact error string, reference cite)
STATE_PARITY = [
    (
        "missing version",
        {"state": {"stage": "inserts", "id-map": {}}},
        "No version number present in schema",
        "loader/core.py:34-37; test/test_unit/test_Loader.py:13",
    ),
    (
        "unsupported version",
        {"version": 99, "state": {"stage": "inserts", "id-map": {}}},
        "Schema version for state not present or unsupported",
        "loader/core.py:39-45 (InputType.STATE.value = 'state')",
    ),
    (
        "missing state key",
        {"version": 1},
        "state: ['required field']",
        "loader/core.py:51-53 over schemas.py:483-500 "
        "(cerberus required-field rendering)",
    ),
    (
        "bad stage value",
        {"version": 1, "state": {"stage": "bogus", "id-map": {}}},
        "state: [{'stage': ['unallowed value bogus']}]",
        "loader/core.py:51-53; schemas.py:490-495 "
        "(allowed = LoadStage.all_values())",
    ),
    (
        "missing id-map",
        {"version": 1, "state": {"stage": "inserts"}},
        "state: [{'id-map': ['required field']}]",
        "loader/core.py:51-53; schemas.py:496",
    ),
]


@pytest.mark.parametrize(
    "case,doc,expected,cite",
    STATE_PARITY,
    ids=[c[0] for c in STATE_PARITY],
)
def test_reference_state_error_string_parity(spark, case, doc, expected, cite):
    from amaxa_spark.config.loader import ConfigError
    from amaxa_spark.sources.state import load_reference_state

    with pytest.raises(ConfigError) as e:
        load_reference_state(spark, doc)
    assert expected in e.value.errors, (case, cite, e.value.errors)


def test_reference_state_loads_and_normalizes_ids(spark, tmp_path):
    """A snapshot in the reference's saved shape
    (amaxa/loader/state.py:10-20) loads into (stage, id-map frame)
    with 15-char IDs normalized to 18 — the SalesforceId round-trip
    the reference's StateLoader applies (state.py:28-32)."""
    import yaml

    from amaxa_spark.ids import normalize_sfid
    from amaxa_spark.sources.state import load_reference_state

    old15, new15 = "001000000000001", "001000000000002"
    doc = {
        "version": 1,
        "state": {"stage": "dependents", "id-map": {old15: new15}},
    }
    p = tmp_path / "state.yaml"
    p.write_text(yaml.dump(doc))
    stage, df = load_reference_state(spark, str(p))
    assert stage == "dependents"
    rows = df.collect()
    assert len(rows) == 1
    assert rows[0].old_id == normalize_sfid(old15)
    assert rows[0].new_id == normalize_sfid(new15)
    assert len(rows[0].old_id) == 18
