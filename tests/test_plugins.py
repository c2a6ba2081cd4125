"""Custom transform plugin API (F11) — the reference's plugin-modules
hook (`assets/test_data_transforms/example_transforms.py`)."""

from pyspark.sql import functions as F

from amaxa_spark.config.loader import load_extract_config
from amaxa_spark.functions.transforms import TRANSFORMS, apply_transforms


def test_plugin_module_registers_transform(spark, tmp_path):
    plugin = tmp_path / "my_transforms.py"
    plugin.write_text(
        "from pyspark.sql import functions as F\n"
        "from amaxa_spark.functions.transforms import register_transform\n"
        "\n"
        "# options must be DECLARED: a provider without a schema\n"
        "# accepts none (the reference validates against the empty\n"
        "# get_options_schema() default)\n"
        "@register_transform(\n"
        "    'multiply', options_schema={'factor': {'type': (int, float)}}\n"
        ")\n"
        "def _multiply(col, options):\n"
        "    return col * float(options.get('factor', 2))\n"
    )
    steps = load_extract_config(
        {
            "version": 2,
            "plugin-modules": [str(plugin)],
            "operation": [
                {
                    "table": "t",
                    "extract": {"all": True},
                    "fields": [
                        {"field": "v", "transforms": [{"name": "multiply", "factor": 3}]}
                    ],
                }
            ],
        }
    )
    assert "multiply" in TRANSFORMS
    df = spark.createDataFrame([(1, 10.0)], "Id: long, v: double")
    out = apply_transforms(df, steps[0].transforms)
    assert out.collect()[0].v == 30.0


def test_plugin_composes_with_builtins(spark, tmp_path):
    plugin = tmp_path / "p2.py"
    plugin.write_text(
        "from pyspark.sql import functions as F\n"
        "from amaxa_spark.functions.transforms import register_transform\n"
        "@register_transform('reverse')\n"
        "def _reverse(col, options):\n"
        "    return F.reverse(col)\n"
    )
    load_extract_config(
        {
            "version": 1,
            "plugin-modules": [str(plugin)],
            "operation": [{"table": "t", "extract": {"all": True}}],
        }
    )
    df = spark.createDataFrame([("abc",)], "s: string")
    out = apply_transforms(df, {"s": ["uppercase", "reverse"]})
    assert out.collect()[0].s == "CBA"


def test_transform_validation_reports_all_errors(spark):
    """Invalid option / unknown transform / type gating surface as one
    error-list exception (reference: `amaxa/transforms.py:42-49`,
    `amaxa/loader/schemas.py:46-68`)."""
    import pytest

    from amaxa_spark.functions.transforms import TransformError, validate_transforms

    df = spark.createDataFrame([("x", 1)], "s: string, n: bigint")
    spec = {
        "s": [{"name": "prefix"}, "nosuch"],       # missing option + unknown
        "n": [{"name": "suffix", "suffix": "!"}],  # wrong column type
    }
    errs = validate_transforms(spec, types={"s": "string", "n": "int"})
    assert len(errs) == 3
    # reference-parity strings (loader/schemas.py:54-67, transforms.py:42-46)
    assert any(
        "The options schema for transform prefix failed to validate: prefix"
        in e for e in errs
    )
    assert any("The transform nosuch does not exist." in e for e in errs)
    assert any("not available for fields of type" in e for e in errs)

    with pytest.raises(TransformError) as exc:
        apply_transforms(df, spec, types={"s": "string", "n": "int"})
    assert len(exc.value.errors) == 3

    # unknown option on a schema'd transform; wrong option type
    errs = validate_transforms(
        {"s": [{"name": "prefix", "prefix": 7, "oops": 1}]}
    )
    # both failing option names ride in ONE reference-shaped message
    assert any(
        "The options schema for transform prefix failed to validate:" in e
        and "prefix" in e and "oops" in e
        for e in errs
    )


def test_config_load_rejects_bad_transform_options(tmp_path):
    import pytest

    from amaxa_spark.config.loader import ConfigError

    with pytest.raises(ConfigError) as exc:
        load_extract_config(
            {
                "version": 2,
                "operation": [
                    {
                        "table": "t",
                        "extract": {"all": True},
                        "fields": [
                            {"field": "v", "transforms": [{"name": "prefix"}]}
                        ],
                    }
                ],
            }
        )
    assert any(
        "The options schema for transform prefix failed to validate: prefix"
        in e for e in exc.value.errors
    )


def test_step_options_validated_and_advisory(spark, tmp_path):
    import pytest

    from amaxa_spark.config.loader import ConfigError, load_load_config

    # valid options parse and merge operation-level defaults
    steps = load_load_config(
        {
            "version": 1,
            "options": {"bulk-api-batch-size": 500},
            "operation": [
                {"sobject": "Account", "options": {"bulk-api-mode": "Serial"}}
            ],
        }
    )
    assert steps[0].options == {
        "bulk-api-batch-size": 500,
        "bulk-api-mode": "Serial",
    }

    # invalid values are rejected with the full error list
    with pytest.raises(ConfigError) as exc:
        load_load_config(
            {
                "version": 1,
                "operation": [
                    {
                        "sobject": "Account",
                        "options": {
                            "bulk-api-batch-size": 99999,
                            "bulk-api-mode": "Turbo",
                            "warp-speed": True,
                        },
                    }
                ],
            }
        )
    msgs = exc.value.errors
    assert any("out of range" in e for e in msgs)
    assert any("must be one of" in e for e in msgs)
    assert any("unknown option 'warp-speed'" in e for e in msgs)

    # advisory mapping: Serial -> 1 partition, batch-size -> write opt
    from amaxa_spark.__main__ import apply_advisory_options

    df = spark.range(10).repartition(4)
    out, write_opts = apply_advisory_options(
        df, {"bulk-api-mode": "Serial", "bulk-api-batch-size": 500}, "Account"
    )
    assert out.rdd.getNumPartitions() == 1
    assert write_opts == {"maxRecordsPerFile": 500}


def test_reference_style_nested_transform_options(spark):
    """The reference's v2 entry form nests options under an `options:`
    key (`amaxa/loader/schemas.py:445-452`); both forms must work."""
    df = spark.createDataFrame([("a",)], "s: string")
    nested = {"s": [{"name": "prefix", "options": {"prefix": "X-"}}]}
    inline = {"s": [{"name": "prefix", "prefix": "X-"}]}
    assert apply_transforms(df, nested).collect()[0].s == "X-a"
    assert apply_transforms(df, inline).collect()[0].s == "X-a"

    from amaxa_spark.functions.transforms import validate_transforms

    # nested options are validated too
    errs = validate_transforms({"s": [{"name": "prefix", "options": {"oops": 1}}]})
    assert any(
        "The options schema for transform prefix failed to validate:" in e
        and "prefix" in e and "oops" in e
        for e in errs
    )


def test_tuple_typed_option_schema_collects_error():
    """A tuple-of-types option rule (the shape plugins register) must
    produce a collected validation error on a bad value, not crash."""
    from amaxa_spark.functions.transforms import (
        TRANSFORM_META,
        TRANSFORMS,
        register_transform,
        validate_transforms,
    )

    @register_transform(
        "tupletyped", options_schema={"factor": {"type": (int, float)}}
    )
    def _t(col, options):
        return col

    try:
        errs = validate_transforms({"c": [{"name": "tupletyped", "factor": "x"}]})
        assert errs == [
            "c: The options schema for transform tupletyped "
            "failed to validate: factor"
        ]
        assert validate_transforms(
            {"c": [{"name": "tupletyped", "factor": 2}]}
        ) == []
    finally:
        TRANSFORMS.pop("tupletyped", None)
        TRANSFORM_META.pop("tupletyped", None)
