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
        "@register_transform('multiply')\n"
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
            "plugin-modules": [str(plugin)],
            "operation": [{"table": "t", "extract": {"all": True}}],
        }
    )
    df = spark.createDataFrame([("abc",)], "s: string")
    out = apply_transforms(df, {"s": ["uppercase", "reverse"]})
    assert out.collect()[0].s == "CBA"
