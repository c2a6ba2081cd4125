from amaxa_spark.functions.transforms import TRANSFORMS, apply_transforms, register_transform  # noqa: F401
