from amaxa_spark.config.loader import load_extract_config, load_load_config  # noqa: F401
