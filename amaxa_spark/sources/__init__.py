from amaxa_spark.sources.catalog import TableCatalog  # noqa: F401
