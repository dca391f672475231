from eclipse_spark.sources.readers import read_any, write_any  # noqa: F401
