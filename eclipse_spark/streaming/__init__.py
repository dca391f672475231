from eclipse_spark.streaming import windows  # noqa: F401
