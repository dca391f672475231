from eclipse_spark.functions.scalar import *  # noqa: F401,F403
