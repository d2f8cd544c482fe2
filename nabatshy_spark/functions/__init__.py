from nabatshy_spark.functions import exprs, timeutil  # noqa: F401
