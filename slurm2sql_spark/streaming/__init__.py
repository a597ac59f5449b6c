from slurm2sql_spark.streaming import history, stream  # noqa: F401
