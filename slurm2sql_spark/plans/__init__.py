"""Physical-plan helpers: partitioning/parallelism utilities."""

from slurm2sql_spark.plans.partitioning import fan_out

__all__ = ["fan_out"]
