from slurm2sql_spark.sinks.parquet_sink import (  # noqa: F401
    analyze_table,
    read_table,
    upsert,
    with_day_partition,
    write_overwrite,
)
