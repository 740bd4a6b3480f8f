from spotify_pipeline_gcp_spark.sinks.writers import (  # noqa: F401
    ParquetWarehouse,
    write_csv,
    write_parquet,
    write_single_file,
)
