from spotify_pipeline_gcp_spark.functions.exprs import (  # noqa: F401
    complete_year,
    duration_cols,
    json_values_from_key,
)
