"""Native column expressions replacing the reference's Python UDFs.

The reference ships two row-at-a-time UDFs (SURVEY.md §2.10), both
opaque to Catalyst (no codegen, per-row Python serialization). Each is
re-expressed here as a pure column expression, so the whole plan stays
inside WholeStageCodegen — at 100 TB the difference is a Python worker
round-trip per row vs none at all.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def complete_year(col: Column | str) -> Column:
    """Pad a bare ``YYYY`` release date to ``YYYY-12-31``.

    Native replacement for ``udf_complete_year``
    (``/root/reference/spark_jobs/playback_pipeline.py:151-158``):
    Spotify's ``release_date`` may be year-only when
    ``release_date_precision == 'year'``; the reference pads with
    December 31st. Non-4-char values (full dates, month precision,
    nulls) pass through unchanged.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.when(F.length(c) == 4, F.concat(c, F.lit("-12-31"))).otherwise(c)


def json_values_from_key(json_array_col: Column | str, key: str) -> Column:
    """Comma-join all values of ``key`` across a JSON array of objects.

    Native replacement for ``udf_values_from_key``
    (``/root/reference/spark_jobs/playback_pipeline.py:139-148``),
    which regex-scraped ``(?<="key":").*?(?=")`` out of a JSON string
    and joined matches with ``", "``. Here the array is parsed once
    with ``from_json`` and projected with higher-order functions —
    no regex, no Python.
    """
    c = F.col(json_array_col) if isinstance(json_array_col, str) else json_array_col
    parsed = F.from_json(c, "array<map<string,string>>")
    return F.array_join(
        F.transform(parsed, lambda x: x.getItem(key)), ", "
    )


def duration_cols(duration_ms: Column | str) -> list[Column]:
    """Derived ``duration_s`` / ``duration_min`` columns.

    Mirrors ``/root/reference/spark_jobs/playback_pipeline.py:219-220``:
    ``round(ms/1000, 2)`` and ``round(ms/60000, 2)``.
    """
    c = F.col(duration_ms) if isinstance(duration_ms, str) else duration_ms
    return [
        F.round(c / 1000, 2).alias("duration_s"),
        F.round(c / 60000, 2).alias("duration_min"),
    ]
