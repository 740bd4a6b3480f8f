"""Declared StructType contracts.

The reference infers every schema at read time
(``spark.read.json(..., multiLine=True)`` at
``/root/reference/spark_jobs/playback_pipeline.py:264``;
``inferSchema=True`` CSV at
``/root/reference/spark_jobs/playback_pipeline_curated.py:173``) and
guards downstream logic with ``if 'col' in df.columns`` checks
(``playback_pipeline_curated.py:95,192``). At 100 TB, inference means
an extra full pass over the data and schema drift at runtime; declared
contracts make reads single-pass and drift a load-time error.

Field inventory reconstructed from how the reference navigates the
document (``playback_pipeline.py:92-225``) and documented in
FIXTURES.md §F1.
"""

from __future__ import annotations

from pyspark.sql import types as T

# --- raw playback document (Spotify recently-played response) ---------

EXTERNAL_URLS = T.StructType([T.StructField("spotify", T.StringType())])

ALBUM_ARTIST = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("name", T.StringType()),
    ]
)

ALBUM = T.StructType(
    [
        T.StructField("album_type", T.StringType()),
        T.StructField("href", T.StringType()),
        T.StructField("id", T.StringType()),
        T.StructField("name", T.StringType()),
        T.StructField("release_date", T.StringType()),
        T.StructField("release_date_precision", T.StringType()),
        T.StructField("total_tracks", T.LongType()),
        T.StructField("type", T.StringType()),
        T.StructField("uri", T.StringType()),
        T.StructField("artists", T.ArrayType(ALBUM_ARTIST)),
    ]
)

ARTIST = T.StructType(
    [
        T.StructField("external_urls", EXTERNAL_URLS),
        T.StructField("href", T.StringType()),
        T.StructField("id", T.StringType()),
        T.StructField("name", T.StringType()),
        T.StructField("uri", T.StringType()),
    ]
)

TRACK = T.StructType(
    [
        T.StructField("album", ALBUM),
        T.StructField("artists", T.ArrayType(ARTIST)),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("href", T.StringType()),
        T.StructField("id", T.StringType()),
        T.StructField("name", T.StringType()),
        T.StructField("popularity", T.LongType()),
        T.StructField("type", T.StringType()),
        T.StructField("uri", T.StringType()),
    ]
)

PLAYBACK_ITEM = T.StructType(
    [
        T.StructField("played_at", T.StringType()),
        T.StructField("track", TRACK),
    ]
)

PLAYBACK_DOC = T.StructType(
    [T.StructField("items", T.ArrayType(PLAYBACK_ITEM))]
)

# --- normalized output tables (clean zone) ----------------------------
# Column sets and order match the reference's contracts:
# albums 9 cols (playback_pipeline.py:95-105), artists 5 cols
# (:119-126), playback_hist 15 cols (:289-305).

ALBUMS_COLUMNS = [
    "album_type",
    "album_href",
    "album_id",
    "album_name",
    "album_release_date",
    "album_release_date_precision",
    "total_tracks",
    "type",
    "album_uri",
]

ARTISTS_COLUMNS = [
    "artist_spotify_url",
    "artist_href",
    "artist_id",
    "artist_name",
    "artist_uri",
]

PLAYBACK_HIST_COLUMNS = [
    "played_at",
    "duration_ms",
    "duration_s",
    "duration_min",
    "track_href",
    "track_id",
    "track_name",
    "track_uri",
    "artist_names",
    "artist_ids",
    "popularity",
    "album_id",
    "album_name",
    "album_release_date",
    "album_uri",
]

# --- driver testdata star schema (TESTDATA.md) ------------------------

TESTDATA_TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]
