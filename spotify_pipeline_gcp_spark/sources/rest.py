"""REST API source adapters (SURVEY §2.1 S1-S4).

The reference fetches the Spotify ``recently-played`` feed (≤50 items
since a midnight cursor), audio features, and artist genres with
driver-side ``requests`` calls and writes raw JSON to the landing zone
(``/root/reference/spotify_api/spotify_api.py:11-105``, ``main.py``).

Engine shape: a *source adapter* = (fetcher, declared schema) ->
DataFrame. The fetch itself is inherently driver-side (one small HTTP
response per day — there is nothing to distribute); everything after
``to_dataframe`` is a plan. The HTTP layer is injected so tests and
air-gapped runs use a fake; a production deployment passes a real
``requests``-based callable plus auth. No network code lives here.

Incremental semantics (cursor = epoch-millis ``after`` param,
``spotify_api.py:22-28``) are preserved by ``cursor_after_midnight``.
"""

from __future__ import annotations

import datetime as dt
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from spotify_pipeline_gcp_spark.schemas import PLAYBACK_DOC

# fetcher: (endpoint, params) -> parsed-JSON dict
Fetcher = Callable[[str, dict], dict]


def cursor_after_midnight(today: dt.date | None = None) -> int:
    """Epoch-millis of yesterday 00:00 UTC — the reference's daily
    ingest cursor (``spotify_api.py:22-24``)."""
    today = today or dt.datetime.now(dt.timezone.utc).date()
    yesterday = dt.datetime.combine(
        today - dt.timedelta(days=1), dt.time.min, tzinfo=dt.timezone.utc
    )
    return int(yesterday.timestamp()) * 1000


def _require_fetcher(fetcher: Fetcher | None) -> Fetcher:
    if fetcher is None:
        raise NotImplementedError(
            "no HTTP fetcher configured: inject a callable "
            "(endpoint, params) -> dict backed by your HTTP client and "
            "auth; this environment is air-gapped so none is bundled"
        )
    return fetcher


class PlaybackHistorySource:
    """S1: the ``recently-played`` feed as a schema-declared DataFrame."""

    ENDPOINT = "v1/me/player/recently-played"

    def __init__(self, spark: SparkSession, fetcher: Fetcher | None = None):
        self.spark = spark
        self.fetcher = fetcher

    def fetch_raw(self, limit: int = 50, after_ms: int | None = None) -> dict:
        params = {"limit": limit}
        if after_ms is None:
            after_ms = cursor_after_midnight()
        params["after"] = after_ms
        return _require_fetcher(self.fetcher)(self.ENDPOINT, params)

    def to_dataframe(self, doc: dict) -> DataFrame:
        """Raw response dict -> single-row DataFrame with the declared
        nested contract (downstream: operators/playback.py)."""
        return self.spark.createDataFrame([doc], schema=PLAYBACK_DOC)

    def load(self, limit: int = 50, after_ms: int | None = None) -> DataFrame:
        return self.to_dataframe(self.fetch_raw(limit, after_ms))


AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("danceability", T.DoubleType()),
        T.StructField("energy", T.DoubleType()),
        T.StructField("key", T.LongType()),
        T.StructField("loudness", T.DoubleType()),
        T.StructField("tempo", T.DoubleType()),
        T.StructField("duration_ms", T.LongType()),
    ]
)

ARTIST_GENRES_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("name", T.StringType()),
        T.StructField("genres", T.ArrayType(T.StringType())),
        T.StructField("popularity", T.LongType()),
    ]
)


class AudioFeaturesSource:
    """S2: ``v1/audio-features?ids=csv`` -> one row per track.

    The reference fetches this daily but never plumbs it into Spark
    (SURVEY §1.1) — here it is a first-class dimension source.
    """

    ENDPOINT = "v1/audio-features"

    def __init__(self, spark: SparkSession, fetcher: Fetcher | None = None):
        self.spark = spark
        self.fetcher = fetcher

    def load(self, track_ids: list[str]) -> DataFrame:
        doc = _require_fetcher(self.fetcher)(
            self.ENDPOINT, {"ids": ",".join(track_ids)}
        )
        rows = doc.get("audio_features") or []
        return self.spark.createDataFrame(rows, schema=AUDIO_FEATURES_SCHEMA)


class ArtistGenresSource:
    """S3: ``v1/artists?ids=csv`` -> one row per artist with genre array."""

    ENDPOINT = "v1/artists"

    def __init__(self, spark: SparkSession, fetcher: Fetcher | None = None):
        self.spark = spark
        self.fetcher = fetcher

    def load(self, artist_ids: list[str]) -> DataFrame:
        doc = _require_fetcher(self.fetcher)(
            self.ENDPOINT, {"ids": ",".join(artist_ids)}
        )
        rows = doc.get("artists") or []
        return self.spark.createDataFrame(rows, schema=ARTIST_GENRES_SCHEMA)


RECOMMENDATIONS_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("name", T.StringType()),
        T.StructField("popularity", T.LongType()),
        T.StructField(
            "artists",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("id", T.StringType()),
                        T.StructField("name", T.StringType()),
                    ]
                )
            ),
        ),
    ]
)


class RecommendationsSource:
    """S4: ``v1/recommendations?seed_tracks=csv`` -> one row per
    recommended track.

    Dead code in the reference (``spotify_api.py:108-125`` defines
    ``get_recommendations`` but nothing calls it, and it passes the
    seed list under the wrong param name ``ids``); built here as a
    first-class source to close the §2.1 surface — same injected-
    fetcher seam, correct ``seed_tracks`` param, declared schema.
    """

    ENDPOINT = "v1/recommendations"

    def __init__(self, spark: SparkSession, fetcher: Fetcher | None = None):
        self.spark = spark
        self.fetcher = fetcher

    def load(self, seed_track_ids: list[str], limit: int = 20) -> DataFrame:
        doc = _require_fetcher(self.fetcher)(
            self.ENDPOINT,
            {"seed_tracks": ",".join(seed_track_ids), "limit": limit},
        )
        rows = [
            {
                "id": t.get("id"),
                "name": t.get("name"),
                "popularity": t.get("popularity"),
                "artists": [
                    {"id": a.get("id"), "name": a.get("name")}
                    for a in (t.get("artists") or [])
                ],
            }
            for t in doc.get("tracks") or []
        ]
        return self.spark.createDataFrame(rows, schema=RECOMMENDATIONS_SCHEMA)


def extract_track_ids(doc: dict) -> list[str]:
    """CSV id-list helper (ref ``spotify_api.py:37-50``), deduped,
    order-preserving."""
    seen: dict[str, None] = {}
    for item in doc.get("items", []):
        tid = (item.get("track") or {}).get("id")
        if tid:
            seen.setdefault(tid, None)
    return list(seen)


def extract_artist_ids(doc: dict, first_only: bool = False) -> list[str]:
    """Artist ids across plays. The reference takes only
    ``album.artists[0]`` (``spotify_api.py:59``) — ``first_only=True``
    reproduces that; the default captures all performing artists."""
    seen: dict[str, None] = {}
    for item in doc.get("items", []):
        artists = (item.get("track") or {}).get("artists") or []
        if first_only:
            artists = artists[:1]
        for a in artists:
            if a.get("id"):
                seen.setdefault(a["id"], None)
    return list(seen)
