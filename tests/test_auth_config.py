"""Auth token provider + config cascade units (fake transport, no
network — the transport/resolver injection IS the interface)."""

from __future__ import annotations

import base64
import json

import pytest

from spotify_pipeline_gcp_spark.config import ConfigError, resolve_config
from spotify_pipeline_gcp_spark.sources.auth import (
    AuthError,
    RefreshTokenProvider,
    StaticTokenProvider,
    bearer_fetcher,
)
from spotify_pipeline_gcp_spark.sources.rest import PlaybackHistorySource


class FakeTokenServer:
    """Records exchange requests; issues sequential tokens."""

    def __init__(self, expires_in=3600):
        self.calls = []
        self.expires_in = expires_in

    def __call__(self, url, data, headers):
        self.calls.append((url, dict(data), dict(headers)))
        return {
            "access_token": f"tok{len(self.calls)}",
            "expires_in": self.expires_in,
        }


class FakeClock:
    def __init__(self):
        self.now = 1000.0

    def __call__(self):
        return self.now


def _provider(server, clock, **kw):
    return RefreshTokenProvider(
        "refresh-me", "client-id", "client-secret",
        transport=server, clock=clock, **kw,
    )


def test_refresh_exchange_request_shape():
    server = FakeTokenServer()
    provider = _provider(server, FakeClock())
    assert provider.token() == "tok1"
    url, data, headers = server.calls[0]
    assert url == "https://accounts.spotify.com/api/token"
    assert data == {"grant_type": "refresh_token", "refresh_token": "refresh-me"}
    expected = base64.b64encode(b"client-id:client-secret").decode()
    assert headers["Authorization"] == "Basic " + expected


def test_token_cached_until_expiry_margin():
    server = FakeTokenServer(expires_in=3600)
    clock = FakeClock()
    provider = _provider(server, clock, expiry_margin=60)
    assert provider.token() == "tok1"
    clock.now += 3000
    assert provider.token() == "tok1"  # still valid -> cached
    clock.now += 600  # inside the 60s margin before 4600
    assert provider.token() == "tok2"  # re-exchanged
    assert len(server.calls) == 2


def test_malformed_response_raises():
    provider = RefreshTokenProvider(
        "r", "c", "s", transport=lambda u, d, h: {"error": "nope"}
    )
    with pytest.raises(AuthError):
        provider.token()


def test_no_transport_is_explicit():
    with pytest.raises(NotImplementedError):
        RefreshTokenProvider("r", "c", "s").token()


def test_bearer_fetcher_attaches_fresh_header():
    captured = []

    def http_get(url, params, headers):
        captured.append((url, params, headers))
        return {"items": []}

    fetch = bearer_fetcher(http_get, StaticTokenProvider("sekrit"))
    doc = fetch("v1/me/player/recently-played", {"limit": 50})
    assert doc == {"items": []}
    url, params, headers = captured[0]
    assert url == "https://api.spotify.com/v1/me/player/recently-played"
    assert headers == {"Authorization": "Bearer sekrit"}


def test_bearer_fetcher_plugs_into_source(spark):
    def http_get(url, params, headers):
        assert headers["Authorization"].startswith("Bearer ")
        return {"items": []}

    src = PlaybackHistorySource(
        spark, fetcher=bearer_fetcher(http_get, StaticTokenProvider("t"))
    )
    assert src.fetch_raw(limit=10, after_ms=0) == {"items": []}


def test_config_cascade_file_env_secret(tmp_path):
    cfg = tmp_path / "cfg.json"
    cfg.write_text(json.dumps({"CLIENT_ID": "from-file"}))
    secrets = {"REFRESH_TOKEN": "from-secret"}
    out = resolve_config(
        ["CLIENT_ID", "CLIENT_SECRET", "REFRESH_TOKEN"],
        path=str(cfg),
        env={"SPOTIFY_CLIENT_SECRET": "from-env", "SPOTIFY_CLIENT_ID": "shadowed"},
        secret_resolver=secrets.get,
    )
    assert out == {
        "CLIENT_ID": "from-file",  # file wins over env
        "CLIENT_SECRET": "from-env",
        "REFRESH_TOKEN": "from-secret",
    }


def test_config_missing_keys_named(tmp_path):
    with pytest.raises(ConfigError) as err:
        resolve_config(["A", "B"], env={}, secret_resolver=lambda k: None)
    assert "A" in str(err.value) and "B" in str(err.value)
    assert resolve_config(["A"], env={}, required=False) == {}
