"""OAuth token layer for the REST sources (SURVEY §2.1).

The reference exchanges a long-lived refresh token for a short-lived
access token with an HTTP Basic–authenticated POST
(``/root/reference/spotify_api/auth.py:22-40``) and re-requests a
fresh token on every pipeline run. Engine shape: a *token provider*
is a callable-holding object the REST fetcher asks for a bearer
token; the HTTP transport is injected exactly like the data fetcher
in ``sources/rest.py`` (this container is air-gapped — no network
code lives here), and tokens are cached until shortly before expiry
instead of re-fetched per call.

Wiring: ``bearer_fetcher`` composes a raw transport + a provider into
the ``(endpoint, params) -> dict`` Fetcher the source adapters take,
so auth stays orthogonal to source logic.
"""

from __future__ import annotations

import base64
import time
from collections.abc import Callable

# (url, form_data, headers) -> parsed-JSON dict
Transport = Callable[[str, dict, dict], dict]


class AuthError(RuntimeError):
    pass


class StaticTokenProvider:
    """Fixed token — dev/test stand-in (no expiry, no transport)."""

    def __init__(self, token: str):
        self._token = token

    def token(self) -> str:
        return self._token


class RefreshTokenProvider:
    """Refresh-token → access-token exchange with expiry caching.

    Mirrors the reference flow (``auth.py:22-40``): POST
    ``grant_type=refresh_token`` to the token endpoint with
    ``Authorization: Basic base64(client_id:client_secret)``. Unlike
    the reference (fresh request per run, expiry only printed), the
    response's ``expires_in`` drives a cache: ``token()`` reuses the
    access token until ``expiry_margin`` seconds before expiry, then
    re-exchanges. ``clock`` is injectable for deterministic tests.
    """

    TOKEN_URL = "https://accounts.spotify.com/api/token"

    def __init__(
        self,
        refresh_token: str,
        client_id: str,
        client_secret: str,
        transport: Transport | None = None,
        clock: Callable[[], float] = time.monotonic,
        expiry_margin: float = 60.0,
    ):
        self._refresh_token = refresh_token
        self._basic = base64.b64encode(
            f"{client_id}:{client_secret}".encode("utf-8")
        ).decode("utf-8")
        self._transport = transport
        self._clock = clock
        self._margin = expiry_margin
        self._access_token: str | None = None
        self._expires_at: float = 0.0

    def token(self) -> str:
        if (
            self._access_token is None
            or self._clock() >= self._expires_at - self._margin
        ):
            self._refresh()
        assert self._access_token is not None
        return self._access_token

    def _refresh(self) -> None:
        if self._transport is None:
            raise NotImplementedError(
                "no HTTP transport configured: inject a callable "
                "(url, data, headers) -> dict backed by your HTTP "
                "client; this environment is air-gapped so none is "
                "bundled"
            )
        response = self._transport(
            self.TOKEN_URL,
            {"grant_type": "refresh_token", "refresh_token": self._refresh_token},
            {"Authorization": "Basic " + self._basic},
        )
        try:
            self._access_token = response["access_token"]
            expires_in = float(response.get("expires_in", 3600))
        except (KeyError, TypeError, ValueError) as exc:
            raise AuthError(f"malformed token response: {response!r}") from exc
        self._expires_at = self._clock() + expires_in


def bearer_fetcher(
    http_get: Callable[[str, dict, dict], dict],
    provider: StaticTokenProvider | RefreshTokenProvider,
    base_url: str = "https://api.spotify.com/",
) -> Callable[[str, dict], dict]:
    """Compose transport + token provider into a source Fetcher.

    ``http_get(url, params, headers) -> dict`` is the injected HTTP
    GET; the returned callable matches ``sources.rest.Fetcher`` and
    attaches a fresh ``Authorization: Bearer`` header per call (the
    provider handles caching/renewal).
    """

    def fetch(endpoint: str, params: dict) -> dict:
        url = base_url.rstrip("/") + "/" + endpoint.lstrip("/")
        return http_get(
            url, params, {"Authorization": f"Bearer {provider.token()}"}
        )

    return fetch
