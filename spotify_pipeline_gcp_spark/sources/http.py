"""Real HTTP layer for the REST sources (SURVEY §2.1) — env-gated.

The reference performs its API calls with driver-side ``requests``
(``/root/reference/spotify_api/spotify_api.py:11-105``, ``auth.py:
22-40``). The engine keeps all network code HERE, behind the same
``(endpoint, params) -> dict`` Fetcher seam the source adapters take
(``sources/rest.py``), so:

- air-gapped runs (tests, CI, this sandbox) keep injected fakes and
  the sources' honest ``NotImplementedError`` refusal;
- a deployment exports ``SPOTIFY_ACCESS_TOKEN`` (static token) or the
  ``SPOTIFY_REFRESH_TOKEN`` / ``SPOTIFY_CLIENT_ID`` /
  ``SPOTIFY_CLIENT_SECRET`` trio (full refresh flow through
  ``auth.RefreshTokenProvider``) and gets a live fetcher from
  ``fetcher_from_env`` with bearer auth and 429/5xx backoff;
- the ``Cassette`` record/replay pair runs the REAL fetcher code path
  against canned responses, so integration shape is testable without
  network.

The transport object is injectable everywhere (anything duck-typed to
``requests.Session``), so every branch below is exercised by unit
tests with a fake session; ``requests`` itself is imported lazily and
only when a real session is actually constructed.
"""

from __future__ import annotations

import json
import os
import time
from collections.abc import Callable, Mapping

from spotify_pipeline_gcp_spark.sources.auth import (
    RefreshTokenProvider,
    StaticTokenProvider,
)
from spotify_pipeline_gcp_spark.sources.rest import Fetcher

DEFAULT_BASE_URL = "https://api.spotify.com"


class HttpError(RuntimeError):
    """Non-retryable HTTP failure (or retries exhausted)."""


def requests_session():
    """A real ``requests.Session`` — the only network-touching
    constructor in the package; everything else takes the session as
    a parameter."""
    import requests

    return requests.Session()


def requests_fetcher(
    token: Callable[[], str] | str,
    base_url: str = DEFAULT_BASE_URL,
    session=None,
    max_retries: int = 3,
    backoff: float = 1.0,
    sleep: Callable[[float], None] = time.sleep,
) -> Fetcher:
    """Compose a live ``(endpoint, params) -> dict`` Fetcher.

    Bearer auth from ``token`` (a provider callable or a fixed
    string, resolved per request so refresh flows stay live), plus
    the retry discipline a production ingest needs: 429 and 503
    honor a numeric ``Retry-After`` (RFC 9110 allows it on both;
    falling back to exponential backoff), other 5xx retry with
    exponential backoff, anything else non-200 raises ``HttpError``
    immediately. ``sleep`` is injectable so tests run the real
    branch without waiting.
    """
    if max_retries < 0:
        raise ValueError(f"max_retries must be >= 0, got {max_retries}")
    if session is None:
        session = requests_session()
    token_fn = token if callable(token) else (lambda: token)

    def fetch(endpoint: str, params: dict) -> dict:
        url = f"{base_url.rstrip('/')}/{endpoint.lstrip('/')}"
        for attempt in range(max_retries + 1):
            resp = session.get(
                url,
                params=params,
                headers={"Authorization": f"Bearer {token_fn()}"},
                timeout=30,
            )
            if resp.status_code == 200:
                return resp.json()
            last = f"GET {url} -> {resp.status_code}"
            retryable = resp.status_code == 429 or 500 <= resp.status_code < 600
            if not retryable:
                raise HttpError(f"{last}: {resp.text[:200]}")
            if attempt >= max_retries:
                raise HttpError(
                    f"retries exhausted after {max_retries + 1} attempts: "
                    f"{last}: {resp.text[:200]}"
                )
            wait = backoff * (2**attempt)
            if resp.status_code in (429, 503):
                # RFC 9110 allows Retry-After (on 429 AND 503) as
                # either delta-seconds or an HTTP-date; only the
                # numeric form is honored (a date would need clock
                # parsing — exponential backoff is the safe
                # fallback, not a crash)
                header = resp.headers.get("Retry-After", "")
                try:
                    wait = float(header)
                except ValueError:
                    pass
            sleep(wait)
        raise AssertionError("unreachable: loop always returns or raises")

    return fetch


def requests_token_transport(session=None):
    """``auth.Transport`` backed by requests: ``(url, form_data,
    headers) -> dict`` for the refresh-token exchange POST."""
    if session is None:
        session = requests_session()

    def post(url: str, data: dict, headers: dict) -> dict:
        resp = session.post(url, data=data, headers=headers, timeout=30)
        if resp.status_code != 200:
            raise HttpError(
                f"POST {url} -> {resp.status_code}: {resp.text[:200]}"
            )
        return resp.json()

    return post


def fetcher_from_env(
    env: Mapping[str, str] | None = None, session=None
) -> Fetcher | None:
    """THE env gate: build a live fetcher from credentials in the
    environment, or return None so sources keep their honest
    air-gapped refusal.

    ``SPOTIFY_ACCESS_TOKEN`` wins (static token — dev loops);
    otherwise the ``SPOTIFY_REFRESH_TOKEN`` / ``SPOTIFY_CLIENT_ID`` /
    ``SPOTIFY_CLIENT_SECRET`` trio activates the full
    ``RefreshTokenProvider`` exchange-and-cache flow (the reference's
    ``auth.py`` semantics) over the requests transport.
    """
    env = os.environ if env is None else env
    tok = env.get("SPOTIFY_ACCESS_TOKEN")
    if tok:
        return requests_fetcher(StaticTokenProvider(tok).token, session=session)
    rt = env.get("SPOTIFY_REFRESH_TOKEN")
    cid = env.get("SPOTIFY_CLIENT_ID")
    cs = env.get("SPOTIFY_CLIENT_SECRET")
    if rt and cid and cs:
        provider = RefreshTokenProvider(
            rt, cid, cs, transport=requests_token_transport(session)
        )
        return requests_fetcher(provider.token, session=session)
    return None


class Cassette:
    """Record/replay tape for Fetchers — the integration-test seam.

    ``record(fetcher)`` wraps a live fetcher and persists every
    (endpoint, sorted-params) -> response-dict pair to a JSON file;
    ``replay()`` serves the tape back as a Fetcher, raising loudly on
    a request the tape never saw (a silent fallthrough would let a
    drifted request shape pass CI). The tape file is plain JSON so a
    recorded exchange can be reviewed and committed as a fixture.
    """

    def __init__(self, path: str):
        self.path = path

    @staticmethod
    def _key(endpoint: str, params: dict) -> str:
        return json.dumps(
            [endpoint, sorted((k, str(v)) for k, v in params.items())]
        )

    def record(self, fetcher: Fetcher) -> Fetcher:
        tape: dict[str, dict] = {}

        def wrapped(endpoint: str, params: dict) -> dict:
            doc = fetcher(endpoint, params)
            tape[self._key(endpoint, params)] = doc
            with open(self.path, "w") as f:
                json.dump(tape, f, indent=1)
            return doc

        return wrapped

    def replay(self) -> Fetcher:
        with open(self.path) as f:
            tape = json.load(f)

        def fetch(endpoint: str, params: dict) -> dict:
            key = self._key(endpoint, params)
            if key not in tape:
                raise HttpError(
                    f"cassette miss: {endpoint} {params} not in {self.path}"
                )
            return tape[key]

        return fetch
