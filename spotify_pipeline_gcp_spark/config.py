"""Layered runtime-config resolution (SURVEY §2.1 periphery).

The reference resolves credentials by trying a local ``.env.yml``
file and falling back to a cloud secret store
(``/root/reference/gcp_utils/common_functions.py:22-54``). Engine
shape: the same cascade, generalized and dependency-free —

1. explicit config file (JSON mapping; the reference's YAML payload
   is a flat mapping, and JSON needs no extra dependency),
2. environment variables (``<prefix><KEY>``),
3. an injected ``secret_resolver`` callable modelling the secret
   store (production wires the real client; tests a dict lookup).

Resolution is per-key: the first layer holding a key wins, so a
partial local file can override just one secret. No cloud SDK import
and no network — deployment specifics arrive via injection, the same
pattern as the REST fetcher/transport.
"""

from __future__ import annotations

import json
import os
from collections.abc import Callable, Mapping, Sequence


class ConfigError(KeyError):
    pass


def resolve_config(
    keys: Sequence[str],
    path: str | None = None,
    env: Mapping[str, str] | None = None,
    env_prefix: str = "SPOTIFY_",
    secret_resolver: Callable[[str], str | None] | None = None,
    required: bool = True,
) -> dict[str, str]:
    """Resolve ``keys`` through file → env → secret-resolver layers.

    ``path`` file must hold a flat JSON object; missing file is not
    an error (mirrors the reference's try-local-first behavior).
    ``secret_resolver(key)`` returns the secret or None. With
    ``required``, any unresolved key raises ``ConfigError`` naming
    every missing key at once.
    """
    file_layer: dict[str, str] = {}
    if path and os.path.exists(path):
        with open(path, encoding="utf-8") as fh:
            loaded = json.load(fh)
        if not isinstance(loaded, dict):
            raise ConfigError(f"config file {path} must hold a JSON object")
        file_layer = {str(k): str(v) for k, v in loaded.items()}
    env = os.environ if env is None else env

    out: dict[str, str] = {}
    missing: list[str] = []
    for key in keys:
        if key in file_layer:
            out[key] = file_layer[key]
            continue
        env_val = env.get(env_prefix + key)
        if env_val is not None:
            out[key] = env_val
            continue
        secret = secret_resolver(key) if secret_resolver else None
        if secret is not None:
            out[key] = secret
            continue
        missing.append(key)
    if missing and required:
        raise ConfigError(
            f"unresolved config keys {missing}: not in file "
            f"({path or '<none>'}), env ({env_prefix}*), or secret resolver"
        )
    return out
