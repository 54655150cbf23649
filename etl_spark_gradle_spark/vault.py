"""HashiCorp Vault adapter (KV v2 REST) for secret resolution.

Parity target: ``vault/VaultClient.scala`` — whose production branch is
a TODO (every method says "In production, this would make HTTP request")
and only the in-memory mock actually runs. This adapter implements the
real thing over the public KV v2 HTTP API (GET/POST ``/v1/<mount>/data/
<path>``, LIST/DELETE ``/v1/<mount>/metadata/<path>``, ``/v1/sys/
health``) via stdlib ``urllib`` — no SDK dependency — while keeping the
reference's mock mode for tests and offline runs.

Wire-up: ``plans/config.py`` resolves ``${VAULT:mount/path/key}``
through :func:`resolve_vault_placeholder` when ``VAULT_ADDR`` is set;
without it, placeholders fall back to the environment-variable shim
(path separators become underscores), which is the right behavior for
CI environments with no Vault to talk to.

Security note: secrets never land in YAML or logs — resolution happens
in-process at config-parse time, and this module never prints values.
"""

from __future__ import annotations

import json
import os
import urllib.error
import urllib.request

from etl_spark_gradle_spark.plans.config import ConfigError


class VaultClient:
    """KV v2 client. ``mock_secrets={"secret/kafka": {"password": "x"}}``
    short-circuits HTTP entirely (reference-parity mock mode)."""

    def __init__(
        self,
        vault_url: str = "http://localhost:8200",
        token: str = "",
        mock_secrets: dict[str, dict[str, str]] | None = None,
        timeout: float = 5.0,
    ) -> None:
        self.vault_url = vault_url.rstrip("/")
        self.token = token
        self.timeout = timeout
        self._mock = dict(mock_secrets) if mock_secrets is not None else None

    @classmethod
    def from_environment(cls) -> "VaultClient":
        """``VAULT_ADDR`` + ``VAULT_TOKEN`` (same variables as the
        reference and the vault CLI)."""
        return cls(
            vault_url=os.environ.get("VAULT_ADDR", "http://localhost:8200"),
            token=os.environ.get("VAULT_TOKEN", ""),
        )

    @classmethod
    def mock(cls, secrets: dict[str, dict[str, str]]) -> "VaultClient":
        return cls(mock_secrets=secrets)

    # -- HTTP plumbing -----------------------------------------------------

    def _request(self, method: str, url_path: str, body: dict | None = None) -> dict:
        req = urllib.request.Request(
            f"{self.vault_url}{url_path}",
            data=json.dumps(body).encode() if body is not None else None,
            headers={"X-Vault-Token": self.token, "Content-Type": "application/json"},
            method=method,
        )
        try:
            with urllib.request.urlopen(req, timeout=self.timeout) as resp:
                raw = resp.read()
                return json.loads(raw) if raw else {}
        except urllib.error.HTTPError as e:
            if e.code == 404:
                return {}
            raise ConfigError(
                f"vault {method} {url_path} failed: HTTP {e.code}"
            ) from e
        except urllib.error.URLError as e:
            raise ConfigError(f"vault unreachable at {self.vault_url}: {e.reason}") from e

    @staticmethod
    def _split_mount(path: str) -> tuple[str, str]:
        """``secret/kafka/prod`` → mount ``secret``, path ``kafka/prod``
        (KV v2 URLs put ``data``/``metadata`` between the two)."""
        mount, _, rest = path.strip("/").partition("/")
        if not mount or not rest:
            raise ConfigError(
                f"vault path must be '<mount>/<path>', got '{path}'"
            )
        return mount, rest

    # -- API (reference-parity surface + real HTTP) ------------------------

    def get_secret(self, path: str) -> dict[str, str]:
        """Key-value pairs at ``path``; empty dict when absent (parity:
        ``VaultClient.scala:24-28``)."""
        if self._mock is not None:
            return dict(self._mock.get(path, {}))
        mount, rest = self._split_mount(path)
        out = self._request("GET", f"/v1/{mount}/data/{rest}")
        return dict(out.get("data", {}).get("data", {}) or {})

    def write_secret(self, path: str, secrets: dict[str, str]) -> None:
        if self._mock is not None:
            self._mock[path] = dict(secrets)
            return
        mount, rest = self._split_mount(path)
        self._request("POST", f"/v1/{mount}/data/{rest}", {"data": secrets})

    def delete_secret(self, path: str) -> None:
        if self._mock is not None:
            self._mock.pop(path, None)
            return
        mount, rest = self._split_mount(path)
        self._request("DELETE", f"/v1/{mount}/metadata/{rest}")

    def list_secrets(self, prefix: str) -> list[str]:
        """Paths under ``prefix`` (full paths, like the reference's
        filter-by-startswith)."""
        if self._mock is not None:
            return sorted(p for p in self._mock if p.startswith(prefix))
        mount, rest = self._split_mount(prefix)
        out = self._request("LIST", f"/v1/{mount}/metadata/{rest.rstrip('/')}")
        keys = out.get("data", {}).get("keys", []) or []
        base = prefix.rstrip("/")
        return sorted(f"{base}/{k}".rstrip("/") for k in keys)

    def is_connected(self) -> bool:
        if self._mock is not None:
            return True
        try:
            self._request("GET", "/v1/sys/health")
            return True
        except ConfigError:
            return False


def resolve_vault_placeholder(path_and_key: str) -> str | None:
    """Resolve ``${VAULT:mount/path/key}``: the LAST segment is the key
    inside the secret, the rest is the secret path. Returns None when no
    ``VAULT_ADDR`` is configured (caller falls back to the env shim)."""
    if not os.environ.get("VAULT_ADDR"):
        return None
    path, _, key = path_and_key.rpartition("/")
    if not path or not key:
        raise ConfigError(
            f"vault placeholder needs '<mount>/<path>/<key>', got '{path_and_key}'"
        )
    value = VaultClient.from_environment().get_secret(path).get(key)
    if value is None:
        raise ConfigError(f"vault secret not found: {path_and_key}")
    return value
