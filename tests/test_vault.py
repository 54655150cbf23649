"""Vault adapter tests: a REAL in-process HTTP server speaking the KV v2
REST shapes (GET/POST /v1/<mount>/data/<path>, LIST/DELETE
/v1/<mount>/metadata/<path>, /v1/sys/health) drives the actual urllib
code path — no mocking of the client under test. Parity target:
vault/VaultClient.scala + VaultClientSpec.scala (whose "production"
branch the reference never implemented)."""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from etl_spark_gradle_spark.plans.config import ConfigError, parse_pipeline_dict
from etl_spark_gradle_spark.vault import VaultClient, resolve_vault_placeholder

TOKEN = "unit-test-token"


class _KvV2Handler(BaseHTTPRequestHandler):
    store: dict[str, dict[str, str]] = {}

    def _send(self, code: int, body: dict | None = None) -> None:
        raw = json.dumps(body).encode() if body is not None else b""
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(raw)))
        self.end_headers()
        self.wfile.write(raw)

    def _authed(self) -> bool:
        if self.headers.get("X-Vault-Token") != TOKEN:
            self._send(403, {"errors": ["permission denied"]})
            return False
        return True

    def do_GET(self):  # noqa: N802 (http.server API)
        if self.path == "/v1/sys/health":
            self._send(200, {"initialized": True, "sealed": False})
            return
        if not self._authed():
            return
        if self.path.startswith("/v1/secret/data/"):
            path = "secret/" + self.path[len("/v1/secret/data/") :]
            if path in self.store:
                self._send(200, {"data": {"data": self.store[path]}})
            else:
                self._send(404, {"errors": []})
            return
        self._send(404, {"errors": []})

    def do_POST(self):  # noqa: N802
        if not self._authed():
            return
        if self.path.startswith("/v1/secret/data/"):
            path = "secret/" + self.path[len("/v1/secret/data/") :]
            n = int(self.headers.get("Content-Length", 0))
            body = json.loads(self.rfile.read(n) or b"{}")
            self.store[path] = dict(body.get("data", {}))
            self._send(200, {"data": {"version": 1}})
            return
        self._send(404, {"errors": []})

    def do_DELETE(self):  # noqa: N802
        if not self._authed():
            return
        if self.path.startswith("/v1/secret/metadata/"):
            path = "secret/" + self.path[len("/v1/secret/metadata/") :]
            self.store.pop(path, None)
            self._send(204)
            return
        self._send(404, {"errors": []})

    def do_LIST(self):  # noqa: N802
        if not self._authed():
            return
        if self.path.startswith("/v1/secret/metadata/"):
            prefix = "secret/" + self.path[len("/v1/secret/metadata/") :].rstrip("/")
            keys = sorted(
                p[len(prefix) + 1 :].split("/")[0]
                for p in self.store
                if p.startswith(prefix + "/")
            )
            if keys:
                self._send(200, {"data": {"keys": keys}})
            else:
                self._send(404, {"errors": []})
            return
        self._send(404, {"errors": []})

    def log_message(self, *a):  # silence test output
        pass


@pytest.fixture(scope="module")
def vault_server():
    _KvV2Handler.store = {}
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _KvV2Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def test_vault_http_roundtrip(vault_server):
    c = VaultClient(vault_url=vault_server, token=TOKEN)
    assert c.is_connected()
    assert c.get_secret("secret/kafka") == {}  # absent -> empty, parity
    c.write_secret("secret/kafka", {"user": "svc", "password": "hunter2"})
    c.write_secret("secret/db/prod", {"password": "pg"})
    assert c.get_secret("secret/kafka") == {"user": "svc", "password": "hunter2"}
    assert c.list_secrets("secret/db") == ["secret/db/prod"]
    c.delete_secret("secret/kafka")
    assert c.get_secret("secret/kafka") == {}


def test_vault_bad_token_raises(vault_server):
    c = VaultClient(vault_url=vault_server, token="wrong")
    with pytest.raises(ConfigError, match="HTTP 403"):
        c.write_secret("secret/x", {"a": "b"})


def test_vault_unreachable_raises():
    c = VaultClient(vault_url="http://127.0.0.1:9", token=TOKEN, timeout=0.5)
    with pytest.raises(ConfigError, match="unreachable"):
        c.get_secret("secret/x")
    assert not c.is_connected()


def test_vault_mock_mode_parity():
    c = VaultClient.mock({"secret/kafka": {"password": "x"}})
    assert c.get_secret("secret/kafka") == {"password": "x"}
    c.write_secret("secret/new", {"k": "v"})
    assert c.list_secrets("secret/") == ["secret/kafka", "secret/new"]
    c.delete_secret("secret/kafka")
    assert c.get_secret("secret/kafka") == {}
    assert c.is_connected()


def test_vault_placeholder_resolution_end_to_end(vault_server, monkeypatch):
    """${VAULT:mount/path/key} resolves through the REAL HTTP path at
    config-parse time; with no VAULT_ADDR it falls back to the env shim."""
    monkeypatch.setenv("VAULT_ADDR", vault_server)
    monkeypatch.setenv("VAULT_TOKEN", TOKEN)
    VaultClient(vault_url=vault_server, token=TOKEN).write_secret(
        "secret/db", {"password": "s3cret"}
    )
    config = parse_pipeline_dict(
        {
            "pipelineId": "x",
            "source": {
                "type": "postgres",
                "options": {
                    "url": "jdbc:postgresql://h/db",
                    "table": "t",
                    "password": "${VAULT:secret/db/password}",
                },
            },
            "sink": {"type": "s3", "options": {"path": "/b"}},
        }
    )
    assert config.source.options["password"] == "s3cret"

    with pytest.raises(ConfigError, match="not found"):
        resolve_vault_placeholder("secret/db/absent_key")

    # no VAULT_ADDR -> env-var shim keeps offline runs working
    monkeypatch.delenv("VAULT_ADDR")
    monkeypatch.setenv("secret_db_password", "from-env")
    assert resolve_vault_placeholder("secret/db/password") is None
    config2 = parse_pipeline_dict(
        {
            "pipelineId": "x",
            "source": {
                "type": "postgres",
                "options": {"url": "u", "table": "t",
                            "password": "${VAULT:secret/db/password}"},
            },
            "sink": {"type": "s3", "options": {"path": "/b"}},
        }
    )
    assert config2.source.options["password"] == "from-env"
