"""Vaults-provider HTTP transport abstraction (reference
pkg/vaultsprovider/provider.go:26-210).

The reference talks to its provider with TWO http clients: a 10-second
metadata client (create vault, list vaults, list events) and an
UNLIMITED-timeout client for event uploads (provider.go:28-30 vs
143-146) — a multi-GB signed parquet upload must not be killed by a
metadata deadline; retrieval uses a per-call timeout (provider.go:184-186).

This module makes every request an inspectable value (`ProviderRequest`)
built by a pure function, and sends them through a pluggable Transport,
so the exact method/URL/header/query/timeout shape of each verb is
golden-testable without a network, and a real HTTP client (or a test
fake, or a recording proxy) drops in behind one callable.
"""

from __future__ import annotations

import json
import re
from dataclasses import dataclass, field
from typing import Callable

METADATA_TIMEOUT_S: float = 10.0  # provider.go:28-30
UPLOAD_TIMEOUT_S: None = None  # provider.go:143-146 — unlimited


@dataclass(frozen=True)
class ProviderRequest:
    method: str
    url: str
    headers: dict = field(default_factory=dict)
    query: dict = field(default_factory=dict)
    body: bytes | None = None
    timeout_s: float | None = METADATA_TIMEOUT_S
    expect_status: int = 200


@dataclass(frozen=True)
class ProviderResponse:
    status: int
    headers: dict
    body: bytes


# transport: request -> response; the ONLY seam that touches a network
Transport = Callable[[ProviderRequest], ProviderResponse]


# -- request builders (one per reference verb) ------------------------------


def create_vault_request(
    provider: str, vault: str, account_hex: str, cache_duration: int
) -> ProviderRequest:
    """POST /vaults/{vault}, form-encoded, 201 expected
    (provider.go:39-65)."""
    form = f"account={account_hex}&cache={cache_duration}"
    return ProviderRequest(
        method="POST",
        url=f"{provider}/vaults/{vault}",
        headers={"Content-Type": "application/x-www-form-urlencoded"},
        body=form.encode(),
        timeout_s=METADATA_TIMEOUT_S,
        expect_status=201,
    )


def list_vaults_request(provider: str, account_hex: str) -> ProviderRequest:
    """GET /v2/vaults/?account=... (provider.go:67-90)."""
    return ProviderRequest(
        method="GET",
        url=f"{provider}/v2/vaults/",
        query={"account": account_hex},
        timeout_s=METADATA_TIMEOUT_S,
    )


def list_vault_events_request(
    provider: str, vault: str, limit: int, offset: int,
    before_s: int = 0, after_s: int = 0,
) -> ProviderRequest:
    """GET /vaults/{vault}/events with limit/offset/before/after seconds
    (provider.go:92-122)."""
    return ProviderRequest(
        method="GET",
        url=f"{provider}/vaults/{vault}/events",
        query={
            "limit": str(limit),
            "offset": str(offset),
            "before": str(before_s),
            "after": str(after_s),
        },
        timeout_s=METADATA_TIMEOUT_S,
    )


def write_vault_event_request(
    provider: str, vault: str, filename: str, timestamp_s: int,
    signature_hex: str, content: bytes,
) -> ProviderRequest:
    """POST /vaults/{vault}/events: filename header, timestamp+signature
    query params, body streamed with NO timeout — the upload client
    (provider.go:124-169)."""
    return ProviderRequest(
        method="POST",
        url=f"{provider}/vaults/{vault}/events",
        headers={"filename": filename},
        query={"timestamp": str(timestamp_s), "signature": signature_hex},
        body=content,
        timeout_s=UPLOAD_TIMEOUT_S,
        expect_status=201,
    )


def retrieve_event_request(
    provider: str, cid: str, timeout_s: float
) -> ProviderRequest:
    """GET /events/{cid} with the caller's timeout (provider.go:171-186);
    404 means not-in-cache -> the caller falls to the cold store."""
    return ProviderRequest(
        method="GET",
        url=f"{provider}/events/{cid}",
        timeout_s=timeout_s,
    )


_FILENAME_RE = re.compile(r'".+"')


def parse_content_disposition_filename(header: str) -> tuple[str, str]:
    """Replicates the reference's filename recovery (provider.go:199-209):
    the quoted value must contain at least one '-' separating vault from
    name.  Returns (vault_prefix, rest)."""
    m = _FILENAME_RE.search(header or "")
    if not m:
        raise ValueError("filename not found")
    inner = m.group(0)[1:-1]
    parts = inner.split("-")
    if len(parts) < 2:
        raise ValueError("filename format is not correct")
    return parts[0], "-".join(parts[1:])


class NotFoundInCache(KeyError):
    """The provider's 404 on /events/{cid} — retry against the cold
    store (reference app.ErrNotFoundInCache)."""


class VaultsProvider:
    """The reference's provider API over a pluggable transport."""

    def __init__(self, provider: str, transport: Transport) -> None:
        self.provider = provider
        self.transport = transport

    def _send(self, req: ProviderRequest) -> ProviderResponse:
        resp = self.transport(req)
        if req.expect_status and resp.status != req.expect_status:
            if resp.status == 404:
                raise NotFoundInCache(req.url)
            try:
                err = json.loads(resp.body or b"{}").get("error", "")
            except json.JSONDecodeError:
                err = ""
            raise RuntimeError(
                f"{req.method} {req.url}: status {resp.status} {err}".strip()
            )
        return resp

    def create_vault(self, vault: str, account_hex: str, cache: int) -> None:
        self._send(create_vault_request(self.provider, vault, account_hex, cache))

    def list_vaults(self, account_hex: str) -> list:
        resp = self._send(list_vaults_request(self.provider, account_hex))
        return json.loads(resp.body)

    def list_vault_events(self, vault: str, limit: int = 100, offset: int = 0,
                          before_s: int = 0, after_s: int = 0) -> list:
        resp = self._send(
            list_vault_events_request(
                self.provider, vault, limit, offset, before_s, after_s
            )
        )
        return json.loads(resp.body)

    def write_vault_event(self, vault: str, filename: str, timestamp_s: int,
                          signature_hex: str, content: bytes) -> None:
        self._send(
            write_vault_event_request(
                self.provider, vault, filename, timestamp_s, signature_hex, content
            )
        )

    def retrieve_event(self, cid: str, timeout_s: float = 30.0) -> bytes:
        resp = self._send(retrieve_event_request(self.provider, cid, timeout_s))
        # the reference insists on a parseable filename before trusting
        # the body (provider.go:199-209)
        parse_content_disposition_filename(
            resp.headers.get("content-disposition", "")
        )
        return resp.body


def http_transport() -> Transport:
    """The REAL drop-in Transport: stdlib urllib over the request value —
    no third-party client.  Honors each request's method, headers,
    query, body, and per-request timeout (None = unlimited, the upload
    client's contract).  Non-2xx responses return as ProviderResponse
    (status checked by the caller against expect_status), matching how
    the fake transports behave — the error policy lives in ONE place
    (ProviderClient._send), not in the carrier.  Loopback-tested against
    an in-process http.server (tests/test_retrieval.py), the same
    no-network-needed discipline as the pgwire walsender shim."""
    import http.client
    import urllib.error
    import urllib.parse
    import urllib.request

    def send(req: ProviderRequest) -> ProviderResponse:
        url = req.url
        if req.query:
            url += ("&" if "?" in url else "?") + urllib.parse.urlencode(
                req.query
            )
        r = urllib.request.Request(
            url, data=req.body, headers=dict(req.headers), method=req.method
        )
        try:
            with urllib.request.urlopen(r, timeout=req.timeout_s) as resp:
                return ProviderResponse(
                    status=resp.status,
                    headers={k.lower(): v for k, v in resp.headers.items()},
                    body=resp.read(),
                )
        except urllib.error.HTTPError as e:  # non-2xx still has a body
            return ProviderResponse(
                status=e.code,
                headers={k.lower(): v for k, v in e.headers.items()},
                body=e.read(),
            )
        except http.client.HTTPException:
            # A misbehaving server (BadStatusLine, LineTooLong, truncated
            # chunked body) is a transport failure like any socket error:
            # surface it as a synthetic 0-status response so callers'
            # status checks / resolver-miss policy handle it in one place
            # instead of the exception escaping the resolver chain.
            return ProviderResponse(status=0, headers={}, body=b"")

    return send
