"""Minimal Postgres v3 wire-protocol client for logical replication.

The last seam between sources/replication.py's transport-free protocol
layer and a live server: an actual TCP socket speaking the PUBLIC
Postgres frontend/backend protocol (documented in PostgreSQL protocol
chapters 55.2 "Message Flow" and 55.7 "Message Formats") far enough to
drive a walsender session the way the reference's pgconn does
(/root/reference/pkg/pgrepl/conn.go:18-56, replicator.go:61-133):

* StartupMessage with ``replication=database`` (what turns a connection
  into a walsender session);
* simple Query flow for the handshake SQL (resume-point lookup, slot
  create, publication table discovery, START_REPLICATION);
* CopyBothResponse -> CopyData streaming in both directions (XLogData /
  keepalives in, StandbyStatusUpdate acks out).

The class implements exactly the duck-typed transport surface
``start_replication_session`` / ``pump`` consume (exec_query,
exec_command, recv, send), so the protocol state machine is byte-for-byte
the one the scripted-transport tests pin — only the byte carrier
changes.  tests/test_replication.py drives it against an in-process fake
walsender on 127.0.0.1 (the Python analogue of the reference's
pgmock-based replicator_test.go:37-94) and asserts the SAME golden
ack-LSN sequence as the scripted-transport session tests.

Auth scope: trust (AuthenticationOk) and SCRAM-SHA-256 (RFC 5802/7677
over the protocol's AuthenticationSASL/-Continue/-Final exchange, the
method every supported Postgres defaults to via
``password_encryption=scram-sha-256``) — both sides implemented in pure
stdlib hmac/hashlib/pbkdf2 below, with the client verifying the server
signature (mutual auth) before trusting AuthenticationOk.  MD5 auth is
deliberately absent (deprecated upstream).
"""

from __future__ import annotations

import base64
import hashlib
import hmac
import os
import socket
import struct

PROTOCOL_VERSION = 196608  # v3.0

# Backend message type bytes (protocol §55.7)
AUTHENTICATION = ord("R")
PARAMETER_STATUS = ord("S")
BACKEND_KEY_DATA = ord("K")
READY_FOR_QUERY = ord("Z")
ROW_DESCRIPTION = ord("T")
DATA_ROW = ord("D")
COMMAND_COMPLETE = ord("C")
COPY_BOTH_RESPONSE = ord("W")
COPY_DATA = ord("d")
COPY_DONE = ord("c")
ERROR_RESPONSE = ord("E")

# Frontend message type bytes
QUERY = ord("Q")
TERMINATE = ord("X")
SASL_RESPONSE = ord("p")  # SASLInitialResponse / SASLResponse share 'p'

# Authentication request codes (payload int32, protocol §55.7 AuthenticationX)
AUTH_OK = 0
AUTH_SASL = 10
AUTH_SASL_CONTINUE = 11
AUTH_SASL_FINAL = 12

SCRAM_MECHANISM = "SCRAM-SHA-256"
SCRAM_ITERATIONS = 4096  # Postgres default (scram_iterations GUC)
_GS2_HEADER = "n,,"  # no channel binding; base64("n,,") == "biws"


# -- SCRAM-SHA-256 (RFC 5802 key derivation, RFC 7677 SHA-256 profile) -------
#
# Both halves of the exchange live here: the client proof/verify path the
# real connection uses, and the server verifier the in-process fake
# walsender uses in tests (the same split as recv_startup above).  All
# primitives are stdlib: pbkdf2_hmac, hmac, sha256.


def scram_salted_password(password: str, salt: bytes, iterations: int) -> bytes:
    """Hi(password, salt, i) — RFC 5802 §2.2 is exactly PBKDF2-HMAC-SHA256."""
    return hashlib.pbkdf2_hmac(
        "sha256", password.encode(), salt, iterations
    )


def _hmac(key: bytes, msg: str) -> bytes:
    return hmac.new(key, msg.encode(), hashlib.sha256).digest()


def _parse_scram_attrs(message: str) -> dict[str, str]:
    """``r=...,s=...,i=...`` → dict.  SCRAM attributes are single letters;
    values may themselves contain '=' (base64), so split on the FIRST."""
    out: dict[str, str] = {}
    for part in message.split(","):
        if len(part) >= 2 and part[1] == "=":
            out[part[0]] = part[2:]
    return out


def scram_client_first(nonce: str) -> tuple[str, str]:
    """(full client-first-message, client-first-bare).  The username slot
    is empty — Postgres ignores it and takes the role from the startup
    packet (its own libpq sends ``n=`` too), which sidesteps SASLprep."""
    bare = f"n=,r={nonce}"
    return _GS2_HEADER + bare, bare


def scram_client_final(
    password: str, client_first_bare: str, server_first: str
) -> tuple[str, bytes]:
    """Compute the client-final-message for a server-first challenge.

    Returns (client_final_message, expected server signature) — the
    caller checks the server's AuthenticationSASLFinal ``v=`` against the
    signature so a server that doesn't actually know the password's
    verifier cannot fake a success (RFC 5802 mutual auth)."""
    attrs = _parse_scram_attrs(server_first)
    full_nonce = attrs["r"]
    # RFC 5802 §5.1: the client MUST verify the server nonce extends the
    # nonce it sent — a replaced nonce severs the session binding the
    # nonce exists to provide, so abort instead of proving over it.
    client_nonce = _parse_scram_attrs(client_first_bare).get("r", "")
    if (
        not client_nonce
        or not full_nonce.startswith(client_nonce)
        or len(full_nonce) <= len(client_nonce)  # echo adds no freshness
    ):
        raise ValueError(
            "SCRAM server-first nonce does not extend the client nonce"
        )
    salt = base64.b64decode(attrs["s"])
    iterations = int(attrs["i"])
    salted = scram_salted_password(password, salt, iterations)
    client_key = _hmac(salted, "Client Key")
    stored_key = hashlib.sha256(client_key).digest()
    without_proof = (
        f"c={base64.b64encode(_GS2_HEADER.encode()).decode()},r={full_nonce}"
    )
    auth_message = f"{client_first_bare},{server_first},{without_proof}"
    client_sig = _hmac(stored_key, auth_message)
    proof = bytes(a ^ b for a, b in zip(client_key, client_sig))
    server_key = _hmac(salted, "Server Key")
    server_sig = _hmac(server_key, auth_message)
    final = f"{without_proof},p={base64.b64encode(proof).decode()}"
    return final, server_sig


class ScramVerifier:
    """Server half of the exchange, for the in-process fake walsender:
    holds the stored verifier (StoredKey/ServerKey — what a real server
    keeps in pg_authid; the cleartext password is only used here to
    derive it) and checks a client proof."""

    def __init__(
        self,
        password: str,
        salt: bytes = b"basin-spark-salt",
        iterations: int = SCRAM_ITERATIONS,
    ):
        self.salt = salt
        self.iterations = iterations
        salted = scram_salted_password(password, salt, iterations)
        self.stored_key = hashlib.sha256(_hmac(salted, "Client Key")).digest()
        self.server_key = _hmac(salted, "Server Key")

    def server_first(self, client_first: str, server_nonce_ext: str) -> str:
        """Build server-first-message for a SASLInitialResponse body.
        Strips the gs2 header, appends our nonce extension to the
        client's."""
        bare = client_first
        if bare.startswith(_GS2_HEADER):
            bare = bare[len(_GS2_HEADER):]
        self._client_first_bare = bare
        client_nonce = _parse_scram_attrs(bare)["r"]
        self._full_nonce = client_nonce + server_nonce_ext
        self._server_first = (
            f"r={self._full_nonce}"
            f",s={base64.b64encode(self.salt).decode()}"
            f",i={self.iterations}"
        )
        return self._server_first

    def verify_client_final(self, client_final: str) -> str | None:
        """Check proof + nonce; return the server-final ``v=...`` message
        on success, None on a bad proof (wrong password) or nonce."""
        attrs = _parse_scram_attrs(client_final)
        if attrs.get("r") != self._full_nonce:
            return None
        without_proof = client_final.rsplit(",p=", 1)[0]
        auth_message = (
            f"{self._client_first_bare},{self._server_first},{without_proof}"
        )
        client_sig = _hmac(self.stored_key, auth_message)
        try:
            proof = base64.b64decode(attrs.get("p", ""))
        except ValueError:
            return None
        if len(proof) != len(client_sig):
            return None
        client_key = bytes(a ^ b for a, b in zip(proof, client_sig))
        if not hmac.compare_digest(
            hashlib.sha256(client_key).digest(), self.stored_key
        ):
            return None
        server_sig = _hmac(self.server_key, auth_message)
        return f"v={base64.b64encode(server_sig).decode()}"


# -- framing -----------------------------------------------------------------


def encode_startup(user: str, database: str, replication: str = "database") -> bytes:
    """StartupMessage: no type byte; int32 length, int32 version, then
    key\\0value\\0 pairs and a trailing NUL.  ``replication=database``
    is what makes the backend a walsender accepting replication commands
    (PostgreSQL protocol §55.4)."""
    params = {"user": user, "database": database, "replication": replication}
    body = b"".join(
        k.encode() + b"\0" + v.encode() + b"\0" for k, v in params.items()
    ) + b"\0"
    payload = struct.pack(">i", PROTOCOL_VERSION) + body
    return struct.pack(">i", len(payload) + 4) + payload


def encode_message(type_byte: int, payload: bytes) -> bytes:
    """Regular message: type byte + int32 length (incl. itself) + payload."""
    return bytes([type_byte]) + struct.pack(">i", len(payload) + 4) + payload


def recv_exact(sock: socket.socket, n: int) -> bytes | None:
    buf = b""
    while len(buf) < n:
        chunk = sock.recv(n - len(buf))
        if not chunk:
            return None
        buf += chunk
    return buf


def recv_message(sock: socket.socket) -> tuple[int, bytes] | None:
    """(type_byte, payload) for the next regular message, None on EOF."""
    head = recv_exact(sock, 5)
    if head is None:
        return None
    type_byte = head[0]
    (length,) = struct.unpack(">i", head[1:5])
    payload = recv_exact(sock, length - 4) if length > 4 else b""
    if payload is None:
        return None
    return type_byte, payload


def recv_startup(sock: socket.socket) -> dict[str, str] | None:
    """Server side of encode_startup (used by the in-process fake
    walsender in tests): returns the key/value parameter dict."""
    head = recv_exact(sock, 8)
    if head is None:
        return None
    (length, version) = struct.unpack(">ii", head)
    body = recv_exact(sock, length - 8)
    if body is None or version != PROTOCOL_VERSION:
        return None
    parts = body.rstrip(b"\0").split(b"\0")
    return {
        parts[i].decode(): parts[i + 1].decode()
        for i in range(0, len(parts) - 1, 2)
    }


def _parse_data_row(payload: bytes) -> tuple:
    """DataRow: int16 ncols, then per column int32 length (-1 = NULL) +
    bytes.  Text format only — the walsender handshake queries return
    text columns."""
    (ncols,) = struct.unpack_from(">h", payload, 0)
    off = 2
    row = []
    for _ in range(ncols):
        (ln,) = struct.unpack_from(">i", payload, off)
        off += 4
        if ln < 0:
            row.append(None)
        else:
            row.append(payload[off : off + ln].decode())
            off += ln
    return tuple(row)


# -- the client --------------------------------------------------------------


class PgWireReplicationClient:
    """Socket transport for start_replication_session / pump.

    Connect -> startup handshake -> simple-query handshake commands ->
    START_REPLICATION flips the connection into CopyBoth mode, after
    which recv()/send() move CopyData payloads (the exact frames
    ReplicationSession.feed consumes and .drain emits)."""

    def __init__(
        self,
        host: str,
        port: int,
        user: str = "postgres",
        database: str = "postgres",
        timeout: float = 10.0,
        password: str | None = None,
        client_nonce: str | None = None,
    ):
        self._sock = socket.create_connection((host, port), timeout=timeout)
        self._copy_both = False
        self._sock.sendall(encode_startup(user, database))
        # consume auth/parameter chatter until ReadyForQuery, answering a
        # SCRAM-SHA-256 challenge if the server issues one
        scram_bare: str | None = None
        expected_server_sig: bytes | None = None
        scram_verified = False
        while True:
            msg = recv_message(self._sock)
            if msg is None:
                raise ConnectionError("server closed during startup")
            t, payload = msg
            if t == AUTHENTICATION:
                (code,) = struct.unpack_from(">i", payload, 0)
                if code == AUTH_OK:
                    # a SCRAM exchange, once started, must CLOSE with a
                    # verified AuthenticationSASLFinal before Ok is
                    # trusted — a server that skips the server-signature
                    # step never proved it holds the verifier, and its
                    # Ok is exactly what an impostor would send
                    if scram_bare is not None and not scram_verified:
                        raise ConnectionError(
                            "AuthenticationOk before the SCRAM server "
                            "signature was verified — refusing to trust "
                            "an unproven server"
                        )
                    continue
                if code == AUTH_SASL:
                    mechanisms = payload[4:].split(b"\0")
                    if SCRAM_MECHANISM.encode() not in mechanisms:
                        raise NotImplementedError(
                            f"no common SASL mechanism in {mechanisms!r}"
                        )
                    if password is None:
                        raise ConnectionError(
                            "server requires SCRAM-SHA-256 but no "
                            "password was given"
                        )
                    nonce = client_nonce or base64.b64encode(
                        os.urandom(18)
                    ).decode()
                    first, scram_bare = scram_client_first(nonce)
                    body = (
                        SCRAM_MECHANISM.encode() + b"\0"
                        + struct.pack(">i", len(first))
                        + first.encode()
                    )
                    self._sock.sendall(encode_message(SASL_RESPONSE, body))
                elif code == AUTH_SASL_CONTINUE:
                    if scram_bare is None or password is None:
                        raise ConnectionError(
                            "AuthenticationSASLContinue without a started "
                            "SCRAM exchange"
                        )
                    # malformed server-first (missing r=/s=/i=, bad
                    # base64, non-prefixed nonce) must abort cleanly,
                    # not escape as KeyError/ValueError internals
                    try:
                        final, expected_server_sig = scram_client_final(
                            password, scram_bare, payload[4:].decode()
                        )
                    except (KeyError, ValueError, UnicodeDecodeError) as exc:
                        raise ConnectionError(
                            f"malformed SCRAM server-first message: {exc}"
                        ) from exc
                    self._sock.sendall(
                        encode_message(SASL_RESPONSE, final.encode())
                    )
                elif code == AUTH_SASL_FINAL:
                    # mutual auth: a server that doesn't hold the real
                    # verifier can't produce this signature — refuse to
                    # proceed rather than trusting its AuthenticationOk
                    try:
                        attrs = _parse_scram_attrs(payload[4:].decode())
                        got = base64.b64decode(attrs.get("v", ""))
                    except (ValueError, UnicodeDecodeError) as exc:
                        raise ConnectionError(
                            f"malformed SCRAM server-final message: {exc}"
                        ) from exc
                    if expected_server_sig is None or not hmac.compare_digest(
                        got, expected_server_sig
                    ):
                        raise ConnectionError(
                            "SCRAM server signature mismatch — server does "
                            "not know the password verifier"
                        )
                    scram_verified = True
                else:
                    raise NotImplementedError(
                        f"auth method {code} not supported "
                        "(trust or SCRAM-SHA-256 only)"
                    )
            elif t == ERROR_RESPONSE:
                raise ConnectionError(f"startup error: {payload!r}")
            elif t == READY_FOR_QUERY:
                break

    # -- handshake surface (duck-typed transport) ----------------------------

    def _send_query(self, sql: str) -> None:
        self._sock.sendall(encode_message(QUERY, sql.encode() + b"\0"))

    def _drain_to_ready(self) -> None:
        """After an ErrorResponse the server still finishes the cycle
        with ReadyForQuery; consume up to it so the NEXT exec_* on this
        shared connection doesn't read a stale ReadyForQuery and return
        an empty result for a query that never ran."""
        while True:
            msg = recv_message(self._sock)
            if msg is None or msg[0] == READY_FOR_QUERY:
                return

    def exec_query(self, sql: str) -> list[tuple]:
        self._send_query(sql)
        rows: list[tuple] = []
        while True:
            msg = recv_message(self._sock)
            if msg is None:
                raise ConnectionError("server closed mid-query")
            t, payload = msg
            if t == DATA_ROW:
                rows.append(_parse_data_row(payload))
            elif t == ERROR_RESPONSE:
                self._drain_to_ready()
                raise RuntimeError(f"query failed: {payload!r}")
            elif t == READY_FOR_QUERY:
                return rows

    def exec_command(self, cmd: str) -> None:
        """Run a walsender command for effect.  START_REPLICATION answers
        with CopyBothResponse and STAYS in copy mode (no ReadyForQuery
        until the stream ends) — that flips this transport into
        CopyData mode for recv/send."""
        self._send_query(cmd)
        while True:
            msg = recv_message(self._sock)
            if msg is None:
                raise ConnectionError("server closed mid-command")
            t, payload = msg
            if t == COPY_BOTH_RESPONSE:
                self._copy_both = True
                return
            if t == ERROR_RESPONSE:
                self._drain_to_ready()
                raise RuntimeError(f"command failed: {payload!r}")
            if t == READY_FOR_QUERY:
                return

    # -- streaming surface ---------------------------------------------------

    def recv(self) -> bytes | None:
        """Next CopyData payload (an XLogData / keepalive frame for
        ReplicationSession.feed); None when the stream ends."""
        assert self._copy_both, "recv() before START_REPLICATION"
        while True:
            msg = recv_message(self._sock)
            if msg is None:
                return None
            t, payload = msg
            if t == COPY_DATA:
                return payload
            if t == ERROR_RESPONSE:
                # A server-side error mid-stream (slot conflict, WAL
                # removed, …) is NOT a clean end-of-stream: surface it so
                # the consumer never mistakes a truncated stream for a
                # completed one (exec_query/exec_command raise the same way).
                raise RuntimeError(f"replication stream error: {payload!r}")
            if t in (COPY_DONE, READY_FOR_QUERY):
                return None
            # ignore NoticeResponse / ParameterStatus chatter

    def send(self, frame: bytes) -> None:
        """Ship one StandbyStatusUpdate (or other status frame) wrapped in
        CopyData."""
        assert self._copy_both, "send() before START_REPLICATION"
        self._sock.sendall(encode_message(COPY_DATA, frame))

    def close(self) -> None:
        try:
            self._sock.sendall(encode_message(TERMINATE, b""))
        except OSError:
            pass
        self._sock.close()
