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

Auth scope: trust/no-password only (AuthenticationOk).  SASL/MD5 belong
to a production deployment's libpq binding, not this shim; the message
framing below is the complete public format either way.
"""

from __future__ import annotations

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
    ):
        self._sock = socket.create_connection((host, port), timeout=timeout)
        self._copy_both = False
        self._sock.sendall(encode_startup(user, database))
        # consume auth/parameter chatter until ReadyForQuery
        while True:
            msg = recv_message(self._sock)
            if msg is None:
                raise ConnectionError("server closed during startup")
            t, payload = msg
            if t == AUTHENTICATION:
                (code,) = struct.unpack_from(">i", payload, 0)
                if code != 0:
                    raise NotImplementedError(
                        f"auth method {code} not supported (trust only)"
                    )
            elif t == ERROR_RESPONSE:
                raise ConnectionError(f"startup error: {payload!r}")
            elif t == READY_FOR_QUERY:
                break

    # -- handshake surface (duck-typed transport) ----------------------------

    def _send_query(self, sql: str) -> None:
        self._sock.sendall(encode_message(QUERY, sql.encode() + b"\0"))

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
