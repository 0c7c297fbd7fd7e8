"""Postgres logical-replication protocol layer (wire-format parity).

The reference drives live replication through pglogrepl
(/root/reference/pkg/pgrepl/replicator.go:61-133,235-284 and
pkg/pgrepl/conn.go:47-56): resume from the slot's confirmed_flush_lsn or
create the slot, START_REPLICATION with wal2json v2 options, consume
CopyData frames (XLogData / PrimaryKeepalive), and acknowledge consumed
LSNs with StandbyStatusUpdate messages.

This module re-expresses every protocol artifact as PURE functions over
bytes — the walsender wire format is public Postgres documentation
(protocol §55.4, "Streaming Replication Protocol") — so the sandbox can
golden-test exact frame bytes without a live server.  The socket carrier
lives in sources/pgwire.py (Postgres v3 wire client, loopback-tested
against an in-process fake walsender).  The Spark side consumes the
resulting wal2json records through sources/cdc.py exactly as it consumes
file-based streams; this layer's output is that layer's input.

No proprietary wire formats: everything here is the documented Postgres
protocol + the wal2json plugin's published options.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field

# Microseconds between the Unix epoch (1970-01-01) and the Postgres
# timestamp epoch (2000-01-01) — walsender timestamps use the latter.
PG_EPOCH_OFFSET_US = 946_684_800_000_000

# CopyData payload tags (protocol §55.4)
XLOG_DATA_BYTE = ord("w")
PRIMARY_KEEPALIVE_BYTE = ord("k")
STANDBY_STATUS_UPDATE_BYTE = ord("r")


# -- LSN text form ----------------------------------------------------------


def parse_lsn(text: str) -> int:
    """'16/B374D848' -> 64-bit integer (hi32/lo32 hex halves)."""
    hi, lo = text.split("/")
    return (int(hi, 16) << 32) | int(lo, 16)


def format_lsn(lsn: int) -> str:
    return f"{lsn >> 32:X}/{lsn & 0xFFFFFFFF:X}"


# -- walsender SQL/command strings -----------------------------------------


def slot_name(publication: str) -> str:
    """The reference names its slot basin_<publication>
    (replicator.go:72)."""
    return f"basin_{publication}"


def confirmed_flush_lsn_sql(slot: str) -> str:
    """Resume point lookup — byte-identical to the reference's query
    (conn.go:47-56)."""
    return (
        "SELECT confirmed_flush_lsn FROM pg_replication_slots "
        f"WHERE slot_name = '{slot}'"
    )


def publication_tables_sql(publication: str) -> str:
    """Which tables the publication replicates (conn.go:18-44)."""
    return (
        "SELECT schemaname, tablename FROM pg_publication p "
        "JOIN pg_publication_tables pt ON p.pubname = pt.pubname "
        f"WHERE p.pubname = '{publication}'"
    )


def create_slot_command(slot: str, temporary: bool = False) -> str:
    """walsender CREATE_REPLICATION_SLOT (non-temporary, wal2json output
    plugin, NOEXPORT_SNAPSHOT — the reference's options,
    replicator.go:108-115)."""
    temp = "TEMPORARY " if temporary else ""
    return f"CREATE_REPLICATION_SLOT {slot} {temp}LOGICAL wal2json NOEXPORT_SNAPSHOT"


def wal2json_plugin_args(tables: list[str]) -> list[str]:
    """The exact wal2json v2 options the reference passes
    (replicator.go:144-153)."""
    return [
        "\"pretty-print\" 'false'",
        "\"include-transaction\" 'true'",
        "\"include-lsn\" 'true'",
        "\"include-timestamp\" 'true'",
        "\"include-pk\" 'true'",
        "\"format-version\" '2'",
        "\"include-xids\" 'true'",
        f"\"add-tables\" '{','.join(tables)}'",
    ]


def start_replication_command(slot: str, lsn: int, tables: list[str]) -> str:
    args = ", ".join(wal2json_plugin_args(tables))
    return f"START_REPLICATION SLOT {slot} LOGICAL {format_lsn(lsn)} ({args})"


# -- binary frames ----------------------------------------------------------


@dataclass(frozen=True)
class XLogData:
    wal_start: int
    server_wal_end: int
    server_time_us: int  # microseconds since Unix epoch
    payload: bytes


@dataclass(frozen=True)
class PrimaryKeepalive:
    server_wal_end: int
    server_time_us: int  # microseconds since Unix epoch
    reply_requested: bool


def parse_copydata(frame: bytes) -> XLogData | PrimaryKeepalive:
    """Dispatch a CopyData payload by its tag byte, like the reference's
    consumeRecord switch (replicator.go:256-283)."""
    tag = frame[0]
    if tag == XLOG_DATA_BYTE:
        wal_start, wal_end, t = struct.unpack_from(">QQq", frame, 1)
        return XLogData(
            wal_start=wal_start,
            server_wal_end=wal_end,
            server_time_us=t + PG_EPOCH_OFFSET_US,
            payload=frame[25:],
        )
    if tag == PRIMARY_KEEPALIVE_BYTE:
        wal_end, t, reply = struct.unpack_from(">Qqb", frame, 1)
        return PrimaryKeepalive(
            server_wal_end=wal_end,
            server_time_us=t + PG_EPOCH_OFFSET_US,
            reply_requested=bool(reply),
        )
    raise ValueError(f"unknown CopyData tag: {tag:#x}")


def encode_standby_status_update(
    write_lsn: int,
    flush_lsn: int = 0,
    apply_lsn: int = 0,
    client_time_us: int = 0,
    reply_requested: bool = False,
) -> bytes:
    """StandbyStatusUpdate frame — the ack the reference sends on Commit
    and on reply-requested keepalives (replicator.go:212-284).

    pglogrepl semantics are preserved: unset flush/apply positions default
    to the write position (one consumed-up-to LSN acknowledges all
    three).  client_time_us is microseconds since the UNIX epoch; 0 means
    'no clock' and is sent as-is (Postgres treats it as an opaque echo).
    """
    if flush_lsn == 0:
        flush_lsn = write_lsn
    if apply_lsn == 0:
        apply_lsn = write_lsn
    t = client_time_us - PG_EPOCH_OFFSET_US if client_time_us else 0
    return struct.pack(
        ">BQQQqb",
        STANDBY_STATUS_UPDATE_BYTE,
        write_lsn,
        flush_lsn,
        apply_lsn,
        t,
        1 if reply_requested else 0,
    )


# -- session state machine --------------------------------------------------


@dataclass
class ReplicationSession:
    """Driver-side protocol state machine, transport-free.

    feed(frame) consumes one CopyData payload and returns the wal2json
    record bytes to hand to sources/cdc.py (or None), queueing any
    protocol replies in .outbox; commit(lsn) queues the consumed-LSN ack
    exactly like the reference's Commit (replicator.go:212-226).  A
    socket pump around this is: send outbox, recv frame, feed, repeat.
    """

    commit_lsn: int = 0  # resume point (confirmed_flush_lsn or create)
    committed_lsn: int = 0  # last acked LSN, echoed in keepalive replies
    outbox: list[bytes] = field(default_factory=list)

    def feed(self, frame: bytes) -> bytes | None:
        msg = parse_copydata(frame)
        if isinstance(msg, PrimaryKeepalive):
            if msg.reply_requested:
                self.outbox.append(
                    encode_standby_status_update(self.committed_lsn)
                )
            return None
        return msg.payload

    def commit(self, lsn: int) -> None:
        self.committed_lsn = lsn
        self.outbox.append(encode_standby_status_update(lsn))

    def drain(self) -> list[bytes]:
        out, self.outbox = self.outbox, []
        return out


# -- session orchestration --------------------------------------------------


def start_replication_session(transport, publication: str, tables=None):
    """Order the connect->slot->stream handshake exactly like the
    reference's StartReplication (replicator.go:61-133): resume from the
    slot's confirmed_flush_lsn when the slot already exists, otherwise
    create it and start from 0/0; discover the publication's tables when
    the caller doesn't pin them (conn.go:18-44); then START_REPLICATION
    with the wal2json v2 options.

    `transport` is duck-typed — anything with
        exec_query(sql: str) -> list[tuple]
        exec_command(cmd: str) -> None
    works: a psycopg connection shim in production, a scripted fake in
    tests.  Returns (primed ReplicationSession, tables).
    """
    slot = slot_name(publication)
    rows = transport.exec_query(confirmed_flush_lsn_sql(slot))
    if rows and rows[0][0] is not None:
        lsn = parse_lsn(rows[0][0])
    else:
        transport.exec_command(create_slot_command(slot))
        lsn = 0
    if tables is None:
        tables = [
            f"{s}.{t}"
            for s, t in transport.exec_query(publication_tables_sql(publication))
        ]
    transport.exec_command(start_replication_command(slot, lsn, tables))
    return ReplicationSession(commit_lsn=lsn, committed_lsn=lsn), tables


def pump(session: ReplicationSession, transport):
    """Synchronous receive loop around a primed session: recv one CopyData
    frame, feed it, flush any queued acks (keepalive replies AND commit
    acks the consumer queued since the last frame), yield wal2json
    payload bytes.  Ends when the transport yields None (the reference's
    ctx-cancel, replicator.go:235-254).

    The consumer calls session.commit(lsn) between yields; the resulting
    StandbyStatusUpdate goes out before the next payload is read, so the
    walsender's view of the consumed-up-to LSN is never more than one
    frame behind — the reference's ack cadence.
    """
    while True:
        for out in session.drain():
            transport.send(out)
        frame = transport.recv()
        if frame is None:
            break
        payload = session.feed(frame)
        for out in session.drain():
            transport.send(out)
        if payload is not None:
            yield payload
