"""Golden wire-format tests for the logical-replication protocol layer
(round-2 verdict item #4): exact frame bytes, spelled as literal hex so a
struct-packing bug can't hide behind symmetric encode/decode.

Layouts under test are the public Postgres walsender protocol (docs
§55.4); behaviors under test mirror the reference's replicator
(/root/reference/pkg/pgrepl/replicator.go:61-133,212-284).
"""

from __future__ import annotations

from basin_cli_spark.sources import replication as R

# LSN 16/B374D848 -> 0x16B374D848; timestamps: 2026-01-01T00:00:00Z is
# 1767225600000000 us (Unix) = 820540800000000 us (PG epoch) = 0x2EA470AE86000.
LSN_TEXT = "16/B374D848"
LSN_INT = 0x16B374D848
T_UNIX_US = 1_767_225_600_000_000
T_PG_HEX = "0002ea470ae86000"


def test_lsn_text_roundtrip():
    assert R.parse_lsn(LSN_TEXT) == LSN_INT
    assert R.format_lsn(LSN_INT) == LSN_TEXT
    assert R.parse_lsn("0/0") == 0
    assert R.format_lsn(0) == "0/0"
    assert R.parse_lsn("FFFFFFFF/FFFFFFFF") == 2**64 - 1


def test_keepalive_parse_golden():
    frame = bytes.fromhex("6b" + "00000016b374d848" + T_PG_HEX + "01")
    msg = R.parse_copydata(frame)
    assert isinstance(msg, R.PrimaryKeepalive)
    assert msg.server_wal_end == LSN_INT
    assert msg.server_time_us == T_UNIX_US
    assert msg.reply_requested is True
    frame_no_reply = bytes.fromhex("6b" + "00000016b374d848" + T_PG_HEX + "00")
    assert R.parse_copydata(frame_no_reply).reply_requested is False


def test_xlogdata_parse_golden():
    payload = b'{"action":"B","xid":7}'
    frame = (
        bytes.fromhex(
            "77"  # 'w'
            + "00000016b374d848"  # wal_start
            + "00000016b374d850"  # server_wal_end
            + T_PG_HEX
        )
        + payload
    )
    msg = R.parse_copydata(frame)
    assert isinstance(msg, R.XLogData)
    assert msg.wal_start == LSN_INT
    assert msg.server_wal_end == LSN_INT + 8
    assert msg.server_time_us == T_UNIX_US
    assert msg.payload == payload


def test_standby_status_update_encode_golden():
    """flush/apply default to the write position (pglogrepl semantics the
    reference relies on: Commit acks one LSN for all three)."""
    got = R.encode_standby_status_update(LSN_INT)
    want = bytes.fromhex(
        "72"  # 'r'
        + "00000016b374d848" * 3  # write = flush = apply
        + "0000000000000000"  # no clock
        + "00"  # no reply requested
    )
    assert got == want
    # explicit clock converts Unix us -> PG epoch us
    with_clock = R.encode_standby_status_update(
        LSN_INT, client_time_us=T_UNIX_US, reply_requested=True
    )
    assert with_clock == bytes.fromhex(
        "72" + "00000016b374d848" * 3 + T_PG_HEX + "01"
    )


def test_slot_lifecycle_strings():
    slot = R.slot_name("pub_a")
    assert slot == "basin_pub_a"
    assert R.create_slot_command(slot) == (
        "CREATE_REPLICATION_SLOT basin_pub_a LOGICAL wal2json NOEXPORT_SNAPSHOT"
    )
    assert "confirmed_flush_lsn" in R.confirmed_flush_lsn_sql(slot)
    assert "slot_name = 'basin_pub_a'" in R.confirmed_flush_lsn_sql(slot)
    assert "pg_publication_tables" in R.publication_tables_sql("pub_a")


def test_start_replication_wal2json_options():
    """The full option list the reference passes to wal2json v2
    (replicator.go:144-153), table filter included."""
    cmd = R.start_replication_command(
        "basin_pub_a", LSN_INT, ["public.t1", "public.t2"]
    )
    assert cmd.startswith(
        "START_REPLICATION SLOT basin_pub_a LOGICAL 16/B374D848 ("
    )
    for opt in (
        "\"format-version\" '2'",
        "\"include-transaction\" 'true'",
        "\"include-lsn\" 'true'",
        "\"include-pk\" 'true'",
        "\"include-xids\" 'true'",
        "\"add-tables\" 'public.t1,public.t2'",
    ):
        assert opt in cmd


def test_session_keepalive_autoreply_and_commit():
    s = R.ReplicationSession(commit_lsn=LSN_INT, committed_lsn=LSN_INT)
    # keepalive without reply request: no outbox traffic
    quiet = bytes.fromhex("6b" + "00000016b374d848" + T_PG_HEX + "00")
    assert s.feed(quiet) is None and s.drain() == []
    # reply requested: acks the last committed LSN (replicator.go:263-270)
    ping = bytes.fromhex("6b" + "00000016b374d848" + T_PG_HEX + "01")
    assert s.feed(ping) is None
    (ack,) = s.drain()
    assert ack == R.encode_standby_status_update(LSN_INT)
    # XLogData yields the wal2json payload for sources/cdc.py
    payload = b'{"action":"I"}'
    frame = (
        bytes.fromhex("77" + "00000016b374d848" + "00000016b374d850" + T_PG_HEX)
        + payload
    )
    assert s.feed(frame) == payload
    # commit advances the ack watermark like the reference's Commit
    s.commit(LSN_INT + 8)
    (ack2,) = s.drain()
    assert ack2 == R.encode_standby_status_update(LSN_INT + 8)
    assert s.committed_lsn == LSN_INT + 8
