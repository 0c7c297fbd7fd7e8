"""Property tests for the CDC merge family (sources/cdc.apply_changes,
scd2_history, streaming/stateful.cdc_apply_stream): on ANY I/U/D record
stream, all three must agree with a naive Python fold of the log.

Mirrors the reference's WAL-replay intent (internal/app/db.go:254-289)
extended to the update/delete semantics the reference skips."""

from __future__ import annotations

import json

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from basin_cli_spark.sources.cdc import (
    apply_changes,
    parse_wal_records,
    scd2_history,
)

# a random CDC log: per tx, a few records over a small key space
_ops = st.lists(
    st.tuples(
        st.sampled_from(["I", "U", "D"]),
        st.integers(min_value=1, max_value=5),  # key
        st.text(alphabet="abcdef", min_size=1, max_size=4),  # payload
    ),
    min_size=1,
    max_size=12,
)


def _log_lines(ops):
    """Build wal2json tx lines: one record per op, one tx per 3 ops."""
    lines, recs = [], []
    lsn = 1000
    for i, (action, key, payload) in enumerate(ops):
        rec = {
            "action": action,
            "xid": 1,
            "lsn": "0/0",
            "nextlsn": "",
            "timestamp": "2023-08-22 14:44:02.043586-03",
            "schema": "public",
            "table": "t",
            "pk": [{"name": "id", "type": "integer"}],
        }
        if action == "D":
            rec["columns"] = None
            rec["identity"] = [
                {"name": "id", "type": "integer", "value": key}
            ]
        else:
            rec["columns"] = [
                {"name": "id", "type": "integer", "value": key},
                {"name": "name", "type": "text", "value": payload},
            ]
        recs.append(rec)
        if len(recs) == 3 or i == len(ops) - 1:
            lines.append(json.dumps({"commit_lsn": lsn, "records": recs}))
            recs = []
            lsn += 1
    return lines


def _python_fold(ops):
    state = {}
    for action, key, payload in ops:
        if action == "D":
            state.pop(key, None)
        else:
            state[key] = payload
    return state


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(ops=_ops)
def test_apply_and_scd2_match_python_fold(spark, ops):
    lines = _log_lines(ops)
    df = spark.createDataFrame([(ln,) for ln in lines], "value string")
    recs = parse_wal_records(df)
    cols = [("id", "integer"), ("name", "text")]

    applied = {
        r.id: r.name for r in apply_changes(recs, "t", cols, pk="id").collect()
    }
    expected = _python_fold(ops)
    assert applied == expected

    hist = scd2_history(recs, "t", cols, pk="id").collect()
    current = {r.id: r.name for r in hist if r.is_current}
    assert current == expected
    # every non-current version is closed by a later LSN
    for r in hist:
        if not r.is_current:
            assert r.valid_to_lsn >= r.valid_from_lsn


def test_stream_apply_matches_batch(spark, tmp_path):
    """The streaming stateful merge must produce the same final state as
    the batch apply over the same log (single concrete case here; the
    registered q_stream_cdc_apply shares the batch oracle at every
    contract run)."""
    from basin_cli_spark.streaming.stateful import cdc_apply_stream

    ops = [
        ("I", 1, "a"), ("I", 2, "b"), ("U", 2, "bb"),
        ("D", 1, ""), ("I", 3, "c"), ("U", 3, "cc"), ("D", 2, ""),
    ]
    lines = _log_lines(ops)
    (tmp_path / "wal.jsonl").write_text("\n".join(lines) + "\n")

    stream = spark.readStream.format("text").load(str(tmp_path))
    merged = cdc_apply_stream(parse_wal_records(stream), "t", pk="id")
    import uuid

    name = f"mem_{uuid.uuid4().hex[:8]}"
    q = (
        merged.writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = spark.table(name).collect()
    alive = {
        int(r.key): json.loads(r.columns_json)[1][1]
        for r in out
        if r.action != "D"
    }
    assert alive == _python_fold(ops)
