"""Structured Streaming surface (voz_spark/streaming.py).

The registry-wide oracle-parity test already pins q46-q48 against
DuckDB on the bounded input; this file tests what only a STREAM can
show: incremental micro-batch execution, watermark late-data eviction,
state carried across batches, and the session-window gap boundary.
"""

from __future__ import annotations

import datetime as dt
import os

from pyspark.sql import functions as F

from voz_spark.streaming import (
    EVENTS_SCHEMA,
    events_stream,
    hourly_event_counts_stream,
    running_totals_stream,
    run_to_memory,
    session_windows_stream,
)

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _ev(event_id, minutes, user_id=1, event_type="view", value=1.0):
    return (event_id, T0 + dt.timedelta(minutes=minutes), user_id, event_type, value, "{}")


def _write_events(spark, rows, path):
    spark.createDataFrame(rows, EVENTS_SCHEMA).coalesce(1).write.mode("overwrite").parquet(path)


def _stream_dir(spark, tmp_path, batches):
    """Write each batch as one parquet file under dir/events.parquet.

    The file source orders micro-batches by modification time; set
    strictly increasing mtimes explicitly so batch order is
    deterministic even when writes land in the same clock tick.
    """
    d = os.path.join(str(tmp_path), "events.parquet")
    seen: set[str] = set()
    for i, rows in enumerate(batches):
        spark.createDataFrame(rows, EVENTS_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(d)
        for f in os.listdir(d):
            p = os.path.join(d, f)
            if f.endswith(".parquet") and p not in seen:
                seen.add(p)
                os.utime(p, (1_700_000_000 + i, 1_700_000_000 + i))
    return str(tmp_path)


def test_multibatch_incremental_equals_batch(spark, tmp_path):
    """3 micro-batches of hourly counts == one batch aggregation."""
    batches = [
        [_ev(1, 0), _ev(2, 10), _ev(3, 70, event_type="click")],
        [_ev(4, 20), _ev(5, 80, event_type="click")],
        [_ev(6, 130, value=2.5)],
    ]
    sf = _stream_dir(spark, tmp_path, batches)
    stream = hourly_event_counts_stream(
        events_stream(spark, sf, max_files_per_trigger=1)
    )
    sink = run_to_memory(stream, "t_multibatch", "complete", spark)
    got = {
        (r["win"]["start"].hour, r["event_type"]): (r["n"], r["total_value"])
        for r in sink.collect()
    }
    assert got == {
        (0, "view"): (3, 3.0),
        (1, "click"): (2, 2.0),
        (2, "view"): (1, 2.5),
    }


def test_watermark_drops_late_rows(spark, tmp_path):
    """Append mode + 1h watermark: a row arriving after its window is
    more than one hour behind the observed max event time is dropped."""
    d = os.path.join(str(tmp_path), "events.parquet")
    ckpt = os.path.join(str(tmp_path), "ckpt")
    # batch 1: hour-0 window has 2 rows; max ts = 03:30 -> watermark 02:30
    _write_events(
        spark,
        [_ev(1, 0), _ev(2, 30), _ev(3, 210)],
        d,
    )
    stream = hourly_event_counts_stream(events_stream(spark, str(tmp_path)))
    q = (
        stream.writeStream.format("memory")
        .queryName("t_late")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
        # batch 2: one LATE row for hour 0 (behind the 02:30 watermark ->
        # dropped) and one on-time row at 05:01 advancing the watermark
        # strictly past every earlier window end so they all finalize.
        spark.createDataFrame(
            [_ev(4, 5), _ev(5, 301)], EVENTS_SCHEMA
        ).coalesce(1).write.mode("append").parquet(d)
        q.processAllAvailable()
    finally:
        q.stop()
    rows = {r["win"]["start"].hour: r["n"] for r in spark.table("t_late").collect()}
    # hour-0 window emitted with the 2 on-time rows only; the late row
    # (event_id 4) was evicted by the watermark, not counted
    assert rows[0] == 2
    assert rows[3] == 1


def test_stateful_running_totals_carry_state(spark, tmp_path):
    """applyInPandasWithState carries per-user state across micro-batches."""
    batches = [
        [_ev(1, 0, user_id=7, value=1.5), _ev(2, 1, user_id=8, value=2.0)],
        [_ev(3, 2, user_id=7, value=0.5)],
    ]
    sf = _stream_dir(spark, tmp_path, batches)
    stream = running_totals_stream(events_stream(spark, sf, max_files_per_trigger=1))
    sink = run_to_memory(stream, "t_state", "update", spark)
    rows = sink.collect()
    upd7 = sorted(
        [(r["cum_events"], r["cum_value"]) for r in rows if r["user_id"] == 7]
    )
    # user 7 appears in both batches: first update (1, 1.5), second
    # update folds the carried state -> (2, 2.0)
    assert upd7 == [(1, 1.5), (2, 2.0)]
    upd8 = [(r["cum_events"], r["cum_value"]) for r in rows if r["user_id"] == 8]
    assert upd8 == [(1, 2.0)]


def test_stream_dedup_state_spans_batches(spark, tmp_path):
    """dropDuplicates state carries across micro-batches: a key seen
    in batch 1 is NOT re-emitted when batch 2 repeats it (append mode
    emits first occurrences only)."""
    batches = [
        [_ev(1, 0, user_id=1, event_type="view"), _ev(2, 1, user_id=2, event_type="click")],
        [_ev(3, 2, user_id=1, event_type="view"), _ev(4, 3, user_id=1, event_type="click")],
    ]
    sf = _stream_dir(spark, tmp_path, batches)
    from voz_spark.streaming import events_stream

    stream = (
        events_stream(spark, sf, max_files_per_trigger=1)
        .dropDuplicates(["user_id", "event_type"])
        .select("user_id", "event_type")
    )
    sink = run_to_memory(stream, "t_dedup", "append", spark)
    rows = sorted((r.user_id, r.event_type) for r in sink.collect())
    assert rows == [(1, "click"), (1, "view"), (2, "click")]


def test_session_window_gap_boundary(spark, tmp_path):
    """A gap of exactly 30 minutes EXTENDS the session (the window
    [ts, ts+30min) merges with an event landing on its end); only a
    strictly larger gap starts a new one — same rule as q13's batch
    ``>`` form."""
    rows = [
        # user 1: 00:00, 00:29 -> one session; 01:00 is 31 min after
        # 00:29 -> second session
        _ev(1, 0, user_id=1),
        _ev(2, 29, user_id=1),
        _ev(3, 60, user_id=1),
        # user 2: 00:00 then exactly 00:30 -> boundary merges -> ONE
        _ev(4, 0, user_id=2),
        _ev(5, 30, user_id=2),
        # user 3: chained overlaps 00:00, 00:29, 00:58 -> ONE session
        _ev(6, 0, user_id=3),
        _ev(7, 29, user_id=3),
        _ev(8, 58, user_id=3),
    ]
    sf = _stream_dir(spark, tmp_path, [rows])
    stream = session_windows_stream(events_stream(spark, sf))
    sink = run_to_memory(stream, "t_sess", "complete", spark)
    per_user = {
        r["user_id"]: r["n_sessions"]
        for r in sink.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_sessions"))
        .collect()
    }
    assert per_user == {1: 2, 2: 1, 3: 1}


def test_stream_stream_join_state_spans_batches(spark, tmp_path):
    """Stream-stream interval join: a click buffered in batch 1 joins a
    purchase that only arrives in batch 2 (cross-batch join state), and
    the interval bound + user key are enforced."""
    from voz_spark.streaming import click_purchase_join_stream

    src = _stream_dir(
        spark,
        tmp_path,
        [
            # batch 1: two clicks, no purchases yet
            [
                _ev(1, 0, user_id=1, event_type="click"),
                _ev(2, 0, user_id=2, event_type="click"),
            ],
            # batch 2: u1 purchase inside the 30-min horizon (joins the
            # buffered click), u2 purchase outside it (must not join),
            # u3 purchase with no click at all
            [
                _ev(3, 10, user_id=1, event_type="purchase", value=99.0),
                _ev(4, 40, user_id=2, event_type="purchase", value=5.0),
                _ev(5, 10, user_id=3, event_type="purchase", value=7.0),
            ],
        ],
    )
    stream = click_purchase_join_stream(events_stream(spark, src, max_files_per_trigger=1))
    sink = run_to_memory(stream, "t_ssjoin", "append", spark)
    rows = sink.select("click_id", "purchase_id", "amount").collect()
    assert len(rows) == 1
    assert (rows[0].click_id, rows[0].purchase_id, rows[0].amount) == (1, 3, 99.0)


def test_q148_stream_equals_batch_incremental(spark, sf_dir):
    """The stream-static band join must emit exactly the pairs the
    q134 batch job finds — streaming-vs-batch equivalence on the same
    standing index and delta split."""
    from voz_spark.imagedup import q134_incremental_image_neardup
    from voz_spark.streaming import q148_stream_image_banddedup

    s = q148_stream_image_banddedup(spark, sf_dir).collect()
    b = q134_incremental_image_neardup(spark, sf_dir).collect()
    assert sorted(map(tuple, s)) == sorted(map(tuple, b))
    assert len(s) > 0


def test_q178_stream_dispatch_equals_batch_closed_form(spark, sf_dir):
    """The stateful online dispatcher must reproduce q156's batch
    closed form row-for-row over the real events stream (8 time-ordered
    micro-batches)."""
    import os

    from voz_spark.crawlops import q156_dispatch_plan
    from voz_spark.streaming import _Q178_FILES, _q178_source_dir, q178_stream_dispatch

    src = _q178_source_dir(sf_dir)
    files = [f for f in os.listdir(src) if f.endswith(".parquet")]
    assert len(files) == _Q178_FILES
    got = {
        (r["host"], r["event_id"]): (r["arr_us"], r["dispatch_us"], r["wait_us"])
        for r in q178_stream_dispatch(spark, sf_dir).collect()
    }
    want = {
        (r["host"], r["event_id"]): (r["arr_us"], r["dispatch_us"], r["wait_us"])
        for r in q156_dispatch_plan(spark, sf_dir).collect()
    }
    assert got == want


def test_q178_dense_burst_waits_and_cross_batch_state(spark, tmp_path):
    """Under a planted burst (arrivals far denser than the politeness
    gap) the dispatcher must QUEUE: dispatch times step by exactly the
    gap, waits grow monotonically within the burst, and the chain must
    span micro-batch boundaries (state carry), matching a sequential
    Python fold exactly."""
    import os

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from voz_spark.streaming import EVENTS_SCHEMA, dispatch_stream, run_to_memory

    # 60 requests, 2 hosts (user_id 0/1), arrivals every 100 ms —
    # far denser than the 1 s (host 0) / 2 s (host 1) gaps.
    base = 1_700_000_000_000_000
    rows = pd.DataFrame(
        {
            "event_id": range(60),
            "ts": pd.to_datetime(
                [(base + i * 100_000) for i in range(60)], unit="us"
            ).astype("datetime64[us]"),
            "user_id": [i % 2 for i in range(60)],
            "event_type": "fetch",
            "value": 0.0,
            "props": "",
        }
    )
    src = str(tmp_path / "burst")
    os.makedirs(src)
    for k in range(3):  # 3 time-ordered files -> 3 micro-batches
        piece = rows.iloc[k * 20 : (k + 1) * 20]
        p = os.path.join(src, f"{k:03d}.parquet")
        pq.write_table(pa.Table.from_pandas(piece, preserve_index=False), p)
        os.utime(p, (1_700_000_000 + k, 1_700_000_000 + k))
    ev = (
        spark.readStream.schema(EVENTS_SCHEMA).option("maxFilesPerTrigger", 1).parquet(src)
    )
    got = {
        r["event_id"]: r
        for r in run_to_memory(dispatch_stream(ev), "q178_burst", "append", spark).collect()
    }
    assert len(got) == 60
    # sequential fold per host (the ground truth recurrence)
    last: dict[int, int] = {}
    for i in range(60):
        host = i % 2
        gap = (host % 5 + 1) * 1_000_000
        arr = base + i * 100_000
        d = arr if host not in last else max(arr, last[host] + gap)
        last[host] = d
        r = got[i]
        assert (r["host"], r["arr_us"], r["dispatch_us"], r["wait_us"]) == (
            host, arr, d, d - arr,
        )
    # binding: the tail of each burst waits, and waits grow
    waits0 = [got[i]["wait_us"] for i in range(0, 60, 2)]
    waits1 = [got[i]["wait_us"] for i in range(1, 60, 2)]
    assert waits0 == sorted(waits0) and waits0[-1] > 0
    assert waits1 == sorted(waits1) and waits1[-1] > waits0[-1]
    # cross-batch carry: rows in the 2nd and 3rd files (event_id >= 20)
    # are still queue-constrained by batch-0 arrivals
    assert got[20]["wait_us"] > 0 and got[59]["wait_us"] > 0


def test_q188_stream_admit_equals_batch_funnel(spark, sf_dir):
    """The streaming admit path must reproduce q187's batch funnel
    row-for-row — the whole incremental curation pipeline is
    streaming-batch equivalent."""
    from voz_spark.imagedup import q187_incremental_funnel
    from voz_spark.streaming import q188_stream_admit

    got = [r.asDict() for r in q188_stream_admit(spark, sf_dir).collect()]
    want = [r.asDict() for r in q187_incremental_funnel(spark, sf_dir).collect()]
    assert got == want
    assert sum(r["n_fail"] for r in got) + got[-1]["n_out"] == got[0]["n_in"] == 80
