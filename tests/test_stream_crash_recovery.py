"""Streaming crash-recovery e2e (VERDICT r8 task #5): a REAL process
kill mid-batch — after the receiver has acked the spooled payloads,
after the sink has staged parquet for batch 0, but BEFORE the batch
commit — followed by a restart from the same checkpoint, must deliver
every posted span exactly once through receiver → spool → sink.

Why this closes the gap the unit tests leave: the checkpointed-restart
unit stops the stream BETWEEN batches (a clean shutdown), and the
idempotent_append unit replays a batch id in-process. Neither proves
the full path survives a SIGKILL that leaves (a) an acked,
partially-processed spool file, (b) an orphaned staging directory, and
(c) an offset log ahead of the commit log — the exact state a crashed
executor/driver leaves behind. Structured Streaming's contract
(replay the uncommitted batch with the SAME id) plus the id-keyed
idempotent sink is what turns that wreckage into exactly-once; this
test proves the contract end-to-end.
"""

from __future__ import annotations

import os
import signal
import subprocess
import sys
import time

from nabatshy_spark.sources.sink import idempotent_append
from nabatshy_spark.streaming.ingest import ingest_batch, start_file_ingest
from tests.test_otlp_ingest import _legacy_payload, _payload

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_sigkill_mid_batch_exactly_once(spark, tmp_path):
    spool = str(tmp_path / "spool")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    marker = str(tmp_path / "mid_batch_marker")

    # --- phase 1: child posts over HTTP, stages batch 0, hangs --------
    child = subprocess.Popen(
        [sys.executable, os.path.join(REPO, "tests", "crash_child.py"),
         spool, out, ckpt, marker],
        start_new_session=True,  # own process group: the kill nukes its JVM too
        stdout=subprocess.DEVNULL,
        stderr=subprocess.DEVNULL,
        env={**os.environ, "SPARK_GRAFT_DRIVER_MEM": "2g"},
    )
    try:
        deadline = time.time() + 180
        while not os.path.exists(marker):
            assert child.poll() is None, "crash child died before mid-batch"
            assert time.time() < deadline, "child never reached mid-batch"
            time.sleep(0.5)
        # the crash state: acked spool files exist, staging exists,
        # batch 0 is NOT committed
        assert os.listdir(os.path.join(spool, "json"))
        assert os.path.isdir(os.path.join(out, ".staging-batch-0"))
        assert not os.path.isdir(os.path.join(out, "batch=0"))
    finally:
        os.killpg(child.pid, signal.SIGKILL)
        child.wait(timeout=30)

    # --- phase 2: restart from the same checkpoint with the real
    # exactly-once sink; Structured Streaming replays batch 0 (same id,
    # same files), idempotent_append commits it once -------------------
    q = start_file_ingest(
        spark,
        os.path.join(spool, "json"),
        out,
        ckpt,
        sink_fn=lambda b, i: idempotent_append(b, out, i),
    )
    q.awaitTermination(120)  # availableNow: drain pending + stop
    assert not q.isActive

    # --- assertions: no loss, no duplicates ---------------------------
    assert os.path.exists(os.path.join(out, "batch=0", "_SUCCESS"))
    expected = ingest_batch(spark, [_payload(), _legacy_payload()])
    got = spark.read.parquet(out).select(expected.columns)
    got_rows = sorted(tuple(str(x) for x in r) for r in got.collect())
    exp_rows = sorted(tuple(str(x) for x in r) for r in expected.collect())
    assert got_rows == exp_rows  # set-exact: loss AND duplication both fail
    ids = got.select("trace_id", "span_id").collect()
    assert len(ids) == len(set((r.trace_id, r.span_id) for r in ids))

    # replaying the committed batch once more stays a no-op
    assert idempotent_append(expected, out, 0) is False
