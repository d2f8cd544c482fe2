"""Streaming count-min: micro-batch merges equal the batch sketch of
the full stream, and estimates stay ≥ truth under replay."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from nabatshy_spark.operators.sketches import cms_counters, cms_estimates
from nabatshy_spark.streaming.heavyhitters import estimate, start_cms_stream


def _write_batch(path, rows):
    path.write_text("\n".join(json.dumps({"user_id": str(u)}) for u in rows) + "\n")


def test_stream_sketch_equals_batch_sketch(spark, tmp_path):
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    batch1 = [1, 2, 2, 3, 3, 3]
    batch2 = [3, 4, 4, 1]
    _write_batch(in_dir / "b1.jsonl", batch1)
    _write_batch(in_dir / "b2.jsonl", batch2)
    state = str(tmp_path / "cms_state")
    q = start_cms_stream(
        spark, str(in_dir), state, str(tmp_path / "ck"), depth=4, width=64
    )
    q.awaitTermination(120)

    # streamed state == batch sketch of the concatenated stream
    whole = spark.createDataFrame(
        [(str(u),) for u in batch1 + batch2], "user_id string"
    )
    expect = {
        (r["row"], r["col"]): r["c"]
        for r in cms_counters(whole, "user_id", 4, 64).collect()
    }
    got = {
        (r["row"], r["col"]): r["c"]
        for r in spark.read.parquet(state).collect()
    }
    assert got == expect

    # estimates: >= truth for present keys, 0 never underestimates
    est = {
        r["key"]: r["est"]
        for r in estimate(spark, state, ["1", "2", "3", "4", "999"]).collect()
    }
    truth = {"1": 2, "2": 2, "3": 4, "4": 2, "999": 0}
    assert all(est[k] >= v for k, v in truth.items())

    # at-least-once replay: re-running the same files with a FRESH
    # checkpoint re-adds the counts — estimates inflate, never deflate
    q2 = start_cms_stream(
        spark, str(in_dir), state, str(tmp_path / "ck2"), depth=4, width=64
    )
    q2.awaitTermination(120)
    est2 = {
        r["key"]: r["est"]
        for r in estimate(spark, state, ["3"]).collect()
    }
    assert est2["3"] >= 2 * truth["3"]
