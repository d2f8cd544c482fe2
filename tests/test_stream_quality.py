"""Streaming publish gate: good micro-batches land in the published
table, a batch violating a distributional constraint is quarantined
whole with its failure report."""

from __future__ import annotations

import json
import os
import shutil

from nabatshy_spark.operators import expectations as E
from nabatshy_spark.streaming.quality import start_gated_ingest


def test_gate_routes_batches(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    schema = "id long, price double"
    rules = [
        E.not_null("id"),
        E.in_range("price", 0.0, 100.0),
        E.min_rows(2),
    ]
    pub = str(tmp_path / "published")
    quar = str(tmp_path / "quarantine")

    good = [(1, 10.0), (2, 20.0), (3, 30.0)]
    bad = [(4, 40.0), (5, -7.0)]  # negative price violates the range rule

    stream = spark.readStream.schema(schema).parquet(str(src))
    q = start_gated_ingest(
        stream, rules, pub, quar, checkpoint=str(tmp_path / "ckpt")
    )
    try:
        for i, chunk in enumerate([good, bad]):
            staged = tmp_path / f"stage{i}"
            spark.createDataFrame(chunk, schema).coalesce(1).write.parquet(
                str(staged), mode="overwrite"
            )
            shutil.copy(
                next(staged.glob("part-*.parquet")), src / f"chunk{i}.parquet"
            )
            q.processAllAvailable()
    finally:
        q.stop()

    published = {(r.id, r.price) for r in spark.read.parquet(pub).collect()}
    quarantined = {
        (r.id, r.price)
        for r in spark.read.parquet(os.path.join(quar, "data")).collect()
    }
    assert published == set(good)
    assert quarantined == set(bad)
    reports = os.listdir(os.path.join(quar, "reports"))
    assert len(reports) == 1
    rep = json.load(open(os.path.join(quar, "reports", reports[0])))
    failed = {r["rule"] for r in rep if not r["passed"]}
    assert failed == {"in_range(price,0.0,100.0)"}
