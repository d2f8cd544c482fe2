"""Streaming publish gate: evaluate the declarative expectations
(operators/expectations.py) against EVERY micro-batch inside
``foreachBatch``, and route the batch whole — pass → the published
table, fail → a quarantine directory with the failing report alongside
— so a poisoned upstream drop never lands in the serving table.

Why batch-granular (not row-granular): row-level constraints
(not-null, range, domain) could filter rows, but the gate also holds
DISTRIBUTIONAL constraints (null fraction, uniqueness, volume) that
only mean anything per batch — and a batch that fails those is
evidence of an upstream incident, where the operationally correct move
is quarantine-and-alert, not silently shipping the rows that happen to
pass. Row-level cleanup belongs to the ingest edge
(sources/textfiles.py quarantines malformed LINES); this gate protects
the publish step.

Scale shape: the expectations report is one scan of the micro-batch
(see operators/expectations.py), and the batch is cached for the
check + write pair, so the gate adds one aggregate job per batch —
not a second parse of the input.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame

from nabatshy_spark.operators.expectations import Rule, check


def gated_sink(
    rules: list[Rule],
    publish_path: str,
    quarantine_path: str,
):
    """Build a ``foreachBatch`` function enforcing ``rules``. Batches
    where every rule passes append to ``publish_path``; failing batches
    append under ``quarantine_path``/data with a
    reports/report-<epoch>.json sidecar naming the violated rules
    (reports live OUTSIDE the parquet directory so the quarantined
    rows stay readable as a plain parquet table)."""

    def sink(batch: DataFrame, epoch_id: int) -> None:
        batch.persist()
        try:
            report = check(batch, rules).collect()
            failed = [r for r in report if not r.passed]
            if failed:
                batch.write.mode("append").parquet(
                    os.path.join(quarantine_path, "data")
                )
                reports_dir = os.path.join(quarantine_path, "reports")
                os.makedirs(reports_dir, exist_ok=True)
                with open(
                    os.path.join(reports_dir, f"report-{epoch_id}.json"), "w"
                ) as fh:
                    json.dump(
                        [
                            {"rule": r.rule, "metric": r.metric, "passed": r.passed}
                            for r in report
                        ],
                        fh,
                    )
            else:
                batch.write.mode("append").parquet(publish_path)
        finally:
            batch.unpersist()

    return sink


def start_gated_ingest(
    stream: DataFrame,
    rules: list[Rule],
    publish_path: str,
    quarantine_path: str,
    checkpoint: str,
):
    """Attach the gate to a streaming frame and start it."""
    return (
        stream.writeStream.foreachBatch(
            gated_sink(rules, publish_path, quarantine_path)
        )
        .option("checkpointLocation", checkpoint)
        .start()
    )
