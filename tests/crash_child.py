"""Child process for the streaming crash-recovery e2e
(test_stream_crash_recovery.py): receives OTLP posts over real HTTP,
acks AFTER the durable spool rename, starts the file-ingest stream
with a sink that STAGES batch 0's parquet but never commits it, writes
a marker file, and then hangs — the parent SIGKILLs the whole process
group at exactly that point (after spool-ack, before sink-commit).

Run: python crash_child.py <spool> <out> <ckpt> <marker>
"""

from __future__ import annotations

import os
import sys
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from nabatshy_spark.session import get_spark  # noqa: E402
from nabatshy_spark.sources.sink import with_partition_col  # noqa: E402
from nabatshy_spark.streaming.ingest import start_file_ingest  # noqa: E402
from nabatshy_spark.streaming.receiver import OTLPReceiver  # noqa: E402
from tests.test_otlp_ingest import _legacy_payload, _payload  # noqa: E402


def main() -> None:
    spool, out, ckpt, marker = sys.argv[1:5]
    spark = get_spark("crash_child", cpus=2)
    rcv = OTLPReceiver(spool, host="127.0.0.1", port=0).start()
    for payload in (_payload(), _legacy_payload()):
        req = urllib.request.Request(
            f"http://127.0.0.1:{rcv.port}/v1/traces",
            data=payload.encode(),
            headers={"Content-Type": "application/json"},
        )
        status = urllib.request.urlopen(req).status
        assert status == 200  # the receiver acked — payload is spooled

    def crash_sink(batch, epoch_id):
        # simulate executor death mid-commit: the staging directory is
        # (partially) written, the batch=<id> rename never happens, the
        # streaming commit log never records the batch.
        staging = os.path.join(out, f".staging-batch-{epoch_id}")
        with_partition_col(batch).write.mode("overwrite").parquet(staging)
        with open(marker, "w") as fh:
            fh.write(str(epoch_id))
        time.sleep(600)  # parent SIGKILLs the process group here

    start_file_ingest(
        spark,
        os.path.join(spool, "json"),
        out,
        ckpt,
        sink_fn=crash_sink,
    )
    time.sleep(600)  # never reached before the kill


if __name__ == "__main__":
    main()
