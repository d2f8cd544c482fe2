"""Streaming z-score anomaly detection (applyInPandasWithState) —
flags must match an offline Welford replay of the same chunk order."""

from __future__ import annotations

import datetime as dt
import math
import shutil

from nabatshy_spark.streaming.anomaly import anomaly_stream

T0 = dt.datetime(2024, 1, 1)


def _welford_replay(chunks, z=3.0, min_obs=5):
    stats = {}
    flags = []
    for chunk in chunks:
        for uid, ts, v in sorted(chunk, key=lambda r: (r[0], r[1])):
            n, mean, m2 = stats.get(uid, (0, 0.0, 0.0))
            if n >= min_obs:
                sd = math.sqrt(m2 / n)
                if sd > 0 and abs(v - mean) > z * sd:
                    flags.append((uid, ts, v, round((v - mean) / sd, 6)))
            n += 1
            d = v - mean
            mean += d / n
            m2 += d * (v - mean)
            stats[uid] = (n, mean, m2)
    return flags


def test_streaming_anomaly_matches_welford_replay(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    schema = "user_id long, ts timestamp, value double"

    base = [
        (1, T0 + dt.timedelta(minutes=i), 10.0 + (i % 3))  # sd ≈ 0.8
        for i in range(8)
    ]
    spike = [(1, T0 + dt.timedelta(minutes=20), 100.0)]  # >> 3σ
    calm2 = [(2, T0 + dt.timedelta(minutes=i), 5.0 + (i % 2)) for i in range(6)]
    chunks = [base + calm2, spike + [(2, T0 + dt.timedelta(minutes=30), 5.5)]]

    stream = spark.readStream.schema(schema).parquet(str(src))
    q = (
        anomaly_stream(stream, z=3.0, min_obs=5)
        .writeStream.format("memory")
        .queryName("anomalies")
        .outputMode("append")
        .start()
    )
    try:
        for i, chunk in enumerate(chunks):
            staged = tmp_path / f"stage{i}"
            spark.createDataFrame(chunk, schema).coalesce(1).write.parquet(
                str(staged), mode="overwrite"
            )
            shutil.copy(
                next(staged.glob("part-*.parquet")), src / f"chunk{i}.parquet"
            )
            q.processAllAvailable()
        got = {
            (r.user_id, r.ts, r.value, r.zscore)
            for r in spark.table("anomalies").collect()
        }
    finally:
        q.stop()

    want = set(_welford_replay(chunks))
    assert got == want
    # exactly the planted spike is flagged
    assert {(u, v) for u, _, v, _ in got} == {(1, 100.0)}


def test_idle_key_state_evicts_and_rebuilds(spark, tmp_path):
    """A key idle past the TTL loses its statistics: after eviction the
    same extreme value no longer flags (the detector is warming up
    again), proving state was dropped, not kept forever."""
    import shutil

    src = tmp_path / "src2"
    src.mkdir()
    schema = "user_id long, ts timestamp, value double"

    warm = [(1, T0 + dt.timedelta(minutes=i), 10.0 + (i % 3)) for i in range(8)]
    # Another key's events advance the watermark past warm-end + TTL
    # (a key with data in a batch never times out in that same batch,
    # so eviction must fire in a batch where key 1 is silent)...
    tick1 = [(2, T0 + dt.timedelta(days=39), 1.0)]
    tick2 = [(2, T0 + dt.timedelta(days=39, hours=2), 1.0)]
    # ...then key 1 returns with extreme values, against FRESH state.
    later = [(1, T0 + dt.timedelta(days=40, minutes=i), 500.0) for i in range(2)]
    chunks = [warm, tick1, tick2, later]

    stream = spark.readStream.schema(schema).parquet(str(src))
    q = (
        anomaly_stream(stream, z=3.0, min_obs=5, idle_ttl_days=30)
        .writeStream.format("memory")
        .queryName("anomalies_ttl")
        .outputMode("append")
        .start()
    )
    try:
        for i, chunk in enumerate(chunks):
            staged = tmp_path / f"s2stage{i}"
            spark.createDataFrame(chunk, schema).coalesce(1).write.parquet(
                str(staged), mode="overwrite"
            )
            shutil.copy(
                next(staged.glob("part-*.parquet")), src / f"chunk{i}.parquet"
            )
            q.processAllAvailable()
        got = spark.table("anomalies_ttl").collect()
    finally:
        q.stop()

    # With retained state, 500.0 vs mean≈11 (sd<1) would flag massively.
    # Eviction means the post-TTL values are warm-up samples: no flags.
    assert got == []
