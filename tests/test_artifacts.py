"""Unit tests for the shared artifact lifecycle (nabatshy_spark.artifacts):
key resolution, _SUCCESS gating, build-once semantics, BUILD_TIMES
observability, staging/TTL GC, and the ownership guard."""

import os
import time

import pytest

from nabatshy_spark import artifacts


def _write_artifact(staging: str, payload: str = "data") -> None:
    os.makedirs(staging)
    with open(os.path.join(staging, "part-0"), "w") as f:
        f.write(payload)
    open(os.path.join(staging, "_SUCCESS"), "w").close()


def test_ensure_builds_once_and_records_build_time(tmp_path):
    calls = []

    def build(staging):
        calls.append(staging)
        _write_artifact(staging)

    artifacts.BUILD_TIMES.clear()
    p1 = artifacts.ensure("fam", "k1", build, base=str(tmp_path))
    p2 = artifacts.ensure("fam", "k1", build, base=str(tmp_path))
    assert p1 == p2 and len(calls) == 1
    assert os.path.exists(os.path.join(p1, "_SUCCESS"))
    assert "fam/k1" in artifacts.BUILD_TIMES
    assert artifacts.BUILD_TIMES["fam/k1"] >= 0.0


def test_ensure_rejects_build_without_success_marker(tmp_path):
    def bad_build(staging):
        os.makedirs(staging)
        with open(os.path.join(staging, "part-0"), "w") as f:
            f.write("incomplete")

    with pytest.raises(RuntimeError, match="_SUCCESS"):
        artifacts.ensure("fam", "bad", bad_build, base=str(tmp_path))
    # nothing published, staging cleaned up
    assert list(tmp_path.iterdir()) == []


def test_stale_partial_dir_is_quarantined_and_replaced(tmp_path):
    # a crashed run left a partial (no _SUCCESS) dir at the key
    stale = tmp_path / "k2"
    stale.mkdir()
    (stale / "part-corrupt").write_text("junk")
    p = artifacts.ensure(
        "fam", "k2", lambda s: _write_artifact(s, "good"), base=str(tmp_path)
    )
    assert open(os.path.join(p, "part-0")).read() == "good"
    assert not (stale / "part-corrupt").exists()
    leftovers = [
        e.name
        for e in tmp_path.iterdir()
        if ".staging-" in e.name or ".quarantine-" in e.name
    ]
    assert leftovers == []


def test_sweep_removes_old_staging_and_expired_artifacts(tmp_path):
    old_staging = tmp_path / "dead.staging-999-abc"
    old_staging.mkdir()
    expired = tmp_path / "old_artifact"
    _write_artifact(str(expired))
    fresh = tmp_path / "fresh_artifact"
    _write_artifact(str(fresh))
    past = time.time() - 10 * 86400
    os.utime(old_staging, (past, past))
    os.utime(expired, (past, past))
    artifacts.ensure(
        "fam", "k3", lambda s: _write_artifact(s), base=str(tmp_path)
    )
    assert not old_staging.exists()
    assert not expired.exists()  # TTL'd out (untouched for 10 days)
    assert fresh.exists()  # recent artifacts survive the sweep


def test_cache_hit_touches_mtime_for_ttl(tmp_path):
    p = artifacts.ensure(
        "fam", "k4", lambda s: _write_artifact(s), base=str(tmp_path)
    )
    past = time.time() - 5 * 86400
    os.utime(p, (past, past))
    artifacts.ensure("fam", "k4", lambda s: _write_artifact(s), base=str(tmp_path))
    # the hit refreshed the LRU marker: TTL is time-since-last-READ
    assert time.time() - os.path.getmtime(p) < 60


def test_default_root_is_per_user(monkeypatch):
    monkeypatch.delenv("SPARK_GRAFT_ARTIFACT_DIR", raising=False)
    assert f"nabatshy_artifacts_{os.getuid()}" in artifacts.artifact_root()
    monkeypatch.setenv("SPARK_GRAFT_ARTIFACT_DIR", "/some/run/dir")
    assert artifacts.artifact_root() == "/some/run/dir"


def test_env_var_override_beats_shared_root(tmp_path, monkeypatch):
    monkeypatch.setenv("TEST_FAM_DIR", str(tmp_path / "via_env"))
    p = artifacts.ensure(
        "fam", "k5", lambda s: _write_artifact(s), env_var="TEST_FAM_DIR"
    )
    assert p.startswith(str(tmp_path / "via_env"))


def test_ownership_guard_refuses_foreign_dir(tmp_path, monkeypatch):
    """A root owned by another uid must be refused, not trusted."""
    real_stat = os.stat

    class FakeStat:
        def __init__(self, st):
            self._st = st
            self.st_uid = os.getuid() + 1

        def __getattr__(self, name):
            return getattr(self._st, name)

    def fake_stat(p, *a, **k):
        st = real_stat(p, *a, **k)
        if str(p) == str(tmp_path / "foreign"):
            return FakeStat(st)
        return st

    (tmp_path / "foreign").mkdir()
    monkeypatch.setattr(os, "stat", fake_stat)
    with pytest.raises(RuntimeError, match="owned by uid"):
        artifacts.ensure(
            "fam", "k6", lambda s: _write_artifact(s),
            base=str(tmp_path / "foreign"),
        )


def test_source_fingerprint_tracks_content(tmp_path):
    f = tmp_path / "src.parquet"
    f.write_text("v1")
    fp1 = artifacts.source_fingerprint(str(f))
    assert fp1 == artifacts.source_fingerprint(str(f))
    time.sleep(0.01)
    f.write_text("v2+")
    assert artifacts.source_fingerprint(str(f)) != fp1
