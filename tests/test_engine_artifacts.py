"""Cross-process maintained-artifact protocol (round 12, VERDICT r11 #3).

engine.artifact_dir / ensure_artifact back the hybrid-RRF serve: a fresh
process must READ the on-disk index instead of rebuilding, a regenerated
corpus must map to a fresh key (never stale serves), and the
atomic-rename commit must leave no torn artifact behind a crash or race.
"""

import os

import pytest

from qradar_restapi_kafka_datapipeline_spark import engine


def test_artifact_fingerprint_tracks_input_file(tmp_path, monkeypatch):
    monkeypatch.setattr(engine, "ARTIFACT_ROOT", str(tmp_path / "root"))
    src = tmp_path / "corpus.parquet"
    src.write_bytes(b"v1")
    p1 = engine.artifact_dir("ix", str(src))
    assert engine.artifact_dir("ix", str(src)) == p1  # stable
    # same size, different mtime → different key (regeneration-safe)
    os.utime(src, (1_700_000_000, 1_700_000_000))
    p2 = engine.artifact_dir("ix", str(src))
    assert p2 != p1
    src.write_bytes(b"v2-longer")
    assert engine.artifact_dir("ix", str(src)) not in (p1, p2)


def test_ensure_artifact_builds_once_and_commits_atomically(
    tmp_path, monkeypatch
):
    monkeypatch.setattr(engine, "ARTIFACT_ROOT", str(tmp_path / "root"))
    path = os.path.join(engine.ARTIFACT_ROOT, "ix__abc")
    calls = []

    def build(staging):
        calls.append(staging)
        os.makedirs(staging)
        with open(os.path.join(staging, "data"), "w") as f:
            f.write("x")

    assert engine.ensure_artifact(path, build) == path
    assert os.path.exists(os.path.join(path, "data"))
    engine.ensure_artifact(path, build)  # second call: read, no rebuild
    assert len(calls) == 1
    # no staging debris
    assert [d for d in os.listdir(engine.ARTIFACT_ROOT)
            if d.startswith("ix__abc.")] == []


def test_ensure_artifact_crashed_build_leaves_no_commit(
    tmp_path, monkeypatch
):
    monkeypatch.setattr(engine, "ARTIFACT_ROOT", str(tmp_path / "root"))
    path = os.path.join(engine.ARTIFACT_ROOT, "ix__crash")

    def dying(staging):
        os.makedirs(staging)
        raise RuntimeError("injected build crash")

    with pytest.raises(RuntimeError):
        engine.ensure_artifact(path, dying)
    assert not os.path.isdir(path)  # nothing published

    def ok(staging):
        os.makedirs(staging)
        with open(os.path.join(staging, "data"), "w") as f:
            f.write("x")

    assert engine.ensure_artifact(path, ok) == path  # retry succeeds


def test_ensure_artifact_race_loser_adopts_winner(tmp_path, monkeypatch):
    monkeypatch.setattr(engine, "ARTIFACT_ROOT", str(tmp_path / "root"))
    path = os.path.join(engine.ARTIFACT_ROOT, "ix__race")

    def build_and_lose(staging):
        os.makedirs(staging)
        with open(os.path.join(staging, "data"), "w") as f:
            f.write("loser")
        # winner publishes first, between our build and our rename
        os.makedirs(path)
        with open(os.path.join(path, "data"), "w") as f:
            f.write("winner")

    assert engine.ensure_artifact(path, build_and_lose) == path
    with open(os.path.join(path, "data")) as f:
        assert f.read() == "winner"  # loser's tree discarded

def test_artifact_version_token_keys_away_stale(tmp_path, monkeypatch):
    """ADVICE r12: builder code/parameter changes must key away the old
    artifact automatically — no manual name-suffix bumps."""
    monkeypatch.setattr(engine, "ARTIFACT_ROOT", str(tmp_path / "root"))
    src = tmp_path / "corpus.parquet"
    src.write_bytes(b"v1")
    p_default = engine.artifact_dir("ix", str(src))
    p_a = engine.artifact_dir("ix", str(src), version="dim=64")
    p_b = engine.artifact_dir("ix", str(src), version="dim=128")
    assert len({p_default, p_a, p_b}) == 3
    assert engine.artifact_dir("ix", str(src), version="dim=64") == p_a


def test_ensure_artifact_crashed_build_leaks_no_staging(
    tmp_path, monkeypatch
):
    """ADVICE r12: a failed build must rmtree its pid-suffixed staging
    tree, not leave it for pid-reuse cleanup."""
    monkeypatch.setattr(engine, "ARTIFACT_ROOT", str(tmp_path / "root"))
    path = os.path.join(engine.ARTIFACT_ROOT, "ix__leak")

    def dying(staging):
        os.makedirs(staging)
        raise RuntimeError("injected build crash")

    with pytest.raises(RuntimeError):
        engine.ensure_artifact(path, dying)
    assert [d for d in os.listdir(engine.ARTIFACT_ROOT)
            if d.startswith("ix__leak.")] == []


def test_ensure_artifact_rename_failure_without_winner_reraises(
    tmp_path, monkeypatch
):
    """ADVICE r12: a rename OSError is 'lost the race' ONLY when the
    destination actually exists — EACCES/EXDEV must surface, not silently
    delete the fresh build and defer the failure downstream."""
    monkeypatch.setattr(engine, "ARTIFACT_ROOT", str(tmp_path / "root"))
    path = os.path.join(engine.ARTIFACT_ROOT, "ix__exdev")

    def ok(staging):
        os.makedirs(staging)

    real_rename = os.rename

    def failing_rename(a, b):
        raise OSError("simulated EXDEV")

    monkeypatch.setattr(os, "rename", failing_rename)
    try:
        with pytest.raises(OSError):
            engine.ensure_artifact(path, ok)
    finally:
        monkeypatch.setattr(os, "rename", real_rename)
    assert not os.path.isdir(path)
