"""bench.py control-flow logic (no TPU, no timing): the batch ladder
measures every size, reports the best, and records failures."""

import contextlib
import io
import json
import os
import sys

import pytest


@pytest.fixture()
def bench_mod(monkeypatch):
    monkeypatch.setenv("BENCH_BATCH", "32")
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import bench
    monkeypatch.setattr(bench, "bench_single", lambda cfg, n: (0.08, 0.02))
    return bench


def _run_main(bench):
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        bench.main()
    return json.loads(buf.getvalue().strip().splitlines()[-1])


def test_ladder_reports_best(bench_mod, monkeypatch):
    calls = []

    def fake(cfg, batch, n_frames):
        calls.append(batch)
        return (80.0, 1.5, 0.05, 0.02, 1e9) if batch == 32 \
            else (49.0, 1.0, 0.04, 0.02, 1e9)

    monkeypatch.setattr(bench_mod, "bench_batched", fake)
    r = _run_main(bench_mod)
    assert calls == [32, 16]
    assert r["value"] == 80.0 and r["batch"] == 32
    assert r["batch_ladder"] == {"32": 80.0, "16": 49.0}


def test_ladder_falls_back_on_failure(bench_mod, monkeypatch):
    def fake(cfg, batch, n_frames):
        if batch == 32:
            raise RuntimeError("RESOURCE_EXHAUSTED")
        return 49.0, 1.0, 0.04, 0.02, 1e9

    monkeypatch.setattr(bench_mod, "bench_batched", fake)
    r = _run_main(bench_mod)
    assert r["value"] == 49.0 and r["batch"] == 16
    assert r["batch_fallback"] == ["B=32: RuntimeError"]


def test_ladder_all_fail_raises(bench_mod, monkeypatch):
    def fake(cfg, batch, n_frames):
        raise RuntimeError("boom")

    monkeypatch.setattr(bench_mod, "bench_batched", fake)
    with pytest.raises(RuntimeError, match="every batch size failed"):
        _run_main(bench_mod)


def test_ladder_probes_64_on_near_linear_scaling(bench_mod, monkeypatch):
    calls = []

    def fake(cfg, batch, n_frames):
        calls.append(batch)
        return {32: 95.0, 16: 49.0, 64: 150.0}[batch], 1.0, 0.05, 0.02, 1e9

    monkeypatch.setattr(bench_mod, "bench_batched", fake)
    r = _run_main(bench_mod)
    assert calls == [32, 16, 64]
    assert r["value"] == 150.0 and r["batch"] == 64
    assert r["batch_ladder"]["64"] == 150.0


def test_ladder_skips_64_on_sublinear_scaling(bench_mod, monkeypatch):
    calls = []

    def fake(cfg, batch, n_frames):
        calls.append(batch)
        return {32: 60.0, 16: 49.0}[batch], 1.0, 0.05, 0.02, 1e9

    monkeypatch.setattr(bench_mod, "bench_batched", fake)
    r = _run_main(bench_mod)
    assert calls == [32, 16]
    assert r["value"] == 60.0 and r["batch"] == 32
