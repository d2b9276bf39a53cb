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
    # the trailing 32 is the KITTI-shaped preset rung at the best batch
    assert calls == [32, 16, 32]
    assert r["value"] == 80.0 and r["batch"] == 32
    assert r["batch_ladder"] == {"32": 80.0, "16": 49.0}
    assert r["value_preset"] == 80.0
    # self-describing sizing: headline caps are the bench-scene caps,
    # preset rung runs the untrimmed PRESET caps
    assert r["bench_caps"]["ring_cap"] == 1856
    assert r["bench_caps"]["less_flat_cap"] == 36864
    assert r["preset_caps"]["ring_cap"] == 2560
    assert r["preset_caps"]["n_raw"] == 131072
    assert r["preset_caps"]["less_flat_cap"] == 40960


def test_preset_rung_skippable(bench_mod, monkeypatch):
    calls = []

    def fake(cfg, batch, n_frames):
        calls.append(batch)
        return 49.0, 1.0, 0.04, 0.02, 1e9

    monkeypatch.setenv("BENCH_PRESET_RUNG", "0")
    monkeypatch.setattr(bench_mod, "bench_batched", fake)
    r = _run_main(bench_mod)
    assert calls == [32, 16]
    assert "value_preset" not in r and "preset_caps" not in r


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
    assert calls == [32, 16, 64, 64]   # final 64 = preset rung
    assert r["value"] == 150.0 and r["batch"] == 64
    assert r["batch_ladder"]["64"] == 150.0


def test_ladder_skips_64_on_sublinear_scaling(bench_mod, monkeypatch):
    calls = []

    def fake(cfg, batch, n_frames):
        calls.append(batch)
        return {32: 60.0, 16: 49.0}[batch], 1.0, 0.05, 0.02, 1e9

    monkeypatch.setattr(bench_mod, "bench_batched", fake)
    r = _run_main(bench_mod)
    assert calls == [32, 16, 32]       # final 32 = preset rung
    assert r["value"] == 60.0 and r["batch"] == 32
