"""Unit tests for bench.py's fresh-first phase orchestration.

The driver parses bench.py's LAST stdout JSON line on real hardware;
these tests exercise the measurement loop's control flow with stub
phase scripts (plain ``python -c`` subprocesses, no TPU): a phase is
always measured IN-RUN, a fresh scratch record only tops the result
up (best-of-k) or covers a phase no in-run attempt could measure,
and a dead phase with no scratch still raises.
"""

import importlib
import json
import sys
import time

import pytest

sys.path.insert(0, "/root/repo")


@pytest.fixture()
def bench_mod(tmp_path, monkeypatch):
    monkeypatch.setenv(
        "MDTPU_BENCH_SCRATCH", str(tmp_path / "scratch.json")
    )
    # The stub subprocesses only print a line: drop the axon
    # sitecustomize (which pre-imports jax per process) so each
    # attempt starts in milliseconds, and skip the retry backoff.
    monkeypatch.setenv("PYTHONPATH", "")
    import bench

    bench = importlib.reload(bench)
    # One attempt per phase (best-of-1): _remaining() large enough to
    # measure but below the best-of-3 refinement threshold.
    monkeypatch.setattr(bench, "_remaining", lambda: 800.0)
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    yield bench
    importlib.reload(bench)  # restore default scratch path


def _stub_plan(bench, monkeypatch, phases, script):
    monkeypatch.setattr(
        bench, "_phase_plan", lambda: (phases, script)
    )


def test_fresh_measurement_recorded(bench_mod, monkeypatch):
    _stub_plan(
        bench_mod, monkeypatch, ["pX"], "print('MDTPU_FPS 5.0')"
    )
    fps, done, total = bench_mod._measure_tpu_subprocess()
    assert (done, total) == (1, 1)
    assert fps == pytest.approx(5.0)
    # and the scratch now holds the fresh record
    data = json.load(open(bench_mod._SCRATCH_PATH))
    assert data[bench_mod._phase_key("pX")]["fps"] == pytest.approx(
        5.0
    )


def test_scratch_tops_up_but_fresh_still_runs(
    bench_mod, monkeypatch, tmp_path, capfd
):
    # Seed a higher scratch record; the fresh 5.0 measurement must
    # still happen (proven by the marker file the stub writes) and
    # the recorded value is the best-of-k 9.0.
    bench_mod._save_scratch(bench_mod._phase_key("pX"), {"fps": 9.0})
    marker = tmp_path / "ran"
    _stub_plan(
        bench_mod,
        monkeypatch,
        ["pX"],
        "import pathlib; "
        f"pathlib.Path({str(marker)!r}).write_text('y'); "
        "print('MDTPU_FPS 5.0')",
    )
    fps, done, total = bench_mod._measure_tpu_subprocess()
    assert marker.exists(), "fresh measurement did not run"
    assert fps == pytest.approx(9.0)
    err = capfd.readouterr().err
    assert "fresh 5.000" in err and "9.000 retained" in err


def test_scratch_fallback_when_phase_unmeasurable(
    bench_mod, monkeypatch, capfd
):
    bench_mod._save_scratch(bench_mod._phase_key("pX"), {"fps": 7.0})
    _stub_plan(
        bench_mod, monkeypatch, ["pX"], "print('no fps here')"
    )
    fps, done, total = bench_mod._measure_tpu_subprocess()
    assert fps == pytest.approx(7.0)
    assert "FALLBACK" in capfd.readouterr().err


def test_stale_scratch_ignored(bench_mod, monkeypatch):
    bench_mod._save_scratch(bench_mod._phase_key("pX"), {"fps": 9.0})
    data = json.load(open(bench_mod._SCRATCH_PATH))
    data[bench_mod._phase_key("pX")]["time"] = time.time() - 7200
    json.dump(data, open(bench_mod._SCRATCH_PATH, "w"))
    _stub_plan(
        bench_mod, monkeypatch, ["pX"], "print('MDTPU_FPS 5.0')"
    )
    fps, _, _ = bench_mod._measure_tpu_subprocess()
    assert fps == pytest.approx(5.0)


def test_dead_phase_without_scratch_raises(bench_mod, monkeypatch):
    _stub_plan(
        bench_mod, monkeypatch, ["pX"], "print('no fps here')"
    )
    with pytest.raises(RuntimeError):
        bench_mod._measure_tpu_subprocess()


def test_partial_run_projects_measured_phases(
    bench_mod, monkeypatch
):
    # Phase pA measures at 4 fps; pB cannot be measured and has no
    # scratch -> the combination reports done=1 of 2 at the mean
    # measured per-frame cost.
    script = (
        "import sys; "
        "print('MDTPU_FPS 4.0' if {phase!r} == 'pA' else 'dead')"
    )
    monkeypatch.setattr(
        bench_mod,
        "_phase_plan",
        lambda: (
            ["pA", "pB"],
            "print('MDTPU_FPS 4.0') if {phase!r} == 'pA' else "
            "print('dead')",
        ),
    )
    fps, done, total = bench_mod._measure_tpu_subprocess()
    assert (done, total) == (1, 2)
    assert fps == pytest.approx(1 / (2 * 0.25))
