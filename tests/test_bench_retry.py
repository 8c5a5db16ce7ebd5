"""bench.py outage resilience (VERDICT r4 item 2).

BENCH_r04.json was `rc=1` — a single axon-backend outage at the
driver's capture time turned the round's official perf artifact into a
traceback.  bench.py now retries transient backend errors with backoff
and salvages partial measurement windows; these tests force both paths.
"""

import importlib.util
import os

import pytest

_ROOT = os.path.join(os.path.dirname(__file__), "..")


def _load_bench():
    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(_ROOT, "bench.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


bench = _load_bench()


def test_retry_transient_recovers_after_outage():
    """Two UNAVAILABLE failures then success: retried, backoff grows."""
    calls = {"n": 0}
    sleeps = []

    def flaky():
        calls["n"] += 1
        if calls["n"] < 3:
            raise RuntimeError(
                "Unable to initialize backend 'axon': UNAVAILABLE: "
                "failed to connect to all addresses")
        return "ok"

    out = bench.retry_transient(flaky, attempts=3, backoff_s=10.0,
                                sleep=sleeps.append)
    assert out == "ok"
    assert calls["n"] == 3
    assert sleeps == [10.0, 20.0]       # linear backoff


def test_retry_transient_gives_up_after_attempts():
    sleeps = []

    def always_down():
        raise RuntimeError("Unable to initialize backend 'axon': "
                           "UNAVAILABLE")

    with pytest.raises(RuntimeError, match="UNAVAILABLE"):
        bench.retry_transient(always_down, attempts=3, backoff_s=1.0,
                              sleep=sleeps.append)
    assert len(sleeps) == 2             # slept between the 3 attempts


def test_retry_transient_propagates_real_bugs_immediately():
    """A non-transient error (a real bug) must NOT be retried."""
    calls = {"n": 0}

    def buggy():
        calls["n"] += 1
        raise ValueError("shape mismatch")

    with pytest.raises(ValueError):
        bench.retry_transient(buggy, attempts=3, sleep=lambda s: None)
    assert calls["n"] == 1


def test_is_transient_classification():
    assert bench.is_transient(RuntimeError(
        "Unable to initialize backend 'axon': UNAVAILABLE"))
    assert bench.is_transient(RuntimeError("DEADLINE_EXCEEDED: rpc"))
    assert bench.is_transient(ConnectionError("Connection reset by peer"))
    assert not bench.is_transient(ValueError("UNAVAILABLE"))  # wrong type
    assert not bench.is_transient(RuntimeError("NaN in forces"))


def test_bench_deck_salvages_partial_windows(monkeypatch, capsys):
    """If the tunnel dies mid-measurement, the JSON line must still be
    emitted from the windows that completed."""
    windows_run = {"n": 0}

    class _Cfg:
        n_at = 1000
        dt = 0.001

    def fake_setup_retry(fn, **kw):
        # bypass the real setup: return (cfg, window, state, t_warm)
        def window(st):
            windows_run["n"] += 1
            if windows_run["n"] == 3:
                raise RuntimeError("UNAVAILABLE: tunnel lost")
            return st
        return _Cfg(), window, object(), 1.0

    monkeypatch.setattr(bench, "retry_transient", fake_setup_retry)
    bench.bench_deck("m", "/nonexistent", "scan", chunk=100, windows=5)
    out = capsys.readouterr()
    line = out.out.strip().splitlines()[0]
    import json
    rec = json.loads(line)
    assert rec["metric"] == "m" and rec["unit"] == "steps/s"
    assert rec["value"] > 0
    assert windows_run["n"] == 3        # died on window 3, salvaged 2
    assert "completed windows" in out.err
