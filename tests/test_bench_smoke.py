"""Import/shape smoke for the two driver-run artifacts.

bench.py and __graft_entry__.py are executed by the round driver, not by the
suite — a syntax error or a renamed symbol there would surface only as a
silent rc!=0 in the driver log (the round-4 rc=124 post-mortem). Importing
them here keeps that failure mode inside CI. No device work happens at
import time (both files gate all compute behind main()/entry()).
"""

import importlib
import json
import sys


def test_bench_importable_and_wired():
    bench = importlib.import_module("bench")
    # every metric wired in main() must exist
    for fn in ("bench_headline", "bench_distance_step", "bench_eul_host",
               "bench_train_step", "bench_flagship", "bench_latency_b1",
               "bench_distance_eul_e2e", "main", "_budgeted"):
        assert callable(getattr(bench, fn)), fn
    # headline-first AND headline-reprinted-last: both parser contracts
    import inspect

    src = inspect.getsource(bench.main)
    assert src.index("bench_headline") < src.index("bench_distance_step")
    assert "print(json.dumps(headline))" in src


def test_graft_entry_importable():
    mod = importlib.import_module("__graft_entry__")
    assert callable(mod.entry)
    assert callable(mod.dryrun_multichip)


def test_bench_budget_skips_without_starving(capsys, monkeypatch):
    """A metric that overruns its budget is skipped with a stderr note and
    the next metric still runs (the round-4 failure mode)."""
    bench = importlib.import_module("bench")
    monkeypatch.setattr(bench, "_T0", __import__("time").monotonic())

    def slow():
        import time

        time.sleep(5)
        return "never"

    def fast():
        print(json.dumps({"metric": "ok", "value": 1}))
        return "ran"

    assert bench._budgeted("slow", 1, slow) is None
    assert bench._budgeted("fast", 30, fast) == "ran"
    captured = capsys.readouterr()
    assert "exceeded" in captured.err
    assert '"metric": "ok"' in captured.out
