"""Crash-resilience of the bench orchestrator (VERDICT r4 item 1): a
raylet crash in any phase must cost at most one retry / one query, never
the round's evidence.  Pure driver-side logic — no Ray session needed."""

import json

import pytest


@pytest.fixture()
def bench_mod(monkeypatch, tmp_path):
    import bench

    monkeypatch.setattr(bench, "PARTIAL_PATH",
                        str(tmp_path / "BENCH_PARTIAL.json"))
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    return bench


def test_sweep_resumes_after_crash(bench_mod, monkeypatch):
    calls = []

    def fake_run_child(argv, timeout):
        calls.append(argv)
        only = argv[argv.index("--only") + 1].split(",")
        if len(calls) == 1:  # crash after completing 2 queries
            out = "\n".join(
                "QPARTIAL " + json.dumps({"name": n, "sec": 0.1})
                for n in only[:2]
            )
            return 1, out + "\n", "raylet died"
        out = "\n".join(
            "QPARTIAL " + json.dumps({"name": n, "sec": 0.2}) for n in only
        )
        return 0, out + "\n" + json.dumps({"queries": {}}), ""

    monkeypatch.setattr(bench_mod, "_run_child", fake_run_child)
    monkeypatch.setattr(bench_mod, "SWEEP_QUERIES", ["q1", "q2", "q3", "q4"])
    result = {}
    done = bench_mod._sweep_with_resume(result, "/x", 8)
    assert done == {"q1": 0.1, "q2": 0.1, "q3": 0.2, "q4": 0.2}
    assert len(calls) == 2
    # the relaunched child got ONLY the remaining queries
    assert calls[1][calls[1].index("--only") + 1] == "q3,q4"
    assert "queries_attempt1" in result["phase_errors"]
    assert result["queries"] == done
    # the partial file holds the cumulative result
    with open(bench_mod.PARTIAL_PATH) as f:
        assert json.load(f)["queries"] == done


def test_sweep_gives_up_after_max_attempts(bench_mod, monkeypatch):
    def always_crash(argv, timeout):
        return 1, "QPARTIAL " + json.dumps({"name": "q1", "sec": 0.1}), "boom"

    monkeypatch.setattr(bench_mod, "_run_child", always_crash)
    monkeypatch.setattr(bench_mod, "SWEEP_QUERIES", ["q1", "q2"])
    result = {}
    done = bench_mod._sweep_with_resume(result, "/x", 8, max_attempts=2)
    # q1's timing survives every crash; q2 is recorded as missing, not lost
    assert done == {"q1": 0.1}
    assert set(result["phase_errors"]) == {
        "queries_attempt1", "queries_attempt2",
    }


def test_phase_retry_recovers_and_records(bench_mod, monkeypatch):
    attempts = []

    def fake(argv, timeout):
        attempts.append(argv)
        if len(attempts) == 1:
            return 134, "", "SIGABRT in raylet"
        return 0, 'log noise\n{"large_triples": 5}\n', ""

    monkeypatch.setattr(bench_mod, "_run_child", fake)
    result = {}
    out = bench_mod._phase_with_retry(result, "large", ["--phase", "large"], 60)
    assert out == {"large_triples": 5}
    assert list(result["phase_errors"]) == ["large_attempt1"]
    assert "SIGABRT" in result["phase_errors"]["large_attempt1"]


def test_phase_retry_double_failure_returns_none(bench_mod, monkeypatch):
    monkeypatch.setattr(
        bench_mod, "_run_child", lambda argv, timeout: (1, "", "dead"),
    )
    result = {}
    assert bench_mod._phase_with_retry(result, "hetionet", ["x"], 60) is None
    assert set(result["phase_errors"]) == {
        "hetionet_attempt1", "hetionet_attempt2",
    }


def test_sweep_names_resolve_in_entry(bench_mod):
    """Every sweep name must be a real queries() entry — a typo would
    crash the sweep child on its first query, not at import."""
    import __ray_entry__ as entry

    q = entry.queries()
    missing = [n for n in bench_mod.SWEEP_QUERIES if n not in q]
    assert missing == []
