"""Ledger-honesty semantics of tools/chain_run.py (VERDICT r3 W2 / item 8).

The durable ledger exists so a killed chain still leaves a truthful record:
every step pre-registers with rc="started" BEFORE it runs, completion
overwrites that with the real integer rc, and a chain that dies mid-step
leaves the explicit "started" marker rather than a record with no rc (the
r3h bench_all provenance hole). These tests pin that contract hermetically
(no TPU, no tunnel probe — wait_for_tunnel is stubbed).
"""

import json
import sys
import types

import pytest

from tools import chain_run


@pytest.fixture()
def ledger(tmp_path, monkeypatch):
    path = tmp_path / "queue_ledger.json"
    monkeypatch.setattr(chain_run, "LEDGER", str(path))
    monkeypatch.setattr(chain_run, "wait_for_tunnel", lambda *a, **k: True)
    monkeypatch.setattr(chain_run, "yield_to_bench", lambda: None)
    monkeypatch.setattr(chain_run, "CHAIN_BUSY", str(tmp_path / "busy"))
    monkeypatch.setattr(chain_run, "BENCH_SENTINEL", str(tmp_path / "bench"))
    return path


def _read(path):
    with open(path) as f:
        return json.load(f)


def test_completed_steps_record_integer_rc(ledger):
    rc = chain_run.run_chain(
        "t1",
        [
            {"name": "ok", "cmd": "echo hello", "timeout": 30},
            {"name": "bad", "cmd": "exit 3", "timeout": 30},
        ],
        tunnel_budget=1,
    )
    assert rc == 1  # any failed step fails the chain
    chains = _read(ledger)["chains"]
    assert len(chains) == 1
    ch = chains[0]
    assert ch["done"] is True and ch["ok"] is False
    rcs = {s["name"]: s["rc"] for s in ch["steps"]}
    assert rcs == {"ok": 0, "bad": 3}
    for s in ch["steps"]:
        assert "duration_s" in s and "log_tail" in s and "started" in s


def test_killed_step_leaves_explicit_started_marker(ledger, monkeypatch):
    """A chain killed mid-step must leave rc='started', not a missing rc."""
    real_run = chain_run.subprocess.run

    def killer(*args, **kwargs):
        raise KeyboardInterrupt  # the step process dies with the chain

    monkeypatch.setattr(chain_run.subprocess, "run", killer)
    with pytest.raises(KeyboardInterrupt):
        chain_run.run_chain(
            "t2", [{"name": "doomed", "cmd": "sleep 60", "timeout": 30}],
            tunnel_budget=1,
        )
    monkeypatch.setattr(chain_run.subprocess, "run", real_run)
    ch = _read(ledger)["chains"][0]
    assert ch["done"] is False
    (step,) = ch["steps"]
    assert step["rc"] == "started"
    assert "started" in step


def test_timeout_records_rc_124(ledger):
    rc = chain_run.run_chain(
        "t3", [{"name": "slow", "cmd": "sleep 5", "timeout": 0.2}],
        tunnel_budget=1,
    )
    assert rc == 1
    (step,) = _read(ledger)["chains"][0]["steps"]
    assert step["rc"] == 124


def test_tunnel_timeout_marks_step(ledger, monkeypatch):
    monkeypatch.setattr(chain_run, "wait_for_tunnel", lambda *a, **k: False)
    rc = chain_run.run_chain(
        "t4", [{"name": "unreached", "cmd": "echo hi", "timeout": 30}],
        tunnel_budget=0.01,
    )
    assert rc == 1
    (step,) = _read(ledger)["chains"][0]["steps"]
    assert step["rc"] == "tunnel-timeout"
