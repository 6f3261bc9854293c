"""Unit tests for the unattended chip-stage chain runner
(scripts/round5_chain.py): deliberate-SIGTERM-then-resume, done-marker
detection, stall SIGKILL + give-up, and the global deadline — all against
a fake trainer process, no device needed."""

import os
import sys
import time

import pytest

SCRIPTS = os.path.join(os.path.dirname(__file__), "..", "scripts")
sys.path.insert(0, SCRIPTS)

import round5_chain  # noqa: E402

FAKE_TRAINER = """
import json, os, signal, sys, time
out = sys.argv[sys.argv.index('--outputDir') + 1]
resume = '--resume' in sys.argv
os.makedirs(out, exist_ok=True)
state_f = os.path.join(out, 'state')
start = 0
if resume and os.path.exists(state_f):
    start = int(open(state_f).read()) + 1
elif not resume and os.path.exists(state_f):
    print('FRESH-START-AFTER-CHECKPOINT')  # the test asserts this never happens
stop = {'flag': False}
signal.signal(signal.SIGTERM, lambda s, f: stop.update(flag=True))
m = open(os.path.join(out, 'metrics.jsonl'), 'a', buffering=1)
for step in range(start, 30):
    m.write(json.dumps({'step': step}) + '\\n')
    with open(state_f, 'w') as f:
        f.write(str(step))
    time.sleep(0.15)
    if stop['flag']:
        print('Preempted: checkpointed at step', step)
        sys.exit(0)
print('Training completed!')
"""

HANGER = """
import json, os, sys, time
out = sys.argv[sys.argv.index('--outputDir') + 1]
os.makedirs(out, exist_ok=True)
with open(os.path.join(out, 'metrics.jsonl'), 'a', buffering=1) as m:
    m.write(json.dumps({'step': 0}) + '\\n')
time.sleep(120)
"""


@pytest.fixture(autouse=True)
def _patch(monkeypatch, tmp_path):
    monkeypatch.setattr(round5_chain, "wait_for_tunnel", lambda: None)
    monkeypatch.setattr(round5_chain, "LOG", str(tmp_path / "chain.log"))


def _stage(tmp_path, script, **kw):
    sc = tmp_path / "fake.py"
    sc.write_text(script)
    out = tmp_path / "run"
    defaults = dict(
        progress=str(out / "metrics.jsonl"),
        stdout_path=str(tmp_path / "stage.stdout.log"),
        done_marker="Training completed!",
        poll_s=0.1,
    )
    defaults.update(kw)
    ok = round5_chain.run_stage(
        "t", [sys.executable, str(sc), "--outputDir", str(out)], **defaults
    )
    return ok, out, tmp_path / "stage.stdout.log"


def test_kill_at_step_then_resume_to_completion(tmp_path):
    t0 = time.time()
    ok, out, stdout = _stage(tmp_path, FAKE_TRAINER, kill_at_step=10)
    assert ok and time.time() - t0 < 60
    text = stdout.read_text()
    assert "Preempted" in text          # the deliberate SIGTERM landed
    assert "Training completed!" in text
    assert "FRESH-START-AFTER-CHECKPOINT" not in text  # resumed, not reran
    steps = [int(ln.split(":")[1].rstrip("}"))
             for ln in (out / "metrics.jsonl").read_text().splitlines()]
    assert steps[-1] == 29
    # monotone with no reset: the resume seam is invisible in the history
    assert steps == sorted(set(steps))


def test_done_marker_short_circuits_relaunch(tmp_path):
    ok, out, stdout = _stage(tmp_path, FAKE_TRAINER)
    assert ok
    n_runs = stdout.read_text().count("Training completed!")
    ok2 = round5_chain.run_stage(
        "t", [sys.executable, "nonexistent.py"],
        progress=str(out / "metrics.jsonl"), stdout_path=str(stdout),
        done_marker="Training completed!", poll_s=0.1,
    )
    assert ok2  # already-complete: must not launch anything
    assert stdout.read_text().count("Training completed!") == n_runs


def test_stall_kills_and_gives_up(tmp_path):
    t0 = time.time()
    ok, out, stdout = _stage(
        tmp_path, HANGER, stall_seconds=1.0, max_restarts=1,
        done_marker="NEVER", resume_flag=None,
    )
    assert not ok and time.time() - t0 < 60


def test_deadline_stops_before_launch(tmp_path):
    ok, out, stdout = _stage(
        tmp_path, FAKE_TRAINER, deadline=time.time() - 1.0
    )
    assert not ok
    assert not stdout.exists() or "Training" not in stdout.read_text()
