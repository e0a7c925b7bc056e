"""Supervisor restart loop (scripts/supervise_train.py): crash → relaunch
with --resume pointing at the newest checkpoint slot (reference parity:
run_train.sh:60-82's OOM-restart loop, rebuilt on preemption-safe slots)."""

import os
import subprocess
import sys
import textwrap

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SUPERVISE = os.path.join(REPO, "scripts", "supervise_train.py")


def test_restart_resumes_from_latest_state(tmp_path):
    log_dir = tmp_path / "runs"
    states = log_dir / "exp" / "2020-01-01" / "states"
    states.mkdir(parents=True)
    (states / "0.state").write_text("old")
    newest = states / "2.state"
    newest.write_text("new")
    os.utime(states / "0.state", (1, 1))

    # fake trainer: fails on the first run, records argv, succeeds once a
    # sentinel exists
    trainer = tmp_path / "fake_train.py"
    sentinel = tmp_path / "crashed_once"
    argv_log = tmp_path / "argv.log"
    trainer.write_text(textwrap.dedent(f"""
        import os, sys
        with open({str(argv_log)!r}, "at") as f:
            f.write(" ".join(sys.argv[1:]) + "\\n")
        if not os.path.exists({str(sentinel)!r}):
            open({str(sentinel)!r}, "wt").write("x")
            sys.exit(1)
        sys.exit(0)
    """))

    rc = subprocess.call(
        [sys.executable, SUPERVISE, "--log-dir", str(log_dir),
         "--max-restarts", "3", "--backoff-seconds", "0.01", "--",
         sys.executable, str(trainer), "--lr", "1e-3"])
    assert rc == 0
    lines = argv_log.read_text().strip().splitlines()
    assert len(lines) == 2
    assert lines[0] == "--lr 1e-3"                      # first attempt: as-is
    assert lines[1] == f"--lr 1e-3 --resume {newest}"   # restart: resumed


def test_gives_up_after_max_restarts(tmp_path):
    log_dir = tmp_path / "runs"
    log_dir.mkdir()
    trainer = tmp_path / "always_fail.py"
    trainer.write_text("import sys; sys.exit(7)")
    rc = subprocess.call(
        [sys.executable, SUPERVISE, "--log-dir", str(log_dir),
         "--max-restarts", "2", "--backoff-seconds", "0.01", "--",
         sys.executable, str(trainer)])
    assert rc == 7


def test_replaces_existing_resume_flag(tmp_path):
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    try:
        from supervise_train import with_resume
    finally:
        sys.path.pop(0)
    cmd = ["python", "t.py", "--resume", "old.state", "--lr", "1"]
    assert with_resume(cmd, "new.state") == \
        ["python", "t.py", "--lr", "1", "--resume", "new.state"]
    cmd2 = ["python", "t.py", "--resume=old.state"]
    assert with_resume(cmd2, "new.state") == \
        ["python", "t.py", "--resume", "new.state"]
