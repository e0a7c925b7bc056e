"""Training supervisor: restart-on-failure from the latest checkpoint.

Parity: the reference's only fault-tolerance mechanism is run_train.sh's
grep-for-"CUDA out of memory"-then-restart loop
(/root/reference/run_train.sh:60-82, targeting a deleted train.py). The
TPU-idiomatic rebuild restarts on ANY nonzero exit (OOM, preemption, relay
drop): checkpoints are preemption-safe orbax slots, so the supervisor just
finds the newest `states/*.state` under the log dir and relaunches the
training command with `--resume <slot>`.

Usage:
    python scripts/supervise_train.py --log-dir runs --max-restarts 5 -- \
        python scripts/pre_train.py --dataset-dir ... --log-dir runs ...

Exit code is the final attempt's exit code (0 on success).
"""

import argparse
import os
import subprocess
import sys
import time


def find_latest_state(log_dir: str, since: float = 0.0):
    """Newest states/*.state (orbax dir or pickle file) under log_dir.

    Returns (fresh, stale): `fresh` is the newest slot written at/after
    `since` (i.e. by THIS supervised run), `stale` the newest older one.
    Several experiments can share a log dir, so a slot predating the
    supervisor belongs to some other run — resuming from it silently would
    cross experiments (the caller warns)."""
    fresh, fresh_t = None, -1.0
    stale, stale_t = None, -1.0
    for root, dirs, files in os.walk(log_dir):
        if os.path.basename(root) != "states":
            continue
        for name in list(dirs) + list(files):
            if not name.endswith(".state"):
                continue
            path = os.path.join(root, name)
            t = os.path.getmtime(path)
            if t >= since and t > fresh_t:
                fresh, fresh_t = path, t
            elif t < since and t > stale_t:
                stale, stale_t = path, t
        dirs[:] = []  # don't descend into the states dir itself
    return fresh, stale


def with_resume(cmd, ckpt):
    """Return cmd with `--resume ckpt` (replacing an existing --resume)."""
    out = []
    skip = False
    for i, tok in enumerate(cmd):
        if skip:
            skip = False
            continue
        if tok == "--resume":
            skip = True
            continue
        if tok.startswith("--resume="):
            continue
        out.append(tok)
    return out + ["--resume", ckpt]


def main(argv=None):
    argv = sys.argv[1:] if argv is None else list(argv)
    if "--" not in argv:
        print("usage: supervise_train.py [flags] -- <training command...>",
              file=sys.stderr)
        return 2
    split = argv.index("--")
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--log-dir", required=True,
                    help="run directory tree to search for checkpoints")
    ap.add_argument("--max-restarts", type=int, default=10)
    ap.add_argument("--backoff-seconds", type=float, default=5.0)
    args = ap.parse_args(argv[:split])
    cmd = argv[split + 1:]

    start_time = time.time()
    attempt = 0
    while True:
        run_cmd = list(cmd)
        ckpt, stale = find_latest_state(args.log_dir, since=start_time)
        if attempt > 0 and ckpt is None and stale is not None:
            print(f"[supervise] WARNING: resuming from {stale}, which "
                  f"predates this supervisor — it may belong to a "
                  f"different experiment sharing {args.log_dir!r}",
                  flush=True)
            ckpt = stale
        if attempt > 0 and ckpt is not None:
            run_cmd = with_resume(run_cmd, ckpt)
        print(f"[supervise] attempt {attempt}: {' '.join(run_cmd)}",
              flush=True)
        rc = subprocess.call(run_cmd)
        if rc == 0:
            print("[supervise] training completed", flush=True)
            return 0
        attempt += 1
        if attempt > args.max_restarts:
            print(f"[supervise] giving up after {args.max_restarts} "
                  f"restarts (last rc={rc})", flush=True)
            return rc
        print(f"[supervise] rc={rc}; restarting from "
              f"{ckpt or 'scratch'} in {args.backoff_seconds}s", flush=True)
        time.sleep(args.backoff_seconds)


if __name__ == "__main__":
    sys.exit(main())
