#!/usr/bin/env python
"""Stall-watchdog supervisor for train.py — elastic recovery on one chip.

The reference has no failure-recovery machinery (SURVEY.md §5: "none"); this
supplies it for environments where the accelerator transport can wedge: a
device RPC that never completes leaves the training process futex-blocked
forever with the log silent. The supervisor:

  1. runs `train.py <args> --checkpoint_every N`, teeing its output to a log;
  2. watches output progress; if nothing is written for --stall_timeout
     seconds (compiles and eval sweeps print nothing, so the timeout must
     exceed the longest legitimate silent phase), kills the whole process
     group;
  3. relaunches from <model>/rolling_chkpnt.pkl (atomic, so always loadable)
     until the run completes or --max_restarts is exhausted.

Usage:
  python scripts/train_supervised.py [supervisor flags] -- <train.py args...>
  e.g. python scripts/train_supervised.py --stall_timeout 600 -- \
       -s data/lego -m output/lego --iterations 30000
"""

from __future__ import annotations

import os
import signal
import subprocess
import sys
import time
from argparse import ArgumentParser


def parse_args(argv):
    p = ArgumentParser(description="train.py stall watchdog")
    p.add_argument("--stall_timeout", type=float, default=600.0,
                   help="seconds of log silence before the run is declared hung")
    p.add_argument("--startup_grace", type=float, default=1200.0,
                   help="silence allowance before the first log line "
                   "(data load + probe + first compile)")
    p.add_argument("--max_restarts", type=int, default=20)
    p.add_argument("--checkpoint_every", type=int, default=500)
    p.add_argument("--log", type=str, default="",
                   help="tee child output here (default <model>/train_supervised.log)")
    if "--" not in argv:
        p.error("separate train.py args with `--`")
    split = argv.index("--")
    args = p.parse_args(argv[:split])
    return args, argv[split + 1 :]


def model_path_of(train_args):
    for flag in ("-m", "--model_path"):
        if flag in train_args:
            return train_args[train_args.index(flag) + 1]
    return None


def run_once(train_args, log_f):
    """Launch train.py in its own process group; return the Popen."""
    cmd = [sys.executable, "train.py"] + train_args
    # unbuffered child stdout: with a pipe/file the child block-buffers in
    # 8KB chunks, so progress lines can sit unflushed for minutes and the
    # watchdog would see a false stall
    env = {**os.environ, "PYTHONUNBUFFERED": "1"}
    return subprocess.Popen(
        cmd, stdout=log_f, stderr=subprocess.STDOUT, start_new_session=True, env=env
    )


def kill_group(proc):
    """Kill exactly the child's process group (never by pattern)."""
    try:
        os.killpg(proc.pid, signal.SIGKILL)
    except ProcessLookupError:
        pass
    proc.wait()


def main(argv=None):
    args, train_args = parse_args(argv if argv is not None else sys.argv[1:])
    model_path = model_path_of(train_args)
    if not model_path:
        print("supervisor: train args must include -m/--model_path", file=sys.stderr)
        return 2
    os.makedirs(model_path, exist_ok=True)
    log_path = args.log or os.path.join(model_path, "train_supervised.log")
    rolling = os.path.join(model_path, "rolling_chkpnt.pkl")
    base_args = list(train_args) + ["--checkpoint_every", str(args.checkpoint_every)]

    restarts = 0
    while True:
        cur_args = list(base_args)
        if restarts > 0 and os.path.exists(rolling):
            cur_args += ["--start_checkpoint", rolling]
        with open(log_path, "ab", buffering=0) as log_f:
            log_f.write(
                f"\n===== supervisor: attempt {restarts + 1} =====\n".encode()
            )
            proc = run_once(cur_args, log_f)
            deadline = time.time() + args.startup_grace
            last_size = os.path.getsize(log_path)
            last_ckpt = os.path.getmtime(rolling) if os.path.exists(rolling) else 0.0
            while True:
                rc = proc.poll()
                if rc is not None:
                    break
                # progress = log growth OR a fresh rolling checkpoint (the
                # checkpoint lands every --checkpoint_every iters, so quiet
                # runs — e.g. full_eval's — don't read as stalls between
                # their sparse test-iteration prints)
                size = os.path.getsize(log_path)
                ckpt = os.path.getmtime(rolling) if os.path.exists(rolling) else 0.0
                if size != last_size or ckpt != last_ckpt:
                    last_size = size
                    last_ckpt = ckpt
                    deadline = time.time() + args.stall_timeout
                if time.time() > deadline:
                    print(
                        f"supervisor: stall ({args.stall_timeout:.0f}s silent) — "
                        f"killing pid {proc.pid}",
                        flush=True,
                    )
                    log_f.write(b"\n===== supervisor: STALL, killing =====\n")
                    kill_group(proc)
                    rc = None
                    break
                time.sleep(5.0)
        if rc == 0:
            print("supervisor: training completed", flush=True)
            return 0
        restarts += 1
        if restarts > args.max_restarts:
            print("supervisor: max restarts exhausted", file=sys.stderr)
            return 1
        why = f"exit {rc}" if rc is not None else "stall"
        resume = rolling if os.path.exists(rolling) else "scratch"
        print(f"supervisor: restart {restarts} ({why}; resume from {resume})", flush=True)
        time.sleep(10.0)  # let the tunnel/device lock clear


if __name__ == "__main__":
    sys.exit(main())
