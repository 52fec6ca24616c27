"""Generic stall-watchdog runner for TPU jobs in this container.

The single-chip tunnel intermittently hangs (blocked on network, ~0 CPU,
no output) — sometimes for many minutes at a stretch. Any long TPU run
launched here should go through this supervisor: it watches the child's
combined stdout/stderr and kills + retries when the stream goes silent
longer than ``--stall`` seconds. Children must therefore be IDEMPOTENT or
resumable (the Experiment driver auto-resumes from its checkpoints;
scripts/ablate_search.py skips completed legs).

    python scripts/supervise.py --stall 300 --attempts 6 -- \
        python scripts/ablate_search.py --config configs/jpeg_hard.yml ...
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys
import time


def _kill_tree(child: subprocess.Popen) -> None:
    """SIGKILL the child's whole process group, not just the child.

    The documented usage wraps a shell (`-- bash scripts/...sh`) that spawns
    python grandchildren; killing only the direct child would leave a hung
    cli.train holding the TPU tunnel and its log_dir, and the retry would
    then start a SECOND trainer writing the same checkpoint dir. The child
    is launched with ``start_new_session=True`` so its pgid covers the whole
    tree and never includes this supervisor."""
    import signal

    try:
        os.killpg(child.pid, signal.SIGKILL)
    except (ProcessLookupError, PermissionError):
        child.kill()
    child.wait()


def supervise(cmd: list, stall_s: float, attempts: int, reset=None) -> int:
    """Run ``cmd`` with a stall watchdog, retrying up to ``attempts`` times.

    ``reset``, if given, is called before every attempt — for children that
    are NOT resumable and need a fresh workdir per try
    (scripts/budget_trajectory.py deletes the partial trajectory)."""
    for attempt in range(1, attempts + 1):
        if reset is not None:
            reset()
        child = subprocess.Popen(
            cmd, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            env=dict(os.environ), start_new_session=True,
        )
        os.set_blocking(child.stdout.fileno(), False)
        last = time.monotonic()
        while True:
            rc = child.poll()
            chunk = child.stdout.read()
            if chunk:
                sys.stdout.buffer.write(chunk)
                sys.stdout.flush()
                last = time.monotonic()
            if rc is not None:
                break
            if time.monotonic() - last > stall_s:
                print(f"[supervise] attempt {attempt} stalled "
                      f">{stall_s:.0f}s; killing and retrying", flush=True)
                _kill_tree(child)
                rc = None
                break
            time.sleep(1.0)
        if rc == 0:
            return 0
        if rc is not None:
            print(f"[supervise] attempt {attempt} exited rc={rc}", flush=True)
    return 1


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--stall", type=float, default=300.0)
    p.add_argument("--attempts", type=int, default=6)
    p.add_argument("cmd", nargs=argparse.REMAINDER,
                   help="-- command to run")
    args = p.parse_args(argv)
    cmd = args.cmd
    if cmd and cmd[0] == "--":
        cmd = cmd[1:]
    if not cmd:
        p.error("no command given")
    return supervise(cmd, args.stall, args.attempts)


if __name__ == "__main__":
    raise SystemExit(main())
