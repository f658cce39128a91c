"""Preemption-safe training: SIGTERM -> clean checkpoint -> resume.

TPU pools reclaim nodes with SIGTERM; the train CLI must convert that
into a checkpoint + exit 0 (not a mid-step kill), and ``--resume auto``
must continue from it. The reference has no recovery story at all
(SURVEY.md §5.3); this is the superset's test.
"""

import glob
import os
import signal
import subprocess
import sys
import time

import pytest


@pytest.mark.skipif(not os.path.isdir("/root/reference/datasets/animals"),
                    reason="dataset unavailable")
def test_sigterm_checkpoints_and_resume_continues(tmp_path):
    ckdir = str(tmp_path)
    args = [sys.executable, "-m", "cnn_tpu.tools.train",
            "--image-size", "64", "--train-batch-size", "8",
            "--valid-batch-size", "32", "--total-iters", "100000",
            "--valid-iters", "50000", "--save-iters", "50000",
            "--augment", "false", "--cache", "true", "--num-workers", "2",
            "--checkpoint-dir", ckdir]
    proc = subprocess.Popen(args, stdout=subprocess.PIPE,
                            stderr=subprocess.STDOUT, text=True,
                            cwd=os.path.dirname(os.path.dirname(
                                os.path.abspath(__file__))))
    try:
        # wait for the dataset banner (process is up), then give it a
        # moment to enter the loop; a signal during compile still stops
        # cleanly at the first completed iteration. Poll with a select
        # timeout: a bare readline would block forever on a child that
        # prints nothing at all (seen when a backend-init hang precedes
        # the first print), and the deadline would never fire.
        import selectors
        sel = selectors.DefaultSelector()
        sel.register(proc.stdout, selectors.EVENT_READ)
        deadline = time.monotonic() + 180
        started = False
        while time.monotonic() < deadline and not started:
            if sel.select(timeout=5.0):
                line = proc.stdout.readline()
                if not line:  # EOF: child exited early
                    break
                if "valid  :" in line:
                    started = True
        sel.unregister(proc.stdout)
        assert started, "train CLI never started"
        time.sleep(10)
        proc.send_signal(signal.SIGTERM)
        out = proc.stdout.read()
        rc = proc.wait(timeout=180)
    finally:
        if proc.poll() is None:
            proc.kill()
    assert rc == 0, out[-2000:]
    assert "preemption signal: checkpointed step" in out, out[-2000:]

    cks = glob.glob(os.path.join(ckdir, "preempt_iter_*.ckpt"))
    assert len(cks) == 1, cks
    saved_step = int(os.path.basename(cks[0]).split("_")[2].split(".")[0])

    # relaunch with --resume auto: continues AFTER the saved step
    from cnn_tpu.tools import train
    rc = train.main(["--image-size", "64", "--train-batch-size", "8",
                     "--valid-batch-size", "32",
                     "--total-iters", str(saved_step + 2),
                     "--valid-iters", str(saved_step + 2),
                     "--save-iters", str(saved_step + 2),
                     "--augment", "false", "--cache", "true",
                     "--num-workers", "2",
                     "--resume", "auto", "--checkpoint-dir", ckdir])
    assert rc == 0
    # the resumed run saved its own checkpoint past the preemption point
    assert glob.glob(os.path.join(ckdir, f"iter_{saved_step + 2}_*.ckpt"))
