"""CLI-level tests (run the actual tool mains on the CPU mesh)."""

import os

import numpy as np
import pytest

CKPT = ("/root/reference/cpu/checkpoints/AlexNet_aug_1e-3/"
        "iter_395000_train_0.918_valid_0.913.model")
IMAGES = "/root/reference/datasets/images"

needs_reference = pytest.mark.skipif(not os.path.exists(CKPT),
                                     reason="reference unavailable")


@needs_reference
def test_infer_cli(capsys):
    from cnn_tpu.tools import infer
    rc = infer.main([f"{IMAGES}/dog.jpg", f"{IMAGES}/panda.jpg",
                     "--checkpoint", CKPT])
    assert rc == 0
    out = capsys.readouterr().out
    assert "classification: dog" in out
    assert "classification: panda" in out


@needs_reference
def test_infer_cli_unreadable_image(capsys):
    from cnn_tpu.tools import infer
    rc = infer.main(["/nonexistent.jpg", "--checkpoint", CKPT])
    assert rc == 0  # graceful skip, like inference.cpp:56-59
    assert "Failed to read image file" in capsys.readouterr().out


@needs_reference
def test_gradcam_cli(tmp_path, capsys):
    from cnn_tpu.tools import gradcam
    rc = gradcam.main([f"{IMAGES}/dog.jpg", "--checkpoint", CKPT,
                       "--output-dir", str(tmp_path), "--mode", "reference"])
    assert rc == 0
    assert os.path.exists(os.path.join(tmp_path, "0.png"))


@needs_reference
def test_convert_cli_roundtrip(tmp_path):
    from cnn_tpu.tools import convert
    src = ("/root/reference/cpu/checkpoints/AlexNet/"
           "iter_5000_train_0.761_valid_0.803.model")
    ck = os.path.join(tmp_path, "x.ckpt")
    back = os.path.join(tmp_path, "x.model")
    assert convert.main([src, ck]) == 0
    assert convert.main([ck, back]) == 0
    a = np.fromfile(src, "<f4")
    b = np.fromfile(back, "<f4")
    np.testing.assert_array_equal(a, b)


def test_train_cli_smoke(tmp_path, capsys):
    """Few tiny iterations end-to-end through the real main()."""
    from cnn_tpu.tools import train
    rc = train.main(["--total-iters", "4", "--valid-iters", "2",
                     "--save-iters", "2", "--train-batch-size", "4",
                     "--valid-batch-size", "32",
                     "--checkpoint-dir", str(tmp_path),
                     "--augment", "false", "--cache", "true",
                     "--num-workers", "2"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "training done!" in out
    assert "confusion matrix" in out
    assert os.path.exists(os.path.join(tmp_path, "history.jsonl"))


def test_plot_cli(tmp_path, capsys):
    from cnn_tpu.tools import plot
    from cnn_tpu.utils.history import HistoryWriter
    hist = os.path.join(tmp_path, "h.jsonl")
    w = HistoryWriter(hist)
    for i in range(3):
        w.log(step=i, loss=1.0 - 0.1 * i, accuracy=0.3 * i)
    w.close()
    rc = plot.main([hist, "--out", os.path.join(tmp_path, "h.png"),
                    "--keys", "loss,accuracy"])
    assert rc == 0


@needs_reference
def test_make_gif_cli(tmp_path, capsys):
    import cv2
    from cnn_tpu.tools import make_gif
    for i in range(3):
        cv2.imwrite(os.path.join(tmp_path, f"{i}.png"),
                    np.full((10, 10, 3), i * 80, np.uint8))
    out_gif = os.path.join(tmp_path, "out.gif")
    rc = make_gif.main([str(tmp_path), out_gif, "--fps", "2"])
    assert rc == 0
    assert os.path.getsize(out_gif) > 0


def test_train_cli_auto_resume(tmp_path, capsys):
    """Preemption recovery: second invocation resumes from the newest ckpt."""
    from cnn_tpu.tools import train
    args = ["--train-batch-size", "4", "--valid-batch-size", "32",
            "--checkpoint-dir", str(tmp_path), "--augment", "false",
            "--cache", "true", "--num-workers", "2",
            "--valid-iters", "2", "--save-iters", "2"]
    assert train.main(args + ["--total-iters", "2"]) == 0
    capsys.readouterr()
    # start_iters derives from the restored step (no explicit flag needed)
    assert train.main(args + ["--total-iters", "4", "--resume", "auto"]) == 0
    out = capsys.readouterr().out
    assert "resumed from" in out and "at step 2" in out
    assert "[batch 3/4]" in out or "[batch 4/4]" in out  # continued, not restarted
    # the post-resume checkpoint carries the continued step count
    names = sorted(os.listdir(tmp_path))
    assert any(n.startswith("iter_4_") for n in names), names


def test_resnet_family_through_clis(tmp_path, capsys):
    """Train -> infer -> gradcam with --model resnet10: the third family is
    fully usable from the same CLIs."""
    from cnn_tpu.tools import gradcam, infer, train

    ck = str(tmp_path / "ck")
    rc = train.main(["--name", "resnet10", "--total-iters", "4",
                     "--valid-iters", "4", "--save-iters", "4",
                     "--train-batch-size", "8", "--valid-batch-size", "64",
                     "--image-size", "64", "--num-workers", "2",
                     "--checkpoint-dir", ck])
    assert rc == 0
    ckpt = next(str(p) for p in os.listdir(ck) if p.endswith(".ckpt"))
    ckpt = os.path.join(ck, ckpt)

    rc = infer.main([f"{IMAGES}/dog.jpg", "--checkpoint", ckpt,
                     "--model", "resnet10", "--image-size", "64"])
    assert rc == 0
    assert "classification:" in capsys.readouterr().out

    rc = gradcam.main([f"{IMAGES}/dog.jpg", "--checkpoint", ckpt,
                       "--model", "resnet10", "--layer", "block_4",
                       "--image-size", "64", "--output-dir", str(tmp_path)])
    assert rc == 0
    assert os.path.exists(os.path.join(tmp_path, "0.png"))


@needs_reference
def test_serve_cli_batching_and_stream(capsys):
    from cnn_tpu.tools import serve
    args = [f"{IMAGES}/dog.jpg", f"{IMAGES}/panda.jpg", "/nonexistent.jpg",
            "--checkpoint", CKPT, "--max-batch", "4",
            "--batch-timeout-ms", "5"]
    assert serve.main(args) == 0
    out = capsys.readouterr().out
    assert "dog.jpg\tdog\t" in out and "panda.jpg\tpanda\t" in out
    assert "ERROR\tunreadable" in out

    assert serve.main(args + ["--stream"]) == 0
    out = capsys.readouterr().out
    assert "dog.jpg\tdog\t" in out


def test_train_cli_device_dataset_steps_per_call(tmp_path, capsys):
    """--device-dataset with --steps-per-call: chunked dispatch trains,
    validates on the chunk boundary, and checkpoints the right step."""
    from cnn_tpu.tools import train
    rc = train.main(["--total-iters", "4", "--valid-iters", "4",
                     "--save-iters", "4", "--train-batch-size", "8",
                     "--valid-batch-size", "64",
                     "--checkpoint-dir", str(tmp_path),
                     "--device-dataset", "true", "--canvas-size", "64",
                     "--image-size", "61", "--steps-per-call", "2",
                     "--num-workers", "2"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "training done!" in out
    names = sorted(os.listdir(tmp_path))
    assert any(n.startswith("iter_4_") for n in names), names


def test_train_cli_distill(tmp_path, capsys):
    """--distill-from end to end: a tiny BN teacher checkpoint feeds a
    BN-free student's compiled step (exercises the structural BN
    auto-detect on the teacher tree — regression: tree_has_bn was
    referenced without an import)."""
    from cnn_tpu.tools import train
    base = ["--image-size", "61", "--total-iters", "2", "--valid-iters", "2",
            "--save-iters", "2", "--train-batch-size", "4",
            "--valid-batch-size", "64", "--augment", "false",
            "--cache", "true", "--num-workers", "2"]
    tdir = tmp_path / "teacher"
    assert train.main(base + ["--batch-norm", "true",
                              "--checkpoint-dir", str(tdir)]) == 0
    capsys.readouterr()
    ckpt = [n for n in os.listdir(tdir) if n.endswith(".ckpt")][0]
    rc = train.main(base + ["--checkpoint-dir", str(tmp_path / "student"),
                            "--distill-from", str(tdir / ckpt),
                            "--distill-temp", "2.0",
                            "--distill-alpha", "0.5"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "distilling from 1 teacher(s)" in out
    assert "training done!" in out


@needs_reference
def test_serve_cli_int8(capsys):
    """--int8 serves the quantized graph with the same classifications."""
    from cnn_tpu.tools import serve
    args = [f"{IMAGES}/dog.jpg", f"{IMAGES}/panda.jpg", f"{IMAGES}/bird.jpg",
            "--checkpoint", CKPT, "--max-batch", "4", "--int8"]
    assert serve.main(args) == 0
    out = capsys.readouterr().out
    assert "dog.jpg\tdog\t" in out
    assert "panda.jpg\tpanda\t" in out
    assert "bird.jpg\tbird\t" in out


def test_train_cli_pipeline_stages(tmp_path, capsys):
    """--pipeline-stages: the GPipe path end to end from the CLI (PP4 over
    the virtual mesh, host loader, validation with M=1)."""
    from cnn_tpu.tools import train
    rc = train.main(["--name", "pipecnn", "--batch-norm", "true",
                     "--image-size", "32", "--total-iters", "4",
                     "--valid-iters", "4", "--save-iters", "4",
                     "--train-batch-size", "8", "--valid-batch-size", "64",
                     "--pipeline-stages", "4", "--microbatches", "2",
                     "--data-parallel", "2",
                     "--checkpoint-dir", str(tmp_path),
                     "--augment", "false", "--cache", "true",
                     "--num-workers", "2"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "pipeline mesh: {'data': 2, 'stage': 4}" in out
    assert "training done!" in out


def test_train_cli_pipeline_1f1b(tmp_path, capsys):
    """--pipeline-schedule 1f1b: the memory-bounded schedule from the CLI."""
    from cnn_tpu.tools import train
    rc = train.main(["--name", "pipecnn", "--batch-norm", "true",
                     "--image-size", "32", "--total-iters", "2",
                     "--valid-iters", "2", "--save-iters", "2",
                     "--train-batch-size", "8", "--valid-batch-size", "64",
                     "--pipeline-stages", "4", "--microbatches", "2",
                     "--data-parallel", "2",
                     "--pipeline-schedule", "1f1b",
                     "--checkpoint-dir", str(tmp_path),
                     "--augment", "false", "--cache", "true",
                     "--num-workers", "2"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "schedule 1f1b" in out
    assert "training done!" in out


def test_train_cli_pipeline_device_dataset(tmp_path, capsys):
    """The round-4 composition from the CLI: --pipeline-stages x
    --device-dataset x on-device augmentation x --steps-per-call x
    --grad-accum x --ema x --tta — the fastest input path feeding the
    deepest-model path (VERDICT r3 item 1), all previously assert-fenced."""
    from cnn_tpu.tools import train
    rc = train.main(["--name", "pipecnn", "--batch-norm", "true",
                     "--image-size", "32", "--canvas-size", "40",
                     "--total-iters", "4",
                     "--valid-iters", "4", "--save-iters", "4",
                     "--train-batch-size", "16", "--valid-batch-size", "64",
                     "--pipeline-stages", "2", "--microbatches", "2",
                     "--data-parallel", "2", "--grad-accum", "2",
                     "--steps-per-call", "2", "--ema", "0.99",
                     "--tta", "hflip",
                     "--device-dataset", "true", "--augment", "true",
                     "--augment-mode", "fast", "--sample-mode", "epoch",
                     "--checkpoint-dir", str(tmp_path),
                     "--num-workers", "2"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "pipeline mesh: {'data': 2, 'stage': 2}" in out
    assert "training done!" in out


def test_train_cli_expert_parallel(tmp_path, capsys):
    """--expert-parallel: MoE experts shard over the 'expert' mesh axis."""
    from cnn_tpu.tools import train
    rc = train.main(["--name", "moecnn", "--image-size", "32",
                     "--total-iters", "4", "--valid-iters", "4",
                     "--save-iters", "4", "--train-batch-size", "8",
                     "--valid-batch-size", "64",
                     "--expert-parallel", "4", "--data-parallel", "2",
                     "--checkpoint-dir", str(tmp_path),
                     "--augment", "false", "--cache", "true",
                     "--num-workers", "2"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "'expert': 4" in out
    assert "training done!" in out


def test_train_cli_compile_cache(tmp_path, capsys):
    """--compile-cache populates a persistent XLA compilation cache."""
    from cnn_tpu.tools import train
    cache = tmp_path / "xla_cache"
    rc = train.main(["--total-iters", "2", "--valid-iters", "2",
                     "--save-iters", "2", "--train-batch-size", "4",
                     "--valid-batch-size", "32", "--image-size", "64",
                     "--checkpoint-dir", str(tmp_path / "ck"),
                     "--compile-cache", str(cache),
                     "--augment", "false", "--cache", "true",
                     "--num-workers", "2"])
    assert rc == 0
    assert any(cache.iterdir()), "compilation cache is empty"


def test_moecnn_family_through_clis(tmp_path, capsys):
    """Infer + Grad-CAM on the committed MoE checkpoint: the sixth family
    is fully usable from the same tools."""
    import glob

    from cnn_tpu.tools import gradcam, infer

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ck = sorted(glob.glob(os.path.join(repo, "checkpoints/moecnn/*.ckpt")))
    if not ck:
        pytest.skip("no moecnn checkpoint committed")
    img = f"{IMAGES}/panda.jpg"
    assert infer.main([img, "--model", "moecnn", "--batch-norm",
                       "--checkpoint", ck[-1]]) == 0
    out = capsys.readouterr().out
    assert "panda" in out

    rc = gradcam.main([img, "--model", "moecnn", "--batch-norm",
                       "--checkpoint", ck[-1], "--layer", "stem_relu4",
                       "--output-dir", str(tmp_path)])
    assert rc == 0
    assert os.path.exists(os.path.join(tmp_path, "0.png"))


def test_cpu_env_var_wins_in_subprocess():
    """The environment's sitecustomize force-sets jax_platforms='axon,cpu'
    at interpreter startup, silently overriding the JAX_PLATFORMS env var
    in every spawned CLI; cnn_tpu/__init__ re-asserts a CPU-forcing env var
    so test-launched subprocesses never touch the TPU backend (whose init
    blocks indefinitely while the device is busy or the tunnel is down)."""
    import subprocess
    import sys

    env = dict(os.environ, JAX_PLATFORMS="cpu")
    out = subprocess.run(
        [sys.executable, "-c",
         "import cnn_tpu, jax; print('backend=' + jax.default_backend())"],
        env=env, capture_output=True, text=True, timeout=120)
    assert out.returncode == 0, out.stderr[-2000:]
    assert "backend=cpu" in out.stdout
