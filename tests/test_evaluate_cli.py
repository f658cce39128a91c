"""Eval-only CLI (tools/evaluate.py): checkpoint -> split metrics, --tta,
--init-from warm-start through the train CLI.

Superset: the reference's test pass is welded to training
(/root/reference/cpu/src/cnn.cpp:100-110); there is no eval-only entry.
"""

import os

import pytest


@pytest.fixture(scope="module")
def tiny_ckpt(tmp_path_factory):
    """Train 4 tiny iterations to produce a real .ckpt via the train CLI."""
    from cnn_tpu.tools import train
    d = str(tmp_path_factory.mktemp("eval_cli"))
    rc = train.main(["--total-iters", "4", "--valid-iters", "4",
                     "--save-iters", "4", "--train-batch-size", "4",
                     "--valid-batch-size", "32", "--image-size", "64",
                     "--checkpoint-dir", d, "--augment", "false"])
    assert rc == 0
    cks = [f for f in os.listdir(d) if f.endswith(".ckpt")]
    assert cks
    return os.path.join(d, cks[0])


def test_evaluate_cli(tiny_ckpt, capsys):
    from cnn_tpu.tools import evaluate
    rc = evaluate.main(["--resume", tiny_ckpt, "--split", "valid",
                        "--image-size", "64", "--valid-batch-size", "64"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "Valid===>" in out
    assert "confusion matrix" in out
    assert "Test===>" not in out


def test_evaluate_cli_tta(tiny_ckpt, capsys):
    from cnn_tpu.tools import evaluate
    rc = evaluate.main(["--resume", tiny_ckpt, "--split", "test",
                        "--tta", "hflip",
                        "--image-size", "64", "--valid-batch-size", "64"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "test-time augmentation: hflip" in out
    assert "Test===>" in out


def test_evaluate_cli_missing_checkpoint(capsys):
    from cnn_tpu.tools import evaluate
    assert evaluate.main(["--resume", "/nonexistent.ckpt"]) == 2


def test_train_cli_init_from(tiny_ckpt, tmp_path, capsys):
    """--init-from warm-starts a DIFFERENT head (4 classes) from a 3-class
    checkpoint through the real train main()."""
    from cnn_tpu.tools import train
    rc = train.main(["--total-iters", "2", "--valid-iters", "2",
                     "--save-iters", "2", "--train-batch-size", "4",
                     "--valid-batch-size", "32", "--image-size", "64",
                     "--num-classes", "4",
                     "--categories", "dog,panda,bird,cat",
                     "--init-from", tiny_ckpt,
                     "--checkpoint-dir", str(tmp_path),
                     "--augment", "false"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "warm start from" in out
    assert "kept fresh" in out and "linear_1" in out


def test_evaluate_cli_ensemble(tiny_ckpt, capsys):
    """Two-member ensemble (same ckpt twice): runs, prints, and agrees
    with the single-model eval (mean of identical prob sets)."""
    from cnn_tpu.tools import evaluate
    rc = evaluate.main(["--resume", tiny_ckpt, "--split", "valid",
                        "--image-size", "64", "--valid-batch-size", "64"])
    assert rc == 0
    single = capsys.readouterr().out
    rc = evaluate.main(["--ensemble",
                        f"alexnet:{tiny_ckpt},alexnet:{tiny_ckpt}",
                        "--split", "valid",
                        "--image-size", "64", "--valid-batch-size", "64"])
    assert rc == 0
    ens = capsys.readouterr().out
    assert "ensemble of 2 models" in ens
    line = [l for l in single.splitlines() if "Valid===>" in l][0]
    assert line in ens  # identical members -> identical metrics


def test_evaluate_cli_ensemble_shaped_member(tiny_ckpt, tmp_path, capsys):
    """Shaped member spec (family@key=val:ckpt) — the same syntax the train
    CLI's --distill-model uses, so a distillation teacher ensemble can be
    evaluated directly."""
    from cnn_tpu.tools import train, evaluate
    d = str(tmp_path / "pipecnn_tiny")
    rc = train.main(["--name", "pipecnn", "--width", "8", "--n-blocks", "1",
                     "--total-iters", "2", "--valid-iters", "2",
                     "--save-iters", "2", "--train-batch-size", "4",
                     "--valid-batch-size", "32", "--image-size", "64",
                     "--checkpoint-dir", d, "--augment", "false"])
    assert rc == 0
    capsys.readouterr()
    ck = [f for f in os.listdir(d) if f.endswith(".ckpt")][0]
    rc = evaluate.main(["--ensemble",
                        f"alexnet:{tiny_ckpt},"
                        f"pipecnn@width=8@n_blocks=1:{os.path.join(d, ck)}",
                        "--split", "valid",
                        "--image-size", "64", "--valid-batch-size", "64"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "ensemble of 2 models" in out and "Valid===>" in out
