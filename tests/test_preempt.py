"""Preemption-safe training: SIGTERM/SIGINT (or the injected
--preempt_after fault) checkpoints mid-epoch and exits cleanly;
`--resume auto` relaunches from the newest checkpoint, restarting the
interrupted epoch — the failure-recovery story the reference lacks
(train.py dies on SIGTERM; utils/aws/resume.py restarts from the last
epoch checkpoint only, losing all mid-epoch work).
"""

import json
import os

import numpy as np
import pytest
import yaml

import jax

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def tiny_dataset(tmp_path_factory):
    import cv2

    root = tmp_path_factory.mktemp("ds")
    img_dir = root / "images" / "train"
    lab_dir = root / "labels" / "train"
    img_dir.mkdir(parents=True)
    lab_dir.mkdir(parents=True)
    rng = np.random.default_rng(0)
    for i in range(8):
        img = rng.integers(0, 255, (96, 96, 3), np.uint8)
        cx, cy = rng.uniform(0.3, 0.7, 2)
        w, h = rng.uniform(0.2, 0.4, 2)
        cv2.rectangle(
            img,
            (int((cx - w / 2) * 96), int((cy - h / 2) * 96)),
            (int((cx + w / 2) * 96), int((cy + h / 2) * 96)),
            (255, 255, 255), -1,
        )
        cv2.imwrite(str(img_dir / f"{i:03d}.jpg"), img)
        with open(lab_dir / f"{i:03d}.txt", "w") as f:
            f.write(f"0 {cx:.4f} {cy:.4f} {w:.4f} {h:.4f}\n")
    return str(img_dir)


def _common(tiny_dataset, tmp_path):
    data_yaml = tmp_path / "data.yaml"
    yaml.safe_dump({"train": tiny_dataset, "nc": 2}, open(data_yaml, "w"))
    return [
        "--model", "yolov7-tiny",
        "--data", str(data_yaml),
        "--img", "96",
        "--batch", str(len(jax.devices())),
        "--max_labels", "16",
        "--ckpt_dir", str(tmp_path / "runs"),
        "--eval_every", "0",
    ]


def test_preempt_and_auto_resume(tiny_dataset, tmp_path):
    from yolov7_tracker_tpu.cli import train as train_cli

    common = _common(tiny_dataset, tmp_path)

    run1 = train_cli.main(common + ["--epochs", "2",
                                    "--preempt_after", "1"])
    pre = json.load(open(os.path.join(run1, "preempted.json")))
    assert pre["epoch"] == 0 and pre["step"] >= 1
    meta = json.load(open(os.path.join(pre["ckpt"], "meta.json")))
    # epoch-1 in meta => resume restarts the interrupted epoch
    assert meta["preempted"] and meta["epoch"] == -1
    assert not os.path.isfile(os.path.join(run1, "last.msgpack"))

    run2 = train_cli.main(common + ["--epochs", "2", "--resume", "auto"])
    assert not os.path.isfile(os.path.join(run2, "preempted.json"))
    assert os.path.isfile(os.path.join(run2, "last.msgpack"))
    # both epochs completed after the restart
    steps = sorted(d for d in os.listdir(run2) if d.startswith("step_"))
    last_meta = json.load(open(os.path.join(
        run2, steps[-1], "meta.json")))
    assert last_meta["epoch"] == 1


def test_resume_auto_fresh_start(tiny_dataset, tmp_path):
    """--resume auto with no prior checkpoint starts a fresh run."""
    from yolov7_tracker_tpu.cli import train as train_cli

    run = train_cli.main(
        _common(tiny_dataset, tmp_path)
        + ["--epochs", "1", "--resume", "auto"])
    assert os.path.isfile(os.path.join(run, "last.msgpack"))


def test_resume_auto_skips_incompatible_ckpts(tmp_path):
    """--resume auto filters checkpoints by model/img/nc fingerprint: a
    shared ckpt_dir holding another model's runs must not feed the
    supervisor's `until ... --resume auto` loop an orbax tree mismatch
    (which would crash-loop forever)."""
    import time

    from yolov7_tracker_tpu.cli.train import _find_latest_ckpt

    def fake_ckpt(run, step, meta):
        d = tmp_path / run / f"step_{step}"
        d.mkdir(parents=True)
        with open(d / "meta.json", "w") as f:
            json.dump(meta, f)
        return str(d)

    want_fp = {"model": "yolov7-tiny", "img": 160, "nc": 1}
    older = fake_ckpt("run_a", 10, {"epoch": 0, **want_fp})
    time.sleep(0.01)
    # newest by mtime, but from a different model config
    fake_ckpt("run_b", 99,
              {"epoch": 5, "model": "yolov7-w6", "img": 1088, "nc": 80})

    assert _find_latest_ckpt(str(tmp_path), want_fp) == older
    # no fingerprint: legacy behavior, newest wins
    assert _find_latest_ckpt(str(tmp_path)).endswith("step_99")
    # a legacy checkpoint without fingerprint keys stays eligible
    time.sleep(0.01)
    legacy = fake_ckpt("run_c", 120, {"epoch": 7})
    assert _find_latest_ckpt(str(tmp_path), want_fp) == legacy


def test_sigterm_checkpoints_and_exits(tiny_dataset, tmp_path):
    """A real SIGTERM mid-run lands in the installed handler and takes
    the same checkpoint-and-exit path as the injected fault."""
    import signal
    import threading

    from yolov7_tracker_tpu.cli import train as train_cli

    # fire while the first epoch is compiling/stepping; the flag is
    # checked after each optimizer step, so delivery any time before
    # the final step preempts the run
    timer = threading.Timer(
        5.0, lambda: os.kill(os.getpid(), signal.SIGTERM))
    timer.start()
    try:
        run = train_cli.main(
            _common(tiny_dataset, tmp_path) + ["--epochs", "50"])
    finally:
        timer.cancel()
    assert os.path.isfile(os.path.join(run, "preempted.json"))
    # handler was restored
    assert signal.getsignal(signal.SIGTERM) == signal.SIG_DFL


def test_resume_auto_skips_orbax_tmp_dirs(tmp_path):
    """A hard kill (SIGKILL/OOM) mid-save leaves orbax's atomic-rename
    staging dir behind (step_N.orbax-checkpoint-tmp-*). It has no
    meta.json, so without an explicit name guard it would be selected
    as the newest 'legacy' checkpoint and crash-loop every
    `--resume auto` relaunch on the partial write."""
    import time

    from yolov7_tracker_tpu.cli.train import _find_latest_ckpt

    fp = {"model": "yolov7-tiny", "img": 160, "nc": 1}
    good = tmp_path / "run_a" / "step_10"
    good.mkdir(parents=True)
    with open(good / "meta.json", "w") as f:
        json.dump({"epoch": 1, **fp}, f)
    time.sleep(0.01)
    # newest by mtime: a partial save the resume scan must never pick
    partial = tmp_path / "run_a" / "step_42.orbax-checkpoint-tmp-1755"
    partial.mkdir()
    (partial / "half_written").write_bytes(b"\x00")

    assert _find_latest_ckpt(str(tmp_path), fp) == str(good)
    assert _find_latest_ckpt(str(tmp_path)) == str(good)
