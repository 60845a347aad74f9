"""Training smoke test: synthetic YOLO dataset -> 2 steps of the DP train
step on the virtual mesh; loss is finite and decreases-ish; checkpoint
save/load roundtrips."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.slow  # three multi-minute XLA train-step compiles


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


def test_dataset_batches(tiny_dataset):
    from yolov7_tracker_tpu.train.datasets import YoloDataset

    ds = YoloDataset(tiny_dataset, img_size=96, max_labels=16)
    imgs, tgts, masks = next(ds.batches(4))
    assert imgs.shape == (4, 96, 96, 3)
    assert tgts.shape == (4, 16, 5)
    assert masks.any()
    # normalized boxes
    assert (tgts[masks][:, 1:] >= 0).all() and (tgts[masks][:, 1:] <= 1).all()


def test_train_steps_and_checkpoint(tiny_dataset, tmp_path):
    from yolov7_tracker_tpu.models import zoo
    from yolov7_tracker_tpu.parallel.mesh import data_mesh, shard_batch
    from yolov7_tracker_tpu.parallel.train_step import (
        OptConfig, make_train_state, make_train_step,
    )
    from yolov7_tracker_tpu.train.datasets import YoloDataset
    from yolov7_tracker_tpu.utils import checkpoint

    spec = zoo.get_spec("yolov7-tiny", nc=2)
    mesh = data_mesh()
    n_dev = len(jax.devices())
    cfg = OptConfig(epochs=2, steps_per_epoch=2, batch_size=n_dev)
    state = make_train_state(spec, img_size=96, opt_cfg=cfg, mesh=mesh)
    step = make_train_step(spec, mesh, img_size=96, opt_cfg=cfg)
    ds = YoloDataset(tiny_dataset, img_size=96, max_labels=16, augment=False)

    losses = []
    for i, (imgs, tgts, masks) in enumerate(ds.batches(n_dev, epochs=2)):
        batch = shard_batch(
            mesh, (imgs.astype(np.float32) / 255.0, tgts, masks)
        )
        state, metrics = step(state, *batch)
        losses.append(float(metrics["loss"]))
        if i >= 2:
            break
    assert all(np.isfinite(l) for l in losses), losses
    assert int(state.step) == len(losses)
    # the fresh state is committed to the mesh's replicated sharding
    # (make_train_state(mesh=...)): without that, the SECOND call sees
    # NamedSharding inputs where the first saw SingleDeviceSharding and
    # jit silently retraces + recompiles the whole step (a duplicate
    # multi-minute compile for w6-class models)
    if hasattr(step, "_cache_size"):
        assert step._cache_size() == 1, (
            f"train step retraced: {step._cache_size()} traces"
        )

    # variables roundtrip
    path = checkpoint.save_variables(
        str(tmp_path / "w.msgpack"),
        {"params": state.ema_params, "batch_stats": state.batch_stats},
    )
    loaded = checkpoint.load_variables(path)
    leaves_a = jax.tree.leaves(loaded)
    leaves_b = jax.tree.leaves(
        jax.device_get({"params": state.ema_params,
                        "batch_stats": state.batch_stats})
    )
    assert len(leaves_a) == len(leaves_b)
    np.testing.assert_allclose(
        np.asarray(leaves_a[0]), np.asarray(leaves_b[0]), rtol=1e-6
    )

def test_remat_step_matches(tiny_dataset):
    """jax.checkpoint rematerialization changes memory, not math: one
    remat step from the same state produces the same loss/params."""
    from yolov7_tracker_tpu.models import zoo
    from yolov7_tracker_tpu.parallel.mesh import data_mesh, shard_batch
    from yolov7_tracker_tpu.parallel.train_step import (
        OptConfig, make_train_state, make_train_step,
    )
    from yolov7_tracker_tpu.train.datasets import YoloDataset

    spec = zoo.get_spec("yolov7-tiny", nc=2)
    mesh = data_mesh()
    n_dev = len(jax.devices())
    cfg = OptConfig(epochs=1, steps_per_epoch=1, batch_size=n_dev)
    ds = YoloDataset(tiny_dataset, img_size=96, max_labels=16, augment=False)
    imgs, tgts, masks = next(ds.batches(n_dev))
    batch = shard_batch(mesh, (imgs.astype(np.float32) / 255.0, tgts, masks))

    outs = {}
    for remat in (False, True):
        state = make_train_state(spec, img_size=96, opt_cfg=cfg)
        step = make_train_step(spec, mesh, img_size=96, opt_cfg=cfg,
                               remat=remat)
        new_state, metrics = step(state, *batch)
        outs[remat] = (float(metrics["loss"]),
                       jax.tree.leaves(jax.device_get(new_state.params))[0])
    np.testing.assert_allclose(outs[False][0], outs[True][0], rtol=1e-5)
    np.testing.assert_allclose(outs[False][1], outs[True][1],
                               rtol=1e-5, atol=1e-6)

def test_rect_batches(tmp_path):
    """Rect val batches: aspect-sorted, stride-quantized canvases, labels
    normalized to the actual canvas."""
    import cv2

    from yolov7_tracker_tpu.train.datasets import YoloDataset

    img_dir = tmp_path / "images" / "val"
    lab_dir = tmp_path / "labels" / "val"
    img_dir.mkdir(parents=True)
    lab_dir.mkdir(parents=True)
    rng = np.random.default_rng(0)
    sizes = [(60, 120), (64, 128), (120, 60), (128, 64)]  # wide + tall
    for i, (h, w) in enumerate(sizes):
        img = rng.integers(0, 255, (h, w, 3), np.uint8)
        cv2.imwrite(str(img_dir / f"{i}.jpg"), img)
        with open(lab_dir / f"{i}.txt", "w") as f:
            f.write("0 0.5 0.5 0.4 0.4\n")
    ds = YoloDataset(str(img_dir), img_size=128, augment=False,
                     max_labels=8)
    batches = list(ds.rect_batches(2, stride=32))
    assert len(batches) == 2
    shapes = sorted(b[0].shape[1:3] for b in batches)
    # wide pair -> short canvas, tall pair -> narrow canvas
    assert shapes[0][0] < 128 and shapes[0][1] == 128
    assert shapes[1][0] == 128 and shapes[1][1] < 128
    for imgs, tgts, masks in batches:
        assert imgs.shape[1] % 32 == 0 and imgs.shape[2] % 32 == 0
        assert masks.any()
        # boxes stay inside the canvas after normalization
        lab = tgts[masks]
        assert (lab[:, 1:] > 0).all() and (lab[:, 1:] < 1).all()


def test_evaluate_map_rect(tiny_dataset):
    from yolov7_tracker_tpu.cli.test import evaluate_map
    from yolov7_tracker_tpu.models import zoo, yolo

    spec = zoo.get_spec("yolov7-tiny", nc=2)
    _, variables = yolo.build_model(spec, img_size=96, init="random")
    res = evaluate_map(spec, variables, tiny_dataset, img=96, batch=4,
                       max_labels=16, rect=True)
    assert "map50" in res and np.isfinite(res["map50"])

def test_mosaic9(tiny_dataset):
    """mosaic9 produces a valid 2s canvas with in-bounds labels."""
    from yolov7_tracker_tpu.train.datasets import YoloDataset

    ds = YoloDataset(tiny_dataset, img_size=96, max_labels=64)
    img, labels = ds._mosaic9(0)
    # the border=(-s//2) perspective warp crops the 2s canvas back to s
    assert img.shape == (96, 96, 3)
    if len(labels):
        assert (labels[:, 1:] >= 0).all()
        assert (labels[:, 1:] <= 96).all()
    # the augmented __getitem__ path exercises the 80/20 selection
    for i in range(4):
        im, t, m = ds[i]
        assert im.shape == (96, 96, 3)

def test_image_weights_sampling(tiny_dataset):
    from yolov7_tracker_tpu.train.datasets import (
        YoloDataset, labels_to_class_weights, labels_to_image_weights,
    )

    ds = YoloDataset(tiny_dataset, img_size=96, max_labels=16,
                     augment=False)
    cw = labels_to_class_weights(ds.labels, nc=2)
    assert cw.shape == (2,) and abs(cw.sum() - 1.0) < 1e-9
    iw = labels_to_image_weights(ds.labels, 2, cw)
    assert iw.shape == (len(ds),) and (iw >= 0).all()
    # images of class 0 only: weight concentrated there
    ds.resample_by_weights(iw)
    assert len(ds.indices) == len(ds)
    imgs, tgts, masks = next(ds.batches(4))
    assert imgs.shape == (4, 96, 96, 3)


def test_train_cli_multiscale(tiny_dataset, tmp_path):
    """One epoch of the full train CLI with --multi_scale and
    --image_weights on the virtual mesh."""
    import yaml

    from yolov7_tracker_tpu.cli import train as train_cli

    data_yaml = tmp_path / "data.yaml"
    yaml.safe_dump({"train": tiny_dataset, "nc": 2},
                   open(data_yaml, "w"))
    run_dir = train_cli.main([
        "--model", "yolov7-tiny",
        "--data", str(data_yaml),
        "--img", "96",
        "--batch", str(len(jax.devices())),
        "--epochs", "1",
        "--max_labels", "16",
        "--ckpt_dir", str(tmp_path / "runs"),
        "--multi_scale", "--image_weights",
    ])
    assert os.path.isfile(os.path.join(run_dir, "last.msgpack"))
    # first-epoch train-batch mosaics (plot_images, train.py:388-391)
    assert os.path.isfile(os.path.join(run_dir, "train_batch0.jpg"))


def test_warmup_group_schedules():
    """Reference warmup parity (train.py:341-350): bias group starts at
    warmup_bias_lr, others at 0; momentum ramps warmup_momentum->momentum;
    groups converge to lr0*lf after nw steps."""
    import optax

    from yolov7_tracker_tpu.parallel.train_step import (
        OptConfig, make_optimizer, momentum_schedule, one_cycle_lr,
    )

    cfg = OptConfig(epochs=10, steps_per_epoch=500, batch_size=16)
    params = {
        "layer0": {"conv": {"kernel": jnp.ones((3, 3, 4, 4))},
                   "bn": {"scale": jnp.ones(4), "bias": jnp.zeros(4)}},
        "head": {"bias": jnp.zeros(8)},
    }
    tx = make_optimizer(cfg)
    st = tx.init(params)
    g = jax.tree.map(jnp.ones_like, params)
    u, st = tx.update(g, st, params)
    # nesterov first step with grad 1: update = -lr * (1 + momentum)
    assert abs(float(u["head"]["bias"][0]) + 0.1 * 1.8) < 1e-4
    assert abs(float(u["layer0"]["conv"]["kernel"][0, 0, 0, 0])) < 1e-3
    nw = max(cfg.warmup_epochs * cfg.steps_per_epoch, 1000)
    np.testing.assert_allclose(
        float(one_cycle_lr(cfg, 0.1)(nw + 10)),
        float(one_cycle_lr(cfg, 0.0)(nw + 10)), rtol=1e-6,
    )
    mom = momentum_schedule(cfg)
    assert abs(float(mom(0)) - cfg.warmup_momentum) < 1e-6
    assert abs(float(mom(nw)) - cfg.momentum) < 1e-6


def test_evaluate_map_plots(tiny_dataset, tmp_path):
    from yolov7_tracker_tpu.cli.test import evaluate_map
    from yolov7_tracker_tpu.models import zoo, yolo

    spec = zoo.get_spec("yolov7-tiny", nc=2)
    _, variables = yolo.build_model(spec, img_size=96, init="random")
    plots = str(tmp_path / "plots")
    res = evaluate_map(spec, variables, tiny_dataset, img=96, batch=4,
                       max_labels=16, plots_dir=plots)
    assert os.path.isfile(os.path.join(plots, "PR_curve.png"))
    assert os.path.isfile(os.path.join(plots, "confusion_matrix.png"))


def test_quad_batches(tiny_dataset):
    from yolov7_tracker_tpu.train.datasets import YoloDataset

    ds = YoloDataset(tiny_dataset, img_size=96, max_labels=16,
                     augment=False)
    imgs, tgts, masks = next(ds.quad_batches(2))
    assert imgs.shape == (2, 192, 192, 3)
    assert tgts.shape == (2, 64, 5) and masks.shape == (2, 64)
    lab = tgts[masks]
    assert len(lab) and (lab[:, 1:] >= 0).all() and (lab[:, 1:] <= 1).all()


def test_label_cache_roundtrip(tiny_dataset):
    import glob

    from yolov7_tracker_tpu.train.datasets import YoloDataset

    ds1 = YoloDataset(tiny_dataset, img_size=96, max_labels=16)
    caches = glob.glob(os.path.join(tiny_dataset, ".labels_*.npz"))
    assert caches, "label cache not written"
    ds2 = YoloDataset(tiny_dataset, img_size=96, max_labels=16)
    for a, b in zip(ds1.labels, ds2.labels):
        np.testing.assert_array_equal(a, b)
    # touching a label file invalidates the key -> new cache
    lab = glob.glob(tiny_dataset.replace("images", "labels") + "/*.txt")[0]
    os.utime(lab, (1e9, 1e9))
    ds3 = YoloDataset(tiny_dataset, img_size=96, max_labels=16)
    assert len(glob.glob(os.path.join(tiny_dataset,
                                      ".labels_*.npz"))) >= 2


def test_gradient_accumulation_semantics():
    """True gradient accumulation (train.py:110-111,341-345,369-374):
    params/EMA move ONLY when ni % accumulate == 0, the boundary update
    equals one optimizer step on the SUM of the pending micro-grads, and
    the warmup-interpolated accumulate starts at 1 (fresh state steps on
    its first batch)."""
    from jax.sharding import Mesh

    from yolov7_tracker_tpu.models import zoo
    from yolov7_tracker_tpu.parallel.train_step import (
        OptConfig, accumulate_schedule, make_optimizer, make_train_state,
        make_train_step,
    )

    spec = zoo.get_spec("yolov7-tiny", nc=2)
    # ratio 4 -> accumulate = 4 after warmup
    cfg = OptConfig(epochs=4, steps_per_epoch=2000, batch_size=2,
                    nominal_batch=8)
    mesh = Mesh(np.array(jax.devices()[:1]), ("data",))
    state = make_train_state(spec, img_size=32, opt_cfg=cfg,
                             rng=jax.random.PRNGKey(0))
    step = make_train_step(spec, mesh, img_size=32, opt_cfg=cfg)

    sched = accumulate_schedule(cfg)
    assert float(sched(jnp.int32(0))) == 1.0
    assert float(sched(jnp.int32(10**6))) == 4.0

    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.uniform(0, 1, (2, 32, 32, 3)), jnp.float32)
    targets = jnp.tile(jnp.asarray([[0, 0.5, 0.5, 0.3, 0.4]],
                                   jnp.float32)[None], (2, 1, 1))
    tmask = jnp.ones((2, 1), bool)

    # ---- post-warmup: start at ni0 with ni0 % 4 == 1 -------------------
    ni0 = 20001
    state = state._replace(step=jnp.int32(ni0))
    p0 = jax.tree.map(lambda x: np.asarray(x), state.params)
    opt0 = jax.tree.map(lambda x: np.asarray(x), state.opt_state)
    ema0 = np.asarray(jax.tree.leaves(state.ema_params)[0])

    snaps = []
    for i in range(4):
        state, metrics = step(state, imgs, targets, tmask)
        snaps.append((
            np.asarray(jax.tree.leaves(state.params)[0]).copy(),
            jax.tree.map(lambda x: np.asarray(x).copy(), state.grad_acc),
            int(state.ema_count),
            np.asarray(jax.tree.leaves(state.ema_params)[0]).copy(),
        ))
    l0 = jax.tree.leaves(p0)[0]
    # micro steps ni0..ni0+2 (ni % 4 != 0): params and EMA frozen
    for i in range(3):
        np.testing.assert_array_equal(snaps[i][0], l0)
        np.testing.assert_array_equal(snaps[i][3], ema0)
        assert snaps[i][2] == 0
    # identical batches: grad_acc after 2 steps == 2x after 1 step
    g1 = jax.tree.leaves(snaps[0][1])[0]
    g2 = jax.tree.leaves(snaps[1][1])[0]
    np.testing.assert_allclose(g2, 2 * g1, rtol=1e-4, atol=1e-7)

    # boundary (ni0+3 ≡ 0 mod 4): params moved, equal to one optimizer
    # step on the 4-batch gradient sum; grad_acc reset; EMA counted once
    assert not np.array_equal(snaps[3][0], l0)
    assert snaps[3][2] == 1
    assert all(float(np.abs(x).max()) == 0.0
               for x in jax.tree.leaves(snaps[3][1]))
    tx = make_optimizer(cfg)
    # snaps[0][1] is the single-batch grad g; the 4-batch sum is 4g
    acc4 = jax.tree.map(lambda g: jnp.asarray(4.0 * g), snaps[0][1])
    upd, _ = tx.update(acc4, jax.tree.map(jnp.asarray, opt0),
                       jax.tree.map(jnp.asarray, p0),
                       step=jnp.int32(ni0 + 3))
    import optax

    expect = optax.apply_updates(jax.tree.map(jnp.asarray, p0), upd)
    np.testing.assert_allclose(
        snaps[3][0], np.asarray(jax.tree.leaves(expect)[0]),
        rtol=1e-5, atol=1e-7,
    )

    # ---- warmup: accumulate == 1 at ni=0 -> first batch steps ----------
    fresh = make_train_state(spec, img_size=32, opt_cfg=cfg,
                             rng=jax.random.PRNGKey(1))
    pf = [np.asarray(x).copy() for x in jax.tree.leaves(fresh.params)]
    fresh, _ = step(fresh, imgs, targets, tmask)
    moved = any(
        not np.array_equal(np.asarray(a), b)
        for a, b in zip(jax.tree.leaves(fresh.params), pf)
    )
    assert moved, "first warmup batch (accumulate=1) must step"
    assert int(fresh.ema_count) == 1


def test_artifact_store_roundtrip(tmp_path):
    """Content addressing, aliases, lineage, resolve, bbox panel — the
    local wandb-artifact analogue (utils/artifacts.py)."""
    from yolov7_tracker_tpu.utils.artifacts import (
        ArtifactStore, digest_path, log_bbox_panel,
    )

    store = ArtifactStore(str(tmp_path / "store"))
    f1 = tmp_path / "w.bin"
    f1.write_bytes(b"weights-v1")
    ref1 = store.log_artifact(str(f1), "m", aliases=("latest",),
                              metadata={"epoch": 0})
    # same content -> same digest, no duplicate object
    ref_dup = store.log_artifact(str(f1), "m", aliases=("latest",))
    assert ref1 == ref_dup
    f1.write_bytes(b"weights-v2")
    ref2 = store.log_artifact(str(f1), "m", aliases=("latest", "best"),
                              parents=[ref1])
    assert ref1 != ref2
    # resolve by alias and by digest prefix
    assert open(store.resolve("m:latest"), "rb").read() == b"weights-v2"
    assert open(store.resolve("artifact:m:best"), "rb").read() \
        == b"weights-v2"
    d1 = ref1.split(":")[1]
    assert open(store.resolve(f"m:{d1}"), "rb").read() == b"weights-v1"
    # lineage walks back to the parent
    chain = store.lineage(ref2)
    assert ref1 in chain and ref2 in chain
    assert len(store.versions("m")) == 2
    # directory artifact digests are stable and content-sensitive
    d = tmp_path / "ckpt"
    d.mkdir()
    (d / "a.txt").write_text("a")
    dg = digest_path(str(d))
    assert dg == digest_path(str(d))
    (d / "a.txt").write_text("b")
    assert dg != digest_path(str(d))
    # bbox media panel
    imgs = np.zeros((2, 32, 32, 3), np.uint8)
    boxes = [np.array([[4, 4, 20, 20]]), np.array([[8, 8, 28, 24]])]
    ref_m = log_bbox_panel(store, imgs, boxes,
                           str(tmp_path / "panel.png"),
                           labels=[["person"], ["car"]])
    assert os.path.isfile(store.resolve(ref_m))


def test_train_cli_artifact_resume(tiny_dataset, tmp_path):
    """train -> interrupt -> resume-from-artifact round trip (verdict r2
    item 6): the second run restores the checkpoint through the store,
    continues at the next epoch, and extends the lineage chain."""
    import json

    import yaml

    from yolov7_tracker_tpu.cli import train as train_cli
    from yolov7_tracker_tpu.utils.artifacts import ArtifactStore

    data_yaml = tmp_path / "data.yaml"
    yaml.safe_dump({"train": tiny_dataset, "nc": 2},
                   open(data_yaml, "w"))
    store_dir = str(tmp_path / "store")
    common = [
        "--model", "yolov7-tiny",
        "--data", str(data_yaml),
        "--img", "96",
        "--batch", str(len(jax.devices())),
        "--max_labels", "16",
        "--ckpt_dir", str(tmp_path / "runs"),
        "--eval_every", "0",
        "--artifacts", store_dir,
        "--run_name", "tiny",
    ]
    run1 = train_cli.main(common + ["--epochs", "1"])
    store = ArtifactStore(store_dir)
    v1 = store.versions("tiny-ckpt")
    assert len(v1) == 1 and v1[0]["metadata"]["epoch"] == 0
    # jsonl carries the artifact events
    events = [json.loads(l)
              for l in open(os.path.join(run1, "metrics.jsonl"))
              if json.loads(l).get("event")]
    kinds = {e["kind"] for e in events}
    assert {"dataset", "checkpoint"} <= kinds

    # simulate a best-eval having happened in run1: resume must restore
    # best_fitness (else the next eval re-points the '-best' aliases to
    # a worse model) and carry it into the checkpoints it writes
    ckpt_dir = store.resolve("tiny-ckpt:latest")
    meta = json.load(open(os.path.join(ckpt_dir, "meta.json")))
    meta["best_fitness"] = 0.7
    json.dump(meta, open(os.path.join(ckpt_dir, "meta.json"), "w"))

    run2 = train_cli.main(common + [
        "--epochs", "2", "--resume", "artifact:tiny-ckpt:latest",
    ])
    v2 = store.versions("tiny-ckpt")
    assert len(v2) == 2
    newest = v2[-1]
    assert newest["metadata"]["epoch"] == 1  # resumed at epoch 1
    run2_meta = json.load(open(os.path.join(
        store.resolve(f"tiny-ckpt:{newest['digest'][:12]}"), "meta.json"
    )))
    assert run2_meta["best_fitness"] == 0.7
    # lineage: epoch-1 ckpt -> (dataset, epoch-0 ckpt)
    ref = f"tiny-ckpt:{newest['digest'][:12]}"
    chain = store.lineage(ref)
    assert any(c.startswith("tiny-data:") for c in chain)
    assert f"tiny-ckpt:{v1[0]['digest'][:12]}" in chain
    assert os.path.isfile(os.path.join(run2, "last.msgpack"))
