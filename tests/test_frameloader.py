"""Native multithreaded frame loader (native/frameloader.cpp): decode
parity with cv2.imread, strict in-order delivery under out-of-order
worker completion, and the iter_frames integration.

Reference counterpart: the DataLoader worker prefetch around
tracker/tracker_dataloader.py:77-85 (tracker/track.py:130)."""

import os

import numpy as np
import pytest


@pytest.fixture(scope="module")
def png_dir(tmp_path_factory):
    import cv2

    d = tmp_path_factory.mktemp("frames")
    rng = np.random.default_rng(0)
    paths = []
    for i in range(20):
        img = rng.integers(0, 255, (64, 96, 3), np.uint8)
        img[0, 0] = i  # index tag for order checks
        p = str(d / f"{i:06d}.png")
        cv2.imwrite(p, img)
        paths.append(p)
    return paths


def test_native_loader_builds():
    from yolov7_tracker_tpu import native

    assert native.frameloader_available()


def test_decode_parity_and_order(png_dir):
    import cv2

    from yolov7_tracker_tpu import native

    got = list(native.FrameLoader(png_dir, n_threads=4, capacity=3))
    assert len(got) == len(png_dir)
    for i, (p, g) in enumerate(zip(png_dir, got)):
        assert int(g[0, 0, 0]) == i  # in order
        np.testing.assert_array_equal(g, cv2.imread(p))  # PNG: bit-exact


def test_jpeg_decode_close(png_dir, tmp_path):
    import cv2

    from yolov7_tracker_tpu import native

    rng = np.random.default_rng(1)
    img = rng.integers(0, 255, (48, 64, 3), np.uint8)
    p = str(tmp_path / "a.jpg")
    cv2.imwrite(p, img)
    (g,) = list(native.FrameLoader([p]))
    ref = cv2.imread(p)
    assert g.shape == ref.shape
    # different libjpeg builds may differ by a couple of IDCT LSBs
    assert np.abs(g.astype(int) - ref.astype(int)).max() <= 2


def test_early_close_no_deadlock(png_dir):
    from yolov7_tracker_tpu import native

    fl = native.FrameLoader(png_dir, n_threads=4, capacity=2)
    it = iter(fl)
    next(it)
    next(it)
    fl.close()  # workers blocked on ring space must unblock and join


def test_iter_frames_uses_loader(png_dir):
    from yolov7_tracker_tpu.data import sequence as seqmod

    spec = seqmod.SequenceSpec("t", png_dir)
    idxs_all = []
    for batch, idxs in seqmod.iter_frames(spec, 6):
        assert batch.dtype == np.uint8 and batch.ndim == 4
        idxs_all.extend(idxs)
    assert idxs_all == list(range(1, len(png_dir) + 1))


def test_missing_file_raises(tmp_path):
    from yolov7_tracker_tpu import native

    with pytest.raises(AssertionError, match="failed to read"):
        list(native.FrameLoader([str(tmp_path / "nope.png")]))


def test_oversized_frame_grows_buffer(png_dir):
    """A frame bigger than the initial staging buffer must be delivered
    intact, not dropped or asserted on: fl_next leaves it in the ring
    (rc=-2 + dims) and the iterator grows the buffer and retries."""
    import cv2

    from yolov7_tracker_tpu import native

    fl = native.FrameLoader(png_dir, n_threads=2, capacity=2,
                            max_hw=(8, 8))
    with fl:
        got = list(fl)
    assert len(got) == len(png_dir)
    for i, (p, g) in enumerate(zip(png_dir, got)):
        assert int(g[0, 0, 0]) == i
        np.testing.assert_array_equal(g, cv2.imread(p))
