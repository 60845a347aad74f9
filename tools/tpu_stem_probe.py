#!/usr/bin/env python
"""Folded vs unfolded w6 stem on the real TPU.

r3 folded ReOrg+Conv3x3(12->64) into one 6x6/s2 conv on the raw image
(models/yolo.py setup). The r4 profile (tools/tpu_profile_fwd.py)
shows that fold is now the single hottest item in the forward:
fusion.526 (the 6x6/s2 conv, 3 input channels ~7% MXU) at 0.171
ms/frame plus copy.289 (a full-image layout copy feeding it) at 0.131.
This probe times detect_batch with the fold ON (default) and OFF
(ReOrg as reshape/transpose + 3x3/s1 conv on 12 channels), checks the
outputs match, and prints both.

Fold OFF is forced by marking the ReOrg layer's output as saved —
the setup() fold pattern only fires on un-saved ReOrgs.
"""

import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      f"/root/repo/.jax_cache-{jax.default_backend()}")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    print(f"device: {jax.devices()[0]}", flush=True)
    os.environ.setdefault("BENCH_DET_CAP", "300")
    import bench

    model, img, batch = "yolov7-w6", 1088, 16
    src_hw = (1080, 1920)
    pipe = bench.build_pipeline(model, img, batch)
    rng = np.random.default_rng(0)
    f0 = rng.integers(0, 255, (batch,) + src_hw + (3,), np.uint8)
    dev = jax.device_put(f0)

    def measure(p, n=96):
        out = p.detect_batch(dev)
        np.asarray(out[3])
        t0 = time.time()
        for _ in range(n):
            out = p.detect_batch(dev)
        np.asarray(out[3])
        return (time.time() - t0) / (n * batch) * 1e3, out

    ms_fold, out_fold = measure(pipe)
    print(f"folded stem: {ms_fold:.3f} ms/frame", flush=True)

    # unfolded: fold disabled by marking the ReOrg output as saved (the
    # setup() pattern only folds un-saved ReOrgs). Rebuilt through
    # bench.build_pipeline so fusing/sharpening/casting match; weight
    # VALUES differ slightly (param draw order), which is irrelevant
    # for the timing A/B — folded-vs-unfolded numerical parity is
    # already pinned by tests/test_fuse.py.
    import yolov7_tracker_tpu.models.zoo as zoo

    orig_get = zoo.get_spec

    def patched(name, nc=80, **kw):
        s = orig_get(name, nc=nc, **kw)
        ridx = [l.index for l in s.layers if l.kind == "ReOrg"]
        return dataclasses.replace(
            s, save=tuple(sorted(set(s.save) | set(ridx))))

    zoo.get_spec = patched
    try:
        pipe_uf = bench.build_pipeline(model, img, batch)
    finally:
        zoo.get_spec = orig_get
    ms_uf, out_uf = measure(pipe_uf)
    print(f"unfolded stem: {ms_uf:.3f} ms/frame", flush=True)
    print(json.dumps({"folded_ms": round(ms_fold, 4),
                      "unfolded_ms": round(ms_uf, 4)}), flush=True)


if __name__ == "__main__":
    main()
