#!/usr/bin/env python
"""Candidate-selection micro-breakdown on the real TPU.

The detector's post-forward stage costs ~0.31 ms/frame at w6@1088/b16.
This probe isolates the candidates: head scoring (sigmoid+max+reshape),
lax.top_k, the cumsum+scatter compaction, and the gather — against raw
head-shaped random tensors so the forward isn't in the loop.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    cache_dir = f"/root/repo/.jax_cache-{jax.default_backend()}"
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    import jax.numpy as jnp

    print(f"device: {jax.devices()[0]}", flush=True)

    # w6@1088 head shapes: strides 8/16/32/64, na=4... read from spec
    from yolov7_tracker_tpu.models import zoo

    spec = zoo.get_spec("yolov7-w6", nc=80)
    na, no = spec.na, spec.no
    img, batch = 1088, 16
    rng = np.random.default_rng(0)
    levels = []
    for s in spec.strides:
        ny = nx = img // s
        levels.append(jnp.asarray(
            rng.normal(-2, 1, (batch, ny, nx, na, no)).astype(np.float32),
            dtype=jnp.bfloat16))
    n_total = sum(p.shape[1] * p.shape[2] * p.shape[3] for p in levels)
    print(f"n_total={n_total} na={na} no={no}", flush=True)
    k = 2048
    b = batch

    def score_of(raw):
        flat_scores, flat_rows = [], []
        for p in raw:
            _, ny, nx, _, _ = p.shape
            obj = jax.nn.sigmoid(p[..., 4])
            cls_max = jnp.max(p[..., 5:], axis=-1)
            score = obj * jax.nn.sigmoid(cls_max)
            flat_scores.append(score.reshape(b, ny * nx * na))
            flat_rows.append(p.reshape(b, ny * nx * na, no))
        return jnp.concatenate(flat_scores, axis=1), flat_rows

    @jax.jit
    def st_score(raw):
        sc, _ = score_of(raw)
        return jnp.sum(sc.astype(jnp.float32))

    @jax.jit
    def st_topk(raw):
        sc, _ = score_of(raw)
        _, idx = jax.lax.top_k(sc, k)
        return jnp.sum(idx)

    @jax.jit
    def st_cumsum(raw):
        sc, _ = score_of(raw)
        mask = sc > jnp.asarray(0.49, sc.dtype)
        cnt = jnp.cumsum(mask.astype(jnp.int32), axis=1)
        return jnp.sum(cnt[:, -1])

    @jax.jit
    def st_compact(raw):
        sc, _ = score_of(raw)
        mask = sc > jnp.asarray(0.49, sc.dtype)
        cnt = jnp.cumsum(mask.astype(jnp.int32), axis=1)
        pos = jnp.where(mask, cnt - 1, k)
        b_iota = jnp.arange(b, dtype=jnp.int32)[:, None]
        n_iota = jnp.broadcast_to(
            jnp.arange(sc.shape[1], dtype=jnp.int32)[None, :], sc.shape)
        idx = jnp.zeros((b, k), jnp.int32)
        idx = idx.at[b_iota, pos].set(n_iota, mode="drop")
        return jnp.sum(idx)

    @jax.jit
    def st_gather(raw):
        sc, rows = score_of(raw)
        mask = sc > jnp.asarray(0.49, sc.dtype)
        cnt = jnp.cumsum(mask.astype(jnp.int32), axis=1)
        pos = jnp.where(mask, cnt - 1, k)
        b_iota = jnp.arange(b, dtype=jnp.int32)[:, None]
        n_iota = jnp.broadcast_to(
            jnp.arange(sc.shape[1], dtype=jnp.int32)[None, :], sc.shape)
        idx = jnp.zeros((b, k), jnp.int32)
        top_idx = idx.at[b_iota, pos].set(n_iota, mode="drop")
        sel = jnp.zeros((b, k, no), rows[0].dtype)
        off = 0
        for rl in rows:
            n_l = rl.shape[1]
            rel = top_idx - off
            in_l = (rel >= 0) & (rel < n_l)
            rel_c = jnp.clip(rel, 0, n_l - 1)
            got = jnp.take_along_axis(rl, rel_c[..., None], axis=1)
            sel = jnp.where(in_l[..., None], got, sel)
            off += n_l
        return jnp.sum(sel.astype(jnp.float32))

    @jax.jit
    def st_sort_scan_compact(raw):
        # variant: compaction via associative_scan instead of cumsum
        sc, _ = score_of(raw)
        mask = sc > jnp.asarray(0.49, sc.dtype)
        cnt = jax.lax.associative_scan(jnp.add, mask.astype(jnp.int32),
                                       axis=1)
        return jnp.sum(cnt[:, -1])


    @jax.jit
    def st_obj(raw):
        # ordering by obj alone: conf = sig(obj)*sig(cls) <= sig(obj),
        # so top-k by obj logit selects a superset of the true
        # candidate set (greedy re-ranks by exact f32 conf anyway)
        objs = []
        for p in raw:
            _, ny, nx, _, _ = p.shape
            objs.append(p[..., 4].reshape(b, ny * nx * na))
        sc = jnp.concatenate(objs, axis=1)
        _, idx = jax.lax.top_k(sc, k)
        return jnp.sum(idx)

    @jax.jit
    def st_rows6(raw):
        # dense 6-col decode (f32) -> masked top_k -> tiny gather
        rows, scs = [], []
        for li, p in enumerate(raw):
            _, ny, nx, _, _ = p.shape
            pf = p.astype(jnp.float32)
            obj = jax.nn.sigmoid(pf[..., 4])
            clsm = jnp.max(pf[..., 5:], axis=-1)
            clsa = jnp.argmax(pf[..., 5:], axis=-1).astype(jnp.float32)
            conf = obj * jax.nn.sigmoid(clsm)
            y = jax.nn.sigmoid(pf[..., 0:4])
            gx = jax.lax.broadcasted_iota(jnp.float32, (ny, nx, na), 1)
            gy = jax.lax.broadcasted_iota(jnp.float32, (ny, nx, na), 0)
            xy = (y[..., 0:2] * 2.0 - 0.5
                  + jnp.stack([gx, gy], -1)) * 8.0
            wh = (y[..., 2:4] * 2.0) ** 2 * 16.0
            r6 = jnp.concatenate(
                [xy, wh, conf[..., None], clsa[..., None]], axis=-1)
            rows.append(r6.reshape(b, ny * nx * na, 6))
            scs.append(conf.reshape(b, ny * nx * na))
        rows = jnp.concatenate(rows, axis=1)
        sc = jnp.concatenate(scs, axis=1)
        top_s, idx = jax.lax.top_k(sc, k)
        sel = jnp.take_along_axis(rows, idx[..., None], axis=1)
        return jnp.sum(sel) + jnp.sum(top_s)

    @jax.jit
    def st_obj_gather85(raw):
        # obj top-k + the per-level masked 85-wide gather (what the
        # production path would do after obj selection)
        objs, rows = [], []
        for p in raw:
            _, ny, nx, _, _ = p.shape
            objs.append(p[..., 4].reshape(b, ny * nx * na))
            rows.append(p.reshape(b, ny * nx * na, no))
        sc = jnp.concatenate(objs, axis=1)
        _, top_idx = jax.lax.top_k(sc, k)
        sel = jnp.zeros((b, k, no), rows[0].dtype)
        off = 0
        for rl in rows:
            n_l = rl.shape[1]
            rel = top_idx - off
            in_l = (rel >= 0) & (rel < n_l)
            rel_c = jnp.clip(rel, 0, n_l - 1)
            got = jnp.take_along_axis(rl, rel_c[..., None], axis=1)
            sel = jnp.where(in_l[..., None], got, sel)
            off += n_l
        return jnp.sum(sel.astype(jnp.float32))

    stages = [("score", st_score), ("score+topk", st_topk),
              ("score+cumsum", st_cumsum), ("score+compact", st_compact),
              ("score+compact+gather", st_gather),
              ("score+ascan", st_sort_scan_compact),
              ("obj+topk", st_obj), ("rows6", st_rows6),
              ("obj+topk+gather85", st_obj_gather85)]
    n = 96
    out = {}
    for name, fn in stages:
        v = fn(levels)
        np.asarray(v)
        t0 = time.time()
        for _ in range(n):
            v = fn(levels)
        np.asarray(v)
        ms = (time.time() - t0) / (n * batch) * 1e3
        out[name] = round(ms, 4)
        print(json.dumps({"stage": name, "ms_per_frame": out[name]}),
              flush=True)
    print(json.dumps({"sel_breakdown": out}), flush=True)


if __name__ == "__main__":
    main()
