"""Mesh/sharding semantics tests on the virtual 8-device CPU mesh.

The key property checked here: under pjit's global-view semantics, flax
BatchNorm inside the sharded train step computes batch statistics over
the FULL global batch (XLA inserts the cross-device all-reduce for the
mean) — i.e. the reference's opt-in SyncBatchNorm (train.py:239-242)
is the default behavior of our DP training, not an extra wrapper.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs >1 device")
def test_batchnorm_is_sync_under_pjit():
    import flax.linen as nn

    class M(nn.Module):
        @nn.compact
        def __call__(self, x):
            return nn.BatchNorm(use_running_average=False, momentum=0.0)(x)

    m = M()
    n_dev = len(jax.devices())
    x = np.random.default_rng(0).normal(
        2.0, 3.0, (2 * n_dev, 4, 4, 8)
    ).astype(np.float32)
    variables = m.init(jax.random.PRNGKey(0), x)
    mesh = Mesh(np.asarray(jax.devices()), ("data",))
    xs = jax.device_put(x, NamedSharding(mesh, P("data")))

    @jax.jit
    def stats(v, xb):
        _, upd = m.apply(v, xb, mutable=["batch_stats"])
        return upd["batch_stats"]

    got = jax.device_get(stats(variables, xs))["BatchNorm_0"]["mean"]
    global_mean = x.mean(axis=(0, 1, 2))
    shard_mean = x[: x.shape[0] // n_dev].mean(axis=(0, 1, 2))
    np.testing.assert_allclose(got, global_mean, atol=1e-5)
    assert not np.allclose(got, shard_mean, atol=1e-3)


def test_shard_batch_layout():
    from yolov7_tracker_tpu.parallel.mesh import data_mesh, shard_batch

    mesh = data_mesh()
    n_dev = len(jax.devices())
    imgs = np.zeros((n_dev * 2, 8, 8, 3), np.float32)
    tgts = np.zeros((n_dev * 2, 4, 5), np.float32)
    masks = np.zeros((n_dev * 2, 4), bool)
    si, st, sm = shard_batch(mesh, (imgs, tgts, masks))
    assert si.shape == imgs.shape
    spec = si.sharding.spec
    assert spec[0] == "data"
