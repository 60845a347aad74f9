"""Conv+BN / RepConv fusion parity: fused model output == unfused."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.slow


def test_fused_matches_unfused():
    from yolov7_tracker_tpu.models import yolo, zoo
    from yolov7_tracker_tpu.models.fuse import fuse_variables

    spec = zoo.get_spec("yolov7", nc=8)  # has RepConv heads
    model, variables = yolo.build_model(spec, img_size=128, init="random")
    # randomize BN stats so folding actually does something
    rng = np.random.default_rng(0)
    stats = jax.tree.map(
        lambda x: jnp.asarray(
            np.abs(rng.normal(1.0, 0.1, x.shape)).astype(np.float32)
        ),
        variables["batch_stats"],
    )
    variables = {"params": variables["params"], "batch_stats": stats}

    x = jnp.asarray(rng.uniform(0, 1, (1, 128, 128, 3)).astype(np.float32))
    ref, _ = model.apply(variables, x, training=False)

    fused_vars = fuse_variables(variables)
    fused_model = yolo.YoloV7(spec, fused=True)
    got, _ = fused_model.apply(fused_vars, x, training=False)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=5e-3, atol=5e-3
    )


def test_fused_matches_unfused_w6_reorg_fold():
    """w6's ReOrg stem folds into one 6x6/s2 conv (blocks
    _ReOrgFoldedConv); verify the fold composes with BN folding —
    the exact configuration bench.py / the serving pipeline runs."""
    from yolov7_tracker_tpu.models import yolo, zoo
    from yolov7_tracker_tpu.models.fuse import fuse_variables

    spec = zoo.get_spec("yolov7-w6", nc=8)
    model, variables = yolo.build_model(spec, img_size=128, init="random")
    rng = np.random.default_rng(0)
    stats = jax.tree.map(
        lambda x: jnp.asarray(
            np.abs(rng.normal(1.0, 0.1, x.shape)).astype(np.float32)
        ),
        variables["batch_stats"],
    )
    variables = {"params": variables["params"], "batch_stats": stats}

    x = jnp.asarray(rng.uniform(0, 1, (1, 128, 128, 3)).astype(np.float32))
    ref, _ = model.apply(variables, x, training=False)

    fused_vars = fuse_variables(variables)
    fused_model = yolo.YoloV7(spec, fused=True)
    got, _ = fused_model.apply(fused_vars, x, training=False)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=5e-3, atol=5e-3
    )


def test_activation_registry_matches_torch():
    """mish/hardswish/relu/silu vs torch (utils/activations.py set)."""
    import numpy as np
    import pytest

    torch = pytest.importorskip("torch")
    import jax.numpy as jnp

    from yolov7_tracker_tpu.models.blocks import activation
    from yolov7_tracker_tpu.models.spec import _parse_act

    x = np.linspace(-5, 5, 101).astype(np.float32)
    for name, tfn in [("mish", torch.nn.Mish()),
                      ("hardswish", torch.nn.Hardswish()),
                      ("relu", torch.nn.ReLU()),
                      ("silu", torch.nn.SiLU()),
                      ("leaky:0.1", torch.nn.LeakyReLU(0.1))]:
        got = np.asarray(activation(name)(jnp.asarray(x)))
        want = tfn(torch.from_numpy(x)).numpy()
        np.testing.assert_allclose(got, want, atol=1e-6, err_msg=name)
    assert _parse_act("nn.Mish()") == "mish"
    assert _parse_act("nn.Hardswish()") == "hardswish"
    assert _parse_act("nn.LeakyReLU(0.1)") == "leaky:0.1"
