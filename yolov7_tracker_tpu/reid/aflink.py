"""AFLink (PostLinker) — StrongSORT offline track-linking network
(reference tracker/reid_models/AFLink.py:15-98; flagged TODO and never
invoked by the reference tracker, strongsort.py:34-36).

Two temporal towers over (frame, x, y) triplets of 30-step track
snippets (7x1 convs, per-column BatchNorm), 1x3 fusion conv, GAP, and a
2-way classifier over the concatenated embeddings. Provided here both
for component parity and as a usable post-processing linker
(eval-time association of track fragments).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

BN = lambda name=None: nn.BatchNorm(
    use_running_average=True, epsilon=1e-5, momentum=0.9, name=name
)


class TemporalBlock(nn.Module):
    c: int

    @nn.compact
    def __call__(self, x):  # (B, L, 3, C)
        x = nn.Conv(self.c, (7, 1), padding="VALID", use_bias=False,
                    name="conv")(x)
        # per-column BatchNorm over (f, x, y) channels (AFLink.py:24-28)
        cols = []
        for i, nm in enumerate(("bnf", "bnx", "bny")):
            cols.append(BN(nm)(x[:, :, i, :]))
        x = jnp.stack(cols, axis=2)
        return jax.nn.relu(x)


class FusionBlock(nn.Module):
    c: int

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.c, (1, 3), padding="VALID", use_bias=False,
                    name="conv")(x)
        x = BN("bn")(x)
        return jax.nn.relu(x)


class PostLinker(nn.Module):
    @nn.compact
    def __call__(self, x1, x2):
        """x1, x2: (B, 30, 3) track snippets [frame, x, y] -> (B, 2)
        link probabilities."""
        def tower(x, name):
            h = x[..., None]  # (B, 30, 3, 1)
            for i, c in enumerate((32, 64, 128, 256)):
                h = TemporalBlock(c, name=f"{name}_t{i}")(h)
            h = FusionBlock(256, name=f"{name}_fuse")(h)
            return jnp.mean(h, axis=(1, 2))  # GAP -> (B, 256)

        e1 = tower(x1, "m1")
        e2 = tower(x2, "m2")
        z = jnp.concatenate([e1, e2], axis=1)
        z = nn.Dense(128, name="fc1")(z)
        z = jax.nn.relu(z)
        z = nn.Dense(2, name="fc2")(z)
        return jax.nn.softmax(z, axis=1)
