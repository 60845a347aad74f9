"""Checkpoint save/load.

Training state checkpoints use orbax (replacing the reference's torch
ckpt dict, train.py:451-458: epoch/best_fitness/model/ema/updates/
optimizer); standalone variables use flax msgpack for deploy
(strip_optimizer analogue, utils/general.py:698-712).
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax


def save_variables(path: str, variables) -> str:
    from flax import serialization

    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(jax.device_get(variables)))
    return path


def load_variables(path: str, template: Optional[Any] = None):
    from flax import serialization

    with open(path, "rb") as f:
        data = f.read()
    if template is not None:
        return serialization.from_bytes(template, data)
    return serialization.msgpack_restore(data)


def save_train_state(ckpt_dir: str, state, step: int,
                     metadata: Optional[dict] = None):
    """Orbax checkpoint of the full train state (params, EMA, optimizer,
    batch_stats) + metadata (epoch, best_fitness)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(os.path.join(ckpt_dir, f"step_{step}"))
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, jax.device_get(state._asdict()), force=True)
    ckptr.wait_until_finished()  # orbax saves async; meta.json needs the dir
    if metadata:
        import json

        with open(os.path.join(path, "meta.json"), "w") as f:
            json.dump(metadata, f)
    return path


def load_train_state(path: str, template):
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    restored = ckptr.restore(os.path.abspath(path), target=template._asdict())
    return type(template)(**restored)
