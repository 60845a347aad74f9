"""Parallelism layer: device mesh, data-parallel train step, sharded
sequence tracking. Replaces the reference's DDP/NCCL story (train.py:596,
torch.distributed) with jax.sharding + pjit over an ICI mesh."""
