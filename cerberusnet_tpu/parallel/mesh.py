"""Device mesh + sharding layout (SURVEY.md §3 C19, §6.8).

TPU-native replacement for the reference's NCCL DDP: a jax.sharding.Mesh
with axes ('data', 'spatial'). Parameters are replicated; batches are
sharded on the batch axis over 'data' and (optionally) on image H over
'spatial'. jit + sharding annotations make XLA SPMD insert the gradient
all-reduce (psum over 'data') and the conv halo exchanges for the spatial
axis — no hand-written collectives, and they ride ICI on a real slice.

The 'spatial' axis is the TPU-idiomatic analogue of sequence/context
parallelism for this CNN workload (SURVEY.md §6.7): at 1024x512 a single v5e
chip holds the activations, but sharding H lets the same program scale to
resolutions beyond one chip's HBM. Default layout is pure DP ([BASELINE:L11]
'data-parallel on v4-8').
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(num_data: int = 0, num_spatial: int = 1, devices=None) -> Mesh:
    """Build a ('data', 'spatial') mesh. num_data=0 uses all visible devices
    divided by num_spatial."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    if num_data <= 0:
        if len(devices) % num_spatial:
            raise ValueError(
                f"{len(devices)} devices not divisible by spatial={num_spatial}"
            )
        num_data = len(devices) // num_spatial
    n = num_data * num_spatial
    grid = devices[:n].reshape(num_data, num_spatial)
    return Mesh(grid, axis_names=("data", "spatial"))


def batch_sharding(mesh: Mesh, spatial_axis: int | None = 1) -> NamedSharding:
    """Sharding for NHWC (or N...) batch tensors: batch over 'data', H over
    'spatial' (when the mesh has a non-trivial spatial extent)."""
    if spatial_axis is not None and mesh.shape["spatial"] > 1:
        spec = [None] * 4
        spec[0] = "data"
        spec[spatial_axis] = "spatial"
        return NamedSharding(mesh, P(*spec))
    return NamedSharding(mesh, P("data"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    """Place a host batch dict on the mesh, sharded for data parallelism.
    Rank-aware: any leading-batch array gets P('data') (+ H over 'spatial'
    for rank>=3 image-like tensors)."""
    out = {}
    use_spatial = mesh.shape["spatial"] > 1
    for k, v in batch.items():
        ndim = np.ndim(v)
        spec = [None] * ndim
        if ndim >= 1:
            spec[0] = "data"
        if use_spatial and ndim >= 3:
            spec[1] = "spatial"
        out[k] = jax.device_put(v, NamedSharding(mesh, P(*spec)))
    return out
