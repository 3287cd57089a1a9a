"""Device-mesh construction and sharded codec execution.

Each device runs its own lockstep event loop over its local lanes via
``shard_map`` — lanes on different devices never synchronize (no global
``jnp.any`` reduction across the mesh), so per-device loops exit as soon as
their local blocks finish.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from x3tpu import codec
from x3tpu.config import CodecCaps, X3Params

try:  # jax >= 0.6 moved shard_map to the top level
    from jax import shard_map as _shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map as _shard_map

AXIS = "blocks"


def make_mesh(num_devices: Optional[int] = None, devices=None) -> Mesh:
    """A 1-D mesh over the block-parallel axis."""
    if devices is None:
        devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (AXIS,))


def _spec_like(tree, spec):
    return jax.tree.map(lambda _: spec, tree)


@functools.partial(
    jax.jit, static_argnames=("params", "caps", "mesh_holder")
)
def _encode_sharded_jit(text, tlen, params, caps, mesh_holder):
    mesh = mesh_holder.mesh
    fn = lambda t, l: codec.encode_lanes(t, l, params, caps)
    out_shape = jax.eval_shape(fn, text, tlen)
    sm = _shard_map(
        fn,
        mesh=mesh,
        in_specs=(P(AXIS), P(AXIS)),
        out_specs=_spec_like(out_shape, P(AXIS)),
        check_vma=False,
    )
    return sm(text, tlen)


@functools.partial(
    jax.jit, static_argnames=("params", "caps", "mesh_holder")
)
def _decode_sharded_jit(words, byte_lens, params, caps, mesh_holder):
    mesh = mesh_holder.mesh
    fn = lambda w, b: codec.decode_lanes(w, b, params, caps)
    out_shape = jax.eval_shape(fn, words, byte_lens)
    sm = _shard_map(
        fn,
        mesh=mesh,
        in_specs=(P(AXIS), P(AXIS)),
        out_specs=_spec_like(out_shape, P(AXIS)),
        check_vma=False,
    )
    return sm(words, byte_lens)


class MeshHolder:
    """Hashable wrapper so a Mesh can ride through jit static args."""

    def __init__(self, mesh: Mesh):
        self.mesh = mesh

    def __hash__(self):
        return hash(tuple(d.id for d in self.mesh.devices.flat))

    def __eq__(self, other):
        return (
            isinstance(other, MeshHolder)
            and tuple(d.id for d in self.mesh.devices.flat)
            == tuple(d.id for d in other.mesh.devices.flat)
        )


def encode_sharded(text, tlen, params: X3Params, caps: CodecCaps, mesh: Mesh):
    """Run the lane encoder with lanes sharded over the mesh.  The lane
    count must be a multiple of the mesh size."""
    sharding = NamedSharding(mesh, P(AXIS))
    text = jax.device_put(text, sharding)
    tlen = jax.device_put(tlen, sharding)
    return _encode_sharded_jit(text, tlen, params, caps, MeshHolder(mesh))


def decode_sharded(words, byte_lens, params: X3Params, caps: CodecCaps, mesh: Mesh):
    sharding = NamedSharding(mesh, P(AXIS))
    words = jax.device_put(words, sharding)
    byte_lens = jax.device_put(byte_lens, sharding)
    return _decode_sharded_jit(words, byte_lens, params, caps, MeshHolder(mesh))
