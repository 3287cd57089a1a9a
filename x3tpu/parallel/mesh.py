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
    jax.jit, static_argnames=("params", "caps", "mesh_holder", "has_seeds")
)
def _encode_sharded_jit(text, tlen, seeds, params, caps, mesh_holder,
                        has_seeds=False):
    mesh = mesh_holder.mesh
    if has_seeds:
        fn = lambda t, l, s0, s1: codec.encode_lanes(
            t, l, params, caps, seeds=(s0, s1)
        )
        args = (text, tlen, seeds[0], seeds[1])
        in_specs = (P(AXIS), P(AXIS), P(), P())  # seeds replicated
    else:
        fn = lambda t, l: codec.encode_lanes(t, l, params, caps)
        args = (text, tlen)
        in_specs = (P(AXIS), P(AXIS))
    out_shape = jax.eval_shape(fn, *args)
    sm = _shard_map(
        fn,
        mesh=mesh,
        in_specs=in_specs,
        out_specs=_spec_like(out_shape, P(AXIS)),
        check_vma=False,
    )
    return sm(*args)


@functools.partial(
    jax.jit, static_argnames=("params", "caps", "mesh_holder", "has_seeds")
)
def _decode_sharded_jit(words, byte_lens, seeds, params, caps, mesh_holder,
                        has_seeds=False):
    mesh = mesh_holder.mesh
    if has_seeds:
        fn = lambda w, b, s0, s1: codec.decode_lanes(
            w, b, params, caps, seeds=(s0, s1)
        )
        args = (words, byte_lens, seeds[0], seeds[1])
        in_specs = (P(AXIS), P(AXIS), P(), P())
    else:
        fn = lambda w, b: codec.decode_lanes(w, b, params, caps)
        args = (words, byte_lens)
        in_specs = (P(AXIS), P(AXIS))
    out_shape = jax.eval_shape(fn, *args)
    sm = _shard_map(
        fn,
        mesh=mesh,
        in_specs=in_specs,
        out_specs=_spec_like(out_shape, P(AXIS)),
        check_vma=False,
    )
    return sm(*args)


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


def encode_sharded(text, tlen, params: X3Params, caps: CodecCaps, mesh: Mesh,
                   seeds=None):
    """Run the lane encoder with lanes sharded over the mesh.  The lane
    count must be a multiple of the mesh size; seeds (if any) are broadcast
    replicated to every device."""
    sharding = NamedSharding(mesh, P(AXIS))
    text = jax.device_put(text, sharding)
    tlen = jax.device_put(tlen, sharding)
    return _encode_sharded_jit(
        text, tlen, seeds, params, caps, MeshHolder(mesh),
        has_seeds=seeds is not None,
    )


def decode_sharded(words, byte_lens, params: X3Params, caps: CodecCaps,
                   mesh: Mesh, seeds=None):
    sharding = NamedSharding(mesh, P(AXIS))
    words = jax.device_put(words, sharding)
    byte_lens = jax.device_put(byte_lens, sharding)
    return _decode_sharded_jit(
        words, byte_lens, seeds, params, caps, MeshHolder(mesh),
        has_seeds=seeds is not None,
    )
