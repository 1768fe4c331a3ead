"""Communication abstraction: the distributed backend of the framework.

The reference exchanges Traffic/Predictions/SolutionCost messages over
ROS 2/DDS topics with blocking spin-wait reads
(hlc/communication/InterHlcCommunication.m:140-236) — its synchronization
primitive. The TPU-native equivalent replaces every blocking read with the
implicit synchronization of a mesh collective:

- Traffic broadcast + read barrier  -> ``all_gather`` of traffic tensors
  along the vehicle mesh axis (ICI);
- per-level Predictions exchange    -> ``all_gather`` of predicted
  occupancies after each computation level;
- SolutionCost voting               -> ``psum`` + argmin (optimal /
  explorative priority modes).

``LocalComm`` is the single-program identity backend (the
PrioritizedSequentialController semantics); ``MeshComm`` runs inside
``shard_map`` with a named vehicle axis.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


class LocalComm:
    """All vehicles in one program: gathers are the identity."""

    def __init__(self, n_vehicles: int):
        self.n_vehicles = n_vehicles
        self.n_local = n_vehicles

    def global_indices(self) -> jax.Array:
        return jnp.arange(self.n_vehicles)

    def gather_veh(self, x: jax.Array) -> jax.Array:
        return x

    def gather_tree(self, tree):
        return tree

    def local_slice(self, x: jax.Array) -> jax.Array:
        return x

    def psum(self, x: jax.Array) -> jax.Array:
        return x


class MeshComm:
    """Vehicle-sharded backend for use inside ``shard_map``.

    Arrays with a leading local-vehicle dimension ``[n_local, ...]`` are
    exchanged with ``all_gather(tiled=True)`` along the named mesh axis —
    the ICI ride of the reference's DDS topics.
    """

    def __init__(self, n_vehicles: int, axis_name: str):
        self.n_vehicles = n_vehicles
        self.axis_name = axis_name
        self.axis_size = jax.lax.axis_size(axis_name)
        assert n_vehicles % self.axis_size == 0, (
            f"n_vehicles={n_vehicles} must divide over mesh axis "
            f"size {self.axis_size}"
        )
        self.n_local = n_vehicles // self.axis_size

    def global_indices(self) -> jax.Array:
        shard = jax.lax.axis_index(self.axis_name)
        return shard * self.n_local + jnp.arange(self.n_local)

    def gather_veh(self, x: jax.Array) -> jax.Array:
        return jax.lax.all_gather(
            x, self.axis_name, axis=0, tiled=True
        )

    def gather_tree(self, tree):
        """ONE fused all_gather for a whole pytree of [n_local, ...]
        arrays.

        The reference's Traffic topic is one message carrying every
        per-vehicle field (InterHlcCommunication.m:140-236); issuing one
        collective instead of one per field keeps the exchange
        latency-bound by a single ICI round. Leaves are flattened to
        [n_local, K_i], cast to f32 (ints/bools in this codebase are
        trim/lanelet indices and flags, exact in f32), concatenated,
        gathered once, and unpacked — values are bit-identical to
        per-field gathers.
        """
        leaves, treedef = jax.tree.flatten(tree)
        parts, specs = [], []
        for x in leaves:
            flat = x.reshape(x.shape[0], -1)
            specs.append((x.shape, x.dtype, flat.shape[1]))
            parts.append(flat.astype(jnp.float32))
        packed = jnp.concatenate(parts, axis=1)
        g = self.gather_veh(packed)                  # [N, sum K_i]
        out, off = [], 0
        for shape, dtype, w in specs:
            seg = g[:, off:off + w]
            off += w
            out.append(
                seg.astype(dtype).reshape(self.n_vehicles, *shape[1:])
            )
        return jax.tree.unflatten(treedef, out)

    def local_slice(self, x: jax.Array) -> jax.Array:
        shard = jax.lax.axis_index(self.axis_name)
        return jax.lax.dynamic_slice_in_dim(
            x, shard * self.n_local, self.n_local, axis=0
        )

    def psum(self, x: jax.Array) -> jax.Array:
        return jax.lax.psum(x, self.axis_name)
