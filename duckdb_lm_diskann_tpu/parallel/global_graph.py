"""Globally-sharded single graph: exact multi-chip result equivalence.

The disjoint-subgraph mode (:mod:`.sharded`) scales throughput but changes
the algorithm (per-shard entry points, union-of-shards merge). BASELINE.json
mandates a mode whose results are *identical* to the single-graph search
(SURVEY §7.3: "cross-shard candidate exchange every hop over a single global
graph"; the reference's global entry point, GraphManager.cpp:564-621). This
module provides it:

  - ONE graph, built exactly like the single-chip index (same slots, same
    neighbor lists, same entry point). Its arrays are block-partitioned by
    row across the mesh: global slot g lives on shard g // C_local at local
    row g % C_local — so HBM per chip is 1/S of the index.
  - Search is the *unchanged* ``core.searcher.beam_search`` program run
    replicated on every chip inside ``shard_map``. Every row gather becomes
    owner-masked-local-gather + ``psum``: the owning shard contributes the
    row, all others contribute zeros, and the sum reassembles the exact
    value on every chip. Exactly one shard is ever nonzero, and x + 0 is
    exact in IEEE float, so the traversal — every beam insertion, visit
    order, tie-break — is bit-identical to the single-chip run. The test
    suite asserts ID-exact equality (not overlap).
  - The per-hop cross-chip traffic is the frontier working set (node row +
    R cached edge codes + neighbor validity), a few MB per hop at B=1024 —
    the candidate-exchange-over-ICI plan of SURVEY §2.4/§5.

Trade-off vs the disjoint mode: per-hop collectives cost latency, so this
mode is for indexes too large for one chip's HBM where exact single-graph
semantics are required; the disjoint mode remains the throughput scaler.
Both modes share all engine code.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P
from jax import shard_map

from ..common.types import INVALID_ROW_ID
from ..core.coordinator import Coordinator
from ..core.graph import GraphArrays, GraphParams
from ..core.searcher import beam_search
from .mesh import DATA_AXIS, make_mesh


@jax.tree_util.register_pytree_node_class
class PsumRows:
    """A row-sharded array that behaves like the full [C, ...] array under
    integer-array indexing, inside ``shard_map``.

    Holds only the local [C_local, ...] block; ``rows[idx]`` gathers the
    locally-owned rows (others -> 0) and ``psum``s over the mesh axis, so
    every shard sees the exact global gather. Registered as a pytree so a
    ``GraphArrays`` built from these passes through jit/shard_map untouched.
    """

    def __init__(self, local: jnp.ndarray, axis: str = DATA_AXIS):
        self.local = local
        self.axis = axis

    # pytree protocol
    def tree_flatten(self):
        return (self.local,), self.axis

    @classmethod
    def tree_unflatten(cls, axis, children):
        return cls(children[0], axis)

    @property
    def dtype(self):
        return self.local.dtype

    @property
    def ndim(self):
        return self.local.ndim

    @property
    def shape(self):
        # Global logical shape (C = S * C_local) for capacity arithmetic.
        s = jax.lax.axis_size(self.axis)
        return (self.local.shape[0] * s,) + self.local.shape[1:]

    def __getitem__(self, idx):
        idx = jnp.asarray(idx)
        c_local = self.local.shape[0]
        me = jax.lax.axis_index(self.axis)
        own = (idx // c_local) == me
        rows = self.local[jnp.where(own, idx % c_local, 0)]
        mask = own.reshape(own.shape + (1,) * (rows.ndim - own.ndim))
        if self.dtype == jnp.bool_:
            contrib = jnp.where(mask, rows, False).astype(jnp.int32)
            return jax.lax.psum(contrib, self.axis) > 0
        contrib = jnp.where(mask, rows, jnp.zeros((), self.dtype))
        return jax.lax.psum(contrib, self.axis)


def _stack_rows(a: np.ndarray, n_shards: int) -> np.ndarray:
    """[C, ...] -> [S, C/S, ...] block partition (C already padded)."""
    return np.asarray(a).reshape((n_shards, a.shape[0] // n_shards) + a.shape[1:])


@functools.partial(
    jax.jit,
    static_argnames=(
        "mesh", "params", "l_search", "k", "beam_width", "assume_all_valid"
    ),
)
def global_sharded_search(
    stacked: GraphArrays,  # every field [S, C/S, ...], sharded over 'data'
    queries: jnp.ndarray,  # f32[B, D] (replicated)
    entry_slot: jnp.ndarray,  # i32[] or i32[S_seeds] GLOBAL slot(s)
    *,
    mesh,
    params: GraphParams,
    l_search: int,
    k: int,
    beam_width: int = 1,
    assume_all_valid: bool = False,
):
    """The single-graph beam search over row-sharded arrays: the one
    engine program, with every row access routed through PsumRows."""
    # The Pallas kernels address whole arrays; route scoring through the
    # jnp gathers (= PsumRows) in this mode.
    p = dataclasses.replace(params, pallas="0")
    spec = P(DATA_AXIS)
    rep = P()

    def shard_fn(arrays, queries, entry_slot):
        local = GraphArrays(*(PsumRows(a[0]) for a in arrays))
        res = beam_search(
            local,
            queries,
            entry_slot,
            params=p,
            l_search=l_search,
            k=k,
            beam_width=beam_width,
            assume_all_valid=assume_all_valid,
        )
        return res.topk_slots, res.topk_dists

    fn = shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(jax.tree.map(lambda _: spec, stacked), rep, rep),
        out_specs=(rep, rep),
        check_vma=False,
    )
    return fn(stacked, queries, entry_slot)


class GlobalShardedIndex:
    """One LM-DiskANN graph whose HBM footprint is split across all chips.

    Build/DML run on the host-side Coordinator (single graph, unchanged
    semantics); ``distribute()`` block-partitions the arrays over the mesh;
    ``search`` runs the exact single-graph program with per-hop cross-shard
    row exchange. Results are ID- and distance-identical to
    ``Coordinator.search``.
    """

    def __init__(self, coordinator: Coordinator, mesh=None):
        self.coordinator = coordinator
        self.mesh = mesh if mesh is not None else make_mesh()
        self.n_shards = int(self.mesh.devices.size)
        self._stacked: GraphArrays | None = None

    # DML delegates to the single-graph Coordinator.
    def insert(self, rowids, vectors) -> None:
        self.coordinator.insert(rowids, vectors)
        self._stacked = None

    def delete(self, rowids) -> int:
        n = self.coordinator.delete(rowids)
        self._stacked = None
        return n

    def distribute(self) -> GraphArrays:
        """Block-partition the coordinator's arrays across the mesh.

        Multi-process meshes (jax.distributed): a NamedSharding spanning
        other hosts' devices is not addressable from this process, so each
        process places only its LOCAL devices' row blocks and assembles the
        global array with jax.make_array_from_single_device_arrays — every
        process holds the same full Coordinator state (the build is
        deterministic), so the assembled shards agree without any host
        ever transferring another host's rows."""
        if self._stacked is not None:
            return self._stacked
        coord = self.coordinator
        S = self.n_shards
        cap = coord.capacity
        if cap % S:
            coord._ensure_capacity(((cap // S) + 1) * S)
        sharding = NamedSharding(self.mesh, P(DATA_AXIS))
        mesh_devs = list(self.mesh.devices.flat)

        def put(a):
            rows = _stack_rows(np.asarray(a), S)
            if jax.process_count() == 1:
                return jax.device_put(rows, sharding)
            local = [
                jax.device_put(rows[g][None], d)
                for g, d in enumerate(mesh_devs)
                if d.process_index == jax.process_index()
            ]
            return jax.make_array_from_single_device_arrays(
                rows.shape, sharding, local
            )

        stacked = GraphArrays(*(put(a) for a in coord.arrays))
        self._stacked = stacked
        return stacked

    def search(
        self,
        queries: np.ndarray,
        k: int,
        l_search: int | None = None,
        beam_width: int = 1,
    ):
        """Exact single-graph top-k over the sharded arrays. Returns
        (rowids i64[B, k], dists f32[B, k]) — identical to
        ``Coordinator.search`` on the same index state."""
        coord = self.coordinator
        queries = np.atleast_2d(np.asarray(queries, np.float32))
        B = queries.shape[0]
        if coord.count == 0 or coord.entry_slot < 0:
            return (
                np.full((B, k), INVALID_ROW_ID, np.int64),
                np.full((B, k), np.inf, np.float32),
            )
        L = max(l_search if l_search is not None else coord.config.l_search, k)
        slots, dists = global_sharded_search(
            self.distribute(),
            jnp.asarray(queries),
            jnp.int32(coord.entry_slot),
            mesh=self.mesh,
            params=coord.params,
            l_search=L,
            k=k,
            assume_all_valid=not coord._ever_tombstoned,
            beam_width=beam_width,
        )
        slots = np.asarray(slots)
        rowids = np.where(
            slots >= 0,
            coord._slot_rowids[np.maximum(slots, 0)],
            INVALID_ROW_ID,
        )
        return rowids, np.asarray(dists)
