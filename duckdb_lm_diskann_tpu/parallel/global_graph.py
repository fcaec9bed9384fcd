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
from ..core.builder import (
    _pair_chunk,
    _pow2_at_least,
    _RECIP_ROUNDS,
    insert_step,
    refresh_edge_codes,
    store_vectors,
)
from ..core.coordinator import Coordinator
from ..core.graph import GraphArrays, GraphParams, make_graph_arrays
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

    def astype(self, dtype):
        return PsumRows(self.local.astype(dtype), self.axis)

    @property
    def at(self):
        """Owner-masked functional scatter: ``rows.at[idx].set(vals,
        mode='drop')`` applies each row update on the shard that owns it
        (global slot g lives on shard g // C_local) and drops it everywhere
        else — the write-side dual of the psum gather. Every shard executes
        the same replicated update program, so each row is written exactly
        once, by its owner, with the same value it would get on one chip.
        Only ``mode='drop'`` row scatters are supported (the builder's
        write discipline: invalid targets carry the capacity sentinel)."""
        return _PsumRowsAt(self)


class _PsumRowsAt:
    def __init__(self, rows: "PsumRows"):
        self._rows = rows

    def __getitem__(self, idx):
        return _PsumRowsAtIndexer(self._rows, idx)


class _PsumRowsAtIndexer:
    def __init__(self, rows: "PsumRows", idx):
        self._rows = rows
        self._idx = idx

    def _local_idx(self) -> jnp.ndarray:
        rows = self._rows
        idx = jnp.asarray(self._idx)
        c_local = rows.local.shape[0]
        me = jax.lax.axis_index(rows.axis)
        own = (idx >= 0) & ((idx // c_local) == me)
        # Non-owned rows get the out-of-bounds local index; with
        # mode='drop' below the scatter skips them (never wraps).
        return jnp.where(own, idx % c_local, c_local)

    def set(self, vals, mode: str = "drop"):
        if mode != "drop":
            raise NotImplementedError("PsumRows scatters require mode='drop'")
        rows = self._rows
        return PsumRows(
            rows.local.at[self._local_idx()].set(vals, mode="drop"), rows.axis
        )

    def add(self, vals, mode: str = "drop"):
        if mode != "drop":
            raise NotImplementedError("PsumRows scatters require mode='drop'")
        rows = self._rows
        return PsumRows(
            rows.local.at[self._local_idx()].add(vals, mode="drop"), rows.axis
        )

    def max(self, vals, mode: str = "drop"):
        if mode != "drop":
            raise NotImplementedError("PsumRows scatters require mode='drop'")
        rows = self._rows
        return PsumRows(
            rows.local.at[self._local_idx()].max(vals, mode="drop"), rows.axis
        )


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


def _alloc_stacked(params: GraphParams, capacity: int, mesh) -> GraphArrays:
    """Zeroed row-sharded arrays [S, C/S, ...]: each device materializes
    ONLY its own shard (jit + out_shardings writes per-device constants),
    so the full [C, ...] arrays never exist on any one device — the
    precondition for building an index larger than one chip's HBM."""
    S = int(mesh.devices.size)
    if capacity % S:
        raise ValueError("capacity must divide the mesh size")
    sharding = NamedSharding(mesh, P(DATA_AXIS))

    @functools.partial(jax.jit, out_shardings=sharding)
    def alloc():
        local = make_graph_arrays(params, capacity // S)
        return GraphArrays(
            *(jnp.broadcast_to(a[None], (S,) + a.shape) for a in local)
        )

    return alloc()


@functools.partial(
    jax.jit, static_argnames=("mesh",), donate_argnums=(0,)
)
def _global_store(stacked: GraphArrays, slots, vecs, *, mesh) -> GraphArrays:
    """store_vectors over row-sharded arrays (the first-node bootstrap)."""
    spec = P(DATA_AXIS)
    rep = P()

    def shard_fn(arrays, slots, vecs):
        local = GraphArrays(*(PsumRows(a[0]) for a in arrays))
        out = store_vectors.__wrapped__(local, slots, vecs)
        return GraphArrays(*(a.local[None] for a in out))

    fn = shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(jax.tree.map(lambda _: spec, stacked), rep, rep),
        out_specs=jax.tree.map(lambda _: spec, stacked),
        check_vma=False,
    )
    return fn(stacked, slots, vecs)


@functools.partial(
    jax.jit,
    static_argnames=("mesh", "params", "full_visited", "recip_rounds"),
    donate_argnums=(0,),
)
def _global_insert_step(
    stacked: GraphArrays,
    new_slots,  # i32[M] global slots (-1 padded)
    new_vecs,  # f32[M, D] (replicated)
    entry_slot,  # i32[]
    *,
    mesh,
    params: GraphParams,
    full_visited: bool,
    recip_rounds: int,
) -> GraphArrays:
    """One whole batched Vamana insert over ROW-SHARDED arrays — the
    device-scaled build path (SURVEY §7.2 M5). The UNCHANGED single-graph
    insert program (core/builder.insert_step: candidate search,
    RobustPrune, neighbor write, reciprocal replace/prune rounds, in-link
    guarantee, deferred edge-code refresh) runs replicated on every shard
    inside shard_map, with every row gather reassembled by PsumRows' psum
    exchange and every row write applied shard-locally by the owner
    (PsumRows.at). Compute is replicated; graph MEMORY is 1/S per device —
    the binding constraint at the BASELINE 100M target (~510 GB of graph
    state, docs/SCALING.md). Results are bit-identical to the single-chip
    build: gathers are exact (x + 0), writes land once, and all arithmetic
    runs at the same shapes in the same order."""
    p = dataclasses.replace(params, pallas="0")
    spec = P(DATA_AXIS)
    rep = P()

    def shard_fn(arrays, new_slots, new_vecs, entry_slot):
        local = GraphArrays(*(PsumRows(a[0]) for a in arrays))
        out, refresh_t, refresh_f = insert_step.__wrapped__(
            local,
            new_slots,
            new_vecs,
            entry_slot,
            params=p,
            full_visited=full_visited,
            recip_rounds=recip_rounds,
            # fresh build, no tombstones: same flag the single-chip bulk
            # path passes (coordinator.insert all_valid)
            all_valid=True,
        )
        # Deferred edge-code refresh in the same bounded chunks as
        # insert_batch (per-shard caches are 1/S, so one traced program
        # holds the whole chain comfortably).
        CH = _pair_chunk(refresh_t.shape[0], p.r, p.dims)
        for off in range(0, refresh_t.shape[0], CH):
            out = refresh_edge_codes.__wrapped__(
                out, refresh_t[off : off + CH], params=p
            )
        out = refresh_edge_codes.__wrapped__(out, refresh_f, params=p)
        return GraphArrays(*(a.local[None] for a in out))

    fn = shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(jax.tree.map(lambda _: spec, stacked), rep, rep, rep),
        out_specs=jax.tree.map(lambda _: spec, stacked),
        check_vma=False,
    )
    return fn(stacked, new_slots, new_vecs, entry_slot)


@jax.jit
def _medoid_stacked(vectors, valid):
    """Medoid over row-sharded [S, C/S, D] vectors (GSPMD inserts the
    cross-shard reductions). Same formula as Coordinator.set_entry_to_medoid;
    the cross-row mean reduction runs at a different shape, so the mean can
    differ in final-ulp rounding — the argmin choice is identical unless two
    rows are equidistant-to-ulp from the dataset mean."""
    v = vectors.astype(jnp.float32)
    cnt = jnp.maximum(jnp.sum(valid), 1)
    mean = jnp.sum(
        jnp.where(valid[..., None], v, 0.0), axis=(0, 1)
    ) / cnt.astype(jnp.float32)
    d = jnp.sum((v - mean[None, None, :]) ** 2, axis=-1)
    d = jnp.where(valid, d, jnp.inf)
    return jnp.argmin(d.reshape(-1))


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
        # True once the graph was BUILT sharded (distributed_build): the
        # full arrays have never existed on any one device/process, and all
        # further DML must stay on the sharded path.
        self._distributed = False

    # DML delegates to the single-graph Coordinator — except after a
    # distributed build, where the replicated Coordinator arrays were never
    # populated and inserts run the sharded program directly.
    def insert(self, rowids, vectors) -> None:
        if self._distributed:
            self._distributed_insert(rowids, vectors)
            return
        self.coordinator.insert(rowids, vectors)
        self._stacked = None

    def delete(self, rowids) -> int:
        if self._distributed:
            raise NotImplementedError(
                "DELETE on a distributed-built global index is not wired "
                "yet: the repair/rescue programs scan whole tables "
                "(rescue_orphans_round's in-link histogram), which PsumRows "
                "does not reassemble. Rebuild, or use the replicated "
                "GlobalShardedIndex/ShardedIndex modes for delete-heavy "
                "workloads."
            )
        n = self.coordinator.delete(rowids)
        self._stacked = None
        return n

    # ------------------------------------------------------------------ #
    # device-scaled build: graph memory 1/S per device at BUILD time too

    def distributed_build(
        self, rowids, vectors, max_batch: int = 1024
    ) -> None:
        """Bulk-build the single global graph directly into row-sharded
        arrays: per-device graph memory is capacity/S for the whole build
        (not just for search), so an index larger than one chip's HBM can
        be CONSTRUCTED, not only served. The ramp schedule, batch padding,
        reciprocal rounds, and entry/medoid policy mirror
        Coordinator.insert/bulk_build statement-for-statement, and every
        batch runs core/builder.insert_step unchanged over PsumRows — so
        the resulting graph (and every search over it) is identical to the
        single-chip build's."""
        coord = self.coordinator
        if coord.count or self._stacked is not None:
            raise RuntimeError("distributed_build requires an empty index")
        vectors = np.ascontiguousarray(
            np.atleast_2d(np.asarray(vectors)), np.float32
        )
        rowids = [int(r) for r in rowids]
        n = len(rowids)
        if vectors.shape[0] != n:
            raise ValueError("rowids/vectors length mismatch")
        if vectors.shape[1] != coord.config.dimensions:
            raise ValueError(
                f"vector dimensions {vectors.shape[1]} != index dimensions "
                f"{coord.config.dimensions}"
            )
        S = self.n_shards
        cap = _pow2_at_least(max(n, S, 1))
        if cap % S:
            cap = ((cap // S) + 1) * S
        stacked = _alloc_stacked(coord.params, cap, self.mesh)
        slots = coord.allocator.allocate_batch(rowids)
        try:
            stacked = self._sharded_insert_loop(
                stacked, slots, vectors, max_batch, graph_size=0
            )
        except Exception:
            for r in rowids:
                if r in coord.allocator.rowid_to_slot:
                    coord.allocator.free(r)
            raise
        sr = np.full(cap, INVALID_ROW_ID, np.int64)
        sr[slots] = np.asarray(rowids, np.int64)
        coord._slot_rowids = sr
        coord.entry_slot = int(slots[0])
        coord.entry_rowid = rowids[0]
        self._stacked = stacked
        self._distributed = True
        # Entry -> medoid, like bulk_build's set_entry_to_medoid.
        m = int(_medoid_stacked(stacked.vectors, stacked.valid))
        if m in coord.allocator.slot_to_rowid:
            coord.entry_slot = m
            coord.entry_rowid = coord.allocator.slot_to_rowid[m]
        coord.dirty = True

    def _sharded_insert_loop(
        self,
        stacked: GraphArrays,
        slots: np.ndarray,
        vectors: np.ndarray,
        max_batch: int,
        graph_size: int,
    ) -> GraphArrays:
        """The Coordinator.insert ramp loop (step = min(remaining,
        graph_size, max_batch)) + insert_batch's bulk padding, over the
        sharded program."""
        import jax.numpy as jnp  # local: keep module import-safe

        coord = self.coordinator
        n = len(slots)
        offset = 0
        entry = coord.entry_slot
        if entry < 0 and n:
            stacked = _global_store(
                stacked,
                jnp.asarray(slots[:1], jnp.int32),
                jnp.asarray(vectors[:1], jnp.float32),
                mesh=self.mesh,
            )
            entry = int(slots[0])
            coord.entry_slot = entry
            offset = 1
            graph_size = 1
        while offset < n:
            step = min(n - offset, graph_size, max_batch)
            # insert_batch's _pad_bulk shape pinning: every ramp batch pads
            # to ONE compiled width (floor 64 for multi-row batches).
            pad_to = max_batch
            if step > 1:
                pad_to = max(pad_to, 64)
            bs = np.concatenate(
                [
                    np.asarray(slots[offset : offset + step], np.int32),
                    np.full(pad_to - step, -1, np.int32),
                ]
            )
            bv = vectors[offset : offset + step]
            if pad_to > step:
                bv = np.concatenate(
                    [bv, np.broadcast_to(bv[:1], (pad_to - step, bv.shape[1]))]
                )
            stacked = _global_insert_step(
                stacked,
                jnp.asarray(bs, jnp.int32),
                jnp.asarray(bv, jnp.float32),
                jnp.int32(entry),
                mesh=self.mesh,
                params=coord.params,
                full_visited=step == 1,
                recip_rounds=1 if step == 1 else _RECIP_ROUNDS,
            )
            offset += step
            graph_size += step
        return stacked

    def _distributed_insert(self, rowids, vectors) -> None:
        """Incremental insert after a distributed build (fixed capacity:
        the sharded arrays are pre-sized; growth would need a stacked
        re-pad, deliberately not silent)."""
        coord = self.coordinator
        vectors = np.ascontiguousarray(
            np.atleast_2d(np.asarray(vectors)), np.float32
        )
        rowids = [int(r) for r in rowids]
        if vectors.shape[0] != len(rowids):
            raise ValueError("rowids/vectors length mismatch")
        cap = int(self._stacked.vectors.shape[0] * self._stacked.vectors.shape[1])
        if coord.allocator.high_water + len(rowids) > cap:
            raise RuntimeError(
                f"distributed index at capacity {cap}; pre-size "
                "distributed_build for the full expected row count"
            )
        slots = coord.allocator.allocate_batch(rowids)
        try:
            self._stacked = self._sharded_insert_loop(
                self._stacked,
                slots,
                vectors,
                coord.max_insert_batch,
                graph_size=coord.count - len(rowids),
            )
        except Exception:
            for r in rowids:
                if r in coord.allocator.rowid_to_slot:
                    coord.allocator.free(r)
            raise
        sr = coord._slot_rowids.copy()
        sr[slots] = np.asarray(rowids, np.int64)
        coord._slot_rowids = sr
        coord.dirty = True

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
