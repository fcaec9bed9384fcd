"""Beam-search engine vs the NumPy oracle: exact-ID agreement.

The judged contract is deterministic, reference-semantics traversal
(SURVEY §4: "graph-semantics tests against a NumPy/pure-JAX oracle
implementing the libSQL algorithm"). With TERNARY edges the beam distances
are small integers, so traversal order is *bit-identical* between oracle and
device; only the final exact re-rank can see float near-ties, which the
checker tolerates iff the two distances agree to ~1ulp-scale tolerance.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from duckdb_lm_diskann_tpu.common.types import EdgeType, MetricType
from duckdb_lm_diskann_tpu.core.builder import write_neighbor_rows
from duckdb_lm_diskann_tpu.core.config import LmDiskannConfig
from duckdb_lm_diskann_tpu.core.graph import GraphParams, make_graph_arrays
from duckdb_lm_diskann_tpu.core.searcher import beam_search

from tests.oracle import OracleGraph

from duckdb_lm_diskann_tpu.common.types import VectorType


def make_params(metric, edge_type, dims=16, r=8, l_insert=16, l_search=32):
    cfg = LmDiskannConfig(
        metric_type=metric,
        r=r,
        l_insert=l_insert,
        l_search=l_search,
        dimensions=dims,
        node_vector_type=VectorType.FLOAT32,
        edge_type=edge_type,
    )
    cfg.validate()
    return GraphParams.from_config(cfg)


def oracle_to_arrays(oracle: OracleGraph, params: GraphParams, capacity=None):
    """Load an oracle-built graph into device arrays (node id == slot)."""
    n = max(oracle.vectors) + 1
    capacity = capacity or n
    arrays = make_graph_arrays(params, capacity)
    vecs = np.zeros((capacity, params.dims), np.float32)
    valid = np.zeros(capacity, bool)
    nbrs = np.full((capacity, params.r), -1, np.int32)
    for nid, v in oracle.vectors.items():
        vecs[nid] = v
        valid[nid] = True
        lst = oracle.neighbors[nid]
        nbrs[nid, : len(lst)] = lst
    arrays = arrays._replace(
        vectors=jnp.asarray(vecs), valid=jnp.asarray(valid)
    )
    slots = jnp.asarray(np.arange(capacity, dtype=np.int32))
    arrays = write_neighbor_rows(arrays, slots, jnp.asarray(nbrs), params=params)
    return arrays


def assert_results_match(got_ids, got_dists, want_ids, want_dists, tol=2e-5):
    """IDs must match exactly except where the two candidates' distances
    agree within float tolerance (a genuine near-tie)."""
    got_ids, want_ids = np.asarray(got_ids), np.asarray(want_ids)
    mism = got_ids != want_ids
    if mism.any():
        d_got = np.asarray(got_dists)[mism]
        d_want = np.asarray(want_dists)[mism]
        np.testing.assert_allclose(
            d_got, d_want, atol=tol, rtol=tol,
            err_msg=f"ID mismatch beyond near-ties: got {got_ids[mism][:5]} "
                    f"want {want_ids[mism][:5]}",
        )
    np.testing.assert_allclose(got_dists, want_dists, atol=tol, rtol=tol)


CASES = [
    (MetricType.COSINE, EdgeType.TERNARY),
    (MetricType.IP, EdgeType.TERNARY),
    (MetricType.L2, EdgeType.INT8),
    (MetricType.L2, EdgeType.INT4),
    (MetricType.L2, EdgeType.FLOAT32),
    (MetricType.L2, EdgeType.FLOAT16),  # libSQL F16 (lm_diskann.hpp:58)
    (MetricType.COSINE, EdgeType.FLOAT1BIT),  # libSQL 1-bit (vectordiskann.c:518)
    (MetricType.COSINE, EdgeType.NONE),  # C++ Searcher exact-traversal mode
]


@pytest.mark.parametrize("metric,edge_type", CASES)
def test_search_matches_oracle(rng, metric, edge_type):
    n, dims, k = 200, 16, 10
    params = make_params(metric, edge_type, dims=dims)
    oracle = OracleGraph(dims, params.r, metric, edge_type,
                         params.alpha, params.l_insert, params.l_search)
    data = rng.standard_normal((n, dims)).astype(np.float32)
    oracle.build(range(n), data)
    arrays = oracle_to_arrays(oracle, params)

    queries = rng.standard_normal((8, dims)).astype(np.float32)
    res = beam_search(
        arrays, jnp.asarray(queries), jnp.int32(oracle.entry_point),
        params=params, l_search=params.l_search, k=k,
    )
    for b in range(queries.shape[0]):
        want_ids, want_dists, _, _ = oracle.search(queries[b], k)
        got_ids = np.asarray(res.topk_slots[b])[: len(want_ids)]
        got_dists = np.asarray(res.topk_dists[b])[: len(want_ids)]
        assert_results_match(got_ids, got_dists, want_ids, want_dists)


@pytest.mark.parametrize("metric,edge_type", [
    (MetricType.COSINE, EdgeType.TERNARY),
    (MetricType.L2, EdgeType.INT8),
])
def test_visited_sets_match_oracle(rng, metric, edge_type):
    """The insert path consumes the visited set; it must agree too."""
    n, dims = 150, 12
    params = make_params(metric, edge_type, dims=dims)
    oracle = OracleGraph(dims, params.r, metric, edge_type,
                         params.alpha, params.l_insert, params.l_search)
    data = rng.standard_normal((n, dims)).astype(np.float32)
    oracle.build(range(n), data)
    arrays = oracle_to_arrays(oracle, params)

    queries = rng.standard_normal((4, dims)).astype(np.float32)
    res = beam_search(
        arrays, jnp.asarray(queries), jnp.int32(oracle.entry_point),
        params=params, l_search=params.l_search, k=params.l_search,
    )
    for b in range(queries.shape[0]):
        _, _, visited, _ = oracle.search(queries[b], params.l_search)
        cnt = int(res.visited_count[b])
        got = np.asarray(res.visited_slots[b])[:cnt].tolist()
        # Visit *order* must match, not just the set.
        assert got == visited


def test_search_empty_and_single_node(rng):
    params = make_params(MetricType.COSINE, EdgeType.TERNARY, dims=8)
    arrays = make_graph_arrays(params, 16)
    q = jnp.asarray(rng.standard_normal((2, 8)).astype(np.float32))
    # Empty graph: entry -1 -> no results.
    res = beam_search(arrays, q, jnp.int32(-1), params=params,
                      l_search=8, k=3)
    assert np.all(np.asarray(res.topk_slots) == -1)
    assert np.all(np.isinf(np.asarray(res.topk_dists)))
    # Single node.
    v = rng.standard_normal((1, 8)).astype(np.float32)
    arrays = arrays._replace(
        vectors=arrays.vectors.at[0].set(jnp.asarray(v[0])),
        valid=arrays.valid.at[0].set(True),
    )
    res = beam_search(arrays, q, jnp.int32(0), params=params, l_search=8, k=3)
    slots = np.asarray(res.topk_slots)
    assert (slots[:, 0] == 0).all()
    assert (slots[:, 1:] == -1).all()


def test_zombie_edges_skipped(rng):
    """Edges to tombstoned nodes must be ignored (valid-mask filter; libSQL
    zombie handling, vectordiskann.c:1349-1354)."""
    dims = 8
    params = make_params(MetricType.COSINE, EdgeType.TERNARY, dims=dims)
    oracle = OracleGraph(dims, params.r, MetricType.COSINE, EdgeType.TERNARY,
                         params.alpha, params.l_insert, params.l_search)
    data = rng.standard_normal((50, dims)).astype(np.float32)
    oracle.build(range(50), data)
    arrays = oracle_to_arrays(oracle, params)
    # Tombstone node 7 on the device WITHOUT removing back-edges (zombie).
    arrays = arrays._replace(valid=arrays.valid.at[7].set(False))
    q = jnp.asarray(rng.standard_normal((4, dims)).astype(np.float32))
    res = beam_search(arrays, q, jnp.int32(0), params=params,
                      l_search=16, k=10)
    assert not np.any(np.asarray(res.topk_slots) == 7)


@pytest.mark.parametrize("metric,edge_type", [
    (MetricType.COSINE, EdgeType.TERNARY),
    (MetricType.L2, EdgeType.INT8),
])
def test_beam_width_expansion(rng, metric, edge_type):
    """E>1 (multi-visit hops) must preserve result quality and determinism;
    hops shrink ~E-fold."""
    n, dims, k = 300, 16, 10
    params = make_params(metric, edge_type, dims=dims)
    oracle = OracleGraph(dims, params.r, metric, edge_type,
                         params.alpha, params.l_insert, params.l_search)
    data = rng.standard_normal((n, dims)).astype(np.float32)
    oracle.build(range(n), data)
    arrays = oracle_to_arrays(oracle, params)
    queries = jnp.asarray(rng.standard_normal((8, dims)).astype(np.float32))

    r1 = beam_search(arrays, queries, jnp.int32(oracle.entry_point),
                     params=params, l_search=32, k=k, beam_width=1)
    r4 = beam_search(arrays, queries, jnp.int32(oracle.entry_point),
                     params=params, l_search=32, k=k, beam_width=4)
    r4b = beam_search(arrays, queries, jnp.int32(oracle.entry_point),
                      params=params, l_search=32, k=k, beam_width=4)
    # Deterministic across runs.
    np.testing.assert_array_equal(np.asarray(r4.topk_slots),
                                  np.asarray(r4b.topk_slots))
    # Fewer lock-step hops.
    assert int(r4.hops) < int(r1.hops)
    # Same-or-similar results: top-k overlap >= 80% per query.
    for b in range(8):
        a = set(np.asarray(r1.topk_slots[b]).tolist()) - {-1}
        c = set(np.asarray(r4.topk_slots[b]).tolist()) - {-1}
        assert len(a & c) >= 0.8 * len(a)


@pytest.mark.parametrize("width", [2, 4])
def test_beam_width_no_duplicate_results(rng, width):
    """E>1 hops can surface the same neighbor from two visited nodes in one
    iteration; the sort-stable dedup in merge_beams must keep the beam (and
    therefore the visited log and top-k) duplicate-free."""
    n, dims, k = 250, 16, 20
    params = make_params(MetricType.L2, EdgeType.INT8, dims=dims)
    oracle = OracleGraph(dims, params.r, MetricType.L2, EdgeType.INT8,
                         params.alpha, params.l_insert, params.l_search)
    data = rng.standard_normal((n, dims)).astype(np.float32)
    oracle.build(range(n), data)
    arrays = oracle_to_arrays(oracle, params)
    queries = jnp.asarray(rng.standard_normal((6, dims)).astype(np.float32))
    res = beam_search(arrays, queries, jnp.int32(oracle.entry_point),
                      params=params, l_search=32, k=k, beam_width=width)
    for b in range(6):
        top = [s for s in np.asarray(res.topk_slots[b]).tolist() if s >= 0]
        assert len(top) == len(set(top)), f"duplicate top-k slots: {top}"
        cnt = int(res.visited_count[b])
        vis = np.asarray(res.visited_slots[b])[:cnt].tolist()
        assert len(vis) == len(set(vis)), f"duplicate visits: {vis}"


def test_beam_search_many_bit_identical(rng):
    """The pipelined multi-batch scan (beam_search_many) must return
    bit-identical top-k to NB separate beam_search dispatches, and
    Coordinator.search(batch_size=...) must match the unbatched path."""
    from duckdb_lm_diskann_tpu.core.searcher import beam_search_many

    n, dims, k = 300, 16, 10
    params = make_params(MetricType.L2, EdgeType.INT8, dims=dims)
    oracle = OracleGraph(dims, params.r, MetricType.L2, EdgeType.INT8,
                         params.alpha, params.l_insert, params.l_search)
    data = rng.standard_normal((n, dims)).astype(np.float32)
    oracle.build(range(n), data)
    arrays = oracle_to_arrays(oracle, params)
    queries = rng.standard_normal((4, 8, dims)).astype(np.float32)  # NB=4,B=8

    many = beam_search_many(
        arrays, jnp.asarray(queries), jnp.int32(oracle.entry_point),
        params=params, l_search=32, k=k,
    )
    for nb in range(4):
        one = beam_search(
            arrays, jnp.asarray(queries[nb]), jnp.int32(oracle.entry_point),
            params=params, l_search=32, k=k,
        )
        np.testing.assert_array_equal(
            np.asarray(many.topk_slots[nb]), np.asarray(one.topk_slots)
        )
        np.testing.assert_array_equal(
            np.asarray(many.topk_dists[nb]), np.asarray(one.topk_dists)
        )
        assert int(many.hops[nb]) == int(one.hops)

    # Coordinator path: batch_size splits (with padding) must be invisible.
    from duckdb_lm_diskann_tpu.core.config import LmDiskannConfig
    from duckdb_lm_diskann_tpu.core.coordinator import Coordinator
    from duckdb_lm_diskann_tpu.common.types import VectorType

    cfg = LmDiskannConfig(
        metric_type=MetricType.L2, r=8, l_insert=16, l_search=32,
        dimensions=dims, node_vector_type=VectorType.FLOAT32,
        edge_type=EdgeType.INT8,
    )
    cfg.validate()
    coord = Coordinator(cfg)
    coord.bulk_build(list(range(n)), data, max_batch=64)
    q2 = rng.standard_normal((21, dims)).astype(np.float32)  # 21 % 8 != 0
    ids_a, d_a = coord.search(q2, k)
    ids_b, d_b = coord.search(q2, k, batch_size=8)
    np.testing.assert_array_equal(ids_a, ids_b)
    np.testing.assert_array_equal(d_a, d_b)


def test_per_query_seeds_match_shared(rng):
    """beam_search with i32[B, S] per-query seeds where every row carries
    the SAME seed set must be bit-identical to the shared i32[S] form
    (the broadcast is the only difference)."""
    n, dims, k = 200, 16, 5
    params = make_params(MetricType.COSINE, EdgeType.TERNARY, dims=dims)
    oracle = OracleGraph(dims, params.r, MetricType.COSINE, EdgeType.TERNARY,
                         params.alpha, params.l_insert, params.l_search)
    data = rng.standard_normal((n, dims)).astype(np.float32)
    oracle.build(range(n), data)
    arrays = oracle_to_arrays(oracle, params)
    queries = rng.standard_normal((6, dims)).astype(np.float32)
    seeds = np.asarray([oracle.entry_point, 3, 17], np.int32)

    shared = beam_search(
        arrays, jnp.asarray(queries), jnp.asarray(seeds),
        params=params, l_search=32, k=k,
    )
    per_query = beam_search(
        arrays, jnp.asarray(queries),
        jnp.broadcast_to(jnp.asarray(seeds)[None, :], (6, 3)),
        params=params, l_search=32, k=k,
    )
    np.testing.assert_array_equal(
        np.asarray(per_query.topk_slots), np.asarray(shared.topk_slots)
    )
    np.testing.assert_array_equal(
        np.asarray(per_query.topk_dists), np.asarray(shared.topk_dists)
    )


def test_adaptive_seeds_search(rng):
    """Coordinator.search(adaptive_seeds=...) seeds each query at its
    nearest sampled nodes: results stay exact self-matches, work through
    the pipelined batch_size path, and the seeds actually differ per
    query (distinct clusters -> distinct seed rows)."""
    from duckdb_lm_diskann_tpu.core.config import LmDiskannConfig
    from duckdb_lm_diskann_tpu.core.coordinator import Coordinator
    from duckdb_lm_diskann_tpu.common.types import VectorType

    n, dims = 400, 16
    # two well-separated clusters
    data = np.concatenate([
        rng.standard_normal((n // 2, dims)).astype(np.float32) + 20.0,
        rng.standard_normal((n // 2, dims)).astype(np.float32) - 20.0,
    ])
    cfg = LmDiskannConfig(
        metric_type=MetricType.L2, r=8, l_insert=16, l_search=32,
        dimensions=dims, node_vector_type=VectorType.FLOAT32,
        edge_type=EdgeType.INT8,
    )
    cfg.validate()
    coord = Coordinator(cfg)
    coord.bulk_build(list(range(n)), data, max_batch=64)

    q = data[[0, n - 1]]  # one query per cluster
    view = coord.capture_view()
    import jax.numpy as jnp2

    seeds = coord._pick_adaptive(view, jnp2.asarray(q), 2, 64, 32)
    assert seeds.shape == (2, 2)
    assert not np.array_equal(np.asarray(seeds[0]), np.asarray(seeds[1]))

    ids, _ = coord.search(q, 1, adaptive_seeds=2)
    np.testing.assert_array_equal(ids[:, 0], [0, n - 1])
    # pipelined path with adaptive seeds
    q8 = data[: 7]
    ids_b, d_b = coord.search(q8, 3, adaptive_seeds=2, batch_size=2)
    ids_u, d_u = coord.search(q8, 3, adaptive_seeds=2)
    np.testing.assert_array_equal(ids_b, ids_u)
    np.testing.assert_array_equal(d_b, d_u)


def test_adaptive_seed_sample_covers_live_tail(rng):
    """Regression (round-4 review): the seed sample must span the WHOLE
    live range. The original fixed-stride slice covered only the first
    m*floor(len/m) live slots, so with len(live) < 2*seed_sample the
    insertion-order tail — whole clusters, on clustered corpora — could
    never be chosen as a seed."""
    from duckdb_lm_diskann_tpu.core.config import LmDiskannConfig
    from duckdb_lm_diskann_tpu.core.coordinator import Coordinator
    from duckdb_lm_diskann_tpu.common.types import VectorType

    n_a, n_b, dims = 400, 300, 8
    data = np.concatenate([
        rng.standard_normal((n_a, dims)).astype(np.float32),
        rng.standard_normal((n_b, dims)).astype(np.float32) + 40.0,
    ])
    cfg = LmDiskannConfig(
        metric_type=MetricType.L2, r=8, l_insert=16, l_search=32,
        dimensions=dims, node_vector_type=VectorType.FLOAT32,
        edge_type=EdgeType.INT8,
    )
    cfg.validate()
    coord = Coordinator(cfg)
    coord.bulk_build(list(range(n_a + n_b)), data, max_batch=64)

    import jax.numpy as jnp2

    view = coord.capture_view()
    # seed_sample (512) > len(live)/2 (700): the buggy stride sampled only
    # slots [0, 512) and this cluster-B query could never seed in B.
    seeds = coord._pick_adaptive(
        view, jnp2.asarray(data[n_a + 250 : n_a + 251]), 2, 512, 32
    )
    assert (np.asarray(seeds) >= n_a).all(), np.asarray(seeds).tolist()


# --------------------------------------------------------------------- #
# Streaming lane-refill search (beam_search_stream): per-query results
# must be bit-identical to the lock-step path — lane packing is a pure
# scheduling change (SURVEY §7.3 skew rebatching).

@pytest.mark.parametrize("metric,edge_type", [
    (MetricType.COSINE, EdgeType.TERNARY),
    (MetricType.L2, EdgeType.INT4),
    (MetricType.L2, EdgeType.FLOAT32),
])
def test_stream_matches_batch(rng, metric, edge_type):
    from duckdb_lm_diskann_tpu.core.searcher import beam_search_stream

    n, dims, k = 300, 16, 10
    params = make_params(metric, edge_type, dims=dims)
    oracle = OracleGraph(dims, params.r, metric, edge_type,
                         params.alpha, params.l_insert, params.l_search)
    data = rng.standard_normal((n, dims)).astype(np.float32)
    oracle.build(range(n), data)
    arrays = oracle_to_arrays(oracle, params)

    nq = 37  # ragged vs lanes=8: many refill waves
    queries = rng.standard_normal((nq, dims)).astype(np.float32)
    want = beam_search(
        arrays, jnp.asarray(queries), jnp.int32(oracle.entry_point),
        params=params, l_search=params.l_search, k=k,
    )
    got = beam_search_stream(
        arrays, jnp.asarray(queries), jnp.int32(oracle.entry_point),
        params=params, l_search=params.l_search, k=k, lanes=8,
    )
    np.testing.assert_array_equal(
        np.asarray(got.topk_slots), np.asarray(want.topk_slots))
    np.testing.assert_array_equal(
        np.asarray(got.topk_dists), np.asarray(want.topk_dists))
    np.testing.assert_array_equal(
        np.asarray(got.visited_count), np.asarray(want.visited_count))
    # Packing bound: total iterations within slack of ceil(visits/lanes).
    total_visits = int(np.asarray(want.visited_count).sum())
    assert int(got.hops) <= -(-total_visits // 8) + 2 * 8 + 40


def test_stream_lanes_exceed_queries(rng):
    from duckdb_lm_diskann_tpu.core.searcher import beam_search_stream

    n, dims, k = 120, 12, 5
    params = make_params(MetricType.L2, EdgeType.INT8, dims=dims)
    oracle = OracleGraph(dims, params.r, MetricType.L2, EdgeType.INT8,
                         params.alpha, params.l_insert, params.l_search)
    data = rng.standard_normal((n, dims)).astype(np.float32)
    oracle.build(range(n), data)
    arrays = oracle_to_arrays(oracle, params)
    queries = rng.standard_normal((3, dims)).astype(np.float32)
    want = beam_search(
        arrays, jnp.asarray(queries), jnp.int32(oracle.entry_point),
        params=params, l_search=params.l_search, k=k,
    )
    got = beam_search_stream(
        arrays, jnp.asarray(queries), jnp.int32(oracle.entry_point),
        params=params, l_search=params.l_search, k=k, lanes=64,
    )
    np.testing.assert_array_equal(
        np.asarray(got.topk_slots), np.asarray(want.topk_slots))
    np.testing.assert_array_equal(
        np.asarray(got.topk_dists), np.asarray(want.topk_dists))


def test_stream_per_query_seeds_and_allowed(rng):
    """Adaptive per-query seeds + filtered search through the stream path."""
    from duckdb_lm_diskann_tpu.core.searcher import beam_search_stream

    n, dims, k = 200, 16, 8
    params = make_params(MetricType.COSINE, EdgeType.TERNARY, dims=dims)
    oracle = OracleGraph(dims, params.r, MetricType.COSINE, EdgeType.TERNARY,
                         params.alpha, params.l_insert, params.l_search)
    data = rng.standard_normal((n, dims)).astype(np.float32)
    oracle.build(range(n), data)
    arrays = oracle_to_arrays(oracle, params)

    nq = 19
    queries = rng.standard_normal((nq, dims)).astype(np.float32)
    seeds = rng.integers(0, n, (nq, 3)).astype(np.int32)
    allowed = np.zeros(n, bool)
    allowed[rng.choice(n, 80, replace=False)] = True
    want = beam_search(
        arrays, jnp.asarray(queries), jnp.asarray(seeds),
        params=params, l_search=params.l_search, k=k,
        allowed=jnp.asarray(allowed),
    )
    got = beam_search_stream(
        arrays, jnp.asarray(queries), jnp.asarray(seeds),
        params=params, l_search=params.l_search, k=k, lanes=4,
        allowed=jnp.asarray(allowed),
    )
    np.testing.assert_array_equal(
        np.asarray(got.topk_slots), np.asarray(want.topk_slots))
    np.testing.assert_array_equal(
        np.asarray(got.topk_dists), np.asarray(want.topk_dists))


def test_stream_zombie_edges(rng):
    """Tombstoned targets filtered identically (assume_all_valid=False)."""
    from duckdb_lm_diskann_tpu.core.searcher import beam_search_stream

    dims = 8
    params = make_params(MetricType.COSINE, EdgeType.TERNARY, dims=dims)
    oracle = OracleGraph(dims, params.r, MetricType.COSINE, EdgeType.TERNARY,
                         params.alpha, params.l_insert, params.l_search)
    data = rng.standard_normal((60, dims)).astype(np.float32)
    oracle.build(range(60), data)
    arrays = oracle_to_arrays(oracle, params)
    arrays = arrays._replace(valid=arrays.valid.at[7].set(False))
    queries = rng.standard_normal((9, dims)).astype(np.float32)
    want = beam_search(
        arrays, jnp.asarray(queries), jnp.int32(0),
        params=params, l_search=16, k=10,
    )
    got = beam_search_stream(
        arrays, jnp.asarray(queries), jnp.int32(0),
        params=params, l_search=16, k=10, lanes=4,
    )
    np.testing.assert_array_equal(
        np.asarray(got.topk_slots), np.asarray(want.topk_slots))
    assert not np.any(np.asarray(got.topk_slots) == 7)


def test_coordinator_stream_search_matches(rng):
    from duckdb_lm_diskann_tpu.core.config import LmDiskannConfig
    from duckdb_lm_diskann_tpu.core.coordinator import Coordinator
    from duckdb_lm_diskann_tpu.common.types import VectorType

    n, dims = 400, 12
    data = rng.standard_normal((n, dims)).astype(np.float32)
    cfg = LmDiskannConfig(
        metric_type=MetricType.L2, r=8, l_insert=16, l_search=32,
        dimensions=dims, node_vector_type=VectorType.FLOAT32,
        edge_type=EdgeType.INT4,
    )
    cfg.validate()
    coord = Coordinator(cfg)
    coord.bulk_build(list(range(n)), data, max_batch=64)
    q = rng.standard_normal((23, dims)).astype(np.float32)
    ids_a, d_a = coord.search(q, 5)
    ids_s, d_s = coord.search(q, 5, stream=True, lanes=4)
    np.testing.assert_array_equal(ids_a, ids_s)
    np.testing.assert_array_equal(d_a, d_s)
    # adaptive seeds through the stream path too
    ids_b, d_b = coord.search(q, 5, adaptive_seeds=2, seed_sample=64)
    ids_t, d_t = coord.search(q, 5, adaptive_seeds=2, seed_sample=64,
                              stream=True, lanes=8)
    np.testing.assert_array_equal(ids_b, ids_t)
    np.testing.assert_array_equal(d_b, d_t)
    # deletes flip assume_all_valid; stream must honor the valid mask
    coord.delete(list(range(0, 50)))
    ids_c, d_c = coord.search(q, 5)
    ids_u, d_u = coord.search(q, 5, stream=True, lanes=8)
    np.testing.assert_array_equal(ids_c, ids_u)
    np.testing.assert_array_equal(d_c, d_u)


def test_search_pad_to_bucket(rng):
    """Bucketed interactive serving: results identical, pads discarded,
    and odd batch sizes map onto the pinned bucket set."""
    from duckdb_lm_diskann_tpu.core.config import LmDiskannConfig
    from duckdb_lm_diskann_tpu.core.coordinator import Coordinator
    from duckdb_lm_diskann_tpu.common.types import VectorType

    n, dims = 300, 10
    data = rng.standard_normal((n, dims)).astype(np.float32)
    cfg = LmDiskannConfig(
        metric_type=MetricType.L2, r=8, l_insert=16, l_search=32,
        dimensions=dims, node_vector_type=VectorType.FLOAT32,
        edge_type=EdgeType.INT8,
    )
    cfg.validate()
    coord = Coordinator(cfg)
    coord.bulk_build(list(range(n)), data, max_batch=64)
    for nb in (1, 3, 7, 9):
        q = rng.standard_normal((nb, dims)).astype(np.float32)
        ids_a, d_a = coord.search(q, 5)
        ids_b, d_b = coord.search(q, 5, pad_to_bucket=True)
        assert ids_b.shape == (nb, 5)
        np.testing.assert_array_equal(ids_a, ids_b)
        np.testing.assert_array_equal(d_a, d_b)
