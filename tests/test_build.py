"""Vamana build validation: oracle-exact sequential semantics + recall.

SURVEY §4's test prescription: graph semantics vs the oracle, then
end-to-end recall@k vs brute force (M2: recall@10 >= 0.95 target at full
scale; small synthetic sets here must clear 0.9 comfortably).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from duckdb_lm_diskann_tpu.common.types import EdgeType, MetricType, VectorType
from duckdb_lm_diskann_tpu.core.builder import (
    batched_robust_prune,
    build_schedule,
)
from duckdb_lm_diskann_tpu.core.config import LmDiskannConfig
from duckdb_lm_diskann_tpu.core.coordinator import Coordinator
from duckdb_lm_diskann_tpu.core.graph import GraphParams

from tests.oracle import OracleGraph, brute_force_topk
from tests.test_beam_search import make_params, oracle_to_arrays


def make_config(metric, edge_type, dims, r=8, l_insert=16, l_search=32):
    cfg = LmDiskannConfig(
        metric_type=metric, r=r, l_insert=l_insert, l_search=l_search,
        dimensions=dims, node_vector_type=VectorType.FLOAT32,
        edge_type=edge_type,
    )
    cfg.validate()
    return cfg


def test_build_schedule_ramps():
    s = build_schedule(100, max_batch=32)
    assert sum(s) == 100
    assert s[0] == 1 and max(s) <= 32
    assert build_schedule(1) == [1]


@pytest.mark.parametrize("metric,edge_type", [
    (MetricType.COSINE, EdgeType.TERNARY),
    (MetricType.L2, EdgeType.INT8),
])
def test_robust_prune_matches_oracle(rng, metric, edge_type):
    """batched_robust_prune == GraphManager::RobustPrune semantics."""
    dims, n = 12, 60
    params = make_params(metric, edge_type, dims=dims)
    oracle = OracleGraph(dims, params.r, metric, edge_type,
                         params.alpha, params.l_insert, params.l_search)
    data = rng.standard_normal((n, dims)).astype(np.float32)
    # Build a small graph so candidate vectors exist.
    oracle.build(range(n), data)
    arrays = oracle_to_arrays(oracle, params)

    # Prune a fresh query point against a random candidate set (with dups
    # and invalid entries mixed in).
    node_vecs = rng.standard_normal((4, dims)).astype(np.float32)
    cand = rng.integers(0, n, size=(4, 24)).astype(np.int32)
    cand[:, 5] = cand[:, 4]  # duplicate
    cand[:, 7] = -1  # invalid
    sel = np.asarray(batched_robust_prune(
        arrays, jnp.asarray(node_vecs), jnp.asarray(cand),
        jnp.full((4,), -1, jnp.int32), params=params,
    ))
    for t in range(4):
        want = oracle.robust_prune(node_vecs[t], [int(c) for c in cand[t] if c >= 0])
        got = [int(s) for s in sel[t] if s >= 0]
        assert got == want


@pytest.mark.parametrize("metric,edge_type", [
    (MetricType.COSINE, EdgeType.TERNARY),
    (MetricType.L2, EdgeType.INT8),
    (MetricType.L2, EdgeType.INT4),
])
def test_sequential_build_matches_oracle_graph(rng, metric, edge_type):
    """Inserting one row at a time must reproduce the oracle's graph
    topology exactly (neighbor lists in order)."""
    dims, n = 10, 80
    cfg = make_config(metric, edge_type, dims)
    coord = Coordinator(cfg, initial_capacity=128)
    oracle = OracleGraph(dims, cfg.r, metric, cfg.resolve_edge_type(),
                         cfg.alpha, cfg.l_insert, cfg.l_search)
    data = rng.standard_normal((n, dims)).astype(np.float32)
    for i in range(n):
        coord.insert([i], data[i : i + 1])
        oracle.insert(i, data[i])

    nbrs = np.asarray(coord.arrays.neighbors)
    for i in range(n):
        got = [int(s) for s in nbrs[i] if s >= 0]
        # slots == rowids here (append-only, insertion order)
        assert got == oracle.neighbors[i], f"node {i}"


def clustered_data(rng, n, dims, n_clusters=50, spread=0.15):
    """Clustered synthetic set: real ANN corpora (SIFT/GIST/DEEP) have strong
    cluster structure; isotropic gaussian noise is the known-degenerate case
    for *any* compressed-edge ANN (neighbors barely closer than strangers),
    including the reference's ternary codes."""
    centers = rng.standard_normal((n_clusters, dims)).astype(np.float32)
    assign = rng.integers(0, n_clusters, n)
    noise = spread * rng.standard_normal((n, dims)).astype(np.float32)
    return centers[assign] + noise


@pytest.mark.parametrize("metric,edge_type,min_recall", [
    (MetricType.COSINE, EdgeType.TERNARY, 0.95),
    (MetricType.IP, EdgeType.TERNARY, 0.90),
    (MetricType.L2, EdgeType.INT8, 0.85),
    (MetricType.L2, EdgeType.INT4, 0.85),
])
def test_batched_build_recall(rng, metric, edge_type, min_recall):
    """End-to-end: batched build -> search -> recall@10 vs brute force."""
    dims, n, k = 48, 2000, 10
    cfg = make_config(metric, edge_type, dims, r=16, l_insert=32, l_search=96)
    coord = Coordinator(cfg, initial_capacity=2048)
    data = clustered_data(rng, n, dims)
    if metric is MetricType.IP:
        # MIPS over unnormalized data favors large norms and is norm-blind in
        # ternary codes; normalize, as MIPS deployments of the reference do.
        data = data / np.linalg.norm(data, axis=1, keepdims=True)
    coord.bulk_build(list(range(n)), data, max_batch=256)

    qidx = rng.integers(0, n, 32)
    queries = data[qidx] + 0.05 * rng.standard_normal(
        (32, dims)
    ).astype(np.float32)
    ids, dists = coord.search(queries, k)
    truth = brute_force_topk(queries, data, metric, k)
    recall = np.mean([
        len(set(ids[b].tolist()) & set(truth[b].tolist())) / k
        for b in range(len(queries))
    ])
    assert recall >= min_recall, f"recall@{k} = {recall}"
    # Distances must be the true exact distances of the returned ids.
    from tests.oracle import exact_distance
    for b in range(3):
        for j in range(k):
            if ids[b, j] >= 0:
                want = exact_distance(queries[b], data[ids[b, j]], metric)
                assert abs(float(dists[b, j]) - want) < 1e-4


def test_search_stats_populated(rng):
    cfg = make_config(MetricType.COSINE, EdgeType.TERNARY, 8)
    coord = Coordinator(cfg)
    data = rng.standard_normal((50, 8)).astype(np.float32)
    coord.bulk_build(list(range(50)), data)
    coord.search(data[:4], 5)
    st = coord.last_search_stats
    assert st is not None and st.queries == 4 and st.nodes_visited > 0
    assert "beam_search" in st.explain()


def test_insert_visit_cap_never_binds_at_parity_settings(rng):
    """VERDICT weak #4: the insert-path visit cap (default 2*L_insert) is a
    deviation from libSQL's capless insert search, and round 1's oracle
    carried the SAME cap so parity could not catch divergence. Here both
    engine and oracle run with a cap high enough to never bind (asserted),
    so the exact-topology parity below is capless-real."""
    dims, n = 10, 80
    big_cap = 16 * 16  # 16 * l_insert
    cfg = LmDiskannConfig(
        metric_type=MetricType.COSINE, r=8, l_insert=16, l_search=32,
        dimensions=dims, node_vector_type=VectorType.FLOAT32,
        edge_type=EdgeType.TERNARY, insert_max_visits=big_cap,
    )
    cfg.validate()
    coord = Coordinator(cfg, initial_capacity=128)
    oracle = OracleGraph(dims, cfg.r, MetricType.COSINE, EdgeType.TERNARY,
                         cfg.alpha, cfg.l_insert, cfg.l_search)
    data = rng.standard_normal((n, dims)).astype(np.float32)

    from duckdb_lm_diskann_tpu.core.searcher import (
        search_for_initial_candidates,
    )

    max_seen = 0
    for i in range(n):
        if i > 0:
            # the engine's own insert search, at the raised cap
            res = search_for_initial_candidates(
                coord.arrays,
                jnp.asarray(data[i : i + 1]),
                jnp.int32(coord.entry_slot),
                params=coord.params,
                l_insert=cfg.l_insert,
            )
            max_seen = max(max_seen, int(np.asarray(res.visited_count)[0]))
        coord.insert([i], data[i : i + 1])
        # oracle with the same (non-binding) budget = capless libSQL
        oracle.insert_with_budget(i, data[i], max_visits=big_cap)

    assert max_seen < big_cap, "cap bound; raise big_cap"
    nbrs = np.asarray(coord.arrays.neighbors)
    for i in range(n):
        got = [int(s) for s in nbrs[i] if s >= 0]
        assert got == oracle.neighbors[i], f"node {i}"


def test_refine_pass_preserves_reachability_and_improves_recall(rng):
    """Post-build refine (Vamana second pass): graph stays fully reachable
    (the repair half restores any evicted last in-link) and brute-force
    recall does not regress on a clustered corpus."""
    import numpy as np
    from duckdb_lm_diskann_tpu.common.types import (
        EdgeType, MetricType, VectorType,
    )
    from duckdb_lm_diskann_tpu.core.config import LmDiskannConfig
    from duckdb_lm_diskann_tpu.core.coordinator import Coordinator
    from duckdb_lm_diskann_tpu.utils.corpora import make_hard_corpus

    n, dims, k = 800, 16, 10
    gen, crng = make_hard_corpus(n, dims, seed=17, n_clusters=24)
    data = gen(n)
    cfg = LmDiskannConfig(
        metric_type=MetricType.L2, r=8, l_insert=16, l_search=48,
        dimensions=dims, node_vector_type=VectorType.FLOAT32,
        edge_type=EdgeType.INT8,
    )
    cfg.validate()
    coord = Coordinator(cfg, initial_capacity=n)
    coord.bulk_build(list(range(n)), data, max_batch=128)

    queries = data[crng.integers(0, n, 64)] + 0.01 * crng.standard_normal(
        (64, dims)
    ).astype(np.float32)
    d2 = ((queries[:, None, :] - data[None, :, :]) ** 2).sum(-1)
    truth = np.argsort(d2, axis=1)[:, :k]

    def recall():
        ids, _ = coord.search(queries, k)
        return np.mean([
            len(set(ids[i].tolist()) & set(truth[i].tolist())) / k
            for i in range(len(queries))
        ])

    before = recall()
    refined = coord.refine(max_batch=256)
    assert refined == n
    # Full reachability after refine+repair.
    from duckdb_lm_diskann_tpu.core.builder import reachable_mask
    reach = np.asarray(reachable_mask(
        np.asarray(coord.arrays.neighbors), np.asarray(coord.arrays.valid),
        coord.entry_slot,
    ))
    live = np.asarray(coord.arrays.valid)
    assert (reach[live]).all(), "refine stranded nodes"
    after = recall()
    assert after >= before - 0.02, (before, after)
