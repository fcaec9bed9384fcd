"""Property-based tests for the deterministic top-k / merge primitives.

The beam's correctness hangs on these invariants (SURVEY §7.3's pinned
traversal spec); hypothesis hunts the corners a fixed fixture misses —
duplicate ids with equal AND differing distances (stale zombie edge into a
recycled slot), all-invalid rows, ties everywhere.
"""

import numpy as np
from hypothesis import given, settings, strategies as st

import jax.numpy as jnp

from duckdb_lm_diskann_tpu.ops import topk as topk_ops

settings.register_profile("ci", max_examples=40, deadline=None)
settings.load_profile("ci")


def _rows(draw, n, id_pool, allow_dup_dist):
    ids = draw(
        st.lists(
            st.sampled_from(id_pool + [-1]), min_size=n, max_size=n
        )
    )
    dists = []
    seen: dict[int, float] = {}
    for i in ids:
        if i < 0:
            dists.append(float("inf"))
            continue
        d = draw(st.sampled_from([0.5, 1.0, 2.0, 3.5]))
        if not allow_dup_dist and i in seen:
            d = seen[i]  # duplicated id carries identical distance
        seen.setdefault(i, d)
        dists.append(d)
    return np.asarray(dists, np.float32), np.asarray(ids, np.int32)


@given(data=st.data(), dup_dist=st.booleans())
def test_merge_beams_dedup_invariants(data, dup_dist):
    L, E = 6, 8
    da, ia = _rows(data.draw, L, list(range(5)), allow_dup_dist=False)
    db_, ib = _rows(data.draw, E, list(range(8)), allow_dup_dist=dup_dist)
    # a-side (the beam) is sorted and dup-free by construction.
    order = np.lexsort((ia, da))
    da, ia = da[order], ia[order]
    keep = np.ones(L, bool)
    seen = set()
    for j, i in enumerate(ia):
        if i >= 0 and i in seen:
            keep[j] = False
        seen.add(int(i))
    da = np.where(keep, da, np.inf)
    ia = np.where(keep, ia, -1)
    order = np.lexsort((ia, da))
    da, ia = da[order], ia[order]
    # b-side: mask ids already in the beam (the in_beam mask invariant).
    in_beam = np.isin(ib, ia[ia >= 0])
    db_ = np.where(in_beam, np.inf, db_)
    ib = np.where(in_beam, -1, ib)

    out_d, out_i = topk_ops.merge_beams(
        jnp.asarray(da[None]), jnp.asarray(ia[None]),
        jnp.asarray(db_[None]), jnp.asarray(ib[None]),
        L, dedup=True,
    )
    out_d, out_i = np.asarray(out_d[0]), np.asarray(out_i[0])

    live = out_i[np.isfinite(out_d)]
    # 1. No duplicate ids survive, even with differing distances.
    assert len(live) == len(set(live.tolist()))
    # 2. Sorted by (distance, id).
    pairs = list(zip(out_d.tolist(), out_i.tolist()))
    finite = [(d, i) for d, i in pairs if np.isfinite(d)]
    assert finite == sorted(finite)
    # 3. Every surviving id's distance is its minimum across all copies.
    all_d = np.concatenate([da, db_])
    all_i = np.concatenate([ia, ib])
    for d, i in finite:
        assert d == all_d[all_i == i].min()
    # 4. The kept set is the best-L of the deduped id universe.
    best = {}
    for d, i in zip(all_d, all_i):
        if i >= 0 and np.isfinite(d):
            best[int(i)] = min(best.get(int(i), np.inf), float(d))
    want = sorted((d, i) for i, d in best.items())[:L]
    assert finite == want


@given(data=st.data())
def test_topk_by_distance_matches_numpy(data):
    n = 12
    d, i = _rows(data.draw, n, list(range(9)), allow_dup_dist=True)
    out_d, out_i = topk_ops.topk_by_distance(
        jnp.asarray(d[None]), jnp.asarray(i[None]), 5
    )
    got = list(zip(np.asarray(out_d[0]).tolist(), np.asarray(out_i[0]).tolist()))
    want = sorted(zip(d.tolist(), i.tolist()))[:5]
    assert got == want


def test_hard_corpus_generator_properties():
    """The stress generator (utils/corpora.py) must actually produce its
    pathologies: Zipf cluster skew, anisotropic per-dim spread, exact
    duplicates — and be deterministic per seed."""
    import numpy as np

    from duckdb_lm_diskann_tpu.utils.corpora import (
        make_hard_corpus,
        zipf_cluster_ids,
    )

    gen, _ = make_hard_corpus(10_000, 32, seed=7)
    x = gen(10_000)
    assert x.shape == (10_000, 32) and x.dtype == np.float32
    # duplicates present (~5%)
    _, counts = np.unique(x, axis=0, return_counts=True)
    assert (counts > 1).sum() > 100
    # anisotropy: per-dim stds spread over at least a decade WITHIN a
    # cluster (globally the random per-cluster stretch directions wash
    # out and the center variance dominates)
    gen1, _ = make_hard_corpus(4_000, 32, seed=9, n_clusters=1,
                               duplicate_fraction=0.0)
    stds = gen1(4_000).std(axis=0)
    assert stds.max() / stds.min() > 10
    # determinism
    gen2, _ = make_hard_corpus(10_000, 32, seed=7)
    np.testing.assert_array_equal(gen2(10_000), x)
    # cluster-mass skew: top cluster carries many times the median mass
    rng = np.random.default_rng(0)
    cid = zipf_cluster_ids(rng, 100_000, 256)
    counts = np.bincount(cid, minlength=256)
    assert counts.max() > 8 * max(np.median(counts), 1)
