"""Deterministic top-k / beam-merge primitive tests."""

import jax.numpy as jnp
import numpy as np

from duckdb_lm_diskann_tpu.ops.topk import (
    dedup_sorted_ids,
    mask_invalid,
    merge_beams,
    sort_by_distance_id,
    topk_by_distance,
)


def test_sort_tie_breaks_by_id():
    dist = jnp.asarray([[3.0, 1.0, 1.0, 2.0]])
    ids = jnp.asarray([[7, 9, 2, 5]], dtype=jnp.int32)
    d, i = sort_by_distance_id(dist, ids)
    np.testing.assert_allclose(np.asarray(d[0]), [1.0, 1.0, 2.0, 3.0])
    np.testing.assert_array_equal(np.asarray(i[0]), [2, 9, 5, 7])


def test_topk_and_mask():
    dist = jnp.asarray([[0.5, 0.1, 0.9, 0.2]])
    ids = jnp.asarray([[1, 2, 3, 4]], dtype=jnp.int32)
    valid = jnp.asarray([[True, False, True, True]])
    d, i = mask_invalid(dist, ids, valid)
    dk, ik = topk_by_distance(d, i, 2)
    np.testing.assert_allclose(np.asarray(dk[0]), [0.2, 0.5])
    np.testing.assert_array_equal(np.asarray(ik[0]), [4, 1])


def test_merge_beams_keeps_best_and_extras():
    da = jnp.asarray([[0.1, 0.4]])
    ia = jnp.asarray([[10, 11]], dtype=jnp.int32)
    va = jnp.asarray([[1, 1]], dtype=jnp.int32)  # visited flags ride along
    db = jnp.asarray([[0.2, 0.05]])
    ib = jnp.asarray([[20, 21]], dtype=jnp.int32)
    vb = jnp.asarray([[0, 0]], dtype=jnp.int32)
    d, i, v = merge_beams(da, ia, db, ib, 3, extras_a=(va,), extras_b=(vb,))
    np.testing.assert_allclose(np.asarray(d[0]), [0.05, 0.1, 0.2])
    np.testing.assert_array_equal(np.asarray(i[0]), [21, 10, 20])
    np.testing.assert_array_equal(np.asarray(v[0]), [0, 1, 0])


def test_dedup_sorted_ids():
    dist = jnp.asarray([[0.1, 0.1, 0.2, 0.2, jnp.inf]])
    ids = jnp.asarray([[3, 3, 5, 5, -1]], dtype=jnp.int32)
    d, i = dedup_sorted_ids(dist, ids)
    # Second occurrences masked to (+inf, -1)
    assert np.asarray(i[0]).tolist() == [3, -1, 5, -1, -1]
    assert np.isinf(np.asarray(d[0])[1])
