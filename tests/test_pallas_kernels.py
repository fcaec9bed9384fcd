"""Pallas fused-kernel tests (interpreter mode on CPU; compiled on TPU)."""

import jax.numpy as jnp
import numpy as np

from duckdb_lm_diskann_tpu.ops.pallas_kernels import (
    ternary_frontier_scores,
    ternary_frontier_scores_auto,
)
from duckdb_lm_diskann_tpu.ops.ternary import encode_ternary_np, ternary_dot


def test_fused_frontier_scores_match_jnp(rng):
    C, R, B, D = 64, 16, 8, 64
    nbr_vecs = rng.standard_normal((C, R, D)).astype(np.float32)
    ep, en = encode_ternary_np(nbr_vecs)
    q = rng.standard_normal((B, D)).astype(np.float32)
    qp, qn = encode_ternary_np(q)
    cur = rng.integers(0, C, B).astype(np.int32)

    got = ternary_frontier_scores(
        jnp.asarray(cur), jnp.asarray(qp), jnp.asarray(qn),
        jnp.asarray(ep), jnp.asarray(en), interpret=True,
    )
    want = ternary_dot(
        jnp.asarray(qp)[:, None, :], jnp.asarray(qn)[:, None, :],
        jnp.asarray(ep)[cur], jnp.asarray(en)[cur],
    )
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    # auto-dispatch picks interpret on CPU
    got2 = ternary_frontier_scores_auto(
        jnp.asarray(cur), jnp.asarray(qp), jnp.asarray(qn),
        jnp.asarray(ep), jnp.asarray(en),
    )
    np.testing.assert_array_equal(np.asarray(got2), np.asarray(want))
