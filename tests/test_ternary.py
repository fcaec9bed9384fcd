"""Ternary encode/dot tests vs a literal scalar oracle.

Oracle semantics pinned to EncodeTernary (ternary_quantization.hpp:146-199)
and the scalar popcount-dot kernel (:269-296), including the exact bit
layout: dim d -> bit (d % 64) of u64 word (d / 64).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from duckdb_lm_diskann_tpu.ops.ternary import (
    encode_ternary,
    encode_ternary_np,
    ternary_dot,
    ternary_dot_np,
    ternary_similarity,
)


def encode_oracle_u64(vec):
    """Literal transliteration of EncodeTernary into u64 words."""
    d = len(vec)
    words = (d + 63) // 64
    pos = np.zeros(words, np.uint64)
    neg = np.zeros(words, np.uint64)
    for i, v in enumerate(vec):
        mask = np.uint64(1) << np.uint64(i % 64)
        if v > 0:
            pos[i // 64] |= mask
        elif v < 0:
            neg[i // 64] |= mask
    return pos, neg


def u32_view(u64_words, w32):
    out = u64_words.view(np.uint32)  # little-endian split
    return np.pad(out, (0, w32 - len(out)))


@pytest.mark.parametrize("dims", [1, 31, 32, 64, 96, 128, 200])
def test_encode_matches_u64_oracle(rng, dims):
    vec = rng.standard_normal(dims).astype(np.float32)
    vec[rng.random(dims) < 0.2] = 0.0  # exercise the zero state
    pos32, neg32 = encode_ternary_np(vec[None, :])
    pos64, neg64 = encode_oracle_u64(vec)
    w32 = pos32.shape[-1]
    np.testing.assert_array_equal(pos32[0], u32_view(pos64, w32))
    np.testing.assert_array_equal(neg32[0], u32_view(neg64, w32))
    # jit encoder == numpy encoder
    jpos, jneg = encode_ternary(jnp.asarray(vec)[None, :])
    np.testing.assert_array_equal(np.asarray(jpos), pos32)
    np.testing.assert_array_equal(np.asarray(jneg), neg32)


def dot_oracle(a, b):
    """popcount formula over the literal u64 encoding (hpp:269-296)."""
    ap, an = encode_oracle_u64(a)
    bp, bn = encode_oracle_u64(b)

    def pop(x):
        return sum(bin(int(w)).count("1") for w in x)

    return pop(ap & bp) - pop(ap & bn) - pop(an & bp) + pop(an & bn)


@pytest.mark.parametrize("dims", [16, 64, 100, 128])
def test_dot_matches_oracle(rng, dims):
    a = rng.standard_normal((8, dims)).astype(np.float32)
    b = rng.standard_normal((8, dims)).astype(np.float32)
    a[rng.random(a.shape) < 0.15] = 0.0
    ap, an = encode_ternary_np(a)
    bp, bn = encode_ternary_np(b)
    got = np.asarray(
        ternary_dot(jnp.asarray(ap), jnp.asarray(an), jnp.asarray(bp), jnp.asarray(bn))
    )
    want = np.array([dot_oracle(a[i], b[i]) for i in range(8)])
    np.testing.assert_array_equal(got, want)
    np.testing.assert_array_equal(ternary_dot_np(ap, an, bp, bn), want)


def test_dot_identity_counts_nonzeros(rng):
    # dot(v, v) = number of nonzero dims (every sign agrees with itself).
    v = rng.standard_normal((4, 64)).astype(np.float32)
    v[rng.random(v.shape) < 0.3] = 0.0
    p, n = encode_ternary_np(v)
    got = ternary_dot_np(p, n, p, n)
    np.testing.assert_array_equal(got, (v != 0).sum(-1))


def test_similarity_broadcasts_neighbors(rng):
    # query [B,D] vs neighbor planes [B,R,W] -> [B,R]
    q = rng.standard_normal((3, 64)).astype(np.float32)
    nbrs = rng.standard_normal((3, 5, 64)).astype(np.float32)
    np_p, np_n = encode_ternary_np(nbrs)
    sim = np.asarray(
        ternary_similarity(jnp.asarray(q), jnp.asarray(np_p), jnp.asarray(np_n))
    )
    want = np.array(
        [[dot_oracle(q[i], nbrs[i, j]) for j in range(5)] for i in range(3)]
    )
    np.testing.assert_array_equal(sim, want.astype(np.float32))
