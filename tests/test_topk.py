"""Deterministic top-k / beam-merge primitive tests."""

import os
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np

from duckdb_lm_diskann_tpu.ops import topk as topk_ops


def _isolate(test_name: str) -> bool:
    """Run ``test_name`` in a FRESH interpreter and return True (caller
    returns immediately); in the child (LMD_TOPK_ISOLATED set) return
    False so the real body runs.

    The wide bitonic compare-exchange networks these tests pin unroll to
    very large HLO graphs; compiling them inside an xdist worker that has
    already accumulated a suite's worth of XLA-CPU compile state is the
    one reproducible way to segfault the worker (they always pass in a
    fresh process). Isolation makes the suite deterministically green at
    the cost of one interpreter start per test."""
    if os.environ.get("LMD_TOPK_ISOLATED") == "1":
        return False
    env = dict(os.environ)
    env["LMD_TOPK_ISOLATED"] = "1"
    # Child gets its own persistent-cache dir (tests/conftest.py keys on
    # this), so two workers isolating both tests never share cache files.
    env["PYTEST_XDIST_WORKER"] = f"iso-{test_name}"
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run(
        [sys.executable, "-m", "pytest", "-q", "-p", "no:cacheprovider",
         "-o", "addopts=", f"tests/test_topk.py::{test_name}"],
        env=env, cwd=root, capture_output=True, text=True, timeout=900,
    )
    assert r.returncode == 0, (
        f"isolated {test_name} failed:\n{r.stdout[-3000:]}\n{r.stderr[-1000:]}"
    )
    return True

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


def test_bitonic_fast_path_matches_sort_path():
    if _isolate("test_bitonic_fast_path_matches_sort_path"):
        return
    """a_sorted=True (bitonic candidate sort + bitonic merge) must produce
    EXACTLY the lax.sort path's output for disjoint ids — including vis
    extras and (dist, id) tie-breaks — across many random widths/ties."""
    import numpy as np

    rng = np.random.default_rng(42)
    # Widths come from a fixed pool so the 30 trials compile ~8 programs
    # instead of ~60 (each distinct (B, La, Lb, size) is a fresh XLA
    # compile; per-worker compile-state accumulation is what occasionally
    # segfaulted XLA-CPU under xdist). Tie/invalid DATA still varies per
    # trial, which is what the test actually exercises.
    pool = [(1, 1, 1, 1), (2, 7, 3, 5), (3, 33, 17, 20), (1, 64, 64, 64),
            (4, 100, 64, 100), (2, 128, 88, 100), (3, 5, 89, 2),
            (2, 129, 1, 129)]
    for trial in range(30):
        B, La, Lb, size = pool[trial % len(pool)]
        # Quantized distances force plenty of (dist) ties -> id tie-break.
        da = np.sort(
            rng.integers(0, 12, (B, La)).astype(np.float32), axis=-1
        )
        # ids: disjoint between a and b; a sorted by (dist, id).
        ia = np.argsort(
            rng.random((B, La)), axis=-1
        ).astype(np.int32) * 2  # even
        order = np.lexsort((ia, da), axis=-1)
        da = np.take_along_axis(da, order, axis=-1)
        ia = np.take_along_axis(ia, order, axis=-1)
        va = rng.integers(0, 2, (B, La)).astype(np.int32)
        db = rng.integers(0, 12, (B, Lb)).astype(np.float32)
        ib = (rng.permutation(Lb)[None].repeat(B, 0) * 2 + 1).astype(np.int32)
        vb = np.zeros((B, Lb), np.int32)
        # Sprinkle +inf/-1 invalid entries on the candidate side.
        inv = rng.random((B, Lb)) < 0.2
        db = np.where(inv, np.inf, db).astype(np.float32)
        ib = np.where(inv, -1, ib).astype(np.int32)

        args = (jnp.asarray(da), jnp.asarray(ia), jnp.asarray(db),
                jnp.asarray(ib))
        kw = dict(extras_a=(jnp.asarray(va),), extras_b=(jnp.asarray(vb),))
        want = merge_beams(*args, size, **kw)
        got = merge_beams(*args, size, a_sorted=True, **kw)
        for w, g, name in zip(want, got, ("dist", "id", "vis")):
            np.testing.assert_array_equal(
                np.asarray(g), np.asarray(w),
                err_msg=f"trial {trial} {name} (La={La}, Lb={Lb}, size={size})",
            )


def test_bitonic_sort_matches_lax_sort():
    import numpy as np

    rng = np.random.default_rng(7)
    for width in (2, 8, 64, 256):
        d = rng.integers(0, 5, (3, width)).astype(np.float32)
        i = rng.permutation(width)[None].repeat(3, 0).astype(np.int32)
        v = rng.integers(0, 9, (3, width)).astype(np.int32)
        want = jax.lax.sort(
            (jnp.asarray(d), jnp.asarray(i), jnp.asarray(v)),
            dimension=-1, num_keys=2,
        )
        got = topk_ops.bitonic_sort(
            (jnp.asarray(d), jnp.asarray(i), jnp.asarray(v))
        )
        for w, g in zip(want, got):
            np.testing.assert_array_equal(np.asarray(g), np.asarray(w))
        got_desc = topk_ops.bitonic_sort(
            (jnp.asarray(d), jnp.asarray(i), jnp.asarray(v)),
            descending=True,
        )
        for w, g in zip(want, got_desc):
            np.testing.assert_array_equal(
                np.asarray(g), np.asarray(w)[..., ::-1]
            )


def test_bitonic_dedup_path_matches_sort_path():
    """dedup=True with bitonic networks must equal the lax.sort dedup path:
    duplicate ids across sides (equal and differing distances), ties,
    invalid entries."""
    import numpy as np

    rng = np.random.default_rng(11)
    # Fixed width pool (see test_bitonic_fast_path_matches_sort_path):
    # bounds compile count at ~8 programs; data still varies per trial.
    pool = [(1, 1, 1, 1), (2, 9, 5, 4), (3, 40, 25, 30), (1, 64, 64, 64),
            (3, 100, 180, 80), (2, 119, 1, 119), (1, 7, 199, 3),
            (2, 80, 120, 64)]
    for trial in range(30):
        B, La, Lb, size = pool[trial % len(pool)]
        da = rng.integers(0, 8, (B, La)).astype(np.float32)
        ia = rng.integers(0, 60, (B, La)).astype(np.int32)
        db = rng.integers(0, 8, (B, Lb)).astype(np.float32)
        ib = rng.integers(0, 60, (B, Lb)).astype(np.int32)
        inv = rng.random((B, Lb)) < 0.15
        db = np.where(inv, np.inf, db).astype(np.float32)
        ib = np.where(inv, -1, ib).astype(np.int32)
        # Extras must be a function of (id, dist) for a meaningful stability
        # -independent comparison (see merge_beams docstring caveat).
        va = (ia % 2).astype(np.int32)
        vb = (ib % 2).astype(np.int32)
        args = (jnp.asarray(da), jnp.asarray(ia), jnp.asarray(db),
                jnp.asarray(ib))
        kw = dict(extras_a=(jnp.asarray(va),), extras_b=(jnp.asarray(vb),),
                  dedup=True)
        want = merge_beams(*args, size, bitonic=False, **kw)
        got = merge_beams(*args, size, bitonic=True, **kw)
        valid = np.asarray(want[1]) >= 0
        for w, g, name in zip(want, got, ("dist", "id", "vis")):
            w, g = np.asarray(w), np.asarray(g)
            if name == "vis":
                # Extras of invalid entries (id=-1 / inf pads) are
                # unspecified in both paths; consumers ignore them.
                w, g = np.where(valid, w, 0), np.where(valid, g, 0)
            np.testing.assert_array_equal(
                g, w,
                err_msg=f"trial {trial} {name} (La={La}, Lb={Lb}, size={size})",
            )


def test_sorted_dedup_topk_bitonic_matches_sort_path():
    if _isolate("test_sorted_dedup_topk_bitonic_matches_sort_path"):
        return
    import numpy as np

    rng = np.random.default_rng(21)
    for trial in range(20):
        B = int(rng.integers(1, 4))
        V = int(rng.integers(1, 500))
        d = rng.integers(0, 9, (B, V)).astype(np.float32)
        i = rng.integers(-1, 40, (B, V)).astype(np.int32)
        # Duplicate ids share one distance (the final-pass invariant: both
        # visits of a slot carry the same exact distance).
        for b in range(B):
            for uid in np.unique(i[b][i[b] >= 0]):
                d[b][i[b] == uid] = d[b][i[b] == uid][0]
        d = np.where(i < 0, np.inf, d).astype(np.float32)
        want = topk_ops.sorted_dedup_topk(
            jnp.asarray(d), jnp.asarray(i), bitonic=False)
        got = topk_ops.sorted_dedup_topk(
            jnp.asarray(d), jnp.asarray(i), bitonic=True)
        for w, g in zip(want, got):
            np.testing.assert_array_equal(
                np.asarray(g), np.asarray(w), err_msg=f"trial {trial} V={V}")
