"""Knockout profiler for the REAL beam-search hop body.

benchmarks/profile_hop.py profiles a hand-copied approximation of the hop;
this one imports the actual searcher building blocks and mirrors
core/searcher.py's ``body()`` statement-for-statement (E=1), with each
component toggleable. Differences found between this and profile_hop are
real-engine costs the approximation missed.

Methodology: slope of time vs iteration count (two ITERS points) — the
tunneled backend's per-dispatch overhead is ~20+ ms. Hard host-pull sync
(np.asarray of a scalar), NOT jax.block_until_ready, which has been
observed to return early on the axon backend.

Components:
    escore   — INT4 edge gather+dequant+score (planar layout)
    vgather  — visited-node vector gather + exact distance
    nbrlive  — neighbor slot validity: arrays.valid element gather [B, R]
    inbeam   — membership mask (candidate already in beam)
    vislog   — visited-log scatters (slots + dists)
    merge    — sorted merge_beams (lax.sort path, E=1 a_sorted)
    seedvis  — seed visit tracking
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
sys.path.insert(0, "/root/repo")
from duckdb_lm_diskann_tpu.ops import topk as topk_ops
from duckdb_lm_diskann_tpu.ops.distance import pairwise_distance
from duckdb_lm_diskann_tpu.ops.quantize import decode_int4
from duckdb_lm_diskann_tpu.common.types import MetricType

import os

B = int(os.environ.get("PROF_B", 1024))
L = int(os.environ.get("PROF_L", 100))
R, D = 64, 128
CAP = 1 << int(os.environ.get("PROF_CAP_LOG2", 20))
V = 4 * L
metric = MetricType.L2
ITERS_LO, ITERS_HI = 48, 160
INF = float("inf")


def _time_loop(build_run, args_list, reps=4):
    run_lo, run_hi = build_run(ITERS_LO), build_run(ITERS_HI)
    _ = np.asarray(run_lo(args_list[0]))
    _ = np.asarray(run_hi(args_list[0]))
    t_lo, t_hi = [], []
    for i in range(reps):
        a = args_list[(i + 1) % len(args_list)]
        t0 = time.perf_counter()
        _ = np.asarray(run_lo(a))
        t_lo.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        _ = np.asarray(run_hi(a))
        t_hi.append(time.perf_counter() - t0)
    return (min(t_hi) - min(t_lo)) / (ITERS_HI - ITERS_LO) * 1e3


def main():
    rng = np.random.default_rng(0)
    tables = dict(
        vectors=jnp.asarray(rng.standard_normal((CAP, D)).astype(np.float32)),
        neighbors=jnp.asarray(rng.integers(0, CAP, (CAP, R), dtype=np.int32)),
        valid=jnp.asarray(np.ones(CAP, np.bool_)),
        edge_i4=jnp.asarray(
            rng.integers(0, 1 << 32, (CAP, R, D // 8), dtype=np.uint64).astype(
                np.uint32
            )
        ),
        edge_scale=jnp.asarray(rng.random((CAP, R)).astype(np.float32)),
        queries=jnp.asarray(rng.standard_normal((B, D)).astype(np.float32)),
    )
    seeds_arr = jnp.asarray([0], jnp.int32)  # S=1

    def make_loop(iters, *, escore=True, vgather=True, nbrlive=True,
                  inbeam=True, vislog=True, merge=True, seedvis=True):
        def body(i, s):
            (beam_dist, beam_slot, beam_vis, seed_vis,
             vis_slot, vis_dist, vis_cnt, tb) = s
            queries = tb["queries"]
            unvis = (~beam_vis) & (beam_slot >= 0)
            idx_e = jnp.argmax(unvis, axis=-1)[:, None]  # [B, 1]
            active_e = jnp.take_along_axis(unvis, idx_e, axis=-1)
            cur = jnp.take_along_axis(beam_slot, idx_e, axis=-1)
            cur = jnp.where(active_e, cur, 0) % CAP

            if vgather:
                node_vec = tb["vectors"][cur]  # [B, 1, D]
                exact = pairwise_distance(
                    queries[:, None, :], node_vec, metric)
            else:
                exact = beam_dist[:, :1] * 1.0001

            rows_e = jnp.arange(B, dtype=jnp.int32)[:, None]
            beam_vis = beam_vis.at[rows_e, idx_e].max(active_e)
            if seedvis:
                seed_vis = seed_vis | jnp.any(
                    (cur[:, :, None] == seeds_arr[None, None, :])
                    & active_e[:, :, None],
                    axis=1,
                )

            if vislog:
                order_e = jnp.cumsum(active_e.astype(jnp.int32), axis=-1) - 1
                pos_e = jnp.where(active_e, vis_cnt[:, None] + order_e, V)
                vis_slot = vis_slot.at[rows_e, pos_e].set(cur, mode="drop")
                vis_dist = vis_dist.at[rows_e, pos_e].set(exact, mode="drop")
            vis_cnt = vis_cnt + jnp.sum(active_e.astype(jnp.int32), axis=-1)

            nbrs = tb["neighbors"][cur]  # [B, 1, R]
            if nbrlive:
                nbr_live = (nbrs >= 0) & tb["valid"][jnp.maximum(nbrs, 0)]
                nbr_live = nbr_live & active_e[:, :, None]
            else:
                nbr_live = jnp.broadcast_to(
                    active_e[:, :, None], nbrs.shape)

            if escore:
                packed = tb["edge_i4"][cur]
                scale = tb["edge_scale"][cur]
                vecs = decode_int4(packed, scale, D)
                edge_dist = pairwise_distance(
                    queries[:, None, None, :], vecs, metric)
            else:
                edge_dist = (nbrs.astype(jnp.float32) * 1e-7
                             + exact[:, :, None])

            nbrs_f = nbrs.reshape(B, R)
            live_f = nbr_live.reshape(B, R)
            dist_f = edge_dist.reshape(B, R)
            if inbeam:
                in_beam = jnp.any(
                    (nbrs_f[:, :, None] == beam_slot[:, None, :])
                    & (beam_slot >= 0)[:, None, :], axis=-1)
            else:
                in_beam = nbrs_f < 0
            in_vis_seed = jnp.any(
                (nbrs_f[:, :, None] == seeds_arr[None, None, :])
                & seed_vis[:, None, :],
                axis=-1,
            )
            cand_ok = live_f & ~in_beam & ~in_vis_seed
            cand_dist = jnp.where(cand_ok, dist_f, INF)
            cand_slot = jnp.where(cand_ok, nbrs_f, -1)

            if merge:
                new_dist, new_slot, new_vis = topk_ops.merge_beams(
                    beam_dist, beam_slot, cand_dist, cand_slot, L,
                    extras_a=(beam_vis.astype(jnp.int32),),
                    extras_b=(jnp.zeros_like(cand_slot),),
                    dedup=False, a_sorted=True, bitonic=False)
                beam_vis = new_vis.astype(jnp.bool_)
                new_slot = jnp.where(jnp.isinf(new_dist), -1, new_slot)
            else:
                m = min(L, cand_dist.shape[1])
                new_dist = beam_dist.at[:, :m].min(cand_dist[:, :m] * 0.999)
                new_slot = jnp.where(
                    new_dist < beam_dist,
                    jnp.pad(cand_slot,
                            ((0, 0), (0, max(0, L - m))))[:, :L],
                    beam_slot)

            return (new_dist, new_slot, beam_vis, seed_vis,
                    vis_slot, vis_dist, vis_cnt, tb)

        @jax.jit
        def run_impl(seed_slot, tb):
            beam_dist = jnp.concatenate(
                [jnp.zeros((B, 1)), jnp.full((B, L - 1), INF)], axis=-1)
            beam_slot = jnp.concatenate(
                [seed_slot[:, None], jnp.full((B, L - 1), -1, jnp.int32)],
                axis=-1)
            s = (beam_dist, beam_slot, jnp.zeros((B, L), jnp.bool_),
                 jnp.zeros((B, 1), jnp.bool_),
                 jnp.full((B, V), -1, jnp.int32), jnp.full((B, V), INF),
                 jnp.zeros((B,), jnp.int32), tb)
            s = jax.lax.fori_loop(0, iters, body, s)
            return s[0].sum() + s[4].sum() + s[5].sum()

        return lambda seed_slot: run_impl(seed_slot, tables)

    rng2 = np.random.default_rng(7)
    seeds = [jnp.asarray(rng2.integers(0, CAP, B, dtype=np.int32))
             for _ in range(8)]
    # PROF_VALID=0: knock nbrlive out of EVERY config — profiles the
    # serving hop (assume_all_valid=True skips the validity gather).
    base = {} if os.environ.get("PROF_VALID", "1") != "0" else dict(
        nbrlive=False
    )
    for name, kw in [
        ("full", {}),
        ("-escore", dict(escore=False)),
        ("-vgather", dict(vgather=False)),
        ("-nbrlive", dict(nbrlive=False)),
        ("-inbeam", dict(inbeam=False)),
        ("-vislog", dict(vislog=False)),
        ("-merge", dict(merge=False)),
        ("-seedvis", dict(seedvis=False)),
        ("bare(min)", dict(escore=False, vgather=False, nbrlive=False,
                           inbeam=False, vislog=False, merge=False,
                           seedvis=False)),
    ]:
        kw = {**base, **kw}
        ms = _time_loop(lambda it, kw=kw: make_loop(it, **kw), seeds)
        print(f"{name:10s}: {ms:.3f} ms/hop", flush=True)


if __name__ == "__main__":
    main()
