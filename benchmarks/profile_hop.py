"""Profiling harness for the beam-search hop body at 1M scale.

Modes (``python benchmarks/profile_hop.py [knockout|gather]``):

``knockout`` (default) — each variant runs a fixed 200-iteration fori_loop
of a stripped hop body with one component disabled; component cost =
full - variant. Shapes match the bench headline: B=1024, L=100, R=64,
D=128, INT4 edges, E=1.

``gather`` — gather-layout A/B inside the same in-loop harness: today's
four separate row gathers (vectors / neighbors / int4 codes / scales) vs
ONE combined self-contained block row u32[N, 1280] (the TPU-native
realization of the reference's one-block-read-per-visit property,
index_config.cpp:104-148), plus a deeply-pipelined manual-DMA Pallas
gather with K outstanding copies. Decides whether the block layout +
manual kernel are worth the refactor before any code changes.

Methodology note (round 3): the tunneled TPU backend carries a LARGE
per-dispatch fixed overhead (measured ~20-25 ms per jitted call — big
enough to have polluted the round-2 single-point in-loop numbers by
~0.1-0.5 ms/iter). Every cost here is therefore the SLOPE of total time
vs fori_loop iteration count measured at two ITERS points, which cancels
the fixed dispatch cost exactly. Run exclusively (no concurrent TPU
work).
"""
import sys
import time
import functools

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
sys.path.insert(0, "/root/repo")
from duckdb_lm_diskann_tpu.ops import topk as topk_ops
from duckdb_lm_diskann_tpu.ops.distance import pairwise_distance
from duckdb_lm_diskann_tpu.ops.quantize import decode_int4
from duckdb_lm_diskann_tpu.common.types import MetricType

B, L, R, D = 1024, 100, 64, 128
CAP = 1 << 20
ITERS_LO, ITERS_HI = 64, 256
metric = MetricType.L2
V = 4 * L


def _time_loop(build_run, args_list, reps=4):
    """build_run(iters) -> fn(args). Returns the ms/iteration SLOPE between
    ITERS_LO and ITERS_HI (cancels the per-dispatch fixed overhead)."""
    run_lo, run_hi = build_run(ITERS_LO), build_run(ITERS_HI)
    _ = np.asarray(run_lo(args_list[0]))  # compile + warm
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


def knockout():
    rng = np.random.default_rng(0)
    vectors = jnp.asarray(rng.standard_normal((CAP, D)).astype(np.float32))
    # planar u32 words (the round-3 device layout, ops/quantize.words_per_i4)
    edge_i4 = jnp.asarray(
        rng.integers(0, 1 << 32, (CAP, R, D // 8), dtype=np.uint64).astype(
            np.uint32
        )
    )
    edge_scale = jnp.asarray(rng.random((CAP, R)).astype(np.float32))
    neighbors = jnp.asarray(rng.integers(0, CAP, (CAP, R), dtype=np.int32))
    queries = jnp.asarray(rng.standard_normal((B, D)).astype(np.float32))

    def make_loop(iters, *, sort=True, egather=True, vislog=True,
                  inbeam=True, vgather=True, bitonic=False):
        def body(i, s):
            # Tables ride in the loop carry (returned unchanged) so they are
            # jit ARGUMENTS, not 5.4 GB of captured constants — constant
            # capture at CAP=1M made lowering/compile effectively hang.
            (beam_dist, beam_slot, beam_vis, vis_slot, vis_dist,
             vis_cnt, tables) = s
            vectors, edge_i4, edge_scale, neighbors, queries = tables
            unvis = (~beam_vis) & (beam_slot >= 0)
            idx_e = jnp.argmax(unvis, axis=-1)[:, None]
            active_e = jnp.take_along_axis(unvis, idx_e, axis=-1)
            cur = jnp.take_along_axis(beam_slot, idx_e, axis=-1)
            cur = jnp.where(active_e, jnp.abs(cur) % CAP, 0)

            if vgather:
                node_vec = vectors[cur]
                exact = pairwise_distance(
                    queries[:, None, :], node_vec, metric)
            else:
                exact = beam_dist[:, :1] * 1.0001

            oh = jax.nn.one_hot(idx_e, L, dtype=jnp.bool_) & active_e[:, :, None]
            beam_vis = beam_vis | jnp.any(oh, axis=1)

            if vislog:
                order_e = jnp.cumsum(active_e.astype(jnp.int32), axis=-1) - 1
                pos_e = jnp.where(active_e, vis_cnt[:, None] + order_e, -1)
                at = (jnp.arange(V, dtype=jnp.int32)[None, None, :]
                      == pos_e[:, :, None])
                hit = jnp.any(at, axis=1)
                slot_c = jnp.sum(jnp.where(at, cur[:, :, None], 0), axis=1)
                dist_c = jnp.sum(
                    jnp.where(at, exact[:, :, None], 0.0), axis=1)
                vis_slot = jnp.where(hit, slot_c, vis_slot)
                vis_dist = jnp.where(hit, dist_c, vis_dist)
            else:
                vis_slot = vis_slot.at[:, 0].add(cur[:, 0])
                vis_dist = vis_dist.at[:, 0].add(exact[:, 0])
            vis_cnt = vis_cnt + jnp.sum(active_e.astype(jnp.int32), axis=-1)

            nbrs = neighbors[cur]  # [B, 1, R]
            if egather:
                packed = edge_i4[cur]          # [B, 1, R, D/2]
                scale = edge_scale[cur]        # [B, 1, R]
                vecs = decode_int4(packed, scale, D)
                edge_dist = pairwise_distance(
                    queries[:, None, None, :], vecs, metric)
            else:
                edge_dist = (nbrs.astype(jnp.float32) * 1e-7
                             + exact[:, :, None])

            nbrs_f = nbrs.reshape(B, R)
            dist_f = edge_dist.reshape(B, R)
            if inbeam:
                in_beam = jnp.any(
                    (nbrs_f[:, :, None] == beam_slot[:, None, :])
                    & (beam_slot >= 0)[:, None, :], axis=-1)
            else:
                in_beam = nbrs_f < 0
            cand_dist = jnp.where(in_beam, jnp.inf, dist_f)
            cand_slot = jnp.where(in_beam, -1, nbrs_f)

            if sort:
                new_dist, new_slot, new_vis = topk_ops.merge_beams(
                    beam_dist, beam_slot, cand_dist, cand_slot, L,
                    extras_a=(beam_vis.astype(jnp.int32),),
                    extras_b=(jnp.zeros_like(cand_slot),),
                    a_sorted=bitonic)
                beam_vis = new_vis.astype(jnp.bool_)
            else:
                m = min(L, cand_dist.shape[1])
                new_dist = beam_dist.at[:, :m].min(cand_dist[:, :m] * 0.999)
                new_slot = jnp.where(new_dist < beam_dist,
                                     jnp.pad(cand_slot, ((0, 0), (0, max(0, L - m))))[:, :L],
                                     beam_slot)
            new_slot = jnp.where(jnp.isinf(new_dist), -1, new_slot)
            return (new_dist, new_slot, beam_vis, vis_slot, vis_dist,
                    vis_cnt, tables)

        @jax.jit
        def run_impl(seed_slot, tables):
            beam_dist = jnp.concatenate(
                [jnp.zeros((B, 1)), jnp.full((B, L - 1), jnp.inf)], axis=-1)
            beam_slot = jnp.concatenate(
                [seed_slot[:, None], jnp.full((B, L - 1), -1, jnp.int32)],
                axis=-1)
            s = (beam_dist, beam_slot, jnp.zeros((B, L), jnp.bool_),
                 jnp.full((B, V), -1, jnp.int32), jnp.full((B, V), jnp.inf),
                 jnp.zeros((B,), jnp.int32), tables)
            s = jax.lax.fori_loop(0, iters, body, s)
            return s[0].sum() + s[4].sum() + s[3].sum()

        tables = (vectors, edge_i4, edge_scale, neighbors, queries)
        return lambda seed_slot: run_impl(seed_slot, tables)

    rng2 = np.random.default_rng(7)
    seeds = [jnp.asarray(rng2.integers(0, CAP, B, dtype=np.int32))
             for _ in range(8)]
    for name, kw in [
        ("full", {}),
        ("full+bitonic", dict(bitonic=True)),
        ("-sort", dict(sort=False)),
        ("-edgegather", dict(egather=False)),
        ("-vislog", dict(vislog=False)),
        ("-inbeam", dict(inbeam=False)),
        ("-vecgather", dict(vgather=False)),
        ("bare(min)", dict(sort=False, egather=False, vislog=False,
                           inbeam=False, vgather=False)),
    ]:
        ms = _time_loop(lambda it, kw=kw: make_loop(it, **kw), seeds)
        print(f"{name:12s}: {ms:.3f} ms/hop", flush=True)


# --------------------------------------------------------------------------
# gather mode
# --------------------------------------------------------------------------

ROW = D + R + R + R * (D // 2) // 4  # u32 words: vec | nbrs | scales | codes


def _pipelined_gather(idx, src, n_flight=8, interpret=False):
    """Gather src[idx] (u32[CAP, ROW] rows) with K outstanding manual DMAs.

    Rows are DMA'd straight HBM->HBM into the ANY-space output (no VMEM
    staging — the caller's consumer reads from HBM anyway). Grid over B;
    step i waits the copy for row i (issued K steps earlier, or in the
    step-0 warmup) and reissues its semaphore slot for row i+K, keeping K
    copies in flight throughout.

    Rows are presented as (8, ROW//8) tiles: Mosaic tiles the last two
    dims of an HBM memref (8, 128) and rejects a dynamic slice of extent
    1 on a tiled dim, so the row index must live on a leading batch dim.
    """
    K = n_flight
    Bn = idx.shape[0]
    ROWW = src.shape[1]
    assert ROWW % 8 == 0
    src = src.reshape(src.shape[0], 8, ROWW // 8)

    def kernel(idx_ref, src_ref, out_ref, sems):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _warmup():
            for j in range(min(K, Bn)):
                pltpu.make_async_copy(
                    src_ref.at[idx_ref[j]], out_ref.at[j], sems.at[j % K]
                ).start()

        slot = jax.lax.rem(i, K)
        pltpu.make_async_copy(
            src_ref.at[idx_ref[i]], out_ref.at[i], sems.at[slot]
        ).wait()

        nxt = i + K

        @pl.when(nxt < Bn)
        def _reissue():
            pltpu.make_async_copy(
                src_ref.at[idx_ref[nxt]], out_ref.at[nxt], sems.at[slot]
            ).start()

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(Bn,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.SemaphoreType.DMA((K,)),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Bn, 8, ROWW // 8), jnp.uint32),
        interpret=interpret,
    )(idx, src)
    return out.reshape(Bn, ROWW)


def _pipelined_gather4(idx, srcs, n_flight=8, interpret=False):
    """Same pipelined pattern, but each logical row issues FOUR DMAs (one
    per separate source array) sharing one semaphore slot — measures the
    no-refactor option: keep today's SoA arrays, hide row latency with
    overlap. srcs = (vectors u32[C,D], neighbors u32[C,R], scales u32[C,R],
    codes u32[C,Wc])."""
    K = n_flight
    Bn = idx.shape[0]

    def kernel(idx_ref, v_ref, n_ref, s_ref, c_ref, ov, on, os_, oc, sems):
        i = pl.program_id(0)

        def issue(j, slot):
            r = idx_ref[j]
            pltpu.make_async_copy(v_ref.at[r], ov.at[j], sems.at[slot]).start()
            pltpu.make_async_copy(n_ref.at[r], on.at[j], sems.at[slot]).start()
            pltpu.make_async_copy(s_ref.at[r], os_.at[j], sems.at[slot]).start()
            pltpu.make_async_copy(c_ref.at[r], oc.at[j], sems.at[slot]).start()

        @pl.when(i == 0)
        def _warmup():
            for j in range(min(K, Bn)):
                issue(j, j % K)

        slot = jax.lax.rem(i, K)
        # One wait per constituent copy (the semaphore counts bytes per
        # copy; waiting the same descriptor 4x drains all four).
        r = idx_ref[i]
        pltpu.make_async_copy(v_ref.at[r], ov.at[i], sems.at[slot]).wait()
        pltpu.make_async_copy(n_ref.at[r], on.at[i], sems.at[slot]).wait()
        pltpu.make_async_copy(s_ref.at[r], os_.at[i], sems.at[slot]).wait()
        pltpu.make_async_copy(c_ref.at[r], oc.at[i], sems.at[slot]).wait()

        nxt = i + K

        @pl.when(nxt < Bn)
        def _reissue():
            issue(nxt, slot)

    # Rows reshaped to (8, w//8) tiles — see _pipelined_gather.
    widths = [s.shape[1] for s in srcs]
    assert all(w % 8 == 0 for w in widths)
    vec, nbr, sc, codes = (
        s.reshape(s.shape[0], 8, s.shape[1] // 8) for s in srcs)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(Bn,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 4,
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 4,
        scratch_shapes=[
            pltpu.SemaphoreType.DMA((K,)),
        ],
    )
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((Bn, 8, w // 8), jnp.uint32)
            for w in widths
        ],
        interpret=interpret,
    )(idx, vec, nbr, sc, codes)
    return [o.reshape(Bn, w) for o, w in zip(outs, widths)]


def gather_ab():
    global pl, pltpu
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.default_rng(0)
    h_vec = rng.standard_normal((CAP, D)).astype(np.float32).view(np.uint32)
    h_codes = (
        rng.integers(0, 255, (CAP, R * (D // 2)), dtype=np.uint8)
        .view(np.uint32)
    )
    h_sc = rng.random((CAP, R)).astype(np.float32).view(np.uint32)
    h_nbr = rng.integers(0, CAP, (CAP, R), dtype=np.int32).view(np.uint32)

    # Separate SoA tables (today's layout) + combined self-contained rows.
    vec_u32 = jnp.asarray(h_vec)
    nbr_u32 = jnp.asarray(h_nbr)
    sc_u32 = jnp.asarray(h_sc)
    codes_u32 = jnp.asarray(h_codes)
    combined = jnp.asarray(
        np.concatenate([h_vec, h_nbr, h_sc, h_codes], axis=1)
    )
    del h_vec, h_codes, h_sc, h_nbr
    print(f"tables resident: "
          f"{(combined.nbytes + vec_u32.nbytes + nbr_u32.nbytes + sc_u32.nbytes + codes_u32.nbytes)/2**30:.2f} GiB",
          flush=True)

    def harness(gather_sum, tables):
        """idx -> scalar per row; chains iterations through the result.

        ``tables`` rides the fori_loop carry (returned unchanged) so the
        multi-GiB arrays are jit ARGUMENTS, not captured constants —
        capture at CAP=1M stalls lowering/compile for many minutes."""
        def body(i, c):
            idx, acc, tbl = c
            s = gather_sum(idx, tbl)  # u32[B] dependent on gathered bytes
            nidx = (idx + s.astype(jnp.int32) + i) & (CAP - 1)
            return (jnp.abs(nidx), acc + jnp.sum(s), tbl)

        def build_run(iters):
            @jax.jit
            def run_impl(seed, tbl):
                out = jax.lax.fori_loop(
                    0, iters, body, (seed, jnp.uint32(0), tbl))
                return out[1]

            return lambda seed: run_impl(seed, tables)

        return build_run

    SEP4 = (vec_u32, nbr_u32, sc_u32, codes_u32)

    def sep4_sum(idx, tbl):
        vec, nbr, sc, codes = tbl
        a = jnp.sum(vec[idx], axis=-1)
        b = jnp.sum(nbr[idx], axis=-1)
        c = jnp.sum(codes[idx], axis=-1)
        d = jnp.sum(sc[idx], axis=-1)
        return a + b + c + d

    def single_table_sum(idx, tbl):
        return jnp.sum(tbl[0][idx], axis=-1)

    variants = [
        ("sep4 (today)", sep4_sum, SEP4),
        ("combined x1", single_table_sum, (combined,)),
        ("vec only", single_table_sum, (vec_u32,)),
        ("codes only", single_table_sum, (codes_u32,)),
    ]
    for K in (4, 8, 16):
        variants.append(
            (f"pallas comb K={K}",
             functools.partial(
                 lambda idx, tbl, K: jnp.sum(
                     _pipelined_gather(idx, tbl[0], n_flight=K), axis=-1),
                 K=K),
             (combined,))
        )

    def sep4_pallas_sum(idx, tbl, K):
        outs = _pipelined_gather4(idx, tbl, n_flight=K)
        return sum(jnp.sum(o, axis=-1) for o in outs)

    for K in (8, 16):
        variants.append(
            (f"pallas sep4 K={K}",
             functools.partial(sep4_pallas_sum, K=K),
             SEP4)
        )

    rng2 = np.random.default_rng(7)
    seeds = [jnp.asarray(rng2.integers(0, CAP, B, dtype=np.int32))
             for _ in range(8)]
    # Correctness check of the pipelined kernel before timing it (XLA
    # variants are timed regardless — each variant is independently
    # guarded so one Mosaic rejection doesn't kill the whole A/B).
    try:
        got = np.asarray(_pipelined_gather(seeds[0], combined))
        want = np.asarray(combined[seeds[0]])
        assert np.array_equal(got, want), "pipelined gather mismatch"
        print("pallas pipelined gather: correct", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"pallas pipelined gather FAILED: {str(e)[:200]}", flush=True)

    for name, fn, tbl in variants:
        try:
            ms = _time_loop(harness(fn, tbl), seeds)
        except Exception as e:  # noqa: BLE001
            print(f"{name:14s}: FAILED {str(e)[:160]}", flush=True)
            continue
        us_per_row = ms * 1e3 / B
        print(f"{name:14s}: {ms:.3f} ms/iter ({us_per_row*1e3:.0f} ns/row)",
              flush=True)


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "knockout"
    if mode == "gather":
        gather_ab()
    else:
        knockout()
