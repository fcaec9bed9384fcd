"""Benchmark: LM-DiskANN build + search on one TPU chip.

Configs (BASELINE.json families; zero-egress environment, so corpora are
synthetic manifolds with fixed seeds — the generator and its parameters are
pinned since round 1 and reproduce the multi-scale neighborhood statistics
that make real ANN corpora navigable):

  1. HEADLINE — SIFT1M-class: 1M x 128d float32, L2, R=64, L_insert=128,
     top-10 @ L_search=100. Edge cache INT4 (the TPU-native choice: INT8
     edges alone are ~8.6 GB at this scale — past the single-chip execution
     envelope; INT4 halves HBM and gather bandwidth and holds recall).
     Reports build seconds (paper Table III: LM-DiskANN SIFT1M = 2467 s),
     QPS through the streaming lane-refill path (+ lock-step comparison),
     recall@10 (strict / tie-aware / eps-1%), p50/p99 batch-64 latency,
     B=1 interactive latency (wall + device-only), and per-row delete
     latency cold/steady (paper Table IV: ~45 ms).
  2. HARD corpus (100k default): Zipf-clustered + anisotropic + duplicates —
     the stressor where recall-vs-L actually moves (utils/corpora.py).
     Runs the post-build refine pass (BENCH_REFINE=0 disables), adaptive
     seeding, and the L<=200 sweep.
  3. DEEP-1M: 1M x 96d angular (cosine), INT4 edges — paper Table II's
     third family at paper scale.
  4. GIST-max: 500k x 960d cosine, TERNARY edges — the largest single-chip
     960d fit (docs/SCALING.md memory table).

Output protocol (round-4 restructure; round 3 timed out and shipped NO
driver-parsed number): stdout carries ONLY compact JSON summary lines —
one emitted immediately after the HEADLINE config finishes, then re-emitted
(updated) after every secondary config. The driver parses the LAST stdout
line, so wherever a timeout lands, the newest complete summary is what
lands in BENCH_r{N}.json. Everything else (progress, errors, full report
path) goes to stderr; the full report is rewritten to
benchmarks/bench_r4.json at every emission.

Time budget: BENCH_BUDGET_S (default 2400 s) is a global deadline.
Secondary configs, forced-backend A/Bs, batch sweeps, and recall-vs-L
points are each gated on remaining budget; a forced kernel backend that
fails ONCE is skipped for the rest of the run (round 3 re-attempted the
Mosaic-rejected deep kernels per config, burning minutes per retry).

Serving path: throughput is measured through searcher.beam_search_many —
all query batches scanned device-side in ONE dispatch (the reference's
MultiScan batching, hnsw_optimize_join.cpp:137-152) — and the headline
additionally sweeps the serving batch size (hop cost is fixed-cost
dominated at B<=1024; see benchmarks/NOTES.md). The per-dispatch path is
reported as qps_per_dispatch for comparison.

Env knobs: BENCH_N (default 1_000_000), BENCH_D (128), BENCH_BATCH (1024),
BENCH_BATCHES ("512,2048" extra stream lane counts), BENCH_QUERIES
(4096), BENCH_L (100), BENCH_WIDTH (1), BENCH_EDGE (int4), BENCH_MAX_BATCH
(2048 build batch; 2048 measured ~1.5x the 1024 steady build rate),
BENCH_INSERT_W (1), BENCH_N2 (500_000 GIST-max; 0 disables), BENCH_N3
(1_000_000 DEEP-1M), BENCH_N4 (100_000 HARD), BENCH_REFINE (1),
BENCH_DELETES (1000), BENCH_DEEP (1; 0 skips the manual-DMA kernel A/B),
BENCH_BUDGET_S (2400).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

_T0 = time.monotonic()
_BUDGET = float(os.environ.get("BENCH_BUDGET_S", 2400))
# Kernel backends that already failed once this run (Mosaic/toolchain
# rejections): never re-attempted (fail-fast, VERDICT r3 item 1b).
_failed_backends: set[str] = set()


def _remaining() -> float:
    return _BUDGET - (time.monotonic() - _T0)


def _log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def _round1(x):
    return None if x is None else round(x, 1)


def _sync(res):
    """Hard device sync via a tiny host pull. jax.block_until_ready has
    been observed to RETURN EARLY on the tunneled axon backend (timings
    collapse to ~0); a host transfer cannot lie, and the device stream is
    in-order so pulling from the LAST dispatched result fences everything
    before it."""
    import numpy as _np

    if hasattr(res, "topk_dists"):
        return _np.asarray(res.topk_dists[:1, :1])
    import jax as _jax

    return _np.asarray(_jax.tree_util.tree_leaves(res)[0][:1])


def make_corpus(n, dims, seed=0xBE7C4, zdim=12):
    """Smooth random manifold with intrinsic dimension 12 embedded in
    ``dims`` (z ~ N(0,I)^12 -> tanh(z W1) W2 + noise): the realistic model
    of descriptor corpora — real SIFT/GIST/DEEP vectors live on
    low-intrinsic-dimension manifolds with continuous neighborhoods, the
    regime graph-ANN methods (and their published recall numbers) assume."""
    rng = np.random.default_rng(seed)
    w1 = rng.standard_normal((zdim, 64)).astype(np.float32)
    w2 = (rng.standard_normal((64, dims)) / np.sqrt(64)).astype(np.float32)

    def gen(m):
        z = rng.standard_normal((m, zdim)).astype(np.float32)
        return np.tanh(z @ w1) @ w2 + 0.02 * rng.standard_normal(
            (m, dims)
        ).astype(np.float32)

    return gen, rng


def run_config(
    *, n, dims, metric, edge_type, l_search, k, batch, n_queries,
    width, r=64, l_insert=128, seed=0xBE7C4, n_deletes=0,
    corpus="manifold", ab=True, batch_sweep=(), sweep_ls=(50, 75),
    adaptive=False, lanes=1024, refine=False, b1=False, max_batch=None,
):
    import dataclasses

    import jax
    import jax.numpy as jnp

    from duckdb_lm_diskann_tpu.common.types import MetricType, VectorType
    from duckdb_lm_diskann_tpu.common.types import EdgeType
    from duckdb_lm_diskann_tpu.core.config import LmDiskannConfig
    from duckdb_lm_diskann_tpu.core.coordinator import Coordinator
    from duckdb_lm_diskann_tpu.core.searcher import (
        beam_search,
        beam_search_many,
        beam_search_stream,
    )
    from duckdb_lm_diskann_tpu.ops.distance import all_pairs_distance

    if corpus == "hard":
        # clustered + anisotropic + duplicate-heavy stressor
        # (utils/corpora.py) — recall-vs-L must have room to move here
        from duckdb_lm_diskann_tpu.utils.corpora import make_hard_corpus

        gen, rng = make_hard_corpus(n, dims, seed)
    else:
        gen, rng = make_corpus(n, dims, seed)
    data = gen(n)
    qidx = rng.integers(0, n, n_queries)
    queries = data[qidx] + 0.01 * rng.standard_normal(
        (n_queries, dims)
    ).astype(np.float32)

    cfg = LmDiskannConfig(
        metric_type=MetricType.parse(metric),
        r=r,
        l_insert=l_insert,
        alpha=1.2,
        l_search=l_search,
        dimensions=dims,
        node_vector_type=VectorType.FLOAT32,
        edge_type=EdgeType.parse(edge_type) if edge_type else None,
        # Bulk-build insert-path beam width: with the fused insert
        # program, W=1 == W=2 within tunnel noise (round-4 interleaved
        # A/B at max_batch=2048: W1 2491/3118 vs W2 2793/2909 steady/s)
        # — W=1 keeps the visit-order-parity semantics. The r3 +7% for
        # W=2 predated dispatch fusing.
        insert_beam_width=int(os.environ.get("BENCH_INSERT_W", 1)),
    )
    cfg.validate()
    if max_batch is None:
        max_batch = int(os.environ.get("BENCH_MAX_BATCH", 2048))

    t0 = time.perf_counter()
    coord = Coordinator(cfg, initial_capacity=n)
    coord.bulk_build(list(range(n)), data, max_batch=max_batch)
    _sync(coord.arrays)  # fence the last insert dispatch into build_s
    build_s = time.perf_counter() - t0
    _log(f"# built n={n} in {build_s:.1f}s (budget left {_remaining():.0f}s)")
    refine_s = None
    if refine:
        # Post-build Vamana second pass + reachability repair (the HARD
        # build-side recall lever, VERDICT r4 item 2).
        t0r = time.perf_counter()
        coord.refine()
        _sync(coord.arrays)
        refine_s = time.perf_counter() - t0r
        _log(f"# refine pass in {refine_s:.1f}s")
    # Compile vs steady split: XLA compiles synchronously at dispatch, so
    # host-call durations >1s on individual insert batches are one-time
    # compiles (per program/shape), not build throughput. Steady-state rate
    # excludes them — the number a warm-cache production build sees.
    durs = [t for _, t in coord.build_timings]
    build_compile_s = round(sum(t for t in durs if t > 1.0), 1)
    steady_s = max(build_s - build_compile_s, 1e-9)

    L = max(l_search, k)
    q_dev = jnp.asarray(queries)
    entry = jnp.int32(coord.entry_slot)
    all_valid = not coord._ever_tombstoned

    # ------------------------------------------------------------------ #
    # Serving throughput: beam_search_many scans all query batches inside
    # ONE dispatch (VERDICT r3 item 2 — the per-dispatch path paid ~25 ms
    # of tunneled-backend overhead per 1024-query batch).

    def timed_many(tag, params_=None, L_s=None, batch_b=None, reps=3):
        """Best-of-reps QPS through the one-dispatch pipelined path.
        Returns (qps, warmup_result, error). A failure is recorded, not
        fatal (forced kernel backends can be toolchain-rejected)."""
        params_ = coord.params if params_ is None else params_
        L_s = L if L_s is None else max(L_s, k)
        batch_b = batch if batch_b is None else batch_b
        batch_b = min(batch_b, n_queries)  # BENCH_QUERIES < BENCH_BATCH
        nb = max(n_queries // batch_b, 1)
        nq = nb * batch_b
        qs = q_dev[:nq].reshape(nb, batch_b, dims)

        def call():
            return beam_search_many(
                coord.arrays, qs, entry, params=params_, l_search=L_s,
                k=k, beam_width=width, assume_all_valid=all_valid,
            )

        try:
            res = call()
            _sync(res)  # warmup + compile
            best = 0.0
            for _ in range(reps):
                t1 = time.perf_counter()
                out = call()
                _sync(out)
                best = max(best, nq / (time.perf_counter() - t1))
            return best, res, None
        except Exception as e:  # noqa: BLE001
            _log(f"# {tag} failed: {str(e)[:160]}")
            return None, None, str(e)[:160]

    def timed_stream(tag, params_=None, L_s=None, lanes_=None, reps=3,
                     entry_=None):
        """Best-of-reps QPS through the streaming lane-refill path
        (searcher.beam_search_stream): converged lanes immediately take the
        next query from the device-side queue — the skew-aware rebatching
        of BASELINE config #5; result-identical to the lock-step path."""
        params_ = coord.params if params_ is None else params_
        L_s = L if L_s is None else max(L_s, k)
        lanes_ = lanes if lanes_ is None else lanes_
        ent = entry if entry_ is None else entry_

        def call():
            return beam_search_stream(
                coord.arrays, q_dev, ent, params=params_, l_search=L_s,
                k=k, lanes=lanes_, assume_all_valid=all_valid,
            )

        try:
            res = call()
            _sync(res)
            best = 0.0
            for _ in range(reps):
                t1 = time.perf_counter()
                out = call()
                _sync(out)
                best = max(best, n_queries / (time.perf_counter() - t1))
            return best, res, None
        except Exception as e:  # noqa: BLE001
            _log(f"# {tag} failed: {str(e)[:160]}")
            return None, None, str(e)[:160]

    # Primary serving path: streaming lane refill. The lock-step pipelined
    # path (round 4's primary) is kept as qps_lockstep for comparison.
    qps, res0, err0 = timed_stream("headline serving (stream)")
    if res0 is None:
        raise RuntimeError(f"serving path failed: {err0}")
    total_q = n_queries
    all_ids = np.asarray(res0.topk_slots)[:total_q]
    mean_visits = float(np.asarray(res0.visited_count).mean())
    stream_hops = int(res0.hops)
    lane_util = mean_visits * total_q / max(stream_hops * lanes, 1)
    mean_hops = stream_hops  # total lock-step iterations across the queue

    qps_lockstep = None
    if _remaining() > 240:
        qps_lockstep, _, _ = timed_many("lock-step serving", reps=2)

    # Serving lane sweep (headline only): per-hop cost turns superlinear
    # past ~1024 lanes (the edge scorer's [B, R, D] dequant intermediate
    # stops fusing — benchmarks/NOTES.md round 5), so 1024 is the measured
    # optimum; the sweep keeps that decision pinned to data.
    batch_table = {str(lanes): _round1(qps)}
    best_batch = lanes
    for bb in batch_sweep:
        if bb > n_queries or _remaining() < 240:
            break
        q_bb, _, _ = timed_stream(f"lanes {bb}", lanes_=bb, reps=2)
        batch_table[str(bb)] = _round1(q_bb)
        if q_bb and q_bb > qps:
            qps, best_batch = q_bb, bb

    # Per-dispatch comparison point (the round<=3 measurement path).
    qps_per_dispatch = None
    if _remaining() > 180:
        def run_batch(qb):
            return beam_search(
                coord.arrays, qb, entry, params=coord.params, l_search=L,
                k=k, beam_width=width, assume_all_valid=all_valid,
            )

        _sync(run_batch(q_dev[:batch]))
        nb = max(n_queries // batch, 1)
        t1 = time.perf_counter()
        outs = [run_batch(q_dev[i * batch : (i + 1) * batch]) for i in range(nb)]
        _sync(outs[-1])
        qps_per_dispatch = nb * batch / (time.perf_counter() - t1)

    # Forced-backend A/Bs (kernel-dispatch deltas, VERDICT r1 item 3): the
    # same pipelined loop under each frontier-scoring backend ("1" = fused
    # Pallas, "0" = plain-XLA jnp, "2" = K-deep manual-DMA Pallas).
    forced_qps = {}
    forced_err = {}
    if ab:
        backends = ["1", "0"] + (
            ["2"] if edge_type in ("int4", "ternary") else []
        )
        for b in backends:
            if b in _failed_backends:
                forced_err[b] = "skipped: backend failed earlier this run"
                continue
            if b == "2" and (
                os.environ.get("BENCH_DEEP", "1") == "0"
                or _remaining() < 600
            ):
                forced_err[b] = "skipped: budget/BENCH_DEEP"
                continue
            if _remaining() < 180:
                forced_err[b] = "skipped: budget"
                continue
            fp = dataclasses.replace(coord.params, pallas=b)
            forced_qps[b], _, err = timed_many(f"pallas backend {b}", fp, reps=1)
            if err is not None:
                forced_err[b] = err
                _failed_backends.add(b)

    # Hop-merge A/B: bitonic compare-exchange networks vs generic lax.sort
    # (exactness-equal; ops/topk.merge_beams), forced to the opposite of
    # the default so the report carries both.
    qps_other_merge = None
    if ab and _remaining() > 240:
        qps_other_merge, _, _ = timed_many(
            "merge A/B",
            dataclasses.replace(coord.params, bitonic=not coord.params.bitonic),
            reps=1,
        )

    # Latency percentiles at serving batch 64 (per-query latency in a
    # batched engine == its batch's latency) — inherently per-dispatch.
    p50 = p99 = None
    if _remaining() > 120:
        def run_batch64(qb):
            return beam_search(
                coord.arrays, qb, entry, params=coord.params, l_search=L,
                k=k, beam_width=width, assume_all_valid=all_valid,
            )

        lat_batch = 64
        _sync(run_batch64(q_dev[:lat_batch]))
        lat = []
        for i in range(min(32, n_queries // lat_batch)):
            t1 = time.perf_counter()
            o = run_batch64(q_dev[i * lat_batch : (i + 1) * lat_batch])
            _sync(o)
            lat.append(time.perf_counter() - t1)
        lat = np.asarray(lat) * 1e3
        p50 = float(np.percentile(lat, 50))
        p99 = float(np.percentile(lat, 99))

    # Interactive single-query latency (VERDICT r4 item 6). Two views:
    #   p50_b1_ms       — wall clock per B=1 dispatch on THIS harness,
    #                     which includes the tunneled backend's ~20 ms
    #                     fixed per-dispatch overhead (an artifact of the
    #                     sandbox transport, not the engine);
    #   b1_device_ms    — per-query device time, measured by scanning 256
    #                     sequential B=1 searches inside ONE dispatch
    #                     (beam_search_many with batch 1): the engine-side
    #                     latency a locally-attached chip would see.
    p50_b1 = p99_b1 = b1_dev = None
    if b1 and _remaining() > 150:
        def run_b1(qb):
            return beam_search(
                coord.arrays, qb, entry, params=coord.params, l_search=L,
                k=k, beam_width=width, assume_all_valid=all_valid,
            )

        _sync(run_b1(q_dev[:1]))
        lat1 = []
        for i in range(48):
            t1 = time.perf_counter()
            o = run_b1(q_dev[i : i + 1])
            _sync(o)
            lat1.append(time.perf_counter() - t1)
        lat1 = np.asarray(lat1) * 1e3
        p50_b1 = float(np.percentile(lat1, 50))
        p99_b1 = float(np.percentile(lat1, 99))

        nb1 = min(256, n_queries)
        qs1 = q_dev[:nb1].reshape(nb1, 1, dims)

        def call_b1_scan():
            return beam_search_many(
                coord.arrays, qs1, entry, params=coord.params, l_search=L,
                k=k, beam_width=width, assume_all_valid=all_valid,
            )

        _sync(call_b1_scan())
        t1 = time.perf_counter()
        _sync(call_b1_scan())
        b1_dev = (time.perf_counter() - t1) / nb1 * 1e3

    # Recall@k vs exact brute force. lax.top_k over n-wide rows is
    # pathologically slow at n=1M on TPU; segmented exact top-k instead:
    # top-k per 1024-wide segment, then top-k of the union — identical
    # result (the global top-k is contained in the per-segment top-ks).
    cap = int(coord.arrays.vectors.shape[0])  # pow2 slot capacity
    seg = min(1024, cap)

    # NOTE: vectors must be an ARGUMENT, not a closure — a closed-over
    # device array is embedded as an HLO constant and serialized into the
    # remote-compile request (512 MB at 1M x 128d -> HTTP 413 on the
    # axon tunnel). Scoring runs over the full pow2 capacity array (slots
    # >= n masked to +inf) to avoid materializing a [n, D] copy.
    @jax.jit
    def exact_topk(qs, vecs):
        d = all_pairs_distance(qs, vecs.astype(jnp.float32),
                               cfg.metric_type)  # [Q, cap]
        Q = d.shape[0]
        d = jnp.where(jnp.arange(cap)[None, :] < n, d, jnp.inf)
        ds = d.reshape(Q, cap // seg, seg)
        sd, si = jax.lax.top_k(-ds, k)  # [Q, S, k] per-segment
        base = (jnp.arange(cap // seg, dtype=jnp.int32) * seg)[None, :, None]
        cand_i = (si + base).reshape(Q, -1)
        cand_d = sd.reshape(Q, -1)
        fd, fi = jax.lax.top_k(cand_d, k)
        return jnp.take_along_axis(cand_i, fi, axis=-1)

    bf_chunk = 512
    truth = np.concatenate([
        np.asarray(exact_topk(q_dev[i : i + bf_chunk], coord.arrays.vectors))
        for i in range(0, total_q, bf_chunk)
    ])

    def recall_of(ids):
        hits = 0
        for b in range(total_q):
            hits += len(set(ids[b].tolist()) & set(truth[b].tolist()))
        return hits / (total_q * k)

    recall = recall_of(all_ids)

    # Epsilon-recall: a returned entry counts if its exact distance is
    # within (1+eps) of the true kth distance. On corpora with dense
    # rank-boundary ties (the HARD corpus: 82% of queries have <1% margin
    # between the 10th and 11th true neighbor) strict set-recall counts
    # distance-equivalent answers as misses; both views are reported.
    tv = data[truth[:, -1]]
    qm = queries[:total_q]
    if metric == "l2":
        d_at_k = np.linalg.norm(qm - tv, axis=1)
    elif metric == "cosine":
        num = (qm * tv).sum(1)
        den = np.linalg.norm(qm, axis=1) * np.linalg.norm(tv, axis=1)
        d_at_k = 1.0 - num / np.maximum(den, 1e-30)
    else:  # ip
        d_at_k = -(qm * tv).sum(1)

    def eps_recall_of(res, eps):
        ids = np.asarray(res.topk_slots).reshape(-1, k)[:total_q]
        dd = np.asarray(res.topk_dists).reshape(-1, k)[:total_q]
        # additive-relative bound: correct sign for IP's negative distances
        bound = d_at_k + eps * np.abs(d_at_k) + 1e-12
        ok = (ids >= 0) & (dd <= bound[:, None])
        return float(ok.sum() / (total_q * k))

    recall_eps1 = eps_recall_of(res0, 0.01)
    # Tie-aware recall (eps -> 0): counts a returned id as a hit iff its
    # exact distance <= the k-th true distance (to ~1 ulp). On corpora with
    # EXACT duplicate rows (the HARD stressor: 5%) the strict set-recall
    # denominator is ill-defined at tie boundaries — argpartition picks an
    # arbitrary member of each tied group — so this is the standard
    # tie-insensitive counting rule (big-ann-benchmarks uses the same
    # threshold form). Reported alongside, never instead of, strict recall.
    recall_tie = eps_recall_of(res0, 1e-6)
    _log(f"# qps={qps:.0f} recall={recall:.4f} (left {_remaining():.0f}s)")

    # Recall-vs-L Pareto sweep (the paper's Fig. 4-5 methodology): beam
    # width L is THE recall-latency knob; report (L, qps, recall) points
    # and the fastest configuration that still clears the 0.95 target.
    sweep = []
    seen_ls = set()
    for L_s in (*sweep_ls, l_search):
        L_s = max(L_s, k)
        if L_s in seen_ls or (L_s != l_search and _remaining() < 240):
            continue
        seen_ls.add(L_s)
        q_s, res_s, err_s = timed_stream(f"L={L_s}", L_s=L_s, reps=2)
        if err_s is not None:
            continue
        if L_s == l_search:
            rec_s = recall
        else:
            ids_s = np.asarray(res_s.topk_slots).reshape(-1, k)[:total_q]
            rec_s = recall_of(ids_s)
        sweep.append(
            {"l": L_s, "qps": _round1(q_s), "recall": round(rec_s, 4)}
        )
    qps_at_95 = max(
        (p["qps"] for p in sweep if p["recall"] >= 0.95 and p["qps"]),
        default=None,
    )

    # Query-adaptive seeding (clustered-corpus configs): seed each query's
    # beam at its 2 nearest nodes of a 4096-node stratified sample
    # (searcher.pick_adaptive_seeds) — the IVF-style entry fix; measured
    # +2.4% strict recall on HARD at the same visit budget.
    adaptive_out = None
    if adaptive and _remaining() > 180:
        from duckdb_lm_diskann_tpu.core.searcher import pick_adaptive_seeds

        m = min(4096, n)
        sample = jnp.asarray(
            ((np.arange(m, dtype=np.int64) * n) // m).astype(np.int32)
        )
        seeds_all = pick_adaptive_seeds(
            coord.arrays.vectors, q_dev[:total_q], sample,
            metric=cfg.metric_type, s_count=2,
        )  # [NQ, 2] per-query seeds through the stream path
        try:
            best_a = {}
            for L_a in sorted({L, *(max(x, k) for x in sweep_ls)}):
                if L_a != L and _remaining() < 180:
                    continue
                qps_a, res_a, err_a = timed_stream(
                    f"adaptive L={L_a}", L_s=L_a, entry_=seeds_all,
                    reps=2,
                )
                if err_a is not None:
                    continue
                ids_a = np.asarray(res_a.topk_slots)[:total_q]
                pt = {
                    "l": L_a,
                    "qps": _round1(qps_a),
                    "recall_at_k": round(recall_of(ids_a), 4),
                    "recall_tie_aware": round(eps_recall_of(res_a, 1e-6), 4),
                    "recall_eps1pct": round(eps_recall_of(res_a, 0.01), 4),
                }
                best_a.setdefault("sweep", []).append(pt)
                if L_a == L:
                    best_a.update(pt)
            if best_a:
                best_a.update({"seeds": 2, "sample": int(sample.shape[0])})
                adaptive_out = best_a
        except Exception as e:  # noqa: BLE001
            _log(f"# adaptive-seed pass failed: {str(e)[:160]}")

    out = {
        "n": n,
        "dims": dims,
        "metric": metric,
        "edge_type": edge_type,
        "build_seconds": round(build_s, 1),
        "inserts_per_second": round(n / build_s, 1),
        "build_compile_s": build_compile_s,
        "inserts_per_second_steady": round(n / steady_s, 1),
        "insert_beam_width": cfg.insert_beam_width,
        "build_max_batch": max_batch,
        "qps": round(qps, 1),
        "serving_path": "stream",
        "qps_lockstep": _round1(qps_lockstep),
        "qps_per_dispatch": _round1(qps_per_dispatch),
        "serving_batch": best_batch,
        "lane_utilization": round(lane_util, 4),
        "qps_vs_lanes": batch_table,
        **({"refine_seconds": round(refine_s, 1)} if refine_s else {}),
        "qps_pallas": _round1(forced_qps.get("1")),
        "qps_xla": _round1(forced_qps.get("0")),
        (
            "qps_laxsort_merge" if coord.params.bitonic else "qps_bitonic_merge"
        ): _round1(qps_other_merge),
        **(
            {"qps_pallas_deep": _round1(forced_qps["2"])}
            if "2" in forced_qps
            else {}
        ),
        **{
            f"qps_pallas_error_{b}": err
            for b, err in forced_err.items()
            if err is not None
        },
        "recall_at_k": round(recall, 4),
        "recall_tie_aware": round(recall_tie, 4),
        "recall_eps1pct": round(recall_eps1, 4),
        "k": k,
        "l_search": L,
        "batch": batch,
        "beam_width": width,
        "p50_batch64_ms": None if p50 is None else round(p50, 2),
        "p99_batch64_ms": None if p99 is None else round(p99, 2),
        "p50_b1_ms": None if p50_b1 is None else round(p50_b1, 2),
        "p99_b1_ms": None if p99_b1 is None else round(p99_b1, 2),
        "b1_device_ms": None if b1_dev is None else round(b1_dev, 2),
        "mean_visits_per_query": round(mean_visits, 1),
        "stream_hops_total": int(mean_hops),
        "recall_vs_l": sweep,
        "qps_at_recall95": qps_at_95,
        **({"adaptive_seeds": adaptive_out} if adaptive_out else {}),
    }

    # Roofline accounting (SURVEY M5): irreducible HBM bytes per hop vs the
    # chip's bandwidth -> speed-of-light QPS; sol_fraction is the headroom
    # left to kernel/overhead work (1.0 = bandwidth-bound perfection).
    from duckdb_lm_diskann_tpu.utils.roofline import device_hbm_gbps, hop_roofline

    rl = hop_roofline(
        coord.params,
        batch=best_batch,
        l_search=L,
        beam_width=width,
        mean_visits=mean_visits,
        hbm_gbps=device_hbm_gbps(jax.devices()[0].device_kind),
    )
    out["roofline"] = rl.as_dict()
    out["sol_fraction"] = round(qps / rl.sol_qps, 4) if rl.sol_qps else None

    if n_deletes and _remaining() > 150:
        # Per-row delete latency (paper Table IV: LM-DiskANN ~45 ms/row).
        # Two batches: the first pays the one-time XLA compiles of the
        # repair/rescue/refresh programs (reported separately as the cold
        # number); the second is the steady-state rate a production
        # workload sees — the figure comparable to the paper's.
        picks = rng.choice(n, 2 * n_deletes, replace=False)
        times = []
        for half in (picks[:n_deletes], picks[n_deletes:]):
            t1 = time.perf_counter()
            coord.delete(half.tolist())
            # delete() dispatches repair/rescue asynchronously; the latency
            # number must include the device work, not just host dispatch.
            _sync(coord.arrays)
            times.append(time.perf_counter() - t1)
        out["delete_ms_per_row"] = round(times[1] * 1e3 / n_deletes, 3)
        out["delete_cold_ms_per_row"] = round(times[0] * 1e3 / n_deletes, 3)
        out["delete_rows"] = n_deletes
    elif n_deletes:
        out["delete_skipped_budget"] = True

    return out


def _compact(full: dict) -> dict:
    main_cfg = full["extra"]["headline"]
    extra = full["extra"]
    return {
        "metric": full["metric"],
        "value": full["value"],
        "unit": "qps",
        "vs_baseline": full["vs_baseline"],
        "recall": main_cfg["recall_at_k"],
        "build_s": main_cfg["build_seconds"],
        "inserts_per_s_steady": main_cfg["inserts_per_second_steady"],
        "delete_ms": main_cfg.get("delete_ms_per_row"),
        "delete_cold_ms": main_cfg.get("delete_cold_ms_per_row"),
        "serving_batch": main_cfg.get("serving_batch"),
        "qps_per_dispatch": main_cfg.get("qps_per_dispatch"),
        "qps_xla": main_cfg.get("qps_xla"),
        "qps_pallas": main_cfg.get("qps_pallas"),
        "qps_pallas_deep": main_cfg.get("qps_pallas_deep"),
        "sol_fraction": main_cfg.get("sol_fraction"),
        "qps_lockstep": main_cfg.get("qps_lockstep"),
        "p50_b1_ms": main_cfg.get("p50_b1_ms"),
        "b1_device_ms": main_cfg.get("b1_device_ms"),
        "gist_qps": (extra.get("gist_max") or {}).get("qps"),
        "gist_n": (extra.get("gist_max") or {}).get("n"),
        "deep1m_qps": (extra.get("deep_1m") or {}).get("qps"),
        "deep1m_recall": (extra.get("deep_1m") or {}).get("recall_at_k"),
        "hard_recall_l50": next(
            (p["recall"] for p in
             (extra.get("hard_like") or {}).get("recall_vs_l", [])
             if p["l"] == 50),
            None,
        ),
        "hard_recall": (extra.get("hard_like") or {}).get("recall_at_k"),
        "hard_recall_eps1": (extra.get("hard_like") or {}).get("recall_eps1pct"),
        "hard_recall_adaptive": ((extra.get("hard_like") or {}).get("adaptive_seeds") or {}).get("recall_at_k"),
        "hard_recall_best_l200": max(
            (p["recall_at_k"]
             for p in ((extra.get("hard_like") or {}).get("adaptive_seeds")
                       or {}).get("sweep", [])
             if p["l"] <= 200 and p.get("recall_at_k") is not None),
            default=None,
        ),
        "hard_qps": (extra.get("hard_like") or {}).get("qps"),
        "configs_done": extra.get("configs_done"),
        "elapsed_s": round(time.monotonic() - _T0, 1),
    }


def main() -> None:
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(__file__) or ".", ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    n = int(os.environ.get("BENCH_N", 1_000_000))
    dims = int(os.environ.get("BENCH_D", 128))
    batch = int(os.environ.get("BENCH_BATCH", 1024))
    n_queries = int(os.environ.get("BENCH_QUERIES", 4096))
    l_search = int(os.environ.get("BENCH_L", 100))
    width = int(os.environ.get("BENCH_WIDTH", 1))
    edge = os.environ.get("BENCH_EDGE", "int4")
    n_deletes = int(os.environ.get("BENCH_DELETES", 1000))
    batch_sweep = tuple(
        int(b) for b in os.environ.get("BENCH_BATCHES", "512,2048").split(",")
        if b.strip()
    )

    blob_path = os.path.join(
        os.path.dirname(__file__) or ".", "benchmarks", "bench_r5.json"
    )

    def emit(extra, main_cfg):
        """Rewrite the full report AND re-print the compact line: the
        newest stdout line is always a complete, parseable summary."""
        full = {
            "metric": (
                f"QPS/chip SIFT-like-{n//1000}k d{dims} L2 top-10 "
                f"(recall@10={main_cfg['recall_at_k']:.3f}, "
                f"build={main_cfg['build_seconds']}s, L={l_search})"
            ),
            "value": main_cfg["qps"],
            "unit": "qps",
            "vs_baseline": round(main_cfg["qps"] / 5000.0, 3),
            "extra": extra,
        }
        with open(blob_path, "w") as f:
            json.dump(full, f, indent=1)
        _log(f"# full report -> {blob_path}")
        print(json.dumps(_compact(full)), flush=True)

    main_cfg = run_config(
        n=n, dims=dims, metric="l2", edge_type=edge, l_search=l_search,
        k=10, batch=batch, n_queries=n_queries, width=width,
        n_deletes=n_deletes, ab=True, batch_sweep=batch_sweep, b1=True,
    )
    extra = {
        "headline": main_cfg,
        "device": str(jax.devices()[0]),
        "configs_done": ["headline"],
    }
    emit(extra, main_cfg)  # the protected number: lands whatever follows

    # Secondary configs in priority order; each is budget-gated, fault-
    # isolated, and re-emits the updated summary on completion.
    n4 = int(os.environ.get("BENCH_N4", 100_000))
    n2 = int(os.environ.get("BENCH_N2", 262_144))
    n3 = int(os.environ.get("BENCH_N3", 1_000_000))
    do_refine = os.environ.get("BENCH_REFINE", "1") != "0"
    secondaries = [
        # HARD corpus first: the tracked stressor quality number, now at
        # 100k (VERDICT r4 item 2) with the build-side refine pass and the
        # full L<=200 budget the contract allows.
        ("hard_like", n4, dict(
            n=n4, dims=dims, metric="l2", edge_type=edge, l_search=l_search,
            k=10, batch=min(batch, 1024), n_queries=min(n_queries, 2048),
            width=width, seed=0x4A2D, corpus="hard", ab=False,
            sweep_ls=(50, 150, 200), adaptive=True, lanes=512,
            refine=do_refine,
        )),
        # DEEP-1M: paper Table II's third family AT PAPER SCALE — 96d fits
        # one chip comfortably (VERDICT r4 missing #1).
        ("deep_1m", n3, dict(
            n=n3, dims=96, metric="cosine", edge_type="int4",
            l_search=100, k=10, batch=1024, n_queries=2048, width=width,
            seed=0xDEE9, ab=False, sweep_ls=(),
        )),
        # GIST-class at the largest single-chip fit: 500k x 960d cosine,
        # TERNARY edges (~7.7 GB edge planes + 1.9 GB f32 vectors; see
        # docs/SCALING.md memory table).
        ("gist_max", n2, dict(
            n=n2, dims=960, metric="cosine", edge_type="ternary",
            l_search=128, k=10, batch=256, n_queries=1024, width=width,
            seed=0x61577, ab=False, sweep_ls=(), lanes=256,
            # Largest single-chip 960d fit with f32 nodes + R=64 ternary
            # edges: arrays are POW2-capacity sized, and the next bucket
            # (524288 slots = ~10 GB of graph state) measured
            # RESOURCE_EXHAUSTED once the build's [T, 256, 960] prune
            # transients stacked on top (R=48 as an alternative crashes
            # the sandbox's remote compile helper outright). 262144 slots
            # = ~5 GB persistent, comfortable. INT8 node vectors would
            # halve the vector term but collapse tight-margin recall
            # (benchmarks/NOTES.md round 5 INT8 A/B).
            max_batch=1024,
        )),
    ]
    for key, n_cfg, kwargs in secondaries:
        if not n_cfg:
            continue
        if _remaining() < 300:
            extra[f"{key}_skipped"] = "budget"
            _log(f"# skipping {key}: {_remaining():.0f}s left")
            continue
        try:
            extra[key] = run_config(**kwargs)
            extra["configs_done"].append(key)
        except Exception as e:  # noqa: BLE001
            extra[f"{key}_error"] = str(e)[:200]
            _log(f"# {key} failed: {str(e)[:200]}")
        emit(extra, main_cfg)


if __name__ == "__main__":
    sys.exit(main())
