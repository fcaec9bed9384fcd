"""A/B the INT4 edge-score formulation at 1M scale (slope timing).

The hop knockout showed the INT4 edge gather+dequant+score is the largest
component of the serving hop. Candidates measured here, all computing
approx L2 distances [B, R] from a gathered row of cached edge codes (the
LM-DiskANN in-block compressed neighbor vectors,
libsql/vectordiskann.c:1370-1396):

  cur    — today's layout: u8[C, R, D/2] interleaved lo/hi nibbles,
           decode_int4 (stack+reshape interleave) then (q-v)^2 sum.
  planar — u32[C, R, D/8] words, nibble slot s holds dim chunk s (planar:
           unpack = 8 shift/mask ops, NO interleave); dequant to f32
           [B, R, D] by concat, then (q-v)^2 sum.
  dot    — planar u32 layout + dot-form L2: |q|^2 - 2*s*(q.c) + s^2*|c|^2
           with per-slot partial dots (never materializes [B, R, D]);
           |c|^2 recomputed from the nibbles.
  dotn2  — dot form with |c|^2*s^2 precomputed and gathered (f32[C, R]
           extra table; trades 4 B/edge HBM for the on-the-fly norm).

Methodology: per-variant cost is the SLOPE of total time vs fori_loop
iteration count (two ITERS points), which cancels the per-dispatch fixed
overhead of the tunneled backend (~tens of ms — large enough to have
polluted the round-2 single-point in-loop numbers). Tables ride in the
loop carry so they are jit arguments, not baked constants. The next
iteration's rows depend on the previous scores (real hops are dependent).
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
sys.path.insert(0, "/root/repo")
from duckdb_lm_diskann_tpu.ops.quantize import decode_int4

B, R, D = 1024, 64, 128
# 512k rows: BOTH layouts' tables must fit at once (~4.6 GB; the device
# exposes ~8 GB usable). Formulation costs are per-row, not table-size-
# dependent, so the comparison transfers to 1M.
CAP = 1 << 19
DW = D // 8  # u32 words per code vector, planar nibble layout

ITERS_LO, ITERS_HI = 64, 256
REPS = 5


def slope_time(build_run, args_list):
    """build_run(iters) -> jitted fn(args); returns ms per iteration."""
    run_lo = build_run(ITERS_LO)
    run_hi = build_run(ITERS_HI)
    _ = np.asarray(run_lo(args_list[0]))
    _ = np.asarray(run_hi(args_list[0]))
    t_lo, t_hi = [], []
    for i in range(REPS):
        a = args_list[(i + 1) % len(args_list)]
        t0 = time.perf_counter()
        _ = np.asarray(run_lo(a))
        t_lo.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        _ = np.asarray(run_hi(a))
        t_hi.append(time.perf_counter() - t0)
    fixed_lo, fixed_hi = min(t_lo), min(t_hi)
    return (
        (fixed_hi - fixed_lo) / (ITERS_HI - ITERS_LO) * 1e3,  # ms/iter slope
        fixed_lo * 1e3,
        fixed_hi * 1e3,
    )


def sign4(x):
    """4-bit two's-complement sign extension of nibbles held in i32."""
    return (x ^ 8) - 8


def main():
    rng = np.random.default_rng(0)
    dev = jax.devices()[0]
    put = lambda x: jax.device_put(jnp.asarray(x), dev)
    # Tables are built ON DEVICE (a host-side [CAP, R, D] f32 intermediate
    # is ~34 GB). Today's interleaved-u8 table and the planar-u32
    # re-encoding of the SAME codes, so formulations score identical values.
    key = jax.random.PRNGKey(0)
    CH = 1 << 16  # build chunk (full-CAP temps would be ~17 GB)

    import functools

    @functools.partial(jax.jit, donate_argnums=(0, 1, 2, 3))
    def fill(t_u8, t_w, t_sc, t_n2, key, off):
        ku, ks = jax.random.split(key)
        edge_u8 = jax.random.randint(
            ku, (CH, R, D // 2), 0, 256, dtype=jnp.uint32
        ).astype(jnp.uint8)
        # interleaved u8 -> planar words: byte b holds dims 2b (lo), 2b+1
        # (hi); chunk s = dims [s*DW, (s+1)*DW) lives in bytes
        # [s*DW/2, (s+1)*DW/2). Slot s of word w holds dim s*DW + w.
        u = edge_u8.astype(jnp.uint32).reshape(CH, R, 8, DW // 2)
        lo = u & 0xF  # dims s*DW + 2j
        hi = u >> 4  # dims s*DW + 2j + 1
        w_even = jnp.zeros((CH, R, DW // 2), jnp.uint32)
        w_odd = jnp.zeros((CH, R, DW // 2), jnp.uint32)
        for s in range(8):
            w_even = w_even | (lo[:, :, s, :] << (4 * s))
            w_odd = w_odd | (hi[:, :, s, :] << (4 * s))
        words = jnp.stack([w_even, w_odd], axis=-1).reshape(CH, R, DW)
        scales = jax.random.uniform(ks, (CH, R), jnp.float32) + 0.5
        # |c|^2 from the words themselves
        n2 = jnp.zeros((CH, R), jnp.float32)
        wi = words.astype(jnp.int32)
        for s in range(8):
            c = sign4((wi >> (4 * s)) & 0xF).astype(jnp.float32)
            n2 = n2 + jnp.sum(c * c, axis=-1)
        z = jnp.zeros((), jnp.int32)
        upd = jax.lax.dynamic_update_slice
        return (
            upd(t_u8, edge_u8, (off, z, z)),
            upd(t_w, words, (off, z, z)),
            upd(t_sc, scales, (off, z)),
            upd(t_n2, n2 * scales * scales, (off, z)),
        )

    t_u8 = jax.device_put(jnp.zeros((CAP, R, D // 2), jnp.uint8), dev)
    t_w = jax.device_put(jnp.zeros((CAP, R, DW), jnp.uint32), dev)
    t_sc = jax.device_put(jnp.zeros((CAP, R), jnp.float32), dev)
    t_n2 = jax.device_put(jnp.zeros((CAP, R), jnp.float32), dev)
    for i in range(CAP // CH):
        key, sub = jax.random.split(key)
        t_u8, t_w, t_sc, t_n2 = fill(
            t_u8, t_w, t_sc, t_n2, sub, jnp.int32(i * CH)
        )
    jax.block_until_ready(t_n2)
    print("tables built", flush=True)
    queries = rng.standard_normal((B, D)).astype(np.float32)
    t_q = put(queries)
    q_chunks = t_q.reshape(B, 8, DW)  # planar chunk view of the query
    q2 = jnp.sum(t_q * t_q, axis=-1)  # [B]

    def score_cur(cur, tabs):
        packed = tabs["u8"][cur]  # [B, R, D/2]
        scale = tabs["sc"][cur]
        vecs = decode_int4(packed, scale, D)  # [B, R, D]
        diff = tabs["q"][:, None, :] - vecs
        return jnp.sum(diff * diff, axis=-1)

    def score_planar(cur, tabs):
        w = tabs["w"][cur].astype(jnp.int32)  # [B, R, DW]
        parts = [sign4((w >> (4 * s)) & 0xF) for s in range(8)]
        vecs = jnp.concatenate(parts, axis=-1).astype(jnp.float32)
        vecs = vecs * tabs["sc"][cur][..., None]
        diff = tabs["q"][:, None, :] - vecs
        return jnp.sum(diff * diff, axis=-1)

    def score_dot(cur, tabs):
        w = tabs["w"][cur].astype(jnp.int32)  # [B, R, DW]
        s = tabs["sc"][cur]  # [B, R]
        dot = jnp.zeros((B, R), jnp.float32)
        n2 = jnp.zeros((B, R), jnp.float32)
        for sl in range(8):
            c = sign4((w >> (4 * sl)) & 0xF).astype(jnp.float32)
            dot = dot + jnp.einsum("bw,brw->br", tabs["qc"][:, sl], c)
            n2 = n2 + jnp.sum(c * c, axis=-1)
        return tabs["q2"][:, None] - 2.0 * s * dot + s * s * n2

    def score_dotn2(cur, tabs):
        w = tabs["w"][cur].astype(jnp.int32)
        s = tabs["sc"][cur]
        dot = jnp.zeros((B, R), jnp.float32)
        for sl in range(8):
            c = sign4((w >> (4 * sl)) & 0xF).astype(jnp.float32)
            dot = dot + jnp.einsum("bw,brw->br", tabs["qc"][:, sl], c)
        return tabs["q2"][:, None] - 2.0 * s * dot + tabs["n2"][cur]

    tabs = {
        "u8": t_u8, "w": t_w, "sc": t_sc, "n2": t_n2,
        "q": t_q, "qc": q_chunks, "q2": q2,
    }

    def make_run(score, iters):
        def body(i, carry):
            cur, acc, tb = carry
            d = score(cur, tb)  # [B, R]
            acc = acc + jnp.sum(d)
            # next rows depend on this round's scores (dependent chain)
            cur = (cur + jnp.argmin(d, axis=-1).astype(jnp.int32) + 1) % CAP
            return cur, acc, tb

        @jax.jit
        def run_impl(cur0, tb):
            cur, acc, _ = jax.lax.fori_loop(
                0, iters, body, (cur0, jnp.float32(0), tb)
            )
            return acc + jnp.sum(cur)

        # tables enter as a jit argument, not a 9 GB captured constant
        return lambda cur0: run_impl(cur0, tabs)

    # numeric agreement check (same codes -> same distances). Tables are
    # passed as jit ARGUMENTS (closure capture would bake 9 GB constants).
    cur0 = put(rng.integers(0, CAP, B).astype(np.int32))
    ref = np.asarray(jax.jit(score_cur)(cur0, tabs))
    for name, fn in [("planar", score_planar), ("dot", score_dot),
                     ("dotn2", score_dotn2)]:
        got = np.asarray(jax.jit(fn)(cur0, tabs))
        err = np.max(np.abs(got - ref) / np.maximum(np.abs(ref), 1.0))
        print(f"agree {name:7s}: max rel err {err:.2e}", flush=True)

    curs = [put(rng.integers(0, CAP, B).astype(np.int32)) for _ in range(6)]
    for name, score in [
        ("cur", score_cur), ("planar", score_planar),
        ("dot", score_dot), ("dotn2", score_dotn2),
    ]:
        ms, lo, hi = slope_time(lambda it, s=score: make_run(s, it), curs)
        print(
            f"{name:7s}: {ms*1e3:8.1f} us/iter  "
            f"(t@{ITERS_LO}={lo:7.1f} ms, t@{ITERS_HI}={hi:7.1f} ms)",
            flush=True,
        )


if __name__ == "__main__":
    main()
