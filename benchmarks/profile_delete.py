"""Phase-level timing of Coordinator.delete (bench delete_ms_per_row).

Round-4 steady delete at 1M is 6.68 ms/row (paper CPU: ~45). This breaks
one 1000-row delete batch into its phases to see where the budget goes:
host planning (numpy), repair-round dispatches, orphan rescue + edge-code
refresh, and host bookkeeping.

Usage: python benchmarks/profile_delete.py [N] [DEL]
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    nd = int(sys.argv[2]) if len(sys.argv) > 2 else 1000
    dims = 128
    import jax
    import jax.numpy as jnp

    from duckdb_lm_diskann_tpu.common.types import (
        EdgeType, MetricType, VectorType,
    )
    from duckdb_lm_diskann_tpu.core.config import LmDiskannConfig
    from duckdb_lm_diskann_tpu.core.coordinator import Coordinator
    from duckdb_lm_diskann_tpu.core import builder as B

    rng = np.random.default_rng(0xDE1)
    data = rng.standard_normal((n, dims)).astype(np.float32)
    cfg = LmDiskannConfig(
        metric_type=MetricType.L2, r=64, l_insert=128, alpha=1.2,
        l_search=100, dimensions=dims,
        node_vector_type=VectorType.FLOAT32, edge_type=EdgeType.INT4,
    )
    cfg.validate()
    t0 = time.perf_counter()
    coord = Coordinator(cfg, initial_capacity=n)
    coord.bulk_build(list(range(n)), data, max_batch=2048)
    jax.block_until_ready(coord.arrays.vectors)
    print(f"# built n={n} in {time.perf_counter() - t0:.1f}s", flush=True)

    def timed_delete(picks, tag):
        marks = [("start", time.perf_counter())]

        # --- replicate Coordinator.delete with phase fences ---
        rowids = [int(r) for r in picks]
        present = [r for r in rowids if r in coord.allocator.rowid_to_slot]
        del_slots = np.asarray(
            [coord.allocator.rowid_to_slot[r] for r in present], np.int32
        )
        nbr_rows = np.asarray(
            coord.arrays.neighbors[jnp.asarray(del_slots)]
        )
        marks.append(("gather_nbrs", time.perf_counter()))
        R = coord.params.r
        dpad = B._pow2_at_least(len(del_slots), 256)
        del_pad = np.full(dpad, -1, np.int32)
        del_pad[: len(del_slots)] = del_slots
        del_dev = jnp.asarray(del_pad)
        rounds, rescue_plan = B.plan_delete_repair(nbr_rows, del_slots, R)
        groups = B.group_repair_rounds(rounds)
        marks.append(("plan", time.perf_counter()))
        print(
            f"#   {tag}: rounds={len(rounds)} dispatches={len(groups)} "
            f"groups={[(k, t.shape) for k, t, _ in groups]}",
            flush=True,
        )
        for kind, t_pad, extra in groups:
            step = (
                B.delete_repair_round if kind == "one"
                else B.delete_repair_scan
            )
            coord.arrays = step(
                coord.arrays, jnp.asarray(t_pad), jnp.asarray(extra),
                del_dev, params=coord.params,
            )
        jax.block_until_ready(coord.arrays.vectors)
        marks.append(("repair_rounds", time.perf_counter()))
        del_idx = jnp.asarray(del_slots)
        coord._ever_tombstoned = True
        coord.arrays = coord.arrays._replace(
            valid=coord.arrays.valid.at[del_idx].set(False),
            dirty_rows=coord.arrays.dirty_rows.at[del_idx].set(True),
        )
        jax.block_until_ready(coord.arrays.valid)
        marks.append(("tombstone", time.perf_counter()))
        if rescue_plan is not None:
            t_pad, sibs = rescue_plan
            coord.arrays, adopters = B.rescue_orphans_round(
                coord.arrays, jnp.asarray(t_pad), jnp.asarray(sibs),
                del_dev, params=coord.params,
            )
            jax.block_until_ready(coord.arrays.vectors)
            marks.append(("rescue", time.perf_counter()))
            coord.arrays = B.refresh_edge_codes(
                coord.arrays, adopters, params=coord.params
            )
            jax.block_until_ready(coord.arrays.vectors)
            marks.append(("refresh", time.perf_counter()))
        for r in present:
            coord.allocator.free(r)
        sr = coord._slot_rowids.copy()
        sr[del_slots] = -1
        coord._slot_rowids = sr
        coord.dirty = True
        coord._needs_reachability_repair = True
        marks.append(("bookkeep", time.perf_counter()))

        total = marks[-1][1] - marks[0][1]
        parts = ", ".join(
            f"{name}={1e3 * (t - marks[i][1]):.0f}ms"
            for i, (name, t) in enumerate(marks[1:])
        )
        print(
            f"# {tag}: total={1e3 * total:.0f}ms"
            f" ({1e3 * total / len(present):.2f} ms/row) | {parts}",
            flush=True,
        )

    picks = rng.choice(n, 5 * nd, replace=False)
    timed_delete(picks[:nd], "cold")
    timed_delete(picks[nd : 2 * nd], "steady1")
    timed_delete(picks[2 * nd : 3 * nd], "steady2")
    # End-to-end Coordinator.delete (what bench.py times), warm.
    for i, tag in ((3, "coord_cold"), (4, "coord_steady")):
        half = picks[i * nd : (i + 1) * nd]
        t0 = time.perf_counter()
        coord.delete(half.tolist())
        jax.block_until_ready(coord.arrays.vectors)
        dt = time.perf_counter() - t0
        print(
            f"# {tag}: {1e3 * dt:.0f}ms ({1e3 * dt / nd:.2f} ms/row)",
            flush=True,
        )


if __name__ == "__main__":
    main()
