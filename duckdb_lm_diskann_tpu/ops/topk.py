"""Deterministic top-k selection and sorted-beam merge primitives.

The reference maintains its beam as a distance-sorted candidate array with
insertion at the first index whose distance exceeds the new candidate's
(libsql/vectordiskann.c:1077-1148) and its top-k as a second sorted buffer
(:1091-1110). On TPU both become whole-array sorts with a pinned
deterministic tie-break — sort by (distance, id) — which is the pinned
traversal spec that replaces heap pop order (SURVEY §7.3).

All sorts are ``jax.lax.sort`` with num_keys=2: lexicographic ascending on
(distance, id), so equal distances always resolve to the smaller id, on every
backend, every shard count, every batch size.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Python float, not a device array: modules must be import-safe so
# jax.distributed.initialize() can run before any backend init
# (parallel/multihost.py entry path).
INF = float("inf")


def sort_by_distance_id(
    dist: jnp.ndarray, ids: jnp.ndarray, *extras: jnp.ndarray
) -> tuple[jnp.ndarray, ...]:
    """Sort along the last axis by (dist, id) ascending; extras are permuted
    along for the ride. Invalid entries should carry dist=+inf."""
    return jax.lax.sort((dist, ids) + tuple(extras), dimension=-1, num_keys=2)


def topk_by_distance(
    dist: jnp.ndarray, ids: jnp.ndarray, k: int
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Deterministic k smallest (dist, id) pairs along the last axis."""
    sorted_dist, sorted_ids = sort_by_distance_id(dist, ids)
    return sorted_dist[..., :k], sorted_ids[..., :k]


def mask_invalid(
    dist: jnp.ndarray, ids: jnp.ndarray, valid: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Push invalid entries to (+inf, -1) so sorts move them to the tail."""
    return (
        jnp.where(valid, dist, INF),
        jnp.where(valid, ids, jnp.int32(-1)),
    )


def dedup_sorted_ids(
    dist: jnp.ndarray, ids: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """After a (dist, id) sort, mask duplicate ids (keep first occurrence).

    Safety net mirroring the reference's duplicate guards: RobustPrune dedups
    candidates by row id after sorting (GraphManager.cpp:302-305) and the
    search context refuses duplicate candidates (vectordiskann.c:1066-1074).
    A duplicated id always carries an identical cached-code distance, so
    duplicates land adjacent after the lexicographic sort.
    """
    prev_ids = jnp.concatenate(
        [jnp.full_like(ids[..., :1], -2), ids[..., :-1]], axis=-1
    )
    dup = (ids == prev_ids) & (ids >= 0)
    return mask_invalid(dist, ids, ~dup)


def merge_beams(
    dist_a: jnp.ndarray,
    ids_a: jnp.ndarray,
    dist_b: jnp.ndarray,
    ids_b: jnp.ndarray,
    size: int,
    *,
    extras_a: tuple[jnp.ndarray, ...] = (),
    extras_b: tuple[jnp.ndarray, ...] = (),
    dedup: bool = False,
) -> tuple[jnp.ndarray, ...]:
    """Merge two (dist, id, extras...) candidate sets, keep the best ``size``.

    The TPU form of diskAnnSearchCtxInsertCandidate's insert-and-evict-worst
    (vectordiskann.c:1136-1148) applied to a whole batch of new candidates at
    once: concat -> lexicographic sort -> truncate. Callers must pre-mask
    entries they don't want considered (dist=+inf).

    ``dedup``: mask duplicate ids before truncation, keeping each id's
    best (distance, then original-order) copy. The dedup pass sorts by
    (id, distance) so ALL copies of an id are adjacent — including copies
    with differing distances, which exist when a stale cached edge code
    points at a recycled slot — then re-sorts by (distance, id). Two sorts
    total; callers with E>1 frontier expansion use this instead of an
    O((E*R)^2) pairwise duplicate mask.
    """
    dist = jnp.concatenate([dist_a, dist_b], axis=-1)
    ids = jnp.concatenate([ids_a, ids_b], axis=-1)
    extras = tuple(
        jnp.concatenate([ea, eb], axis=-1)
        for ea, eb in zip(extras_a, extras_b, strict=True)
    )
    if dedup:
        by_id = jax.lax.sort((ids, dist) + extras, dimension=-1, num_keys=2)
        ids_s, dist_s = by_id[0], by_id[1]
        prev = jnp.concatenate(
            [jnp.full_like(ids_s[..., :1], -2), ids_s[..., :-1]], axis=-1
        )
        dup = (ids_s == prev) & (ids_s >= 0)
        dist_s = jnp.where(dup, INF, dist_s)
        ids_s = jnp.where(dup, jnp.int32(-1), ids_s)
        out = sort_by_distance_id(dist_s, ids_s, *by_id[2:])
    else:
        out = sort_by_distance_id(dist, ids, *extras)
    return tuple(o[..., :size] for o in out)
