"""INT8 edge-cache quantization.

The reference stores int8 node vectors as a placeholder direct cast
(GraphManager.cpp:98-107 — flagged in SURVEY Appendix B as a quirk NOT to
copy) and stubs the compressed edge write path. Here INT8 edge caching is a
real abs-max quantization: per-vector scale = max|v| / 127, symmetric, with
the scale stored next to the codes; it is the default edge cache for L2
indexes where ternary codes are invalid (index_config.cpp:93-99).

The int8 x int8 frontier scoring stays integer on the VPU/MXU and rescales
once at the end.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def encode_int8(vectors: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """vectors [..., D] float -> (codes int8 [..., D], scales f32 [...]).

    code = round(v / scale) with scale = max|v|/127; all-zero vectors get
    scale 0 and zero codes.
    """
    v = vectors.astype(jnp.float32)
    abs_max = jnp.max(jnp.abs(v), axis=-1)
    scale = abs_max / 127.0
    inv = jnp.where(scale > 0.0, 1.0 / jnp.where(scale > 0.0, scale, 1.0), 0.0)
    codes = jnp.clip(jnp.round(v * inv[..., None]), -127, 127).astype(jnp.int8)
    return codes, scale


def decode_int8(codes: jnp.ndarray, scales: jnp.ndarray) -> jnp.ndarray:
    """codes int8 [..., D], scales [...] -> float32 [..., D]."""
    return codes.astype(jnp.float32) * scales[..., None]


def half_dims(d: int) -> int:
    """Packed byte count of an INT4 code vector: two 4-bit codes per byte."""
    return (d + 1) // 2


def encode_int4(vectors: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """vectors [..., D] float -> (packed u8 [..., ceil(D/2)], scales [...]).

    code = round(v / scale) clipped to [-7, 7] with scale = max|v|/7; packed
    little-nibble-first (dim 2i in the low nibble, 2i+1 in the high nibble;
    odd D pads a zero dim). 4 bits/dim with magnitudes — between the
    reference's 2-bit ternary planes and INT8."""
    v = vectors.astype(jnp.float32)
    D = v.shape[-1]
    if D % 2:
        v = jnp.concatenate(
            [v, jnp.zeros(v.shape[:-1] + (1,), jnp.float32)], axis=-1
        )
    abs_max = jnp.max(jnp.abs(v), axis=-1)
    scale = abs_max / 7.0
    inv = jnp.where(scale > 0.0, 1.0 / jnp.where(scale > 0.0, scale, 1.0), 0.0)
    q = jnp.clip(jnp.round(v * inv[..., None]), -7, 7).astype(jnp.int32)
    u = (q & 0xF).astype(jnp.uint32)  # two's-complement nibble
    lo = u[..., 0::2]
    hi = u[..., 1::2]
    return (lo | (hi << 4)).astype(jnp.uint8), scale


def unpack_int4(packed: jnp.ndarray, d: int) -> jnp.ndarray:
    """packed u8 [..., ceil(D/2)] -> signed f32 codes [..., D] (unscaled)."""
    u = packed.astype(jnp.int32)
    lo = u & 0xF
    hi = (u >> 4) & 0xF
    # sign-extend 4-bit two's complement: (x ^ 8) - 8
    lo = (lo ^ 8) - 8
    hi = (hi ^ 8) - 8
    out = jnp.stack([lo, hi], axis=-1).reshape(*packed.shape[:-1], -1)
    return out[..., :d].astype(jnp.float32)


def decode_int4(packed: jnp.ndarray, scales: jnp.ndarray, d: int) -> jnp.ndarray:
    return unpack_int4(packed, d) * scales[..., None]


def encode_int4_np(vectors: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    v = np.asarray(vectors, np.float32)
    if v.shape[-1] % 2:
        v = np.concatenate(
            [v, np.zeros(v.shape[:-1] + (1,), np.float32)], axis=-1
        )
    abs_max = np.max(np.abs(v), axis=-1)
    scale = abs_max / 7.0
    inv = np.where(scale > 0.0, 1.0 / np.where(scale > 0.0, scale, 1.0), 0.0)
    q = np.clip(np.round(v * inv[..., None]), -7, 7).astype(np.int32)
    u = (q & 0xF).astype(np.uint32)
    packed = (u[..., 0::2] | (u[..., 1::2] << 4)).astype(np.uint8)
    return packed, scale.astype(np.float32)


def decode_int4_np(packed: np.ndarray, scales: np.ndarray, d: int) -> np.ndarray:
    u = np.asarray(packed).astype(np.int32)
    lo = ((u & 0xF) ^ 8) - 8
    hi = (((u >> 4) & 0xF) ^ 8) - 8
    out = np.stack([lo, hi], axis=-1).reshape(*packed.shape[:-1], -1)
    return out[..., :d].astype(np.float32) * np.asarray(scales)[..., None]


def encode_int8_np(vectors: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    v = np.asarray(vectors, dtype=np.float32)
    abs_max = np.max(np.abs(v), axis=-1)
    scale = abs_max / 127.0
    inv = np.where(scale > 0.0, 1.0 / np.where(scale > 0.0, scale, 1.0), 0.0)
    codes = np.clip(np.round(v * inv[..., None]), -127, 127).astype(np.int8)
    return codes, scale.astype(np.float32)


def decode_int8_np(codes: np.ndarray, scales: np.ndarray) -> np.ndarray:
    return codes.astype(np.float32) * scales[..., None]
