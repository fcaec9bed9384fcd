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


def encode_int8_np(vectors: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    v = np.asarray(vectors, dtype=np.float32)
    abs_max = np.max(np.abs(v), axis=-1)
    scale = abs_max / 127.0
    inv = np.where(scale > 0.0, 1.0 / np.where(scale > 0.0, scale, 1.0), 0.0)
    codes = np.clip(np.round(v * inv[..., None]), -127, 127).astype(np.int8)
    return codes, scale.astype(np.float32)


def decode_int8_np(codes: np.ndarray, scales: np.ndarray) -> np.ndarray:
    return codes.astype(np.float32) * scales[..., None]
