"""Minimal pure-JAX neural-net layer library (init/apply style).

Used by the real detection and recognition models. Parameters are plain
pytrees (nested dicts of jnp arrays) so they compose directly with
``jax.jit``/``jax.grad``/``optax`` and with ``jax.sharding`` for the
multi-chip paths — no framework state objects.

Compute convention: activations NHWC bfloat16 (MXU-native), parameters
float32, accumulation float32 via ``preferred_element_type``.
"""

from __future__ import annotations

import math
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np


def _he_normal(key, shape, fan_in):
    std = math.sqrt(2.0 / fan_in)
    return jax.random.normal(key, shape, dtype=jnp.float32) * std


# ---------------------------------------------------------------------------
# Conv2D (NHWC x HWIO)
# ---------------------------------------------------------------------------


def conv_init(key, kh: int, kw: int, cin: int, cout: int) -> dict:
    return {
        "w": _he_normal(key, (kh, kw, cin, cout), fan_in=kh * kw * cin),
        "b": jnp.zeros((cout,), jnp.float32),
    }


def conv_apply(params: dict, x: jax.Array, stride=(1, 1), padding="SAME") -> jax.Array:
    w = params["w"].astype(x.dtype)
    # nb. inputs/outputs stay in x.dtype (bf16 on the forward path); the MXU
    # still accumulates bf16 matmuls in fp32 internally. Mixed-dtype
    # primitives would break the VJP (conv requires equal operand dtypes).
    out = jax.lax.conv_general_dilated(
        x,
        w,
        window_strides=tuple(stride),
        padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return out + params["b"].astype(x.dtype)


def conv_transpose_init(key, kh: int, kw: int, cin: int, cout: int) -> dict:
    return {
        "w": _he_normal(key, (kh, kw, cin, cout), fan_in=kh * kw * cin),
        "b": jnp.zeros((cout,), jnp.float32),
    }


def conv_transpose_apply(params: dict, x: jax.Array, stride=(2, 2)) -> jax.Array:
    w = params["w"].astype(x.dtype)
    out = jax.lax.conv_transpose(
        x,
        w,
        strides=tuple(stride),
        padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return out + params["b"].astype(x.dtype)


# ---------------------------------------------------------------------------
# Dense
# ---------------------------------------------------------------------------


def dense_init(key, cin: int, cout: int) -> dict:
    return {
        "w": _he_normal(key, (cin, cout), fan_in=cin),
        "b": jnp.zeros((cout,), jnp.float32),
    }


def dense_apply(params: dict, x: jax.Array) -> jax.Array:
    out = jnp.dot(x, params["w"].astype(x.dtype))
    return out + params["b"].astype(x.dtype)


# ---------------------------------------------------------------------------
# GRU
# ---------------------------------------------------------------------------


def gru_init(key, cin: int, hidden: int) -> dict:
    """Gated recurrent unit. Gate order in the fused matrices: [r, z, n]."""
    k1, k2 = jax.random.split(key)
    return {
        "wx": _he_normal(k1, (cin, 3 * hidden), fan_in=cin),
        "wh": _he_normal(k2, (hidden, 3 * hidden), fan_in=hidden),
        "bx": jnp.zeros((3 * hidden,), jnp.float32),
        "bh": jnp.zeros((3 * hidden,), jnp.float32),
    }


def gru_apply(params: dict, x: jax.Array, reverse: bool = False) -> jax.Array:
    """Run a GRU over [N, T, C] -> [N, T, H].

    TPU-friendly formulation: the input projection for every timestep is one
    large MXU matmul outside the scan; the scan body only carries the
    [N, H] x [H, 3H] recurrent matmul.
    """
    n, t, _ = x.shape
    hidden = params["wh"].shape[0]
    # Recurrence precision: at least fp32 for stability (bf16 inputs upcast);
    # f64 inputs keep f64 so double-precision equivalence checks are exact.
    carry_dtype = jnp.promote_types(jnp.float32, x.dtype)
    xp = (
        jnp.dot(x, params["wx"].astype(x.dtype)).astype(carry_dtype)
        + params["bx"].astype(carry_dtype)
    )  # [N, T, 3H]
    xp = jnp.swapaxes(xp, 0, 1)  # [T, N, 3H]

    wh = params["wh"].astype(carry_dtype)
    bh = params["bh"].astype(carry_dtype)

    def step(h, xt):
        hp = jnp.dot(h, wh) + bh  # [N, 3H] fp32
        xr, xz, xn = jnp.split(xt, 3, axis=-1)
        hr, hz, hn = jnp.split(hp, 3, axis=-1)
        r = jax.nn.sigmoid(xr + hr)
        z = jax.nn.sigmoid(xz + hz)
        nval = jnp.tanh(xn + r * hn)
        h_new = (1.0 - z) * nval + z * h
        return h_new, h_new

    h0 = jnp.zeros((n, hidden), carry_dtype)
    # The backward direction scans the sequence natively in reverse
    # (lax.scan(reverse=True) emits outputs in original time order). This
    # avoids explicit jnp.flip of the [T, N, 3H] tensor, which miscompiles
    # on some TPU backends at large shapes (observed: wrong reverse-GRU
    # output at batch 128 x T 608 on the axon v5e backend).
    _, hs = jax.lax.scan(step, h0, xp, reverse=reverse)
    hs = jnp.swapaxes(hs, 0, 1)  # [N, T, H]
    return hs.astype(x.dtype)


def bigru_init(key, cin: int, hidden: int) -> dict:
    kf, kb = jax.random.split(key)
    return {"fwd": gru_init(kf, cin, hidden), "bwd": gru_init(kb, cin, hidden)}


def bigru_apply(params: dict, x: jax.Array) -> jax.Array:
    """Bidirectional GRU: concatenated forward/backward states [N, T, 2H].

    On TPU backends the fused Pallas sequence kernel replaces the lax.scan
    by default (recurrent weights pinned in VMEM across the whole sequence;
    one fused [H, 3H] MXU op per timestep — 1.5x faster than scan, see
    ocrs_tpu.ops.gru_pallas; OCRS_TPU_NO_PALLAS_GRU=1 opts out). The scan
    path remains the reference/fallback and the training backward path."""
    from ..ops.gru_pallas import gru_apply_pallas, pallas_available

    apply = gru_apply_pallas if pallas_available() else gru_apply
    fwd = apply(params["fwd"], x, reverse=False)
    bwd = apply(params["bwd"], x, reverse=True)
    return jnp.concatenate([fwd, bwd], axis=-1)


# ---------------------------------------------------------------------------
# Param utilities
# ---------------------------------------------------------------------------


def param_count(params) -> int:
    return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
