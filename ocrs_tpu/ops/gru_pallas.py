"""Fused GRU sequence kernel (Pallas/TPU).

The recognition model's BiGRU is the dominant sequential cost: XLA's
``lax.scan`` reloads state and pays per-step scheduling for every one of up
to 608 timesteps. This kernel runs the whole sequence as ONE Pallas program:

  * the recurrent weights live in VMEM for the entire sequence;
  * the per-step input projections (precomputed with one large MXU matmul
    outside the kernel, see ocrs_tpu.models.nn.gru_apply) stream in through
    the grid pipeline, one timestep block per grid step;
  * the hidden state persists in a VMEM scratch buffer across grid steps
    (TPU grids execute sequentially on a core, which is exactly what a
    recurrence wants).

Gate layout note: the recurrent projection is ONE [N, H] x [H, 3H] MXU
matmul per step; the three gates are sliced from its [N, 3H] value result
(value slices at H=192 relayout fine — measured FASTER than three aligned
[H, H] dots, whose per-op overhead dominates at these sizes). The input
projections stay as separate [T, N, H] streams so their grid blocks are
aligned.

Measured on v5e (batch 64, T=608, H=192, one layer-direction):
lax.scan 5.4ms / three-dot kernel 6.8ms / this fused kernel **3.6ms** —
so the kernel is the DEFAULT on TPU backends (OCRS_TPU_NO_PALLAS_GRU=1
opts out). Falls back transparently to the scan implementation off-TPU;
correctness is tested in interpreter mode against the scan path, and the
backward pass recomputes through the differentiable scan.
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _gru_seq_kernel(xr_ref, xz_ref, xn_ref, wh_ref, bh_ref, out_ref, h_ref):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        h_ref[:] = jnp.zeros_like(h_ref)

    h = h_ref[:]
    hidden = h.shape[-1]
    # ONE fused recurrent projection for all three gates ([N, H] x [H, 3H]).
    hp = jnp.dot(h, wh_ref[:], preferred_element_type=jnp.float32)
    hr = hp[:, :hidden]
    hz = hp[:, hidden : 2 * hidden]
    hn = hp[:, 2 * hidden :]
    br = bh_ref[0:1, :]
    bz = bh_ref[1:2, :]
    bn = bh_ref[2:3, :]
    r = jax.nn.sigmoid(xr_ref[0] + hr + br)
    z = jax.nn.sigmoid(xz_ref[0] + hz + bz)
    n = jnp.tanh(xn_ref[0] + r * (hn + bn))
    h_new = (1.0 - z) * n + z * h
    h_ref[:] = h_new
    out_ref[0] = h_new


@partial(jax.jit, static_argnames=("interpret", "reverse"))
def gru_sequence(
    xr: jax.Array,  # [T, N, H] input projection, r gate (x @ wx_r + bx_r)
    xz: jax.Array,  # [T, N, H] z gate
    xn: jax.Array,  # [T, N, H] n gate
    wh: jax.Array,  # [H, 3H] fused recurrent weights (gate order r, z, n)
    bh: jax.Array,  # [3H]
    interpret: bool = False,
    reverse: bool = False,
) -> jax.Array:
    """Run a full GRU over precomputed input projections -> [T, N, H].

    `reverse` runs the recurrence backwards in time by reversing the grid's
    block index map — no data flips (jnp.flip of large [T, N, H] tensors
    miscompiles on some TPU backends), and outputs land in original order.
    """
    t, n, h = xr.shape
    bh3 = bh.reshape(3, h)

    tmap = (lambda i: (t - 1 - i, 0, 0)) if reverse else (lambda i: (i, 0, 0))
    block = lambda: pl.BlockSpec((1, n, h), tmap, memory_space=pltpu.VMEM)
    full = lambda shape: pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM)

    return pl.pallas_call(
        _gru_seq_kernel,
        grid=(t,),
        in_specs=[
            block(),
            block(),
            block(),
            full((h, 3 * h)),
            full((3, h)),
        ],
        out_specs=block(),
        out_shape=jax.ShapeDtypeStruct((t, n, h), jnp.float32),
        scratch_shapes=[pltpu.VMEM((n, h), jnp.float32)],
        interpret=interpret,
    )(xr, xz, xn, wh, bh3)


import functools


@functools.lru_cache(maxsize=1)
def pallas_available() -> bool:
    """Whether to use the Pallas GRU in the model: DEFAULT on TPU backends
    where the probe kernel compiles and runs (the fused-recurrent-matmul
    kernel measured 3.6ms vs lax.scan's 5.4ms per [64, 608, 192]
    layer-direction on v5e — a 1.5x win from keeping the recurrent weights
    in VMEM and issuing one [H, 3H] MXU op per step instead of scan's
    per-step scheduling). OCRS_TPU_NO_PALLAS_GRU=1 opts out;
    OCRS_TPU_PALLAS_GRU=1 is still accepted from when the kernel was
    opt-in."""
    if os.environ.get("OCRS_TPU_NO_PALLAS_GRU"):
        return False
    try:
        if jax.devices()[0].platform not in ("tpu", "axon"):
            return False
        h = 128
        out = gru_sequence(
            jnp.zeros((2, 8, h)),
            jnp.zeros((2, 8, h)),
            jnp.zeros((2, 8, h)),
            jnp.zeros((h, 3 * h)),
            jnp.zeros((3 * h,)),
        )
        jax.block_until_ready(out)
        return True
    except Exception:  # pragma: no cover - backend dependent
        return False


def _gru_pallas_impl(params: dict, x: jax.Array, reverse: bool, interpret: bool) -> jax.Array:
    xp = (
        jnp.dot(x, params["wx"].astype(x.dtype)).astype(jnp.float32)
        + params["bx"]
    )  # [N, T, 3H]
    xp = jnp.swapaxes(xp, 0, 1)  # [T, N, 3H]
    xr, xz, xn = jnp.split(xp, 3, axis=-1)
    hs = gru_sequence(
        xr, xz, xn, params["wh"].astype(jnp.float32), params["bh"].astype(jnp.float32),
        interpret=interpret,
        reverse=reverse,
    )
    hs = jnp.swapaxes(hs, 0, 1)
    return hs.astype(x.dtype)


@partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _gru_pallas_vjp(params: dict, x: jax.Array, reverse: bool, interpret: bool):
    return _gru_pallas_impl(params, x, reverse, interpret)


def _gru_fwd(params, x, reverse, interpret):
    return _gru_pallas_impl(params, x, reverse, interpret), (params, x)


def _gru_bwd(reverse, interpret, residuals, g):
    # Backward recomputes through the differentiable scan implementation —
    # the Pallas kernel is a forward/inference fast path.
    from ..models.nn import gru_apply

    params, x = residuals
    _, vjp = jax.vjp(lambda p, xx: gru_apply(p, xx, reverse), params, x)
    return vjp(g)


_gru_pallas_vjp.defvjp(_gru_fwd, _gru_bwd)


def gru_apply_pallas(
    params: dict, x: jax.Array, reverse: bool = False, interpret: bool = False
) -> jax.Array:
    """Drop-in equivalent of ocrs_tpu.models.nn.gru_apply using the fused
    sequence kernel. [N, T, C] -> [N, T, H]. Differentiable: the backward
    pass recomputes through the scan implementation."""
    return _gru_pallas_vjp(params, x, reverse, interpret)
