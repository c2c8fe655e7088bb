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

Gate layout note: the three gates are passed as separate [T, N, H] arrays so
every in-kernel slice is a full aligned block (a fused [N, 3H] layout would
slice the lane dimension at H=192, off the 128-lane grid).

Falls back transparently to the scan implementation off-TPU; correctness is
tested in interpreter mode against the scan path.
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _gru_seq_kernel(xr_ref, xz_ref, xn_ref, whr_ref, whz_ref, whn_ref, bh_ref, out_ref, h_ref):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        h_ref[:] = jnp.zeros_like(h_ref)

    h = h_ref[:]
    # Recurrent projections for the three gates ([N, H] x [H, H] each).
    hr = jnp.dot(h, whr_ref[:], preferred_element_type=jnp.float32)
    hz = jnp.dot(h, whz_ref[:], preferred_element_type=jnp.float32)
    hn = jnp.dot(h, whn_ref[:], preferred_element_type=jnp.float32)
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
    whr, whz, whn = jnp.split(wh, 3, axis=1)
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
            full((h, h)),
            full((h, h)),
            full((h, h)),
            full((3, h)),
        ],
        out_specs=block(),
        out_shape=jax.ShapeDtypeStruct((t, n, h), jnp.float32),
        scratch_shapes=[pltpu.VMEM((n, h), jnp.float32)],
        interpret=interpret,
    )(xr, xz, xn, whr, whz, whn, bh3)


import functools


@functools.lru_cache(maxsize=1)
def pallas_available() -> bool:
    """Whether to use the Pallas GRU in the model: opt-in via
    OCRS_TPU_PALLAS_GRU=1 on TPU backends where a probe kernel compiles and
    runs. Measured on v5e, XLA's lax.scan is currently slightly faster for
    this recurrence (3.9ms vs 4.5ms per [64, 608, 192] layer-direction — the
    hoisted input projections already remove the big win a fused kernel
    would otherwise capture), so the kernel ships as an opt-in alternative
    and a base for future fusion work rather than the default."""
    if not os.environ.get("OCRS_TPU_PALLAS_GRU"):
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
