"""Text-recognition models: sequence-over-width CTC recognizers.

Two architectures share the input/output contract of the reference's
recognition network (op set documented at ocrs/src/wasm_api.rs:43-46:
Conv, MaxPool, GRU, MatMul, LogSoftmax, ...): fixed input height 64, width
downsampled 4x so the CTC sequence length is W/4 (the pipeline infers this
factor at decode time, recognition.rs:254-255), output
``[seq, batch, classes]`` log-probabilities with class 0 = CTC blank.

  * ``crnn`` — conv stack + bidirectional GRUs, the reference's model
    family; kept for weight-conversion parity (models/convert.py).
  * ``convctc`` — the TPU-native flagship: conv stem + dilated depthwise
    ConvNeXt-style blocks, NO recurrence. Every op is a parallel
    matmul/conv on the MXU, so the 600-step sequential scan that dominates
    CRNN latency disappears; and because the network is strictly local
    (finite receptive field, no scan state), its output at content frames
    is invariant to right-padding length by construction — bucket choice
    (recognition.py width ladders) cannot change decoded text.

TPU design notes: NHWC bfloat16 convs on the MXU; CRNN GRU input
projections for all timesteps hoisted into one large matmul so the scan
carries only the [N,H]x[H,3H] recurrent matmul (see ocrs_tpu.models.nn).
"""

from __future__ import annotations

from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp

from . import nn

#: Fixed input height (the real reference model uses 64; recognition.rs:332-337).
INPUT_HEIGHT = 64
#: Width downsampling factor of the conv stacks.
DOWNSAMPLE_W = 4

DEFAULT_HIDDEN = 192

# ---------------------------------------------------------------------------
# CRNN (conv + BiGRU) — reference-parity architecture
# ---------------------------------------------------------------------------


def init_params(
    key: jax.Array,
    n_classes: int,
    hidden: int = DEFAULT_HIDDEN,
) -> dict:
    k = jax.random.split(key, 8)
    return {
        # conv stack: H 64 -> 32 -> 16 -> 8 -> 4; W -> W/2 -> W/4
        "conv1": nn.conv_init(k[0], 3, 3, 1, 32),  # s(2,2): 32 x W/2
        "conv2": nn.conv_init(k[1], 3, 3, 32, 64),  # s(2,1): 16 x W/2
        "conv3": nn.conv_init(k[2], 3, 3, 64, 96),  # s(2,2): 8 x W/4
        "conv4": nn.conv_init(k[3], 3, 3, 96, 128),  # s(2,1): 4 x W/4
        "proj": nn.dense_init(k[4], 4 * 128, hidden),
        "gru1": nn.bigru_init(k[5], hidden, hidden),
        "gru2": nn.bigru_init(k[6], 2 * hidden, hidden),
        "head": nn.dense_init(k[7], 2 * hidden, n_classes),
    }


@partial(jax.jit, static_argnames=("dtype",))
def apply(params: dict, x: jax.Array, dtype=jnp.bfloat16) -> jax.Array:
    """CRNN: [N, 1, 64, W] float32 -> [W//4, N, classes] float32 log-probs.

    ``dtype`` is the activation compute dtype: bfloat16 for MXU inference
    (default); float32 for numeric-equivalence checks against converted
    source checkpoints (tests/test_convert.py)."""
    h = jnp.transpose(x, (0, 2, 3, 1)).astype(dtype)  # [N, 64, W, 1]
    h = jax.nn.relu(nn.conv_apply(params["conv1"], h, stride=(2, 2)))
    h = jax.nn.relu(nn.conv_apply(params["conv2"], h, stride=(2, 1)))
    h = jax.nn.relu(nn.conv_apply(params["conv3"], h, stride=(2, 2)))
    h = jax.nn.relu(nn.conv_apply(params["conv4"], h, stride=(2, 1)))
    # [N, 4, W/4, 128] -> [N, W/4, 512]
    n, hh, t, c = h.shape
    h = jnp.transpose(h, (0, 2, 1, 3)).reshape(n, t, hh * c)
    h = jax.nn.relu(nn.dense_apply(params["proj"], h))
    h = nn.bigru_apply(params["gru1"], h)
    h = nn.bigru_apply(params["gru2"], h)
    # Log-probs in at least fp32 (f64 under double-precision equivalence runs).
    out_dtype = jnp.promote_types(jnp.float32, dtype)
    logits = nn.dense_apply(params["head"], h).astype(out_dtype)  # [N, T, C]
    logprobs = jax.nn.log_softmax(logits, axis=-1)
    return jnp.transpose(logprobs, (1, 0, 2))  # [T, N, C]


# ---------------------------------------------------------------------------
# ConvCTC — TPU-native flagship (no recurrence)
# ---------------------------------------------------------------------------

CONV_DIM = 384
#: Per-block depthwise kernel width / dilation along the sequence axis. The
#: W-axis receptive field at full input resolution is ~19px from the stem
#: plus 32 * sum(dilations) px from the blocks (~340px total, ~10 characters
#: of context at the 64px line height).
CONV_BLOCKS: tuple[int, ...] = (1, 1, 2, 2, 4)
CONV_KERNEL = 9


def _ln_init(dim: int) -> dict:
    return {"g": jnp.ones((dim,), jnp.float32), "b": jnp.zeros((dim,), jnp.float32)}


def _ln_apply(p: dict, x: jax.Array, eps: float = 1e-5) -> jax.Array:
    xf = x.astype(jnp.float32)
    mu = xf.mean(axis=-1, keepdims=True)
    var = xf.var(axis=-1, keepdims=True)
    out = (xf - mu) * jax.lax.rsqrt(var + eps) * p["g"] + p["b"]
    return out.astype(x.dtype)


def _dwconv_init(key, k: int, dim: int) -> dict:
    # He-style init over the k taps of each channel's filter.
    w = jax.random.normal(key, (k, 1, dim), jnp.float32) * (2.0 / k) ** 0.5
    return {"w": w, "b": jnp.zeros((dim,), jnp.float32)}


def _dwconv_apply(p: dict, x: jax.Array, dilation: int) -> jax.Array:
    """Depthwise 1-D conv along the middle (sequence) axis of [N, T, C]."""
    out = jax.lax.conv_general_dilated(
        x,
        p["w"].astype(x.dtype),
        window_strides=(1,),
        padding="SAME",
        rhs_dilation=(dilation,),
        dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=x.shape[-1],
    )
    return out + p["b"].astype(x.dtype)


def conv_init_params(
    key: jax.Array,
    n_classes: int,
    dim: int = CONV_DIM,
    blocks: Sequence[int] = CONV_BLOCKS,
) -> dict:
    k = jax.random.split(key, 6 + 3 * len(blocks))
    ki = iter(k)
    params: dict = {
        "conv1": nn.conv_init(next(ki), 3, 3, 1, 48),  # s(2,2): 32 x W/2
        "conv2": nn.conv_init(next(ki), 3, 3, 48, 96),  # s(2,1): 16 x W/2
        "conv3": nn.conv_init(next(ki), 3, 3, 96, 128),  # s(2,2): 8 x W/4
        "conv4": nn.conv_init(next(ki), 3, 3, 128, 192),  # s(2,1): 4 x W/4
        "proj": nn.dense_init(next(ki), 4 * 192, dim),
    }
    blk = []
    for _ in blocks:
        blk.append(
            {
                "dw": _dwconv_init(next(ki), CONV_KERNEL, dim),
                "ln": _ln_init(dim),
                "ff1": nn.dense_init(next(ki), dim, 2 * dim),
                "ff2": nn.dense_init(next(ki), 2 * dim, dim),
            }
        )
    params["blocks"] = blk
    params["ln_out"] = _ln_init(dim)
    params["head"] = nn.dense_init(next(ki), dim, n_classes)
    return params


@jax.jit
def conv_apply(params: dict, x: jax.Array) -> jax.Array:
    """ConvCTC: [N, 1, 64, W] float32 -> [W//4, N, classes] float32 log-probs."""
    h = jnp.transpose(x, (0, 2, 3, 1)).astype(jnp.bfloat16)  # [N, 64, W, 1]
    h = jax.nn.relu(nn.conv_apply(params["conv1"], h, stride=(2, 2)))
    h = jax.nn.relu(nn.conv_apply(params["conv2"], h, stride=(2, 1)))
    h = jax.nn.relu(nn.conv_apply(params["conv3"], h, stride=(2, 2)))
    h = jax.nn.relu(nn.conv_apply(params["conv4"], h, stride=(2, 1)))
    n, hh, t, c = h.shape  # [N, 4, W/4, 192]
    h = jnp.transpose(h, (0, 2, 1, 3)).reshape(n, t, hh * c)
    h = nn.dense_apply(params["proj"], h)  # [N, T, dim]
    for block, dilation in zip(params["blocks"], CONV_BLOCKS):
        y = _dwconv_apply(block["dw"], h, dilation)
        y = _ln_apply(block["ln"], y)
        y = jax.nn.gelu(nn.dense_apply(block["ff1"], y))
        y = nn.dense_apply(block["ff2"], y)
        h = h + y
    h = _ln_apply(params["ln_out"], h)
    logits = nn.dense_apply(params["head"], h).astype(jnp.float32)  # [N, T, C]
    logprobs = jax.nn.log_softmax(logits, axis=-1)
    return jnp.transpose(logprobs, (1, 0, 2))  # [T, N, C]


# ---------------------------------------------------------------------------
# Architecture registry + Model-protocol wrapper
# ---------------------------------------------------------------------------

ARCHS = {
    "crnn": (init_params, apply),
    "convctc": (conv_init_params, conv_apply),
}

DEFAULT_ARCH = "convctc"


class RecognitionModel:
    """Model-protocol wrapper (see ocrs_tpu.models.protocol.Model).

    ``arch`` selects the parameter family; weight files record it in their
    meta dict ("arch") so the CLI/engine reconstruct the right apply fn."""

    def __init__(self, params: dict, arch: str = "crnn"):
        if arch not in ARCHS:
            raise ValueError(f"unknown recognition arch {arch!r}")
        # Device-resident params (see DetectionModel.__init__: numpy params
        # would re-upload every weight on every forward).
        self.params = jax.tree.map(jnp.asarray, params)
        self.arch = arch

    @staticmethod
    def create(
        key: jax.Array | int = 0,
        n_classes: int = 97,  # default alphabet (96) + CTC blank
        hidden: int = DEFAULT_HIDDEN,
        arch: str = "crnn",
    ) -> "RecognitionModel":
        if isinstance(key, int):
            key = jax.random.key(key)
        if arch == "crnn":
            return RecognitionModel(init_params(key, n_classes, hidden), arch)
        init_fn, _ = ARCHS[arch]
        return RecognitionModel(init_fn(key, n_classes), arch)

    def input_shape(self):
        return ["batch", 1, INPUT_HEIGHT, "seq"]

    def run(self, x: jax.Array) -> jax.Array:
        return ARCHS[self.arch][1](self.params, x)
