"""Text-recognition model: CRNN (conv stack + bidirectional GRUs + CTC head).

Functional equivalent of the reference's recognition network (op set
documented at ocrs/src/wasm_api.rs:43-46: Conv, MaxPool, GRU, MatMul,
LogSoftmax, ...): fixed input height, width downsampled 4x so the CTC
sequence length is W/4 (the pipeline infers this factor at decode time,
recognition.rs:254-255), output ``[seq, batch, classes]`` log-probabilities
with class 0 = CTC blank.

TPU design notes: NHWC bfloat16 convs on the MXU; the GRU input projections
for all timesteps are hoisted into one large matmul so the sequential scan
carries only the [N,H]x[H,3H] recurrent matmul (see ocrs_tpu.models.nn).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

from . import nn

#: Fixed input height (the real reference model uses 64; recognition.rs:332-337).
INPUT_HEIGHT = 64
#: Width downsampling factor of the conv stack.
DOWNSAMPLE_W = 4

DEFAULT_HIDDEN = 192


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


@jax.jit
def apply(params: dict, x: jax.Array) -> jax.Array:
    """[N, 1, 64, W] float32 -> [W//4, N, classes] float32 log-probs."""
    h = jnp.transpose(x, (0, 2, 3, 1)).astype(jnp.bfloat16)  # [N, 64, W, 1]
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
    logits = nn.dense_apply(params["head"], h).astype(jnp.float32)  # [N, T, C]
    logprobs = jax.nn.log_softmax(logits, axis=-1)
    return jnp.transpose(logprobs, (1, 0, 2))  # [T, N, C]


class RecognitionModel:
    """Model-protocol wrapper (see ocrs_tpu.models.protocol.Model)."""

    def __init__(self, params: dict):
        self.params = params

    @staticmethod
    def create(
        key: jax.Array | int = 0,
        n_classes: int = 97,  # default alphabet (96) + CTC blank
        hidden: int = DEFAULT_HIDDEN,
    ) -> "RecognitionModel":
        if isinstance(key, int):
            key = jax.random.key(key)
        return RecognitionModel(init_params(key, n_classes, hidden))

    def input_shape(self):
        return ["batch", 1, INPUT_HEIGHT, "seq"]

    def run(self, x: jax.Array) -> jax.Array:
        return apply(self.params, x)
