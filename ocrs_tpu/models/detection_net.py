"""Text-detection model: a compact convolutional U-Net.

Functional equivalent of the reference's detection network (a fixed-input
conv/deconv segmentation model over 1-channel input — the op set is
documented at ocrs/src/wasm_api.rs:35-57: Conv, ConvTranspose, MaxPool,
AveragePool, Relu, Sigmoid, Concat, ...). The architecture here is designed
for the TPU rather than copied: NHWC bfloat16 activations feeding the MXU,
stride-2 convs for downsampling, resize+conv for upsampling (avoids
conv-transpose checkerboarding and maps to the same matmul-heavy XLA ops),
skip connections by concatenation, sigmoid head in float32.

Input: NCHW ``[N, 1, H, W]`` float32 in [-0.5, 0.5] (protocol parity with
ocrs/src/model.rs:6-17). Output: ``[N, 1, H, W]`` float32 text probability.
"""

from __future__ import annotations

from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp

from ..ops.resize import resize_bilinear
from . import nn

#: Default fixed input size (H, W). The reference model uses ~800x600
#: (ocrs/src/lib.rs:348); we use a /16-divisible, lane-friendlier shape.
DEFAULT_INPUT_HW: tuple[int, int] = (800, 608)

#: Encoder channel plan; decoder mirrors it.
DEFAULT_CHANNELS: tuple[int, ...] = (16, 32, 64, 96, 128)


def init_params(key: jax.Array, channels: Sequence[int] = DEFAULT_CHANNELS) -> dict:
    keys = jax.random.split(key, 2 * len(channels) + len(channels) - 1 + 2)
    ki = iter(keys)
    params: dict = {"stem": nn.conv_init(next(ki), 3, 3, 1, channels[0])}
    # Encoder: stride-2 conv + refine conv per level.
    enc = []
    for cin, cout in zip(channels[:-1], channels[1:]):
        enc.append(
            {
                "down": nn.conv_init(next(ki), 3, 3, cin, cout),
                "conv": nn.conv_init(next(ki), 3, 3, cout, cout),
            }
        )
    params["encoder"] = enc
    # Decoder: upsample + concat skip + conv per level.
    dec = []
    for cin, skip, cout in zip(
        channels[:0:-1], channels[-2::-1], channels[-2::-1]
    ):
        dec.append({"conv": nn.conv_init(next(ki), 3, 3, cin + skip, cout)})
    params["decoder"] = dec
    params["head"] = nn.conv_init(next(ki), 1, 1, channels[0], 1)
    return params


@jax.jit
def apply(params: dict, x: jax.Array) -> jax.Array:
    """[N, 1, H, W] float32 -> [N, 1, H, W] float32 probabilities."""
    h = jnp.transpose(x, (0, 2, 3, 1)).astype(jnp.bfloat16)  # NHWC
    h = jax.nn.relu(nn.conv_apply(params["stem"], h))
    skips = [h]
    for level in params["encoder"]:
        h = jax.nn.relu(nn.conv_apply(level["down"], h, stride=(2, 2)))
        h = jax.nn.relu(nn.conv_apply(level["conv"], h))
        skips.append(h)
    skips.pop()  # deepest level is `h` itself
    for level in params["decoder"]:
        skip = skips.pop()
        h = resize_bilinear(
            jnp.transpose(h, (0, 3, 1, 2)), skip.shape[1:3], precision="default"
        )  # NCHW resize on trailing dims; approximation-tolerant upsample
        h = jnp.transpose(h, (0, 2, 3, 1)).astype(jnp.bfloat16)
        h = jnp.concatenate([h, skip], axis=-1)
        h = jax.nn.relu(nn.conv_apply(level["conv"], h))
    logits = nn.conv_apply(params["head"], h).astype(jnp.float32)
    probs = jax.nn.sigmoid(logits)
    return jnp.transpose(probs, (0, 3, 1, 2))  # NCHW


class DetectionModel:
    """Model-protocol wrapper (see ocrs_tpu.models.protocol.Model)."""

    def __init__(self, params: dict, input_hw: tuple[int, int] = DEFAULT_INPUT_HW):
        # Device-resident params: freshly loaded checkpoints are host numpy
        # arrays, and leaving them as such re-uploads every weight on every
        # forward (tens of per-array transfers; ~200ms/call over the relay).
        self.params = jax.tree.map(jnp.asarray, params)
        self._input_hw = tuple(int(v) for v in input_hw)

    @staticmethod
    def create(
        key: jax.Array | int = 0,
        input_hw: tuple[int, int] = DEFAULT_INPUT_HW,
        channels: Sequence[int] = DEFAULT_CHANNELS,
    ) -> "DetectionModel":
        if isinstance(key, int):
            key = jax.random.key(key)
        return DetectionModel(init_params(key, channels), input_hw)

    def input_shape(self):
        h, w = self._input_hw
        return ["batch", 1, h, w]

    def run(self, x: jax.Array) -> jax.Array:
        return apply(self.params, x)
