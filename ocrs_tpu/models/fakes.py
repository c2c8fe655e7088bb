"""Fake models for engine-level tests without trained weights.

Mirrors the reference test strategy (ocrs/src/lib.rs:339-422): the whole
pipeline is testable with tiny deterministic models injected through the
:class:`~ocrs_tpu.models.protocol.Model` seam, so tests run on the CPU JAX
backend with no weights or network.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


class FakeDetectionModel:
    """Identity + 0.5 bias "probability map" (lib.rs:344-362).

    Declares a small fixed input so tests are fast; the pipeline pads/resizes
    to this size exactly as it would for a real model.
    """

    def __init__(self, height: int = 200, width: int = 100):
        self._h = height
        self._w = width

    def input_shape(self):
        return ["batch", 1, self._h, self._w]

    def run(self, x: jax.Array) -> jax.Array:
        return x + 0.5


class FakeRecognitionModel:
    """Interprets image rows as class probabilities (lib.rs:372-422).

    Takes ``[N, 1, 64, W]`` and returns ``[W // 4, N, 64]``: max-pools the
    width by 4 (the real model's downsample factor) and permutes so each
    output step's class vector is the corresponding input column.
    """

    W_SCALE = 4

    def input_shape(self):
        return ["batch", 1, 64, "seq"]

    def run(self, x: jax.Array) -> jax.Array:
        n, c, h, w = x.shape
        assert c == 1 and h == 64
        nhw = x[:, 0]
        w4 = w // self.W_SCALE
        pooled = jnp.max(
            nhw[:, :, : w4 * self.W_SCALE].reshape(n, h, w4, self.W_SCALE), axis=-1
        )
        # [N, H(=classes), W/4] -> [W/4, N, classes]
        return jnp.transpose(pooled, (2, 0, 1))
