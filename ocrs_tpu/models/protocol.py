"""Engine-agnostic model abstraction.

The reference defines a tiny ``Model`` trait (ocrs/src/model.rs:6-17) so the
pipeline can run against the real inference engine or against fakes in tests.
We keep the same seam: a :class:`Model` is anything with an ``input_shape``
(NCHW, mixing fixed ints and symbolic dim names) and a ``run`` method mapping
a device array to a device array. Real models are jitted pure-JAX apply
functions closed over a pytree of parameters; fakes are small jnp functions.
"""

from __future__ import annotations

from typing import Protocol, Sequence, Union, runtime_checkable

import jax

#: A dimension in a model input spec: a fixed size or a symbolic name
#: (mirrors rten ``Dimension::Fixed`` / ``Dimension::Symbolic``,
#: ocrs/src/model.rs:20-31).
Dim = Union[int, str]


@runtime_checkable
class Model(Protocol):
    """Protocol for detection/recognition models (ocrs/src/model.rs:6-17)."""

    def input_shape(self) -> Sequence[Dim]:
        """Declared NCHW input shape; symbolic dims are strings."""
        ...

    def run(self, x: jax.Array) -> jax.Array:
        """Run the model on a float32/bfloat16 input batch.

        For detection models: ``[N, 1, H, W] -> [N, 1, H, W]`` probability map.
        For recognition models: ``[N, 1, H, W] -> [seq, N, classes]``
        log-probabilities (the reference model's native output layout,
        ocrs/src/recognition.rs:357-358).
        """
        ...


def fixed_hw(shape: Sequence[Dim]) -> tuple[int, int]:
    """Extract fixed (H, W) from an NCHW input spec, raising if symbolic
    (detection requires fixed spatial dims, detection.rs:145-148)."""
    if len(shape) != 4:
        raise ValueError(f"expected NCHW input spec, got {shape!r}")
    h, w = shape[2], shape[3]
    if not isinstance(h, int) or not isinstance(w, int):
        raise ValueError(f"model input spec has symbolic spatial dims: {shape!r}")
    return h, w


def fixed_height_or(shape: Sequence[Dim], default: int = 50) -> int:
    """Recognition input height: fixed dim 2, or `default` when symbolic
    (recognition.rs:332-337)."""
    h = shape[2] if len(shape) == 4 else None
    return h if isinstance(h, int) else default
