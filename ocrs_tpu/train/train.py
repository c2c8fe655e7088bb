"""Sharded training steps for the OCR models.

SPMD via ``jax.sharding``: pick a 2-D ``("data", "model")`` mesh, annotate
the batch with data-parallel sharding and the widest weight matrices with
model-parallel sharding, and let XLA insert the collectives (psum for the
gradient all-reduce over "data", all-gathers/reduce-scatters around the
"model"-sharded matmuls). There is no hand-written communication — this is
the TPU-native equivalent of the "distributed backend" row in SURVEY.md §2.5.

The models are small, so data parallelism carries the scaling; the tensor
sharding of the recognition head/projection demonstrates (and tests, via
``__graft_entry__.dryrun_multichip``) that the parameter pytrees and train
steps are laid out for multi-chip execution. Pipeline/sequence/expert
parallelism do not apply at this model scale (SURVEY.md §2.5) and are
deliberately out of scope.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models import detection_net, recognition_net
from .losses import ctc_loss, detection_loss


def make_mesh(n_devices: Optional[int] = None, model_parallel: int = 1) -> Mesh:
    """A ("data", "model") mesh over the first n devices."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    if n % model_parallel != 0:
        raise ValueError(f"{n} devices not divisible by model_parallel={model_parallel}")
    import numpy as np

    arr = np.array(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(arr, ("data", "model"))


@partial(
    jax.tree_util.register_dataclass,
    data_fields=("params", "opt_state", "step"),
    meta_fields=(),
)
@dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: jax.Array


def _shard_leaf_specs_recognition(params: Any) -> Any:
    """PartitionSpecs for the recognition params: shard the wide matmuls'
    output dims over "model" (projection/head/feed-forward for both arches,
    GRU input projections for the crnn); replicate the rest."""

    def spec_for(path: tuple, leaf) -> P:
        names = [getattr(p, "key", getattr(p, "name", str(p))) for p in path]
        joined = "/".join(str(n) for n in names)
        if leaf.ndim == 2:
            if any(tag in joined for tag in ("head", "proj", "wx", "ff1", "ff2")):
                return P(None, "model")
        return P()

    return jax.tree_util.tree_map_with_path(spec_for, params)


def replicated(mesh: Mesh):
    return NamedSharding(mesh, P())


def make_recognition_train_step(
    mesh: Mesh,
    optimizer: optax.GradientTransformation,
    arch: str = "crnn",
) -> Callable[[TrainState, jax.Array, jax.Array, jax.Array], tuple[TrainState, jax.Array]]:
    """Build a jitted recognition train step over `mesh`.

    Batch images are sharded over "data"; wide parameter matrices over
    "model". Call with a TrainState whose arrays carry the matching
    shardings (see :func:`init_recognition_state`).
    """
    apply_fn = recognition_net.ARCHS[arch][1]

    def loss_fn(params, images, labels, label_lengths):
        if images.dtype == jnp.uint8:
            # Raw u8 crops normalize on device (4x less host->device traffic;
            # matters on slow transports, same rationale as the detection step).
            images = images.astype(jnp.float32) / 255.0 - 0.5
        logprobs = apply_fn(params, images)  # [T, N, C]
        return ctc_loss(logprobs, labels, label_lengths)

    @partial(jax.jit, donate_argnums=(0,))
    def step(state: TrainState, images, labels, label_lengths):
        loss, grads = jax.value_and_grad(loss_fn)(
            state.params, images, labels, label_lengths
        )
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), loss

    return step


def init_recognition_state(
    mesh: Mesh,
    optimizer: optax.GradientTransformation,
    n_classes: int = 97,
    hidden: int = recognition_net.DEFAULT_HIDDEN,
    seed: int = 0,
    arch: str = "crnn",
    init_params=None,
) -> TrainState:
    """Initialize recognition params + optimizer state with mesh shardings
    applied (tensor-parallel over "model" for the wide matrices).
    ``init_params``: optional checkpoint pytree for warm-started
    fine-tuning (must match the arch's tree structure)."""
    if arch == "crnn":
        params = recognition_net.init_params(jax.random.key(seed), n_classes, hidden)
    else:
        params = recognition_net.ARCHS[arch][0](jax.random.key(seed), n_classes)
    if init_params is not None:
        # Warm start (fine-tuning): adopt the checkpoint's leaves; the fresh
        # init above fixes the tree structure so a mismatched checkpoint
        # fails loudly here.
        ref = jax.tree.structure(params)
        given = jax.tree.structure(init_params)
        if ref != given:
            raise ValueError(
                f"init_params tree mismatch: expected {ref}, got {given}"
            )
        params = jax.tree.map(lambda _, p: jnp.asarray(p), params, init_params)
    specs = _shard_leaf_specs_recognition(params)
    params = jax.tree.map(
        lambda p, s: jax.device_put(p, NamedSharding(mesh, s)), params, specs
    )
    opt_state = optimizer.init(params)
    # Optimizer moments inherit parameter shardings automatically from init.
    return TrainState(params=params, opt_state=opt_state, step=jnp.zeros((), jnp.int32))


def make_detection_train_step(
    mesh: Mesh,
    optimizer: optax.GradientTransformation,
) -> Callable[[TrainState, jax.Array, jax.Array], tuple[TrainState, jax.Array]]:
    """Data-parallel detection train step (BCE + dice).

    Accepts images as float32 (already normalized) OR uint8 (raw 0..255);
    uint8 batches are normalized on device — 4x less host->device traffic,
    which matters on slow transports (the axon relay moves ~40MB/s, so a
    float32 [16,1,800,608] batch alone costs ~0.75s/step)."""

    def loss_fn(params, images, targets):
        if images.dtype == jnp.uint8:
            images = images.astype(jnp.float32) / 255.0 - 0.5
        if targets.dtype == jnp.uint8:
            targets = targets.astype(jnp.float32)
        probs = detection_net.apply(params, images)
        return detection_loss(probs, targets)

    @partial(jax.jit, donate_argnums=(0,))
    def step(state: TrainState, images, targets):
        loss, grads = jax.value_and_grad(loss_fn)(state.params, images, targets)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), loss

    return step


def init_detection_state(
    mesh: Mesh,
    optimizer: optax.GradientTransformation,
    seed: int = 0,
    init_params=None,
) -> TrainState:
    """``init_params``: optional checkpoint pytree for warm-started
    fine-tuning (tree structure must match the fresh init)."""
    params = detection_net.init_params(jax.random.key(seed))
    if init_params is not None:
        ref = jax.tree.structure(params)
        given = jax.tree.structure(init_params)
        if ref != given:
            raise ValueError(f"init_params tree mismatch: expected {ref}, got {given}")
        params = jax.tree.map(lambda _, p: jnp.asarray(p), params, init_params)
    params = jax.tree.map(lambda p: jax.device_put(p, replicated(mesh)), params)
    opt_state = optimizer.init(params)
    return TrainState(params=params, opt_state=opt_state, step=jnp.zeros((), jnp.int32))


def shard_batch(mesh: Mesh, *arrays: jax.Array):
    """Place arrays with batch-dim sharding over the "data" axis."""
    out = []
    for a in arrays:
        spec = P("data", *([None] * (a.ndim - 1)))
        out.append(jax.device_put(a, NamedSharding(mesh, spec)))
    return tuple(out) if len(out) != 1 else out[0]
