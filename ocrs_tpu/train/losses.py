"""Training losses for the detection and recognition models.

The reference repo is inference-only (its models are trained in the separate
ocrs-models PyTorch project). A complete TPU framework owns its training
path, so we provide the standard losses for both model families:

  * detection: binary cross-entropy + soft Dice over the probability map,
    the usual pairing for text-segmentation training.
  * recognition: CTC loss (via optax) over [T, N, C] log-probabilities with
    label 0 = blank, matching the inference-side decode convention.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax


def detection_loss(probs: jax.Array, target: jax.Array, eps: float = 1e-6) -> jax.Array:
    """BCE + soft-Dice loss. `probs` and `target` are [N, 1, H, W] in [0, 1]."""
    p = probs.astype(jnp.float32).clip(eps, 1.0 - eps)
    t = target.astype(jnp.float32)
    bce = -(t * jnp.log(p) + (1.0 - t) * jnp.log(1.0 - p)).mean()
    inter = (p * t).sum(axis=(1, 2, 3))
    denom = p.sum(axis=(1, 2, 3)) + t.sum(axis=(1, 2, 3))
    dice = 1.0 - ((2.0 * inter + eps) / (denom + eps)).mean()
    return bce + dice


def ctc_loss(
    logprobs_tnc: jax.Array,
    labels: jax.Array,
    label_lengths: jax.Array,
    logit_lengths: jax.Array | None = None,
) -> jax.Array:
    """Mean CTC loss.

    `logprobs_tnc`: [T, N, C] log-probabilities (the recognition model's
    native output layout). `labels`: [N, L] int32 with class 0 = blank used
    as padding. `label_lengths`: [N]. `logit_lengths`: [N] or None (= all T).
    """
    t, n, c = logprobs_tnc.shape
    logits = jnp.transpose(logprobs_tnc, (1, 0, 2))  # [N, T, C]
    if logit_lengths is None:
        logit_paddings = jnp.zeros((n, t), jnp.float32)
    else:
        steps = jnp.arange(t)[None, :]
        logit_paddings = (steps >= logit_lengths[:, None]).astype(jnp.float32)
    l = labels.shape[1]
    label_paddings = (jnp.arange(l)[None, :] >= label_lengths[:, None]).astype(
        jnp.float32
    )
    per_seq = optax.ctc_loss(logits, logit_paddings, labels, label_paddings)
    return per_seq.mean()
