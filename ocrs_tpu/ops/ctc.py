"""CTC decoding: vectorized greedy on device, prefix beam search on host.

Replaces ``rten::ctc::{CtcDecoder, CtcHypothesis}`` as used by the reference
(recognition.rs:498-523). Label conventions match: label 0 is the CTC blank;
label ``i`` maps to ``alphabet[i - 1]``. Decoded steps carry the *input
frame position* where each character was first emitted, which the pipeline
maps back to image x-coordinates (recognition.rs:249-262).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class CtcStep:
    """One decoded character: CTC label (>=1) and input frame index."""

    pos: int
    label: int


@jax.jit
def greedy_labels(logprobs: jax.Array) -> jax.Array:
    """Per-frame argmax over classes. [N, T, C] -> [N, T] int32.

    The blank/repeat collapse is O(T) host work per line on a tiny int array;
    the heavy [N, T, C] reduction happens here on device.
    """
    return jnp.argmax(logprobs, axis=-1).astype(jnp.int32)


@jax.jit
def greedy_labels_u8(logprobs: jax.Array) -> jax.Array:
    """:func:`greedy_labels` cast to uint8 on device (class counts are < 256
    for any realistic alphabet), quartering the device->host readback that
    dominates decode latency on relayed transports."""
    return jnp.argmax(logprobs, axis=-1).astype(jnp.uint8)


@jax.jit
def mask_excluded(logprobs: jax.Array, excluded_onehot: jax.Array) -> jax.Array:
    """Set log-probability of excluded class labels to -inf
    (recognition.rs:547-561). `excluded_onehot` is [C] bool."""
    return jnp.where(excluded_onehot, -jnp.inf, logprobs)


def collapse_greedy_batch(labels: np.ndarray) -> list[list[CtcStep]]:
    """Collapse a [N, T] batch of per-frame argmax labels (native fast path
    when available)."""
    from .. import native

    labels = np.asarray(labels)
    nat = native.ctc_collapse_batch(labels)
    if nat is not None:
        pos, lab, counts = nat
        return [
            [CtcStep(pos=int(pos[i, k]), label=int(lab[i, k])) for k in range(counts[i])]
            for i in range(labels.shape[0])
        ]
    return [collapse_greedy(labels[i]) for i in range(labels.shape[0])]


def collapse_greedy_batch_arrays(
    labels: np.ndarray,
) -> list[tuple[np.ndarray, np.ndarray]]:
    """Like :func:`collapse_greedy_batch` but returns ``(pos, label)`` int32
    array pairs per line instead of ``CtcStep`` objects. The throughput
    pipeline uses this: building tens of thousands of step objects per page
    group costs more host time than the whole native collapse."""
    from .. import native

    labels = np.asarray(labels)
    nat = native.ctc_collapse_batch(labels)
    if nat is not None:
        pos, lab, counts = nat
        return [
            (pos[i, : counts[i]], lab[i, : counts[i]])
            for i in range(labels.shape[0])
        ]
    out = []
    for i in range(labels.shape[0]):
        steps = collapse_greedy(labels[i])
        out.append(
            (
                np.array([s.pos for s in steps], dtype=np.int32),
                np.array([s.label for s in steps], dtype=np.int32),
            )
        )
    return out


def collapse_greedy(labels: np.ndarray) -> list[CtcStep]:
    """Collapse repeats then drop blanks (standard CTC best-path).

    `labels` is a [T] int array of per-frame argmax labels. The step position
    is the first frame of each emitted run.
    """
    steps: list[CtcStep] = []
    prev = 0
    for t, lab in enumerate(np.asarray(labels).tolist()):
        if lab != 0 and lab != prev:
            steps.append(CtcStep(pos=t, label=int(lab)))
        prev = lab
    return steps


def beam_decode(
    logprobs: np.ndarray, beam_width: int, excluded: Optional[Sequence[int]] = None
) -> list[CtcStep]:
    """CTC prefix beam search over a [T, C] log-probability matrix.

    Standard prefix-merging beam search (no language model), equivalent in
    role to ``CtcDecoder::decode_beam`` (recognition.rs:517-520). Returns the
    steps of the most probable label sequence; each step's ``pos`` is the
    frame at which that character was first appended on the best path.
    """
    lp = np.asarray(logprobs, dtype=np.float64)
    t_len, n_classes = lp.shape
    if excluded:
        lp[:, list(excluded)] = -np.inf

    NEG_INF = -np.inf

    def logaddexp(a: float, b: float) -> float:
        if a == NEG_INF:
            return b
        if b == NEG_INF:
            return a
        m = max(a, b)
        return m + math.log(math.exp(a - m) + math.exp(b - m))

    # beams: prefix (tuple of (pos, label)) -> [p_blank, p_nonblank]
    beams: dict[tuple, list[float]] = {(): [0.0, NEG_INF]}

    for t in range(t_len):
        frame = lp[t]
        # Consider only the top candidate classes this frame for speed.
        order = np.argsort(frame)[::-1]
        order = [c for c in order[: max(beam_width, 8)] if frame[c] > NEG_INF]
        next_beams: dict[tuple, list[float]] = {}

        def acc(prefix: tuple, which: int, value: float) -> None:
            entry = next_beams.setdefault(prefix, [NEG_INF, NEG_INF])
            entry[which] = logaddexp(entry[which], value)

        for prefix, (p_b, p_nb) in beams.items():
            total = logaddexp(p_b, p_nb)
            last_label = prefix[-1][1] if prefix else None
            for c in order:
                p = float(frame[c])
                if c == 0:
                    acc(prefix, 0, total + p)
                elif c == last_label:
                    # Repeat without blank extends the same char...
                    acc(prefix, 1, p_nb + p)
                    # ...or, after a blank, starts a new one.
                    acc(prefix + ((t, c),), 1, p_b + p)
                else:
                    acc(prefix + ((t, c),), 1, total + p)

        pruned = sorted(
            next_beams.items(),
            key=lambda kv: logaddexp(kv[1][0], kv[1][1]),
            reverse=True,
        )[:beam_width]
        beams = dict(pruned)

    best_prefix = max(beams.items(), key=lambda kv: logaddexp(kv[1][0], kv[1][1]))[0]
    return [CtcStep(pos=p, label=l) for p, l in best_prefix]
