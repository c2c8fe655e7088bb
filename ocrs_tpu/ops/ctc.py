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
def text_confidence(logprobs: jax.Array) -> jax.Array:
    """Per-line decode confidence over the NON-BLANK frames: [N, T, C] ->
    [N] f32 in (0, 1], exp(mean over frames whose argmax is a character of
    that character's log-probability).

    Restricting to non-blank frames matters: a graphics-only crop (a plot
    curve, a table rule) decodes as mostly-confident blanks plus a few
    low-probability character frames — its ALL-frame mean looks fine while
    its character frames are garbage. Real text scores >~0.9 here; stroke
    junk typically <~0.7 (the basis of the engine's opt-in
    ``min_line_confidence`` filter). Lines with no character frames return
    1.0 — they emit no text, so they are never worth filtering."""
    maxlp = jnp.max(logprobs, axis=-1)  # [N, T]
    nonblank = jnp.argmax(logprobs, axis=-1) != 0
    s = jnp.sum(jnp.where(nonblank, maxlp, 0.0), axis=1)
    c = jnp.sum(nonblank, axis=1)
    return jnp.exp(s / jnp.maximum(c, 1)).astype(jnp.float32)


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


from functools import partial as _partial

#: Per-frame candidate-class cap for the device->host beam readback. Wide
#: beams (the CLI's --beam is width 100, matching main.rs:403-407) do not
#: need WIDTH candidate classes per frame: an extension by a class ranked
#: below ~8 is beam-pruned immediately for any realistically peaked
#: emission distribution (the shipped recognizer's rank-8 candidate is
#: already ~5.6 nats below rank-1 at the median; decodes measured identical
#: to k=16 and k=97 on real lines), while reading back all max(width, 8)
#: candidates made width-100 decode 12x the bytes and the dominant wall
#: (VERDICT r04). Capping is part of the decode contract for the device
#: readback path (recognition/pipeline); the host full-matrix path
#: (ctc_beam_batch) stays uncapped and exactly matches the Python oracle at
#: any width.
BEAM_CANDIDATE_CAP = 8


def beam_candidate_k(width: int, n_classes: int) -> int:
    """Candidate classes per frame for a beam of ``width`` over
    ``n_classes``: ``min(max(width, 8), BEAM_CANDIDATE_CAP, n_classes)``."""
    return min(max(width, 8), BEAM_CANDIDATE_CAP, n_classes)


@_partial(jax.jit, static_argnames=("k",))
def beam_topk(logprobs: jax.Array, k: int = 8) -> tuple[jax.Array, jax.Array]:
    """Device-side per-frame top-k candidates for beam search.

    The prefix beam only ever considers the top ``max(width, 8)`` classes per
    frame (the oracle's pruning), so reading back ``(vals, idx)`` of shape
    [N, T, k] instead of the full [N, T, C] log-probs shrinks the
    device->host copy to ~k/C the size with bit-identical decode results.
    idx is u8 (class counts < 256 for any realistic alphabet)."""
    vals, idx = jax.lax.top_k(logprobs, k)
    return vals, idx.astype(jnp.uint8)


#: Device-side emission-gap prune: candidates more than this many nats below
#: the frame's max log-prob are masked to -inf before the readback. exp(-10)
#: ~ 5e-5 relative mass — decode-neutral for trained (peaked) recognizers,
#: and it turns most frames into single-candidate blank frames, which the
#: C++ beam handles with an O(W) fast path (no heap/sort/logaddexp).
BEAM_EMISSION_GAP = 10.0


@_partial(jax.jit, static_argnames=("k", "gap"))
def beam_topk_packed(
    logprobs: jax.Array, k: int = 8, gap: float | None = None
) -> jax.Array:
    """:func:`beam_topk` packed into ONE u8 buffer [N, T, 5k]: the f32
    candidate values bitcast to bytes (little-endian minor axis, XLA
    bitcast_convert_type semantics) followed by the u8 class ids. One packed
    readback costs one relay round trip; two arrays cost two (~30ms each on
    the axon relay). Unpack with :func:`unpack_topk`.

    ``gap``: optional emission-gap prune — candidate values below
    ``frame_max - gap`` become -inf (the C++ beam treats -inf as padding).
    Top-k order puts masked entries at the tail, so the candidate list stays
    a valid descending prefix."""
    vals, idx = jax.lax.top_k(logprobs, k)
    if gap is not None:
        vals = jnp.where(
            vals < vals[..., :1] - gap, -jnp.inf, vals
        )
    # f32 regardless of compute dtype (bf16 model outputs upcast) so the
    # byte layout is fixed and the C++ beam sees full-precision candidates.
    vb = jax.lax.bitcast_convert_type(vals.astype(jnp.float32), jnp.uint8)  # [N,T,k,4]
    flat = vb.reshape(*vals.shape[:-1], k * 4)
    return jnp.concatenate([flat, idx.astype(jnp.uint8)], axis=-1)


def unpack_topk(buf: np.ndarray, k: int) -> tuple[np.ndarray, np.ndarray]:
    """Host-side inverse of :func:`beam_topk_packed`: [N, T, 5k] u8 ->
    (vals f32 [N, T, k], idx i32 [N, T, k])."""
    buf = np.ascontiguousarray(buf)
    vals = (
        np.ascontiguousarray(buf[..., : 4 * k])
        .view(np.float32)
        .reshape(*buf.shape[:-1], k)
    )
    idx = buf[..., 4 * k :].astype(np.int32)
    return vals, idx


def _topk_to_full(vals: np.ndarray, idx: np.ndarray, n_classes: int) -> np.ndarray:
    """Scatter [T, K] candidates back to a [T, C] -inf-filled matrix (Python
    fallback path: the oracle on this sparse matrix equals the oracle on the
    full matrix because both prune to the same candidate set)."""
    t, _ = vals.shape
    full = np.full((t, n_classes), -np.inf, dtype=np.float32)
    np.put_along_axis(full, idx.astype(np.int64), vals, axis=-1)
    return full


def beam_decode_topk(
    vals: np.ndarray, idx: np.ndarray, beam_width: int, n_classes: int
) -> list[list[CtcStep]]:
    """Batched beam decode from device top-k readbacks ([N, T, K] each)."""
    from .. import native

    vals = np.asarray(vals, dtype=np.float32)
    idx = np.asarray(idx, dtype=np.int32)
    nat = native.ctc_beam_topk(vals, idx, beam_width)
    if nat is not None:
        pos, lab, counts = nat
        return [
            [CtcStep(pos=int(pos[i, k]), label=int(lab[i, k])) for k in range(counts[i])]
            for i in range(vals.shape[0])
        ]
    return [
        beam_decode(_topk_to_full(vals[i], idx[i], n_classes), beam_width)
        for i in range(vals.shape[0])
    ]


def beam_decode_topk_arrays(
    vals: np.ndarray, idx: np.ndarray, beam_width: int, n_classes: int
) -> list[tuple[np.ndarray, np.ndarray]]:
    """:func:`beam_decode_topk` returning ``(pos, label)`` int32 array pairs."""
    from .. import native

    vals = np.asarray(vals, dtype=np.float32)
    idx = np.asarray(idx, dtype=np.int32)
    nat = native.ctc_beam_topk(vals, idx, beam_width)
    if nat is not None:
        pos, lab, counts = nat
        return [(pos[i, : counts[i]], lab[i, : counts[i]]) for i in range(vals.shape[0])]
    out = []
    for i in range(vals.shape[0]):
        steps = beam_decode(_topk_to_full(vals[i], idx[i], n_classes), beam_width)
        out.append(
            (
                np.array([s.pos for s in steps], dtype=np.int32),
                np.array([s.label for s in steps], dtype=np.int32),
            )
        )
    return out


def beam_decode_batch(
    logprobs: np.ndarray, beam_width: int, excluded: Optional[Sequence[int]] = None
) -> list[list[CtcStep]]:
    """Batched CTC prefix beam search over [N, T, C] log-probabilities.

    Uses the C++ kernel (``oc_ctc_beam``, ~100x the Python beam and the only
    formulation viable at pipeline scale) when the native library is
    available; falls back to the per-line Python :func:`beam_decode`
    otherwise. Both implement the same prefix-merging search, parity-tested
    on random logits (tests/test_ops.py).
    """
    from .. import native

    lp = np.asarray(logprobs)
    onehot = None
    if excluded:
        onehot = np.zeros((lp.shape[-1],), dtype=np.uint8)
        onehot[list(excluded)] = 1
    nat = native.ctc_beam_batch(lp, beam_width, onehot)
    if nat is not None:
        pos, lab, counts = nat
        return [
            [CtcStep(pos=int(pos[i, k]), label=int(lab[i, k])) for k in range(counts[i])]
            for i in range(lp.shape[0])
        ]
    return [beam_decode(lp[i], beam_width, excluded) for i in range(lp.shape[0])]


def beam_decode_batch_arrays(
    logprobs: np.ndarray, beam_width: int, excluded: Optional[Sequence[int]] = None
) -> list[tuple[np.ndarray, np.ndarray]]:
    """:func:`beam_decode_batch` returning ``(pos, label)`` int32 array pairs
    per line (the throughput pipeline's step representation)."""
    from .. import native

    lp = np.asarray(logprobs)
    onehot = None
    if excluded:
        onehot = np.zeros((lp.shape[-1],), dtype=np.uint8)
        onehot[list(excluded)] = 1
    nat = native.ctc_beam_batch(lp, beam_width, onehot)
    if nat is not None:
        pos, lab, counts = nat
        return [(pos[i, : counts[i]], lab[i, : counts[i]]) for i in range(lp.shape[0])]
    out = []
    for i in range(lp.shape[0]):
        steps = beam_decode(lp[i], beam_width, excluded)
        out.append(
            (
                np.array([s.pos for s in steps], dtype=np.int32),
                np.array([s.label for s in steps], dtype=np.int32),
            )
        )
    return out


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
