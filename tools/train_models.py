#!/usr/bin/env python3
"""Train the detection and recognition models on styled synthetic data and
export deployable .npz weights.

    python tools/train_models.py recognition --arch convctc --steps 16000 \
        --samples 60000 -o weights/text-recognition.npz
    python tools/train_models.py detection --steps 4000 --samples 4000 \
        -o weights/text-detection.npz

Data comes from ocrs_tpu.train.render (fonts x polarities x gray levels x
degradations x pipeline-exact geometry; see that module's docstring) and is
pre-rendered once into a RAM/disk cache so the single host core can feed the
TPU. Validation: greedy-decode CER on a held-out styled set (recognition) /
mask F1 (detection), printed during training.
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))
CACHE_DIR = REPO / "_build" / "datacache"


def _greedy_cer(logprobs_tnc, labels, lengths, alphabet) -> float:
    """Character error rate of greedy CTC decode vs labels."""
    from ocrs_tpu.ops.ctc import collapse_greedy_batch

    import jax.numpy as jnp

    lab = np.asarray(jnp.argmax(logprobs_tnc, axis=-1)).T  # [N, T]
    decoded = collapse_greedy_batch(lab)
    total = err = 0
    for steps, ref_lab, ref_len in zip(decoded, labels, lengths):
        hyp = [s.label for s in steps]
        ref = list(ref_lab[: int(ref_len)])
        # Levenshtein distance.
        dp = list(range(len(ref) + 1))
        for i, h in enumerate(hyp, 1):
            prev = dp[0]
            dp[0] = i
            for j, r in enumerate(ref, 1):
                cur = dp[j]
                dp[j] = min(dp[j] + 1, dp[j - 1] + 1, prev + (h != r))
                prev = cur
        err += dp[-1]
        total += max(len(ref), 1)
    return err / max(total, 1)


def _render_kwargs(args) -> dict | None:
    """Renderer regime-share overrides from CLI flags (None = renderer
    defaults)."""
    kw = {}
    for name in ("blockify_prob", "pixelfont_prob", "graphics_prob", "empty_prob"):
        v = getattr(args, name)
        if v is not None:
            kw[name] = v
    return kw or None


def train_recognition(args) -> None:
    import jax
    import optax

    from ocrs_tpu.engine import DEFAULT_ALPHABET
    from ocrs_tpu.models import recognition_net
    from ocrs_tpu.models.weights import save_params
    from ocrs_tpu.train.data import RecognitionDataset
    from ocrs_tpu.train.train import (
        init_recognition_state,
        make_mesh,
        make_recognition_train_step,
        shard_batch,
    )

    n_classes = len(DEFAULT_ALPHABET) + 1
    cache = (
        Path(args.cache)
        if args.cache
        else CACHE_DIR / f"rec_{args.samples}_{args.width}_s{args.data_seed}.npz"
    )
    print(f"dataset: {args.samples} lines (cache {cache})", flush=True)
    t0 = time.time()
    ds = RecognitionDataset(
        args.samples,
        width=args.width,
        alphabet=DEFAULT_ALPHABET,
        max_label_len=args.max_label_len,
        seed=args.data_seed,
        cache_path=cache,
        log_every=5000,
        extra_caches=args.extra_cache or None,
        render_kwargs=_render_kwargs(args),
    )
    print(f"dataset ready in {time.time() - t0:.0f}s ({len(ds)} lines)", flush=True)
    if args.render_only:
        return

    # Held-out validation set (different seed, streaming renderer).
    from ocrs_tpu.train.data import recognition_batches

    val_imgs, val_labels, val_lengths = next(
        recognition_batches(
            args.val_size,
            width=args.width,
            max_label_len=args.max_label_len,
            seed=args.data_seed + 7919,
            render_kwargs=_render_kwargs(args),
        )
    )

    mesh = make_mesh()
    schedule = optax.warmup_cosine_decay_schedule(
        0.0, args.lr, warmup_steps=min(300, args.steps // 2 + 1), decay_steps=args.steps + 1
    )
    optimizer = optax.chain(
        optax.clip_by_global_norm(1.0), optax.adamw(schedule, weight_decay=1e-4)
    )
    step_fn = make_recognition_train_step(mesh, optimizer, arch=args.arch)
    apply_fn = recognition_net.ARCHS[args.arch][1]

    init_params = None
    if args.init_from:
        from ocrs_tpu.models.weights import load_params

        init_params, init_meta = load_params(args.init_from)
        print(f"warm start from {args.init_from} (meta {init_meta.get('arch')})", flush=True)

    def _save(state, step):
        out = Path(args.output)
        out.parent.mkdir(parents=True, exist_ok=True)
        save_params(
            out,
            jax.device_get(state.params),
            meta={
                "kind": "recognition",
                "arch": args.arch,
                "hidden": args.hidden,
                "n_classes": n_classes,
                "alphabet": DEFAULT_ALPHABET,
                "trained_on": "styled synthetic rendered text (ocrs_tpu.train.render)",
                "steps": step,
            },
        )

    with mesh:
        state = init_recognition_state(
            mesh,
            optimizer,
            n_classes=n_classes,
            hidden=args.hidden,
            arch=args.arch,
            init_params=init_params,
        )
        # u8 batches: crops upload raw and normalize on device (the float32
        # [64,1,64,768] batch would cost ~0.3s/step over the 40MB/s relay).
        batches = ds.batches(args.batch, seed=args.data_seed + 1, as_u8=True)
        t0 = time.time()
        for step in range(1, args.steps + 1):
            images, labels, lengths = next(batches)
            state, loss = step_fn(
                state, *shard_batch(mesh, *map(np.asarray, (images, labels, lengths)))
            )
            if step % 200 == 0 or step == 1:
                print(
                    f"[recognition/{args.arch}] step {step:6d}  loss {float(loss):8.3f}  "
                    f"({time.time() - t0:.0f}s)",
                    flush=True,
                )
            if step % args.val_every == 0 or step == args.steps:
                lp = apply_fn(state.params, val_imgs)
                cer = _greedy_cer(lp, val_labels, val_lengths, DEFAULT_ALPHABET)
                print(
                    f"[recognition/{args.arch}] step {step:6d}  val CER {cer:.4f}",
                    flush=True,
                )
                # Checkpoint at every validation: long fine-tunes stay
                # resumable/harvestable if the run is cut short.
                _save(state, step)
        _save(state, args.steps)
        print(f"saved {args.output}")


def train_detection(args) -> None:
    import jax
    import optax

    from ocrs_tpu.models.detection_net import DEFAULT_INPUT_HW
    from ocrs_tpu.models.weights import save_params
    from ocrs_tpu.train.data import DetectionDataset
    from ocrs_tpu.train.train import (
        init_detection_state,
        make_detection_train_step,
        make_mesh,
        shard_batch,
    )

    cache = (
        Path(args.cache)
        if args.cache
        else CACHE_DIR / f"det_{args.samples}_s{args.data_seed}.npz"
    )
    print(f"dataset: {args.samples} pages (cache {cache})", flush=True)
    t0 = time.time()
    kw = _render_kwargs(args) or {}
    det_kw = {
        k: v
        for k, v in {
            "figure_prob": args.figure_prob,
            "pixelfont_prob": kw.get("pixelfont_prob"),
        }.items()
        if v is not None
    }
    ds = DetectionDataset(
        args.samples, page_hw=DEFAULT_INPUT_HW, seed=args.data_seed, cache_path=cache,
        log_every=500, extra_caches=args.extra_cache or None,
        render_kwargs=det_kw or None,
    )
    print(f"dataset ready in {time.time() - t0:.0f}s ({len(ds)} pages)", flush=True)
    if args.render_only:
        return

    mesh = make_mesh()
    schedule = optax.warmup_cosine_decay_schedule(
        0.0, args.lr, warmup_steps=min(150, args.steps // 2 + 1), decay_steps=args.steps + 1
    )
    optimizer = optax.chain(
        optax.clip_by_global_norm(1.0), optax.adamw(schedule, weight_decay=1e-4)
    )
    step_fn = make_detection_train_step(mesh, optimizer)

    init_params = None
    if args.init_from:
        from ocrs_tpu.models.weights import load_params

        init_params, _ = load_params(args.init_from)
        print(f"warm start from {args.init_from}", flush=True)

    with mesh:
        state = init_detection_state(mesh, optimizer, init_params=init_params)
        # u8 batches: images/masks upload raw and normalize on device (the
        # float32 batch would cost ~0.75s/step over the 40MB/s relay).
        batches = ds.batches(args.batch, seed=args.data_seed + 1, as_u8=True)
        t0 = time.time()
        for step in range(1, args.steps + 1):
            images, masks = next(batches)
            state, loss = step_fn(
                state, *shard_batch(mesh, *map(np.asarray, (images, masks)))
            )
            if step % 100 == 0 or step == 1:
                print(
                    f"[detection] step {step:5d}  loss {float(loss):8.4f}  "
                    f"({time.time() - t0:.0f}s)",
                    flush=True,
                )
        out = Path(args.output)
        out.parent.mkdir(parents=True, exist_ok=True)
        save_params(
            out,
            jax.device_get(state.params),
            meta={
                "kind": "detection",
                "input_hw": list(DEFAULT_INPUT_HW),
                "trained_on": "styled synthetic rendered pages (ocrs_tpu.train.render)",
                "steps": args.steps,
            },
        )
        print(f"saved {out}")


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("model", choices=["recognition", "detection"])
    parser.add_argument("--arch", default="convctc", choices=["crnn", "convctc"])
    parser.add_argument("--steps", type=int, default=16000)
    parser.add_argument("--batch", type=int, default=64)
    parser.add_argument("--width", type=int, default=768)
    parser.add_argument("--hidden", type=int, default=192)
    parser.add_argument("--lr", type=float, default=1e-3)
    parser.add_argument("--samples", type=int, default=60000)
    parser.add_argument("--max-label-len", type=int, default=40)
    parser.add_argument("--val-size", type=int, default=256)
    parser.add_argument("--val-every", type=int, default=2000)
    parser.add_argument("--data-seed", type=int, default=0)
    parser.add_argument(
        "--blockify-prob",
        type=float,
        default=None,
        help="override the renderer's bitmap-font regime share when "
        "rendering a fresh recognition cache (default: renderer's 0.10)",
    )
    parser.add_argument(
        "--pixelfont-prob",
        type=float,
        default=None,
        help="share of recognition samples set in the procedural pixel "
        "face (train.pixelfont; renderer default 0.0)",
    )
    parser.add_argument(
        "--graphics-prob",
        type=float,
        default=None,
        help="share of recognition crops with unlabeled legend strokes / "
        "arrows crossing the line (renderer default 0.0)",
    )
    parser.add_argument(
        "--empty-prob",
        type=float,
        default=None,
        help="share of graphics-only crops with EMPTY labels (renderer "
        "default 0.0)",
    )
    parser.add_argument(
        "--figure-prob",
        type=float,
        default=None,
        help="share of plot-like figure pages when rendering a detection "
        "cache (renderer default 0.18)",
    )
    parser.add_argument(
        "--render-only",
        action="store_true",
        help="render/cache the dataset and exit without training",
    )
    parser.add_argument("--cache", default=None, help="dataset cache .npz path")
    parser.add_argument(
        "--extra-cache",
        action="append",
        default=[],
        help="additional pre-rendered cache(s) to concatenate (recognition)",
    )
    parser.add_argument(
        "--init-from",
        default=None,
        help="warm-start from an existing .npz checkpoint (fine-tuning; "
        "arch/hidden must match)",
    )
    parser.add_argument("-o", "--output", required=True)
    args = parser.parse_args()
    if args.model == "recognition":
        train_recognition(args)
    else:
        args.batch = min(args.batch, 16)
        train_detection(args)


if __name__ == "__main__":
    main()
