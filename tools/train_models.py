#!/usr/bin/env python3
"""Train the detection and recognition models on synthetic rendered data and
export deployable .npz weights.

    python tools/train_models.py recognition --steps 4000 -o weights/text-recognition.npz
    python tools/train_models.py detection   --steps 1200 -o weights/text-detection.npz

These produce the weights consumed by the CLI's --detect-model/--rec-model
and the engine examples. Synthetic-data quality: reads clean rendered text
reliably; not a substitute for real-dataset training (the reference's models
train on HierText), but makes the full pipeline usable out of the box.
"""

from __future__ import annotations

import argparse
import time
from pathlib import Path

import numpy as np


def train_recognition(args) -> None:
    import jax
    import optax

    from ocrs_tpu.engine import DEFAULT_ALPHABET
    from ocrs_tpu.models.weights import save_params
    from ocrs_tpu.train.data import recognition_batches
    from ocrs_tpu.train.train import (
        init_recognition_state,
        make_mesh,
        make_recognition_train_step,
        shard_batch,
    )

    n_classes = len(DEFAULT_ALPHABET) + 1
    mesh = make_mesh()
    schedule = optax.warmup_cosine_decay_schedule(
        0.0, args.lr, warmup_steps=min(100, args.steps // 2 + 1), decay_steps=args.steps + 1
    )
    optimizer = optax.adamw(schedule)
    step_fn = make_recognition_train_step(mesh, optimizer)

    with mesh:
        state = init_recognition_state(
            mesh, optimizer, n_classes=n_classes, hidden=args.hidden
        )
        batches = recognition_batches(
            args.batch, width=args.width, alphabet=DEFAULT_ALPHABET, augment=True
        )
        t0 = time.time()
        for step in range(1, args.steps + 1):
            images, labels, lengths = next(batches)
            state, loss = step_fn(
                state, *shard_batch(mesh, *map(np.asarray, (images, labels, lengths)))
            )
            if step % 100 == 0 or step == 1:
                print(
                    f"[recognition] step {step:5d}  loss {float(loss):8.3f}  "
                    f"({time.time() - t0:.0f}s)",
                    flush=True,
                )
        out = Path(args.output)
        out.parent.mkdir(parents=True, exist_ok=True)
        save_params(
            out,
            jax.device_get(state.params),
            meta={
                "kind": "recognition",
                "hidden": args.hidden,
                "n_classes": n_classes,
                "alphabet": DEFAULT_ALPHABET,
                "trained_on": "synthetic rendered text (ocrs_tpu.train.data)",
                "steps": args.steps,
            },
        )
        print(f"saved {out}")


def train_detection(args) -> None:
    import jax
    import optax

    from ocrs_tpu.models.detection_net import DEFAULT_INPUT_HW
    from ocrs_tpu.models.weights import save_params
    from ocrs_tpu.train.data import detection_batches
    from ocrs_tpu.train.train import (
        init_detection_state,
        make_detection_train_step,
        make_mesh,
        shard_batch,
    )

    mesh = make_mesh()
    schedule = optax.warmup_cosine_decay_schedule(
        0.0, args.lr, warmup_steps=min(50, args.steps // 2 + 1), decay_steps=args.steps + 1
    )
    optimizer = optax.adamw(schedule)
    step_fn = make_detection_train_step(mesh, optimizer)

    with mesh:
        state = init_detection_state(mesh, optimizer)
        batches = detection_batches(args.batch, page_hw=DEFAULT_INPUT_HW)
        t0 = time.time()
        for step in range(1, args.steps + 1):
            images, masks = next(batches)
            state, loss = step_fn(
                state, *shard_batch(mesh, *map(np.asarray, (images, masks)))
            )
            if step % 50 == 0 or step == 1:
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
                "trained_on": "synthetic rendered pages (ocrs_tpu.train.data)",
                "steps": args.steps,
            },
        )
        print(f"saved {out}")


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("model", choices=["recognition", "detection"])
    parser.add_argument("--steps", type=int, default=4000)
    parser.add_argument("--batch", type=int, default=32)
    parser.add_argument("--width", type=int, default=512)
    parser.add_argument("--hidden", type=int, default=192)
    parser.add_argument("--lr", type=float, default=1e-3)
    parser.add_argument("-o", "--output", required=True)
    args = parser.parse_args()
    if args.model == "recognition":
        train_recognition(args)
    else:
        train_detection(args)


if __name__ == "__main__":
    main()
