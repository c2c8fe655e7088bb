#!/usr/bin/env python3
"""Train the recognition model on synthetic rendered text and show it
decoding — the framework's end-to-end training demonstration (the reference
delegates training to the external ocrs-models repo; ocrs-tpu owns it).

    python tools/train_demo.py [--steps 300] [--batch 32] [--width 384]

Prints the CTC loss curve and, at the end, greedy decodes of held-out
rendered lines. With a few hundred steps the model reliably reads clean
synthetic text.
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--steps", type=int, default=300)
    parser.add_argument("--batch", type=int, default=32)
    parser.add_argument("--width", type=int, default=384)
    parser.add_argument("--hidden", type=int, default=96)
    parser.add_argument("--lr", type=float, default=3e-4)
    parser.add_argument("--checkpoint-dir", default=None)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from ocrs_tpu.engine import DEFAULT_ALPHABET
    from ocrs_tpu.models import recognition_net
    from ocrs_tpu.ops.ctc import collapse_greedy_batch
    from ocrs_tpu.train.data import recognition_batches, render_line
    from ocrs_tpu.train.train import (
        init_recognition_state,
        make_mesh,
        make_recognition_train_step,
        shard_batch,
    )

    alphabet = DEFAULT_ALPHABET
    n_classes = len(alphabet) + 1
    mesh = make_mesh()
    optimizer = optax.adamw(args.lr)
    step_fn = make_recognition_train_step(mesh, optimizer)

    with mesh:
        state = init_recognition_state(
            mesh, optimizer, n_classes=n_classes, hidden=args.hidden
        )
        batches = recognition_batches(args.batch, width=args.width, alphabet=alphabet)
        t0 = time.time()
        for step in range(1, args.steps + 1):
            images, labels, lengths = next(batches)
            images, labels, lengths = shard_batch(
                mesh, *map(np.asarray, (images, labels, lengths))
            )
            state, loss = step_fn(state, images, labels, lengths)
            if step % 25 == 0 or step == 1:
                print(f"step {step:4d}  ctc loss {float(loss):8.3f}  ({time.time()-t0:.0f}s)")

        if args.checkpoint_dir:
            from ocrs_tpu.train.checkpoint import save_checkpoint

            path = save_checkpoint(args.checkpoint_dir, state)
            print(f"saved {path}")

        # Held-out decode check.
        tests = ["hello", "TPU 42", "ocrs"]
        params = state.params
        for text in tests:
            line = render_line(text)
            w = min(line.shape[1], args.width)
            img = np.full((1, 1, 64, args.width), -0.5, np.float32)
            img[0, 0, :, :w] = line[:, :w]
            logprobs = recognition_net.apply(params, jnp.asarray(img))
            labels_out = np.asarray(jnp.argmax(jnp.transpose(logprobs, (1, 0, 2)), -1))
            steps = collapse_greedy_batch(labels_out)[0]
            decoded = "".join(
                alphabet[s.label - 1] if 0 < s.label <= len(alphabet) else "?"
                for s in steps
            )
            print(f"  {text!r:12} -> {decoded!r}")


if __name__ == "__main__":
    main()
