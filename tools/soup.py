#!/usr/bin/env python3
"""Average two or more recognition/detection checkpoints ("model soup").

Uniform parameter averaging of fine-tune parents that share an init
(Wortsman et al., "Model soups", 2022): the round-5 recipe averages the
round-4 shipped recognizer with its round-5 fine-tune child — the average
retains the parent's styled-font domain while keeping most of the child's
bitmap-font gains, and in round-5 measurement beat both parents on every
golden metric.

    python tools/soup.py weights/text-recognition.npz weights/cand_r5.npz \
        -o weights/soup.npz [--w 0.5 0.5]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("checkpoints", nargs="+", help=".npz weight files")
    parser.add_argument("--w", type=float, nargs="+", default=None,
                        help="per-checkpoint weights (default: uniform)")
    parser.add_argument("-o", "--output", required=True)
    args = parser.parse_args()

    import jax

    from ocrs_tpu.models.weights import load_params, save_params

    trees, metas = [], []
    for ck in args.checkpoints:
        params, meta = load_params(ck)
        trees.append(params)
        metas.append(meta)

    ws = args.w or [1.0 / len(trees)] * len(trees)
    if len(ws) != len(trees):
        parser.error("--w must match the number of checkpoints")
    total = sum(ws)
    ws = [w / total for w in ws]

    ref_treedef = jax.tree_util.tree_structure(trees[0])
    for t in trees[1:]:
        if jax.tree_util.tree_structure(t) != ref_treedef:
            parser.error("checkpoints have different parameter structures")

    souped = jax.tree_util.tree_map(
        lambda *leaves: sum(
            w * np.asarray(leaf, dtype=np.float64) for w, leaf in zip(ws, leaves)
        ).astype(np.asarray(leaves[0]).dtype),
        *trees,
    )

    meta = dict(metas[0])
    meta["soup_of"] = [str(Path(c).name) for c in args.checkpoints]
    meta["soup_weights"] = ws
    save_params(args.output, souped, meta=meta)
    print(f"saved {args.output} (uniform={args.w is None}, weights={ws})")


if __name__ == "__main__":
    main()
