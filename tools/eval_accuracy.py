#!/usr/bin/env python3
"""Word-level precision/recall/F1 evaluation of the full OCR pipeline.

Generates held-out styled synthetic pages (ocrs_tpu.train.render), runs
the complete engine (detect -> layout -> recognize) with trained weights,
and matches predicted words against ground truth: a prediction is a true
positive when its rect overlaps a ground-truth word (IoU >= 0.3) and the
text matches (optionally case-insensitive / edit-distance-tolerant).

    python tools/eval_accuracy.py --detect weights/text-detection.npz \
        --rec weights/text-recognition.npz --pages 8

This is the framework's accuracy-parity harness (BASELINE.json: "word-level
precision/recall"). On synthetic pages it measures the trained models; run
it against any weights to regression-test accuracy.
"""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np


def _iou(a, b) -> float:
    t = max(a[0], b[0]); l = max(a[1], b[1])
    bt = min(a[2], b[2]); r = min(a[3], b[3])
    inter = max(bt - t, 0) * max(r - l, 0)
    area_a = (a[2] - a[0]) * (a[3] - a[1])
    area_b = (b[2] - b[0]) * (b[3] - b[1])
    union = area_a + area_b - inter
    return inter / union if union > 0 else 0.0


def _edit_distance(a: str, b: str) -> int:
    dp = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        prev = dp[0]
        dp[0] = i
        for j, cb in enumerate(b, 1):
            cur = dp[j]
            dp[j] = min(dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb))
            prev = cur
    return dp[-1]


def evaluate(engine, pages: int, seed: int, iou_thresh: float, max_edit: int, show: int = 0):
    from ocrs_tpu.preprocess import DimOrder, ImageSource
    from ocrs_tpu.train.render import render_native_page

    rng = np.random.default_rng(seed)
    tp = fp = fn = 0
    det_tp = det_fp = det_fn = 0
    for _ in range(pages):
        # Held-out STYLED pages (fonts/polarity/gray levels/degradations/
        # native sizes drawn fresh from the full style space, disjoint seed
        # stream from training) — not the single-font renderer, so this
        # measures generalization across the style space rather than
        # memorization of one rendering configuration.
        page01, gt_words = render_native_page(rng)
        while len(gt_words) == 0:  # skip the rare no-text page
            page01, gt_words = render_native_page(rng)
        arr = (page01 * 255).astype(np.uint8)
        inp = engine.prepare_input(ImageSource.from_tensor(arr[..., None], DimOrder.HWC))
        words = engine.detect_words(inp)
        lines = engine.find_text_lines(inp, words)
        recognized = engine.recognize_text(inp, lines)

        preds = []
        for line in recognized:
            if line is None:
                continue
            for word in line.words():
                br = word.bounding_rect()
                preds.append((str(word), (br.top, br.left, br.bottom, br.right)))

        if show > 0:
            for ptext, pbox in preds[:show]:
                best = max(gt_words, key=lambda g: _iou(pbox, g[1]))
                print(
                    f"  pred {ptext!r:18} gt {best[0]!r:14} iou "
                    f"{_iou(pbox, best[1]):.2f}",
                    file=sys.stderr,
                )
            show = 0

        # Detection-only matching: the DETECTOR's word rects (not the
        # recognized-word rects) against ground truth, best-IoU assignment.
        det_boxes = []
        for w in words:
            br = w.bounding_rect()
            det_boxes.append((br.top, br.left, br.bottom, br.right))
        gt_used = [False] * len(gt_words)
        for pbox in det_boxes:
            best, best_iou = None, iou_thresh
            for gi, (gtext, gbox) in enumerate(gt_words):
                v = _iou(pbox, gbox)
                if not gt_used[gi] and v >= best_iou:
                    best, best_iou = gi, v
            if best is None:
                det_fp += 1
            else:
                gt_used[best] = True
                det_tp += 1
        det_fn += gt_used.count(False)

        # End-to-end word matching (geometry + text), best-IoU assignment.
        gt_used = [False] * len(gt_words)
        for ptext, pbox in preds:
            best, best_iou = None, iou_thresh
            for gi, (gtext, gbox) in enumerate(gt_words):
                v = _iou(pbox, gbox)
                if (
                    not gt_used[gi]
                    and v >= best_iou
                    and _edit_distance(ptext, gtext) <= max_edit
                ):
                    best, best_iou = gi, v
            if best is None:
                fp += 1
            else:
                gt_used[best] = True
                tp += 1
        fn += gt_used.count(False)

    def prf(tp, fp, fn):
        p = tp / (tp + fp) if tp + fp else 0.0
        r = tp / (tp + fn) if tp + fn else 0.0
        f = 2 * p * r / (p + r) if p + r else 0.0
        return round(p, 4), round(r, 4), round(f, 4)

    dp, dr, df = prf(det_tp, det_fp, det_fn)
    ep, er, ef = prf(tp, fp, fn)
    return {
        "pages": pages,
        "detection": {"precision": dp, "recall": dr, "f1": df},
        "end_to_end": {"precision": ep, "recall": er, "f1": ef},
    }


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--detect", required=True, help="detection weights .npz")
    parser.add_argument("--rec", required=True, help="recognition weights .npz")
    parser.add_argument("--pages", type=int, default=8)
    parser.add_argument("--seed", type=int, default=1234)
    parser.add_argument("--iou", type=float, default=0.3)
    parser.add_argument("--max-edit", type=int, default=1)
    parser.add_argument("--show-samples", type=int, default=0)
    args = parser.parse_args()

    from ocrs_tpu.engine import OcrEngine, OcrEngineParams
    from ocrs_tpu.models.weights import (
        load_detection_model,
        load_params,
        load_recognition_model,
    )

    _, rec_meta = load_params(args.rec)
    engine = OcrEngine(
        OcrEngineParams(
            detection_model=load_detection_model(args.detect),
            recognition_model=load_recognition_model(args.rec),
            alphabet=rec_meta.get("alphabet"),
        )
    )
    result = evaluate(
        engine, args.pages, args.seed, args.iou, args.max_edit, show=args.show_samples
    )
    print(json.dumps(result, indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
