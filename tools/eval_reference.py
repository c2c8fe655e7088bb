#!/usr/bin/env python3
"""Word-level accuracy of the full pipeline on the REFERENCE golden images.

Runs the engine (trained weights) on the reference repo's own E2E oracle
images (/root/reference/ocrs-cli/test-data/{why-rust,polar-bears}.png,
harness semantics tools/test-e2e.py:63-79) and scores predicted text against
the checked-in .expected.txt at the word level:

  * multiset precision / recall / F1 over whitespace-split words
    (order-insensitive — layout/read-order differences don't mask
    recognition quality), plus
  * case-insensitive variants, to separate casing errors from misreads.

    python tools/eval_reference.py                       # shipped weights
    python tools/eval_reference.py --detect D.npz --rec R.npz
    python tools/eval_reference.py --show                # dump predictions

Exit code is 0 iff both images reach --min-f1 (default 0.0 so the tool is
usable for measurement; CI tiers pass an explicit threshold).
"""

from __future__ import annotations

import argparse
import json
import sys
from collections import Counter
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
DEFAULT_DATA = Path("/root/reference/ocrs-cli/test-data")
IMAGES = ("why-rust", "polar-bears")


def word_prf(pred: str, expected: str, casefold: bool = False):
    pw = pred.split()
    ew = expected.split()
    if casefold:
        pw = [w.lower() for w in pw]
        ew = [w.lower() for w in ew]
    inter = sum((Counter(pw) & Counter(ew)).values())
    p = inter / len(pw) if pw else 0.0
    r = inter / len(ew) if ew else 0.0
    f1 = 2 * p * r / (p + r) if p + r else 0.0
    return p, r, f1


def build_engine(
    detect: str | None,
    rec: str | None,
    beam: bool,
    postprocess: str | None = None,
    post_res: str | None = None,
    vertical: bool = False,
    min_line_conf: float | None = None,
    rule_glyph: str | None = None,
    detection_word_spaces: bool = False,
):
    from ocrs_tpu.engine import OcrEngine, OcrEngineParams
    from ocrs_tpu.models.weights import load_detection_model, load_recognition_model
    from ocrs_tpu.recognition import BeamSearch, Greedy

    weights_dir = REPO / "weights"
    det = load_detection_model(detect or str(weights_dir / "text-detection.npz"))
    rec = load_recognition_model(rec or str(weights_dir / "text-recognition.npz"))
    kwargs = {}
    if rule_glyph:
        kwargs["rule_glyph"] = rule_glyph
    if detection_word_spaces:
        kwargs["detection_word_spaces"] = True
    if vertical:
        kwargs["vertical_text"] = True
    if postprocess is not None:
        kwargs["detection_postprocess"] = postprocess
    if post_res is not None:
        kwargs["detection_postprocess_resolution"] = post_res
    if min_line_conf is not None:
        kwargs["min_line_confidence"] = min_line_conf
    return OcrEngine(
        OcrEngineParams(
            detection_model=det,
            recognition_model=rec,
            decode_method=BeamSearch(width=100) if beam else Greedy(),
            **kwargs,
        )
    )


def run_image(engine, png_path: Path) -> str:
    import numpy as np
    from PIL import Image

    from ocrs_tpu.preprocess import DimOrder, ImageSource

    img = np.asarray(Image.open(png_path).convert("RGB"))
    inp = engine.prepare_input(ImageSource.from_tensor(img, DimOrder.HWC))
    return engine.get_text(inp)


def build_pipeline(detect: str | None, rec: str | None):
    from ocrs_tpu.engine import DEFAULT_ALPHABET
    from ocrs_tpu.models.weights import (
        load_detection_model,
        load_params,
        load_recognition_model,
    )
    from ocrs_tpu.parallel.pipeline import PagePipeline

    weights_dir = REPO / "weights"
    rec_path = rec or str(weights_dir / "text-recognition.npz")
    _, rec_meta = load_params(rec_path)
    return PagePipeline(
        load_detection_model(detect or str(weights_dir / "text-detection.npz")),
        load_recognition_model(rec_path),
        rec_meta.get("alphabet", DEFAULT_ALPHABET),
    )


def run_image_pipeline(pipeline, png_path: Path) -> str:
    """Score the THROUGHPUT path (PagePipeline, multigrid CCL + pooled
    recognition) on a golden, as a 1-page stack — catches accuracy drift
    between the pooled pipeline and the single-image engine."""
    import numpy as np
    from PIL import Image

    img = np.asarray(Image.open(png_path).convert("RGB"))
    results = pipeline.process(img[None])
    return results[0].text


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--detect", default=None, help="detection weights (.npz)")
    ap.add_argument("--rec", default=None, help="recognition weights (.npz)")
    ap.add_argument("--data", default=str(DEFAULT_DATA), help="golden data dir")
    ap.add_argument("--images", nargs="*", default=list(IMAGES))
    ap.add_argument("--beam", action="store_true", help="beam decode (width 100)")
    ap.add_argument("--show", action="store_true", help="print predicted text")
    ap.add_argument("--min-f1", type=float, default=0.0)
    ap.add_argument(
        "--pipeline",
        action="store_true",
        help="score the multi-page throughput pipeline instead of the engine",
    )
    ap.add_argument(
        "--postprocess",
        default=None,
        choices=["host", "device", "multigrid"],
        help="engine detection postprocess override (engine default: "
        "multigrid; 'host' + --post-res page = reference-exact)",
    )
    ap.add_argument(
        "--post-res",
        default=None,
        choices=["page", "model"],
        help="engine detection postprocess resolution override "
        "(engine default: model)",
    )
    ap.add_argument(
        "--rule-glyph",
        default="[",
        help="reference-parity mode for ink rules: the reference's "
        "HierText-trained pipeline detects heading underline rules and "
        "decodes each as '[' (why-rust golden line 3); this engine skips "
        "rules by default, so the parity eval re-creates that behaviour "
        "via OcrEngineParams.rule_glyph. Pass '' to disable.",
    )
    ap.add_argument(
        "--det-spaces",
        action="store_true",
        help="engine detection_word_spaces: insert missing spaces at "
        "detected word boundaries (recognition.arbitrate_word_gaps)",
    )
    args = ap.parse_args(argv)

    if args.pipeline:
        runner = build_pipeline(args.detect, args.rec)
        run = lambda path: run_image_pipeline(runner, path)
    else:
        engine = build_engine(
            args.detect,
            args.rec,
            args.beam,
            args.postprocess,
            args.post_res,
            rule_glyph=args.rule_glyph or None,
            detection_word_spaces=args.det_spaces,
        )
        run = lambda path: run_image(engine, path)

    data = Path(args.data)
    results = {}
    ok = True
    for name in args.images:
        expected = (data / f"{name}.expected.txt").read_text()
        pred = run(data / f"{name}.png")
        if args.show:
            print(f"--- {name} predicted ---\n{pred}\n---", file=sys.stderr)
        p, r, f1 = word_prf(pred, expected)
        pi, ri, f1i = word_prf(pred, expected, casefold=True)
        # Exact-match tracking (the reference harness's own standard:
        # tools/test-e2e.py:63-79 diffs whitespace-stripped stdout
        # byte-for-byte). Reported, not gated — the word-F1 threshold
        # remains the gate; this makes drift toward/away from exact parity
        # visible per round. char_diff = Levenshtein distance of the
        # stripped strings (0 iff exact_match).
        ps, es = "".join(pred.split()), "".join(expected.split())
        exact = ps == es
        if exact:
            dist = 0
        else:
            dp = list(range(len(es) + 1))
            for i, ch in enumerate(ps, 1):
                prev, dp[0] = dp[0], i
                for j, rch in enumerate(es, 1):
                    cur = dp[j]
                    dp[j] = min(dp[j] + 1, dp[j - 1] + 1, prev + (ch != rch))
                    prev = cur
            dist = dp[-1]
        results[name] = {
            "precision": round(p, 4),
            "recall": round(r, 4),
            "f1": round(f1, 4),
            "precision_ci": round(pi, 4),
            "recall_ci": round(ri, 4),
            "f1_ci": round(f1i, 4),
            "pred_words": len(pred.split()),
            "expected_words": len(expected.split()),
            "exact_match": exact,
            "char_diff": dist,
        }
        ok = ok and f1 >= args.min_f1
    print(json.dumps(results))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.path.insert(0, str(REPO))
    raise SystemExit(main())
