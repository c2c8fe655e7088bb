#!/usr/bin/env python3
"""Accuracy on pages rendered through paths the TRAINING renderer never
touches — the anti-circularity eval (VERDICT r2 "what's missing" #2).

The training data comes from ocrs_tpu/train/render.py (PIL rasterizer,
fixed font bank). Held-out pages from that same renderer measure the
renderer, not OCR. This tool renders ~12 pages through three independent
paths and scores the shipped engine on them with the same word-multiset
P/R/F1 semantics as tools/eval_reference.py (reference harness
tools/test-e2e.py:63-79):

  * ``matplotlib`` — Agg backend: matplotlib's own text layout + FreeType
    rasterization path (figure text, titles, annotations, axis labels,
    legend) — a different engine end-to-end even where font FILES overlap;
  * ``pygame`` — SDL_ttf rasterization of page-like text layouts;
  * ``heldout-font`` — PIL pages set in Minecraft.ttf (a blocky pixel
    face), the only full-alphabet-coverage font on this system that is NOT
    in the training bank (train/render.py _FONT_CANDIDATES);

    python tools/eval_independent.py                 # run + score
    python tools/eval_independent.py --save-dir DIR  # also dump PNGs
    python tools/eval_independent.py --min-f1 0.85   # CI gate
"""

from __future__ import annotations

import argparse
import json
import sys
from collections import Counter
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

MINECRAFT = (
    "/opt/venv/lib/python3.12/site-packages/pettingzoo/classic/rps/font/"
    "Minecraft.ttf"
)

# Fixed prose: realistic mixed-case sentences, numbers and punctuation kept
# inside the default alphabet. Plain module constants so the ground truth is
# reviewable.
PARAGRAPHS = [
    "The quick brown fox jumps over the lazy dog while twelve boxers "
    "juggle bright vases.",
    "Machine learning systems convert large datasets into compact models "
    "that generalize to unseen inputs.",
    "In 1969 the crew of Apollo 11 landed on the Moon and returned safely "
    "to Earth after eight days.",
    "Compilers translate source code into machine instructions through "
    "parsing, optimization and code generation.",
    "A hash table offers constant time lookups on average but degrades "
    "when many keys collide in one bucket.",
    "The recipe calls for 250 grams of flour, two eggs, a pinch of salt "
    "and exactly 40 minutes in the oven.",
    "Networks route packets across links of varying bandwidth, latency "
    "and loss using shortest path algorithms.",
    "Glaciers carve deep valleys over thousands of years, leaving moraines "
    "and polished granite behind.",
]

TITLES = [
    "Quarterly Report 2024",
    "System Design Overview",
    "Field Notes and Observations",
    "Measurement Results",
]


def word_prf(pred: str, expected: str):
    pw, ew = pred.split(), expected.split()
    inter = sum((Counter(pw) & Counter(ew)).values())
    p = inter / len(pw) if pw else 0.0
    r = inter / len(ew) if ew else 0.0
    return p, r, (2 * p * r / (p + r) if p + r else 0.0)


def _wrap(text: str, width: int) -> list[str]:
    import textwrap

    return textwrap.wrap(text, width)


# ---------------------------------------------------------------------------
# Path 1: matplotlib (Agg) figures
# ---------------------------------------------------------------------------


def render_matplotlib(seed: int) -> list[tuple[np.ndarray, str]]:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    pages = []
    rng = np.random.default_rng(seed)

    # Page A: text-heavy "document" figure: title + wrapped paragraphs.
    fig = plt.figure(figsize=(8, 10), dpi=160)
    words = []
    title = TITLES[0]
    fig.text(0.08, 0.94, title, fontsize=19, fontweight="bold")
    words += title.split()
    y = 0.87
    for para in PARAGRAPHS[:4]:
        for line in _wrap(para, 54):
            fig.text(0.08, y, line, fontsize=12.5)
            words += line.split()
            y -= 0.033
        y -= 0.018
    canvas = fig.canvas
    canvas.draw()
    buf = np.asarray(canvas.buffer_rgba())[..., :3].copy()
    plt.close(fig)
    pages.append((buf, " ".join(words)))

    # Page B: a labelled plot — title, axis labels, legend, annotations.
    fig, ax = plt.subplots(figsize=(8, 6), dpi=160)
    x = np.linspace(0, 10, 50)
    ax.plot(x, np.sin(x), label="measured signal")
    ax.plot(x, np.cos(x), label="reference curve")
    ax.set_title("Sensor drift across the test window", fontsize=16)
    ax.set_xlabel("elapsed time in hours", fontsize=13)
    ax.set_ylabel("normalized amplitude", fontsize=13)
    ax.legend(fontsize=12)
    ax.annotate(
        "calibration point",
        xy=(5, 0),
        xytext=(6.0, 0.62),
        fontsize=12,
        arrowprops={"arrowstyle": "->"},
    )
    ax.set_xticks([])  # tick digits are below detectable size at this dpi
    ax.set_yticks([])
    words = (
        "Sensor drift across the test window".split()
        + "elapsed time in hours".split()
        + "normalized amplitude".split()
        + "measured signal".split()
        + "reference curve".split()
        + "calibration point".split()
    )
    canvas = fig.canvas
    canvas.draw()
    buf = np.asarray(canvas.buffer_rgba())[..., :3].copy()
    plt.close(fig)
    pages.append((buf, " ".join(words)))

    # Page C: two-column text figure with varied sizes/styles.
    fig = plt.figure(figsize=(10, 7), dpi=160)
    words = []
    fig.text(0.06, 0.92, TITLES[1], fontsize=18, fontweight="bold")
    words += TITLES[1].split()
    for col, x0 in enumerate((0.06, 0.54)):
        y = 0.83
        for para in PARAGRAPHS[4 + 2 * col : 6 + 2 * col]:
            for line in _wrap(para, 38):
                fig.text(x0, y, line, fontsize=11.5, style="italic" if col else "normal")
                words += line.split()
                y -= 0.04
            y -= 0.02
    del rng
    canvas = fig.canvas
    canvas.draw()
    buf = np.asarray(canvas.buffer_rgba())[..., :3].copy()
    plt.close(fig)
    pages.append((buf, " ".join(words)))

    # Page D: a simple table.
    fig, ax = plt.subplots(figsize=(8, 5), dpi=160)
    ax.axis("off")
    cells = [
        ["metric", "value", "unit"],
        ["throughput", "67", "pages"],
        ["latency", "260", "ms"],
        ["accuracy", "0.95", "F1"],
    ]
    table = ax.table(cellText=cells, loc="center", cellLoc="left")
    table.auto_set_font_size(False)
    table.set_fontsize(15)
    table.scale(1.0, 2.2)
    ax.set_title(TITLES[3], fontsize=16, pad=18)
    words = TITLES[3].split() + [w for row in cells for c in row for w in c.split()]
    canvas = fig.canvas
    canvas.draw()
    buf = np.asarray(canvas.buffer_rgba())[..., :3].copy()
    plt.close(fig)
    pages.append((buf, " ".join(words)))

    return pages


# ---------------------------------------------------------------------------
# Path 2: pygame (SDL_ttf)
# ---------------------------------------------------------------------------


def render_pygame(seed: int) -> list[tuple[np.ndarray, str]]:
    import os

    os.environ.setdefault("SDL_VIDEODRIVER", "dummy")
    import pygame

    pygame.font.init()
    # SDL_ttf rasterization; the font FILES overlap the training bank for
    # two pages (rasterizer independence) and pages use distinct sizes.
    faces = [
        ("/usr/share/fonts/truetype/dejavu/DejaVuSerif.ttf", 26),
        ("/usr/share/fonts/truetype/dejavu/DejaVuSans.ttf", 22),
        (None, 24),  # pygame default face (freesansbold)
    ]
    pages = []
    rng = np.random.default_rng(seed)
    for face, size in faces:
        font = pygame.font.Font(face, size)
        surf = pygame.Surface((1400, 1000))
        surf.fill((255, 255, 255))
        y = 40
        words = []
        paras = list(PARAGRAPHS)
        rng.shuffle(paras)
        for para in paras[:4]:
            for line in _wrap(para, 70):
                img = font.render(line, True, (10, 10, 10))
                surf.blit(img, (50, y))
                words += line.split()
                y += int(size * 1.6)
            y += int(size * 0.8)
        arr = np.transpose(pygame.surfarray.array3d(surf), (1, 0, 2)).copy()
        pages.append((arr, " ".join(words)))
    return pages


# ---------------------------------------------------------------------------
# Path 3: PIL + held-out font (Minecraft.ttf)
# ---------------------------------------------------------------------------


def render_heldout_font(seed: int) -> list[tuple[np.ndarray, str]]:
    from PIL import Image, ImageDraw, ImageFont

    if not Path(MINECRAFT).exists():
        return []
    pages = []
    rng = np.random.default_rng(seed)
    for k, size in enumerate((28, 36)):
        font = ImageFont.truetype(MINECRAFT, size)
        img = Image.new("RGB", (1500, 1100), (250, 250, 250))
        draw = ImageDraw.Draw(img)
        y = 50
        words = []
        paras = list(PARAGRAPHS)
        rng.shuffle(paras)
        for para in paras[: 3 + k]:
            for line in _wrap(para, 60):
                draw.text((60, y), line, fill=(15, 15, 15), font=font)
                words += line.split()
                y += int(size * 1.7)
            y += size
        pages.append((np.asarray(img).copy(), " ".join(words)))
    return pages


# ---------------------------------------------------------------------------


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--detect", default=None)
    ap.add_argument("--rec", default=None)
    ap.add_argument("--min-f1", type=float, default=0.0, help="gate on overall F1")
    ap.add_argument(
        "--min-line-conf",
        type=float,
        default=0.45,
        help="engine min_line_confidence (drops graphics-stroke glyph soup "
        "on the figure pages; 0 disables)",
    )
    ap.add_argument("--save-dir", default=None, help="dump rendered PNGs")
    ap.add_argument("--show", action="store_true", help="print predictions")
    args = ap.parse_args(argv)

    from eval_reference import build_engine, word_prf as _  # noqa: F401 - same semantics

    # vertical_text: figure pages carry 90°-rotated axis labels (the
    # matplotlib page's ylabel); the engine feature exists for exactly this.
    engine = build_engine(
        args.detect,
        args.rec,
        beam=False,
        vertical=True,
        min_line_conf=args.min_line_conf or None,
    )

    from ocrs_tpu.preprocess import DimOrder, ImageSource

    groups = {
        "matplotlib": render_matplotlib(0),
        "pygame": render_pygame(1),
        "heldout-font": render_heldout_font(2),
    }
    results = {}
    n_inter = n_pred = n_exp = 0
    for group, pages in groups.items():
        g_scores = []
        for i, (img, expected) in enumerate(pages):
            if args.save_dir:
                from PIL import Image

                out = Path(args.save_dir)
                out.mkdir(parents=True, exist_ok=True)
                Image.fromarray(img).save(out / f"{group}-{i}.png")
            inp = engine.prepare_input(ImageSource.from_tensor(img, DimOrder.HWC))
            pred = engine.get_text(inp)
            if args.show:
                print(f"--- {group}-{i} ---\n{pred}\n---", file=sys.stderr)
            p, r, f1 = word_prf(pred, expected)
            inter = sum((Counter(pred.split()) & Counter(expected.split())).values())
            n_inter += inter
            n_pred += len(pred.split())
            n_exp += len(expected.split())
            g_scores.append({"precision": round(p, 4), "recall": round(r, 4), "f1": round(f1, 4)})
        results[group] = g_scores
    p = n_inter / n_pred if n_pred else 0.0
    r = n_inter / n_exp if n_exp else 0.0
    overall = 2 * p * r / (p + r) if p + r else 0.0
    results["overall"] = {
        "precision": round(p, 4),
        "recall": round(r, 4),
        "f1": round(overall, 4),
        "pages": sum(len(v) for k, v in results.items() if k != "overall"),
    }
    print(json.dumps(results))
    return 0 if overall >= args.min_f1 else 1


if __name__ == "__main__":
    raise SystemExit(main())
