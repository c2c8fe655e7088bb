"""Synthetic training data generation.

The reference's models are trained in the external ocrs-models repo on the
HierText dataset (README.md:16-19). A complete framework owns a data path;
since this environment has no dataset access, this module renders synthetic
supervised data with PIL:

  * :func:`render_line` — a normalized text-line image + CTC label sequence
    for recognition training (height 64, variable width).
  * :func:`render_page` — a page image + text mask for detection training.
  * :func:`recognition_batches` — an infinite generator of fixed-shape
    padded batches ready for `train.make_recognition_train_step`.

Real-dataset loaders plug in at the same generator interface.
"""

from __future__ import annotations

from typing import Iterator, Optional, Sequence

import numpy as np

from ..engine import DEFAULT_ALPHABET
from ..preprocess import BLACK_VALUE


def _font(size: int = 48):
    from PIL import ImageFont

    try:
        return ImageFont.truetype("DejaVuSans.ttf", size)
    except Exception:
        return ImageFont.load_default()


def render_line(
    text: str,
    height: int = 64,
    rng: Optional[np.random.Generator] = None,
    invert: bool = False,
) -> np.ndarray:
    """Render `text` as a normalized greyscale line image [height, W]."""
    from PIL import Image, ImageDraw

    font = _font(int(height * 0.7))
    probe = Image.new("L", (8, 8))
    draw = ImageDraw.Draw(probe)
    x0, y0, x1, y1 = draw.textbbox((0, 0), text, font=font)
    w = max(int(x1 - x0) + 12, 10)
    img = Image.new("L", (w, height), 255 if not invert else 0)
    draw = ImageDraw.Draw(img)
    draw.text((6 - x0, (height - (y1 - y0)) // 2 - y0), text, font=font,
              fill=0 if not invert else 255)
    arr = np.asarray(img, dtype=np.float32) / 255.0
    if rng is not None:
        arr = np.clip(arr + rng.normal(0.0, 0.02, arr.shape), 0.0, 1.0)
    return arr + BLACK_VALUE


def labels_for(text: str, alphabet: str = DEFAULT_ALPHABET) -> list[int]:
    """CTC labels: alphabet index + 1 (0 is blank); unknown chars dropped."""
    return [alphabet.index(c) + 1 for c in text if c in alphabet]


def random_text(rng: np.random.Generator, alphabet: str, min_len=3, max_len=18) -> str:
    n = int(rng.integers(min_len, max_len + 1))
    # Weight towards letters/digits for renderability.
    pool = [c for c in alphabet if c.isalnum()] + [" "] * 4
    return "".join(rng.choice(pool) for _ in range(n)).strip() or "a"


def _scale_augment(line: np.ndarray, rng: np.random.Generator) -> np.ndarray:
    """Downscale-then-upscale augmentation: in the OCR pipeline, line crops
    are extracted from pages where text is often much smaller than the 64px
    recognition height, so the model must read blurry upsampled glyphs."""
    from PIL import Image

    h, w = line.shape
    factor = float(rng.uniform(0.35, 1.0))
    if factor > 0.95:
        return line
    small_h = max(int(h * factor), 8)
    small_w = max(int(w * factor), 4)
    img = Image.fromarray(((line - BLACK_VALUE) * 255).astype(np.uint8))
    img = img.resize((small_w, small_h), Image.BILINEAR).resize((w, h), Image.BILINEAR)
    return np.asarray(img, np.float32) / 255.0 + BLACK_VALUE


def _render_pipeline_line(
    rng: np.random.Generator,
    alphabet: str,
    width_budget: int,
    out_h: int = 64,
    max_chars: int = 24,
) -> tuple[np.ndarray, str]:
    """Render a multi-word line and push it through the ACTUAL inference
    crop transform: per-word detection-style rects (expanded, jittered),
    line polygon, polygon-masked crop, aspect-preserving resize
    (ocrs_tpu.recognition.prepare_text_line_host). Training samples then
    match the pipeline's crop distribution exactly — including the black
    polygon-mask wedges where neighbouring word heights differ."""
    from PIL import Image, ImageDraw

    from ..geometry import Rect, RotatedRect
    from ..recognition import line_polygon, prepare_text_line_host, resized_line_width

    # Fonts span the full range of line heights the pipeline produces:
    # small fonts exercise the upscale path, large fonts (line height above
    # the 64px recognition input) the downscale path seen with high-dpi
    # scans.
    font_size = int(rng.integers(14, 100))
    font = _font(font_size)
    canvas_h = font_size * 3 + 24
    canvas_w = 3072
    img = Image.new("L", (canvas_w, canvas_h), 255)
    draw = ImageDraw.Draw(img)
    y = canvas_h // 3
    x = 16
    rects: list[RotatedRect] = []
    texts: list[str] = []
    est_h = font_size + 8
    for _ in range(int(rng.integers(1, 5))):
        word = random_text(rng, alphabet, 2, 8).replace(" ", "") or "a"
        if len(" ".join(texts + [word])) > max_chars:
            break
        x0, y0, x1, y1 = draw.textbbox((x, y), word, font=font)
        # Stop before the resized line overflows the width budget.
        if resized_line_width(x1 - 16 + 6, est_h, out_h) > width_budget:
            break
        draw.text((x, y), word, font=font, fill=0)
        # Detection-style word rect: expanded ~3px with jitter.
        e = float(rng.uniform(2.0, 4.5))
        jx = float(rng.uniform(-1.5, 1.5))
        jy = float(rng.uniform(-1.5, 1.5))
        rects.append(
            RotatedRect.from_rect(
                Rect.from_tlbr(y0 - e + jy, x0 - e + jx, y1 + e + jy, x1 + e + jx)
            )
        )
        texts.append(word)
        x = int(x1) + int(rng.integers(10, 36))
    if not rects:
        draw.text((16, y), "a", font=font, fill=0)
        x0, y0, x1, y1 = draw.textbbox((16, y), "a", font=font)
        rects = [RotatedRect.from_rect(Rect.from_tlbr(y0 - 3, x0 - 3, y1 + 3, x1 + 3))]
        texts = ["a"]

    page = np.asarray(img, np.float32) / 255.0 + BLACK_VALUE
    if rng.random() < 0.3:
        page = np.clip(
            page + rng.normal(0.0, 0.02, page.shape).astype(np.float32),
            BLACK_VALUE,
            BLACK_VALUE + 1.0,
        )
    poly = line_polygon(rects)
    lr_w = float(poly[:, 0].max() - poly[:, 0].min())
    lr_h = float(poly[:, 1].max() - poly[:, 1].min())
    rw = min(resized_line_width(lr_w, lr_h, out_h), width_budget)
    crop = prepare_text_line_host(page[None], poly, rw, out_h)
    return crop, " ".join(texts)


def recognition_batches(
    batch_size: int,
    width: int = 512,
    alphabet: str = DEFAULT_ALPHABET,
    max_label_len: int = 24,
    seed: int = 0,
    augment: bool = False,
) -> Iterator[tuple[np.ndarray, np.ndarray, np.ndarray]]:
    """Infinite generator of (images [B,1,64,width], labels [B,L],
    label_lengths [B]) recognition training batches.

    With ``augment=True`` half the samples go through the pipeline-accurate
    crop transform (detection-style rects + polygon masking + aspect
    resize) and the rest are clean rendered lines with scale augmentation."""
    rng = np.random.default_rng(seed)
    while True:
        images = np.full((batch_size, 1, 64, width), BLACK_VALUE, np.float32)
        labels = np.zeros((batch_size, max_label_len), np.int32)
        lengths = np.zeros((batch_size,), np.int32)
        for i in range(batch_size):
            if augment and rng.random() < 0.6:
                line, text = _render_pipeline_line(
                    rng, alphabet, width, max_chars=max_label_len
                )
            else:
                text = random_text(rng, alphabet)
                line = render_line(text, rng=rng)
                if augment:
                    line = _scale_augment(line, rng)
            lab = labels_for(text, alphabet)[:max_label_len]
            w = min(line.shape[1], width)
            images[i, 0, :, :w] = line[:, :w]
            labels[i, : len(lab)] = lab
            lengths[i] = len(lab)
        yield images, labels, lengths


def render_page(
    rng: np.random.Generator,
    page_hw: tuple[int, int] = (800, 608),
    n_lines: int = 10,
    alphabet: str = DEFAULT_ALPHABET,
    return_words: bool = False,
    font_size: int = 22,
):
    """A normalized page image and its word-level text mask, for detection
    training (BCE+dice over [1, H, W]). With ``return_words`` also returns
    the ground-truth word records ``(text, (t, l, b, r))`` for evaluation."""
    from PIL import Image, ImageDraw

    h, w = page_hw
    img = Image.new("L", (w, h), 255)
    mask = np.zeros((h, w), np.float32)
    draw = ImageDraw.Draw(img)
    font = _font(font_size)
    words_out: list[tuple[str, tuple[int, int, int, int]]] = []
    y = max(20, font_size)
    for _ in range(n_lines):
        if y > h - 2 * font_size:
            break
        x = 20
        for _ in range(int(rng.integers(2, 6))):
            word = random_text(rng, alphabet, 3, 8).replace(" ", "")
            x0, y0, x1, y1 = draw.textbbox((x, y), word, font=font)
            if x1 > w - 20:
                break
            draw.text((x, y), word, font=font, fill=0)
            # Shrunk label mask: the detector is trained to mark a slightly
            # smaller area than the true word box so adjacent words stay
            # separable; post-processing expands rects back (the reference's
            # models are trained the same way — detection.rs:108-117).
            sh = 2
            mask[int(y0) + sh : int(y1) + 1 - sh, int(x0) + sh : int(x1) + 1 - sh] = 1.0
            words_out.append((word, (int(y0), int(x0), int(y1), int(x1))))
            # Inter-word gap scales with the font so the page statistics are
            # resolution-invariant after the detector's fixed-input downscale.
            x = int(x1) + int(rng.integers(max(12, font_size // 2), max(30, int(font_size * 1.4))))
        y += int(rng.integers(int(font_size * 1.8), int(font_size * 3.2)))
    arr = np.asarray(img, np.float32) / 255.0 + BLACK_VALUE
    if return_words:
        return arr[None], mask[None], words_out
    return arr[None], mask[None]


def detection_batches(
    batch_size: int,
    page_hw: tuple[int, int] = (800, 608),
    seed: int = 0,
) -> Iterator[tuple[np.ndarray, np.ndarray]]:
    """Infinite generator of (images [B,1,H,W], masks [B,1,H,W])."""
    rng = np.random.default_rng(seed)
    while True:
        imgs = np.zeros((batch_size, 1, *page_hw), np.float32)
        masks = np.zeros((batch_size, 1, *page_hw), np.float32)
        for i in range(batch_size):
            imgs[i], masks[i] = render_page(rng, page_hw)
        yield imgs, masks
