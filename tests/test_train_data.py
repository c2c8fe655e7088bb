"""Tests for the synthetic training data pipeline + a short real training
run (loss must drop on a fixed batch)."""

import numpy as np
import pytest

from ocrs_tpu.engine import DEFAULT_ALPHABET
from ocrs_tpu.preprocess import BLACK_VALUE
from ocrs_tpu.train.data import (
    detection_batches,
    labels_for,
    recognition_batches,
    render_line,
    render_page,
)


def test_render_line_shape_and_range():
    line = render_line("Hello 123")
    assert line.shape[0] == 64
    assert line.shape[1] >= 10
    assert line.min() >= BLACK_VALUE - 1e-6
    assert line.max() <= BLACK_VALUE + 1.0 + 1e-6
    # Text must actually darken pixels (white bg = +0.5, ink below).
    assert (line < 0.0).sum() > 20


def test_degrade_pixelate_and_binarize():
    """Round-3 bitmap-font regime: pixelate produces constant kxk blocks,
    binarize collapses the page to exactly two gray levels."""
    from ocrs_tpu.train.render import Style, degrade

    rng = np.random.default_rng(0)
    base = rng.uniform(0.2, 0.8, size=(64, 96)).astype(np.float32)
    mk = lambda **kw: Style(
        font_path="", bg=0.9, fg=0.1, alt_fg=None, alt_fg_prob=0.0,
        blur_sigma=0.0, noise_sigma=0.0, jpeg_quality=None,
        contrast=1.0, brightness=0.0, **kw,
    )
    pix = degrade(base, rng, mk(pixelate=2))
    blocks = pix.reshape(32, 2, 48, 2)
    assert np.allclose(blocks, blocks[:, :1, :, :1], atol=1e-6)  # constant 2x2
    binr = degrade(base, rng, mk(binarize=True))
    levels = np.unique(binr)
    assert len(levels) == 2
    np.testing.assert_allclose(levels, [0.1, 0.9], atol=1e-6)


def test_render_blockify_bitmap_font_regime():
    """blockify renders tiny type, snaps to 2 levels, and nearest-upscales:
    before the pipeline resize the canvas must be exactly two gray levels in
    k x k blocks (pixel-font glyph geometry, not smoothed large glyphs).
    After the aspect resize to height 64 the crop must still be a valid
    sample with readable label text."""
    from ocrs_tpu.train.render import render_recognition_sample

    rng = np.random.default_rng(11)
    for _ in range(8):
        crop, text = render_recognition_sample(
            rng, width_budget=768, blockify_prob=1.0
        )
        assert crop.shape[0] == 64 and 10 <= crop.shape[1] <= 768
        assert text.strip()
        assert crop.min() >= BLACK_VALUE - 1e-5
        assert crop.max() <= BLACK_VALUE + 1.0 + 1e-5
    # blockify_prob=0 must leave the regular path untouched (seeded draw
    # count changes only behind the branch).
    crop, text = render_recognition_sample(
        np.random.default_rng(5), width_budget=512, blockify_prob=0.0
    )
    assert crop.shape[0] == 64 and text.strip()


def test_native_page_has_unlabeled_graphics():
    """Distractor graphics (curves/borders/rules) must darken pixels outside
    every labeled word box on at least some pages, and never add labels."""
    from ocrs_tpu.train.render import render_native_page

    rng = np.random.default_rng(5)
    found_outside_ink = False
    for _ in range(8):
        page, words = render_native_page(rng, page_hw=(400, 600))
        mask = np.zeros(page.shape, bool)
        for _, (t, l, b, r) in words:
            mask[max(int(t) - 2, 0) : int(b) + 3, max(int(l) - 2, 0) : int(r) + 3] = True
        outside = page[~mask]
        if outside.size and (np.abs(outside - np.median(outside)) > 0.2).sum() > 50:
            found_outside_ink = True
    assert found_outside_ink


def test_labels_for():
    labs = labels_for("0a", DEFAULT_ALPHABET)
    assert labs == [DEFAULT_ALPHABET.index("0") + 1, DEFAULT_ALPHABET.index("a") + 1]
    assert labels_for("ሴ", DEFAULT_ALPHABET) == []  # unknown dropped


def test_sample_word_capital_number_pattern():
    """The confusable branch emits "A 2010"-style compound tokens (single
    capital, internal space, number) — the goldens' missing-space class.
    The space must survive into the token so line labels carry it."""
    import re

    from ocrs_tpu.train.render import sample_word

    rng = np.random.default_rng(5)
    hits = 0
    for _ in range(4000):
        w = sample_word(rng)
        if re.fullmatch(r"[AIOX] \d+\D{0,2}", w):
            hits += 1
    assert hits > 5, hits


def test_recognition_batches_shapes():
    gen = recognition_batches(4, width=128, max_label_len=8, seed=1)
    images, labels, lengths = next(gen)
    assert images.shape == (4, 1, 64, 128)
    assert labels.shape == (4, 8)
    assert lengths.shape == (4,)
    assert (lengths > 0).all()
    assert (labels[np.arange(4), 0] > 0).all()


def test_render_page_mask_alignment():
    rng = np.random.default_rng(0)
    img, mask = render_page(rng, page_hw=(200, 300), n_lines=3)
    assert img.shape == (1, 200, 300) and mask.shape == (1, 200, 300)
    ink = img[0] < 0.0
    # The label mask is deliberately SHRUNK relative to the word boxes (the
    # under-segmentation training design, detection.rs:108-117), so it covers
    # the word cores, not every ink pixel; and every mask pixel must be near
    # ink (inside a word box).
    assert (ink & (mask[0] > 0)).sum() >= 0.4 * ink.sum()
    from scipy import ndimage

    near_ink = ndimage.binary_dilation(ink, iterations=8)
    assert ((mask[0] > 0) & ~near_ink).sum() <= 0.1 * (mask[0] > 0).sum()


def test_recognition_training_reduces_loss():
    import jax
    import optax

    from ocrs_tpu.train.train import (
        init_recognition_state,
        make_mesh,
        make_recognition_train_step,
        shard_batch,
    )

    mesh = make_mesh(1)
    opt = optax.adam(1e-3)
    with mesh:
        state = init_recognition_state(mesh, opt, n_classes=97, hidden=32)
        step = make_recognition_train_step(mesh, opt)
        images, labels, lengths = next(recognition_batches(4, width=128, seed=3))
        batch = shard_batch(mesh, *map(np.asarray, (images, labels, lengths)))
        first = None
        for _ in range(8):
            state, loss = step(state, *batch)
            first = float(loss) if first is None else first
        assert float(loss) < first


def test_skip_glyphs_drawn_but_unlabeled():
    """Out-of-alphabet glyphs (em dash, bullet, ...) are rendered between
    words but never reach the label: the recognizer trains to emit nothing
    for them (the reference's why-rust golden drops the em dash in
    "thread-safety — enabling")."""
    from PIL import Image, ImageDraw

    from ocrs_tpu.train.render import (
        DEFAULT_ALPHABET as ALPH,
        draw_line_of_words,
        get_font,
        sample_style,
    )

    rng = np.random.default_rng(11)
    style = sample_style(rng)
    font = get_font(style.font_path, 28)
    img = Image.new("L", (1600, 90), int(round(style.bg * 255)))
    draw = ImageDraw.Draw(img)
    boxes = draw_line_of_words(
        draw, rng, style, font, x=10.0, y=20.0, max_x=1580.0, max_words=6,
        superscript_prob=0.0, skip_glyph_prob=1.0,
    )
    assert len(boxes) >= 2
    for wb in boxes:
        assert all(c in ALPH for c in wb.text), wb.text
    # Ink must exist in at least one inter-word gap (the drawn skip glyph).
    arr = np.asarray(img, np.float32) / 255.0
    ink = abs(arr - style.bg) > abs(style.fg - style.bg) * 0.5
    gap_ink = 0
    for a, b in zip(boxes, boxes[1:]):
        l = int(np.ceil(a.box[3])) + 2
        r = int(b.box[1]) - 2
        if r > l:
            gap_ink += int(ink[:, l:r].sum())
    assert gap_ink > 0
