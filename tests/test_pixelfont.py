"""Tests for the procedural pixel font (train.pixelfont) and the round-4
recognition-crop regimes built on it: pixel-font lines, unlabeled
legend-stroke/arrow graphics, and graphics-only empty-label crops."""

import numpy as np

from ocrs_tpu.engine import DEFAULT_ALPHABET
from ocrs_tpu.preprocess import BLACK_VALUE
from ocrs_tpu.train import pixelfont as PF


def test_glyph_coverage_full_alphabet():
    missing = [c for c in DEFAULT_ALPHABET if c != " " and c not in PF._G]
    assert missing == []


def test_glyph_grid_invariants():
    for ch in PF._G:
        g = PF.glyph_array(ch)
        assert g.shape[0] == PF.GRID_ROWS
        assert 1 <= g.shape[1] <= 5, ch
        assert g.any(), f"empty glyph {ch!r}"
        rows = list(PF._G[ch])
        widths = {len(r) for r in rows if r}
        assert len(widths) <= 1, f"ragged rows in {ch!r}"


def test_descenders_only_where_expected():
    """Only descender glyphs use rows below the baseline."""
    descenders = set("gjpqy,;_")
    for ch in PF._G:
        g = PF.glyph_array(ch)
        below = g[PF.BASELINE_ROW :].any()
        if ch in descenders:
            assert below, f"{ch!r} should descend"
        else:
            assert not below, f"{ch!r} unexpectedly descends"


def test_text_bitmap_word_spans():
    bm, spans = PF.text_bitmap("ab cd", letter_space=1, word_space=3)
    assert [s[0] for s in spans] == ["ab", "cd"]
    # Spans tile left to right without overlap.
    (w0, l0, r0), (w1, l1, r1) = spans
    assert l0 < r0 <= l1 < r1 <= bm.shape[1]
    # Ink exists inside each span.
    assert bm[:, l0:r0].any() and bm[:, l1:r1].any()


def test_render_pixel_line_integer_scale_blocks():
    """At integer scale k every ink run is a multiple of k pixels wide."""
    mask, boxes = PF.render_pixel_line("H", scale=3.0)
    assert mask.shape[0] == PF.GRID_ROWS * 3
    g = PF.glyph_array("H")
    up = np.kron(g.astype(np.float32), np.ones((3, 3), np.float32))
    assert np.array_equal(mask[:, : up.shape[1]], up)
    assert boxes and boxes[0][0] == "H"


def test_render_pixel_line_two_level():
    mask, _ = PF.render_pixel_line("pixel font 123", scale=2.5, weight=1)
    assert set(np.unique(mask)) <= {0.0, 1.0}


def test_weight_dilation_monotone():
    g0 = PF._apply_weight(PF.glyph_array("o"), 0)
    g1 = PF._apply_weight(PF.glyph_array("o"), 1)
    g2 = PF._apply_weight(PF.glyph_array("o"), 2)
    assert g1.sum() > g0.sum()
    assert g2.sum() > g1.sum()
    assert (g1 & g0).sum() == g0.sum()  # dilation only adds ink


def test_recognition_sample_pixelfont_regime():
    from ocrs_tpu.train.render import render_recognition_sample

    rng = np.random.default_rng(3)
    for _ in range(4):
        crop, text = render_recognition_sample(rng, 512, pixelfont_prob=1.0)
        assert crop.shape[0] == 64 and crop.shape[1] <= 512
        assert text and all(c in DEFAULT_ALPHABET for c in text)
        # Ink present.
        assert crop.std() > 0.02


def test_recognition_sample_graphics_regime_keeps_label():
    from ocrs_tpu.train.render import render_recognition_sample

    rng = np.random.default_rng(4)
    crop, text = render_recognition_sample(
        rng, 512, blockify_prob=0.0, graphics_prob=1.0
    )
    assert text != ""
    assert crop.shape[0] == 64


def test_graphics_only_sample_empty_label():
    from ocrs_tpu.train.render import _render_graphics_only_sample

    rng = np.random.default_rng(5)
    for _ in range(4):
        crop, text = _render_graphics_only_sample(rng, 512, 64)
        assert text == ""
        assert crop.shape[0] == 64 and crop.shape[1] <= 512
        assert crop.std() > 0.005  # graphics actually drawn


def test_empty_label_batches_zero_length():
    """Deliberately empty samples reach the CTC loss with length 0 (the
    all-blank supervision path), not a forced label."""
    from ocrs_tpu.train.data import recognition_batches

    batches = recognition_batches(
        16, width=256, seed=6, render_kwargs={"empty_prob": 1.0}
    )
    images, labels, lengths = next(batches)
    assert (lengths == 0).all()
    assert (labels == 0).all()
    # And the loss on such a batch is finite.
    import jax.numpy as jnp

    from ocrs_tpu.train.losses import ctc_loss

    lp = jnp.log(jnp.full((8, 16, 97), 1.0 / 97))
    loss = ctc_loss(lp, jnp.asarray(labels), jnp.asarray(lengths))
    assert np.isfinite(float(loss))


def test_native_page_pixelfont_words_on_page():
    from ocrs_tpu.train.render import render_native_page

    rng = np.random.default_rng(7)
    page, words = render_native_page(
        rng, page_hw=(500, 700), pixelfont_prob=1.0, figure_prob=0.0
    )
    assert page.shape == (500, 700)
    assert len(words) >= 1
    for text, (t, l, b, r) in words:
        assert t < b and l < r
        assert all(c in DEFAULT_ALPHABET for c in text)
