"""Deskewing line extraction (no reference counterpart: recognition.rs:91-126
only crops axis-aligned boxes, so rotated text reaches the reference's
recognizer slanted; ops.warp.extract_line_batch_rotated resamples along the
line's rotated-rect axes instead)."""

import math

import numpy as np

from ocrs_tpu.engine import OcrEngine, OcrEngineParams
from ocrs_tpu.geometry import Rect, RotatedRect, point
from ocrs_tpu.models.fakes import FakeRecognitionModel
from ocrs_tpu.preprocess import BLACK_VALUE, DimOrder, ImageSource


def _rot_geom(rect: RotatedRect, rwidth: float, page_idx: float = 0.0) -> np.ndarray:
    right = rect.right_axis()
    down = -rect.up
    origin = rect.center - right * (rect.width / 2.0) - down * (rect.height / 2.0)
    g = np.zeros((10, 1), np.float32)
    g[0:2, 0] = origin
    g[2:4, 0] = right
    g[4:6, 0] = down
    g[6, 0] = rect.width
    g[7, 0] = rect.height
    g[8, 0] = rwidth
    g[9, 0] = page_idx
    return g


def _numpy_rotated_extract(page, geom, out_h, out_w):
    """Host oracle for extract_line_batch_rotated's sampling law."""
    ox, oy, rx, ry, dx, dy, w, h, rw, _ = geom[:, 0]
    ph, pw = page.shape
    out = np.full((out_h, out_w), BLACK_VALUE, np.float32)
    for r in range(out_h):
        ly = np.clip((r + 0.5) * h / out_h - 0.5, 0.0, max(h - 1.0, 0.0))
        for c in range(out_w):
            if c >= rw:
                continue
            lx = np.clip((c + 0.5) * w / max(rw, 1.0) - 0.5, 0.0, max(w - 1.0, 0.0))
            px = ox + lx * rx + ly * dx
            py = oy + lx * ry + ly * dy
            if not (0.0 <= px <= pw - 1.0 and 0.0 <= py <= ph - 1.0):
                continue
            x0, y0 = int(np.floor(px)), int(np.floor(py))
            fx, fy = px - x0, py - y0
            x1, y1 = min(x0 + 1, pw - 1), min(y0 + 1, ph - 1)
            out[r, c] = (
                page[y0, x0] * (1 - fy) * (1 - fx)
                + page[y0, x1] * (1 - fy) * fx
                + page[y1, x0] * fy * (1 - fx)
                + page[y1, x1] * fy * fx
            )
    return out


def test_rotated_extract_matches_numpy_oracle():
    import jax.numpy as jnp

    from ocrs_tpu.ops.warp import extract_line_batch_rotated

    rng = np.random.default_rng(0)
    page = rng.uniform(-0.5, 0.5, (80, 120)).astype(np.float32)
    theta = math.radians(12)
    rect = RotatedRect(
        point(60, 40), point(math.sin(theta), -math.cos(theta)), 70, 16
    )
    geom = _rot_geom(rect, rwidth=40.0)
    got = np.asarray(
        extract_line_batch_rotated(jnp.asarray(page), jnp.asarray(geom), out_h=8, out_w=48)
    )[0, 0]
    want = _numpy_rotated_extract(page, geom, 8, 48)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_rotated_extract_recovers_upright_content():
    """A smooth horizontal-stripe pattern painted along a rotated band comes
    back axis-aligned: each deskewed column peaks at the same row."""
    import jax.numpy as jnp

    from ocrs_tpu.ops.warp import extract_line_batch_rotated

    theta = math.radians(9)
    h, w = 64.0, 200.0
    rect = RotatedRect(
        point(150, 150), point(math.sin(theta), -math.cos(theta)), w, h
    )
    right = rect.right_axis()
    down = -rect.up
    origin = rect.center - right * (w / 2.0) - down * (h / 2.0)

    ys, xs = np.mgrid[0:300, 0:300].astype(np.float64)
    rel = np.stack([xs - origin[0], ys - origin[1]], axis=-1)
    lx = rel @ right
    ly = rel @ down
    inside = (lx >= 0) & (lx < w) & (ly >= 0) & (ly < h)
    page = np.where(
        inside, np.exp(-((ly - 20.0) ** 2) / (2 * 2.5**2)), 0.0
    ).astype(np.float32)

    geom = _rot_geom(rect, rwidth=200.0)
    crop = np.asarray(
        extract_line_batch_rotated(
            jnp.asarray(page), jnp.asarray(geom), out_h=64, out_w=200
        )
    )[0, 0]
    peak_rows = crop[:, 5:195].argmax(axis=0)
    assert np.all(np.abs(peak_rows - 20) <= 1), peak_rows


def _stripe_engine():
    from ocrs_tpu.engine import DEFAULT_ALPHABET

    return OcrEngine(
        OcrEngineParams(
            recognition_model=FakeRecognitionModel(),
            alphabet=DEFAULT_ALPHABET[:63],
            deskew=True,
        )
    )


def test_deskew_reads_rotated_stripe():
    """The fake recognizer maps input row k to char alphabet[k-1]. A stripe
    painted at rotated-rect-local row 10 decodes as alphabet[9] ONLY if the
    crop deskews the rotation; the axis-aligned crop smears the stripe
    diagonally across many rows."""
    theta = math.radians(10)
    h, w = 64.0, 200.0
    rect = RotatedRect(
        point(150, 150), point(math.sin(theta), -math.cos(theta)), w, h
    )
    right = rect.right_axis()
    down = -rect.up
    origin = rect.center - right * (w / 2.0) - down * (h / 2.0)
    ys, xs = np.mgrid[0:300, 0:300].astype(np.float64)
    rel = np.stack([xs - origin[0], ys - origin[1]], axis=-1)
    lx = rel @ right
    ly = rel @ down
    inside = (lx >= 0) & (lx < w) & (ly >= 0) & (ly < h)
    page = np.where(
        inside, np.exp(-((ly - 10.0) ** 2) / (2 * 1.5**2)), 0.0
    ).astype(np.float32)

    engine = _stripe_engine()
    inp = engine.prepare_input(
        ImageSource.from_tensor(page[None].astype(np.float32), DimOrder.CHW)
    )
    out = engine.recognize_text(inp, [[rect]])
    assert out[0] is not None
    # Row 10 -> label 10 -> alphabet[9] ("8" in the default alphabet: space
    # then digits); CTC collapses the repeats.
    from ocrs_tpu.engine import DEFAULT_ALPHABET

    assert str(out[0]) == DEFAULT_ALPHABET[9]
    # Char rect maps back near the rotated band, not the page origin.
    br = out[0].bounding_rect()
    assert Rect.from_tlhw(50, 50, 200, 200).intersects(br)


def test_deskew_axis_aligned_matches_default():
    """For axis-aligned lines the rotated rect equals the bounding rect, so
    deskew mode must decode the same text as the default path."""
    image = np.zeros((1, 64, 32), dtype=np.float32)
    image[:, 2, :] = 1.0
    from ocrs_tpu.engine import DEFAULT_ALPHABET

    alpha = DEFAULT_ALPHABET[:63]
    texts = []
    for deskew in (False, True):
        engine = OcrEngine(
            OcrEngineParams(
                recognition_model=FakeRecognitionModel(),
                alphabet=alpha,
                deskew=deskew,
            )
        )
        inp = engine.prepare_input(ImageSource.from_tensor(image, DimOrder.CHW))
        line = [RotatedRect.from_rect(Rect.from_tlhw(0, 0, 64, 32))]
        out = engine.recognize_text(inp, [line])
        assert out[0] is not None
        texts.append(str(out[0]))
    assert texts[0] == texts[1]


def test_pick_direction_variants():
    """Direction voting: higher mean-confidence variant wins; a variant
    decoding >=2 chars beats a near-empty one regardless of confidence."""
    import numpy as np

    from ocrs_tpu.geometry import Rect
    from ocrs_tpu.recognition import _LineResult, _RecLine, _pick_direction_variants

    def rl(index, variant):
        return _RecLine(
            index=index,
            poly=np.zeros((4, 2), np.int64),
            rect=Rect.from_tlbr(0, 0, 10, 10),
            resized_width=100,
            variant=variant,
        )

    def res(index, variant, labels, conf):
        steps = (np.arange(len(labels), dtype=np.int32), np.array(labels, np.int32))
        return _LineResult(rl(index, variant), 100, 25, steps, conf=conf)

    picked = _pick_direction_variants(
        [
            res(0, 0, [5, 6, 7], conf=-0.2),   # readable direction
            res(0, 1, [3, 9, 1], conf=-1.4),   # garbage, lower confidence
            res(1, 0, [2], conf=-0.05),        # confident but near-empty
            res(1, 1, [4, 4, 8], conf=-0.9),   # real decode wins
            _LineResult(rl(2, -1), 100, 25, (np.array([0], np.int32), np.array([1], np.int32))),
        ]
    )
    by_idx = {r.line.index: r for r in picked}
    assert len(picked) == 3
    assert by_idx[0].line.variant == 0
    assert by_idx[1].line.variant == 1
    assert by_idx[2].line.variant == -1
