"""Unit tests for the device ops against host oracles."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ocrs_tpu.geometry import Rect, RotatedRect
from ocrs_tpu.ops.connected_components import (
    compact_labels_host,
    label_components_device,
    label_components_host,
)
from ocrs_tpu.ops.ctc import CtcStep, beam_decode, collapse_greedy, collapse_greedy_batch
from ocrs_tpu.ops.rects import rects_from_mask_device
from ocrs_tpu.ops.resize import resize_bilinear
from ocrs_tpu.ops.warp import extract_line_batch, pad_chain
from ocrs_tpu.preprocess import BLACK_VALUE
from ocrs_tpu.recognition import line_polygon, prepare_text_line_host


# ---------------------------------------------------------------------------
# resize
# ---------------------------------------------------------------------------


def test_resize_bilinear_identity_and_scale():
    img = jnp.arange(24, dtype=jnp.float32).reshape(4, 6)
    out = resize_bilinear(img, (4, 6))
    np.testing.assert_allclose(np.asarray(out), np.asarray(img))
    up = resize_bilinear(img, (8, 12))
    assert up.shape == (8, 12)
    # Half-pixel convention: corners map near original corner values.
    assert abs(float(up[0, 0]) - 0.0) < 1.0
    assert abs(float(up[-1, -1]) - 23.0) < 1.0


def test_resize_matches_manual_half_pixel():
    rng = np.random.default_rng(0)
    img = rng.random((5, 7)).astype(np.float32)
    out = np.asarray(resize_bilinear(jnp.asarray(img), (3, 4)))

    def sample(y, x):
        sy = (y + 0.5) * 5 / 3 - 0.5
        sx = (x + 0.5) * 7 / 4 - 0.5
        y0 = int(np.floor(sy)); x0 = int(np.floor(sx))
        fy = sy - y0; fx = sx - x0
        y0c = np.clip([y0, y0 + 1], 0, 4); x0c = np.clip([x0, x0 + 1], 0, 6)
        return (
            img[y0c[0], x0c[0]] * (1 - fy) * (1 - fx)
            + img[y0c[0], x0c[1]] * (1 - fy) * fx
            + img[y0c[1], x0c[0]] * fy * (1 - fx)
            + img[y0c[1], x0c[1]] * fy * fx
        )

    manual = np.array([[sample(y, x) for x in range(4)] for y in range(3)])
    np.testing.assert_allclose(out, manual, rtol=1e-5, atol=1e-6)


# ---------------------------------------------------------------------------
# connected components
# ---------------------------------------------------------------------------


def _random_blob_mask(seed, hw=(64, 96), n_blobs=6):
    rng = np.random.default_rng(seed)
    mask = np.zeros(hw, dtype=bool)
    for _ in range(n_blobs):
        y = rng.integers(0, hw[0] - 12)
        x = rng.integers(0, hw[1] - 24)
        mask[y : y + rng.integers(4, 12), x : x + rng.integers(8, 24)] = True
    return mask


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_device_ccl_matches_scipy(seed):
    mask = _random_blob_mask(seed)
    dev = np.asarray(label_components_device(jnp.asarray(mask)))
    dev_compact, dev_count = compact_labels_host(dev)
    host, host_count = label_components_host(mask)
    assert dev_count == host_count
    # Same partition: label images must be identical up to renumbering.
    pairs = set(zip(dev_compact.ravel().tolist(), host.ravel().tolist()))
    assert len(pairs) == host_count + 1  # bijection incl. background


def test_device_ccl_diagonal_connectivity():
    mask = np.zeros((8, 8), dtype=bool)
    mask[1, 1] = mask[2, 2] = mask[3, 3] = True  # diagonal chain = 1 component
    dev = np.asarray(label_components_device(jnp.asarray(mask)))
    labs = dev[mask]
    assert (labs == labs[0]).all()


def test_device_rects_vs_host_on_rotated_blob():
    from ocrs_tpu.detection import rects_from_mask_host

    # Rasterize a rotated rectangle.
    mask = np.zeros((120, 160), dtype=bool)
    yy, xx = np.mgrid[0:120, 0:160]
    theta = np.deg2rad(20)
    u = (xx - 80) * np.cos(theta) + (yy - 60) * np.sin(theta)
    v = -(xx - 80) * np.sin(theta) + (yy - 60) * np.cos(theta)
    mask[(np.abs(u) < 40) & (np.abs(v) < 10)] = True

    dev = rects_from_mask_device(jnp.asarray(mask), 0.0, 0.0)
    host = rects_from_mask_host(mask, 0.0, 0.0)
    assert len(dev) == len(host) == 1
    d, h = dev[0], host[0]
    assert np.allclose(sorted([d.width, d.height]), sorted([h.width, h.height]), atol=0.5)
    assert np.allclose(d.center, h.center, atol=0.5)


def test_device_rects_component_overflow_keeps_kept_rects_exact():
    """When a mask has more components than max_components, the kept rects
    must stay correct (the last kept one must NOT absorb the dropped
    components' points) and the overflow must be reported."""
    from ocrs_tpu.ops.connected_components import label_components_device
    from ocrs_tpu.ops.rects import min_area_rects_device

    mask = np.zeros((16, 64), dtype=bool)
    for i in range(5):  # five 3x3 blobs spaced 12px apart
        mask[4:7, 2 + 12 * i : 5 + 12 * i] = True
    labels = label_components_device(jnp.asarray(mask), solidify=False)
    table = jax.device_get(min_area_rects_device(labels, max_components=3))
    assert int(table["dropped"]) == 2
    kept = [i for i in range(3) if table["valid"][i]]
    assert len(kept) == 3
    for i in kept:
        # Every kept rect must span exactly its own 3x3 blob (extent 2.0 of
        # pixel centres), not a 17px-wide union with the dropped blobs.
        assert float(table["w"][i]) <= 3.0, table
        assert float(table["h"][i]) <= 3.0, table


# ---------------------------------------------------------------------------
# warp / line extraction
# ---------------------------------------------------------------------------


def test_extract_line_batch_matches_host_oracle():
    rng = np.random.default_rng(0)
    page = rng.random((100, 200)).astype(np.float32) - 0.5
    words = [
        RotatedRect.from_rect(Rect.from_tlhw(20, 10, 30, 60)),
        RotatedRect.from_rect(Rect.from_tlhw(22, 80, 28, 70)),
    ]
    poly = line_polygon(words)
    rect = Rect.from_tlbr(
        poly[:, 1].min(), poly[:, 0].min(), poly[:, 1].max(), poly[:, 0].max()
    )
    out_h, rw = 32, 128

    host = prepare_text_line_host(page[None], poly, rw, out_h)

    half = len(poly) // 2
    crops = extract_line_batch(
        jnp.asarray(page),
        jnp.asarray([rect.top], jnp.float32),
        jnp.asarray([rect.left], jnp.float32),
        jnp.asarray([rect.height], jnp.float32),
        jnp.asarray([rect.width], jnp.float32),
        jnp.asarray([rw], jnp.float32),
        jnp.asarray(pad_chain(poly[:half], 16)[None]),
        jnp.asarray(pad_chain(poly[half:][::-1], 16)[None]),
        out_h=out_h,
        out_w=rw,
    )
    dev = np.asarray(crops[0, 0])
    assert dev.shape == host.shape
    # The device path masks post-resample, the host oracle pre-resample:
    # interior pixels must match tightly; boundary pixels may differ.
    diff = np.abs(dev - host)
    assert np.median(diff) < 1e-3
    assert (diff < 0.05).mean() > 0.9


def test_extract_line_batch_pads_black():
    page = jnp.zeros((50, 60), jnp.float32)
    poly = line_polygon([RotatedRect.from_rect(Rect.from_tlhw(0, 0, 50, 60))])
    half = len(poly) // 2
    crops = extract_line_batch(
        page,
        jnp.asarray([0.0]),
        jnp.asarray([0.0]),
        jnp.asarray([50.0]),
        jnp.asarray([60.0]),
        jnp.asarray([40.0]),  # resized width < out_w
        jnp.asarray(pad_chain(poly[:half], 8)[None]),
        jnp.asarray(pad_chain(poly[half:][::-1], 8)[None]),
        out_h=32,
        out_w=64,
    )
    out = np.asarray(crops[0, 0])
    np.testing.assert_allclose(out[:, 40:], BLACK_VALUE)


# ---------------------------------------------------------------------------
# CTC
# ---------------------------------------------------------------------------


def test_collapse_greedy():
    labels = np.array([0, 3, 3, 0, 3, 5, 5, 0, 0, 1])
    steps = collapse_greedy(labels)
    assert [(s.pos, s.label) for s in steps] == [(1, 3), (4, 3), (5, 5), (9, 1)]


def test_collapse_greedy_batch_matches_scalar():
    rng = np.random.default_rng(0)
    labels = rng.integers(0, 4, size=(5, 37)).astype(np.int32)
    batch = collapse_greedy_batch(labels)
    for i in range(5):
        assert batch[i] == collapse_greedy(labels[i])


def test_beam_decode_matches_greedy_on_peaked_dist():
    # With near-one-hot probabilities beam search must agree with greedy.
    t, c = 12, 6
    rng = np.random.default_rng(1)
    labels = rng.integers(0, c, size=t)
    logits = np.full((t, c), -20.0)
    logits[np.arange(t), labels] = 0.0
    logprobs = logits - np.log(np.exp(logits).sum(-1, keepdims=True))
    greedy = collapse_greedy(labels)
    beam = beam_decode(logprobs, beam_width=8)
    assert [s.label for s in beam] == [s.label for s in greedy]
    assert [s.pos for s in beam] == [s.pos for s in greedy]


def test_beam_decode_merges_prefixes():
    # Classic case where beam search beats greedy: the blank-heavy path hides
    # a higher-probability merged prefix.
    # p(a at t0)=0.4, p(blank t0)=0.6; p(a t1)=0.4, p(blank t1)=0.6
    # Greedy decodes "" (blank, blank); total p("a") = 0.4*0.6+0.6*0.4+0.4*0.4
    # = 0.64 > p("") = 0.36, so beam returns "a".
    p = np.array([[0.6, 0.4], [0.6, 0.4]])
    logprobs = np.log(p)
    greedy = collapse_greedy(np.argmax(p, axis=1))
    assert greedy == []
    beam = beam_decode(logprobs, beam_width=4)
    assert [s.label for s in beam] == [1]


def test_beam_decode_excluded():
    p = np.array([[0.1, 0.5, 0.4], [0.1, 0.5, 0.4]])
    beam = beam_decode(np.log(p), beam_width=4, excluded=[1])
    assert [s.label for s in beam] == [2]


def test_beam_batch_native_matches_python_oracle():
    """C++ oc_ctc_beam vs the Python prefix beam on random soft logits:
    same labels AND same emission positions for every line (the positions
    feed char-rect back-mapping, so they are part of the contract)."""
    from ocrs_tpu import native
    from ocrs_tpu.ops.ctc import beam_decode_batch, beam_decode_batch_arrays

    if not native.available():
        import pytest

        pytest.skip("native library unavailable")

    rng = np.random.default_rng(7)
    n, t, c = 16, 40, 13
    # Soft random distributions (temperature ~1): many near-ties between
    # paths, the regime where prefix merging actually matters.
    logits = rng.normal(size=(n, t, c)).astype(np.float32)
    logprobs = logits - np.log(np.exp(logits).sum(-1, keepdims=True))
    for width in (1, 4, 8):
        got = beam_decode_batch(logprobs, width)
        for i in range(n):
            want = beam_decode(logprobs[i], width)
            assert [(s.pos, s.label) for s in got[i]] == [
                (s.pos, s.label) for s in want
            ], f"line {i} width {width}"
    # Excluded labels propagate into the kernel.
    got = beam_decode_batch(logprobs, 4, excluded=[2, 5])
    for i in range(n):
        assert all(s.label not in (2, 5) for s in got[i])
    # Array-pair variant agrees with the step-object variant.
    pairs = beam_decode_batch_arrays(logprobs, 4)
    got = beam_decode_batch(logprobs, 4)
    for i in range(n):
        assert pairs[i][0].tolist() == [s.pos for s in got[i]]
        assert pairs[i][1].tolist() == [s.label for s in got[i]]


def test_beam_native_width100_matches_python_oracle():
    """Width 100 — the CLI's real --beam (main.rs:403-407) — against the
    Python oracle at an alphabet-sized class count. This is the regime where
    the C++ kernel's threshold pruning does nearly all the work (it skips
    >95% of candidate extensions per frame), so exact agreement here proves
    the pruning is lossless, not approximate."""
    from ocrs_tpu import native
    from ocrs_tpu.ops.ctc import beam_decode_batch

    if not native.available():
        import pytest

        pytest.skip("native library unavailable")

    rng = np.random.default_rng(23)
    n, t, c = 3, 24, 97
    logits = rng.normal(size=(n, t, c)).astype(np.float32)
    logprobs = logits - np.log(np.exp(logits).sum(-1, keepdims=True))
    got = beam_decode_batch(logprobs, 100)
    for i in range(n):
        want = beam_decode(logprobs[i], 100)
        assert [(s.pos, s.label) for s in got[i]] == [
            (s.pos, s.label) for s in want
        ], f"line {i}"


def test_beam_candidate_cap_neutral_on_peaked_logits():
    """The device readback path caps per-frame candidates at
    BEAM_CANDIDATE_CAP (8) even for width-100 beams. On realistically
    peaked emissions (trained recognizers put >0.99 mass in the top few
    classes) the capped decode must equal the full-width oracle — the cap
    trades bytes for nothing, not accuracy."""
    from ocrs_tpu.ops.ctc import (
        beam_candidate_k,
        beam_decode_topk,
        beam_topk,
    )

    rng = np.random.default_rng(5)
    n, t, c = 6, 28, 97
    # Peaked: sharpen random logits by 5x (typical trained CTC heads are
    # sharper still).
    logits = (rng.normal(size=(n, t, c)) * 5.0).astype(np.float32)
    logprobs = logits - np.log(np.exp(logits).sum(-1, keepdims=True))
    k = beam_candidate_k(100, c)
    assert k == 8
    vals, idx = beam_topk(jnp.asarray(logprobs), k=k)
    got = beam_decode_topk(np.asarray(vals), np.asarray(idx), 100, c)
    for i in range(n):
        want = beam_decode(logprobs[i], 100)  # full-matrix oracle, uncapped
        assert [(s.pos, s.label) for s in got[i]] == [
            (s.pos, s.label) for s in want
        ], f"line {i}"


def test_beam_topk_python_fallback_matches_native(monkeypatch):
    """With the native library unavailable, beam_decode_topk reconstructs a
    sparse full matrix and runs the Python beam — same answers."""
    from ocrs_tpu import native
    from ocrs_tpu.ops.ctc import beam_decode_topk, beam_topk

    rng = np.random.default_rng(3)
    n, t, c = 4, 20, 9
    logits = rng.normal(size=(n, t, c)).astype(np.float32)
    lp = logits - np.log(np.exp(logits).sum(-1, keepdims=True))
    vals, idx = map(np.asarray, beam_topk(jnp.asarray(lp), k=8))
    want = beam_decode_topk(vals, idx, 4, c)
    monkeypatch.setattr(native, "ctc_beam_topk", lambda *a, **k: None)
    got = beam_decode_topk(vals, idx, 4, c)
    for i in range(n):
        assert [(s.pos, s.label) for s in got[i]] == [(s.pos, s.label) for s in want[i]]


def test_beam_topk_device_path_matches_oracle():
    """Device lax.top_k readback -> C++ beam == Python oracle on the full
    matrix (the oracle's own per-frame pruning makes top-k exact)."""
    from ocrs_tpu.ops.ctc import beam_decode_topk, beam_decode_topk_arrays, beam_topk

    rng = np.random.default_rng(11)
    n, t, c = 8, 32, 11
    logits = rng.normal(size=(n, t, c)).astype(np.float32)
    logprobs = logits - np.log(np.exp(logits).sum(-1, keepdims=True))
    from ocrs_tpu.ops.ctc import beam_topk_packed, unpack_topk

    for width in (2, 8):
        k = min(max(width, 8), c)
        vals, idx = beam_topk(jnp.asarray(logprobs), k=k)
        # Packed single-readback form round-trips exactly.
        pv, pi = unpack_topk(np.asarray(beam_topk_packed(jnp.asarray(logprobs), k=k)), k)
        np.testing.assert_array_equal(pv, np.asarray(vals))
        np.testing.assert_array_equal(pi, np.asarray(idx).astype(np.int32))
        got = beam_decode_topk(np.asarray(vals), np.asarray(idx), width, c)
        for i in range(n):
            want = beam_decode(logprobs[i], width)
            assert [(s.pos, s.label) for s in got[i]] == [
                (s.pos, s.label) for s in want
            ], f"line {i} width {width}"
        pairs = beam_decode_topk_arrays(np.asarray(vals), np.asarray(idx), width, c)
        for i in range(n):
            assert pairs[i][1].tolist() == [s.label for s in got[i]]


# ---------------------------------------------------------------------------
# Pallas GRU (interpret mode on CPU; compiled on TPU)
# ---------------------------------------------------------------------------


def test_pallas_gru_matches_scan():
    import jax

    from ocrs_tpu.models import nn
    from ocrs_tpu.ops.gru_pallas import gru_apply_pallas

    params = nn.gru_init(jax.random.key(0), 24, 32)
    x = jax.random.normal(jax.random.key(1), (4, 17, 24), jnp.float32)
    for reverse in (False, True):
        ref = nn.gru_apply(params, x, reverse=reverse)
        pal = gru_apply_pallas(params, x, reverse=reverse, interpret=True)
        np.testing.assert_allclose(np.asarray(ref), np.asarray(pal), atol=1e-6)


def test_pallas_gru_gradients_match_scan():
    import jax

    from ocrs_tpu.models import nn
    from ocrs_tpu.ops.gru_pallas import gru_apply_pallas

    params = nn.gru_init(jax.random.key(2), 8, 16)
    x = jax.random.normal(jax.random.key(3), (2, 9, 8), jnp.float32)

    def loss_scan(p):
        return jnp.sum(nn.gru_apply(p, x) ** 2)

    def loss_pallas(p):
        return jnp.sum(gru_apply_pallas(p, x, False, True) ** 2)

    g_scan = jax.grad(loss_scan)(params)
    g_pal = jax.grad(loss_pallas)(params)
    for a, b in zip(jax.tree.leaves(g_scan), jax.tree.leaves(g_pal)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)


def _spiral_mask(hw=(120, 160), pitch=6):
    """A single serpentine spiral component — the worst case for sweep-based
    label propagation (dozens of sweeps) and the motivating case for the
    run-graph labeller."""
    h, w = hw
    mask = np.zeros(hw, dtype=bool)
    top, left, bottom, right = 2, 2, h - 3, w - 3
    while top < bottom and left < right:
        mask[top, left:right + 1] = True
        mask[top:bottom + 1, right] = True
        mask[bottom, left:right + 1] = True
        mask[top + pitch:bottom + 1, left] = True
        top += pitch; left += pitch; bottom -= pitch; right -= pitch
    return mask


@pytest.mark.parametrize(
    "mask_fn",
    [
        lambda: _random_blob_mask(3),
        lambda: _spiral_mask(),
        lambda: np.ones((33, 47), dtype=bool),
        lambda: np.zeros((16, 16), dtype=bool),
        lambda: np.eye(24, dtype=bool),
    ],
)
def test_rungraph_ccl_matches_scipy(mask_fn):
    from ocrs_tpu.ops.connected_components import label_components_rungraph

    mask = mask_fn()
    dev = np.asarray(label_components_rungraph(jnp.asarray(mask)))
    dev_compact, dev_count = compact_labels_host(dev)
    host, host_count = label_components_host(mask)
    assert dev_count == host_count
    pairs = set(zip(dev_compact.ravel().tolist(), host.ravel().tolist()))
    assert len(pairs) == host_count + (1 if (~mask).any() else 0)


def test_rungraph_matches_sweep_label_values():
    """Same stable semantics: component labelled by its smallest pixel
    linear index (so rungraph is a drop-in for label_components_device)."""
    from ocrs_tpu.ops.connected_components import label_components_rungraph

    mask = _random_blob_mask(7)
    a = np.asarray(label_components_device(jnp.asarray(mask)))
    b = np.asarray(label_components_rungraph(jnp.asarray(mask)))
    assert (a == b).all()


# ---------------------------------------------------------------------------
# run-table geometry (device run extraction + host CCL/calipers)
# ---------------------------------------------------------------------------


def _run_table_rects(mask, *, pool, solidify, max_components=64):
    from ocrs_tpu.ops.rects import runs_tables, runs_to_rect_table_host

    t = np.asarray(
        runs_tables(jnp.asarray(mask), pool=pool, solidify=solidify)
    )[None]
    return runs_to_rect_table_host(t, pool, max_components)


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_run_table_rects_match_host_exact(seed):
    """pool=1/solidify=False run-table path must EXACTLY reproduce the host
    oracle: scipy 8-conn components + geometry.min_area_rect over run
    endpoints (the C++ hull/calipers mirrors geometry.min_area_rect)."""
    from ocrs_tpu.geometry import min_area_rect
    from ocrs_tpu.ops.connected_components import label_components_host

    mask = _random_blob_mask(seed, hw=(80, 120), n_blobs=8)
    table = _run_table_rects(mask, pool=1, solidify=False)
    got = []
    for i in np.nonzero(table["valid"][0])[0]:
        got.append(
            (
                table["cx"][0][i],
                table["cy"][0][i],
                table["ux"][0][i],
                table["uy"][0][i],
                table["w"][0][i],
                table["h"][0][i],
            )
        )

    labels, count = label_components_host(mask)
    want = []
    for c in range(1, count + 1):
        pts = []
        comp = labels == c
        for y in range(comp.shape[0]):
            xs = np.nonzero(comp[y])[0]
            if xs.size == 0:
                continue
            splits = np.nonzero(np.diff(xs) > 1)[0]
            for seg in np.split(xs, splits + 1):
                pts.append((seg[0], y))
                pts.append((seg[-1], y))
        r = min_area_rect(np.array(pts, dtype=np.float64))
        want.append(
            (r.center[0], r.center[1], r.up[0], r.up[1], r.width, r.height)
        )
    assert len(got) == len(want)
    got.sort()
    want.sort()
    np.testing.assert_allclose(np.array(got), np.array(want), atol=1e-9)


@pytest.mark.parametrize("solidify", [False, True])
def test_run_table_connectivity_matches_multigrid(solidify):
    """pool=2 run-table components must partition words exactly like
    label_components_multigrid (same close + 2x2-pool connectivity)."""
    from ocrs_tpu.ops.connected_components import (
        compact_labels_host,
        label_components_multigrid,
    )

    mask = _random_blob_mask(7, hw=(96, 128), n_blobs=10)
    table = _run_table_rects(mask, pool=2, solidify=solidify)
    n_run = int(table["valid"][0].sum())
    mg = np.asarray(label_components_multigrid(jnp.asarray(mask), solidify=solidify))
    _, n_mg = compact_labels_host(mg)
    assert n_run == n_mg
    assert int(table["dropped"][0]) == 0


def test_run_table_rects_rotated_blob_exact_calipers():
    """The run-table fit is exact calipers: on a rasterized rotated rect it
    must match the host path at least as tightly as the device angle scan."""
    from ocrs_tpu.detection import rects_from_mask_host

    mask = np.zeros((120, 160), dtype=bool)
    yy, xx = np.mgrid[0:120, 0:160]
    theta = np.deg2rad(20)
    u = (xx - 80) * np.cos(theta) + (yy - 60) * np.sin(theta)
    v = -(xx - 80) * np.sin(theta) + (yy - 60) * np.cos(theta)
    mask[(np.abs(u) < 40) & (np.abs(v) < 10)] = True

    table = _run_table_rects(mask, pool=1, solidify=False)
    host = rects_from_mask_host(mask, 0.0, 0.0)
    assert len(host) == 1 and int(table["valid"][0].sum()) == 1
    i = int(np.nonzero(table["valid"][0])[0][0])
    h = host[0]
    assert np.allclose(
        sorted([float(table["w"][0][i]), float(table["h"][0][i])]),
        sorted([h.width, h.height]),
        atol=1e-6,
    )
    assert np.allclose(
        [float(table["cx"][0][i]), float(table["cy"][0][i])], h.center, atol=1e-6
    )


def test_run_table_numpy_fallback_matches_native():
    from ocrs_tpu import native
    from ocrs_tpu.ops.rects import _runs_to_rects_numpy, runs_tables

    if not native.available():
        pytest.skip("native library unavailable")
    mask = _random_blob_mask(11, hw=(80, 120), n_blobs=8)
    t = np.asarray(runs_tables(jnp.asarray(mask), pool=2, solidify=True))[None]
    nat = native.runs_to_rects(t[:, :6], 2, 64)
    pyf = _runs_to_rects_numpy(t[:, :6], 2, 64)
    np.testing.assert_allclose(nat, pyf, atol=1e-9)


def test_pipeline_run_table_geometry_matches_device_path():
    """End-to-end: PagePipeline text output with run_table_geometry on and
    off must agree on fake models (same connectivity semantics; the rect fit
    differs only by the angle scan's 0.9-deg resolution)."""
    from ocrs_tpu.engine import DEFAULT_ALPHABET
    from ocrs_tpu.models.fakes import FakeDetectionModel, FakeRecognitionModel
    from ocrs_tpu.parallel.pipeline import PagePipeline

    pages = np.zeros((4, 100, 200), dtype=np.float32)
    for i in range(4):
        pages[i, 30:50, 20 + 5 * i : 90 + 5 * i] = 1.0
        pages[i, 60:75, 40 : 160 - 5 * i] = 1.0
    alphabet = DEFAULT_ALPHABET[:63]

    def make(run_tables):
        return PagePipeline(
            FakeDetectionModel(),
            FakeRecognitionModel(),
            alphabet,
            max_lines_per_batch=8,
            run_table_geometry=run_tables,
        )

    a = make(False).process(pages)
    b = make(True).process(pages)
    assert len(a) == len(b) == 4
    for ra, rb in zip(a, b):
        assert ra.text == rb.text
        assert len(ra.words) == len(rb.words)


def test_text_confidence_nonblank_mean_and_empty_lines():
    """ops.ctc.text_confidence: exp(mean max-log-prob over frames whose
    argmax is a character); all-blank lines return 1.0."""
    import jax.numpy as jnp

    from ocrs_tpu.ops.ctc import text_confidence

    lp = np.full((2, 4, 3), -10.0, np.float32)
    # Line 0: frames 0,2 decode char 1 at logp -0.2 / -0.6; frames 1,3 blank.
    lp[0, 0, 1] = -0.2
    lp[0, 2, 1] = -0.6
    lp[0, 1, 0] = -0.1
    lp[0, 3, 0] = -0.1
    # Line 1: all blank.
    lp[1, :, 0] = -0.05
    out = np.asarray(text_confidence(jnp.asarray(lp)))
    np.testing.assert_allclose(out[0], np.exp(-0.4), rtol=1e-5)
    np.testing.assert_allclose(out[1], 1.0, rtol=1e-6)
