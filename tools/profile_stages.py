"""Fine-grained fence-timed profile of the throughput pipeline's stages.

Breaks the bench's two device stages (detect, recognize) into their
sub-ops so optimization work targets the real cost centers:

  normalize | det_pre resize | U-Net fwd | CCL | rects | pack | readback |
  to_words | layout | rec prep (host) | extract | rec fwd | argmax |
  label readback | collapse+assembly

Run on the TPU chip: `python tools/profile_stages.py [--pages 16]`.
"""

from __future__ import annotations

import argparse
import time
from functools import partial
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

REPO = Path(__file__).resolve().parent.parent
import sys

if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))


def fence(x):
    from ocrs_tpu.utils.tracing import fence as f

    f(x)


def timeit(fn, warm=1, n=3):
    for _ in range(warm):
        fence(fn())
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        fence(fn())
        ts.append(time.perf_counter() - t0)
    return min(ts) * 1000


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", type=int, default=16)
    args = ap.parse_args()
    B = args.pages

    from ocrs_tpu.engine import DEFAULT_ALPHABET
    from ocrs_tpu.models.weights import (
        load_detection_model,
        load_params,
        load_recognition_model,
    )
    from ocrs_tpu.parallel.pipeline import (
        PagePipeline,
        _detect_pre_batch,
        _masks_to_tables,
        _normalize_batch,
    )
    from ocrs_tpu.train.data import render_page

    wdir = REPO / "weights"
    _, rm = load_params(wdir / "text-recognition.npz")
    det = load_detection_model(wdir / "text-detection.npz")
    rec = load_recognition_model(wdir / "text-recognition.npz")
    alphabet = rm.get("alphabet", DEFAULT_ALPHABET)

    PAGE_H, PAGE_W = 3508, 2480
    rng = np.random.default_rng(0)
    pages = np.stack(
        [
            (
                (render_page(rng, page_hw=(PAGE_H, PAGE_W), n_lines=30, font_size=65)[0][0] + 0.5)
                * 255
            ).astype(np.uint8)
            for _ in range(B)
        ]
    )

    pipeline = PagePipeline(
        detection_model=det, recognition_model=rec, alphabet=alphabet,
        max_lines_per_batch=128,
    )

    pages_j = jnp.asarray(pages[..., None])
    fence(pages_j)
    print(f"== {B} pages {PAGE_H}x{PAGE_W}, trained weights ==")

    t = timeit(lambda: _normalize_batch(pages_j, True))
    print(f"normalize              {t:8.1f} ms")
    pages_dev = _normalize_batch(pages_j, True)
    fence(pages_dev)

    in_h, in_w = pipeline._det_hw
    pre = jax.jit(partial(_detect_pre_batch, input_hw=(in_h, in_w), pads=(0, 0)))
    t = timeit(lambda: pre(pages_dev))
    print(f"det_pre resize         {t:8.1f} ms")
    x = pre(pages_dev)
    fence(x)

    t = timeit(lambda: det.run(x))
    print(f"unet fwd               {t:8.1f} ms")
    probs = det.run(x)
    fence(probs)

    # CCL alone
    from ocrs_tpu.ops.connected_components import label_components_multigrid

    masks = probs[:, 0] > pipeline._params.text_threshold
    masks = jax.device_put(np.asarray(masks))  # materialize
    ccl = jax.jit(jax.vmap(partial(label_components_multigrid, solidify=True)))
    t = timeit(lambda: ccl(masks))
    print(f"ccl multigrid          {t:8.1f} ms")
    labels = ccl(masks)
    fence(labels)

    # endpoint counts for table sizing insight
    lab_h = np.asarray(labels)
    npix = (lab_h >= 0).sum(axis=(1, 2))
    left = np.pad(lab_h[:, :, :-1], ((0, 0), (0, 0), (1, 0)), constant_values=-2)
    right = np.pad(lab_h[:, :, 1:], ((0, 0), (0, 0), (0, 1)), constant_values=-2)
    ep = (lab_h >= 0) & ((lab_h != left) | (lab_h != right))
    runs_per_row = ( (lab_h >= 0) & (lab_h != left) ).sum(axis=2)
    print(f"  mask px/page {npix.mean():.0f}; endpoints/page {ep.sum(axis=(1,2)).mean():.0f}; "
          f"max runs/row {runs_per_row.max()}; mean nonzero runs/row "
          f"{runs_per_row[runs_per_row>0].mean():.1f}")

    from ocrs_tpu.ops.rects import min_area_rects_device, pack_rect_table

    rects = jax.jit(
        jax.vmap(
            partial(
                min_area_rects_device,
                max_components=pipeline._max_components,
                max_points=256,
                max_boundary=16384,
            )
        )
    )
    t = timeit(lambda: rects(labels))
    print(f"rects fit              {t:8.1f} ms")
    table = rects(labels)

    t = timeit(lambda: pack_rect_table(table))
    print(f"pack                   {t:8.1f} ms")
    packed = jax.jit(pack_rect_table)(table)
    fence(packed)

    t = timeit(lambda: jax.device_get(packed))
    print(f"table readback         {t:8.1f} ms  ({packed.nbytes/1024:.0f} KB)")

    # fused detect (as the pipeline runs it)
    t = timeit(lambda: pipeline._detect_tables(pages_dev)[0])
    print(f"FUSED detect           {t:8.1f} ms")
    tables, scale = pipeline._detect_tables(pages_dev)
    fence(tables)

    t0 = time.perf_counter()
    per_page_words = pipeline._tables_to_words(tables, scale)
    t_words = (time.perf_counter() - t0) * 1000
    n_words = sum(len(w) for w in per_page_words)
    print(f"tables_to_words (host) {t_words:8.1f} ms  ({n_words} words)")

    from ocrs_tpu.layout import find_text_lines

    t0 = time.perf_counter()
    per_page_lines = [find_text_lines(w) for w in per_page_words]
    t_lay = (time.perf_counter() - t0) * 1000
    n_lines = sum(len(l) for l in per_page_lines)
    print(f"layout (host)          {t_lay:8.1f} ms  ({n_lines} lines)")

    # recognition prep (host): polygons + geom packing
    from ocrs_tpu.recognition import (
        MAX_CHAIN_V,
        _RecLine,
        line_polygons_batch,
        resized_line_width,
    )

    t0 = time.perf_counter()
    flat, flat_words = [], []
    for pg, lines in enumerate(per_page_lines):
        for li, words in enumerate(lines):
            flat.append((pg, li))
            flat_words.append(words)
    polys, rects_h = line_polygons_batch(flat_words)
    t_prep = (time.perf_counter() - t0) * 1000
    print(f"rec prep: polygons     {t_prep:8.1f} ms  ({len(flat)} lines)")

    pooled = []
    for (pg, li), poly, lr in zip(flat, polys, rects_h):
        pooled.append(
            (pg, _RecLine(index=li, poly=poly, rect=lr,
                          resized_width=resized_line_width(lr.width, lr.height, pipeline._rec_h)))
        )
    # one batch of the first max_lines lines at trimmed width
    chunk = pooled[: pipeline._max_lines]
    w_eff = max(-(-max(rl.resized_width for _, rl in chunk) // 128) * 128, 128)

    t0 = time.perf_counter()
    out = pipeline._run_pooled_batch(pages_dev, chunk, w_eff, True)
    t_disp = (time.perf_counter() - t0) * 1000
    print(f"rec batch dispatch     {t_disp:8.1f} ms  (width {w_eff}, n {len(chunk)}; incl 1st-call)")

    # extract alone vs fwd alone
    from ocrs_tpu.ops.warp import extract_line_batch_packed, pad_chain

    n = len(chunk)
    n_pad = n  # keep simple
    geom = np.empty((6, n_pad), dtype=np.float32)
    for col, (pg, rl) in enumerate(chunk):
        geom[0, col] = rl.rect.top
        geom[1, col] = rl.rect.left
        geom[2, col] = rl.rect.height
        geom[3, col] = rl.rect.width
        geom[4, col] = rl.resized_width
        geom[5, col] = pg
    half = lambda rl: len(rl.poly) // 2
    chains = np.empty((n_pad, 2, MAX_CHAIN_V, 2), dtype=np.float32)
    for col, (_, rl) in enumerate(chunk):
        chains[col, 0] = pad_chain(rl.poly[: half(rl)], MAX_CHAIN_V)
        chains[col, 1] = pad_chain(rl.poly[half(rl) :][::-1], MAX_CHAIN_V)
    geom_dev = jnp.asarray(geom)
    chains_dev = jnp.asarray(chains)
    fence(geom_dev); fence(chains_dev)

    ext = jax.jit(partial(extract_line_batch_packed, out_h=pipeline._rec_h, out_w=w_eff))
    t = timeit(lambda: ext(pages_dev, geom_dev, chains_dev))
    print(f"extract alone          {t:8.1f} ms")
    crops = ext(pages_dev, geom_dev, chains_dev).astype(jnp.bfloat16)
    fence(crops)

    t = timeit(lambda: rec.run(crops))
    print(f"rec fwd alone          {t:8.1f} ms  (batch {crops.shape})")
    lp = rec.run(crops)
    fence(lp)

    from ocrs_tpu.ops.ctc import greedy_labels_u8

    gl = jax.jit(lambda l: greedy_labels_u8(jnp.transpose(l, (1, 0, 2))))
    t = timeit(lambda: gl(lp))
    print(f"argmax (greedy u8)     {t:8.1f} ms")
    labels_u8 = gl(lp)
    fence(labels_u8)

    t = timeit(lambda: np.asarray(jax.device_get(labels_u8)))
    print(f"label readback         {t:8.1f} ms  ({labels_u8.nbytes/1024:.0f} KB)")

    from ocrs_tpu.ops.ctc import collapse_greedy_batch

    host_labels = np.asarray(labels_u8)
    t0 = time.perf_counter()
    collapse_greedy_batch(host_labels)
    print(f"ctc collapse (host)    {(time.perf_counter()-t0)*1000:8.1f} ms")

    # full recognize stage as pipeline runs it
    t0 = time.perf_counter()
    pipeline._recognize_pooled(pages_dev, per_page_lines)
    print(f"FULL recognize stage   {(time.perf_counter()-t0)*1000:8.1f} ms (warm)")
    t0 = time.perf_counter()
    pipeline._recognize_pooled(pages_dev, per_page_lines)
    print(f"FULL recognize stage   {(time.perf_counter()-t0)*1000:8.1f} ms (warm 2)")


if __name__ == "__main__":
    main()
