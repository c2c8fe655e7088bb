"""Multi-page batched OCR pipeline for throughput.

The reference processes one image at a time and gets its parallelism from a
CPU thread pool (SURVEY.md §2.5). The TPU-native throughput shape is
different: batch pages through every stage so each device program is large,
and synchronize with the host as rarely as possible:

  * one batched detection forward for the whole page group;
  * connected components + rect fitting vmapped over pages, producing one
    rect table for the group -> ONE device-to-host copy;
  * layout analysis on host (tiny N, vectorized numpy);
  * recognition lines POOLED ACROSS PAGES into width buckets (a line batch
    may span pages via the page-indexed gather in
    :func:`ocrs_tpu.ops.warp.extract_line_batch`), so batches stay full and
    the number of compiled programs stays small;
  * greedy CTC reductions on device with async host copies.

Host syncs per page group: 1 (rect tables) + #recognition-batches (async,
overlapped). Single-chip this is the throughput path; across chips, wrap it
with :func:`shard_pages` data parallelism.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..detection import EXPAND_DIST, TextDetectorParams, _tile_offsets
from ..errors import WrongOutputError
from ..geometry import Rect, RotatedRect, min_area_rect
from ..layout import find_text_lines
from ..models.protocol import Model, fixed_height_or, fixed_hw
from ..ops.connected_components import label_components_multigrid
from ..ops.ctc import (
    BEAM_EMISSION_GAP,
    beam_candidate_k,
    beam_decode_topk_arrays,
    beam_topk_packed,
    collapse_greedy_batch_arrays,
    greedy_labels_u8,
    unpack_topk,
)
from ..ops.rects import (
    min_area_rects_device,
    pack_rect_table,
    runs_tables,
    runs_to_rect_table_host,
    unpack_rect_table,
)
from ..ops.resize import resize_bilinear
from ..ops.warp import (
    extract_line_batch_packed,
    mask_normalize_crops,
    pad_chain,
    strip_mask_normalize_crops,
)
from ..preprocess import BLACK_VALUE, ITU_WEIGHTS
from ..layout import is_vertical_line
from ..recognition import (
    single_bucket,
    DecodeMethod,
    Greedy,
    MAX_CHAIN_V,
    _LineResult,
    _RecLine,
    _pad_batch_size,
    _pick_direction_variants,
    _text_lines_from_results,
    ladder_bucket,
    line_polygons_batch,
    line_rotated_rect,
    mask_excluded,
    resized_line_width,
)
from ..text_items import TextLine


@partial(jax.jit, static_argnames=("is_u8",))
def _normalize_batch(imgs: jax.Array, is_u8: bool) -> jax.Array:
    """[B, H, W, C] -> [B, H, W] normalized greyscale (see preprocess.py)."""
    c = imgs.shape[-1]
    if c == 1:
        w = jnp.array([1.0], dtype=jnp.float32)
    else:
        w = jnp.array(ITU_WEIGHTS, dtype=jnp.float32)
        if c == 4:
            w = jnp.concatenate([w, jnp.zeros((1,), jnp.float32)])
    if is_u8:
        w = w / 255.0
    grey = jnp.tensordot(imgs.astype(jnp.float32), w, axes=([-1], [0]))
    return grey + BLACK_VALUE


@partial(jax.jit, static_argnames=("input_hw", "pads"))
def _detect_pre_batch(pages: jax.Array, *, input_hw, pads) -> jax.Array:
    """[B, H, W] -> [B, 1, in_h, in_w] padded+resized detector input."""
    pad_bottom, pad_right = pads
    x = pages[:, None]
    if pad_bottom or pad_right:
        x = jnp.pad(
            x,
            ((0, 0), (0, 0), (0, pad_bottom), (0, pad_right)),
            constant_values=BLACK_VALUE,
        )
    if x.shape[-2:] != input_hw:
        x = resize_bilinear(x, input_hw)
    return x


@partial(
    jax.jit,
    static_argnames=(
        "crop_hw",
        "threshold",
        "max_components",
        "multigrid",
        "solidify",
        "max_boundary",
    ),
)
def _masks_to_tables(
    probs: jax.Array,
    *,
    crop_hw,
    threshold,
    max_components,
    multigrid=True,
    solidify=True,
    max_boundary=16384,
):
    """[B, 1, mh, mw] probabilities -> per-page rect tables (stacked)."""
    masks = probs[:, 0, : crop_hw[0], : crop_hw[1]] > threshold
    if multigrid:
        # Multigrid labelling: connectivity solved at half resolution (4x
        # cheaper sweeps, half the zigzag count), labels lifted back to the
        # full-resolution mask where rect extents are computed exactly.
        # Caveat: with solidify the connectivity mask is 3x3-closed and
        # 2x2-max-pooled, which can merge components separated by <~2px at
        # half resolution (~4-5px at detector resolution) — on dense pages
        # this may merge words that the engine's exact host path keeps
        # separate. Pass multigrid=False/solidify=False for exact-host parity.
        labels = jax.vmap(partial(label_components_multigrid, solidify=solidify))(masks)
    else:
        from ..ops.connected_components import label_components_device

        labels = jax.vmap(partial(label_components_device, solidify=solidify))(masks)
    # Run-endpoint counts at detector resolution are ~1.6k/page on dense
    # text; 16k gives ~10x headroom. max_points=256 keeps every endpoint for
    # components up to ~256 runs (any real word at detector resolution);
    # larger merged blobs get uniform block subsampling. The table comes
    # back PACKED ([B, 9, C] f32) so the host pays one readback latency.
    tables = jax.vmap(
        partial(
            min_area_rects_device,
            max_components=max_components,
            max_points=256,
            max_boundary=max_boundary,
        )
    )(labels)
    return pack_rect_table(tables)


@partial(
    jax.jit,
    static_argnames=("crop_hw", "threshold", "multigrid", "solidify", "max_runs"),
)
def _masks_to_run_tables(
    probs: jax.Array,
    *,
    crop_hw,
    threshold,
    multigrid=True,
    solidify=True,
    max_runs=4096,
):
    """[B, 1, mh, mw] probabilities -> packed int16 run tables [B, 7, K].

    The run-table geometry path: instead of labelling + fitting rects on
    device (~180ms/16-page group of iterative propagation, argsorts and
    angle scans), the device reduces each mask to its row runs (~30ms of
    top_k compactions) and the host does union-find + exact hull/calipers
    over ~800 runs/page in C++ (microseconds). See ops.rects.runs_tables."""
    masks = probs[:, 0, : crop_hw[0], : crop_hw[1]] > threshold
    return jax.vmap(
        partial(
            runs_tables,
            pool=2 if multigrid else 1,
            solidify=solidify,
            max_runs=max_runs,
        )
    )(masks)


@partial(jax.jit, static_argnames=("input_hw", "offsets"))
def _extract_tiles_batch(pages: jax.Array, *, input_hw, offsets) -> jax.Array:
    """[B, H, W] pages -> [B*T, 1, th, tw] overlapping tiles (T per page)."""
    th, tw = input_hw
    b, h, w = pages.shape
    pad_b = max(th - h, 0)
    pad_r = max(tw - w, 0)
    if pad_b or pad_r:
        pages = jnp.pad(
            pages, ((0, 0), (0, pad_b), (0, pad_r)), constant_values=BLACK_VALUE
        )
    tiles = jnp.stack(
        [pages[:, y : y + th, x : x + tw] for (y, x) in offsets], axis=1
    )  # [B, T, th, tw]
    return tiles.reshape(b * len(offsets), 1, th, tw)


@partial(jax.jit, static_argnames=("page_hw", "offsets", "batch"))
def _stitch_tiles_batch(probs: jax.Array, *, page_hw, offsets, batch) -> jax.Array:
    """[B*T, 1, th, tw] tile probabilities -> [B, H, W] max-blended pages."""
    h, w = page_hw
    t = len(offsets)
    _, _, th, tw = probs.shape
    probs = probs.reshape(batch, t, th, tw)
    out_h = max(h, th + max(y for y, _ in offsets))
    out_w = max(w, tw + max(x for _, x in offsets))
    out = jnp.zeros((batch, out_h, out_w), probs.dtype)
    for i, (y, x) in enumerate(offsets):
        out = out.at[:, y : y + th, x : x + tw].max(probs[:, i])
    return out[:, :h, :w]


def _scale_rotated_rect(rect: RotatedRect, sx: float, sy: float) -> RotatedRect:
    """Anisotropically scale a rotated rect by scaling its corners and
    re-fitting (exact for axis-aligned rects; a tight 4-point min-area fit
    otherwise). Fast path avoids the generic hull for the common
    (near-)isotropic or axis-aligned cases."""
    ux, uy = rect.up
    if abs(sx - sy) < 1e-9:
        return RotatedRect(
            (rect.center[0] * sx, rect.center[1] * sy),
            (ux, uy),
            rect.width * sx,
            rect.height * sy,
        )
    if abs(ux) < 1e-9 or abs(uy) < 1e-9:
        # Axis-aligned (possibly swapped): widths scale along their axes.
        wx_axis = abs(uy)  # 1 if up is vertical -> width is along x
        new_w = rect.width * (sx if wx_axis else sy)
        new_h = rect.height * (sy if wx_axis else sx)
        return RotatedRect(
            (rect.center[0] * sx, rect.center[1] * sy), (ux, uy), new_w, new_h
        )
    corners = np.stack(rect.corners()) * np.array([sx, sy])[None, :]
    fitted = min_area_rect(corners)
    assert fitted is not None
    return fitted


@partial(jax.jit, static_argnames=("pack4",))
def _normalize_det_input(det_u8: jax.Array, *, pack4=False) -> jax.Array:
    """[B, in_h, in_w] u8 detector input (host-resized by
    native.resize_pages) -> [B, 1, in_h, in_w] normalized float32. pack4:
    the last axis carries two 4-bit pixels per byte (high nibble first)."""
    if pack4:
        b, h, wp = det_u8.shape
        det_u8 = jnp.stack([det_u8 >> 4, det_u8 & 0xF], axis=-1).reshape(
            b, h, wp * 2
        ) * jnp.uint8(17)
    x = det_u8.astype(jnp.float32) / 255.0 + BLACK_VALUE
    return x[:, None]


#: Links slower than this (MB/s host->device) pick the "lowbw" transport in
#: auto mode. PCIe 3.0 x16 measures in the GB/s; the axon relay ~53 MB/s.
_LOWBW_THRESHOLD_MBPS = 500.0

_probed_h2d_mbps: Optional[float] = None


def probe_h2d_mbps() -> float:
    """Measure host->device bandwidth once (an ~8 MB device_put timed against
    a dependent readback fence). Cached for the process lifetime."""
    global _probed_h2d_mbps
    if _probed_h2d_mbps is None:
        import time

        buf = np.zeros((8 << 20,), np.uint8)
        fence = jax.jit(lambda x: x[::4097].astype(jnp.uint32).sum())
        int(fence(jax.device_put(buf)))  # warm the transfer + program
        t0 = time.perf_counter()
        int(fence(jax.device_put(buf)))
        dt = time.perf_counter() - t0
        _probed_h2d_mbps = buf.nbytes / 1e6 / max(dt, 1e-9)
    return _probed_h2d_mbps


class _HostPages:
    """Pages staged for the LOW-BANDWIDTH transport path: the full-resolution
    u8 greyscale pages stay in host RAM; only the detector-resolution input
    (~0.5 MB/page vs ~8.7 MB at 300 dpi) crosses the link. Recognition later
    uploads host-extracted line crops (native.extract_lines) instead of
    gathering from full pages in HBM. See PagePipeline `transport`."""

    def __init__(self, host_u8: np.ndarray, det_dev: jax.Array, pads, pack4: bool):
        self.host = host_u8  # [B, H, W] u8 greyscale, full resolution
        self.det_dev = det_dev  # [B, in_h, stride] u8 on device
        self.pads = pads  # (pad_bottom, pad_right) in page pixels
        self.pack4 = pack4

    @property
    def shape(self):
        return self.host.shape


def _to_grey_u8(pages: np.ndarray) -> np.ndarray:
    """[B, H, W(, C)] u8/float -> [B, H, W] u8 greyscale on host (the
    low-bandwidth twin of _normalize_batch's weighting; BT.601 for color)."""
    if pages.ndim == 4:
        c = pages.shape[-1]
        if c == 1:
            pages = pages[..., 0]
        else:
            w = np.asarray(ITU_WEIGHTS, np.float32)
            rgb = pages[..., :3].astype(np.float32)
            grey = rgb @ w
            if pages.dtype != np.uint8:
                grey = grey * 255.0
            return np.clip(np.rint(grey), 0, 255).astype(np.uint8)
    if pages.dtype == np.uint8:
        return pages
    return np.clip(np.rint(pages.astype(np.float32) * 255.0), 0, 255).astype(np.uint8)


@dataclass
class PageResult:
    """Recognition output for one page."""

    words: list[RotatedRect]
    lines: list[list[RotatedRect]]
    text_lines: list[Optional[TextLine]]

    @property
    def text(self) -> str:
        return "\n".join(str(l) for l in self.text_lines if l is not None)


class PagePipeline:
    """Batched multi-page OCR (see module docstring)."""

    def __init__(
        self,
        detection_model: Model,
        recognition_model: Model,
        alphabet: str,
        detector_params: TextDetectorParams = TextDetectorParams(),
        width_bucket: Optional[Callable[[int], int]] = None,
        max_lines_per_batch: int = 128,
        max_components: int = 512,
        mesh=None,
        multigrid: bool = True,
        solidify: bool = True,
        decode_method: Optional[DecodeMethod] = None,
        allowed_chars: Optional[str] = None,
        tiled_detection: bool = False,
        tile_overlap: int = 64,
        run_table_geometry: bool = True,
        transport: str = "auto",
        transport_pack4: bool = True,
        deskew: bool = False,
        vertical_text: bool = False,
        min_line_confidence: Optional[float] = None,
        debug: bool = False,
    ):
        """`mesh`: optional jax.sharding.Mesh with a "data" axis. When given,
        the page batch is sharded over it and every jitted stage runs SPMD
        across the mesh's devices (data parallelism over pages).

        `multigrid`/`solidify` control connected-component labelling (see
        _masks_to_tables): the defaults are the fast path; pass both False to
        match the single-image engine's exact host connectivity on dense
        pages where closing+pooling could merge adjacent words.

        `decode_method`/`allowed_chars` mirror the single-image engine's
        options (lib.rs:38-71): beam search decodes on host from the full
        log-prob tensors; excluded characters are masked to -inf on device
        before decoding (recognition.rs:547-561).

        `tiled_detection`: for pages larger than the detector input, run the
        detector over overlapping native-resolution tiles and post-process
        at page resolution (keeps small text on 4K pages; engine counterpart
        is detection_tiled).

        `transport`: how page pixels reach the device.
          * "hbm"  — upload full pages, all extraction in HBM (the right
            answer on PCIe hosts: one upload, every later stage device-side).
          * "lowbw" — for slow links (this environment's ~53 MB/s relay):
            pages stay in host RAM; the detect pass uploads a host-resized
            detector-resolution input and recognition uploads host-extracted
            line crops (native/ocrs_native.cpp), cutting bytes-per-page
            ~6-20x with the same sampling laws (crop pixels differ only by
            u8 rounding; masks are bit-identical).
          * "auto" — probe the link on first use (device_put of ~8 MB);
            below _LOWBW_THRESHOLD_MBPS picks "lowbw" when the native
            library is available, else "hbm".
        `transport_pack4`: in lowbw mode pack two 4-bit pixels per byte
        (another 2x fewer bytes; ~±8/255 quantization, which measured
        accuracy-neutral on the rendered-page bench)."""
        self._mesh = mesh
        self._det = detection_model
        self._rec = recognition_model
        self._alphabet = alphabet
        self._params = detector_params
        self._det_hw = fixed_hw(detection_model.input_shape())
        self._rec_h = fixed_height_or(recognition_model.input_shape(), 50)
        # One pooled bucket: fewest (bucket, batch) combinations -> fewest
        # dispatch+sync rounds, which measured faster than any finer ladder
        # on this transport even with the padded compute. (An earlier
        # corruption at batch 128 traced to a backend jnp.flip
        # miscompilation in the reverse GRU, fixed by scanning with
        # lax.scan(reverse=True) — see models/nn.py.)
        self._bucket = width_bucket or single_bucket
        self._max_lines = max_lines_per_batch
        self._max_components = max_components
        self._multigrid = multigrid
        self._solidify = solidify
        self._decode = decode_method if decode_method is not None else Greedy()
        self._tiled = tiled_detection
        self._tile_overlap = tile_overlap
        # Run-table geometry (see _masks_to_run_tables): connectivity and
        # extents semantics match the device CCL path (same solidify/pool
        # rules, orig-mask extents), but the rect fit is EXACT calipers
        # instead of the 0.9-deg angle scan. Not used for tiled detection
        # (page-res run tables need scaled caps; the device path covers it).
        self._run_tables = run_table_geometry
        if transport not in ("auto", "hbm", "lowbw"):
            raise ValueError(f"unknown transport {transport!r}")
        if transport == "lowbw":
            from .. import native as _native

            if not _native.available():
                raise RuntimeError(
                    "transport='lowbw' requires the native library "
                    "(native/ocrs_native.cpp)"
                )
        # Sharded (mesh) runs keep pages in HBM: host crops don't shard.
        self._transport = "hbm" if (mesh is not None and transport == "auto") else transport
        self._pack4 = transport_pack4
        # Engine feature parity (VERDICT r03 "what's weak" #3): deskewed
        # crops along each line's min-area rotated rect, and vertical-text
        # assembly with reading-direction voting — identical semantics to
        # OcrEngineParams.deskew / .vertical_text.
        self._deskew = deskew
        self._vertical = vertical_text
        # Low-confidence line suppression (OcrEngineParams.min_line_confidence
        # parity): threshold on ops.ctc.text_confidence, fused into the
        # recognition program, filtered at collect.
        self._min_conf = min_line_confidence
        self._debug = debug
        # Fused detect program cache: None = untried, False = model's run()
        # not traceable (dispatch stage-at-a-time), else the jitted callable.
        self._fused_detect = None
        self._fused_detect_shape = None
        # Fused recognition programs keyed by (width, n_pad, greedy);
        # "disabled" -> stage-at-a-time dispatch.
        self._fused_rec: dict = {}
        # Label i (>=1) maps to alphabet[i-1]; excluded labels from the
        # allowed set (lib.rs:153-170).
        self._excluded_onehot: Optional[np.ndarray] = None
        if allowed_chars is not None:
            allowed = set(allowed_chars)
            onehot = np.zeros((len(alphabet) + 1,), dtype=bool)
            for i, ch in enumerate(alphabet):
                if ch not in allowed:
                    onehot[i + 1] = True
            self._excluded_onehot = onehot

    def _transport_mode(self) -> str:
        """Resolve "auto" to "hbm"/"lowbw" (probing the link on first call)."""
        if self._transport == "auto":
            from .. import native as _native

            if (
                self._tiled
                or not _native.available()
                or jax.devices()[0].platform == "cpu"
            ):
                # Tiled detection post-processes at page resolution, which
                # needs the full pages in HBM. On the CPU backend there is
                # no link to save (device_put is a memcpy) and the probe
                # only measures host load noise.
                self._transport = "hbm"
            else:
                mbps = probe_h2d_mbps()
                self._transport = (
                    "lowbw" if mbps < _LOWBW_THRESHOLD_MBPS else "hbm"
                )
                if self._debug:
                    print(
                        f"[ocrs-tpu pipeline] h2d {mbps:.0f} MB/s -> "
                        f"transport={self._transport}"
                    )
        return self._transport

    # -- detection ------------------------------------------------------------

    def _detect_tables(self, pages_dev):
        if isinstance(pages_dev, _HostPages):
            return self._detect_tables_lowbw(pages_dev)
        b, page_h, page_w = pages_dev.shape
        in_h, in_w = self._det_hw
        if self._tiled and (page_h > in_h or page_w > in_w):
            return self._detect_tables_tiled(pages_dev)
        pad_bottom = max(in_h - page_h, 0)
        pad_right = max(in_w - page_w, 0)
        crop_h, crop_w = in_h - pad_bottom, in_w - pad_right

        def run_stages(pages):
            x = _detect_pre_batch(
                pages, input_hw=self._det_hw, pads=(pad_bottom, pad_right)
            )
            probs = self._det.run(x)
            if self._run_tables:
                return _masks_to_run_tables(
                    probs,
                    crop_hw=(crop_h, crop_w),
                    threshold=self._params.text_threshold,
                    multigrid=self._multigrid,
                    solidify=self._solidify,
                )
            return _masks_to_tables(
                probs,
                crop_hw=(crop_h, crop_w),
                threshold=self._params.text_threshold,
                max_components=self._max_components,
                multigrid=self._multigrid,
                solidify=self._solidify,
            )

        # Fuse pre-resize + model forward + mask post-processing into ONE
        # program: each separate dispatch pays round-trip overhead on relayed
        # transports, and the fusion lets XLA overlap stages. Models whose
        # run() isn't traceable fall back to stage-at-a-time dispatch.
        key = pages_dev.shape
        if self._fused_detect_shape != key and self._fused_detect is not False:
            try:
                fused = jax.jit(run_stages)
                tables = fused(pages_dev)
                self._fused_detect = fused
                self._fused_detect_shape = key
            except Exception:
                self._fused_detect = False
                tables = run_stages(pages_dev)
        elif self._fused_detect is False:
            tables = run_stages(pages_dev)
        else:
            tables = self._fused_detect(pages_dev)
        return tables, (page_w / crop_w, page_h / crop_h)

    def _detect_tables_lowbw(self, hp: _HostPages):
        """Detection from the host-resized detector-resolution upload (the
        low-bandwidth transport): unpack/normalize + model forward + mask
        post-processing in ONE fused program, same table semantics and the
        same (page/crop) scale law as the HBM path."""
        b, page_h, page_w = hp.host.shape
        in_h, in_w = self._det_hw
        pad_bottom, pad_right = hp.pads
        crop_h, crop_w = in_h - pad_bottom, in_w - pad_right

        def run_stages(det_u8):
            x = _normalize_det_input(det_u8, pack4=hp.pack4)
            probs = self._det.run(x)
            if self._run_tables:
                return _masks_to_run_tables(
                    probs,
                    crop_hw=(crop_h, crop_w),
                    threshold=self._params.text_threshold,
                    multigrid=self._multigrid,
                    solidify=self._solidify,
                )
            return _masks_to_tables(
                probs,
                crop_hw=(crop_h, crop_w),
                threshold=self._params.text_threshold,
                max_components=self._max_components,
                multigrid=self._multigrid,
                solidify=self._solidify,
            )

        key = ("lowbw", hp.det_dev.shape)
        if self._fused_detect_shape != key and self._fused_detect is not False:
            try:
                fused = jax.jit(run_stages)
                tables = fused(hp.det_dev)
                self._fused_detect = fused
                self._fused_detect_shape = key
            except Exception:
                self._fused_detect = False
                tables = run_stages(hp.det_dev)
        elif self._fused_detect is False:
            tables = run_stages(hp.det_dev)
        else:
            tables = self._fused_detect(hp.det_dev)
        return tables, (page_w / crop_w, page_h / crop_h)

    def _detect_tables_tiled(self, pages_dev: jax.Array):
        """Tiled detection at page resolution: every page's overlapping
        native-resolution tiles run as ONE model batch [B*T, 1, th, tw];
        probability maps are max-stitched per page and post-processed at
        page resolution (scale = 1), so small text on 4K pages survives
        (counterpart of detection._detect_text_pixels_tiled)."""
        b, page_h, page_w = pages_dev.shape
        offsets = _tile_offsets((page_h, page_w), self._det_hw, self._tile_overlap)
        tiles = _extract_tiles_batch(pages_dev, input_hw=self._det_hw, offsets=offsets)
        probs = self._det.run(tiles)  # [B*T, 1, th, tw]
        page_probs = _stitch_tiles_batch(
            probs, page_hw=(page_h, page_w), offsets=offsets, batch=b
        )
        # Page-resolution masks carry more run endpoints than the detector
        # input; scale the compaction buffers with the area ratio.
        area_ratio = max((page_h * page_w) / (self._det_hw[0] * self._det_hw[1]), 1.0)
        max_boundary = int(min(2 ** 18, 16384 * area_ratio))
        tables = _masks_to_tables(
            page_probs[:, None],
            crop_hw=(page_h, page_w),
            threshold=self._params.text_threshold,
            max_components=self._max_components,
            multigrid=self._multigrid,
            solidify=self._solidify,
            max_boundary=max_boundary,
        )
        return tables, (1.0, 1.0)

    def _tables_to_words(self, tables, scale) -> list[list[RotatedRect]]:
        return self._tables_to_words_arrays(tables, scale)[0]

    def _tables_to_words_arrays(self, tables, scale):
        """Returns (per_page_words, per_page_arrays) where arrays is the
        (cx, cy, ux, uy, w, h) tuple matching the words list (for the
        native array-based layout entry), or None for pages that took the
        general anisotropic re-fit path."""
        sx, sy = scale
        # ONE device->host readback: tables arrive as a packed [B, 9, C]
        # rect table OR a packed [B, 7, K] int16 run table, so the relay
        # round-trip latency is paid once, not once per field.
        raw = np.asarray(jax.device_get(tables))
        if raw.dtype == np.int16:
            t = runs_to_rect_table_host(
                raw, 2 if self._multigrid else 1, self._max_components
            )
        else:
            t = unpack_rect_table(raw)
        dropped = int(np.asarray(t["dropped"]).sum())
        if dropped > 0:
            from ..utils.log import warn

            warn(
                f"detection rect table overflow: {dropped} components beyond "
                "max_components were dropped"
            )
        b = t["valid"].shape[0]
        iso = abs(sx - sy) < 1e-9
        per_page: list[list[RotatedRect]] = []
        per_arrays: list = []
        for i in range(b):
            idx = np.nonzero(t["valid"][i])[0]
            cx = t["cx"][i][idx].astype(np.float64)
            cy = t["cy"][i][idx].astype(np.float64)
            ux = t["ux"][i][idx].astype(np.float64)
            uy = t["uy"][i][idx].astype(np.float64)
            w = t["w"][i][idx].astype(np.float64)
            h = t["h"][i][idx].astype(np.float64)
            # Vectorized _scale_rotated_rect for the isotropic and
            # axis-aligned cases (the general case re-fits via the hull).
            axis_aligned = (np.abs(ux) < 1e-9) | (np.abs(uy) < 1e-9)
            if iso:
                sw, sh = w * sx, h * sy
            else:
                wx_axis = np.abs(uy) >= 1e-9  # width lies along x when up is vertical
                sw = np.where(wx_axis, w * sx, w * sy)
                sh = np.where(wx_axis, h * sy, h * sx)
            scx, scy = cx * sx, cy * sy
            # Scale-proportional expansion: see detection.py
            # _detect_words_model_res.
            ew = sw + 2.0 * EXPAND_DIST * sx
            eh = sh + 2.0 * EXPAND_DIST * sy
            keep = ew * eh >= self._params.min_area
            if not (iso or bool(axis_aligned.all())):
                # General anisotropic case, vectorized (round 4: the per-word
                # hull/calipers re-fit cost ~60ms/group of pure Python on
                # 300-dpi pages, and returning per_arrays=None forced the
                # Python layout fallback on top). A rotated rect's corners
                # scale to a PARALLELOGRAM whose min-area rect has an edge
                # collinear with one of the two distinct edge directions —
                # project the 4 corners on both candidate frames and keep
                # the smaller-area fit (exactly what min_area_rect's hull
                # scan finds, without the hull).
                gen = ~axis_aligned
                rxs, rys = -uy[gen], ux[gen]  # right axis (_rot90 of up)
                cxy = np.stack([cx[gen], cy[gen]], 1)
                up2 = np.stack([ux[gen], uy[gen]], 1)
                rt2 = np.stack([rxs, rys], 1)
                half_w = (w[gen] / 2.0)[:, None]
                half_h = (h[gen] / 2.0)[:, None]
                corners = np.stack(
                    [
                        cxy + rt2 * half_w + up2 * half_h,
                        cxy - rt2 * half_w + up2 * half_h,
                        cxy - rt2 * half_w - up2 * half_h,
                        cxy + rt2 * half_w - up2 * half_h,
                    ],
                    axis=1,
                )  # [G, 4, 2]
                corners *= np.array([sx, sy])[None, None, :]
                best = None
                for k in range(2):  # two distinct edge directions
                    e = corners[:, k + 1] - corners[:, k]
                    n_ = np.hypot(e[:, 0], e[:, 1])
                    n_ = np.maximum(n_, 1e-12)
                    ex = e / n_[:, None]
                    ey = np.stack([-ex[:, 1], ex[:, 0]], 1)
                    px_ = np.einsum("gcd,gd->gc", corners, ex)
                    py_ = np.einsum("gcd,gd->gc", corners, ey)
                    ww_ = px_.max(1) - px_.min(1)
                    hh_ = py_.max(1) - py_.min(1)
                    ctr = (
                        ((px_.max(1) + px_.min(1)) / 2.0)[:, None] * ex
                        + ((py_.max(1) + py_.min(1)) / 2.0)[:, None] * ey
                    )
                    cand = (ww_ * hh_, ctr, ey, ww_, hh_)
                    if best is None:
                        best = cand
                    else:
                        pick = cand[0] < best[0]
                        best = tuple(
                            np.where(pick[(...,) + (None,) * (b.ndim - 1)], c, b)
                            for c, b in zip(cand, best)
                        )
                _, ctr, ey, ww_, hh_ = best
                scx[gen], scy[gen] = ctr[:, 0], ctr[:, 1]
                ux[gen], uy[gen] = ey[:, 0], ey[:, 1]
                # Expansion matches _scale_rotated_rect's follow-up resize:
                # x-expansion on width, y-expansion on height.
                ew[gen] = ww_ + 2.0 * EXPAND_DIST * sx
                eh[gen] = hh_ + 2.0 * EXPAND_DIST * sy
                keep = ew * eh >= self._params.min_area
            k = np.nonzero(keep)[0]
            a = (scx[k], scy[k], ux[k], uy[k], ew[k], eh[k])
            words = [
                RotatedRect._raw(*vals)
                for vals in zip(*(col.tolist() for col in a))
            ]
            per_arrays.append(a)
            per_page.append(words)
        return per_page, per_arrays

    # -- recognition ----------------------------------------------------------

    def _recognize_pooled(
        self, pages_dev: jax.Array, per_page_lines: list[list[list[RotatedRect]]]
    ) -> list[list[Optional[TextLine]]]:
        return self._collect_recognition(
            per_page_lines, self._dispatch_recognition(pages_dev, per_page_lines)
        )

    def _post_layout(
        self, lines: list[list[RotatedRect]]
    ) -> list[list[RotatedRect]]:
        """Per-page layout tail matching the engine: vertical-text chains are
        merged into single vertical lines (engine.py vertical_text)."""
        if self._vertical:
            from ..layout import merge_vertical_chains

            lines, _ = merge_vertical_chains(lines)
        return lines

    def _dispatch_recognition(
        self, pages_dev, per_page_lines: list[list[list[RotatedRect]]]
    ):
        # Build pooled line records tagged (page, line_index): polygons and
        # union rects for ALL lines in the group come from one vectorized
        # pass (line_polygons_batch) instead of ~25 numpy calls per line.
        flat: list[tuple[int, int]] = []
        flat_words: list[list[RotatedRect]] = []
        for pg, lines in enumerate(per_page_lines):
            for li, words in enumerate(lines):
                flat.append((pg, li))
                flat_words.append(words)
        polys, rects = line_polygons_batch(flat_words)
        pooled: list[tuple[int, _RecLine]] = []
        for (pg, li), poly, lr, words in zip(flat, polys, rects, flat_words):
            if self._vertical and is_vertical_line(words):
                # Vertical stack: crop along its min-area rect in BOTH
                # reading directions; decode confidence picks the winner
                # (recognition.py recognize_text_lines semantics).
                pts = np.concatenate([np.stack(w.corners()) for w in words])
                mr = min_area_rect(pts)
                assert mr is not None, "line has no words"
                for variant, up in enumerate(((-1.0, 0.0), (1.0, 0.0))):
                    rr = mr.orient_towards(up)
                    pooled.append(
                        (
                            pg,
                            _RecLine(
                                index=li,
                                poly=np.round(np.stack(rr.corners())).astype(np.int64),
                                rect=rr.bounding_rect().integral_bounding_rect(),
                                resized_width=resized_line_width(
                                    rr.width, rr.height, self._rec_h
                                ),
                                rrect=rr,
                                variant=variant,
                            ),
                        )
                    )
                continue
            if self._deskew:
                rrect = line_rotated_rect(words)
                pooled.append(
                    (
                        pg,
                        _RecLine(
                            index=li,
                            poly=poly,
                            rect=lr,
                            resized_width=resized_line_width(
                                rrect.width, rrect.height, self._rec_h
                            ),
                            rrect=rrect,
                        ),
                    )
                )
                continue
            pooled.append(
                (
                    pg,
                    _RecLine(
                        index=li,
                        poly=poly,
                        rect=lr,
                        resized_width=resized_line_width(
                            lr.width, lr.height, self._rec_h
                        ),
                    ),
                )
            )

        groups: dict[tuple[int, bool], list[tuple[int, _RecLine]]] = {}
        for item in pooled:
            key = (self._bucket(item[1].resized_width), item[1].rrect is not None)
            groups.setdefault(key, []).append(item)
        batches = []
        for (width, rotated), group in groups.items():
            for i in range(0, len(group), self._max_lines):
                chunk = group[i : i + self._max_lines]
                # Trim the compute width to the batch's own max (rounded to
                # 128 for shape reuse): the bucket law only groups lines, it
                # doesn't need to set the padded width. 300-dpi pages need
                # ~1792 of the 2432 cap -> ~25% less extract+forward work.
                w_eff = min(
                    width,
                    max(-(-max(rl.resized_width for _, rl in chunk) // 128) * 128, 128),
                )
                batches.append((w_eff, chunk, rotated))

        greedy = isinstance(self._decode, Greedy)
        inflight = []
        for group_width, batch, rotated in batches:
            if self._debug:
                print(f"Processing group of {len(batch)} lines of width {group_width}")
            with_conf = any(rl.variant >= 0 for _, rl in batch)
            out = self._run_pooled_batch(
                pages_dev, batch, group_width, greedy, rotated, with_conf
            )
            for leaf in jax.tree.leaves(out):
                try:
                    leaf.copy_to_host_async()
                except AttributeError:
                    pass
            inflight.append((group_width, batch, out, with_conf))
        return inflight

    def _collect_recognition(
        self, per_page_lines, inflight
    ) -> list[list[Optional[TextLine]]]:
        greedy = isinstance(self._decode, Greedy)
        any_voting = False
        per_page_results: list[list[_LineResult]] = [[] for _ in per_page_lines]
        for group_width, batch, out_dev, with_conf in inflight:
            tconf = None
            if isinstance(out_dev, tuple):
                parts = list(out_dev)
                out_dev = parts.pop(0)
                conf_dev = parts.pop(0) if with_conf else None
                tconf = (
                    np.asarray(parts.pop(0))[: len(batch)]
                    if self._min_conf is not None
                    else None
                )
            else:
                conf_dev = None
            if with_conf:
                conf = np.asarray(conf_dev)[: len(batch)]
                any_voting = True
            else:
                conf = np.zeros(len(batch), dtype=np.float32)
            host = np.asarray(out_dev)
            ctc_input_len = host.shape[1]
            if greedy:
                # Array-pair steps: no per-step object construction (tens of
                # thousands of CtcStep objects per group measured slower than
                # the native collapse itself).
                decoded = collapse_greedy_batch_arrays(host)
            else:
                n_classes = len(self._alphabet) + 1
                k = beam_candidate_k(self._decode.width, n_classes)
                vals, idx = unpack_topk(host[: len(batch)], k)
                decoded = beam_decode_topk_arrays(
                    vals, idx, self._decode.width, n_classes
                )
            for col, ((pg, rl), steps, c) in enumerate(zip(batch, decoded, conf)):
                if (
                    tconf is not None
                    and self._min_conf is not None
                    and tconf[col] < self._min_conf
                ):
                    # Low-confidence glyph soup (graphics strokes boxed by
                    # the detector): emit nothing for this line.
                    steps = (
                        (steps[0][:0], steps[1][:0])
                        if isinstance(steps, tuple)
                        else []
                    )
                per_page_results[pg].append(
                    _LineResult(
                        line=rl,
                        rec_input_len=group_width,
                        ctc_input_len=ctc_input_len,
                        steps=steps,
                        conf=float(c),
                    )
                )

        out: list[list[Optional[TextLine]]] = []
        for results in per_page_results:
            if any_voting:
                results = _pick_direction_variants(results)
            results.sort(key=lambda r: r.line.index)
            out.append(_text_lines_from_results(results, self._alphabet))
        return out

    def _run_pooled_batch(
        self, pages_dev, batch, group_width, greedy=True, rotated=False,
        with_conf=False,
    ):
        n = len(batch)
        n_pad = _pad_batch_size(n, self._max_lines)

        if rotated:
            return self._run_pooled_batch_rotated(
                pages_dev, batch, group_width, greedy, with_conf, n, n_pad
            )

        # Pack ALL per-line geometry into two arrays -> two host->device
        # uploads per batch instead of ~9 (each upload pays a round-trip
        # latency on relayed transports).
        geom = np.empty((6, n_pad), dtype=np.float32)
        for col, (pg, rl) in enumerate(batch):
            geom[0, col] = rl.rect.top
            geom[1, col] = rl.rect.left
            geom[2, col] = rl.rect.height
            geom[3, col] = rl.rect.width
            geom[4, col] = rl.resized_width
            geom[5, col] = pg
        geom[:, n:] = geom[:, n - 1 : n]

        v = MAX_CHAIN_V
        half = lambda rl: len(rl.poly) // 2
        chains = np.empty((n_pad, 2, v, 2), dtype=np.float32)
        for col, (_, rl) in enumerate(batch):
            chains[col, 0] = pad_chain(rl.poly[: half(rl)], v)
            chains[col, 1] = pad_chain(rl.poly[half(rl) :][::-1], v)
        chains[n:] = chains[n - 1 : n]

        if isinstance(pages_dev, _HostPages):
            # Low-bandwidth transport: extract + resize the crops on host
            # from the full-res pages that never left host RAM and upload
            # them STRIP-PACKED — every line at its own resized width,
            # concatenated along the column axis (native.extract_lines_strip;
            # batch-max padding measured ~48% of the crop bytes on dense
            # 300-dpi pages). The device program gathers each line's window
            # back out of the strip and applies the bit-identical
            # polygon/in-page/width mask from the tiny geometry arrays
            # (ops/warp.strip_mask_normalize_crops), normalizes, and runs
            # the recognizer. Decoded text is unchanged vs the padded
            # upload (the mask blacks everything past each line's width).
            from .. import native as _native

            _, page_h, page_w = pages_dev.host.shape
            geom[4, n:] = 0.0  # pad columns: rwidth 0 -> fully masked BLACK
            n_cols = np.clip(geom[4].astype(np.int64), 0, group_width)
            segs = ((n_cols + 1) // 2) * 2  # even: pack4 segments own bytes
            offs = np.zeros(n_pad, np.int32)
            np.cumsum(segs[:-1], out=offs[1:])
            # Quantize the strip length so jit program shapes repeat across
            # groups (each distinct total would otherwise recompile).
            total_w = max(int(offs[-1] + segs[-1]), 2)
            total_w = ((total_w + 4095) // 4096) * 4096
            strip_host = _native.extract_lines_strip(
                pages_dev.host,
                geom,
                offs,
                out_h=self._rec_h,
                total_w=total_w,
                pack4=pages_dev.pack4,
            )
            assert strip_host is not None
            # Ride the offsets along as geometry row 6 (exact in f32: strip
            # columns < 2^24) so the fused call keeps one signature.
            geom = np.concatenate([geom, offs[None].astype(np.float32)], axis=0)

            def run_stages(strip_dev, geom_dev, chains_dev):
                crops = strip_mask_normalize_crops(
                    strip_dev,
                    geom_dev[6].astype(jnp.int32),
                    geom_dev,
                    chains_dev,
                    page_hw=(page_h, page_w),
                    pack4=pages_dev.pack4,
                    out_w=group_width,
                )
                return self._rec_decode_tail(crops, greedy)

            key = (group_width, n_pad, total_w, greedy, "lowbw-strip")
            first_arg = strip_host
        else:

            def run_stages(pages, geom_dev, chains_dev):
                crops = extract_line_batch_packed(
                    pages, geom_dev, chains_dev,
                    out_h=self._rec_h, out_w=group_width,
                )
                return self._rec_decode_tail(crops, greedy)

            key = (group_width, n_pad, greedy)
            first_arg = pages_dev

        # One fused program per (width, n_pad, decode) shape — extract,
        # model forward and the greedy argmax dispatch as a single round
        # trip (same rationale as the fused detect program). Models whose
        # run() isn't traceable fall back to stage-at-a-time dispatch.
        fused = self._fused_rec.get(key)
        geom_dev = jnp.asarray(geom)
        chains_dev = jnp.asarray(chains)
        if fused is None and self._fused_rec.get("disabled") is not True:
            try:
                fused = jax.jit(run_stages)
                out = fused(first_arg, geom_dev, chains_dev)
                self._fused_rec[key] = fused
            except WrongOutputError:
                raise
            except Exception:
                self._fused_rec["disabled"] = True
                out = run_stages(first_arg, geom_dev, chains_dev)
        elif fused is None:
            out = run_stages(first_arg, geom_dev, chains_dev)
        else:
            out = fused(first_arg, geom_dev, chains_dev)
        return jax.tree.map(lambda a: a[:n], out)

    def _run_pooled_batch_rotated(
        self, pages_dev, batch, group_width, greedy, with_conf, n, n_pad
    ):
        """Deskew/vertical batches: crops sampled along each line's rotated
        rect (ops.warp.extract_line_batch_rotated; C++ twin on the low-
        bandwidth transport). `with_conf` additionally returns the per-line
        mean max-log-prob for reading-direction voting."""
        from ..ops.warp import extract_line_batch_rotated

        geom = np.empty((10, n_pad), dtype=np.float32)
        for col, (pg, rl) in enumerate(batch):
            rr = rl.rrect
            right = rr.right_axis()
            down = -rr.up
            origin = rr.center - right * (rr.width / 2.0) - down * (rr.height / 2.0)
            geom[0:2, col] = origin
            geom[2:4, col] = right
            geom[4:6, col] = down
            geom[6, col] = rr.width
            geom[7, col] = rr.height
            geom[8, col] = rl.resized_width
            geom[9, col] = pg
        geom[:, n:] = geom[:, n - 1 : n]

        if isinstance(pages_dev, _HostPages):
            from .. import native as _native

            geom[8, n:] = 0.0  # pad columns: rwidth 0 -> BLACK
            crops_host = _native.extract_lines_rotated(
                pages_dev.host,
                geom[:, :n],
                out_h=self._rec_h,
                out_w=group_width,
                pack4=pages_dev.pack4,
            )
            assert crops_host is not None
            crops_u8 = np.zeros(
                (n_pad, self._rec_h, crops_host.shape[-1]), np.uint8
            )
            crops_u8[:n] = crops_host
            pack4 = pages_dev.pack4

            def run_stages(crops_dev, geom_dev):
                # The C++ kernel already applied the in-page/valid-column
                # BLACK; only dequantize + normalize remains (geom_dev rides
                # along solely to keep the two paths' signatures alike).
                crops = _normalize_det_input(crops_dev, pack4=pack4)
                return self._rec_decode_tail(crops, greedy, with_conf)

            key = (group_width, n_pad, greedy, with_conf, "rot-lowbw")
            first_arg = crops_u8
        else:

            def run_stages(pages, geom_dev):
                crops = extract_line_batch_rotated(
                    pages, geom_dev, out_h=self._rec_h, out_w=group_width
                )
                return self._rec_decode_tail(crops, greedy, with_conf)

            key = (group_width, n_pad, greedy, with_conf, "rot")
            first_arg = pages_dev

        fused = self._fused_rec.get(key)
        geom_dev = jnp.asarray(geom)
        if fused is None and self._fused_rec.get("disabled") is not True:
            try:
                fused = jax.jit(run_stages)
                out = fused(first_arg, geom_dev)
                self._fused_rec[key] = fused
            except WrongOutputError:
                raise
            except Exception:
                self._fused_rec["disabled"] = True
                out = run_stages(first_arg, geom_dev)
        elif fused is None:
            out = run_stages(first_arg, geom_dev)
        else:
            out = fused(first_arg, geom_dev)
        return jax.tree.map(lambda a: a[:n], out)

    def _rec_decode_tail(self, crops: jax.Array, greedy: bool, with_conf: bool = False):
        """Recognizer forward + decode head on extracted crops (shared by
        the HBM and low-bandwidth recognition programs). ``with_conf``
        additionally returns the per-line mean (over frames) max log-prob
        used by vertical-text reading-direction voting."""
        # bf16 crops: the recognizer computes in bf16 anyway; casting at
        # the fusion boundary halves the crop-batch materialization
        # (80MB -> 40MB for a 128x2432 batch).
        crops = crops.astype(jnp.bfloat16)
        logprobs = self._rec.run(crops)  # [T, n_pad, C]
        n_classes = int(logprobs.shape[-1])
        if len(self._alphabet) + 1 != n_classes:
            # Static shape: raises at trace time on the first batch
            # (recognition.rs:487-493 parity).
            raise WrongOutputError(
                f"output column count ({n_classes}) does not match "
                f"alphabet size ({len(self._alphabet) + 1})"
            )
        lp = jnp.transpose(logprobs, (1, 0, 2))  # [n_pad, T, C]
        if self._excluded_onehot is not None:
            lp = mask_excluded(
                lp, jnp.asarray(self._excluded_onehot[:n_classes])
            )
        if greedy:
            out = greedy_labels_u8(lp)
        else:
            # Beam: per-frame top-k candidates fused into the program — the
            # beam never extends past the top beam_candidate_k classes, so
            # the readback is ~5k/(4C) the size of the full log-probs,
            # packed into one buffer (one relay round trip).
            k = beam_candidate_k(self._decode.width, n_classes)
            out = beam_topk_packed(lp, k=k, gap=BEAM_EMISSION_GAP)
        outs = [out]
        if with_conf:
            outs.append(jnp.mean(jnp.max(lp, axis=-1), axis=1))
        if self._min_conf is not None:
            from ..ops.ctc import text_confidence

            outs.append(text_confidence(lp))
        return tuple(outs) if len(outs) > 1 else out

    # -- entry ------------------------------------------------------------------

    def _stage_pages(self, pages) -> jax.Array:
        """Asynchronously upload + normalize a page stack; returns the device
        array without synchronizing (device_put and the normalize dispatch
        both return before the copy/compute completes). A [B, H, W] float32
        jax.Array is treated as already normalized and returned as-is."""
        if isinstance(pages, _HostPages):
            return pages
        if isinstance(pages, jax.Array) and pages.ndim == 3 and pages.dtype == jnp.float32:
            return pages
        if self._mesh is None and self._transport_mode() == "lowbw":
            from .. import native as _native

            grey = _to_grey_u8(np.asarray(pages))
            in_h, in_w = self._det_hw
            _, h, w = grey.shape
            pads = (max(in_h - h, 0), max(in_w - w, 0))
            det_u8 = _native.resize_pages(grey, (in_h, in_w), pack4=self._pack4)
            assert det_u8 is not None
            return _HostPages(grey, jax.device_put(det_u8), pads, self._pack4)
        imgs = np.asarray(pages)
        if imgs.ndim == 3:
            imgs = imgs[..., None]
        is_u8 = imgs.dtype == np.uint8
        if self._mesh is not None:
            from .sharding import shard_batch_dim

            arr = shard_batch_dim(self._mesh, jnp.asarray(imgs))
        else:
            arr = jax.device_put(imgs)
        return _normalize_batch(arr, is_u8)  # [B, H, W]

    def process(self, pages: np.ndarray) -> list[PageResult]:
        """Run OCR on a stack of same-sized pages.

        `pages`: [B, H, W] or [B, H, W, C] u8/float numpy array.
        """
        return self.process_normalized(self._stage_pages(pages))

    def process_stream(self, page_batches) -> "list[list[PageResult]]":
        """Run OCR over an iterable of page stacks as a software pipeline:

        * uploads run one group ahead (double buffering hides transfer
          behind compute on slow transports);
        * DETECT programs are dispatched up to TWO groups ahead, with the
          rect table's device->host copy started asynchronously, so the
          device never idles while the host does per-group work;
        * each group's host tail is SPLIT: dispatch (table sync, layout,
          recognition program dispatch with async label copies) and collect
          (CTC collapse + line assembly) are separate phases, and group N
          is collected only after group N+1 has dispatched. Group N's
          recognition programs queue behind group N+1's detect on the
          device, so a synchronous collect right after dispatch would stall
          the host for the whole detect+recognize queue; deferring the
          collect by one group lets that queue drain while the host does
          group N+1's layout/prep, leaving steady-state wall time at
          max(device ms/group, host ms/group) instead of their sum.

        * staging (grey conversion, the low-bandwidth transport's host C++
          resize, the device_put) runs ONE GROUP AHEAD on a worker thread —
          the C++ kernels and the copy release the GIL, so group N+1's host
          prep costs ~0 wall while the main thread does group N's
          layout/dispatch/collect.

        Returns per-group results. The reference has no analog (single image
        at a time); this is the TPU-native replacement for its rayon
        thread-pool overlap (recognition.rs:464-467) at page granularity."""
        from concurrent.futures import ThreadPoolExecutor

        results: list[list[PageResult]] = []
        staged: list[jax.Array] = []  # uploaded, detect not yet dispatched
        detected: list[tuple] = []  # (pages_dev, tables, scale), in order
        dispatched: list[tuple] = []  # (words, lines, inflight), in order
        it = iter(page_batches)
        exhausted = False
        stage_fut = None

        def pump():
            while staged and len(detected) < 2:
                pages = staged.pop(0)
                pages, tables, scale = (pages, *self._detect_tables(pages))
                try:
                    tables.copy_to_host_async()
                except AttributeError:
                    pass
                detected.append((pages, tables, scale))

        ex = ThreadPoolExecutor(max_workers=1)

        def submit_stage():
            nonlocal stage_fut, exhausted
            if stage_fut is None and not exhausted:
                try:
                    nxt = next(it)
                except StopIteration:
                    exhausted = True
                    return
                stage_fut = ex.submit(self._stage_pages, nxt)

        try:
            submit_stage()
            while True:
                if stage_fut is not None:
                    staged.append(stage_fut.result())
                    stage_fut = None
                    submit_stage()  # prefetch the NEXT batch under this turn
                pump()
                if detected and (exhausted or len(detected) >= 2):
                    dispatched.append(self._dispatch_group(*detected.pop(0)))
                    pump()
                while dispatched and (
                    len(dispatched) > 1
                    or (exhausted and not staged and not detected)
                ):
                    results.append(self._collect_group(dispatched.pop(0)))
                if exhausted and not staged and not detected and not dispatched:
                    return results
        finally:
            ex.shutdown(wait=False)

    def _dispatch_group(self, pages_dev, tables, scale) -> tuple:
        """Host-side head of one group's tail: table readback, layout, and
        recognition dispatch (device programs queued, label copies async)."""
        from ..layout import find_text_lines_idx_arrays

        per_page_words, per_arrays = self._tables_to_words_arrays(tables, scale)
        per_page_lines = []
        for words, arrs in zip(per_page_words, per_arrays):
            idx = (
                find_text_lines_idx_arrays(*arrs) if arrs is not None else None
            )
            if idx is None:
                lines = find_text_lines(words)
            else:
                lines = [[words[i] for i in li] for li in idx]
            per_page_lines.append(self._post_layout(lines))
        inflight = self._dispatch_recognition(pages_dev, per_page_lines)
        return per_page_words, per_page_lines, inflight

    def _collect_group(self, group: tuple) -> list[PageResult]:
        """Collect a dispatched group: CTC collapse + line assembly."""
        per_page_words, per_page_lines, inflight = group
        per_page_text = self._collect_recognition(per_page_lines, inflight)
        return [
            PageResult(words=w, lines=l, text_lines=t)
            for w, l, t in zip(per_page_words, per_page_lines, per_page_text)
        ]

    def _finish_group(self, pages_dev, tables, scale) -> list[PageResult]:
        """Host-side tail of one group: table readback, layout, recognition."""
        return self._collect_group(self._dispatch_group(pages_dev, tables, scale))

    def process_normalized(self, pages_dev: jax.Array) -> list[PageResult]:
        """Run OCR on pages already normalized and resident in HBM
        ([B, H, W] float32 in [-0.5, 0.5]). With ``debug=True`` prints
        per-stage wall timings like the engine's get_text."""
        from ..utils.tracing import StageTimer

        timer = StageTimer(debug=self._debug)
        with timer.stage("detect"):
            tables, scale = self._detect_tables(pages_dev)
        with timer.stage("rects_to_host"):
            per_page_words = self._tables_to_words(tables, scale)
        with timer.stage("layout"):
            per_page_lines = [
                self._post_layout(find_text_lines(words))
                for words in per_page_words
            ]
        with timer.stage("recognize"):
            per_page_text = self._recognize_pooled(pages_dev, per_page_lines)
        if self._debug:
            n_words = sum(len(w) for w in per_page_words)
            n_lines = sum(len(l) for l in per_page_lines)
            print(
                f"[ocrs-tpu pipeline] {pages_dev.shape[0]} pages, {n_words} words, "
                f"{n_lines} lines; " + timer.summary()
            )

        return [
            PageResult(words=w, lines=l, text_lines=t)
            for w, l, t in zip(per_page_words, per_page_lines, per_page_text)
        ]
