"""On-device oriented word-rect extraction from labelled masks.

The reference does this on CPU with contour tracing + convex hull + rotating
calipers (detection.rs:41-62). On TPU we avoid the pointer-chasing entirely:

  1. :func:`ocrs_tpu.ops.connected_components.label_components_device`
     labels the mask in HBM.
  2. A single segmented-reduction pass computes per-component pixel counts,
     centroids and second moments; the principal (PCA) axis of each
     component gives a near-optimal rect orientation for text blobs.
  3. A short coarse-to-fine angle scan around the PCA angle refines each
     component's angle against the true min-area objective (extent product),
     using segmented min/max of pixel projections. This is the device-side
     stand-in for rotating calipers: exact up to the final angular step
     (default 0.9 degrees, i.e. sub-pixel for word-sized components).

Everything is static-shape: reductions go to a fixed ``max_components``
table; only the tiny [max_components, 6] result table is copied to host.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..geometry import RotatedRect
from .connected_components import label_components_device

_BIG = jnp.float32(3.4e38)


def _segment_minmax(vals: jax.Array, seg: jax.Array, num_segments: int):
    mn = jnp.full((num_segments,), _BIG).at[seg].min(vals, mode="drop")
    mx = jnp.full((num_segments,), -_BIG).at[seg].max(vals, mode="drop")
    return mn, mx


@partial(jax.jit, static_argnames=("max_components", "coarse_steps", "rounds"))
def min_area_rects_device(
    labels: jax.Array,
    max_components: int = 2048,
    coarse_steps: int = 13,
    rounds: int = 3,
):
    """Fit oriented min-area rects to each labelled component.

    `labels`: int32 [H, W], -1 = background (from
    ``label_components_device``). Returns a dict of arrays of length
    ``max_components``: ``valid`` (bool), ``cx, cy, ux, uy, w, h`` (float32)
    where (ux, uy) is the rect's height axis ("up") and ``count`` (int32)
    pixel counts. Width is the extent perpendicular to up; extents are
    max-min of pixel-centre projections, matching the host path's point
    extents.
    """
    h, w = labels.shape
    flat = labels.reshape(-1)

    # Compact arbitrary label values to segment ids [0, max_components).
    uniq = jnp.unique(flat, size=max_components + 1, fill_value=-1)
    # uniq[0] is -1 (background) whenever any background exists; build the
    # component table from positive entries only.
    comp_vals = jnp.where(uniq >= 0, uniq, jnp.iinfo(jnp.int32).max)
    comp_vals = jnp.sort(comp_vals)[:max_components]  # ascending, pad=INT_MAX
    valid = comp_vals < jnp.iinfo(jnp.int32).max

    seg = jnp.searchsorted(comp_vals, flat)  # [H*W]
    seg = jnp.where(flat >= 0, seg, max_components)  # background -> dropped
    seg = jnp.minimum(seg, max_components)

    ys = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0).reshape(-1)
    xs = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1).reshape(-1)

    ns = max_components
    ones = jnp.ones_like(xs)
    count = jnp.zeros((ns,)).at[seg].add(ones, mode="drop")
    sx = jnp.zeros((ns,)).at[seg].add(xs, mode="drop")
    sy = jnp.zeros((ns,)).at[seg].add(ys, mode="drop")
    sxx = jnp.zeros((ns,)).at[seg].add(xs * xs, mode="drop")
    syy = jnp.zeros((ns,)).at[seg].add(ys * ys, mode="drop")
    sxy = jnp.zeros((ns,)).at[seg].add(xs * ys, mode="drop")

    n = jnp.maximum(count, 1.0)
    mx, my = sx / n, sy / n
    cxx = sxx / n - mx * mx
    cyy = syy / n - my * my
    cxy = sxy / n - mx * my

    # Principal-axis angle per component (angle of the major axis).
    theta0 = 0.5 * jnp.arctan2(2.0 * cxy, cxx - cyy)

    def extents(theta):
        """Per-component extents (w, h) and projection mins for angle table
        `theta` [ns]."""
        c = jnp.cos(theta)[seg.clip(0, ns - 1)]
        s = jnp.sin(theta)[seg.clip(0, ns - 1)]
        pu = xs * c + ys * s
        pv = -xs * s + ys * c
        pu_mn, pu_mx = _segment_minmax(pu, seg, ns)
        pv_mn, pv_mx = _segment_minmax(pv, seg, ns)
        return pu_mn, pu_mx, pv_mn, pv_mx

    def scan_angles(base, half_range, steps):
        """Evaluate `steps` offsets in [-half_range, half_range] around the
        per-component `base` angles; return the best angle + geometry."""
        offsets = jnp.linspace(-half_range, half_range, steps)

        def body(carry, off):
            best_area, best = carry
            th = base + off
            pu_mn, pu_mx, pv_mn, pv_mx = extents(th)
            area = (pu_mx - pu_mn) * (pv_mx - pv_mn)
            better = area < best_area
            new_best = tuple(
                jnp.where(better, new, old)
                for new, old in zip((th, pu_mn, pu_mx, pv_mn, pv_mx), best)
            )
            return (jnp.minimum(area, best_area), new_best), None

        init = (
            jnp.full((ns,), _BIG),
            (base, jnp.zeros((ns,)), jnp.zeros((ns,)), jnp.zeros((ns,)), jnp.zeros((ns,))),
        )
        (best_area, best), _ = jax.lax.scan(body, init, offsets)
        return best

    # Coarse scan over the PCA angle's 90-degree ambiguity range, then two
    # refinement rounds shrinking the bracket by the coarse step each time.
    half = jnp.deg2rad(45.0)
    th, pu_mn, pu_mx, pv_mn, pv_mx = scan_angles(theta0, half, coarse_steps)
    step = 2 * half / (coarse_steps - 1)
    for _ in range(rounds - 1):
        th, pu_mn, pu_mx, pv_mn, pv_mx = scan_angles(th, step, 5)
        step = 2 * step / 4

    c, s = jnp.cos(th), jnp.sin(th)
    cu = (pu_mn + pu_mx) / 2.0
    cv = (pv_mn + pv_mx) / 2.0
    cx = cu * c - cv * s
    cy = cu * s + cv * c
    rect_w = pu_mx - pu_mn
    rect_h = pv_mx - pv_mn
    # up axis = v direction (perpendicular to the scanned u axis)
    return {
        "valid": valid & (count > 0),
        "count": count.astype(jnp.int32),
        "cx": cx,
        "cy": cy,
        "ux": -s,
        "uy": c,
        "w": rect_w,
        "h": rect_h,
    }


def rects_from_mask_device(
    mask: jax.Array,
    expand_dist: float,
    min_area: float,
    max_components: int = 2048,
) -> list[RotatedRect]:
    """Device CCL + segmented rect fitting; only the small rect table is
    copied to host. Applies the reference's expand + min-area filtering
    (detection.rs:104-122)."""
    labels = label_components_device(mask)
    table = min_area_rects_device(labels, max_components=max_components)
    table = jax.device_get(table)
    out: list[RotatedRect] = []
    for i in range(max_components):
        if not table["valid"][i]:
            continue
        w = float(table["w"][i]) + 2.0 * expand_dist
        h = float(table["h"][i]) + 2.0 * expand_dist
        if w * h < min_area:
            continue
        out.append(
            RotatedRect(
                (float(table["cx"][i]), float(table["cy"][i])),
                (float(table["ux"][i]), float(table["uy"][i])),
                w,
                h,
            )
        )
    return out
