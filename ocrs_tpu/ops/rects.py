"""On-device oriented word-rect extraction from labelled masks.

The reference does this on CPU with contour tracing + convex hull + rotating
calipers (detection.rs:41-62). The TPU formulation avoids pointer-chasing
*and* avoids scatter-heavy segmented reductions:

  1. :func:`ocrs_tpu.ops.connected_components.label_components_device`
     labels the mask in HBM.
  2. Boundary pixels (mask minus its 8-erosion) are extracted — min/max
     projections of a component are attained on its boundary, so interior
     pixels are dead weight.
  3. One ``argsort`` over the boundary labels groups each component's points
     contiguously; a static-size ``nonzero`` finds segment starts. Each
     component's boundary is then **gathered into a dense
     [max_components, max_points] tile** (uniformly subsampled if longer).
  4. The min-area angle search — a dense scan over candidate angles with two
     refinement rounds (final resolution ~0.9 deg) — runs entirely on these
     dense tiles: pure VPU min/max reductions, no scatters. This is the
     device-side equivalent of rotating calipers, exact up to the final
     angular step.

Only the tiny [max_components] result table is copied to host.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..geometry import RotatedRect
from .connected_components import label_components_device

_INT_MAX = np.iinfo(np.int32).max


@partial(
    jax.jit,
    static_argnames=(
        "max_components",
        "max_points",
        "coarse_steps",
        "rounds",
        "max_boundary",
    ),
)
def min_area_rects_device(
    labels: jax.Array,
    max_components: int = 1024,
    max_points: int = 512,
    coarse_steps: int = 16,
    rounds: int = 3,
    max_boundary: int = 131072,
):
    """Fit oriented min-area rects to each labelled component.

    `labels`: int32 [H, W], -1 = background. Returns a dict of arrays of
    length ``max_components``: ``valid`` (bool), ``cx, cy, ux, uy, w, h``
    (float32) where (ux, uy) is the rect's "up" axis and ``count`` (int32)
    boundary point counts. Extents are max-min of pixel-centre projections,
    matching the host path's point extents.
    """
    h, w = labels.shape
    mask = labels >= 0

    # Boundary extraction: pixels with at least one non-member 8-neighbour.
    mp = jnp.pad(mask, 1, constant_values=False)
    interior = (
        mp[:-2, :-2]
        & mp[:-2, 1:-1]
        & mp[:-2, 2:]
        & mp[1:-1, :-2]
        & mp[1:-1, 2:]
        & mp[2:, :-2]
        & mp[2:, 1:-1]
        & mp[2:, 2:]
    )
    boundary = mask & ~interior

    # Compact boundary pixels first so the sort runs over ~perimeter-many
    # keys instead of H*W (mask-sized argsorts dominate otherwise). Pages
    # with more than `max_boundary` boundary pixels lose the tail components
    # (far beyond any real text mask at detector resolution).
    flat = jnp.where(boundary, labels, _INT_MAX).reshape(-1)
    (bidx,) = jnp.nonzero(flat != _INT_MAX, size=max_boundary, fill_value=-1)
    blab = jnp.where(bidx >= 0, flat[jnp.maximum(bidx, 0)], _INT_MAX)
    p = max_boundary
    order_b = jnp.argsort(blab)  # stable: groups components, padding last
    slab = blab[order_b]
    src = jnp.maximum(bidx[order_b], 0)
    xs_sorted = (src % w).astype(jnp.float32)
    ys_sorted = (src // w).astype(jnp.float32)

    pos = jnp.arange(p, dtype=jnp.int32)
    valid_pt = slab != _INT_MAX
    n_valid = jnp.sum(valid_pt, dtype=jnp.int32)
    new_seg = valid_pt & ((pos == 0) | (slab != jnp.roll(slab, 1)))
    # One extra start is fetched so that when the mask has more than
    # max_components components, the last KEPT segment still ends at the
    # first dropped segment's start instead of absorbing every remaining
    # component's points; the overflow count is surfaced in the table.
    (starts_ext,) = jnp.nonzero(new_seg, size=max_components + 1, fill_value=p)
    starts_ext = starts_ext.astype(jnp.int32)
    starts = starts_ext[:max_components]
    ends = jnp.minimum(starts_ext[1:], n_valid)
    counts = jnp.maximum(ends - starts, 0)
    valid = counts > 0
    n_components = jnp.sum(new_seg, dtype=jnp.int32)
    dropped = jnp.maximum(n_components - max_components, 0)

    # Gather each component's boundary into a dense tile. A [C, K] gather of
    # individually-subsampled positions lowers to C*K scalar gathers
    # (~200ms/16 pages); instead gather ALIGNED BLOCKS of the sorted point
    # arrays — each component's points are contiguous after the sort, so a
    # handful of lane-width rows covers its whole segment — and mask each
    # gathered element by its global position against the segment bounds.
    # Components spanning more than `nb` blocks get uniformly-subsampled
    # blocks (approximate extents, same spirit as point subsampling).
    kb = 64  # block width (half a lane register)
    nb = max(max_points // kb + 2, 3)  # full coverage up to ~max_points
    p_pad = -(-p // kb) * kb
    if p_pad != p:
        pad = ((0, p_pad - p),)
        xs_sorted = jnp.pad(xs_sorted, pad)
        ys_sorted = jnp.pad(ys_sorted, pad)
    blocks = jnp.reshape(xs_sorted, (p_pad // kb, kb))
    blocks_y = jnp.reshape(ys_sorted, (p_pad // kb, kb))
    first_blk = starts // kb
    last_blk = jnp.maximum(ends - 1, starts) // kb
    nspan = last_blk - first_blk + 1
    j = jnp.arange(nb, dtype=jnp.int32)
    blk_idx = first_blk[:, None] + (j[None, :] * nspan[:, None]) // nb  # [C, nb]
    blk_idx = jnp.clip(blk_idx, 0, p_pad // kb - 1)
    px = blocks[blk_idx].reshape(max_components, nb * kb)  # [C, nb*kb]
    py = blocks_y[blk_idx].reshape(max_components, nb * kb)
    gpos = (blk_idx[:, :, None] * kb + jnp.arange(kb, dtype=jnp.int32)).reshape(
        max_components, nb * kb
    )
    in_seg = (gpos >= starts[:, None]) & (gpos < ends[:, None])
    # Out-of-segment lanes collapse onto the segment's first point so they
    # never affect the min/max extents.
    fx = xs_sorted[jnp.clip(starts, 0, p - 1)]
    fy = ys_sorted[jnp.clip(starts, 0, p - 1)]
    px = jnp.where(in_seg, px, fx[:, None])
    py = jnp.where(in_seg, py, fy[:, None])

    # Dense angle scan. Min-area rect angle is 90-deg periodic; scan
    # [-45, 45) coarsely, then refine twice around the best angle.
    def scan(base, half_range, steps, best):
        """best = (area, th, pu_mn, pu_mx, pv_mn, pv_mx), all [C]."""
        offs = (jnp.arange(steps, dtype=jnp.float32) / steps - 0.5) * (2 * half_range)
        th = base[:, None] + offs[None, :]  # [C, A]
        c = jnp.cos(th)[:, :, None]  # [C, A, 1]
        s = jnp.sin(th)[:, :, None]
        pu = px[:, None, :] * c + py[:, None, :] * s  # [C, A, K]
        pv = -px[:, None, :] * s + py[:, None, :] * c
        pu_mn = pu.min(axis=2)
        pu_mx = pu.max(axis=2)
        pv_mn = pv.min(axis=2)
        pv_mx = pv.max(axis=2)
        area = (pu_mx - pu_mn) * (pv_mx - pv_mn)  # [C, A]
        a = jnp.argmin(area, axis=1)  # [C]
        take = lambda m: jnp.take_along_axis(m, a[:, None], axis=1)[:, 0]
        cand = (take(area), take(th), take(pu_mn), take(pu_mx), take(pv_mn), take(pv_mx))
        better = cand[0] < best[0]
        return tuple(jnp.where(better, cn, bo) for cn, bo in zip(cand, best))

    big = jnp.full((max_components,), 3.4e38, jnp.float32)
    zero = jnp.zeros((max_components,), jnp.float32)
    best = (big, zero, zero, zero, zero, zero)
    half = jnp.deg2rad(45.0)
    step = 2 * half / coarse_steps
    best = scan(zero, half, coarse_steps, best)
    for _ in range(rounds - 1):
        best = scan(best[1], step, 8, best)
        step = 2 * step / 8

    _, th, pu_mn, pu_mx, pv_mn, pv_mx = best
    c, s = jnp.cos(th), jnp.sin(th)
    cu = (pu_mn + pu_mx) / 2.0
    cv = (pv_mn + pv_mx) / 2.0
    return {
        "valid": valid,
        "count": counts,
        "dropped": dropped,
        "cx": cu * c - cv * s,
        "cy": cu * s + cv * c,
        "ux": -s,  # up axis = the scanned v direction
        "uy": c,
        "w": pu_mx - pu_mn,
        "h": pv_mx - pv_mn,
    }


def rects_from_mask_device(
    mask: jax.Array,
    expand_dist: float,
    min_area: float,
    max_components: int = 1024,
    solidify: bool = True,
) -> list[RotatedRect]:
    """Device CCL + dense rect fitting; only the small rect table is copied
    to host. Applies the reference's expand + min-area filtering
    (detection.rs:104-122). `solidify` closes stroke-shaped blobs before
    labelling (see label_components_device) — keep it on for real detector
    masks."""
    labels = label_components_device(mask, solidify=solidify)
    table = min_area_rects_device(labels, max_components=max_components)
    return rect_table_to_host(table, expand_dist, min_area)


def rect_table_to_host(
    table: dict, expand_dist: float, min_area: float
) -> list[RotatedRect]:
    for leaf in jax.tree.leaves(table):
        try:
            leaf.copy_to_host_async()
        except AttributeError:
            break
    table = jax.device_get(table)
    dropped = int(np.asarray(table.get("dropped", 0)))
    if dropped > 0:
        from ..utils.log import warn

        warn(
            f"min_area_rects_device: mask had {dropped} more components than "
            "max_components; the overflow components were dropped"
        )
    valid = np.asarray(table["valid"])
    out: list[RotatedRect] = []
    for i in np.nonzero(valid)[0]:
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
