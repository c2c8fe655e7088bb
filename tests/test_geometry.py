import numpy as np
import pytest

from ocrs_tpu.geometry import (
    Line,
    Rect,
    RotatedRect,
    bounding_rect,
    convex_hull,
    leftmost_edge,
    min_area_rect,
    point,
    rightmost_edge,
)


def test_rect_basics():
    r = Rect.from_tlhw(10, 20, 30, 40)
    assert r.top == 10 and r.left == 20 and r.bottom == 40 and r.right == 60
    assert r.width == 40 and r.height == 30
    assert r.area == 1200
    assert np.allclose(r.center(), [40, 25])


def test_rect_union_intersection_iou():
    a = Rect.from_tlbr(0, 0, 10, 10)
    b = Rect.from_tlbr(5, 5, 15, 15)
    assert a.union(b) == Rect.from_tlbr(0, 0, 15, 15)
    assert a.intersection(b) == Rect.from_tlbr(5, 5, 10, 10)
    assert a.intersects(b)
    assert a.iou(b) == pytest.approx(25 / 175)
    c = Rect.from_tlbr(20, 20, 30, 30)
    assert not a.intersects(c)
    assert a.iou(c) == 0.0


def test_rotated_rect_corner_order_matches_reference_fixture():
    # From ocrs-cli/test-data/format-json-expected.json: an axis-aligned
    # rect x in [0,80], y in [0,25] has corners
    # [[80,25],[0,25],[0,0],[80,0]].
    rr = RotatedRect.from_rect(Rect.from_tlbr(0, 0, 25, 80))
    cs = np.stack(rr.corners())
    assert np.allclose(cs, [[80, 25], [0, 25], [0, 0], [80, 0]])


def test_rotated_rect_bounding_rect_roundtrip():
    rr = RotatedRect(point(50, 50), point(0, -1), 20, 10)
    br = rr.bounding_rect()
    assert br == Rect.from_tlbr(45, 40, 55, 60)
    # 45 degree rotation
    up = point(1, -1)
    rr = RotatedRect(point(0, 0), up, 2 * np.sqrt(2), 2 * np.sqrt(2))
    br = rr.bounding_rect()
    assert br.width == pytest.approx(4)
    assert br.height == pytest.approx(4)


def test_orient_towards():
    rr = RotatedRect(point(0, 0), point(0, 1), 30, 10)
    up = rr.orient_towards(point(0, -1))
    assert np.allclose(up.up, [0, -1])
    assert up.width == 30 and up.height == 10
    # 90-degree case swaps width/height
    rr = RotatedRect(point(0, 0), point(1, 0), 30, 10)
    up = rr.orient_towards(point(0, -1))
    assert abs(float(up.up @ np.array([0, -1]))) == pytest.approx(1.0)
    assert up.width == 10 and up.height == 30


def test_line_overlap_and_intersection():
    a = Line.from_endpoints((0, 0), (0, 10))
    b = Line.from_endpoints((5, 5), (5, 20))
    assert a.vertical_overlap(b) == 5
    c = Line.from_endpoints((0, 0), (10, 0))
    d = Line.from_endpoints((5, -5), (5, 5))
    assert c.intersects(d)
    assert not c.intersects(Line.from_endpoints((5, 1), (5, 5)))
    # Collinear overlapping
    assert c.intersects(Line.from_endpoints((5, 0), (20, 0)))
    assert not c.intersects(Line.from_endpoints((11, 0), (20, 0)))


def test_line_y_for_x():
    l = Line.from_endpoints((0, 0), (10, 20))
    assert l.y_for_x(5) == pytest.approx(10)
    assert l.y_for_x(-1) is None
    assert l.y_for_x(11) is None


def test_edges():
    rr = RotatedRect.from_rect(Rect.from_tlbr(0, 0, 10, 20))
    le = leftmost_edge(rr)
    re = rightmost_edge(rr)
    assert le.start[0] == 0 and le.end[0] == 0
    assert re.start[0] == 20 and re.end[0] == 20


def test_convex_hull_and_min_area_rect_axis_aligned():
    ys, xs = np.mgrid[10:21, 5:56]
    pts = np.stack([xs.ravel(), ys.ravel()], axis=1)
    hull = convex_hull(pts)
    assert len(hull) >= 4
    rect = min_area_rect(pts)
    dims = sorted([rect.width, rect.height])
    assert dims == [10, 50]  # extents (max - min)
    br = rect.bounding_rect()
    assert br.top == pytest.approx(10) and br.bottom == pytest.approx(20)
    assert br.left == pytest.approx(5) and br.right == pytest.approx(55)


def test_min_area_rect_rotated():
    # Rotated rectangle of points: should recover the rotation
    base = np.array([[x, y] for x in range(51) for y in range(11)], dtype=np.float64)
    theta = np.deg2rad(30)
    rot = np.array([[np.cos(theta), -np.sin(theta)], [np.sin(theta), np.cos(theta)]])
    pts = base @ rot.T
    rect = min_area_rect(pts)
    dims = sorted([rect.width, rect.height])
    assert np.allclose(dims, [10, 50], atol=1e-6)


def test_bounding_rect_empty():
    assert bounding_rect([]) is None
