"""Host-side extraction of K landmark points from GT segmentation masks.

Capability parity with the reference's contour-GT construction
(contour_uncertainty/data/camus/extract_points.py:11-81 and
data/camus/measure.py:98-155, vital/utils/image/us/measure.py:177-224):
apex/base detection on the LV mask, BFS walk along the 8-connected edge from
apex to each base corner, uniform index resampling into points_per_side
landmarks per wall.

This is preprocessing that runs once per dataset and is cached (the reference
caches to a .pt next to the HDF5, data/camus/dataset.py:42-47; we cache to
.npz) — it stays in numpy/scipy on host by design.
"""

from __future__ import annotations

import sys
from collections import deque
from typing import Tuple

import numpy as np
from scipy import ndimage

from contouring_uncertainty_tpu.data.config import Label


def structure_edge(segmentation: np.ndarray, label) -> np.ndarray:
    """Binary edge of a labeled structure: mask minus its 3x3 erosion."""
    mask = np.isin(segmentation, label).astype(int)
    eroded = ndimage.binary_erosion(mask, structure=np.ones((3, 3))).astype(int)
    return mask ^ eroded


def endo_base(
    segmentation: np.ndarray, lv_label=Label.LV, myo_label=Label.MYO
) -> Tuple[np.ndarray, np.ndarray]:
    """Left/right markers at the base of the endocardium, in (y, x)."""
    struct = ndimage.generate_binary_structure(2, 2)
    lv = np.isin(segmentation, lv_label)
    myo = np.isin(segmentation, myo_label)
    others = ~(lv + myo)
    dil_myo = ndimage.binary_dilation(myo, structure=struct)
    dil_others = ndimage.binary_dilation(others, structure=struct)
    ys, xs = np.nonzero(lv * dil_myo * dil_others)
    if len(ys) < 2:
        raise RuntimeError(
            f"Found {len(ys)} LV/MYO frontier markers; need at least 2 for the base."
        )
    if np.all(xs == xs.mean()):
        mask = ys > ys.mean()
        li = ys[mask].argmin()
        ri = ys[~mask].argmax()
    else:
        mask = xs < xs.mean()
        li = ys[mask].argmax()
        ri = ys[~mask].argmax()
    return (
        np.array([ys[mask][li], xs[mask][li]]),
        np.array([ys[~mask][ri], xs[~mask][ri]]),
    )


def lv_apex(segmentation: np.ndarray, lv_label=Label.LV, myo_label=Label.MYO) -> np.ndarray:
    """LV apex: the structure point furthest from the base midpoint, (y, x)."""
    base = endo_base(segmentation, lv_label, myo_label)
    mid = (base[0] + base[1]) / 2.0
    edge = structure_edge(segmentation, lv_label)
    ys, xs = np.nonzero(edge)
    pts = np.stack([ys, xs], axis=-1)
    d = np.linalg.norm(pts - mid, axis=-1)
    return pts[d.argmax()]


def bfs_path(edge: np.ndarray, start: Tuple[int, int], end: Tuple[int, int]) -> np.ndarray:
    """Shortest 8-connected path between two pixels of a binary edge map.

    Returns the ordered path from `start` to `end` (inclusive of start,
    exclusive of end — matching the reference's path.pop() convention
    reversed), as an (L, 2) array of (y, x).
    """
    height, width = edge.shape
    delta = [(-1, -1), (-1, 0), (-1, 1), (0, 1), (1, 1), (1, 0), (1, -1), (0, -1)]
    dist = np.full((height, width), sys.maxsize, dtype=np.int64)
    dist[start[0], start[1]] = 0
    queue = deque([tuple(start)])
    found = False
    while queue:
        y, x = queue.popleft()
        if (y, x) == tuple(end):
            found = True
            break
        for dy, dx in delta:
            yy, xx = y + dy, x + dx
            if 0 <= yy < height and 0 <= xx < width and dist[y, x] + 1 < dist[yy, xx] and edge[yy, xx]:
                dist[yy, xx] = dist[y, x] + 1
                queue.append((yy, xx))
    if not found:
        raise RuntimeError(f"No path found from {start} to {end} along the edge")
    # Backtrack end -> start.
    path = []
    y, x = end
    while dist[y, x] != 0:
        for dy, dx in delta:
            yy, xx = y + dy, x + dx
            if 0 <= yy < height and 0 <= xx < width and dist[yy, xx] == dist[y, x] - 1:
                path.append((yy, xx))
                y, x = yy, xx
                break
    # path currently runs from just-before-end back to start; reverse.
    path = np.array(path[::-1] + [tuple(end)])
    return path


def lv_contour(segmentation: np.ndarray, nb_points: int = 21) -> np.ndarray:
    """K LV endocardium landmarks base1 -> apex -> base2, in (y, x).

    Mirrors extract_points.py:23-47: BFS walks along the edge from the apex
    to each base corner, uniform index subsampling per wall.
    """
    edge = structure_edge(segmentation, Label.LV)
    base = endo_base(segmentation)
    apex = lv_apex(segmentation)

    path1 = bfs_path(edge, tuple(apex), tuple(base[0]))
    path2 = bfs_path(edge, tuple(apex), tuple(base[1]))

    pps = (nb_points + 1) // 2
    idx1 = np.linspace(0, len(path1) - 1, pps).astype(int)
    idx2 = np.linspace(0, len(path2) - 1, pps).astype(int)

    points = np.concatenate(
        [
            base[0][None],
            path1[idx1[1:-1]][::-1],  # wall 1, base-adjacent first
            apex[None],
            path2[idx2[1:-1]],
            base[1][None],
        ],
        axis=0,
    )
    return points


def get_contour_points(segmentation: np.ndarray, nb_points: int = 21,
                       include_myo: bool = False) -> np.ndarray:
    """Landmarks in (x, y) ordering, (K or 2K, 2) float32 (extract_points.py:11-20).

    With include_myo, the epicardium landmarks are appended after the LV endo
    landmarks (the reference's labels=[LV, MYO] contour layout)."""
    pts = lv_contour(segmentation, nb_points)
    if include_myo:
        pts = np.concatenate([pts, myo_contour(segmentation, nb_points)])
    return np.flip(pts, axis=-1).astype(np.float32)


def _convex_hull_mask(mask: np.ndarray) -> np.ndarray:
    """Filled convex hull of a binary mask (skimage.convex_hull_image stand-in)."""
    from matplotlib.path import Path as MplPath
    from scipy.spatial import ConvexHull

    ys, xs = np.nonzero(mask)
    pts = np.stack([xs, ys], -1)
    hull = ConvexHull(pts)
    poly = pts[hull.vertices]
    h, w = mask.shape
    yy, xx = np.mgrid[0:h, 0:w]
    inside = MplPath(poly).contains_points(np.stack([xx.ravel(), yy.ravel()], -1))
    return inside.reshape(h, w).astype(np.uint8)


def myo_contour(segmentation: np.ndarray, nb_points: int = 21) -> np.ndarray:
    """K epicardium landmarks base1 -> apex -> base2, in (y, x).

    Mirrors extract_points.py:50-81 in structure (convex hull of the MYO,
    edge walk between detected corners) with a simplified corner detector:
    the reference's polar-peak extraction
    (vital _extract_landmarks_from_polar_contour) is replaced by casting rays
    from the LV centroid through the endo base corners to the hull edge (the
    epi base corners sit radially outward of the endo base), and the apex is
    the hull point farthest from the base midpoint.
    """
    hull = _convex_hull_mask(np.isin(segmentation, Label.MYO))
    edge = structure_edge(hull, 1)
    edge_pts = np.stack(np.nonzero(edge), -1)  # (M, 2) (y, x)

    endo_b = endo_base(segmentation)
    lv_ys, lv_xs = np.nonzero(np.isin(segmentation, Label.LV))
    center = np.array([lv_ys.mean(), lv_xs.mean()])

    def ray_corner(base_pt):
        d = base_pt - center
        d = d / (np.linalg.norm(d) + 1e-9)
        # Edge point maximizing projection along the ray while staying close
        # to the ray's direction.
        rel = edge_pts - center
        proj = rel @ d
        dist_to_ray = np.abs(rel[:, 0] * d[1] - rel[:, 1] * d[0])
        score = proj - 2.0 * dist_to_ray
        return edge_pts[np.argmax(score)]

    base = (ray_corner(endo_b[0]), ray_corner(endo_b[1]))
    mid = (base[0] + base[1]) / 2.0
    apex = edge_pts[np.argmax(np.linalg.norm(edge_pts - mid, axis=-1))]

    path1 = bfs_path(edge, tuple(apex), tuple(base[0]))
    path2 = bfs_path(edge, tuple(apex), tuple(base[1]))
    pps = (nb_points + 1) // 2
    idx1 = np.linspace(0, len(path1) - 1, pps).astype(int)
    idx2 = np.linspace(0, len(path2) - 1, pps).astype(int)
    return np.concatenate([
        base[0][None], path1[idx1[1:-1]][::-1], apex[None],
        path2[idx2[1:-1]], base[1][None],
    ], axis=0)
