"""Clinical metric formulas on device: area, perimeter, FAC, GLS, Simpson volumes.

Capability parity with reference utils/clinical.py:11-110 and
vital/utils/image/us/measure.py + vital/metrics/evaluate/clinical/heart_us.py:13-72,
redesigned for TPU (SURVEY §2.6 #6):

- area/perimeter/FAC/GLS are computed from masks (pixel counts) or contours
  (dense-spline shoelace / arc length) as batched reductions;
- Simpson biplane volumes use a rotate-to-principal-axis + row-sum disk
  decomposition of the LV mask: the mask's second image moments give the long
  axis; after rotating the mask upright, the 20 Simpson disk diameters are
  row-wise widths. This replaces the reference's host marching-squares +
  O(n^2) AV-plane search + 0.5-px ray march (heart_us.py:63-167) with a
  single vectorized computation that vmaps over the MC sample population.

All functions take (..., H, W) masks or (..., K, 2) contours and broadcast.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from contouring_uncertainty_tpu.ops.spline import contour_spline


# --------------------------------------------------------------------- masks

def lv_area(mask: jnp.ndarray, voxelarea=None) -> jnp.ndarray:
    """Structure area in pixels (or physical units when voxelarea given)."""
    area = jnp.sum(mask != 0, axis=(-2, -1)).astype(jnp.float32)
    if voxelarea is not None:
        area = area * voxelarea
    return area


def lv_fac(ed_mask: jnp.ndarray, es_mask: jnp.ndarray) -> jnp.ndarray:
    """Fractional area change (ED - ES) / ED (utils/clinical.py:11-30)."""
    ed = lv_area(ed_mask)
    es = lv_area(es_mask)
    return (ed - es) / ed


# ------------------------------------------------------------------ contours

def contour_perimeter(contour: jnp.ndarray, n_dense: int = 1000) -> jnp.ndarray:
    """Spline arc length of (K, 2) landmarks (utils/clinical.py:32-48)."""
    dense = contour_spline(contour, n=n_dense)
    return jnp.sum(jnp.linalg.norm(jnp.diff(dense, axis=0), axis=-1))


def contour_area(contour: jnp.ndarray, n_dense: int = 1000) -> jnp.ndarray:
    """Shoelace area of the spline polygon (closed by the straight base edge)."""
    dense = contour_spline(contour, n=n_dense)
    x, y = dense[:, 0], dense[:, 1]
    return 0.5 * jnp.abs(
        jnp.sum(x * jnp.roll(y, -1) - jnp.roll(x, -1) * y)
    )


def gls(ed_contour: jnp.ndarray, es_contour: jnp.ndarray) -> jnp.ndarray:
    """Global longitudinal strain between two contours (utils/clinical.py:51-71)."""
    ed_len = contour_perimeter(ed_contour)
    es_len = contour_perimeter(es_contour)
    return (ed_len - es_len) / ed_len


def gls_sequence(contours: jnp.ndarray) -> jnp.ndarray:
    """GLS over a frame sequence, in % vs frame 0 (utils/clinical.py:74-81)."""
    lengths = jax.vmap(contour_perimeter)(contours)
    return (lengths - lengths[0]) / lengths[0] * 100.0


def fac_sequence(masks: jnp.ndarray) -> jnp.ndarray:
    """FAC over a frame sequence, in % vs frame 0 (utils/clinical.py:84-91)."""
    areas = lv_area(masks)
    return (areas - areas[0]) / areas[0] * 100.0


def metric_error(pred, gt, relative: bool = False):
    err = jnp.abs(pred - gt)
    return err / gt if relative else err


# --------------------------------------------------------- mask-space GLS

# Marching-squares segment length per 2x2 cell code at the 0.5 iso-level
# (vertices at edge midpoints): single-corner cuts are sqrt(2)/2, adjacent
# pairs 1, diagonal (saddle) pairs 2*sqrt(2)/2.
_MS_D = 0.7071067811865476
_MS_LUT = jnp.asarray(
    [0.0, _MS_D, _MS_D, 1.0, _MS_D, 1.0, 2 * _MS_D, _MS_D,
     _MS_D, 2 * _MS_D, 1.0, _MS_D, 1.0, _MS_D, _MS_D, 0.0],
    jnp.float32,
)


def mask_perimeter(mask: jnp.ndarray) -> jnp.ndarray:
    """Marching-squares perimeter of a binary (H, W) mask at the 0.5 level.

    Device replacement for the reference's pixel-walk length
    (vital measure.py:355-357 sums steps along the skimage contour): one
    vectorized 2x2-cell pass — cell code -> one-hot -> LUT matmul (the 16-way
    one-hot contraction maps to the MXU; no gather). Both estimators follow
    the digitized boundary, so their ratio across frames — all GLS uses —
    agrees closely (oracle-gated in tests/test_reference_oracle.py)."""
    m = jnp.pad((mask != 0).astype(jnp.float32), 1)
    code = (m[:-1, :-1] + 2 * m[:-1, 1:] + 4 * m[1:, :-1] + 8 * m[1:, 1:])
    onehot = jax.nn.one_hot(code.astype(jnp.int32).ravel(), 16, dtype=jnp.float32)
    return onehot.sum(axis=0) @ _MS_LUT


def _dilate3(m: jnp.ndarray) -> jnp.ndarray:
    """3x3 binary dilation of an (H, W) float 0/1 map."""
    return jax.lax.reduce_window(m, 0.0, jax.lax.max, (3, 3), (1, 1), "SAME")


def mask_endo_base(seg: jnp.ndarray, lv_label: int = 1, myo_label: int = 2,
                   use_myo: bool = True):
    """Left/right base markers of the endocardium from a (H, W) label map.

    Device port of the reference's `EchoMeasure._endo_base`
    (vital measure.py:177-224): base = the LV pixels on the frontier of a
    dilated myocardium AND dilated background, split into left/right halves
    by the frontier's mean x, taking the bottom-most point of each half.
    With `use_myo=False` (binary LV masks — the reference falls back to
    polar-contour landmark peaks, measure.py:257-264) the frontier is the
    whole LV edge and the same bottom-most-per-half rule approximates the
    base corners. Returns ((y_l, x_l), (y_r, x_r), valid)."""
    lv = (seg == lv_label).astype(jnp.float32)
    if use_myo:
        myo = (seg == myo_label).astype(jnp.float32)
        others = 1.0 - jnp.maximum(lv, myo)
        frontier = lv * _dilate3(myo) * _dilate3(others)
    else:
        frontier = lv * _dilate3(1.0 - lv)
    h, w = frontier.shape
    ys = jnp.arange(h, dtype=jnp.float32)[:, None] + jnp.zeros((1, w))
    xs = jnp.arange(w, dtype=jnp.float32)[None, :] + jnp.zeros((h, 1))
    cnt = frontier.sum()
    valid = cnt >= 2
    mean_x = (frontier * xs).sum() / jnp.maximum(cnt, 1.0)
    f, y, x = frontier.ravel(), ys.ravel(), xs.ravel()
    left = f * (x < mean_x)
    right = f * (x >= mean_x)

    def bottom(sel):
        i = jnp.argmax(jnp.where(sel > 0, y, -1.0))
        return y[i], x[i]

    return bottom(left), bottom(right), valid


def mask_longitudinal_length(seg: jnp.ndarray, lv_label: int = 1,
                             myo_label: int = 2,
                             use_myo: bool = True) -> jnp.ndarray:
    """Longitudinal (base-excluded) endocardial length of one label map.

    The reference walks the LV contour from base corner to base corner
    through the apex and sums step lengths (vital measure.py:341-357
    `_lv_longitudinal_length`). Device equivalent: full marching-squares
    perimeter minus the base chord (the base is the near-straight segment
    between the two corners, so its contour length is its chord to first
    order). NaN when the base cannot be identified (reference raises and
    the caller records NaN, view.py:96-97)."""
    lv = seg == lv_label
    per = mask_perimeter(lv)
    (yl, xl), (yr, xr), valid = mask_endo_base(seg, lv_label, myo_label, use_myo)
    chord = jnp.sqrt((yl - yr) ** 2 + (xl - xr) ** 2)
    length = jnp.maximum(per - chord, 1e-3)
    return jnp.where(valid, length, jnp.nan)


def gls_mask_sequence(segs: jnp.ndarray, lv_label: int = 1, myo_label: int = 2,
                      use_myo: bool = True) -> jnp.ndarray:
    """GLS curve (%) over an (N, H, W) label-map sequence vs frame 0
    (reference EchoMeasure.gls, vital measure.py:322-367)."""
    lengths = jax.vmap(
        lambda s: mask_longitudinal_length(s, lv_label, myo_label, use_myo)
    )(segs)
    return (lengths - lengths[0]) / lengths[0] * 100.0


# ----------------------------------------------------- Simpson biplane volume

def _principal_axis(mask: jnp.ndarray):
    """Centroid + unit long-axis direction from image moments. mask (H, W)."""
    h, w = mask.shape
    yy = jnp.arange(h, dtype=jnp.float32)[:, None]
    xx = jnp.arange(w, dtype=jnp.float32)[None, :]
    m = mask.astype(jnp.float32)
    total = jnp.maximum(m.sum(), 1.0)
    cy = (m * yy).sum() / total
    cx = (m * xx).sum() / total
    myy = (m * (yy - cy) ** 2).sum() / total
    mxx = (m * (xx - cx) ** 2).sum() / total
    mxy = (m * (yy - cy) * (xx - cx)).sum() / total
    # Leading eigenvector of [[myy, mxy], [mxy, mxx]] in (y, x) coords.
    half = 0.5 * (myy + mxx)
    rad = jnp.sqrt(jnp.maximum(0.25 * (myy - mxx) ** 2 + mxy * mxy, 1e-12))
    lam = half + rad
    vy = jnp.where(jnp.abs(mxy) > 1e-9, mxy, 1.0)
    vx = jnp.where(jnp.abs(mxy) > 1e-9, lam - myy, jnp.where(myy >= mxx, 0.0, 1.0))
    n = jnp.sqrt(vy * vy + vx * vx)
    vy, vx = vy / n, vx / n
    # Orient toward the apex (up the image: negative y).
    flip = jnp.where(vy > 0, -1.0, 1.0)
    return cy, cx, vy * flip, vx * flip


@partial(jax.jit, static_argnames=("n_disks", "n_steps"))
def lv_disk_diameters(mask: jnp.ndarray, voxelspacing, n_disks: int = 20,
                      n_steps: int = 256) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Simpson disk diameters (mm) + step size (mm) for a binary LV mask.

    The long axis runs from the basal extreme to the apical extreme of the
    mask along its principal axis; diameters are chord widths perpendicular
    to it, measured by sub-pixel sampling of the mask.
    """
    h, w = mask.shape
    m = (mask != 0).astype(jnp.float32)
    vs = jnp.asarray(voxelspacing, jnp.float32)
    # Work in physical coordinates so anisotropic voxels are handled exactly.
    cy, cx, vy, vx = _principal_axis(m)
    # Physical-space axis direction.
    py, px = vy * vs[0], vx * vs[1]
    pn = jnp.sqrt(py * py + px * px)
    py, px = py / pn, px / pn

    # Project mask pixels onto the axis to find apex/base extremes (physical mm).
    yy = jnp.arange(h, dtype=jnp.float32)[:, None] * vs[0]
    xx = jnp.arange(w, dtype=jnp.float32)[None, :] * vs[1]
    proj = (yy - cy * vs[0]) * py + (xx - cx * vs[1]) * px
    proj_fg = jnp.where(m > 0, proj, jnp.nan)
    t_min = jnp.nanmin(proj_fg)  # basal end
    t_max = jnp.nanmax(proj_fg)  # apical end
    length = t_max - t_min

    # Normal direction in physical space.
    ny, nx = -px, py
    # Sample the mask bilinearly along each disk's chord.
    fractions = jnp.linspace(0.0, 1.0, n_disks, endpoint=False)
    max_half = 0.5 * jnp.sqrt((h * vs[0]) ** 2 + (w * vs[1]) ** 2)
    s = jnp.linspace(-1.0, 1.0, n_steps) * max_half

    base_y = cy * vs[0] + t_min * py
    base_x = cx * vs[1] + t_min * px

    def diameter(frac):
        oy = base_y + frac * length * py
        ox = base_x + frac * length * px
        sy = (oy + s * ny) / vs[0]
        sx = (ox + s * nx) / vs[1]
        vals = jax.scipy.ndimage.map_coordinates(
            m, [sy, sx], order=0, mode="constant", cval=0.0
        )
        # Chord width = covered length along the sample line.
        step_len = s[1] - s[0]
        return jnp.sum(vals) * step_len

    diameters = jax.vmap(diameter)(fractions)
    step_size = length / n_disks
    return diameters, step_size


def lv_volume(a2c_diameters, a4c_diameters, step_size) -> jnp.ndarray:
    """Biplane Simpson volume in ml (heart_us.py:50-72): mm -> m -> ml."""
    d2 = a2c_diameters / 1000.0
    d4 = a4c_diameters / 1000.0
    step = step_size / 1000.0
    return jnp.sum(d2 * d4) * step * jnp.pi / 4.0 * 1e6


@jax.jit
def compute_left_ventricle_volumes(
    a2c_ed, a2c_es, a2c_voxelspacing, a4c_ed, a4c_es, a4c_voxelspacing
):
    """ED/ES Simpson-biplane LV volumes from binary masks of both views."""
    d2_ed, s2_ed = lv_disk_diameters(a2c_ed, a2c_voxelspacing)
    d2_es, s2_es = lv_disk_diameters(a2c_es, a2c_voxelspacing)
    d4_ed, s4_ed = lv_disk_diameters(a4c_ed, a4c_voxelspacing)
    d4_es, s4_es = lv_disk_diameters(a4c_es, a4c_voxelspacing)
    step = jnp.maximum(jnp.maximum(s2_ed, s2_es), jnp.maximum(s4_ed, s4_es))
    ed_volume = lv_volume(d2_ed, d4_ed, step)
    es_volume = lv_volume(d2_es, d4_es, step)
    return ed_volume, es_volume


def ejection_fraction(edv, esv):
    return (edv - esv) / edv


# ------------------------------------------------------------ lung (JSRT)

def mask_width(mask: jnp.ndarray) -> jnp.ndarray:
    """Widest horizontal extent (px) of a binary (H, W) mask: max over rows
    of (rightmost - leftmost + 1)."""
    m = mask != 0
    w = m.shape[-1]
    xs = jnp.arange(w, dtype=jnp.float32)
    mx = jnp.max(jnp.where(m, xs, -1.0), axis=-1)
    mn = jnp.min(jnp.where(m, xs, float(w)), axis=-1)
    spans = jnp.where(m.any(axis=-1), mx - mn + 1.0, 0.0)
    return spans.max(axis=-1)


def cardiothoracic_ratio(seg: jnp.ndarray, lung_label: int = 1,
                         heart_label: int = 2) -> jnp.ndarray:
    """Cardiothoracic ratio from a JSRT (H, W) label map: maximal cardiac
    silhouette width over maximal thoracic width (outer extent of the lung
    fields — the lungs' lateral borders trace the inner rib cage on a PA
    film). Standard chest-film measurement; computable from exactly the
    BG/LUNG/HEART labels the reference's lung masks carry
    (data/lung/config.py:9-19, utils.py LungContourToMask)."""
    heart_w = mask_width(seg == heart_label)
    thorax_w = mask_width((seg == lung_label) | (seg == heart_label))
    return jnp.where(thorax_w > 0, heart_w / jnp.maximum(thorax_w, 1.0),
                     jnp.nan)


def lung_mask_metrics(seg: jnp.ndarray, lung_label: int = 1,
                      heart_label: int = 2) -> jnp.ndarray:
    """(H, W) label map -> stacked [lung_area, heart_area, CTR] (areas in
    px^2). Stacked so a whole (Te, Ta) MC population reduces in one vmapped
    device call (results/lung_clinical.py)."""
    lung_area = jnp.sum(seg == lung_label).astype(jnp.float32)
    heart_area = jnp.sum(seg == heart_label).astype(jnp.float32)
    return jnp.stack([lung_area, heart_area, cardiothoracic_ratio(
        seg, lung_label, heart_label)])
