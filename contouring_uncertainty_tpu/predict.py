"""Prediction / uncertainty-propagation pipeline (the reference's Stack 2).

Capability parity with ContourUncertaintyTask.predict_step +
AleatoricUncertaintyTask._predict_step
(task/regression/contour_uncertainty.py:71-130, task/regression/aleatoric.py:80-135):

per view:  T_e epistemic forwards -> per-point (mu, Sigma) -> PSM contour
sampling (T_a per forward) -> aleatoric/epistemic covariance fusion ->
posterior stats from the sample population -> mask rasterization of every
sample -> uncertainty map + entropy map -> point/instant uncertainty scalars
-> BatchResult.

TPU-first: everything between the forward pass and the BatchResult
(sampling, N*T_e*T_a rasterizations, umaps, entropy, eigendecompositions,
projections) is one jitted device computation per view; the reference ran all
of it as host-side Python loops (SURVEY Stack 2 'HOT' notes).
"""

from __future__ import annotations

from functools import partial
from pathlib import Path
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from contouring_uncertainty_tpu.data.config import BatchResult, Label, Tags
from contouring_uncertainty_tpu.distributions.linalg import det2x2, eigh2x2
from contouring_uncertainty_tpu.ops.rasterize import rasterize_batch
from contouring_uncertainty_tpu.sampler import PosteriorShapeModelSampler, fit_shape_prior
from contouring_uncertainty_tpu.sampler.prior import ShapePrior, load_prior, save_prior
from contouring_uncertainty_tpu.utils.projection import projected_uncertainty_value
from contouring_uncertainty_tpu.utils.umap import uncertainty_map


def get_or_fit_sequence_prior(data, path: Optional[str]) -> ShapePrior:
    """Sequence (ED+ES stacked) prior: load or fit from paired train contours
    (reference sequence_sampler.py:167-241 generator)."""
    if path:
        p = Path(path)
        if p.exists():
            return load_prior(p)
    pairs = []
    for view in data.predict_views("train"):
        inst = view.get(Tags.instants) or {}
        if "ED" in inst and "ES" in inst and inst["ED"] != inst["ES"]:
            c = np.asarray(view[Tags.contour])
            pairs.append(np.concatenate([c[inst["ED"]], c[inst["ES"]]]))
    if not pairs:
        raise ValueError(
            "sequence_sampler=True requires views with distinct ED and ES "
            "instants to fit the two-instant shape prior, but none were found "
            "in this dataset's train split."
        )
    prior = fit_shape_prior(np.stack(pairs))
    if path:
        p = Path(path)
        p.parent.mkdir(parents=True, exist_ok=True)
        save_prior(p, prior)
    return prior


def get_or_fit_prior(data, path: Optional[str]) -> ShapePrior:
    """Load a shape prior, or fit one from the training contours and cache it
    (the reference ships pre-fitted .npy priors; psm.py:453-554 generates them)."""
    if path:
        p = Path(path)
        if p.exists():
            return load_prior(p)
    train = data.train_arrays("train")
    prior = fit_shape_prior(np.asarray(train[Tags.contour]))
    if path:
        p = Path(path)
        p.parent.mkdir(parents=True, exist_ok=True)
        save_prior(p, prior)
    return prior


def fuse_epistemic_aleatoric(mu: jnp.ndarray, cov: jnp.ndarray):
    """(N, T_e, K, 2) means + (N, T_e, K, 2, 2) covs -> fused (N, K, 2)/(N, K, 2, 2).

    cov = mean_t(cov) + cov_t(mu)  (aleatoric + epistemic, aleatoric.py:90-94).
    """
    mu_mean = mu.mean(axis=1)
    cov_al = cov.mean(axis=1)
    d = mu - mu_mean[:, None]
    cov_ep = jnp.mean(d[..., :, None] * d[..., None, :], axis=1)
    return mu_mean, cov_al + cov_ep


def population_posterior(samples: jnp.ndarray):
    """Sample-population stats: (N, T_e, T_a, K, 2) -> post_mu (N,K,2), post_cov (N,K,2,2)
    (aleatoric.py:96-108: per-T_e sample covariances + epistemic spread)."""
    post_mu_te = samples.mean(axis=2)  # (N, T_e, K, 2)
    d = samples - post_mu_te[:, :, None]
    t_a = samples.shape[2]
    denom = jnp.maximum(t_a - 1, 1)
    post_cov_te = jnp.sum(d[..., :, None] * d[..., None, :], axis=2) / denom
    post_mu = post_mu_te.mean(axis=1)
    dd = post_mu_te - post_mu[:, None]
    post_cov_ep = jnp.mean(dd[..., :, None] * dd[..., None, :], axis=1)
    return post_mu, post_cov_te.mean(axis=1) + post_cov_ep


def sample_entropy_map(pred_samples: jnp.ndarray) -> jnp.ndarray:
    """Binary entropy (base 2) of the sample-mask population
    (reference uncertainty.py:106-133). pred_samples: (N, T_e, T_a, H, W)."""
    p = pred_samples.mean(axis=(1, 2))
    ent = -(p * jnp.log2(p + 1e-12) + (1 - p) * jnp.log2(1 - p + 1e-12))
    return jnp.where(jnp.isfinite(ent), ent, 0.0)


def point_instant_uncertainty(mu, cov, post_cov, umap, entropy, pred, groups=None):
    """Scalar uncertainty derivations (contour_uncertainty.py:77-128), on device."""
    if groups is None:
        groups = ((0, mu.shape[-2], 1),)
    def cov_scalars(c, prefix):
        vals, _ = eigh2x2(c)
        sq = jnp.sqrt(jnp.maximum(vals, 0.0))
        return {
            f"{prefix}cov_xx": jnp.sqrt(c[..., 0, 0]),
            f"{prefix}cov_yy": jnp.sqrt(c[..., 1, 1]),
            f"{prefix}cov_det": jnp.maximum(det2x2(c), 0.0) ** 0.25,
            f"{prefix}cov_eigval_sum": sq.sum(-1),
        }

    point_u = cov_scalars(cov, "")
    if post_cov is not None:
        point_u.update(cov_scalars(post_cov, "post_"))

    vals, _ = eigh2x2(cov)
    sq = jnp.sqrt(jnp.maximum(vals, 0.0))
    # Floor at 1 px: an (untrained/degenerate) empty prediction must yield 0
    # mean-uncertainty scalars, not inf (same guard as SegPredictor).
    mask_area = jnp.maximum(jnp.sum(pred != int(Label.BG), axis=(-2, -1)), 1)
    cov_projection = sum(
        jax.vmap(projected_uncertainty_value)(mu[:, a:b], cov[:, a:b])
        for a, b, _ in groups
    )
    instant_u = {
        "cov_det_mean": point_u["cov_det"].mean(-1),
        "cov_eigenvalue_mean": sq.mean(axis=(-1, -2)),
        "cov_projection": cov_projection,
        "umap_mean": jnp.sum(umap, axis=(-2, -1)) / mask_area,
    }
    if entropy is not None:
        instant_u["entropy_mean"] = jnp.sum(entropy, axis=(-2, -1)) / mask_area
    return point_u, instant_u


class _ViewPredictor:
    """Shared jit/vmap plumbing for the per-view predictors.

    Subclasses define `_view_fn(variables, img, key)` over one view
    (img (N, C, H, W)). `__call__` serves one view; `batched` serves a
    stacked (V, N, C, H, W) view group, vmapped over V and — when the
    predictor was built with a mesh — sharded over the mesh's data axis
    (one view per chip: embarrassingly parallel, no collectives)."""

    mesh = None
    _jitted: Dict
    _jitted_batched: Dict

    def __call__(self, variables, img: jnp.ndarray, key) -> Dict:
        from contouring_uncertainty_tpu.parallel.serving import sample_axis_scope

        n = img.shape[0]
        if n not in self._jitted:
            fn = self._view_fn
            if self.mesh is not None and self.mesh.devices.size > 1:
                # Latency mode: ONE view, its Monte-Carlo sample axis sharded
                # across EVERY mesh axis (parallel/serving.py
                # constrain_sample_axis) so the per-sample chain — PSM
                # sampling, rasterization, entropy — partitions over all
                # chips. (The batched() path shards whole views over the data
                # axis instead; on a composed 2D mesh it additionally shards
                # samples over the model axis — see batched().)
                fn = partial(fn, shard_samples=True)
            with sample_axis_scope(self.mesh.axis_names if self.mesh is not None
                                   else ()):
                self._jitted[n] = jax.jit(fn)
                return self._jitted[n](variables, img, key)
        return self._jitted[n](variables, img, key)

    def batched(self, variables, imgs: jnp.ndarray, keys) -> Dict:
        """imgs (V, N, C, H, W), keys (V,) -> view-stacked output dict.

        With a 1D mesh: pure view DP (one view's whole pipeline per chip,
        zero collectives). With a COMPOSED 2D mesh (make_mesh(n,
        model_parallel=s), cfg `predict_sample_parallel`): views shard over
        the data axis AND each view's Monte-Carlo sample chain shards over
        the model axis — for the few-views-on-many-chips regime where pure
        view DP leaves chips idle (VERDICT r4 item 8).
        """
        from contouring_uncertainty_tpu.parallel.serving import sample_axis_scope

        shape = imgs.shape[:2]
        if shape not in self._jitted_batched:
            from contouring_uncertainty_tpu.parallel.mesh import MODEL_AXIS

            composed = (self.mesh is not None
                        and self.mesh.shape.get(MODEL_AXIS, 1) > 1)
            view_fn = (partial(self._view_fn, shard_samples=True)
                       if composed else self._view_fn)
            fn = jax.vmap(view_fn, in_axes=(None, 0, 0))
            if self.mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec as P

                from contouring_uncertainty_tpu.parallel.mesh import DATA_AXIS

                view_shard = NamedSharding(self.mesh, P(DATA_AXIS))
                repl = NamedSharding(self.mesh, P())
                fn = jax.jit(fn, in_shardings=(repl, view_shard, view_shard))
            else:
                fn = jax.jit(fn)
            with sample_axis_scope((MODEL_AXIS,) if composed else ()):
                self._jitted_batched[shape] = fn
                return self._jitted_batched[shape](variables, imgs, keys)
        return self._jitted_batched[shape](variables, imgs, keys)


def _gaussian_blur(masks: jnp.ndarray, sigma: float = 5.0, truncate: float = 1.0):
    """Separable Gaussian blur over trailing (H, W); the reference's soft-mask
    option (contour_uncertainty.py:44-50: skimage.filters.gaussian + min-max)."""
    radius = int(truncate * sigma + 0.5)
    x = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    k = jnp.exp(-0.5 * (x / sigma) ** 2)
    k = k / k.sum()
    lead = masks.shape[:-2]
    flat = masks.reshape((-1,) + masks.shape[-2:])
    blurred = jax.vmap(lambda m: jnp.apply_along_axis(
        lambda v: jnp.convolve(v, k, mode="same"), 0,
        jnp.apply_along_axis(lambda v: jnp.convolve(v, k, mode="same"), 1, m)))(flat)
    lo = blurred.min(axis=(-2, -1), keepdims=True)
    hi = blurred.max(axis=(-2, -1), keepdims=True)
    return ((blurred - lo) / jnp.maximum(hi - lo, 1e-8)).reshape(masks.shape)


class AleatoricPredictor(_ViewPredictor):
    """Jitted per-view uncertainty propagation for contour tasks.

    `contour_groups` describes multi-structure landmark vectors as
    (start, end, label) slices (e.g. JSRT right-lung/left-lung/heart,
    data/lung.py STRUCTURES); each structure is splined/rasterized/projected
    independently (the reference used per-dataset contour_to_mask fns).

    `mesh` enables multi-chip data-parallel serving: `batched()` vmaps the
    whole view pipeline over a leading view axis sharded across the mesh's
    data axis, so each chip propagates its own views end-to-end with zero
    inter-chip communication (parallel/serving.py; the reference serves on
    one GPU — SURVEY §2.5).
    """

    def __init__(self, task, model, sampler: PosteriorShapeModelSampler,
                 t_a: Optional[int] = None, soft_mask: bool = False,
                 contour_groups=None, mesh=None):
        self.task = task
        self.model = model
        self.sampler = sampler
        self.t_a = t_a or task.t_a
        self.soft_mask = soft_mask
        self.mesh = mesh
        k = task.data_params.out_shape[0]
        self.groups = tuple(contour_groups) if contour_groups else ((0, k, 1),)
        self._jitted = {}
        self._jitted_batched = {}

    def _rasterize_labelmap(self, points, h, w):
        """(..., K, 2) multi-structure landmarks -> (..., H, W) label map.

        Painted in DESCENDING label order so the lowest label wins overlaps
        — the reference converts to per-class channels and argmaxes in label
        order (np.argmax takes the first max), e.g. JSRT lungs (1) beat the
        heart (2) where their polygons overlap (data/lung/utils.py:44-70)."""
        out = None
        for start, end, label in sorted(self.groups, key=lambda g: -g[2]):
            mask = rasterize_batch(points[..., start:end, :], h, w)
            lab = jnp.asarray(float(label), mask.dtype)
            out = mask * lab if out is None else jnp.where(mask > 0, lab, out)
        return out

    def _view_fn(self, variables, img, key, shard_samples=False):
        from contouring_uncertainty_tpu.parallel.serving import constrain_sample_axis
        from contouring_uncertainty_tpu.utils.umap import skew_umap

        smesh = self.mesh if shard_samples else None
        h, w = img.shape[-2:]
        out = self.task.predict(self.model, variables, img, rng=key, mesh=smesh)
        skew = len(out) == 3
        if skew:
            mu_te, cov_te, alpha_te = out
            samples = self.sampler.sample_batch(
                jax.random.fold_in(key, 1), mu_te, cov_te, alpha=alpha_te, n=self.t_a
            )
        else:
            mu_te, cov_te = out
            alpha_te = None
            samples = self.sampler.sample_batch(
                jax.random.fold_in(key, 1), mu_te, cov_te, n=self.t_a
            )  # (N, T_e, T_a, K, 2)
        samples = constrain_sample_axis(samples, smesh, 2)
        mu, cov = fuse_epistemic_aleatoric(mu_te, cov_te)
        post_mu, post_cov = population_posterior(samples)

        pred_samples = constrain_sample_axis(
            self._rasterize_labelmap(samples, h, w), smesh, 2
        )  # (N, T_e, T_a, H, W)
        if self.soft_mask:
            # Soft masks are only meaningful for a single binary structure
            # (reference convert_to_mask soft_mask path is binary-only too).
            assert len(self.groups) == 1, "soft_mask requires a single structure"
            pred_samples = _gaussian_blur((pred_samples > 0).astype(jnp.float32))

        def group_umap(fn):
            multi = len(self.groups) > 1
            total = None
            for start, end, _ in self.groups:
                u = fn(start, end)
                if multi:
                    # Reference LungUMap (data/lung/utils.py:74-95): each
                    # structure's umap is normalized by its own max before
                    # summing, and the sum is clipped to [0, 1].
                    peak = jnp.max(u, axis=(-2, -1), keepdims=True)
                    u = u / jnp.maximum(peak, 1e-12)
                total = u if total is None else total + u
            return jnp.clip(total, 0.0, 1.0) if multi else total

        if skew:
            # Skew path (aleatoric_skew.py:54-130): alpha averaged over T_e,
            # mode + umap from the skew projection, pred = rasterized mode.
            alpha = alpha_te.mean(axis=1)
            modes, umap = [], None
            for start, end, _ in self.groups:
                m_g, u_g = jax.vmap(
                    lambda m, c, a: skew_umap(m, c, a, (h, w))
                )(mu[:, start:end], cov[:, start:end], alpha[:, start:end])
                modes.append(m_g)
                if len(self.groups) > 1:
                    # Reference LungSkewUmap (data/lung/utils.py:98-120):
                    # per-structure max-normalize, clipped sum.
                    peak = jnp.max(u_g, axis=(-2, -1), keepdims=True)
                    u_g = u_g / jnp.maximum(peak, 1e-12)
                umap = u_g if umap is None else umap + u_g
            if len(self.groups) > 1:
                umap = jnp.clip(umap, 0.0, 1.0)
            mode = jnp.concatenate(modes, axis=1)
            pred = self._rasterize_labelmap(mode, h, w).astype(jnp.int32)
        else:
            alpha = None
            mode = mu
            umap = group_umap(lambda a, b: jax.vmap(
                lambda m, c: uncertainty_map(m, c, (h, w))
            )(mu[:, a:b], cov[:, a:b]))
            if len(self.groups) == 1:
                label = float(self.groups[0][2])
                occupancy = (pred_samples if self.soft_mask
                             else (pred_samples > 0).astype(jnp.float32))
                pred = (jnp.where(occupancy.mean(axis=(1, 2)) > 0.5, label, 0.0)
                        ).astype(jnp.int32)
            else:
                # Multi-structure: label maps can't be meaningfully averaged;
                # use the fused-mean contour's rasterization as the prediction.
                pred = self._rasterize_labelmap(mu, h, w).astype(jnp.int32)
        occ = pred_samples if self.soft_mask else (pred_samples > 0).astype(jnp.float32)
        entropy = sample_entropy_map(occ)
        point_u, instant_u = point_instant_uncertainty(
            mu, cov, post_cov, umap, entropy, pred, groups=self.groups
        )
        if not self.soft_mask:
            # Hard-mask populations hold small integer labels: ship them as
            # uint8. The (N, T_e, T_a, H, W) population is by far the largest
            # predictor output (TMI budget: 131 MB/view in f32) and every
            # consumer thresholds with `> 0.5` — 4x less device->host
            # traffic per view (the tunnel streams ~26 MB/s). The f32 form
            # stays internal (entropy/occupancy read it before this cast).
            pred_samples = pred_samples.astype(jnp.uint8)
        return {
            "mu": mu, "cov": cov, "mode": mode, "alpha": alpha,
            "post_mu": post_mu, "post_cov": post_cov,
            "contour_samples": samples, "pred_samples": pred_samples,
            "pred": pred, "uncertainty_map": umap, "entropy_map": entropy,
            "point_uncertainty": point_u, "instant_uncertainty": instant_u,
        }


class SegPredictor(_ViewPredictor):
    """Jitted per-view prediction for segmentation-uncertainty baselines.

    Capability parity with SegmentationUncertaintyTask.predict_step
    (task/segmentation/segmentation_uncertainty.py:60-180): (T_e, T_a) prob
    sample population -> fill-holes + largest-blob post-processing -> entropy
    map with a 10-px zeroed border -> mean prediction + instant scalars.
    """

    BORDER_PAD = 10

    def __init__(self, task, model, mesh=None):
        self.task = task
        self.model = model
        self.mesh = mesh
        self._jitted = {}
        self._jitted_batched = {}

    def _view_fn(self, variables, img, key, shard_samples=False):
        from contouring_uncertainty_tpu.ops.morphology import postprocess_batch
        from contouring_uncertainty_tpu.parallel.serving import constrain_sample_axis

        smesh = self.mesh if shard_samples else None
        probs = self.task.predict_probs(self.model, variables, img, key,
                                        mesh=smesh)
        probs = constrain_sample_axis(probs, smesh, 2)
        # (N, T_e, T_a, C, H, W); binary case C == 1.
        binary = probs.shape[3] == 1
        if binary:
            samples = probs[:, :, :, 0]  # (N, T_e, T_a, H, W) probabilities
            post = postprocess_batch(jnp.round(samples))
            samples = samples * post  # keep probabilities, zero spurious blobs
            p_mean = samples.mean(axis=(1, 2))
            entropy = sample_entropy_map(samples)
            pred = jnp.round(p_mean).astype(jnp.int32)
        else:
            # Multiclass: argmax of the MEAN probabilities (reference
            # segmentation_uncertainty.py pred.argmax(1)); per-pixel class
            # entropy of the mean probs, base C; samples stored as label maps.
            c = probs.shape[3]
            mean_probs = probs.mean(axis=(1, 2))  # (N, C, H, W)
            pred = jnp.argmax(mean_probs, axis=1).astype(jnp.int32)
            entropy = -jnp.sum(
                mean_probs * jnp.log(mean_probs + 1e-12), axis=1
            ) / jnp.log(float(c))
            samples = jnp.argmax(probs, axis=3).astype(jnp.float32)
            # Morphological cleanup on the foreground union per sample (the
            # reference applies fill-holes + largest-blob per MC sample).
            union = postprocess_batch((samples > 0).astype(jnp.float32))
            samples = samples * union
            pred = (pred * postprocess_batch((pred > 0).astype(jnp.float32))
                    ).astype(jnp.int32)
        pad = self.BORDER_PAD
        h, w = entropy.shape[-2:]
        border = jnp.zeros((h, w), bool).at[pad:-pad, pad:-pad].set(True)
        entropy = entropy * border[None]
        mask_area = jnp.maximum(jnp.sum(pred != 0, axis=(-2, -1)), 1)
        instant_u = {
            "entropy_mean": jnp.sum(entropy, axis=(-2, -1)) / mask_area,
        }
        return {
            "pred": pred,
            "pred_samples": samples,
            "uncertainty_map": entropy,
            "entropy_map": entropy,
            "instant_uncertainty": instant_u,
        }


def _cfg_views_per_step(cfg) -> int:
    """Parse `predict_batch_views` once for every predict entry point
    (run_predict / run_predict_segmentation must never diverge on the key
    name, default, or guard)."""
    return max(int(cfg.get("predict_batch_views", 1) or 1), 1)


def _run_predictor(predictor, variables, views, key,
                   views_per_step: int = 1) -> List[Dict]:
    """Run a predictor over a view list, via the vmapped batched path when
    more than one view fits per dispatch.

    Views are grouped by image shape into chunks of
    V = views_per_step x data-axis size (ragged tails padded by repeating the
    last view; padding outputs are dropped). `views_per_step > 1` batches
    views per DEVICE: the TMI-budget view step only feeds the MXU batch-20
    forwards, so stacking views recovers most of the large-batch serving
    rate (measured round 3 on v5e: V=4 is the single-chip throughput point,
    35 -> 57 views/s; V=8 is flat). With a multi-device mesh the stacked
    views are additionally sharded one group per chip (parallel/serving.py).
    Every view keeps its position-derived fold_in(key, vi) key, so
    the outputs match the sequential path regardless of grouping — to f32
    tolerance, not bitwise: the vmapped compilation re-associates the
    rasterizer's crossing math, so isolated thresholded fill-boundary pixels
    can flip (tests/test_parallel.py bounds the mask mismatch).
    """
    n_dev = 1
    if predictor.mesh is not None:
        from contouring_uncertainty_tpu.parallel.mesh import DATA_AXIS

        n_dev = predictor.mesh.shape[DATA_AXIS]
    v_per_step = max(int(views_per_step), 1) * n_dev
    if v_per_step == 1:
        return [
            jax.tree.map(np.asarray, predictor(
                variables, jnp.asarray(v[Tags.img]), jax.random.fold_in(key, vi)
            ))
            for vi, v in enumerate(views)
        ]
    groups: Dict[tuple, List[int]] = {}
    for vi, v in enumerate(views):
        groups.setdefault(tuple(np.asarray(v[Tags.img]).shape), []).append(vi)
    outs: List[Optional[Dict]] = [None] * len(views)
    for idxs in groups.values():
        for start in range(0, len(idxs), v_per_step):
            chunk = idxs[start:start + v_per_step]
            padded = chunk + [chunk[-1]] * (v_per_step - len(chunk))
            imgs = jnp.stack([jnp.asarray(views[i][Tags.img]) for i in padded])
            keys = jnp.stack([jax.random.fold_in(key, i) for i in padded])
            out = jax.tree.map(np.asarray, predictor.batched(variables, imgs, keys))
            for j, i in enumerate(chunk):
                outs[i] = jax.tree.map(lambda a, j=j: a[j], out)
    return outs


def run_predict_segmentation(task, variables, data, cfg, split: str = "test",
                             mesh=None) -> List[BatchResult]:
    model = task.build_model()
    predictor = SegPredictor(task, model, mesh=mesh)
    key = jax.random.key(cfg.get("seed", 10))
    views = list(data.predict_views(split))
    outs = _run_predictor(predictor, variables, views, key,
                          views_per_step=_cfg_views_per_step(cfg))
    results = []
    for view, out in zip(views, outs):
        results.append(BatchResult(
            id=view[Tags.id],
            labels=task.data_params.labels,
            img=np.asarray(view[Tags.img]),
            gt=np.asarray(view[Tags.gt]) if view.get(Tags.gt) is not None else None,
            pred=out["pred"],
            pred_samples=out["pred_samples"],
            uncertainty_map=out["uncertainty_map"],
            entropy_map=out["entropy_map"],
            instant_uncertainty=out["instant_uncertainty"],
            voxelspacing=view.get(Tags.voxelspacing),
            instants=view.get(Tags.instants),
            image_quality=view.get(Tags.image_quality),
        ))
    return results


def run_predict(task, variables, data, cfg, split: str = "test",
                metrics_out: Optional[Dict] = None, mesh=None) -> List[BatchResult]:
    """Predict every view of the split and assemble BatchResults
    (then results processors — results/__init__.py — consume them).

    `mesh` turns on data-parallel serving: views are stacked and sharded one
    per chip over the mesh's data axis (parallel/serving.py), matching the
    sequential path to f32 tolerance (asserted by tests/test_parallel.py
    mesh(1)-vs-mesh(8) inference equivalence, incl. a small boundary-pixel
    budget on the thresholded masks). `cfg.predict_batch_views > 1`
    additionally batches that many views per device per dispatch (single-chip
    throughput mode; same equivalence budgets)."""
    from contouring_uncertainty_tpu.tasks.segmentation import SegmentationUncertaintyTask

    if isinstance(task, SegmentationUncertaintyTask):
        results = run_predict_segmentation(task, variables, data, cfg, split,
                                           mesh=mesh)
        _maybe_run_processors(results, cfg, metrics_out)
        return results
    model = task.build_model()
    task_cfg = cfg.get("task", {})
    prior = get_or_fit_prior(data, task_cfg.get("psm_path"))
    skew_task = hasattr(task, "forward_skew")
    sequence = bool(task_cfg.get("sequence_sampler", False))
    # Grid-product samplers must cover the actual image extent (the reference
    # hardcoded 256^2 images; psm_skew.py:181-184).
    in_h, in_w = task.data_params.in_shape[1:]
    skew_kw = dict(
        skew_indices=getattr(task, "skew_indices", None),
        image_extent=float(max(in_h, in_w) - 1),
        grid_window=task_cfg.get("grid_window", 64),
        method=task_cfg.get("skew_method", "esn"),
    )
    if sequence:
        from contouring_uncertainty_tpu.sampler.sequence import (
            SequencePSMSampler,
            SequenceSkewPSMSampler,
        )

        seq_prior = get_or_fit_sequence_prior(data, task_cfg.get("seq_psm_path"))
        if skew_task:
            sampler = SequenceSkewPSMSampler(prior, seq_prior, **skew_kw)
        else:
            sampler = SequencePSMSampler(prior, seq_prior)
    elif skew_task:
        from contouring_uncertainty_tpu.sampler.psm_skew import SkewPosteriorShapeModelSampler

        sampler = SkewPosteriorShapeModelSampler(prior, **skew_kw)
    else:
        sampler = PosteriorShapeModelSampler(prior)
    predictor = AleatoricPredictor(
        task, model, sampler, soft_mask=bool(task_cfg.get("soft_mask", False)),
        contour_groups=getattr(data, "contour_groups", None), mesh=mesh,
    )
    key = jax.random.key(cfg.get("seed", 10))

    views = list(data.predict_views(split))
    if sequence:
        for view in views:
            if np.asarray(view[Tags.img]).shape[0] != 2:
                raise ValueError(
                    f"sequence_sampler=True expects exactly 2 instants (ED, ES) "
                    f"per view; view '{view[Tags.id]}' has "
                    f"{np.asarray(view[Tags.img]).shape[0]} frames. Disable "
                    f"task.sequence_sampler or restrict views to ED/ES."
                )
    outs = _run_predictor(predictor, variables, views, key,
                          views_per_step=_cfg_views_per_step(cfg))
    results = []
    for view, out in zip(views, outs):
        res = BatchResult(
            id=view[Tags.id],
            labels=task.data_params.labels,
            img=np.asarray(view[Tags.img]),
            gt=np.asarray(view[Tags.gt]) if view.get(Tags.gt) is not None else None,
            contour=np.asarray(view[Tags.contour]) if view.get(Tags.contour) is not None else None,
            pred=out["pred"],
            mu=out["mu"],
            mode=out["mode"],
            cov=out["cov"],
            alpha=out.get("alpha"),
            post_mu=out["post_mu"],
            post_cov=out["post_cov"],
            contour_samples=out["contour_samples"],
            pred_samples=out["pred_samples"],
            uncertainty_map=out["uncertainty_map"],
            entropy_map=out["entropy_map"],
            point_uncertainty=out["point_uncertainty"],
            instant_uncertainty=out["instant_uncertainty"],
            voxelspacing=view.get(Tags.voxelspacing),
            instants=view.get(Tags.instants),
            image_quality=view.get(Tags.image_quality),
        )
        results.append(res)

    _maybe_run_processors(results, cfg, metrics_out)
    return results


def _maybe_run_processors(results, cfg, metrics_out=None):
    if cfg.get("results_dir") or cfg.get("save_path"):
        out_dir = Path(cfg.get("results_dir") or Path(cfg["save_path"]) / "results")
        from contouring_uncertainty_tpu.results import run_processors

        metrics = run_processors(results, out_dir, cfg)
        if metrics_out is not None:
            metrics_out.update(metrics)
