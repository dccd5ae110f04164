#!/usr/bin/env python
"""Measure the TORCH REFERENCE's own TMI uncertainty-propagation pipeline.

The reference publishes no performance numbers (BASELINE.md), and its predict
step runs the entire uncertainty-propagation chain — PSM sampling, posterior
statistics, contour->mask rasterization, uncertainty maps — on the HOST CPU
even when the model forward runs on an accelerator (SURVEY.md §3 stack 2:
`.cpu().numpy()` precedes every sampler call; the samplers, `reconstruction`
and `uncertainty_map` are numpy/scipy code). This tool times that chain by
importing the reference's own modules from /root/reference and driving them
through exactly the call sequence of `AleatoricUncertaintyTask._predict_step`
(reference task/regression/aleatoric.py:82-135), at the TMI budget
(t_e=10 x t_a=25, K=21 landmarks, 2 instants/view @ 256^2) — the same budget
as our `predict_views_per_sec` bench metric and `tools/trace_breakdown.py`.

Phases timed per view (one CAMUS view = 2 instants):

  forwards   t_e UNet forwards (batch 2) + flat_softmax + dsnt + pixel
             conversion — reference dsnt_al.py:120-151 (`predict`/
             `predict_on_batch`). On the paper's hardware this ran on GPU;
             here it runs on torch-CPU and is reported SEPARATELY so the
             host-chain comparison stays apples-to-apples.
  sampling   PSM sampler per image per t_e draw of t_a contours —
             aleatoric.py:70-74 (`sample`).
  posterior  per-point posterior mean/cov loops over the sample population —
             aleatoric.py:96-108.
  masks      N + N*T_e*T_a spline rasterizations (`reconstruction`:
             splprep/splev + skimage line + binary_fill_holes) —
             contour_uncertainty.py:26-57 (`convert_to_mask`) via
             USContourToMask (data/camus/utils.py:31-99).
  umap       per-image Gaussian uncertainty map (100 offset contours) —
             aleatoric.py:114 -> utils/umap.py:10-33.

The host chain (sampling+posterior+masks+umap) is the reference's structural
CPU cost per view; our TPU framework runs the WHOLE view step (forwards
included) in one jitted device program (bench `predict_views_per_sec`).

Environment notes recorded in the output: this host exposes a single CPU
core (nproc=1, torch threads=1); the reference's predict step is a
single-process Python loop regardless (its multiprocessing pools live in the
results processors, not the predict step), so core count mainly affects the
torch forwards, which are reported separately anyway.

Stubs (this environment lacks some of the reference's deps; each stub is
minimal and affects no timed numerical work except `skimage.draw.line`,
an exact Bresenham-equivalent reimplementation of the only skimage call on
the timed path):
  - dotenv, pytest-absent extras: no-op module.
  - contour_uncertainty.data.ultromics.lv.dataset: the reference's own
    dead import (SURVEY §2.4 — the module does not exist in the repo).
  - strenum: LowercaseStrEnum shim for vital's Label enums.
  - skimage.draw.line: integer line rasterization (inclusive endpoints,
    rounded linspace over the Chebyshev length — matches skimage's output
    on the axis-aligned/diagonal segments the closing lines are).

Usage:
  python tools/bench_reference_pipeline.py [--t-e 10] [--t-a 25]
      [--views 3] [--skip-forwards] [--json-out PATH]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import types

import numpy as np

REF = "/root/reference"


def install_stubs() -> None:
    sys.path.insert(0, REF)
    sys.path.insert(0, os.path.join(REF, "vital"))

    dotenv = types.ModuleType("dotenv")
    dotenv.load_dotenv = lambda *a, **k: None
    sys.modules.setdefault("dotenv", dotenv)

    for name in (
        "contour_uncertainty.data.ultromics",
        "contour_uncertainty.data.ultromics.lv",
        "contour_uncertainty.data.ultromics.lv.dataset",
    ):
        sys.modules.setdefault(name, types.ModuleType(name))
    sys.modules["contour_uncertainty.data.ultromics.lv.dataset"].LVDataset = object

    try:
        import strenum  # noqa: F401
    except ImportError:
        import enum

        class LowercaseStrEnum(str, enum.Enum):
            @staticmethod
            def _generate_next_value_(name, start, count, last_values):
                return name.lower()

        strenum = types.ModuleType("strenum")
        strenum.LowercaseStrEnum = LowercaseStrEnum
        strenum.StrEnum = LowercaseStrEnum
        sys.modules["strenum"] = strenum

    try:
        import skimage.draw  # noqa: F401
    except ImportError:
        def line(r0, c0, r1, c1):
            n = int(max(abs(int(r1) - int(r0)), abs(int(c1) - int(c0)))) + 1
            rr = np.rint(np.linspace(r0, r1, n)).astype(np.intp)
            cc = np.rint(np.linspace(c0, c1, n)).astype(np.intp)
            return rr, cc

        skimage = types.ModuleType("skimage")
        draw = types.ModuleType("skimage.draw")
        draw.line = line
        skimage.draw = draw
        sys.modules["skimage"] = skimage
        sys.modules["skimage.draw"] = draw


def realistic_predictions(prior_path: str, n: int, t_e: int, seed: int = 0):
    """Trained-regime (mu, cov) for the host chain: PSM prior mean + small
    per-t_e jitter, sigma ~2-3 px — the regime the TMI paper evaluates (and
    the one where the reference's `contour_spline` splprep never hits its
    except-branch, keeping the timed work well-defined)."""
    data = np.load(prior_path, allow_pickle=True).item()
    mu0 = np.asarray(data["mu"], dtype=np.float64).reshape(-1, 2)  # (K, 2)
    k = mu0.shape[0]
    rng = np.random.default_rng(seed)
    mu = mu0[None, None] + rng.normal(scale=1.5, size=(n, t_e, k, 2))
    var = rng.uniform(2.0, 9.0, size=(n, t_e, k, 2))
    cov = np.zeros((n, t_e, k, 2, 2))
    cov[..., 0, 0] = var[..., 0]
    cov[..., 1, 1] = var[..., 1]
    covar = rng.uniform(-0.5, 0.5, size=(n, t_e, k)) * np.sqrt(
        var[..., 0] * var[..., 1])
    cov[..., 0, 1] = covar
    cov[..., 1, 0] = covar
    return mu, cov


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--t-e", type=int, default=10)
    ap.add_argument("--t-a", type=int, default=25)
    ap.add_argument("--views", type=int, default=3,
                    help="views to time (first is warmup, excluded)")
    ap.add_argument("--image-size", type=int, default=256)
    ap.add_argument("--skip-forwards", action="store_true")
    ap.add_argument("--json-out", default=None)
    args = ap.parse_args()

    install_stubs()

    import torch

    from contour_uncertainty.data.camus.utils import USContourToMask
    from contour_uncertainty.models.nnUnet.unet2 import UNet as RefUNet
    from contour_uncertainty.sampler.posterior_shape_model.psm import (
        PosteriorShapeModelSampler,
    )
    from contour_uncertainty.task.regression.dsnt.utils import (
        dsnt,
        flat_softmax,
        normalized_to_pixel_coordinates,
    )
    from contour_uncertainty.utils.umap import uncertainty_map
    from vital.data.camus.config import Label

    n = 2  # instants per CAMUS view (ED + ES)
    hw = args.image_size
    k = 21
    labels = [Label.BG, Label.LV]
    prior_path = os.path.join(REF, "camus-cont_psm_11_no_std.npy")

    sampler = PosteriorShapeModelSampler(psm_path=prior_path)
    to_mask = USContourToMask()

    # --- forwards (reference flagship config: 8-stage UNet, 256^2) --------
    fwd_s = float("nan")
    if not args.skip_forwards:
        model = RefUNet(
            input_shape=(1, hw, hw), output_shape=(k, hw, hw),
            patch_size=[hw, hw],
            kernels=[[3, 3]] * 8,
            strides=[[1, 1]] + [[2, 2]] * 7,
        )
        model.eval()
        img_t = torch.randn(n, 1, hw, hw)
        with torch.no_grad():
            model(img_t)  # warmup / lazy init
            t0 = time.perf_counter()
            for _ in range(args.t_e):
                # dsnt_al.py:120-132 predict_on_batch
                heatmaps = flat_softmax(model(img_t))
                coords, var, covar = dsnt(heatmaps)
                pixel_coords = normalized_to_pixel_coordinates(coords, hw)
                pixel_var = var * (hw / 2) ** 2
                pixel_covar = covar * (hw / 2) ** 2
                del pixel_coords, pixel_var, pixel_covar
            fwd_s = time.perf_counter() - t0
        del model

    # --- host chain at the TMI budget -------------------------------------
    phases = {"sampling": [], "posterior": [], "masks": [], "umap": []}
    for view in range(args.views):
        mu_e, cov_e = realistic_predictions(prior_path, n, args.t_e, seed=view)
        mu_t = torch.tensor(mu_e, dtype=torch.float)
        cov_t = torch.tensor(cov_e, dtype=torch.float)

        # aleatoric.py:70-74 `sample` (PosteriorShapeModelSampler branch).
        # Lightning wraps predict_step in no-grad; without it the sampler's
        # internal eig/rsample graph building would be timed (and .numpy()
        # refuses grad-tracking tensors).
        t0 = time.perf_counter()
        with torch.no_grad():
            contour_samples = [
                [sampler(mu_t[i, te], cov_t[i, te], n=args.t_a).numpy()
                 for te in range(args.t_e)]
                for i in range(n)
            ]
        contour_samples = np.array(contour_samples)  # (N, T_e, T_a, K, 2)
        t1 = time.perf_counter()

        # aleatoric.py:90-108 fusion + posterior stats
        mu_mean = mu_t.mean(dim=1, keepdim=True)
        cov_al = cov_t.mean(1)
        cov_ep = torch.mean(
            (mu_t - mu_mean)[..., None]
            * (mu_t - mu_mean)[..., None].swapaxes(-1, -2), dim=1)
        mu = mu_t.mean(dim=1).cpu().numpy()
        cov = (cov_al + cov_ep).cpu().numpy()
        post_mu = contour_samples.mean(axis=2)
        post_cov = np.zeros((n, args.t_e, k, 2, 2))
        for idx in range(n):
            for i in range(args.t_e):
                for kk in range(k):
                    post_cov[idx, i, kk] = np.cov(
                        contour_samples[idx, i, :, kk].reshape(-1, 2).T)
        post_mu_mean = post_mu.mean(axis=1, keepdims=True)
        post_cov_al = post_cov.mean(1)
        post_cov_ep = np.mean(
            (post_mu - post_mu_mean)[..., None]
            * (post_mu - post_mu_mean)[..., None].swapaxes(-1, -2), axis=1)
        post_cov = post_cov_ep + post_cov_al
        post_mu = post_mu.mean(axis=1)
        t2 = time.perf_counter()

        # contour_uncertainty.py:26-57 convert_to_mask
        pred = np.array([to_mask(mu[i], (hw, hw), labels) for i in range(n)])
        pred_samples = []
        for i in range(n):
            for j in range(args.t_e):
                for kk in range(args.t_a):
                    pred_samples.append(
                        to_mask(contour_samples[i, j, kk], (hw, hw), labels,
                                apply_argmax=False))
        pred_samples = np.array(pred_samples).reshape(
            n, args.t_e, args.t_a, 1, hw, hw)
        t3 = time.perf_counter()

        # aleatoric.py:114 umap
        umaps = np.array(
            [uncertainty_map(mu[i], cov[i], (hw, hw)) for i in range(n)])
        t4 = time.perf_counter()
        del pred, pred_samples, umaps, post_mu, post_cov

        if view == 0:
            continue  # warmup view (imports/caches)
        phases["sampling"].append(t1 - t0)
        phases["posterior"].append(t2 - t1)
        phases["masks"].append(t3 - t2)
        phases["umap"].append(t4 - t3)

    med = {p: float(np.median(v)) for p, v in phases.items()}
    host_chain = sum(med.values())
    out = {
        "metric": "reference_pipeline_ms_per_view",
        "value": round(host_chain * 1e3, 1),
        "unit": "ms/view (host chain: sampling+posterior+masks+umap)",
        "budget": {"t_e": args.t_e, "t_a": args.t_a, "n_instants": n,
                   "image_size": hw, "k": k},
        "phases_ms": {p: round(v * 1e3, 1) for p, v in med.items()},
        "forwards_ms_per_view": None if args.skip_forwards
        else round(fwd_s * 1e3, 1),
        "env": {"nproc": os.cpu_count(),
                "torch_threads": __import__("torch").get_num_threads()},
        "views_timed": args.views - 1,
    }
    print(json.dumps(out))
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
