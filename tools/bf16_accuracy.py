#!/usr/bin/env python
"""Paired f32-vs-bf16 predict-pipeline accuracy on a TRAINED flagship model.

PERF_NOTES names `task.model.dtype=bf16` as the remaining big lever on the
forward-dominated predict step (-15% round 3, -23% with the fused bf16 head),
but the only accuracy evidence so far is the UNTRAINED bound (mu shift
<= 0.38 px). This tool produces the trained-model numbers that decide whether
the fast serving mode can become a recommended default:

1. trains the flagship dsnt-al (drop_block, 256^2) on the synthetic CAMUS
   dataset via the runner CLI path (or loads --ckpt),
2. runs the full TMI-budget predict step (t_e=10 x t_a=25) over the test
   views TWICE on the SAME trained params and the SAME per-view PRNG keys —
   once with the f32 reference-parity model, once with
   dtype=bf16/head_dtype=bf16 (params stay f32 in both; only compute dtype
   differs, so the comparison is exactly paired: identical dropout masks,
   identical sampler draws given identical (mu, cov)),
3. reports per-field deltas: mu / posterior-mu shift (px), covariance-entry
   and sigma (std) relative errors (a cov entry is variance-scale, so its
   relative error is ~2x the sigma's — both are printed), Dice(f32, bf16) of
   the predicted labelmaps, both modes' Dice vs GT, umap/entropy deltas, and
   instant-uncertainty scalar drift.

Usage:
  python tools/bf16_accuracy.py [--ckpt PATH] [--epochs N] [--skew]
                                [--modes f32,bf16,mixed]

Modes: `bf16` = dtype=bf16 + head_dtype=bf16 (the opt-in fast serving mode);
`mixed` = bf16 trunk + f32 head/DSNT (isolates the sigma-error source).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def dice(a: np.ndarray, b: np.ndarray) -> float:
    a = a > 0
    b = b > 0
    denom = a.sum() + b.sum()
    return float(2.0 * (a & b).sum() / denom) if denom else 1.0


def train_flagship(epochs: int, skew: bool, image_size: int = 256,
                   batch_size: int = 16):
    from contouring_uncertainty_tpu.runner import run

    task = "dsnt-skew5" if skew else "dsnt-al"
    result = run([
        "data=synthetic", f"data.image_size={image_size}", f"task={task}",
        "task.model.drop_block=True", "task.t_a=10",
        f"trainer.batch_size={batch_size}", f"trainer.max_epochs={epochs}",
        "trainer.patience=100", "test=false", "predict=false",
    ])
    return result["ckpt_path"]


def build_predictor(ckpt: str, mode: str, skew: bool, t_a: int = 25,
                    t_e: int = 10):
    from contouring_uncertainty_tpu.data.camus import CamusContourData
    from contouring_uncertainty_tpu.predict import AleatoricPredictor, get_or_fit_prior
    from contouring_uncertainty_tpu.sampler import PosteriorShapeModelSampler
    from contouring_uncertainty_tpu.sampler.psm_skew import (
        SkewPosteriorShapeModelSampler,
    )
    from contouring_uncertainty_tpu.tasks import DSNTAleatoric
    from contouring_uncertainty_tpu.tasks.dsnt_skew import DSNTSkew
    from contouring_uncertainty_tpu.train.checkpoint import restore_checkpoint

    data = CamusContourData(os.environ.get("SYNTH_DATA_PATH", "/tmp/cutpu_synth.h5"),
                            fold=5)
    model_kwargs = {"drop_block": True}
    if mode == "bf16":
        model_kwargs.update(dtype=jnp.bfloat16, head_dtype=jnp.bfloat16)
    elif mode == "mixed":
        # bf16 trunk, f32 head conv + f32 XLA DSNT branch — isolates whether
        # the sigma error of the full-bf16 mode comes from the trunk logits
        # or from the bf16 head/moment path.
        model_kwargs.update(dtype=jnp.bfloat16)
    elif mode != "f32":
        raise ValueError(mode)
    if skew:
        # Must match train_flagship's "dsnt-skew5" config: a different
        # skew_indices set changes the ConfidenceNet head width
        # (2*|skew_indices| outputs) and the checkpoint restore would fail
        # against a mismatched abstract target.
        task = DSNTSkew(data_params=data.data_params, t_a=t_a, t_e=t_e,
                        skew_indices=(0, 5, 10, 15, 20),
                        model_kwargs=model_kwargs)
    else:
        task = DSNTAleatoric(data_params=data.data_params, t_a=t_a, t_e=t_e,
                             model_kwargs=model_kwargs)
    model = task.build_model()
    c, h, w = task.data_params.in_shape
    init = jax.jit(model.init)(jax.random.key(0), jnp.zeros((2, c, h, w)))
    variables = restore_checkpoint(ckpt, init)
    prior = get_or_fit_prior(data, None)
    if skew:
        sampler = SkewPosteriorShapeModelSampler(
            prior, skew_indices=task.skew_indices, image_extent=255.0)
    else:
        sampler = PosteriorShapeModelSampler(prior)
    return AleatoricPredictor(task, model, sampler), data, variables


def calibration_contract(ckpt: str, skew: bool, t_a: int, t_e: int,
                         modes, out_root: str = "/tmp/bf16_calibration"):
    """Run the point + clinical CALIBRATION processors exactly paired per
    mode (same data, same per-view fold_in keys through run_predict) and
    print the UCE / A-UCE / rejection-rate deltas — the user-facing contract
    for the bf16 fast mode (VERDICT r3 weak #6: the raw-field deltas below
    stop one level short of the TMI calibration deliverable)."""
    import json
    from pathlib import Path

    from contouring_uncertainty_tpu.predict import run_predict

    summaries = {}
    for mode in modes:
        predictor, data, variables = build_predictor(
            ckpt, mode=mode, skew=skew, t_a=t_a, t_e=t_e)
        out_dir = Path(out_root) / mode
        cfg = {
            "seed": 0,
            "task": {},
            "results_dir": str(out_dir),
            "data": {"results_processors": ["point_metrics",
                                            "clinical_metrics"]},
        }
        metrics: dict = {}
        run_predict(predictor.task, variables, data, cfg, metrics_out=metrics)
        summaries[mode] = {k: v for k, v in metrics.items()
                           if isinstance(v, (int, float))}
        print(f"{mode}: calibration processors done "
              f"({len(summaries[mode])} scalar keys) -> {out_dir}")

    base = summaries[modes[0]]
    picks = [k for k in base
             if ("uce" in k.lower() or "reject" in k.lower()
                 or "calibration-" in k)]  # point_metrics adaptive-UCE keys
    for mode in modes[1:]:
        other = summaries[mode]
        print(f"\n=== calibration contract: {modes[0]} vs {mode} "
              f"(UCE / A-UCE / rejection) ===")
        print(f"{'key':58s} {modes[0]:>10s} {mode:>10s} {'delta':>10s}")
        for k in sorted(picks):
            if k in other:
                d = other[k] - base[k]
                print(f"{k:58s} {base[k]:10.4f} {other[k]:10.4f} {d:+10.4f}")
        missing = [k for k in picks if k not in other]
        if missing:
            print(f"missing in {mode}: {missing}")
    Path(out_root, "summaries.json").write_text(json.dumps(summaries, indent=2))
    return summaries


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default=None)
    ap.add_argument("--epochs", type=int, default=150)
    ap.add_argument("--skew", action="store_true")
    ap.add_argument("--image-size", type=int, default=256)
    ap.add_argument("--batch-size", type=int, default=16)
    ap.add_argument("--t-a", type=int, default=25)
    ap.add_argument("--t-e", type=int, default=10)
    ap.add_argument("--modes", default="f32,bf16",
                    help="comma list from {f32,bf16,mixed}; f32 is the "
                         "pairing reference and is always run")
    ap.add_argument("--calibration", action="store_true",
                    help="also run the point+clinical calibration processors "
                         "paired per mode and print UCE/A-UCE/rejection deltas")
    ap.add_argument("--calibration-only", action="store_true")
    args = ap.parse_args()

    from contouring_uncertainty_tpu.utils.backend import ensure_backend

    ensure_backend(wait_budget_s=600, label="bf16_accuracy")

    ckpt = args.ckpt or train_flagship(args.epochs, args.skew,
                                       args.image_size, args.batch_size)
    print(f"checkpoint: {ckpt}")

    modes = ["f32"] + [m for m in args.modes.split(",") if m and m != "f32"]
    if args.calibration or args.calibration_only:
        calibration_contract(ckpt, args.skew, args.t_a, args.t_e, modes)
        if args.calibration_only:
            return
    outs = {}
    for mode in modes:
        import time

        predictor, data, variables = build_predictor(
            ckpt, mode=mode, skew=args.skew, t_a=args.t_a, t_e=args.t_e)
        views = list(data.predict_views("test"))
        key = jax.random.key(0)
        res = []
        t0 = None
        def to_np(x):
            if isinstance(x, dict):
                return {k: np.asarray(v) for k, v in x.items()}
            return np.asarray(x)

        for i, v in enumerate(views):
            out = predictor(variables, jnp.asarray(v["img"]),
                            jax.random.fold_in(key, i))
            res.append({k: to_np(val) for k, val in out.items()
                        if val is not None})
            if i == 0:
                # Start the clock only after view 0 is fully FETCHED, so the
                # first-view compile and its host transfer are both excluded
                # and the window holds exactly len(views)-1 complete views.
                t0 = time.perf_counter()
        wall = (time.perf_counter() - t0) / max(len(views) - 1, 1)
        outs[mode] = (res, views)
        print(f"{mode}: {len(res)} views predicted "
              f"({wall * 1e3:.1f} ms/view incl. host fetch)")

    res32, views = outs["f32"]
    for mode in modes[1:]:
        resm, _ = outs[mode]
        mu_d, post_mu_d, cov_rel, std_rel, mode_d = [], [], [], [], []
        dice_pair, dice32, dicem = [], [], []
        umap_d, ent_d = [], []
        iu_drift = {}
        for r32, rm, v in zip(res32, resm, views):
            mu_d.append(np.abs(r32["mu"] - rm["mu"]).max())
            post_mu_d.append(np.abs(r32["post_mu"] - rm["post_mu"]).max())
            mode_d.append(np.abs(r32["mode"] - rm["mode"]).max())
            # Two distinct error scales, reported separately (a covariance
            # ENTRY is variance-scale; sigma = sqrt(var), so its relative
            # error is ~half the variance's — do not conflate them):
            # cov-entry rel err, normalized by the point's variance scale.
            scale = (r32["cov"][..., 0, 0] + r32["cov"][..., 1, 1])[..., None, None] / 2
            cov_rel.append((np.abs(r32["cov"] - rm["cov"]) / scale).max())
            # True per-axis sigma (std) rel err on the diagonal.
            s32 = np.sqrt(np.stack([r32["cov"][..., 0, 0], r32["cov"][..., 1, 1]], -1))
            sm = np.sqrt(np.stack([rm["cov"][..., 0, 0], rm["cov"][..., 1, 1]], -1))
            std_rel.append((np.abs(s32 - sm) / s32).max())
            gt = np.asarray(v["gt"])
            for n in range(r32["pred"].shape[0]):
                dice_pair.append(dice(r32["pred"][n], rm["pred"][n]))
                dice32.append(dice(r32["pred"][n], gt[n]))
                dicem.append(dice(rm["pred"][n], gt[n]))
            umap_d.append(np.abs(r32["uncertainty_map"] - rm["uncertainty_map"]).max())
            ent_d.append(np.abs(r32["entropy_map"] - rm["entropy_map"]).max())
            iu32 = r32["instant_uncertainty"]
            ium = rm["instant_uncertainty"]
            if isinstance(iu32, dict):
                for k in iu32:
                    a, b = float(np.mean(iu32[k])), float(np.mean(ium[k]))
                    iu_drift.setdefault(k, []).append(
                        abs(a - b) / (abs(a) + 1e-12))

        print(f"\n=== paired f32-vs-{mode} deltas (trained model, TMI budget) ===")
        print(f"mu shift        max {max(mu_d):.4f} px   mean {np.mean(mu_d):.4f}")
        print(f"mode shift      max {max(mode_d):.4f} px")
        print(f"post_mu shift   max {max(post_mu_d):.4f} px")
        print(f"cov-entry rel err max {max(cov_rel):.4f}   mean {np.mean(cov_rel):.4f}")
        print(f"sigma (std) rel err max {max(std_rel):.4f}   mean {np.mean(std_rel):.4f}")
        print(f"Dice(f32,{mode})  min {min(dice_pair):.5f}  mean {np.mean(dice_pair):.5f}")
        print(f"Dice vs GT      f32 {np.mean(dice32):.5f}  {mode} {np.mean(dicem):.5f}  "
              f"delta {np.mean(dice32) - np.mean(dicem):+.5f}")
        print(f"umap max diff   {max(umap_d):.5f}")
        print(f"entropy max diff {max(ent_d):.5f}")
        if iu_drift:
            worst = sorted(((np.mean(v), k) for k, v in iu_drift.items()),
                           reverse=True)[:6]
            print("instant-uncertainty scalar rel drift (worst):")
            for val, k in worst:
                print(f"  {k:32s} {val:.4%}")


if __name__ == "__main__":
    main()
