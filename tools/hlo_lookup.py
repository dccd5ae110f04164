#!/usr/bin/env python
"""Fetch the optimized HLO of a trace_breakdown workload and print the
definitions of named instructions (e.g. the fat `fusion.NNN` entries from a
`TRACE_DETAIL=1 tools/trace_breakdown.py` run), so trace costs can be mapped
back to source-level operations. Works through the tunneled backend where
`--xla_dump_to` cannot (compilation happens service-side).

Usage:
  python tools/hlo_lookup.py predict fusion.12 fusion.918 ...
  python tools/hlo_lookup.py predict --summary   # all fusions, one line each
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, ".")


def main():
    mode = sys.argv[1]
    names = [a for a in sys.argv[2:] if not a.startswith("--")]
    summary = "--summary" in sys.argv

    import jax
    import jax.numpy as jnp

    import tools.trace_breakdown as tb

    # Rebuild the workload but lower/compile the view fn directly.
    import tempfile

    from contouring_uncertainty_tpu.data.camus import CamusContourData
    from contouring_uncertainty_tpu.data.synthetic import write_camus_hdf5
    from contouring_uncertainty_tpu.predict import (
        AleatoricPredictor, get_or_fit_prior)
    from contouring_uncertainty_tpu.sampler import PosteriorShapeModelSampler
    from contouring_uncertainty_tpu.tasks import DSNTAleatoric
    from contouring_uncertainty_tpu.tasks.dsnt_skew import DSNTSkew
    from contouring_uncertainty_tpu.sampler.psm_skew import (
        SkewPosteriorShapeModelSampler)

    tmp = tempfile.mkdtemp()
    h5 = write_camus_hdf5(f"{tmp}/synth.h5", n_patients=4, size=256, seed=3)
    data = CamusContourData(h5, fold=5)
    if mode == "skew":
        task = tb._tmi_task(data, DSNTSkew)
    else:
        task = tb._tmi_task(data, DSNTAleatoric)
    model = task.build_model()
    variables = jax.jit(model.init)(jax.random.key(0),
                                    jnp.zeros((2, 1, 256, 256)))
    prior = get_or_fit_prior(data, None)
    if mode == "skew":
        sampler = SkewPosteriorShapeModelSampler(
            prior, skew_indices=task.skew_indices, image_extent=255.0,
            grid_window=64)
    else:
        sampler = PosteriorShapeModelSampler(prior)
    predictor = AleatoricPredictor(task, model, sampler)
    view = jnp.asarray(next(iter(data.predict_views("test")))["img"])
    key = jax.random.key(0)

    cache = f"/tmp/hlo_{mode}.txt"
    import os
    if os.path.exists(cache) and os.environ.get("HLO_CACHE", "1") == "1":
        text = open(cache).read()
    else:
        lowered = jax.jit(predictor._view_fn).lower(variables, view, key)
        compiled = lowered.compile()
        text = compiled.as_text()
        with open(cache, "w") as f:
            f.write(text)
    print(f"# optimized HLO: {len(text)} chars (cache {cache})",
          file=sys.stderr)

    if summary:
        # one line per instruction definition of interest: name = shape op(...)
        for m in re.finditer(r"^\s*(?:ROOT )?(%?[\w.-]+) = (\S+) (fusion|copy|"
                             r"sort|custom-call|reshape|convert|reduce)\(",
                             text, re.M):
            print(f"{m.group(1):<40s} {m.group(3):<12s} {m.group(2)}")
        return

    lines = text.splitlines()
    for want in names:
        pat = re.compile(rf"(?:^|\s)%?{re.escape(want)} = ")
        hits = [i for i, l in enumerate(lines) if pat.search(l)]
        print(f"\n===== {want} ({len(hits)} definition lines) =====")
        for i in hits:
            print(lines[i].strip()[:2000])
        # if it's a fusion, also print its computation body head
        for i in hits:
            m = re.search(r"calls=%?([\w.\-]+)", lines[i])
            if m:
                comp = m.group(1)
                cpat = re.compile(rf"^%?{re.escape(comp)} ")
                for j, l in enumerate(lines):
                    if cpat.match(l.strip()):
                        k = j
                        print(f"  --- computation {comp} ---")
                        while k < len(lines) and lines[k].strip() != "}":
                            print("  " + lines[k].rstrip()[:300])
                            k += 1
                            if k - j > 80:
                                print("  ... (truncated)")
                                break
                        break


if __name__ == "__main__":
    main()
