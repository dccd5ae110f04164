#!/usr/bin/env python
"""Fetch the optimized HLO of a trace_breakdown workload and print the
definitions of named instructions (e.g. the fat `fusion.NNN` entries from a
`TRACE_DETAIL=1 tools/trace_breakdown.py` run), so trace costs can be mapped
back to source-level operations. Works through the tunneled backend where
`--xla_dump_to` cannot (compilation happens service-side).

Usage:
  python tools/hlo_lookup.py <predict|skew|skewgrid|seq|lung> NAME [NAME...]
  python tools/hlo_lookup.py predict --summary   # all fusions, one line each

The optimized HLO text is cached at /tmp/hlo_<mode>.txt so follow-up lookups
are instant. The cache is keyed on the newest mtime under the package source
tree — after a code change the workload recompiles automatically; set
HLO_CACHE=0 to force a recompile regardless.
"""

from __future__ import annotations

import glob
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_MODES = ("predict", "skew", "skewgrid", "seq", "lung")


def _src_fingerprint() -> str:
    root = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "contouring_uncertainty_tpu")
    mtimes = [os.path.getmtime(p)
              for p in glob.glob(os.path.join(root, "**", "*.py"),
                                 recursive=True)]
    return f"{max(mtimes):.0f}-{len(mtimes)}" if mtimes else "none"


def optimized_hlo(mode: str) -> str:
    cache = f"/tmp/hlo_{mode}.txt"
    fp = f"# src-fingerprint: {_src_fingerprint()}\n"
    if os.path.exists(cache) and os.environ.get("HLO_CACHE", "1") == "1":
        text = open(cache).read()
        if text.startswith(fp):
            return text
        print("# cache stale (package source changed), recompiling",
              file=sys.stderr)

    # Build the SAME workload trace_breakdown traces (single source of truth)
    # and fetch its optimized HLO through the AOT API. The predictor's
    # single-view jit is what the trace envelopes (`jit__view_fn`).
    import jax

    import tools.trace_breakdown as tb

    step = tb.main_builders()[mode](2)
    cells = dict(zip(step.__code__.co_freevars,
                     (c.cell_contents for c in step.__closure__ or ())))
    pred = cells.get("predictor")
    if pred is None:
        raise SystemExit(
            f"mode {mode!r} has no predictor in its step closure "
            f"({sorted(cells)}) — HLO lookup supports the predict-pipeline "
            "modes only")
    args = (cells["variables"], cells["view"], cells["key"])
    text = fp + jax.jit(pred._view_fn).lower(*args).compile().as_text()
    with open(cache, "w") as f:
        f.write(text)
    return text


def main():
    argv = sys.argv[1:]
    if not argv or argv[0] not in _MODES:
        raise SystemExit(__doc__)
    mode = argv[0]
    names = [a for a in argv[1:] if not a.startswith("--")]
    summary = "--summary" in argv

    text = optimized_hlo(mode)
    print(f"# optimized HLO: {len(text)} chars (cache /tmp/hlo_{mode}.txt)",
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
