#!/usr/bin/env python
"""Tolerance-based NetCDF output comparator.

Re-implementation of the reference's universal comparison tool
(/root/reference/tools/test script/vic_output_compare_netcdf_universal.py:
the de-facto validation harness — compares two NetCDF output files variable by
variable within a tolerance, handling different variable names via a mapping
file, different time ranges, and layout differences), used to validate vic-tpu
runs against reference (or previous vic-tpu) outputs.

Usage:
  python tools/compare_netcdf.py A.nc B.nc [--tolerance 1e-4]
      [--vars SWE,EVAP,...] [--map name_map.txt] [--t0 N] [--t1 M]
      [--csv diffs.csv]

Exit status 0 when all compared variables are within tolerance, 1 otherwise.
"""
from __future__ import annotations

import argparse
import sys

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])
from vic_tpu.io import native  # noqa: E402


def load_var(f, name, t0, t1):
    # infer dims by probing with increasing rank using dim lengths
    for dims in (("time", "lat", "lon"),
                 ("time", "depth", "lat", "lon"),
                 ("time", "band", "lat", "lon"),
                 ("time", "node", "lat", "lon")):
        try:
            shape = [f.dim_len(d) for d in dims]
        except OSError:
            continue
        try:
            arr = f.get(name, [0] * len(shape), shape, np.float64)
            nt = shape[0]
            return arr[t0:t1 if t1 > 0 else nt]
        except OSError:
            continue
    raise KeyError(f"cannot read variable {name}")


def compare(path_a: str, path_b: str, tolerance: float, var_names=None,
            name_map=None, t0=0, t1=-1, csv=None):
    fa = native.NetCDFFile(path_a)
    fb = native.NetCDFFile(path_b)
    names_a = set(fa.var_names())
    names_b = set(fb.var_names())
    skip = {"time", "lat", "lon"}
    if var_names:
        candidates = var_names
    else:
        candidates = sorted((names_a & {name_map.get(n, n) for n in names_a}
                             if name_map else names_a) - skip)
    rows = []
    failures = 0
    for name in candidates:
        name_b = (name_map or {}).get(name, name)
        if name not in names_a or name_b not in names_b:
            print(f"  SKIP {name}: missing "
                  f"({name in names_a}/{name_b in names_b})")
            continue
        a = load_var(fa, name, t0, t1)
        b = load_var(fb, name_b, t0, t1)
        n = min(len(a), len(b))
        a, b = a[:n], b[:n]
        valid = (a < 1e19) & (b < 1e19) & np.isfinite(a) & np.isfinite(b)
        if not valid.any():
            print(f"  SKIP {name}: no valid overlap")
            continue
        diff = np.abs(a[valid] - b[valid])
        scale = np.maximum(np.abs(a[valid]), np.abs(b[valid]))
        rel = diff / np.maximum(scale, 1.0)
        max_abs = float(diff.max())
        max_rel = float(rel.max())
        ok = max_abs <= tolerance or max_rel <= tolerance
        status = "OK " if ok else "FAIL"
        if not ok:
            failures += 1
        print(f"  {status} {name:24s} max|d|={max_abs:.3e} "
              f"max rel={max_rel:.3e} n={int(valid.sum())}")
        rows.append((name, max_abs, max_rel, int(valid.sum()), status))
    fa.close()
    fb.close()
    if csv:
        with open(csv, "w") as fh:
            fh.write("variable,max_abs_diff,max_rel_diff,n,status\n")
            for r in rows:
                fh.write(",".join(str(x) for x in r) + "\n")
    return failures


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("file_a")
    ap.add_argument("file_b")
    ap.add_argument("--tolerance", type=float, default=1e-4)
    ap.add_argument("--vars", default=None,
                    help="comma-separated variable names")
    ap.add_argument("--map", default=None,
                    help="file of 'nameA nameB' lines")
    ap.add_argument("--t0", type=int, default=0)
    ap.add_argument("--t1", type=int, default=-1)
    ap.add_argument("--csv", default=None)
    args = ap.parse_args(argv)
    name_map = None
    if args.map:
        name_map = {}
        for line in open(args.map):
            toks = line.split()
            if len(toks) >= 2:
                name_map[toks[0]] = toks[1]
    var_names = args.vars.split(",") if args.vars else None
    failures = compare(args.file_a, args.file_b, args.tolerance, var_names,
                       name_map, args.t0, args.t1, args.csv)
    print(f"{'PASS' if failures == 0 else 'FAIL'}: {failures} variables "
          "exceeded tolerance")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
