#!/usr/bin/env python
"""Reproduce the C reference's FROZEN_SOIL year-run instability (BASELINE.md
footnote 3): 1 cell x 365 days, frozen config, sweeping NODES and the soil
damping depth. The reference's finite-difference path destabilizes once the
soil dries in late spring — sustained hundreds of W/m^2 ground flux and
non-physical surface temperatures — for every combination tried, while
vic-tpu on identical inputs stays physical.

Usage: python tools/frozen_stability_probe.py [--binary /tmp/vicbuild/vicNl]
"""
import argparse
import os
import re
import subprocess
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))
import oracle  # noqa: E402

# soil-file column index of dp (glacier-format row written by
# oracle.write_inputs: run cell lat lng b Ds Dsmax Ws c expt*3 ksat*3
# phi*3 init*3 elev depth*3 avg_T dp ...)
DP_COL = 26
GRND_COL = 4 + oracle.FLUX_COLS.index("OUT_GRND_FLUX")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--binary", default="/tmp/vicbuild/vicNl")
    args = ap.parse_args()
    for nodes, dp in ((5, 4.0), (7, 4.0), (5, 10.0), (9, 10.0)):
        wd = f"/tmp/frozen_probe_n{nodes}_dp{dp:g}"
        oracle.write_inputs(wd, 1, 365, config="frozen")
        g = open(f"{wd}/global.txt").read()
        open(f"{wd}/global.txt", "w").write(
            re.sub(r"NODES \d+", f"NODES {nodes}", g))
        rows = []
        for line in open(f"{wd}/soil.txt"):
            t = line.split()
            t[DP_COL] = f"{dp:g}"
            rows.append(" ".join(t))
        open(f"{wd}/soil.txt", "w").write("\n".join(rows) + "\n")
        subprocess.run([args.binary, "-g", f"{wd}/global.txt"],
                       capture_output=True, cwd=wd)
        a = np.loadtxt(f"{wd}/results/fluxes_48.0000_0.0000")
        gflux = np.abs(a[:, GRND_COL])
        print(f"NODES={nodes} dp={dp:g}: max |GRND_FLUX| = {gflux.max():.1f} "
              f"W/m^2, late-season mean = {gflux[1600:].mean():.1f} "
              f"(physical runs stay < ~150 peak)")


if __name__ == "__main__":
    main()
