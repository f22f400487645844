#!/usr/bin/env python
"""Generate the golden state-interchange fixture under tests/fixtures/ref_state/.

Runs the C reference binary (built by tools/build_reference.sh) on a tiny
2-cell x 5-day input set twice — once with ASCII state output
(StateIOASCII.c) and once with BINARY (StateIOBinary.c) — and commits the
resulting state files together with the inputs that produced them, so
tests/test_state_interchange.py can prove vic-tpu's legacy state readers
parse REAL reference output (VERDICT round-2 missing #5), without needing
the C binary at test time.

Usage:  python tools/make_state_fixture.py [--binary /tmp/vicbuild/vicNl]
"""
import argparse
import os
import shutil
import subprocess
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))
import oracle  # noqa: E402  (tools/oracle.py)

FIXDIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "..", "tests", "fixtures", "ref_state")
N_CELL, N_DAYS = 2, 5


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--binary", default="/tmp/vicbuild/vicNl")
    ap.add_argument("--workdir", default="/tmp/state_fixture")
    args = ap.parse_args()

    os.makedirs(FIXDIR, exist_ok=True)
    _, lats, lons = oracle.write_inputs(args.workdir, N_CELL, N_DAYS,
                                        config="base")
    gp_path = os.path.join(args.workdir, "global.txt")
    base_txt = open(gp_path).read()

    for fmt, flag in (("ascii", "FALSE"), ("binary", "TRUE")):
        txt = base_txt.replace("BINARY_STATE_FILE FALSE",
                               f"BINARY_STATE_FILE {flag}")
        open(gp_path, "w").write(txt)
        subprocess.run([args.binary, "-g", gp_path], check=True,
                       capture_output=True, text=True)
        end = oracle._add_days(1990, 1, 1, N_DAYS - 1)
        src = os.path.join(args.workdir, "results",
                           f"state_{end[0]:04d}-{end[1]:02d}-{end[2]:02d}")
        shutil.copy(src, os.path.join(FIXDIR, f"state_{fmt}"))
        os.remove(src)

    # the inputs that produced the state, with the workdir path tokenised so
    # the test can relocate them
    for name in ("soil.txt", "veglib.txt", "vegparam.txt"):
        shutil.copy(os.path.join(args.workdir, name),
                    os.path.join(FIXDIR, name))
    fdir = os.path.join(FIXDIR, "forcing")
    os.makedirs(fdir, exist_ok=True)
    for la, lo in zip(lats, lons):
        fn = f"full_data_{la:.4f}_{lo:.4f}"
        shutil.copy(os.path.join(args.workdir, "forcing", fn),
                    os.path.join(fdir, fn))
    open(os.path.join(FIXDIR, "global.txt"), "w").write(
        base_txt.replace(args.workdir, "@FIXDIR@"))
    print(f"fixture written to {FIXDIR}")


if __name__ == "__main__":
    main()
