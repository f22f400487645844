#!/usr/bin/env python
"""Merge per-host NetCDF output shards into one reference-layout file.

Usage: python tools/merge_output_shards.py <base_output.nc> [-o merged.nc]

Counterpart of vic_tpu.parallel.io_shards.write_sharded_netcdf: finds
<base>.shardKofN.nc files next to the base path and gathers them onto the
union lat/lon grid (the offline replacement for the reference's serial
single-writer barrier, vicNl.c:596-597).
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("base", help="base output path (e.g. results.nc)")
    ap.add_argument("-o", "--out", default=None,
                    help="merged output path (default: the base path)")
    args = ap.parse_args()
    from vic_tpu.parallel.io_shards import merge_shards
    out = merge_shards(args.base, args.out)
    print(f"merged -> {out}")


if __name__ == "__main__":
    main()
