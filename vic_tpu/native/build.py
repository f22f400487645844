"""Build the native vicio shared library (g++, links system libnetcdf)."""
from __future__ import annotations

import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
SRC = os.path.join(HERE, "vicio.cpp")
OUT = os.path.join(HERE, "_vicio.so")

NETCDF_CANDIDATES = (
    "/lib/x86_64-linux-gnu/libnetcdf.so.19",
    "/usr/lib/x86_64-linux-gnu/libnetcdf.so.19",
    "/usr/lib/libnetcdf.so",
)


def find_netcdf() -> str | None:
    for p in NETCDF_CANDIDATES:
        if os.path.exists(p):
            return p
    return None


def build(force: bool = False) -> str | None:
    """Compile _vicio.so if stale. Returns path, or None if build impossible."""
    if (not force and os.path.exists(OUT)
            and os.path.getmtime(OUT) >= os.path.getmtime(SRC)):
        return OUT
    nc = find_netcdf()
    cmd = ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", SRC, "-o", OUT]
    if nc:
        cmd.append(nc)
    else:
        # no netcdf on this host: compile without it; netcdf entry points will
        # fail at link time if called -> guard with lazy binding
        cmd.insert(1, "-Wl,--unresolved-symbols=ignore-all")
    try:
        subprocess.run(cmd, check=True, capture_output=True, text=True)
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        sys.stderr.write(f"vicio build failed: {e}\n")
        return None
    return OUT


if __name__ == "__main__":
    path = build(force=True)
    print(path or "BUILD FAILED")
