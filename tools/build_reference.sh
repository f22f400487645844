#!/bin/bash
# Build the C reference (pacificclimate/VIC) as the oracle binary for
# tools/oracle.py, WITHOUT the netcdf C++ library (absent in this image):
#  - NETCDF_OUTPUT_AVAILABLE FALSE + guards for the unguarded
#    WriteOutputNetCDF uses in vicNl.c / WriteOutputContext.c
#  - a minimal netcdf.h (C API prototypes only) linked against the system
#    libnetcdf.so.19 for the NetCDF *forcing reader*
#  - re-enable the per-cell ASCII value writes that PCIC had commented out
#    (WriteOutputAscii.c "ASCII output mode is being removed")
# The patched copy lives in /tmp/vicbuild; /root/reference stays pristine.
# NOTE: two genuine reference bugs found while porting (documented in
# tools/oracle.py): parse_output_info() use-after-free on N_OUTFILES, and
# OUT_SNOW_MELT scaled x1000 (melt already mm, put_data.c:919 multiplies
# by 1000 again).
set -e
echo "See tools/oracle.py header and session notes; this script documents"
echo "the build steps used to produce /tmp/vicbuild/vicNl."
