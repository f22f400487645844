#!/bin/bash
# Build the C reference (pacificclimate/VIC) as the oracle binary for
# tools/oracle.py. The image has libnetcdf.so.19 but no netcdf headers and no
# netcdf-c++4, so the build:
#   1. shims the netcdf C API header (prototypes only, linked against
#      libnetcdf.so.19) for the NetCDF *forcing reader*;
#   2. sets NETCDF_OUTPUT_AVAILABLE FALSE (user_def.h) — the C++ <netcdf>
#      API users (WriteOutputNetCDF.c / StateIONetCDF.c / StateIO.h) are all
#      guarded on it upstream;
#   3. patches the handful of UNguarded WriteOutputNetCDF uses
#      (vicNl.c:286,408,605; WriteOutputContext.c) to dispatch on
#      options.OUTPUT_FORMAT, restoring the classic per-cell ASCII/BINARY
#      write path (write_data through each cell's own writer);
#   4. re-enables the per-cell ASCII value write that PCIC commented out
#      ("ASCII output mode is being removed", WriteOutputAscii.c:35) and
#      fixes its std::string/fprintf mismatch (.c_str());
#   5. gives WriteOutputAscii/Binary no-op write_data_one_cell stubs so they
#      are instantiable (OUTPUT_FORCE chunked mode stays NetCDF-only).
#
# /root/reference stays pristine; the patched copy lives in $BUILD.
#
# Known genuine reference bugs left IN (documented; oracle.py compensates):
#   - parse_output_info() reallocates out_data_files through a by-value
#     pointer (parse_output_info.c:63-67) -> vicNl.c:139 dangles; oracle runs
#     use the default output composition instead of N_OUTFILES.
#   - OUT_SNOW_MELT scaled x1000 (melt already mm; put_data.c:919 multiplies
#     by 1000 again); oracle.py divides the reference column by 1000.
set -e
SRC=${SRC:-/root/reference}
BUILD=${1:-/tmp/vicbuild}

rm -rf "$BUILD"
mkdir -p "$BUILD"
cp "$SRC"/*.c "$SRC"/*.h "$SRC"/Makefile "$BUILD"/

# ---- 1. netcdf C-API shim ----
cat > "$BUILD/netcdf.h" <<'EOF'
/* Minimal netcdf C-API shim: the image ships libnetcdf.so.19 but no headers.
   Prototypes match the netcdf-c 4.x public API for the subset used by
   read_atmos_data.c / make_in_and_outfiles.c / close_files.c. */
#ifndef _SHIM_NETCDF_H
#define _SHIM_NETCDF_H
#include <stddef.h>
#ifdef __cplusplus
extern "C" {
#endif
typedef int nc_type;
#define NC_NAT 0
#define NC_BYTE 1
#define NC_CHAR 2
#define NC_SHORT 3
#define NC_INT 4
#define NC_LONG NC_INT
#define NC_FLOAT 5
#define NC_DOUBLE 6
#define NC_UBYTE 7
#define NC_USHORT 8
#define NC_UINT 9
#define NC_NOERR 0
#define NC_NOWRITE 0x0000
#define NC_WRITE 0x0001
#define NC_GLOBAL (-1)
#define NC_MAX_NAME 256
#define NC_MAX_VAR_DIMS 1024
extern int nc_open(const char *path, int mode, int *ncidp);
extern int nc_close(int ncid);
extern const char *nc_strerror(int ncerr);
extern int nc_inq_varid(int ncid, const char *name, int *varidp);
extern int nc_inq_vartype(int ncid, int varid, nc_type *xtypep);
extern int nc_inq_varndims(int ncid, int varid, int *ndimsp);
extern int nc_inq_vardimid(int ncid, int varid, int *dimidsp);
extern int nc_inq_var(int ncid, int varid, char *name, nc_type *xtypep,
                      int *ndimsp, int *dimidsp, int *nattsp);
extern int nc_inq_dim(int ncid, int dimid, char *name, size_t *lenp);
extern int nc_inq_dimlen(int ncid, int dimid, size_t *lenp);
extern int nc_get_att_float(int ncid, int varid, const char *name, float *ip);
extern int nc_get_vara_double(int ncid, int varid, const size_t *startp,
                              const size_t *countp, double *ip);
extern int nc_get_varm_double(int ncid, int varid, const size_t *startp,
                              const size_t *countp, const ptrdiff_t *stridep,
                              const ptrdiff_t *imapp, double *ip);
extern int nc_get_varm_float(int ncid, int varid, const size_t *startp,
                             const size_t *countp, const ptrdiff_t *stridep,
                             const ptrdiff_t *imapp, float *ip);
extern int nc_get_varm_short(int ncid, int varid, const size_t *startp,
                             const size_t *countp, const ptrdiff_t *stridep,
                             const ptrdiff_t *imapp, short *ip);
extern int nc_get_varm_ushort(int ncid, int varid, const size_t *startp,
                              const size_t *countp, const ptrdiff_t *stridep,
                              const ptrdiff_t *imapp, unsigned short *ip);
#ifdef __cplusplus
}
#endif
#endif
EOF

# ---- 2. compile-time config + Makefile ----
sed -i 's/#define NETCDF_OUTPUT_AVAILABLE TRUE/#define NETCDF_OUTPUT_AVAILABLE FALSE/' "$BUILD/user_def.h"
# CLOSE_ENERGY is compile-time in the reference (user_def.h:36); pass
# CLOSE_ENERGY=TRUE to build the iterated canopy/atmosphere EB variant used
# by the "close" oracle scenario (tools/oracle.py --config close).
if [ "${CLOSE_ENERGY:-FALSE}" = "TRUE" ]; then
  sed -i 's/#define CLOSE_ENERGY FALSE/#define CLOSE_ENERGY TRUE/' "$BUILD/user_def.h"
  # upstream guards the path with "#error // CLOSE_ENERGY is an untested
  # code path" (surface_fluxes.c:9); drop the guard line — the point of the
  # oracle build is precisely to exercise that path.
  sed -i '/#error \/\/ CLOSE_ENERGY is an untested code path/d' "$BUILD/surface_fluxes.c"
fi
sed -i 's|^NETCDF_LIBS = .*|NETCDF_LIBS = -l:libnetcdf.so.19|' "$BUILD/Makefile"
# -O3; -include iostream replaces the std includes that <netcdf> pulled in
sed -i 's|^CFLAGS  = -I. -g -Wall -std=c++11|CFLAGS  = -I. -O3 -Wall -std=c++11 -include iostream|' "$BUILD/Makefile"

# ---- 3-5. source patches ----
cd "$BUILD"
python3 - <<'PYEOF'
def patch(path, old, new, count=1):
    s = open(path).read()
    assert old in s, f"pattern missing in {path}: {old[:60]!r}"
    s = s.replace(old, new, count)
    open(path, "w").write(s)

# 4. re-enable the ASCII value write + fix std::string format arg
patch("WriteOutputAscii.c",
      "//        fprintf(dataFiles[file_idx]->fh, out_data[dataFiles[file_idx]->varid[var_idx]].format, out_data[dataFiles[file_idx]->varid[var_idx]].aggdata[elem_idx]);",
      "        fprintf(dataFiles[file_idx]->fh, out_data[dataFiles[file_idx]->varid[var_idx]].format.c_str(), out_data[dataFiles[file_idx]->varid[var_idx]].aggdata[elem_idx]);")

# 3a. WriteOutputContext: dispatch on OUTPUT_FORMAT
patch("WriteOutputContext.c",
      """WriteOutputContext::WriteOutputContext(const ProgramState* state) {
    outputFormat = new WriteOutputNetCDF(state);
}""",
      """WriteOutputContext::WriteOutputContext(const ProgramState* state) {
#if NETCDF_OUTPUT_AVAILABLE
    outputFormat = new WriteOutputNetCDF(state);
#else
    if (state->options.OUTPUT_FORMAT == OutputFormat::BINARY_FORMAT)
      outputFormat = new WriteOutputBinary(state);
    else
      outputFormat = new WriteOutputAscii(state);
#endif
}""")

# 3b. vicNl.c: per-cell writer construction
patch("vicNl.c",
      "      currentCell.outputFormat = new WriteOutputNetCDF(&state);",
      """#if NETCDF_OUTPUT_AVAILABLE
      currentCell.outputFormat = new WriteOutputNetCDF(&state);
#else
      if (state.options.OUTPUT_FORMAT == OutputFormat::BINARY_FORMAT)
        currentCell.outputFormat = new WriteOutputBinary(&state);
      else
        currentCell.outputFormat = new WriteOutputAscii(&state);
#endif
""")

# 3c. vicNl.c: all-cells writer is NetCDF-only
patch("vicNl.c",
      """\tWriteOutputNetCDF *outputwriter = new WriteOutputNetCDF(state);
\toutputwriter->openFile();""",
      """#if NETCDF_OUTPUT_AVAILABLE
\tWriteOutputNetCDF *outputwriter = new WriteOutputNetCDF(state);
\toutputwriter->openFile();
#endif""")

# 3d. vicNl.c: classic per-cell write at each output interval
patch("vicNl.c",
      "    \toutputwriter->write_data_all_cells(current_output_data, out_data_files_template, rec/state->out_step_ratio, state);",
      """#if NETCDF_OUTPUT_AVAILABLE
    \toutputwriter->write_data_all_cells(current_output_data, out_data_files_template, rec/state->out_step_ratio, state);
#else
      // per-cell classic ASCII/BINARY write through each cell's own writer
      for (unsigned int cellidx = 0; cellidx < cell_data_structs.size(); cellidx++) {
        cell_data_structs[cellidx].outputFormat->write_data(
            current_output_data[cellidx], &dmy[rec],
            state->global_param.out_dt, state);
      }
#endif""")

# 5a. virtual per-cell write on the base class (default no-op)
patch("WriteOutputFormat.h",
      "  virtual void write_header(OutputData *out_data, const dmy_struct *dmy, const ProgramState* state) = 0;",
      """  virtual void write_header(OutputData *out_data, const dmy_struct *dmy, const ProgramState* state) = 0;
  // classic per-cell per-step write (ASCII/BINARY formats); default no-op
  virtual void write_data(OutputData *out_data, const dmy_struct *dmy, int dt, const ProgramState* state) {}""")

# 5b. instantiable ASCII/Binary: stub the pure-virtual chunked writer
patch("WriteOutputAscii.h",
      """  void write_header(OutputData *out_data, const dmy_struct *dmy, const ProgramState* state);
};""",
      """  void write_header(OutputData *out_data, const dmy_struct *dmy, const ProgramState* state);
  // OUTPUT_FORCE chunked mode is NetCDF-only in this build: no-op stub
  void write_data_one_cell(std::vector<OutputData*>& all_out_data, out_data_file_struct *out_data_files_template, const int chunk_start_rec, const int num_recs, const ProgramState* state) {}
};""")
patch("WriteOutputBinary.h",
      """  void write_header(OutputData *out_data, const dmy_struct *dmy, const ProgramState* state);

private:""",
      """  void write_header(OutputData *out_data, const dmy_struct *dmy, const ProgramState* state);
  void write_data_one_cell(std::vector<OutputData*>& all_out_data, out_data_file_struct *out_data_files_template, const int chunk_start_rec, const int num_recs, const ProgramState* state) {}

private:""")
# 6. restore the classic BINARY per-cell output path: the fork orphaned it
#    (make_out_files names files only for ASCII; write_header is defined in
#    WriteOutputBinary.c:118 but never called anywhere) — re-wire both per
#    classic VIC 4.1.2 semantics so a golden packed-binary sample can be
#    produced.
patch("make_in_and_outfiles.c",
      "if (state->options.OUTPUT_FORMAT == OutputFormat::ASCII_FORMAT) {",
      "if (state->options.OUTPUT_FORMAT == OutputFormat::ASCII_FORMAT ||\n      state->options.OUTPUT_FORMAT == OutputFormat::BINARY_FORMAT) {")
import re
src = open("vicNl.c").read()
anchor = "// allocating one current_output_data vector element per cell (i.e. we write once per time step)"
i = src.index(anchor)
j = src.index("copy_output_data(current_output_data, out_data_list, state);", i)
j += len("copy_output_data(current_output_data, out_data_list, state);")
ins = ("\n      if (state->options.PRT_HEADER)\n"
       "        cell_data_structs[cellidx].outputFormat->write_header("
       "current_output_data[cellidx], &dmy[0], state);")
src = src[:j] + ins + src[j:]
open("vicNl.c", "w").write(src)

print("all patches applied")
PYEOF

make -j"$(nproc)" > "$BUILD/build.log" 2>&1 || { tail -40 "$BUILD/build.log"; exit 1; }
ls -la "$BUILD/vicNl"
echo "oracle binary ready: $BUILD/vicNl"
echo "next: python tools/oracle.py --cells 64 --days 365 --binary $BUILD/vicNl"
