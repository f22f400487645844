"""Packed binary output format parity (WriteOutputBinary.c).

The golden fixture `tests/fixtures/ref_binary/fluxes_48.0000_0.0000` was
produced by the patched reference binary (tools/build_reference.sh restores
the fork-orphaned classic BINARY path) on the base oracle config, 2 cells x
5 days, PRT_HEADER TRUE; `fluxes_ascii_*` is the same run in ASCII mode for
value cross-checks.
"""
import os

import numpy as np

from vic_tpu.output import (BinaryOutputWriter, OUT_TYPES,
                            read_binary_output)

FIX = os.path.join(os.path.dirname(__file__), "fixtures", "ref_binary")

# the reference's default fluxes-file composition for the base oracle config
# (set_output_defaults.c; names from the ASCII header line): 26 variables,
# 28 elements (SOIL_LIQ x3)
REF_VARS = ["OUT_PREC", "OUT_EVAP", "OUT_RUNOFF", "OUT_BASEFLOW", "OUT_WDEW",
            "OUT_SOIL_LIQ", "OUT_RAD_TEMP", "OUT_NET_SHORT", "OUT_R_NET",
            "OUT_LATENT", "OUT_EVAP_CANOP", "OUT_TRANSP_VEG", "OUT_EVAP_BARE",
            "OUT_SUB_CANOP", "OUT_SUB_SNOW", "OUT_SENSIBLE", "OUT_GRND_FLUX",
            "OUT_DELTAH", "OUT_FUSION", "OUT_AERO_RESIST", "OUT_SURF_TEMP",
            "OUT_ALBEDO", "OUT_REL_HUMID", "OUT_IN_LONG", "OUT_AIR_TEMP",
            "OUT_WIND"]


def test_parse_reference_fixture():
    meta, dates, cols = read_binary_output(
        os.path.join(FIX, "fluxes_48.0000_0.0000"))
    assert meta["nrecs"] == 40 and meta["out_dt"] == 3
    assert meta["start"] == (1990, 1, 1, 0)
    # header-size quirk: Nbytes counts only through the date fields
    assert meta["nbytes"] == 80 and meta["nbytes2"] == 42
    # 4 date fields + 28 data elements
    assert len(meta["fields"]) == 32 and len(cols) == 28
    names = [f[0] for f in meta["fields"]]
    assert names[:4] == ["YEAR", "MONTH", "DAY", "HOUR"]
    # stale-tmp_str quirk: every data entry is named "HOUR"
    assert all(n == "HOUR" for n in names[4:])
    assert all(ty == 5 and m == 1.0 for _, ty, m in meta["fields"][4:])
    # date-column quirk: write_data's date fills are commented out upstream
    assert np.all(dates == 0)
    assert len(cols[0]) == 40


def test_values_match_ascii_run():
    _, _, cols = read_binary_output(
        os.path.join(FIX, "fluxes_48.0000_0.0000"))
    rows = []
    for line in open(os.path.join(FIX, "fluxes_ascii_48.0000_0.0000")):
        if line.startswith("#"):
            continue
        rows.append([float(t) for t in line.split()[4:]])
    ascii_vals = np.asarray(rows)
    assert ascii_vals.shape == (40, 28)
    for j in range(28):
        # ASCII is %.4f-rounded; binary is the full float32
        np.testing.assert_allclose(cols[j], ascii_vals[:, j], atol=6e-5,
                                   rtol=1e-4)


def test_header_bytes_match_reference(tmp_path):
    ref_raw = open(os.path.join(FIX, "fluxes_48.0000_0.0000"), "rb").read()
    n_rec = 40
    outs = {}
    rng = np.random.default_rng(0)
    for name in REF_VARS:
        if name == "OUT_SOIL_LIQ":
            outs[name] = rng.random((n_rec, 1, 3)).astype(np.float32)
        else:
            outs[name] = rng.random((n_rec, 1)).astype(np.float32)

    class Ax:
        year = np.full(n_rec, 1990)
        month = np.ones(n_rec, int)
        day = np.ones(n_rec, int)
        hour = (np.arange(n_rec) * 3) % 24

    w = BinaryOutputWriter(str(tmp_path), "fluxes", [48.0], [0.0], REF_VARS,
                           nrecs=n_rec, out_dt=3, start_date=(1990, 1, 1, 0))
    w.write_all(outs, Ax())
    ours = open(w.paths[0], "rb").read()
    header_len = 80 + 28 * 10      # dated header + 28 stale-named entries
    assert ours[:header_len] == ref_raw[:header_len]
    # identical record framing: same total size
    assert len(ours) == len(ref_raw)


def test_roundtrip_with_usint_spec(tmp_path):
    from vic_tpu.config import OutVarSpec
    n_rec = 6
    outs = {"OUT_PREC": np.linspace(0, 20, n_rec)[:, None] + 0.4,
            "OUT_SWE": np.linspace(0, 300, n_rec)[:, None]}

    class Ax:
        year = np.full(n_rec, 1995)
        month = np.ones(n_rec, int)
        day = np.arange(1, n_rec + 1)
        hour = np.zeros(n_rec, int)

    specs = {"OUT_SWE": OutVarSpec(name="OUT_SWE", type="OUT_TYPE_USINT",
                                   multiplier=100.0)}
    w = BinaryOutputWriter(str(tmp_path), "fluxes", [50.0], [-116.0],
                           ["OUT_PREC", "OUT_SWE"], nrecs=n_rec, out_dt=24,
                           start_date=(1995, 1, 1, 0), outvar_specs=specs)
    w.write_all(outs, Ax())
    meta, dates, cols = read_binary_output(w.paths[0])
    assert meta["out_dt"] == 24
    # daily file: 3 date ints, real dates (deliberate, documented deviation
    # from the reference's zeroed dates)
    assert dates.shape == (n_rec, 3)
    assert dates[0].tolist() == [1995, 1, 1]
    fields = meta["fields"]
    assert fields[3][1] == OUT_TYPES["OUT_TYPE_FLOAT"][0]
    assert fields[4][1] == OUT_TYPES["OUT_TYPE_USINT"][0]
    assert fields[4][2] == 100.0
    np.testing.assert_allclose(cols[0], outs["OUT_PREC"][:, 0], rtol=1e-6)
    # data written unmultiplied (reference write_data semantics): USINT
    # column is the truncated raw value
    np.testing.assert_array_equal(cols[1], np.trunc(outs["OUT_SWE"][:, 0])
                                  .astype(np.uint16))
