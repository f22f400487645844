"""tools/make_production_domain.py generates reference-grammar files that
vic-tpu's own readers ingest (the production-run path validated at 51,200
cells on hardware; BASELINE.md 'Production-scale run')."""
import numpy as np


def test_generated_domain_ingests(tmp_path):
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from tools.make_production_domain import write_domain
    from vic_tpu.config import parse_global_param_file
    from vic_tpu.driver import load_domain, load_forcing
    from vic_tpu.driver import time_axis_from_params

    wd = str(tmp_path)
    write_domain(wd, n_cell=64, n_days=3)
    gp = parse_global_param_file(os.path.join(wd, "global.txt"))
    assert gp.nrecs in (-1, 3) or gp.nrecs > 0
    ax = time_axis_from_params(gp)
    assert ax.nrecs == 3
    domain = load_domain(gp)
    assert domain.n_cell == 64
    forcing = load_forcing(gp, domain, ax)
    for k in ("prec", "air_temp", "wind", "shortwave", "longwave",
              "pressure", "vp", "density"):
        assert k in forcing, k
        assert forcing[k].shape == (3, 64), (k, forcing[k].shape)
        assert np.isfinite(forcing[k]).all(), k
    # output config parsed (8 OUTVARs incl. closure telemetry)
    assert gp.outfiles and len(gp.outfiles[0].varnames) == 8
