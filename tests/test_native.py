"""Native C++ parser vs the numpy parser: identical numeric output."""

import numpy as np
import pytest

from clearsky_tpu.native import parse_par_native, native_available
from clearsky_tpu.spectra.par import read_par


@pytest.mark.skipif(not native_available(), reason="no C++ toolchain")
@pytest.mark.parametrize("mol", ["CO2", "H2O", "CH4"])
def test_native_matches_numpy(fixtures_dir, mol):
    path = f"{fixtures_dir}/{mol}.par"
    ref = read_par(path)
    nat = parse_par_native(path)
    assert nat is not None
    assert len(nat["nu"]) == len(ref["nu"])
    for k in ("nu", "S", "A", "ga", "gs", "Epp", "na", "da"):
        np.testing.assert_array_equal(nat[k], ref[k].__array__(), err_msg=k)
    np.testing.assert_array_equal(nat["M"], ref["M"])
    np.testing.assert_array_equal(nat["I"], ref["I"])


@pytest.mark.skipif(not native_available(), reason="no C++ toolchain")
def test_read_par_fast_path_filters(fixtures_dir):
    path = f"{fixtures_dir}/CO2.par"
    full = read_par(path, numin=600.0, numax=700.0, Scut=1e-25, maxlines=100)
    fast = read_par(
        path, numin=600.0, numax=700.0, Scut=1e-25, maxlines=100, strings=False
    )
    for k in ("nu", "S", "ga", "gs", "Epp", "na", "M", "I"):
        np.testing.assert_array_equal(fast[k], full[k].__array__(), err_msg=k)
    assert "Vp" not in fast
