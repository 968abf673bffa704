"""Native C++ SA-IS vs numpy fallback (SURVEY.md C4 native parity)."""
import numpy as np
import pytest

from bitmapperbs_tpu.index import sais


@pytest.mark.skipif(sais._native_lib() is None,
                    reason="libsais.so not built (make -C .../sais_native)")
@pytest.mark.parametrize("n,hi", [(2, 2), (50, 4), (1000, 4), (20000, 250)])
def test_native_matches_numpy(rng, n, hi):
    t = np.concatenate([
        rng.integers(1, hi, size=n - 1).astype(np.uint8),
        np.zeros(1, np.uint8)])
    np.testing.assert_array_equal(
        sais.suffix_array(t), sais.suffix_array_numpy(t))


@pytest.mark.skipif(sais._native_lib() is None, reason="libsais.so not built")
def test_native_repetitive_text(rng):
    """Deep recursion path: highly repetitive text."""
    unit = rng.integers(1, 3, size=7).astype(np.uint8)
    t = np.concatenate([np.tile(unit, 400), np.zeros(1, np.uint8)])
    np.testing.assert_array_equal(
        sais.suffix_array(t), sais.suffix_array_numpy(t))


def test_asan_selftest():
    """Sanitizer coverage for the native component (SURVEY.md 5.2)."""
    import os
    import shutil
    import subprocess
    if shutil.which("g++") is None:
        pytest.skip("no g++")
    d = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "bitmapperbs_tpu", "index", "sais_native")
    r = subprocess.run(["make", "-C", d, "check-asan"], capture_output=True,
                       text=True, timeout=600)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "OK" in r.stdout
