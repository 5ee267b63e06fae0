import numpy as np
import pytest

from streaming_downsampling_spark.functions import wavelets as wv


def test_coeff_length_law():
    # reference golden constants (SURVEY.md §1.1 / FIXTURES.md §2):
    # n=200 db4 -> 103; n=150 -> 78; n=128 -> 67
    assert wv.coeff_length(200, "db4", 1) == 103
    assert wv.coeff_length(150, "db4", 1) == 78
    assert wv.coeff_length(128, "db4", 1) == 67
    assert wv.coeff_length(200, "haar", 1) == 100
    assert wv.coeff_length(10, "db4", 0) == 10
    with pytest.raises(ValueError):
        wv.coeff_length(10, "db4", -1)
    with pytest.raises(ValueError):
        wv.dwt(np.zeros(8), "not-a-wavelet")


def test_haar_closed_form():
    x = np.array([1.0, 2.0, 3.0, 4.0])
    cA, cD = wv.dwt(x, "haar")
    s = np.sqrt(2.0)
    np.testing.assert_allclose(cA, [(1 + 2) / s, (3 + 4) / s])
    np.testing.assert_allclose(cD, [(1 - 2) / s, (3 - 4) / s])


def test_haar_orthonormality():
    # energy preservation: ||x||^2 == ||cA||^2 + ||cD||^2 for even n
    rng = np.random.default_rng(7)
    x = rng.normal(size=256)
    cA, cD = wv.dwt(x, "haar")
    assert np.isclose((x**2).sum(), (cA**2).sum() + (cD**2).sum())


@pytest.mark.parametrize("wavelet", ["haar", "db2", "db4"])
@pytest.mark.parametrize("n", [8, 64, 128, 150, 200, 201])
def test_perfect_reconstruction(wavelet, n):
    rng = np.random.default_rng(0)
    x = rng.normal(size=n)
    cA, cD = wv.dwt(x, wavelet)
    assert len(cA) == len(cD) == wv.coeff_length(n, wavelet, 1)
    rec = wv.idwt(cA, cD, wavelet)
    np.testing.assert_allclose(rec[:n], x, atol=1e-10)


def test_batched_matches_single():
    rng = np.random.default_rng(1)
    X = rng.normal(size=(8, 200))
    cA, cD = wv.dwt(X, "db4")
    for i in range(8):
        a, d = wv.dwt(X[i], "db4")
        np.testing.assert_array_equal(cA[i], a)
        np.testing.assert_array_equal(cD[i], d)
