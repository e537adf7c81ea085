"""Split-real complex arithmetic vs numpy complex ground truth."""

import numpy as np
import pytest

from ddqst_tpu.ops import complexlib as cl


@pytest.fixture
def cmat(rng):
    return rng.normal(size=(6, 6)) + 1j * rng.normal(size=(6, 6))


def test_roundtrip(cmat):
    np.testing.assert_allclose(
        cl.to_complex(cl.from_complex(cmat)), cmat.astype(np.complex64),
        atol=1e-6,
    )


def test_cmatmul(cmat, rng):
    b = rng.normal(size=(6, 6)) + 1j * rng.normal(size=(6, 6))
    got = cl.to_complex(cl.cmatmul(cl.from_complex(cmat), cl.from_complex(b)))
    np.testing.assert_allclose(got, cmat @ b, rtol=1e-4, atol=1e-5)


def test_ceinsum(rng):
    a = rng.normal(size=(3, 4, 4)) + 1j * rng.normal(size=(3, 4, 4))
    b = rng.normal(size=(2, 4)) + 1j * rng.normal(size=(2, 4))
    got = cl.to_complex(
        cl.ceinsum("bij,cj->cbi", cl.from_complex(a), cl.from_complex(b))
    )
    np.testing.assert_allclose(
        got, np.einsum("bij,cj->cbi", a, b), rtol=1e-4, atol=1e-5
    )


def test_ceigvalsh(cmat):
    h = (cmat + cmat.conj().T) / 2
    got = np.asarray(cl.ceigvalsh(cl.from_complex(h)))
    want = np.linalg.eigvalsh(h)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_hermitian_fn_matches_numpy(cmat):
    h = (cmat + cmat.conj().T) / 2
    # f = exp over the spectrum.
    w, v = np.linalg.eigh(h)
    want = (v * np.exp(w)) @ v.conj().T
    got = cl.to_complex(cl.hermitian_fn(cl.from_complex(h), np.exp))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


def test_project_psd_matches_direct(cmat):
    h = (cmat + cmat.conj().T) / 2
    got = cl.to_complex(cl.project_psd(cl.from_complex(h)))
    w, v = np.linalg.eigh(h)
    wc = np.maximum(w, 0)
    wc = wc / wc.sum()
    want = (v * wc) @ v.conj().T
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_sqrtm(cmat):
    h = (cmat + cmat.conj().T) / 2
    psd = h @ h.conj().T  # PSD by construction... actually h@h† is PSD
    got = cl.to_complex(cl.sqrtm_psd(cl.from_complex(psd)))
    np.testing.assert_allclose(got @ got, psd, rtol=1e-2, atol=1e-3)


def test_abs2_and_vdot(rng):
    v = rng.normal(size=8) + 1j * rng.normal(size=8)
    w = rng.normal(size=8) + 1j * rng.normal(size=8)
    cv, cw = cl.from_complex(v), cl.from_complex(w)
    np.testing.assert_allclose(np.asarray(cv.abs2()), np.abs(v) ** 2, atol=1e-5)
    np.testing.assert_allclose(
        float(cl.cvdot_real(cv, cw)), np.vdot(v, w).real, atol=1e-4
    )