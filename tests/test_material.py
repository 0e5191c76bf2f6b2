"""Constitutive-model unit tests against closed-form 1D elastoplasticity."""

import jax.numpy as jnp
import numpy as np

from fcvm_tpu.ops import material as mat

E, NU = 210000.0, 0.3


def test_hooke_uniaxial_strain():
    d = np.asarray(mat.hooke_dmat(jnp.float64(E), jnp.float64(NU)))
    # uniaxial strain: sigma_xx = E (1-nu) / ((1+nu)(1-2nu)) * eps
    expect = E * (1 - NU) / (1 + NU) / (1 - 2 * NU)
    assert abs(d[0, 0] - expect) < 1e-9
    # shear: tau = G * gamma
    g = E / 2 / (1 + NU)
    assert abs(d[3, 3] - g) < 1e-9
    assert np.abs(d - d.T).max() < 1e-9


def test_hooke_uniaxial_stress():
    """sigma = D eps with lateral strains -nu eps gives uniaxial stress."""
    d = np.asarray(mat.hooke_dmat(jnp.float64(E), jnp.float64(NU)))
    eps = np.array([1.0, -NU, -NU, 0, 0, 0]) * 1e-3
    sig = d @ eps
    np.testing.assert_allclose(sig, [E * 1e-3, 0, 0, 0, 0, 0], atol=1e-9)


def test_radial_return_elastic_untouched():
    sig = jnp.asarray([[50.0, 10.0, -20.0, 5.0, 0.0, 3.0]])
    sy = jnp.asarray([240.0])
    out, plastic = mat.radial_return(sig, sy, 0.0, E / 2.6)
    assert not bool(plastic[0])
    np.testing.assert_allclose(np.asarray(out), np.asarray(sig))


def test_radial_return_returns_to_surface():
    rng = np.random.default_rng(3)
    sig = jnp.asarray(rng.normal(size=(32, 6)) * 400.0)
    sy = jnp.full(32, 240.0)
    g = E / 2 / (1 + NU)
    # perfect plasticity: returned von Mises stress == yield where plastic
    out, plastic = mat.radial_return(sig, jnp.asarray(sy), 0.0, g)
    _, _, svm = mat.von_mises(out)
    svm = np.asarray(svm)
    pl = np.asarray(plastic)
    assert pl.any()
    np.testing.assert_allclose(svm[pl], 240.0, rtol=1e-12)
    # pressure is preserved (deviatoric return)
    _, p_in, _ = mat.von_mises(sig)
    _, p_out, _ = mat.von_mises(out)
    np.testing.assert_allclose(np.asarray(p_in), np.asarray(p_out), atol=1e-9)


def test_radial_return_hardening_consistency():
    """With hardening H, the reference scaling leaves
    svm = sy + 3G/(3G+H) * H/3G... cross-check against update_peeq_csr: the
    plastic increment DL = (svm_trial - sy)/(3G+H) and the returned stress
    satisfies svm_new = sy + H * DL."""
    et_e = 0.2
    g = float(mat.shear_modulus(E, NU))
    h = float(mat.hardening_modulus(jnp.float64(E), jnp.float64(et_e)))
    sig = jnp.asarray([[400.0, 0.0, 0.0, 0.0, 0.0, 0.0]])
    sy = jnp.asarray([240.0])
    out, plastic = mat.radial_return(sig, sy, h, g)
    assert bool(plastic[0])
    _, _, svm_new = mat.von_mises(out)
    dl = (400.0 - 240.0) / (3 * g + h)
    assert abs(float(svm_new[0]) - (240.0 + h * dl)) < 1e-9


def test_update_peeq_csr_uniaxial():
    et_e = 0.0
    g = float(mat.shear_modulus(E, NU))
    svm_trial = 300.0
    sig_test = jnp.asarray([[svm_trial, 0, 0, 0, 0, 0.0]])
    sig_new = jnp.asarray([[240.0, 0, 0, 0, 0, 0.0]])
    sy = jnp.asarray([240.0])
    peeq = jnp.zeros(1)
    csr = jnp.zeros(1)
    ult = 0.25
    sy2, peeq2, csr2, triax, p, svm, ecr = mat.update_peeq_csr(
        sig_test, sig_new, sy, peeq, csr, E, NU, et_e, ult
    )
    dl = (svm_trial - 240.0) / (3 * g)
    assert abs(float(peeq2[0]) - dl) < 1e-12
    assert abs(float(sy2[0]) - 240.0) < 1e-12  # no hardening
    t = (240.0 / 3.0) / 240.0
    assert abs(float(triax[0]) - t) < 1e-12
    ecr_expect = np.sqrt(np.e) * ult * np.exp(-1.5 * t)
    assert abs(float(ecr[0]) - ecr_expect) < 1e-12
    assert abs(float(csr2[0]) - dl / ecr_expect) < 1e-12


def test_ultimate_strain_zero_disables_csr():
    sig = jnp.asarray([[300.0, 0, 0, 0, 0, 0.0]])
    sy = jnp.asarray([240.0])
    _, _, csr2, _, _, _, ecr = mat.update_peeq_csr(
        sig, sig, sy, jnp.zeros(1), jnp.zeros(1), E, NU, 0.0, 0.0
    )
    assert float(csr2[0]) < 1e-10  # eps_cr ~ 1e12 -> CSR ~ 0
