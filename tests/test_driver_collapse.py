"""End-to-end collapse driver validation against closed-form references.

The faithfulness oracle is a 1D scalar transcription of the *reference's*
stress-update semantics (radial return ``fcVM.py:2468-2492`` + the
``sig_yield += Et * DL`` inter-step hardening of ``fcVM.py:2122``), replayed
over the exact load-factor sequence the driver produced.  A correct build
matches it to ~1e-10 on every genuine equilibrium step.
"""

import numpy as np
import pytest

import fcvm_tpu
from fcvm_tpu.models import meshgen

E, NU, SY0 = 210000.0, 0.3, 240.0
L, SIGMA = 10.0, 100.0


def uniaxial_model(n=2, sigma=SIGMA):
    mesh = meshgen.box_tet10(n, n, n, L, L, L)
    bcs = fcvm_tpu.BoundaryConditions.from_node_sets(
        [
            (mesh.select_nodes(lambda x, y, z: x < 1e-9), (0.0, None, None)),
            (mesh.select_nodes(lambda x, y, z: y < 1e-9), (None, 0.0, None)),
            (mesh.select_nodes(lambda x, y, z: z < 1e-9), (None, None, 0.0)),
        ]
    )
    faces = mesh.faces_on(lambda x, y, z: x > L - 1e-9)
    loads = fcvm_tpu.Loads(
        traction_faces=faces, tractions=np.tile([sigma, 0, 0], (len(faces), 1))
    )
    return mesh, fcvm_tpu.Model(mesh, fcvm_tpu.Material(E, NU), bcs, loads)


def reference_1d_recursion(lbd_seq, et_e, sigma=SIGMA, sy0=SY0):
    """Replay the reference's radial-return + hardening over load levels.

    Returns (axial strain, peeq, final yield stress)."""
    g = E / 2 / (1 + NU)
    k = E / 3 / (1 - 2 * NU)
    et = et_e * E
    h = et / (1 - et_e) if et_e > 0 else 0.0
    sy, peeq, eps, sig_prev = sy0, 0.0, 0.0, 0.0
    for lf in lbd_seq:
        sig = lf * sigma
        if sig <= sy:
            eps += (sig - sig_prev) / E
        else:
            dl = (sig - sy) / h if h > 0 else None
            assert dl is not None, "perfect plasticity cannot exceed yield"
            svm_t = sy + dl * (3 * g + h)
            eps += (sig - sig_prev) / (9 * k) + (2 / 3) * (svm_t - sig_prev) / (2 * g)
            peeq += dl
            sy += et * dl
        sig_prev = sig
    return eps, peeq, sy


def test_elastic_exact():
    mesh, model = uniaxial_model()
    params = fcvm_tpu.ControlParams(
        sig_yield=SY0, nstep=4, error_max=1e-10, et_e=0.1, target_lf=1.0
    )
    res = fcvm_tpu.solve_collapse(model, params)
    end = mesh.select_nodes(lambda x, y, z: x > L - 1e-9)
    ux = res.disp_total.reshape(-1, 3)[end, 0]
    lf = res.history.lbd[-1]
    np.testing.assert_allclose(ux, lf * SIGMA * L / E, rtol=1e-8)
    assert res.peeq_gp.max() == 0.0
    np.testing.assert_allclose(res.loadsums, [SIGMA * L * L, 0, 0], atol=1e-6)


def test_hardening_matches_reference_recursion():
    mesh, model = uniaxial_model()
    params = fcvm_tpu.ControlParams(
        sig_yield=SY0, nstep=22, iterat_max=20, error_max=1e-11,
        et_e=0.1, target_lf=99.0, ultimate_strain=0.25,
    )
    res = fcvm_tpu.solve_collapse(model, params)
    assert res.history.lbd[-1] > 2.4  # passed the elastic limit
    eps, peeq, sy = reference_1d_recursion(res.history.lbd[1:], 0.1)
    end = mesh.select_nodes(lambda x, y, z: x > L - 1e-9)
    ux = res.disp_total.reshape(-1, 3)[end, 0].mean()
    assert abs(ux - eps * L) / (eps * L) < 1e-8
    assert abs(res.peeq_gp.max() - peeq) / peeq < 1e-7
    assert abs(res.sig_yield_gp.max() - sy) / sy < 1e-9
    # homogeneous state: every Gauss point identical
    assert res.peeq_gp.max() - res.peeq_gp.min() < 1e-12


def test_perfect_plasticity_plateau():
    """Et/E = 0: the load factor must level off at sig_yield / sigma = 2.4."""
    mesh, model = uniaxial_model()
    params = fcvm_tpu.ControlParams(
        sig_yield=SY0, nstep=14, iterat_max=12, error_max=1e-8,
        et_e=0.0, target_lf=99.0, scale_re=2.0,
    )
    res = fcvm_tpu.solve_collapse(model, params)
    lbd = np.asarray(res.history.lbd)
    limit = SY0 / SIGMA
    assert lbd.max() <= limit * (1 + 1e-6)
    assert lbd.max() > limit * 0.99  # Riks walked up to the plateau
    assert res.peeq_gp.max() > 0.0


def test_target_lf_interception():
    mesh, model = uniaxial_model()
    params = fcvm_tpu.ControlParams(
        sig_yield=SY0, nstep=10, error_max=1e-9, et_e=0.1, target_lf=1.5
    )
    res = fcvm_tpu.solve_collapse(model, params)
    assert abs(res.history.lbd[-1] - 1.5) < 1e-12


def _disp_control_model(u_end):
    mesh = meshgen.box_tet10(2, 2, 2, L, L, L)
    bcs = fcvm_tpu.BoundaryConditions.from_node_sets(
        [
            (mesh.select_nodes(lambda x, y, z: x < 1e-9), (0.0, None, None)),
            (mesh.select_nodes(lambda x, y, z: y < 1e-9), (None, 0.0, None)),
            (mesh.select_nodes(lambda x, y, z: z < 1e-9), (None, None, 0.0)),
            (mesh.select_nodes(lambda x, y, z: x > L - 1e-9), (u_end, None, None)),
        ]
    )
    return mesh, fcvm_tpu.Model(mesh, fcvm_tpu.Material(E, NU), bcs, fcvm_tpu.Loads())


def test_displacement_control_reaction_elastic():
    """Prescribed end displacement: history.load records the reaction force
    level on the driven boundary (fcVM.py:1169-1177, 1522-1523)."""
    u_end = 0.01  # stays elastic through the whole ramp (sigma <= 126 MPa)
    mesh, model = _disp_control_model(u_end)
    params = fcvm_tpu.ControlParams(
        sig_yield=SY0, nstep=5, error_max=1e-10, et_e=0.1, target_lf=0.5
    )
    res = fcvm_tpu.solve_collapse(model, params)
    lf = res.history.lbd[-1]
    assert abs(lf - 0.5) < 1e-12
    sigma = E * (lf * u_end) / L
    np.testing.assert_allclose(res.history.load[-1], sigma * L * L, rtol=5e-6)
    end = mesh.select_nodes(lambda x, y, z: x > L - 1e-9)
    ux = res.disp_total.reshape(-1, 3)[end, 0]
    np.testing.assert_allclose(ux, lf * u_end, rtol=1e-6)


def test_displacement_control_plastic_consistency():
    """Driven into yield: the recorded reaction equals the integrated stress
    (the stress itself is validated against the reference recursion in
    test_hardening_matches_reference_recursion)."""
    u_end = 0.05
    mesh, model = _disp_control_model(u_end)
    params = fcvm_tpu.ControlParams(
        sig_yield=SY0, nstep=6, error_max=1e-10, et_e=0.1, target_lf=99.0
    )
    res = fcvm_tpu.solve_collapse(model, params)
    assert res.peeq_gp.max() > 0.0
    sig_xx = res.sig_gp[..., 0]
    assert sig_xx.max() - sig_xx.min() < 1e-6  # homogeneous state
    np.testing.assert_allclose(
        res.history.load[-1], sig_xx.mean() * L * L, rtol=1e-8
    )
    # lateral stresses vanish (uniaxial)
    assert np.abs(res.sig_gp[..., 1:]).max() < 1e-6


def test_checkpointing(tmp_path):
    from fcvm_tpu.runtime.checkpoint import latest_step

    mesh, model = uniaxial_model()
    params = fcvm_tpu.ControlParams(
        sig_yield=SY0, nstep=3, error_max=1e-8, et_e=0.1, target_lf=1.0
    )
    res = fcvm_tpu.solve_collapse(model, params, checkpoint_path=str(tmp_path))
    step, state = latest_step(str(tmp_path))
    assert step is not None and step >= 1
    np.testing.assert_allclose(state["disp_new"], res.disp_total)
    assert "sig_yield" in state and "csr" in state


def test_incremental_disp_output():
    mesh, model = uniaxial_model()
    params = fcvm_tpu.ControlParams(
        sig_yield=SY0, nstep=4, error_max=1e-10, et_e=0.1,
        target_lf=99.0, disp_output="incremental",
    )
    res = fcvm_tpu.solve_collapse(model, params)
    lbd = res.history.lbd
    dl_last = lbd[-1] - lbd[-2]
    end = mesh.select_nodes(lambda x, y, z: x > L - 1e-9)
    ux_inc = res.disp[3 * end[0]]
    np.testing.assert_allclose(ux_inc, dl_last * SIGMA * L / E, rtol=1e-7)


def test_continuation_scale_action():
    """The continuation callback's ("scale", v) action — the reference's
    "Displacement Scale" TextBox (fcVM.py:1657,1689,2044-2046) — records a
    displacement output scale on the results without disturbing the
    stepping, and composes with the button actions as an action list."""
    mesh, model = uniaxial_model()
    params = fcvm_tpu.ControlParams(
        sig_yield=SY0, nstep=2, error_max=1e-10, et_e=0.1, target_lf=99.0
    )
    actions = iter([[("scale", 25.0), "add"], None])
    res = fcvm_tpu.solve_collapse(
        model, params, continuation=lambda h, s: next(actions, None)
    )
    assert res.disp_scale == 25.0
    assert len(res.history.lbd) - 1 == 4  # "add" ran nstep more steps

    # a bare scale action does NOT continue the loop (the reference's box
    # edit never resumes stepping by itself — the buttons do)
    actions2 = iter([("scale", 5.0)])
    res2 = fcvm_tpu.solve_collapse(
        model, params, continuation=lambda h, s: next(actions2, None)
    )
    assert res2.disp_scale == 5.0
    assert len(res2.history.lbd) - 1 == 2
