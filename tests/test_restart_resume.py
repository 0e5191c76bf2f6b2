"""Divergence restarts, checkpoint resume, and load reversal."""

import numpy as np

import fcvm_tpu
from fcvm_tpu.models import meshgen

E, NU, SY0, L, SIGMA = 210000.0, 0.3, 240.0, 10.0, 100.0


def _model(n=2):
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
        traction_faces=faces, tractions=np.tile([SIGMA, 0, 0], (len(faces), 1))
    )
    return mesh, fcvm_tpu.Model(mesh, fcvm_tpu.Material(E, NU), bcs, loads)


def test_divergence_restart_recovers():
    """A big first increment into perfect plasticity with a tight iteration
    budget forces the restart path (fcVM.py:1457-1484); with the shrunken
    increments the analysis must still converge to the collapse plateau."""
    mesh, model = _model()
    sy = 40.0  # yield at LF 0.4, inside the first dl = 0.5 increment
    params = fcvm_tpu.ControlParams(
        sig_yield=sy, nstep=2, iterat_max=5, error_max=1e-5,
        et_e=0.0, target_lf=99.0, scale_re=2.0,
    )
    logs = []
    res = fcvm_tpu.solve_collapse(model, params, progress=logs.append)
    assert any("RESTART" in s for s in logs)
    lbd = np.asarray(res.history.lbd)
    assert abs(lbd.max() - sy / SIGMA) < 1e-3  # plateau reached post-restart
    assert res.peeq_gp.max() > 0.0


def test_max_restarts_abandons_cleanly():
    """With no room to converge at all, the 4-restart cap must truncate the
    history instead of looping forever (fcVM.py:1461-1465)."""
    mesh, model = _model()
    params = fcvm_tpu.ControlParams(
        sig_yield=SY0, nstep=1, iterat_max=0, error_max=1e-14,
        et_e=0.0, target_lf=99.0, scale_re=2.0,
    )
    res = fcvm_tpu.solve_collapse(model, params)
    assert not res.fail  # reference sets fail=False on abandon
    assert len(res.history.lbd) == len(res.history.un)


def test_checkpoint_resume_matches_straight_run(tmp_path):
    """5 steps + resume(5 more) == 10 straight steps (same dl0 lineage)."""
    base = fcvm_tpu.ControlParams(
        sig_yield=SY0, nstep=5, error_max=1e-10, et_e=0.1, target_lf=99.0
    )
    mesh, model = _model()
    res_full = fcvm_tpu.solve_collapse(
        model, base,
        continuation=lambda h, i: "add" if len(h.lbd) <= 6 else "stop",
    )
    fcvm_tpu.solve_collapse(model, base, checkpoint_path=str(tmp_path))
    res_resumed = fcvm_tpu.solve_collapse(model, base, resume_from=str(tmp_path))
    np.testing.assert_allclose(res_resumed.history.lbd, res_full.history.lbd, rtol=1e-9)
    np.testing.assert_allclose(res_resumed.disp_total, res_full.disp_total, rtol=1e-6, atol=1e-12)
    np.testing.assert_allclose(res_resumed.peeq_gp, res_full.peeq_gp, rtol=1e-6, atol=1e-15)


def test_reverse_continuation_unloads():
    """'rev' mirrors the reference plot window's reverse button: the load
    factor must decrease again and elastic unloading leave plastic strain."""
    mesh, model = _model()
    params = fcvm_tpu.ControlParams(
        sig_yield=SY0, nstep=8, error_max=1e-9, et_e=0.1, target_lf=99.0
    )
    phase = {"n": 0}

    def cont(h, info):
        phase["n"] += 1
        if phase["n"] == 1:
            return "rev"
        return "stop"

    res = fcvm_tpu.solve_collapse(model, params, continuation=cont)
    lbd = np.asarray(res.history.lbd)
    imax = int(np.argmax(lbd))
    assert imax < len(lbd) - 1  # it went up, then came back down
    assert lbd[-1] < lbd[imax]
    assert res.peeq_gp.max() > 0  # residual plastic strain persists
