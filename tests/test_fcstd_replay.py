"""Golden-corpus replay: FreeCAD ``.FCStd`` documents + paired ``.inp``
control files driven end-to-end, checked against the *committed* reference
outputs (``output files/*.out``) — the regression strategy SURVEY.md section 4
prescribes.

Every expected number in this file is copied from a committed reference
output, not from a prior run of this framework.
"""

from __future__ import annotations

import dataclasses
from pathlib import Path

import numpy as np
import pytest

REF = Path("/root/reference")
FCD = REF / "freeCAD files"

pytestmark = pytest.mark.skipif(
    not FCD.exists(), reason="reference corpus not mounted"
)


@pytest.fixture()
def scipy_solver():
    """Route linear solves through the host direct tier (the reference's
    Cholesky analogue) — exact solves keep tiny-mesh replays fast and make
    the buckling subspace iteration robust on slender bars."""
    from fcvm_tpu.config import get_config

    cfg = get_config()
    old = cfg.solver
    cfg.solver = "scipy"
    yield
    cfg.solver = old


def _load(case, **kw):
    from fcvm_tpu.models.fcstd import load_reference_case

    return load_reference_case(FCD / f"{case}.FCStd", **kw)


def _load_sums(model):
    import jax.numpy as jnp

    from fcvm_tpu.runtime import system as sysm

    lt = sysm.LoadTables.from_spec(model.loads, jnp.float64)
    glv, _, vol, sums = sysm.external_loads(
        jnp.asarray(model.mesh.coords),
        jnp.zeros(model.mesh.ndof),
        jnp.asarray(model.mesh.elnodes),
        lt,
        model.material.density,
        False,
    )
    return np.asarray(sums), float(vol)


# ---------------------------------------------------------------------------
# Ingest checksums (mesh sizes and load sums as committed in the .out files)
# ---------------------------------------------------------------------------


def test_tensile_ingest_checksums():
    # output files/tensile.out:2-12
    model, params = _load("tensile")
    assert model.mesh.n_elements == 24
    assert model.mesh.n_nodes == 63
    sums, vol = _load_sums(model)
    np.testing.assert_allclose(sums, [0.0, 0.0, 1.0e5], atol=1e-6)
    assert abs(vol - 1000.0) < 1e-9  # 10 mm cube
    assert params.sig_yield == 500.0


def test_bar_buckling_ingest_checksums():
    # output files/Bar buckling.out:2-11
    model, _ = _load("Bar buckling")
    assert model.mesh.n_elements == 145
    assert model.mesh.n_nodes == 408
    sums, vol = _load_sums(model)
    np.testing.assert_allclose(sums, [-1000.0, 0.0, 0.0], atol=1e-9)
    assert abs(vol - 1000.0 * 10 * 10) < 1e-6


def test_cantilever_new_style_force_units():
    # cantilever.FCStd stores Force as App::PropertyForce in FreeCAD
    # internal units (mN); committed load sum is -1 N (cantilever.out:10).
    model, _ = _load("cantilever")
    sums, _ = _load_sums(model)
    np.testing.assert_allclose(sums, [0.0, 0.0, -1.0], atol=1e-12)


def test_embankment_ingest_checksums():
    # output files/Embankment_with_Ditch_Example.out:2-12
    model, params = _load("Embankment_with_Ditch_Example")
    assert model.mesh.n_elements == 659
    assert model.mesh.n_nodes == 1418
    sums, _ = _load_sums(model)
    np.testing.assert_allclose(sums, [0.0, 0.0, -1.06e6], rtol=1e-3)
    assert params.gravity == (0.0, 0.0, -10.0)
    # plane-strain rollers: both y-faces, y-dof only
    fixmask, _, movdof = model.bcs.masks(model.mesh.ndof)
    fixed = np.where(fixmask < 0.5)[0]
    y_rollers = fixed[fixed % 3 == 1]
    assert len(y_rollers) >= 746  # 373 nodes per face (committed mesh)


def test_empty_embedded_mesh_raises():
    # Plate_with_hole_Example.FCStd was saved after purging the Gmsh mesh.
    from fcvm_tpu.models.fcstd import read_fcstd

    with pytest.raises(ValueError, match="empty"):
        read_fcstd(FCD / "Plate_with_hole_Example.FCStd")


# ---------------------------------------------------------------------------
# Physics replays against committed outputs
# ---------------------------------------------------------------------------


def test_bar_buckling_factors_match_committed(scipy_solver):
    # committed: elastic buckling factors [0.43472 0.43473]
    # ("Bar buckling.out:5"; Euler theory 432 N for the 1000 N load).
    # Residual ~1e-4 difference: the reference penalizes fixed dofs by
    # diagonal x100 (fcVM.py:1051-1062); we eliminate them exactly.
    from fcvm_tpu.runtime.driver import solve_collapse

    from overlay import write_factor_overlay

    model, params = _load("Bar buckling")
    res = solve_collapse(model, dataclasses.replace(params, nstep=1))
    write_factor_overlay("Bar_buckling", [0.43472, 0.43473], res.eigenvalues,
                         note="elimination BC (default); penalty mode "
                              "matches at print precision")
    np.testing.assert_allclose(res.eigenvalues, [0.43472, 0.43473], rtol=3e-4)


@pytest.fixture()
def penalty_bc():
    """Reference-parity penalty-BC buckling (fcVM.py:1051-1062 x100
    diagonal on the full pencil) — closes the ~3e-4 elimination-vs-penalty
    gap to committed print precision."""
    from fcvm_tpu.config import get_config

    cfg = get_config()
    old = cfg.buckling_bc
    cfg.buckling_bc = "penalty"
    yield
    cfg.buckling_bc = old


def test_bar_buckling_penalty_bc_committed_print_parity(scipy_solver, penalty_bc):
    # Under the reference's exact BC treatment the committed factors
    # ("Bar buckling.out:5") reproduce at print precision (5 decimals).
    from fcvm_tpu.runtime.driver import solve_collapse

    model, params = _load("Bar buckling")
    res = solve_collapse(model, dataclasses.replace(params, nstep=1))
    np.testing.assert_array_equal(
        np.round(np.asarray(res.eigenvalues), 5), [0.43472, 0.43473]
    )


def test_buckling_case_penalty_bc_committed_parity(scipy_solver, penalty_bc):
    # committed [4.26305, 38.52437] (Buckling.out:5); the first factor's
    # residual ~3e-6 is the committed-VTK coordinate print precision, far
    # inside the 3e-4 elimination-mode gap.
    from fcvm_tpu.runtime.driver import solve_collapse

    model, params = _load(
        "Buckling", mesh_path=REF / "output files" / "Buckling.vtk"
    )
    res = solve_collapse(model, dataclasses.replace(params, nstep=1))
    np.testing.assert_allclose(
        res.eigenvalues, [4.26305, 38.52437], rtol=5e-6
    )


def test_buckling_case_factors_match_committed(scipy_solver):
    # committed: [4.26305, 38.52437] (Buckling.out:5).  The committed run's
    # exact mesh comes from the committed VTK export (the document itself
    # was saved with a re-meshed, slightly different grid).
    from fcvm_tpu.runtime.driver import solve_collapse

    from overlay import write_factor_overlay

    model, params = _load(
        "Buckling", mesh_path=REF / "output files" / "Buckling.vtk"
    )
    assert model.mesh.n_elements == 214 and model.mesh.n_nodes == 553
    res = solve_collapse(model, dataclasses.replace(params, nstep=1))
    write_factor_overlay("Buckling", [4.26305, 38.52437], res.eigenvalues,
                         note="elimination BC (default)")
    np.testing.assert_allclose(
        res.eigenvalues, [4.26305, 38.52437], rtol=3e-4
    )


def test_lug_pressure_cylindrical_face_resolution():
    # ConstraintPressure on the lug hole's 90-degree bearing arc (two CAD
    # quarter-faces): committed load sums [2.12e5, ~0, ~0]
    # (Lug_Pressure_Example.out:9-11); analytic resultant for p=100 MPa on
    # a 90-degree arc of r=60, h=25: p*h*r*sqrt(2) = 212132 N.
    model, _ = _load(
        "Lug_Pressure_Example",
        mesh_path=REF / "output files" / "Lug_Pressure_Example.vtk",
    )
    assert model.mesh.n_elements == 685 and model.mesh.n_nodes == 1491
    sums, _ = _load_sums(model)
    np.testing.assert_allclose(sums, [212132.0, 0.0, 0.0], atol=300.0)


def test_tensile_elastic_steps_match_committed(scipy_solver):
    # committed table rows 2-3 (tensile.out:16-17): LF 0.1/0.2,
    # max disp 1.00e-2/2.00e-2, svm 100/200 at Gauss point 0
    # (5.69, 5.69, 2.76).
    from fcvm_tpu.runtime.driver import solve_collapse

    from overlay import write_curve_overlay

    model, params = _load("tensile")
    # the committed table runs past the .inp target 0.2 to the plastic
    # plateau at the limit load 0.5 — the author used the interactive
    # continuation loop (fcVM.py:1659-1686); emulate it with one retarget
    actions = iter([("target", 99.0)])
    res = solve_collapse(
        model, params, continuation=lambda h, s: next(actions, None)
    )
    h = res.history
    write_curve_overlay(
        "tensile", _read_out_table("tensile"), h,
        note="committed run retargeted past LF 0.2 via the GUI loop; "
             "replay emulates it with a continuation callback",
    )
    np.testing.assert_allclose(h.lbd[1:3], [0.1, 0.2], atol=1e-9)
    np.testing.assert_allclose(h.un[1:3], [0.01, 0.02], rtol=1e-6)
    np.testing.assert_allclose(h.svm[1:3], [100.0, 200.0], rtol=1e-6)
    # the continued run reaches the committed perfectly-plastic plateau
    # (limit load sig_y/sig(LF=1) = 500/1000): committed rows 0.3..0.5
    lbd = np.asarray(h.lbd)
    for c in (0.3, 0.4, 0.5):
        assert np.min(np.abs(lbd - c)) < 2e-3, (c, lbd)
    np.testing.assert_allclose(lbd[-1], 0.5, atol=2e-3)
    assert h.crip[1] == 0
    np.testing.assert_allclose(
        res.gp_coords.reshape(-1, 3)[0], [5.69, 5.69, 2.76], atol=1e-2
    )  # committed prints 3 significant digits (5.69e+00, 2.76e+00)


def test_embankment_collapse_curve_matches_committed(scipy_solver):
    # The committed load-displacement table (Embankment_with_Ditch_
    # Example.out, tail) — final LF 0.503 at max displacement 5.62e2 mm;
    # the slip-circle plateau rows [0.248, 0.330, 0.409, 0.459, 0.478, ...]
    # appear in our curve at 4-digit agreement.
    from fcvm_tpu.runtime.driver import solve_collapse

    from overlay import write_curve_overlay

    model, params = _load("Embankment_with_Ditch_Example")
    res = solve_collapse(model, params)
    write_curve_overlay(
        "Embankment_with_Ditch_Example",
        _read_out_table("Embankment_with_Ditch_Example"), res.history,
    )
    lbd = np.asarray(res.history.lbd)
    committed = [0.248, 0.330, 0.409, 0.459, 0.478, 0.484, 0.487, 0.489]
    for c in committed:
        assert np.min(np.abs(lbd - c)) < 1.5e-3, (c, lbd)
    assert abs(lbd[-1] - 0.503) < 1.5e-3
    assert abs(res.history.un[-1] - 562.0) < 5.0


def test_u100_buckling_replay(scipy_solver):
    # buckling_U100_3D.out: factors [3.89514, 8.39446], load sums
    # [2e3, 0, -5.01e4].  The committed VTK mesh carries the run's
    # imperfection-seeded coordinates (GNLY, maxImp=1), so constraint
    # resolution needs the relaxed-tolerance ladder and the replayed
    # geometry is ~1 mm perturbed: first factor matches to ~1e-4, the
    # second (torsional) to ~0.5%.
    import warnings

    from fcvm_tpu.runtime.driver import solve_collapse

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        model, params = _load(
            "buckling_U100_3D",
            mesh_path=REF / "output files" / "buckling_U100_3D.vtk",
        )
    sums, _ = _load_sums(model)
    np.testing.assert_allclose(sums, [2000.0, 0.0, -5.01e4], rtol=2e-3)
    from overlay import write_factor_overlay

    res = solve_collapse(model, dataclasses.replace(params, nstep=1))
    write_factor_overlay(
        "buckling_U100_3D", [3.89514, 8.39446], res.eigenvalues,
        note="replayed on the committed VTK's imperfection-seeded geometry",
    )
    assert abs(res.eigenvalues[0] - 3.89514) < 2e-3
    assert abs(res.eigenvalues[1] - 8.39446) < 0.05


def test_block_disp_control_replay(scipy_solver):
    # Fully confined block, all six faces displacement-driven (three with
    # nonzero values) — exercises the movdof/reaction path through the
    # FCStd ingest.  Deviatoric stress caps at yield while the volumetric
    # response stays elastic: at target LF 10 the prescribed strains are
    # (0.01, 0.01, 0.1), so the top-face reaction is dominated by
    # p*A = K*eps_v*A = (E/(3(1-2nu)))*0.12*100 = 2.0e6 N.
    from fcvm_tpu.runtime.driver import solve_collapse

    model, params = _load("Block_Disp_Control_Example")
    _, _, movdof = model.bcs.masks(model.mesh.ndof)
    assert int(movdof.sum()) == 39  # 13 nodes each on three driven faces
    res = solve_collapse(model, params)
    assert abs(res.history.lbd[-1] - 10.0) < 1e-9  # target-LF interception
    assert float(res.svm_gp.max()) == pytest.approx(100.0, rel=1e-9)  # yield
    assert float(res.peeq_gp.max()) > 0.05
    e, nu = model.material.e, model.material.nu
    bulk_reaction = e / (3 * (1 - 2 * nu)) * 0.12 * 100.0
    assert res.history.load[-1] == pytest.approx(bulk_reaction, rel=0.01)


def test_vm_uniaxial_tension_verification_replay(scipy_solver):
    # The reference's own von Mises verification model: self-equilibrated
    # biaxial tension (+/-10 MPa pressure pairs on the x- and z-faces, net
    # load sums zero) with the textbook 3-2-1 vertex constraint set.
    # Elastic biaxial-equal-tension von Mises: svm = 10 * LF.
    from fcvm_tpu.runtime.driver import solve_collapse

    model, params = _load("VM_Uniaxial_Tension_Example")
    sums, _ = _load_sums(model)
    np.testing.assert_allclose(sums, [0.0, 0.0, 0.0], atol=1e-9)
    assert len(model.bcs.fixed_dofs) == 6  # 3-2-1 rigid-body suppression
    res = solve_collapse(model, params)
    assert abs(res.history.lbd[-1] - params.target_lf) < 1e-9
    np.testing.assert_allclose(
        float(res.svm_gp.max()), 10.0 * params.target_lf, rtol=1e-9
    )
    assert float(res.peeq_gp.max()) == 0.0  # below yield (LF 10)


def test_simple_shear_verification_replay(scipy_solver):
    # Pure shear via two force couples (tau = 100 MPa at LF 1): the von
    # Mises collapse load factor is sig_y / (sqrt(3) tau) = 1/sqrt(3).
    from fcvm_tpu.runtime.driver import solve_collapse

    model, params = _load("Simple Shear")
    res = solve_collapse(model, params)
    plateau = np.asarray(res.history.lbd)[-5:]
    # the Riks path oscillates +/-1.6% around the limit load on this
    # 24-element mesh; the mean tracks 1/sqrt(3) to ~0.3%
    np.testing.assert_allclose(plateau.mean(), 1.0 / np.sqrt(3.0), rtol=0.005)
    np.testing.assert_allclose(plateau, 1.0 / np.sqrt(3.0), rtol=0.02)
    assert float(res.svm_gp.max()) == pytest.approx(100.0, rel=1e-9)
    assert float(res.peeq_gp.max()) > 1e-3


def test_elastica_large_deflection_matches_ode(scipy_solver):
    # The bundled Elastica model: 1000x10x10 cantilever, dead end load 175 N
    # per unit LF, GNLY.  Adaptive Riks stepping runs deep into the
    # geometric-nonlinear regime (PL^2/EI ~ 20); the solid-element tip
    # position matches the inextensible-elastica ODE (EI theta'' =
    # -P cos(theta), theta(0)=0, theta'(L)=0) to ~2.5% — the residual is
    # genuine solid-section physics (shear deformation, Poisson effects)
    # plus the 78-element mesh.
    from scipy.integrate import solve_bvp

    from fcvm_tpu.runtime.driver import solve_collapse

    model, params = _load("Elastica")
    res = solve_collapse(
        model, dataclasses.replace(params, nstep=40, target_lf=99.0)
    )
    lf = res.history.lbd[-1]
    assert lf > 10.0  # deep elastica regime reached without divergence
    tip = model.mesh.select_nodes(lambda x, y, z: x > 1000 - 1e-6)
    u = res.disp_total.reshape(-1, 3)[tip]
    ux, uz = float(u[:, 0].mean()), float(u[:, 2].mean())

    length, ei = 1000.0, 210000.0 * 10.0 * 10.0**3 / 12.0
    s = np.linspace(0.0, length, 400)
    y = np.zeros((2, s.size))
    for p_k in np.linspace(50.0, 175.0 * lf, 30):  # load continuation

        def ode(ss, yy, p_k=p_k):
            return np.vstack([yy[1], -p_k / ei * np.cos(yy[0])])

        def bc(ya, yb):
            return np.array([ya[0], yb[1]])

        sol = solve_bvp(ode, bc, s, y, max_nodes=40000, tol=1e-10)
        y = sol.sol(s)
    th = sol.sol(s)[0]
    ux_ode = float(np.trapezoid(np.cos(th), s)) - length
    uz_ode = -float(np.trapezoid(np.sin(th), s))  # load acts in -z
    assert abs(ux - ux_ode) / abs(ux_ode) < 0.03
    assert abs(uz - uz_ode) / abs(uz_ode) < 0.03


def test_cli_replay_fcstd(tmp_path, scipy_solver):
    """The Start-button equivalent on a raw FreeCAD document."""
    from fcvm_tpu.__main__ import main

    main(
        [
            "run",
            str(FCD / "tensile.FCStd"),
            "--outdir",
            str(tmp_path),
            "--cpu",
            "--x64",
        ]
    )
    out = (tmp_path / "tensile.out").read_text()
    assert "Sum of loads z-direction:        1.00e+05" in out


def test_cloud_resolver_edges_and_vertices():
    """Unit coverage for edge/vertex resolution (no bundled document with an
    intact mesh references edges, so exercise the path synthetically)."""
    from fcvm_tpu.models.fcstd import CloudResolver
    from fcvm_tpu.models import meshgen

    mesh = meshgen.box_tet10(3, 3, 3, 10.0, 10.0, 10.0)
    res = CloudResolver(mesh)
    # the x-axis edge y=z=0, sampled like a FreeCAD marker grid
    pts = np.column_stack(
        [np.linspace(0.0, 10.0, 5), np.zeros(5), np.zeros(5)]
    )
    edges = res.edges_for(pts)
    assert len(edges)
    nodes = np.unique(edges)
    xyz = mesh.coords[nodes]
    np.testing.assert_allclose(xyz[:, 1:], 0.0, atol=1e-9)
    expected = mesh.select_nodes(
        lambda x, y, z: (np.abs(y) < 1e-9) & (np.abs(z) < 1e-9)
    )
    assert set(nodes.tolist()) == set(expected.tolist())

    verts = res.vertices_for(np.array([[10.0, 10.0, 10.0], [0.0, 0.0, 0.0]]))
    got = set(mesh.coords[verts].round(6).sum(axis=1).tolist())
    assert got == {30.0, 0.0}


def test_whole_corpus_ingest_never_crashes():
    """Every bundled .FCStd either builds a model or raises a clean,
    diagnosable error (documents saved with purged Gmsh meshes raise
    ValueError) — no ingest crash across the 70+ document corpus."""
    import warnings

    from fcvm_tpu.models.fcstd import build_model, read_fcstd

    ok = clean = 0
    for f in sorted(FCD.glob("*.FCStd")):
        try:
            with warnings.catch_warnings():
                warnings.simplefilter("ignore")
                build_model(read_fcstd(f))
            ok += 1
        except (ValueError, FileNotFoundError):
            clean += 1
    assert ok >= 10
    assert ok + clean == len(list(FCD.glob("*.FCStd")))


# ---------------------------------------------------------------------------
# Corpus regression sweep (round 2): every committed .out either replays
# with curve assertions or carries a *verified* skip reason.
# ---------------------------------------------------------------------------


def _read_out_table(stem):
    """Parse a committed ``output files/<stem>.out`` step table into columns."""
    txt = (REF / "output files" / f"{stem}.out").read_text().splitlines()
    rows = []
    in_table = False
    for line in txt:
        if line.startswith("Gauss point"):
            in_table = True
            continue
        if in_table:
            parts = line.split()
            if len(parts) != 12:
                break
            rows.append([float(v) for v in parts])
    cols = np.asarray(rows)
    return {
        "crip": cols[:, 0].astype(int), "load": cols[:, 4], "disp": cols[:, 5],
        "peeq": cols[:, 6], "svm": cols[:, 8], "csr": cols[:, 11],
    }


def test_lug_pressure_collapse_curve_matches_committed(scipy_solver):
    """Full 60-step plastic collapse of the lug (committed VTK mesh, 685
    elements — matches the run that produced the .out) against the whole
    committed load-displacement table."""
    import warnings

    from fcvm_tpu.runtime.driver import solve_collapse

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        model, params = _load(
            "Lug_Pressure_Example",
            mesh_path=REF / "output files" / "Lug_Pressure_Example.vtk",
        )
    from overlay import write_curve_overlay

    table = _read_out_table("Lug_Pressure_Example")
    # the committed run continued past nstep=30 via the GUI add loop
    # (fcVM.py:1659-1686) to 60 rows; emulate with one "add" action
    actions = iter(["add"])
    res = solve_collapse(
        model, params, continuation=lambda h, s: next(actions, None)
    )
    write_curve_overlay(
        "Lug_Pressure_Example", table, res.history,
        note="committed run continued past nstep=30 via the GUI add loop; "
             "replay emulates it with a continuation callback",
    )
    lbd = np.asarray(res.history.lbd)
    un = np.asarray(res.history.un)
    n = min(len(lbd), len(table["load"]))
    assert n >= 50, f"replay produced only {n} steps"
    # committed table prints 3 significant digits -> 0.5% quantization;
    # allow 1% on the two adaptive-stepping paths over the full table
    np.testing.assert_allclose(lbd[:n], table["load"][:n], rtol=1e-2, atol=5e-3)
    np.testing.assert_allclose(un[:n], table["disp"][:n], rtol=1.5e-2, atol=5e-3)


def test_cantilever_replay_coarse_mesh(scipy_solver):
    """cantilever.out was committed from a 4998-element mesh; the document
    now embeds an 84-element one, so exact curve parity is impossible —
    asserted instead: identical load checksums (geometry-level), plastic
    plateau onset at the same load level to coarse-mesh accuracy."""
    from fcvm_tpu.runtime.driver import solve_collapse

    from overlay import write_curve_overlay

    model, params = _load("cantilever")
    sums, _ = _load_sums(model)
    np.testing.assert_allclose(sums, [0.0, 0.0, -1.0], atol=1e-9)
    res = solve_collapse(model, params)
    write_curve_overlay(
        "cantilever", _read_out_table("cantilever"), res.history,
        note="committed = 4998-element mesh, replay = embedded 84-element "
             "mesh (exact parity impossible; mechanism-level only)",
    )
    lbd = np.asarray(res.history.lbd)
    # committed fine-mesh run plateaus toward 0.279 with adaptive steps
    # shrinking; the coarse mesh carries the same collapse mechanism
    assert 0.2 < lbd[-1] < 0.45, lbd
    steps = np.diff(lbd)
    assert steps[-1] < 0.25 * steps.max(), "no plastic step shrinkage"
    assert float(res.peeq_gp.max()) > 1e-5


def test_lug_faceload_replay_physics(scipy_solver):
    """Lug_FaceLoad_Example has no committed .out — asserted: force
    constraint resolves to the bearing face with the exact total, and the
    elastic prefix of the response is linear."""
    from fcvm_tpu.runtime.driver import solve_collapse

    model, params = _load("Lug_FaceLoad_Example")
    sums, _ = _load_sums(model)
    # ConstraintForce total (direction +x), integrated over resolved faces
    assert abs(sums[0]) > 1.0  # nonzero resolved load
    np.testing.assert_allclose(sums[1:], 0.0, atol=1e-6 * abs(sums[0]))
    res = solve_collapse(model, dataclasses.replace(params, nstep=4))
    h = res.history
    r1 = h.un[1] / h.lbd[1]
    for k in (2, 3):
        if h.peeq[k] == 0.0:
            np.testing.assert_allclose(h.un[k] / h.lbd[k], r1, rtol=1e-6)


# Declarative committed-output coverage: every .out is either replayed by a
# test in this file or skipped for a reason the test below *verifies*.
_OUT_STATUS = {
    "Bar buckling": "replayed",
    "Buckling": "replayed",
    "Embankment_with_Ditch_Example": "replayed",
    "Lug_Pressure_Example": "replayed",
    "buckling_U100_3D": "replayed",
    "cantilever": "replayed",
    "tensile": "replayed",
    "Haltegriff_FEM_RC": "mesh-purged",
    "Haltegriff_FEM_RC_handle": "mesh-purged",
    "IPE400": "mesh-purged",
    "IPE400_2": "mesh-purged",
    "IPE400_3": "mesh-purged",
    "IPE400_4": "mesh-purged",
    "Pit_Example": "mesh-purged",
    "Plate_girder_EC3": "mesh-purged",
    "Plate_with_hole_Example": "mesh-purged",
    "Plate_with_square_hole_Example": "mesh-purged",
    "Torsion": "mesh-purged",
    "Wyk_Rohrstoss_linear": "mesh-purged",
    "Wyk_Rohrstoss_ring": "mesh-purged",
    "barrier": "mesh-purged",
    "box girder": "mesh-purged",
    "train_bridge": "mesh-purged",
    "transition": "mesh-purged",
    "transition3": "mesh-purged",
    "Portal_support_1": "no-document",
    "Portal_support_2": "no-document",
    "Portal_support_3": "no-document",
    "Portal_support_4": "no-document",
    "Transom_double_outfile": "no-document",
    "Transom_single_outfile": "no-document",
    "Tube_Corner_500x5mm_GNL": "no-document",
    "Tube_Corner_500x5mm_GNL_with_plate": "no-document",
    "barrier_GNLEP": "no-document",
    "snapback": "no-document",
    "strip_failure_fcVM": "no-document",
    "tank_GNLEP_e=10mm": "no-document",
    "tank_GNLEP_e=5mm": "no-document",
    "transition2_GL": "no-document",
    "transition2_GL_1": "no-document",
    "transition2_GNL_1": "no-document",
}


def test_committed_output_coverage_is_complete():
    """The status table covers every committed .out file exactly."""
    stems = {p.stem for p in (REF / "output files").glob("*.out")}
    assert stems == set(_OUT_STATUS), (
        stems.symmetric_difference(set(_OUT_STATUS))
    )


@pytest.mark.parametrize(
    "stem", [s for s, v in _OUT_STATUS.items() if v != "replayed"]
)
def test_committed_output_skip_reasons_are_real(stem):
    """A skip reason must stay true: 'mesh-purged' documents must actually
    fail mesh ingest (if one regains a mesh, it must be promoted to a
    replay test); 'no-document' stems must have no .FCStd at all."""
    from fcvm_tpu.models.fcstd import read_fcstd

    reason = _OUT_STATUS[stem]
    doc = FCD / f"{stem}.FCStd"
    if reason == "no-document":
        assert not doc.exists()
        return
    assert doc.exists()
    vtk = REF / "output files" / f"{stem}.vtk"
    assert not vtk.exists(), f"{stem}: VTK mesh exists — promote to replay"
    with pytest.raises((ValueError, FileNotFoundError)):
        read_fcstd(doc)


def test_fixed_constraint_mixed_face_vertex_pins_vertex_node():
    """A Fixed/Displacement constraint referencing Face + Vertex must pin
    the vertex node too: the reference applies getNodesByVertex in the
    same References loop as faces (fcVM.py:204-216).  Regression for the
    round-3 review finding where mixed-kind clouds dropped vertices."""
    import numpy as np

    from fcvm_tpu.models import meshgen
    from fcvm_tpu.models.fcstd import (
        FcstdConstraint, FcstdDoc, FcstdMaterial, build_model,
    )

    mesh = meshgen.box_tet10(2, 2, 2, 10.0, 10.0, 10.0)
    # face samples: a grid on the x=0 plane (with inward normals -x, the
    # orientation FreeCAD stores for marker clouds is irrelevant — the
    # resolver clusters by direction); vertex sample: the (10,10,10) corner,
    # which lies on no referenced face
    gy, gz = np.meshgrid(np.linspace(0.5, 9.5, 4), np.linspace(0.5, 9.5, 4))
    face_pts = np.column_stack(
        [np.zeros(gy.size), gy.ravel(), gz.ravel()])
    vert_pt = np.array([[10.0, 10.0, 10.0]])
    pts = np.vstack([face_pts, vert_pt])
    nrm = np.tile([-1.0, 0.0, 0.0], (len(pts), 1))  # blob stores face normals
    con = FcstdConstraint(
        name="FixedMixed", kind="Fixed",
        subs=[("Box", "Face1"), ("Box", "Vertex8")],
        points=pts, normals=nrm, props={},
    )
    doc = FcstdDoc(
        label="synthetic", mesh=mesh,
        materials=[FcstdMaterial(210000.0, 0.3, 0.0, [], {})],
        constraints=[con],
    )
    model = build_model(doc)
    fixmask, _, _ = model.bcs.masks(mesh.ndof)
    corner = mesh.select_nodes(
        lambda x, y, z: (x > 10 - 1e-9) & (y > 10 - 1e-9) & (z > 10 - 1e-9)
    )
    assert len(corner) == 1
    # the vertex node is pinned in all three dofs...
    assert fixmask[3 * corner[0]: 3 * corner[0] + 3].max() < 0.5
    # ...and so is every node of the referenced face (x=0 plane)
    plane = mesh.select_nodes(lambda x, y, z: x < 1e-9)
    assert all(
        fixmask[3 * n: 3 * n + 3].max() < 0.5 for n in plane
    )


# ---------------------------------------------------------------------------
# Full-document-corpus accounting (round 4): every *.FCStd in the reference
# bundle — not just the stems with committed .out files — is either INGESTED
# (and then driven by the replay/smoke test _INGEST_TESTED names) or carries
# a machine-verified skip reason.  "mesh-purged": the document still has its
# FEM mesh object but the embedded mesh payload was emptied before
# committing (read_fcstd raises the empty-mesh ValueError); if such a
# document has a committed output-files VTK mesh, the replay substitutes it
# (_VTK_REPLAYED, promote rule).  "no-mesh-object": no FEM mesh object at
# all (CAD-only / container documents).
# ---------------------------------------------------------------------------

_DOC_STATUS = {
    "1310933_Mastverankerung": "mesh-purged",
    "Anschluss_Rahmenfuss": "mesh-purged",
    "Anschluss_Rahmenfuss_fillet": "mesh-purged",
    "Anschluss_Rahmenfuss_no_fillet": "mesh-purged",
    "Bar buckling": "ingests",
    "Block_Disp_Control_Example": "ingests",
    "Buckling": "ingests",
    "Castellated_Beam": "mesh-purged",
    "Cruciform Fillet Test (no welds)": "mesh-purged",
    "Cruciform Fillet Test": "mesh-purged",
    "Elastica": "ingests",
    "Elastica_2": "mesh-purged",
    "Elastica_3": "mesh-purged",
    "Embankment_with_Ditch_Example": "ingests",
    "HEA200_frame_corner": "mesh-purged",
    "HH_Blankenese_Bestand": "mesh-purged",
    "Haltegriff_FEM_RC": "mesh-purged",
    "Haltegriff_FEM_RC_handle": "mesh-purged",
    "IPE400": "mesh-purged",
    "IPE400_2": "mesh-purged",
    "IPE400_3": "mesh-purged",
    "IPE400_4": "mesh-purged",
    "Lug_FaceLoad_Example": "ingests",
    "Lug_Pressure_Example": "mesh-purged",
    "NMS_Ruhrstr12_Silo_CAD": "no-mesh-object",
    "NMS_Ruhrstr12_Silo_FEM_RC": "no-mesh-object",
    "Pit_Example": "mesh-purged",
    "Plate_Girder": "mesh-purged",
    "Plate_girder_EC3": "mesh-purged",
    "Plate_girder_EC3_hvl": "mesh-purged",
    "Plate_girder_EC3_ts": "mesh-purged",
    "Plate_with_hole_Example": "mesh-purged",
    "Plate_with_square_hole_Example": "mesh-purged",
    "Profile_stripped": "mesh-purged",
    "SHB15_test": "mesh-purged",
    "Schelle_fem": "mesh-purged",
    "Simple Shear": "ingests",
    "Spanner_Example": "mesh-purged",
    "SteelPlate": "mesh-purged",
    "Torsion": "mesh-purged",
    "Transom 1270_95_10kN_half": "mesh-purged",
    "Transom 1270_95_20kN_load": "mesh-purged",
    "Trench_Example": "mesh-purged",
    "Tresca": "no-mesh-object",
    "Tube_Corner": "mesh-purged",
    "Tubes_Example": "mesh-purged",
    "U_joint": "mesh-purged",
    "VM_Uniaxial_Tension_Example": "ingests",
    "Wyk_Rohrstoss_linear": "mesh-purged",
    "Wyk_Rohrstoss_ring": "mesh-purged",
    "barrier": "mesh-purged",
    "box girder": "mesh-purged",
    "box": "mesh-purged",
    "buckling_U100_3D": "mesh-purged",
    "buckling_test": "mesh-purged",
    "cantilever": "ingests",
    "conical_shell": "no-mesh-object",
    "cruciform": "mesh-purged",
    "cruciform_column": "mesh-purged",
    "cylinder": "mesh-purged",
    "frame_node": "mesh-purged",
    "ladder_clamp": "mesh-purged",
    "shear_panel": "mesh-purged",
    "shear_panel_with_hole": "mesh-purged",
    "shear_panel_with_square_hole": "mesh-purged",
    "sleeve": "mesh-purged",
    "tensile": "ingests",
    "train_bridge": "mesh-purged",
    "transition": "mesh-purged",
    "transition2": "mesh-purged",
    "transition3": "mesh-purged",
}

# every document with an intact embedded mesh and the test that drives it
_INGEST_TESTED = {
    "Bar buckling": "test_bar_buckling_factors_match_committed",
    "Block_Disp_Control_Example": "test_block_disp_control_replay",
    "Buckling": "test_buckling_case_factors_match_committed",
    "Elastica": "test_elastica_large_deflection_matches_ode",
    "Embankment_with_Ditch_Example": "test_embankment_collapse_curve_matches_committed",
    "Lug_FaceLoad_Example": "test_lug_faceload_replay_physics",
    "Simple Shear": "test_simple_shear_verification_replay",
    "VM_Uniaxial_Tension_Example": "test_vm_uniaxial_tension_verification_replay",
    "cantilever": "test_cantilever_replay_coarse_mesh",
    "tensile": "test_tensile_elastic_steps_match_committed",
}

# mesh-purged documents replayed through their committed output-files VTK
# mesh instead (the only two purged documents that have one + a committed
# .out to check against)
_VTK_REPLAYED = {
    "Lug_Pressure_Example": "test_lug_pressure_collapse_curve_matches_committed",
    "buckling_U100_3D": "test_u100_buckling_replay",
}


def test_document_corpus_accounting_is_complete():
    """The status table covers every bundled .FCStd exactly."""
    stems = {p.stem for p in FCD.glob("*.FCStd")}
    assert stems == set(_DOC_STATUS), (
        stems.symmetric_difference(set(_DOC_STATUS))
    )
    # every ingesting document is driven by a real test in this module
    assert set(_INGEST_TESTED) == {
        s for s, v in _DOC_STATUS.items() if v == "ingests"
    }
    for name in list(_INGEST_TESTED.values()) + list(_VTK_REPLAYED.values()):
        assert callable(globals().get(name)), f"missing test {name}"


@pytest.mark.parametrize("stem", sorted(_DOC_STATUS))
def test_document_status_is_real(stem):
    """Each status must stay true against the actual document: an 'ingests'
    document must still produce a mesh; a 'mesh-purged' one must still fail
    with the empty-mesh error (if it regains a mesh, promote it); a purged
    document with a committed VTK mesh must be in the VTK-replay set."""
    from fcvm_tpu.models.fcstd import read_fcstd

    doc = FCD / f"{stem}.FCStd"
    status = _DOC_STATUS[stem]
    if status == "ingests":
        d = read_fcstd(doc)
        assert len(d.mesh.elnodes) > 0
    elif status == "mesh-purged":
        with pytest.raises(ValueError, match="empty"):
            read_fcstd(doc)
        if (REF / "output files" / f"{stem}.vtk").exists():
            assert stem in _VTK_REPLAYED, (
                f"{stem}: committed VTK mesh exists — promote to a VTK replay"
            )
    else:
        assert status == "no-mesh-object"
        with pytest.raises(FileNotFoundError, match="no FEM mesh object"):
            read_fcstd(doc)
