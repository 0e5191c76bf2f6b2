"""TOML case files + CLI front end."""

import numpy as np

from fcvm_tpu.models.casefile import load_case
from fcvm_tpu.models.inp import ControlParams, write_inp

CASE = """
name = "cli_box"
[mesh.generator]
kind = "box"
nx = 2
lx = 10.0

[material]
e = 210000.0
nu = 0.3

[control]
sig_yield = 240.0
nstep = 3
error_max = 1e-8
target_lf = 1.0

[[bc]]
where = "x < 1e-9"
ux = 0.0
uy = 0.0
uz = 0.0

[[load.face]]
where = "x > 10.0 - 1e-9"
traction = [50.0, 0.0, 0.0]
"""


def test_load_case(tmp_path):
    p = tmp_path / "case.toml"
    p.write_text(CASE)
    model, params = load_case(p)
    assert model.name == "cli_box"
    assert model.mesh.n_elements == 48
    assert params.nstep == 3
    assert len(model.loads.traction_faces) > 0
    fixmask, _, _ = model.bcs.masks(model.ndof)
    assert (fixmask < 0.5).sum() > 0


def test_case_with_reference_inp(tmp_path):
    inp = ControlParams(sig_yield=123.0, nstep=7, gnl="GNLN", grav_z=-9.81)
    write_inp(inp, tmp_path / "ref.inp")
    p = tmp_path / "case.toml"
    p.write_text(
        """
[mesh.generator]
kind = "box"
nx = 1
lx = 1.0
[control]
inp = "ref.inp"
[[bc]]
where = "z < 1e-9"
uz = 0.0
"""
    )
    model, params = load_case(p)
    assert params.sig_yield == 123.0
    assert params.nstep == 7
    # gravity from the .inp propagates into the load tables
    np.testing.assert_allclose(model.loads.gravity, [0.0, 0.0, -9.81])


def test_cli_info_and_run(tmp_path, capsys):
    from fcvm_tpu.__main__ import main

    p = tmp_path / "case.toml"
    p.write_text(CASE)
    assert main(["info", str(p)]) == 0
    out = capsys.readouterr().out
    assert "elements: 48" in out

    outdir = tmp_path / "out"
    assert main(["run", str(p), "--outdir", str(outdir)]) == 0
    assert (outdir / "cli_box.out").exists()
    assert (outdir / "cli_box.vtk").exists()


def test_cli_buckle(tmp_path, capsys):
    from fcvm_tpu.__main__ import main

    p = tmp_path / "case.toml"
    p.write_text(
        """
name = "col"
[mesh.generator]
kind = "box"
nx = 6
ny = 1
nz = 1
lx = 20.0
ly = 1.0
lz = 1.0
[control]
gnl = "GNLY"
nstep = 1
[[bc]]
where = "x < 1e-9"
ux = 0.0
uy = 0.0
uz = 0.0
[[load.face]]
where = "x > 20.0 - 1e-9"
traction = [-1000.0, 0.0, 0.0]
"""
    )
    assert main(["buckle", str(p)]) == 0
    out = capsys.readouterr().out
    assert "buckling load factors" in out


def test_cli_run_with_sum_groups(tmp_path):
    from fcvm_tpu.__main__ import main

    p = tmp_path / "case.toml"
    p.write_text(
        CASE
        + """
[[sum.face]]
name = "loaded_face"
where = "x > 10.0 - 1e-9"

[[sum.edge]]
name = "bottom_edge"
where = "(y < 1e-9) & (z < 1e-9)"
"""
    )
    outdir = tmp_path / "out"
    assert main(["run", str(p), "--outdir", str(outdir)]) == 0
    avr = (outdir / "cli_box.avr").read_text()
    assert "loaded_face" in avr and "bottom_edge" in avr
    # the loaded face area is 100; check the printed row
    import re

    row = [ln for ln in avr.splitlines() if "loaded_face" in ln][0]
    area = float(row.split()[0])
    assert abs(area - 100.0) < 1e-6


def test_boundary_edges_extraction():
    from fcvm_tpu.models import meshgen

    mesh = meshgen.box_tet10(1, 1, 1, 2.0, 2.0, 2.0)
    edges = mesh.edges_on(lambda x, y, z: (y < 1e-9) & (z < 1e-9))
    # the x-axis edge of the box: 1 element edge (2 halves? nx=1 -> 1 edge...)
    assert len(edges) >= 1
    import numpy as np

    lengths = []
    for e in edges:
        c = mesh.coords[e]
        lengths.append(np.linalg.norm(c[1] - c[0]))
    assert abs(sum(lengths) - 2.0) < 1e-9


def test_total_force_distribution(tmp_path):
    """[[load.force]]: total force divided by area/length/count
    (fcVM.py:289-326 semantics)."""
    from fcvm_tpu.models.casefile import load_case
    import numpy as np

    p = tmp_path / "case.toml"
    p.write_text(
        """
[mesh.generator]
kind = "box"
nx = 2
lx = 10.0
[[bc]]
where = "x < 1e-9"
ux = 0.0
uy = 0.0
uz = 0.0
[[load.force]]
where = "x > 10.0 - 1e-9"
on = "face"
total = [500.0, 0.0, 0.0]
[[load.force]]
where = "(x > 10.0 - 1e-9) & (y < 1e-9) & (z < 1e-9)"
on = "vertex"
total = [0.0, 7.0, 0.0]
"""
    )
    model, params = load_case(p)
    # face tractions integrate back to the total force
    import jax.numpy as jnp
    from fcvm_tpu.ops import assembly as asm
    from fcvm_tpu.runtime import system as sysm
    from fcvm_tpu.utils.indexing import pad_ndof

    lt = sysm.LoadTables.from_spec(model.loads, jnp.float64)
    nd = pad_ndof(model.ndof)
    glv, _, _, sums = sysm.external_loads(
        jnp.asarray(model.mesh.coords), jnp.zeros(nd), jnp.asarray(model.mesh.elnodes),
        lt, jnp.float64(0.0), follower=False,
    )
    np.testing.assert_allclose(np.asarray(sums), [500.0, 7.0, 0.0], atol=1e-9)


def test_scipy_solver_tier_matches_cg():
    import fcvm_tpu
    from fcvm_tpu.config import FcvmConfig, get_config, set_config
    from fcvm_tpu.models import meshgen
    import numpy as np

    mesh = meshgen.box_tet10(2, 2, 2, 10.0, 10.0, 10.0)
    bcs = fcvm_tpu.BoundaryConditions.from_node_sets(
        [(mesh.select_nodes(lambda x, y, z: x < 1e-9), (0.0, 0.0, 0.0))]
    )
    faces = mesh.faces_on(lambda x, y, z: x > 10.0 - 1e-9)
    loads = fcvm_tpu.Loads(
        traction_faces=faces, tractions=np.tile([50.0, 10.0, 0], (len(faces), 1))
    )
    model = fcvm_tpu.Model(mesh, fcvm_tpu.Material(210000.0, 0.3), bcs, loads)
    # intercept a common target so both solver tiers end at the same LF
    # (adaptive step sizes legitimately differ with solver accuracy)
    params = fcvm_tpu.ControlParams(sig_yield=100.0, nstep=4, error_max=1e-9,
                                    et_e=0.1, target_lf=0.5)
    old = get_config()
    try:
        set_config(FcvmConfig(solver="cg", cg_rtol=1e-12))
        res_cg = fcvm_tpu.solve_collapse(model, params)
        set_config(FcvmConfig(solver="scipy"))
        res_lu = fcvm_tpu.solve_collapse(model, params)
    finally:
        set_config(old)
    assert abs(res_lu.history.lbd[-1] - 0.5) < 1e-12
    assert abs(res_cg.history.lbd[-1] - 0.5) < 1e-12
    np.testing.assert_allclose(
        res_lu.disp_total, res_cg.disp_total, rtol=1e-4, atol=1e-10
    )
    np.testing.assert_allclose(res_lu.peeq_gp, res_cg.peeq_gp, rtol=1e-3, atol=1e-12)


def test_material_regions(tmp_path):
    from fcvm_tpu.models.casefile import load_case
    import numpy as np

    p = tmp_path / "case.toml"
    p.write_text(
        """
[mesh.generator]
kind = "box"
nx = 2
lx = 10.0
[material]
e = 100000.0
nu = 0.0
[[material.region]]
where = "x > 5.0"
e = 200000.0
[[bc]]
where = "x < 1e-9"
ux = 0.0
"""
    )
    model, params = load_case(p)
    assert model.materials_by_element is not None
    centroids = model.mesh.coords[model.mesh.elnodes[:, :4]].mean(axis=1)
    left = centroids[:, 0] < 5.0
    np.testing.assert_allclose(model.materials_by_element[left, 0], 100000.0)
    np.testing.assert_allclose(model.materials_by_element[~left, 0], 200000.0)


def test_fcvm_dtype_env_selects_f64_tier():
    """FCVM_DTYPE=float64 must enable x64 and run the solve in f64
    (the corpus-parity precision tier)."""
    import os
    import subprocess
    import sys

    env = dict(os.environ)
    env["FCVM_DTYPE"] = "float64"
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PYTHONPATH", None)
    code = (
        "import jax; jax.config.update('jax_platforms', 'cpu');\n"
        "from fcvm_tpu.config import get_config\n"
        "assert jax.config.jax_enable_x64, 'x64 not enabled'\n"
        "assert str(get_config().resolve_dtype()) == 'float64'\n"
        "import numpy as np, fcvm_tpu\n"
        "from fcvm_tpu.models import meshgen\n"
        "mesh = meshgen.box_tet10(2, 2, 2, 10., 10., 10.)\n"
        "bcs = fcvm_tpu.BoundaryConditions.from_node_sets(\n"
        "    [(mesh.select_nodes(lambda x, y, z: x < 1e-9), (0., 0., 0.))])\n"
        "faces = mesh.faces_on(lambda x, y, z: x > 10. - 1e-9)\n"
        "loads = fcvm_tpu.Loads(traction_faces=faces,\n"
        "    tractions=np.tile([100., 0, 0], (len(faces), 1)))\n"
        "m = fcvm_tpu.Model(mesh, fcvm_tpu.Material(210000., .3), bcs, loads)\n"
        "p = fcvm_tpu.ControlParams(sig_yield=240., nstep=2, error_max=1e-12)\n"
        "r = fcvm_tpu.solve_collapse(m, p)\n"
        "assert r.sig_gp.dtype == np.float64, r.sig_gp.dtype\n"
        "print('F64-TIER-OK')\n"
    )
    proc = subprocess.run(
        [sys.executable, "-c", code], env=env, capture_output=True,
        text=True, timeout=600,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "F64-TIER-OK" in proc.stdout


def test_cruciform_example_case_loads():
    """The bundled cruciform example builds its voxel mesh exactly:
    volume = A * L with A = 2 w t - t^2 (w = 2 b + t)."""
    model, params = load_case("examples/cruciform_torsional_buckling.toml")
    b, t, lc = 40.0, 4.0, 200.0
    w = 2 * b + t
    v = model.mesh.coords[model.mesh.elnodes[:, :4]]
    det = np.linalg.det(v[:, 1:4] - v[:, :1])
    vol = float(np.abs(det).sum() / 6.0)
    np.testing.assert_allclose(vol, (2 * w * t - t * t) * lc, rtol=1e-12)
    assert params.gnl == "GNLY" and params.nstep == 1


def test_cli_checkpoint_then_resume(tmp_path):
    """--checkpoint writes per-step state; --resume continues from it and
    lands on the same final state as the original run."""
    from fcvm_tpu.__main__ import main

    p = tmp_path / "case.toml"
    p.write_text(CASE)
    out1 = tmp_path / "out1"
    assert main(["run", str(p), "--outdir", str(out1), "--checkpoint"]) == 0
    ckdir = out1 / "checkpoints"
    assert ckdir.exists() and any(ckdir.iterdir())

    out2 = tmp_path / "out2"
    assert main([
        "run", str(p), "--outdir", str(out2), "--resume", str(ckdir),
    ]) == 0
    t1 = (out1 / "cli_box.out").read_text().splitlines()
    t2 = (out2 / "cli_box.out").read_text().splitlines()
    # the resumed run reproduces the original history table rows
    rows1 = [ln for ln in t1 if ln.strip() and ln.lstrip()[0].isdigit()]
    rows2 = [ln for ln in t2 if ln.strip() and ln.lstrip()[0].isdigit()]
    assert rows1 and rows1[-1] == rows2[-1]


def test_cli_posthoc_sum_matches_inrun(tmp_path):
    """`fcvm_tpu sum` recomputes the .avr from a finished run's .vtk
    (the reference Sum-button workflow on stored results) and must
    reproduce the in-run report."""
    from fcvm_tpu.__main__ import main

    p = tmp_path / "case.toml"
    p.write_text(
        CASE
        + """
[[sum.face]]
name = "loaded_face"
where = "x > 10.0 - 1e-9"

[[sum.edge]]
name = "bottom_edge"
where = "(y < 1e-9) & (z < 1e-9)"
"""
    )
    outdir = tmp_path / "out"
    assert main(["run", str(p), "--outdir", str(outdir)]) == 0
    inrun = (outdir / "cli_box.avr").read_text()
    (outdir / "cli_box.avr").unlink()
    assert main(["sum", str(p), "--outdir", str(outdir)]) == 0
    posthoc = (outdir / "cli_box.avr").read_text()
    assert posthoc == inrun
