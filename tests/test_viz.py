"""Headless result-viewer bundle (the reference's pyvista panes, batch form)."""

from pathlib import Path

import numpy as np

import fcvm_tpu
from fcvm_tpu.models import meshgen
from fcvm_tpu.models.inp import ControlParams


def _result(tmp_path):
    mesh = meshgen.box_tet10(2, 2, 2, 10.0, 10.0, 10.0)
    bcs = fcvm_tpu.BoundaryConditions.from_node_sets(
        [(mesh.select_nodes(lambda x, y, z: x < 1e-9), (0.0, 0.0, 0.0))]
    )
    faces = mesh.faces_on(lambda x, y, z: x > 10.0 - 1e-9)
    loads = fcvm_tpu.Loads(
        traction_faces=faces, tractions=np.tile([0, 0, -20.0], (len(faces), 1))
    )
    model = fcvm_tpu.Model(
        mesh, fcvm_tpu.Material(210000.0, 0.3), bcs, loads, name="viz"
    )
    params = ControlParams(
        sig_yield=100.0, nstep=3, error_max=1e-9, et_e=0.1, target_lf=99.0
    )
    return model, fcvm_tpu.solve_collapse(model, params), params


def test_result_view_bundle(tmp_path):
    model, res, params = _result(tmp_path)
    from fcvm_tpu.runtime.viz import save_orbit_gif, save_result_views

    save_result_views(tmp_path, "viz", model, res, params)
    views = tmp_path / "viz_views.png"
    psv = tmp_path / "viz_psv.png"
    assert views.exists() and views.stat().st_size > 10_000
    assert psv.exists() and psv.stat().st_size > 10_000


def test_clip_surface_is_closed_half():
    """The clip surface keeps the outer skin of the kept half plus the cut
    face: face count grows vs the kept elements' boundary alone, and every
    kept element centroid is behind the plane."""
    from fcvm_tpu.runtime.viz import _clip_surface

    mesh = meshgen.box_tet10(3, 3, 3, 1.0, 1.0, 1.0)
    faces = _clip_surface(
        mesh.coords, mesh.elnodes, np.array([1.0, 0, 0]), 0.5
    )
    assert len(faces) > 0
    # all face nodes on the kept side (corner nodes of kept elements)
    assert mesh.coords[np.unique(faces), 0].max() <= 1.0


def test_run_analysis_writes_view_bundle(tmp_path):
    model, res, params = _result(tmp_path)
    fcvm_tpu.run_analysis(model, params, outdir=str(tmp_path))
    assert (tmp_path / "viz_views.png").exists()
    assert (tmp_path / "viz_psv.png").exists()


def test_orbit_gif(tmp_path):
    """The orbital-path GIF writer (reference fcVM.py:1800-1830 analogue)."""
    from fcvm_tpu.runtime.viz import save_orbit_gif

    mesh = meshgen.box_tet10(2, 2, 2, 1.0, 1.0, 1.0)
    field = np.linspace(0.0, 1.0, mesh.n_nodes)
    out = tmp_path / "orbit.gif"
    save_orbit_gif(out, mesh.coords, mesh.elnodes, field, frames=4)
    assert out.exists() and out.stat().st_size > 5_000


def test_view_bundle_warps_by_disp_scale(tmp_path, monkeypatch):
    """save_result_views draws on coords + ds * disp_total (the reference's
    fcVM.py:1948 viewer warp), taking ds from res.disp_scale by default."""
    import fcvm_tpu.runtime.viz as viz

    model, res, params = _result(tmp_path)
    res.disp_scale = 40.0
    seen = {}

    def spy(path, coords, elnodes, fields, **kw):
        seen["coords"] = np.asarray(coords).copy()

    monkeypatch.setattr(viz, "save_clip_views", spy)
    monkeypatch.setattr(viz, "save_psv_glyphs", lambda *a, **k: None)
    viz.save_result_views(tmp_path, "viz", model, res, params)
    want = np.asarray(res.coords) + 40.0 * np.asarray(
        res.disp_total
    ).reshape(-1, 3)
    np.testing.assert_allclose(seen["coords"], want)
    # and an explicit disp_scale overrides the recorded one
    viz.save_result_views(tmp_path, "viz", model, res, params, disp_scale=0.0)
    np.testing.assert_allclose(seen["coords"], np.asarray(res.coords))
