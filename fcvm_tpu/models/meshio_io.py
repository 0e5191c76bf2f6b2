"""Tet10 mesh file IO: Gmsh ASCII (.msh v2.2/v4.1) and UNV (2411/2412).

Replaces the reference's FreeCAD/SMESH mesh extraction
(``source code/fcVM.py:136-164``) with file-based ingest.  Readers prefer the
native C++ parser (:mod:`fcvm_tpu.native`) and fall back to pure Python.
Node-order conventions are normalized to the fcvm tet10 order at read time,
the same role as the reference's SMESH->CalculiX swap (``fcVM.py:337-341``).
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from fcvm_tpu.models.spec import Mesh
from fcvm_tpu import native

# Gmsh tet10 midside order (0-1),(1-2),(0-2),(0-3),(2-3),(1-3) -> fcvm order
GMSH_TO_FCVM = [0, 1, 2, 3, 4, 5, 6, 7, 9, 8]
# UNV FE 118: c1, m12, c2, m23, c3, m31, m14, m24, m34, c4
UNV_TO_FCVM = [0, 2, 4, 9, 1, 3, 5, 6, 7, 8]  # fcvm slot receiving unv slot i


def read_mesh(path) -> Mesh:
    path = Path(path)
    if path.suffix == ".msh":
        return read_gmsh(path)
    if path.suffix == ".unv":
        return read_unv(path)
    raise ValueError(f"unsupported mesh format: {path.suffix}")


def read_gmsh(path) -> Mesh:
    out = native.read_gmsh_native(str(path))
    if out is not None:
        return Mesh(out[0], out[1])
    return _read_gmsh_py(path)


def read_unv(path) -> Mesh:
    out = native.read_unv_native(str(path))
    if out is not None:
        return Mesh(out[0], out[1])
    return _read_unv_py(path)


# ---------------------------------------------------------------------------
# Pure-python fallbacks
# ---------------------------------------------------------------------------


def _read_gmsh_py(path) -> Mesh:
    lines = Path(path).read_text().splitlines()
    i = 0
    version = 2.2
    tags, xyz, elems = [], [], []
    while i < len(lines):
        ln = lines[i]
        if ln.startswith("$MeshFormat"):
            version = float(lines[i + 1].split()[0])
            i += 2
        elif ln.startswith("$Nodes"):
            if version < 4.0:
                n = int(lines[i + 1])
                for k in range(n):
                    parts = lines[i + 2 + k].split()
                    tags.append(int(parts[0]))
                    xyz.append([float(v) for v in parts[1:4]])
                i += 2 + n
            else:
                nblocks = int(lines[i + 1].split()[0])
                j = i + 2
                for _ in range(nblocks):
                    nb = int(lines[j].split()[3])
                    btags = [int(lines[j + 1 + k]) for k in range(nb)]
                    for k in range(nb):
                        parts = lines[j + 1 + nb + k].split()
                        tags.append(btags[k])
                        xyz.append([float(v) for v in parts[:3]])
                    j += 1 + 2 * nb
                i = j
        elif ln.startswith("$Elements"):
            tag2idx = {t: k for k, t in enumerate(tags)}
            if version < 4.0:
                n = int(lines[i + 1])
                for k in range(n):
                    parts = lines[i + 2 + k].split()
                    etype = int(parts[1])
                    if etype == 11:
                        ntags = int(parts[2])
                        nd = [tag2idx[int(v)] for v in parts[3 + ntags : 13 + ntags]]
                        row = [0] * 10
                        for s, v in enumerate(nd):
                            row[GMSH_TO_FCVM[s]] = v
                        elems.append(row)
                i += 2 + n
            else:
                nblocks = int(lines[i + 1].split()[0])
                j = i + 2
                for _ in range(nblocks):
                    hdr = lines[j].split()
                    etype, nb = int(hdr[2]), int(hdr[3])
                    for k in range(nb):
                        if etype == 11:
                            parts = lines[j + 1 + k].split()
                            nd = [tag2idx[int(v)] for v in parts[1:11]]
                            row = [0] * 10
                            for s, v in enumerate(nd):
                                row[GMSH_TO_FCVM[s]] = v
                            elems.append(row)
                    j += 1 + nb
                i = j
        else:
            i += 1
    return Mesh(np.asarray(xyz), np.asarray(elems))


def _read_unv_py(path) -> Mesh:
    lines = Path(path).read_text().splitlines()
    i = 0
    tags, xyz, elems = [], [], []
    while i < len(lines):
        if lines[i].strip() == "-1" and i + 1 < len(lines):
            ds = lines[i + 1].strip()
            i += 2
            if ds == "2411":
                while i < len(lines) and lines[i].strip() != "-1":
                    tags.append(int(lines[i].split()[0]))
                    xyz.append(
                        [float(v.replace("D", "E").replace("d", "e")) for v in lines[i + 1].split()[:3]]
                    )
                    i += 2
                i += 1  # consume the dataset end marker
            elif ds == "2412":
                tag2idx = {t: k for k, t in enumerate(tags)}
                while i < len(lines) and lines[i].strip() != "-1":
                    hdr = lines[i].split()
                    fe, nnodes = int(hdr[1]), int(hdr[5])
                    i += 1
                    nd = []
                    while len(nd) < nnodes:
                        nd.extend(int(v) for v in lines[i].split())
                        i += 1
                    if fe == 118 and nnodes == 10:
                        row = [0] * 10
                        for s, v in enumerate(nd):
                            row[UNV_TO_FCVM[s]] = tag2idx[v]
                        elems.append(row)
                i += 1  # consume the dataset end marker
            else:
                while i < len(lines) and lines[i].strip() != "-1":
                    i += 1
                i += 1
        else:
            i += 1
    return Mesh(np.asarray(xyz), np.asarray(elems))


# ---------------------------------------------------------------------------
# Writers (for interchange and roundtrip tests)
# ---------------------------------------------------------------------------


def write_gmsh(path, mesh: Mesh) -> None:
    """Gmsh ASCII v2.2 with tet10 elements (type 11)."""
    inv = np.argsort(np.asarray(GMSH_TO_FCVM))  # fcvm slot -> gmsh slot
    fcvm_to_gmsh = np.empty(10, dtype=int)
    for g, f in enumerate(GMSH_TO_FCVM):
        fcvm_to_gmsh[f] = g
    lines = ["$MeshFormat", "2.2 0 8", "$EndMeshFormat", "$Nodes", str(mesh.n_nodes)]
    for i, (x, y, z) in enumerate(mesh.coords):
        lines.append(f"{i + 1} {x:.16g} {y:.16g} {z:.16g}")
    lines += ["$EndNodes", "$Elements", str(mesh.n_elements)]
    for e, row in enumerate(mesh.elnodes):
        gmsh_row = np.empty(10, dtype=int)
        for f in range(10):
            gmsh_row[fcvm_to_gmsh[f]] = row[f] + 1
        lines.append(f"{e + 1} 11 2 0 1 " + " ".join(str(v) for v in gmsh_row))
    lines.append("$EndElements")
    Path(path).write_text("\n".join(lines) + "\n")


def write_unv(path, mesh: Mesh) -> None:
    """UNV datasets 2411/2412 with FE descriptor 118."""
    lines = ["    -1", "  2411"]
    for i, (x, y, z) in enumerate(mesh.coords):
        lines.append(f"{i + 1:10d}{1:10d}{1:10d}{11:10d}")
        lines.append(f"{x:25.16E}{y:25.16E}{z:25.16E}")
    lines += ["    -1", "    -1", "  2412"]
    for e, row in enumerate(mesh.elnodes):
        unv_row = np.empty(10, dtype=int)
        for u, f in enumerate(UNV_TO_FCVM):
            unv_row[u] = row[f] + 1
        lines.append(f"{e + 1:10d}{118:10d}{2:10d}{1:10d}{7:10d}{10:10d}")
        lines.append("".join(f"{v:10d}" for v in unv_row[:8]))
        lines.append("".join(f"{v:10d}" for v in unv_row[8:]))
    lines += ["    -1"]
    Path(path).write_text("\n".join(lines) + "\n")
