"""gmsh import (import_mesh parity, SURVEY.md C2 import_mesh / N9)."""

import numpy as np
import pytest

from femo_tpu.mesh.gmsh_io import import_mesh

MSH22 = """$MeshFormat
2.2 0 8
$EndMeshFormat
$PhysicalNames
3
1 10 "left"
1 11 "right"
2 1 "domain"
$EndPhysicalNames
$Nodes
4
1 0 0 0
2 1 0 0
3 1 1 0
4 0 1 0
$EndNodes
$Elements
4
1 2 2 1 1 1 2 3
2 2 2 1 1 1 3 4
3 1 2 10 5 1 4
4 1 2 11 6 2 3
$EndElements
"""


def test_msh22_roundtrip(tmp_path):
    p = tmp_path / "square.msh"
    p.write_text(MSH22)
    mesh = import_mesh(str(p))
    assert mesh.cell_type == "triangle"
    assert mesh.n_cells == 2
    assert mesh.n_nodes == 4
    np.testing.assert_array_equal(mesh.cell_tags, [1, 1])
    assert mesh.region_names[10] == "left"
    # facet tags: edge (0,3) -> 10, edge (1,2) -> 11
    tagged = {tuple(mesh.facets[i]): int(t)
              for i, t in enumerate(mesh.facet_tags) if t > 0}
    assert tagged == {(0, 3): 10, (1, 2): 11}
    # area check
    np.testing.assert_allclose(mesh.cell_volumes().sum(), 1.0)
