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


MSH22_QUAD = """$MeshFormat
2.2 0 8
$EndMeshFormat
$Nodes
6
1 0 0 0
2 1 0 0
3 2 0 0
4 0 1 0
5 1 1 0
6 2 1 0
$EndNodes
$Elements
2
1 3 2 1 1 1 2 5 4
2 3 2 1 1 2 3 6 5
$EndElements
"""


def test_msh_quad_cyclic_to_tensor(tmp_path):
    """gmsh lists quad corners cyclically; import must permute to the
    framework's tensor order or the bilinear map is a bowtie (negative
    detJ) — checked via exact areas/volumes."""
    from femo_tpu.fea import (FunctionSpace, Function, FormDef, dx,
                              assemble_scalar)

    p = tmp_path / "quads.msh"
    p.write_text(MSH22_QUAD)
    mesh = import_mesh(str(p))
    assert mesh.cell_type == "quad"
    np.testing.assert_allclose(mesh.cell_volumes(), 1.0, rtol=1e-12)
    V = FunctionSpace(mesh, ("CG", 1))
    one = Function(V, "one")
    one.set(1.0)
    area = float(assemble_scalar(
        FormDef([dx(lambda w, g: w.one * 1.0)], coeffs=[one])))
    np.testing.assert_allclose(area, 2.0, rtol=1e-12)


@pytest.mark.parametrize("cell_type", ["triangle", "quad", "tet", "hex"])
def test_xdmf_mesh_roundtrip(tmp_path, cell_type):
    """read_xdmf_mesh inverts XDMFWriter for every cell type (N9 parity:
    reference import_mesh reads XDMF, utils_dolfinx.py:69-123)."""
    from femo_tpu.io.xdmf import XDMFWriter
    from femo_tpu.mesh.gmsh_io import read_xdmf_mesh
    from femo_tpu.mesh.generators import (create_unit_square_mesh,
                                          create_unit_cube_mesh)

    if cell_type in ("triangle", "quad"):
        mesh = create_unit_square_mesh(3, cell_type=cell_type)
    else:
        mesh = create_unit_cube_mesh(2, cell_type=cell_type)
    fn = str(tmp_path / f"m_{cell_type}.xdmf")
    XDMFWriter(fn, mesh).close()
    m2 = read_xdmf_mesh(fn)
    assert m2.cell_type == mesh.cell_type
    np.testing.assert_allclose(m2.coords, mesh.coords)
    np.testing.assert_array_equal(m2.cells, mesh.cells)
    np.testing.assert_allclose(m2.cell_volumes().sum(),
                               mesh.cell_volumes().sum(), rtol=1e-12)


def test_xdmf_meshtags_inline(tmp_path):
    """Separate-grid meshtags (dolfinx write_meshtags layout) with inline
    XML data: subdomain cell tags + boundary facet tags."""
    from femo_tpu.mesh.gmsh_io import read_xdmf_mesh

    xml = """<?xml version="1.0"?>
<Xdmf Version="3.0">
  <Domain>
    <Grid Name="mesh" GridType="Uniform">
      <Topology TopologyType="Triangle" NumberOfElements="2">
        <DataItem Dimensions="2 3" Format="XML" NumberType="Int">
          0 1 2  0 2 3
        </DataItem>
      </Topology>
      <Geometry GeometryType="XY">
        <DataItem Dimensions="4 2" Format="XML">
          0 0  1 0  1 1  0 1
        </DataItem>
      </Geometry>
    </Grid>
    <Grid Name="subdomains" GridType="Uniform">
      <Topology TopologyType="Triangle" NumberOfElements="2">
        <DataItem Dimensions="2 3" Format="XML" NumberType="Int">
          0 1 2  0 2 3
        </DataItem>
      </Topology>
      <Attribute Name="subdomains" Center="Cell">
        <DataItem Dimensions="2" Format="XML" NumberType="Int">7 9</DataItem>
      </Attribute>
    </Grid>
    <Grid Name="boundaries" GridType="Uniform">
      <Topology TopologyType="Polyline" NumberOfElements="2">
        <DataItem Dimensions="2 2" Format="XML" NumberType="Int">
          0 1  2 3
        </DataItem>
      </Topology>
      <Attribute Name="boundaries" Center="Cell">
        <DataItem Dimensions="2" Format="XML" NumberType="Int">5 6</DataItem>
      </Attribute>
    </Grid>
  </Domain>
</Xdmf>
"""
    fn = tmp_path / "tagged.xdmf"
    fn.write_text(xml)
    mesh = read_xdmf_mesh(str(fn))
    assert mesh.cell_type == "triangle" and mesh.n_cells == 2
    np.testing.assert_array_equal(mesh.cell_tags, [7, 9])
    # facet (0,1) tagged 5; facet (2,3) tagged 6
    tag_of = {tuple(fv): int(t)
              for fv, t in zip(mesh.facets.tolist(), mesh.facet_tags)}
    assert tag_of[(0, 1)] == 5 and tag_of[(2, 3)] == 6


def test_association_table(tmp_path):
    from femo_tpu.mesh.gmsh_io import read_association_table

    ini = tmp_path / "mesh.ini"
    ini.write_text("[subdomains]\nstator = 1\nrotor = 2\n"
                   "[boundaries]\nouter = 1000\n")
    t = read_association_table(str(ini))
    assert t == {"stator": 1, "rotor": 2, "outer": 1000}


def test_import_mesh_dispatches_xdmf(tmp_path):
    """import_mesh reads .xdmf directly (reference import_mesh consumes
    XDMF, utils_dolfinx.py:69-123)."""
    from femo_tpu.io.xdmf import XDMFWriter
    from femo_tpu.mesh.generators import create_unit_square_mesh

    mesh = create_unit_square_mesh(3)
    fn = str(tmp_path / "m.xdmf")
    XDMFWriter(fn, mesh).close()
    m2 = import_mesh(fn)
    assert m2.cell_type == "triangle" and m2.n_cells == mesh.n_cells
