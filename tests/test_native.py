"""Native C++ runtime components (SURVEY.md N2 host-side equivalents)."""

import numpy as np
import pytest

from femo_tpu import native


def test_native_lib_builds():
    lib = native.get_lib()
    assert lib is not None, "g++ build of libfemo_native.so failed"


def test_rcb_partition_balanced():
    rng = np.random.default_rng(0)
    pts = rng.uniform(size=(1000, 2))
    part = native.rcb_partition(pts, 8)
    counts = np.bincount(part, minlength=8)
    assert counts.min() >= 120 and counts.max() <= 130
    # spatial coherence: parts have smaller bounding boxes than the domain
    for p in range(8):
        sel = pts[part == p]
        assert (sel.max(0) - sel.min(0)).prod() < 0.5


def test_rcm_reduces_bandwidth():
    from femo_tpu.fea import FunctionSpace, create_unit_square_mesh

    mesh = create_unit_square_mesh(10)
    V = FunctionSpace(mesh, ("CG", 1))
    # dof adjacency graph from the dofmap
    import scipy.sparse as sp

    nd = V.dofmap.shape[1]
    rows = np.repeat(V.dofmap, nd, axis=1).reshape(-1)
    cols = np.tile(V.dofmap, (1, nd)).reshape(-1)
    A = sp.coo_matrix(
        (np.ones(len(rows)), (rows, cols)),
        shape=(V.n_dofs, V.n_dofs)).tocsr()
    # scramble, then RCM
    rng = np.random.default_rng(1)
    p = rng.permutation(V.n_dofs)
    As = A[p][:, p].tocsr()

    def bandwidth(M):
        coo = M.tocoo()
        return int(np.abs(coo.row - coo.col).max())

    perm = native.rcm_order(As.indptr.astype(np.int64),
                            As.indices.astype(np.int32))
    Ar = As[perm][:, perm]
    assert bandwidth(Ar) < bandwidth(As) / 2


def test_greedy_color_valid():
    from femo_tpu.fea import FunctionSpace, create_unit_square_mesh

    mesh = create_unit_square_mesh(6)
    V = FunctionSpace(mesh, ("CG", 1))
    colors, k = native.greedy_color(V.dofmap, V.n_dofs)
    assert k <= 16
    # no two cells sharing a dof share a color
    dof_owner = {}
    for c, dofs in enumerate(V.dofmap):
        for d in dofs:
            for c2 in dof_owner.get(d, []):
                assert colors[c2] != colors[c]
            dof_owner.setdefault(d, []).append(c)


def test_unique_facets_matches_numpy():
    rng = np.random.default_rng(2)
    keys = np.sort(rng.integers(0, 50, size=(300, 2)), axis=1).astype(
        np.int32)
    ids, nu = native.unique_facets(keys)
    _, ref = np.unique(keys, axis=0, return_inverse=True)
    # same grouping (ids may be a permutation of ref labels)
    remap = {}
    for a, b in zip(ids.tolist(), ref.tolist()):
        assert remap.setdefault(a, b) == b
    assert nu == ref.max() + 1


def test_bt_dest_map_matches_numpy():
    """Native fused dest pass == the vectorized-numpy oracle (BC masking,
    off-tridiagonal dump, D/L/U placement)."""
    import numpy as np
    from femo_tpu import native

    rng = np.random.default_rng(7)
    n, B = 40, 8
    nb = (n + B - 1) // B
    ne, nr, nc = 30, 3, 4
    rows = rng.integers(0, n, (ne, nr))
    cols = rng.integers(0, n, (ne, nc))
    perm = rng.permutation(n)
    iperm = np.zeros(n, np.int64)
    iperm[perm] = np.arange(n)
    free = rng.random(n) > 0.2
    dump = 3 * nb * B * B
    d_nat = native.bt_dest_map(rows, cols, iperm, free, B, nb, dump)
    if d_nat is None:
        import pytest
        pytest.skip("native lib unavailable")

    gr = np.broadcast_to(rows[:, :, None], (ne, nr, nc)).reshape(-1)
    gc = np.broadcast_to(cols[:, None, :], (ne, nr, nc)).reshape(-1)
    pr, pc = iperm[gr], iperm[gc]
    bi, li = pr // B, pr % B
    bj, lj = pc // B, pc % B
    which = np.full(len(gr), -1, np.int64)
    which[bi == bj] = 0
    which[bi == bj + 1] = 1
    which[bi + 1 == bj] = 2
    ref = ((which * nb + bi) * B + li) * B + lj
    bad = (which < 0) | ~free[gr] | ~free[gc]
    ref[bad] = dump
    np.testing.assert_array_equal(d_nat, ref)


def test_csr_pattern_matches_scipy():
    """native.csr_pattern == scipy coo->csr dedup pattern (incl. empty)."""
    import scipy.sparse as sp

    rng = np.random.default_rng(11)
    n, ne = 60, 2000
    gr = rng.integers(0, n, ne).astype(np.int32)
    gc = rng.integers(0, n, ne).astype(np.int32)
    pat = native.csr_pattern(gr, gc, n)
    if pat is None:
        import pytest
        pytest.skip("native lib unavailable")
    indptr, indices = pat
    A = sp.coo_matrix((np.ones(ne, np.int8), (gr, gc)), shape=(n, n)).tocsr()
    A.sum_duplicates()
    A.sort_indices()
    np.testing.assert_array_equal(indptr, A.indptr.astype(np.int64))
    np.testing.assert_array_equal(indices, A.indices.astype(np.int32))

    indptr, indices = native.csr_pattern(
        np.empty(0, np.int32), np.empty(0, np.int32), 5)
    assert indptr.tolist() == [0] * 6 and len(indices) == 0


def test_csr_pattern_from_blocks_and_bandwidth():
    """Blockwise pattern build == scipy; native bandwidth == numpy."""
    import scipy.sparse as sp

    rng = np.random.default_rng(13)
    n = 80
    blocks, gr_all, gc_all = [], [], []
    for ne, nr, nc in [(300, 3, 3), (200, 3, 6), (150, 6, 3)]:
        r = rng.integers(0, n, (ne, nr)).astype(np.int32)
        c = rng.integers(0, n, (ne, nc)).astype(np.int32)
        blocks.append((r, c))
        gr_all.append(np.broadcast_to(r[:, :, None], (ne, nr, nc)).reshape(-1))
        gc_all.append(np.broadcast_to(c[:, None, :], (ne, nr, nc)).reshape(-1))
    pat = native.csr_pattern_from_blocks(blocks, n)
    if pat is None:
        import pytest
        pytest.skip("native lib unavailable")
    indptr, indices = pat
    gr, gc = np.concatenate(gr_all), np.concatenate(gc_all)
    A = sp.coo_matrix((np.ones(len(gr), np.int8), (gr, gc)),
                      shape=(n, n)).tocsr()
    A.sum_duplicates()
    A.sort_indices()
    np.testing.assert_array_equal(indptr, A.indptr.astype(np.int64))
    np.testing.assert_array_equal(indices, A.indices.astype(np.int32))

    iperm = rng.permutation(n).astype(np.int64)
    bw = native.csr_bandwidth(indptr, indices, iperm)
    rowids = np.repeat(np.arange(n), np.diff(indptr))
    assert bw == int(np.abs(iperm[rowids] - iperm[indices]).max())
