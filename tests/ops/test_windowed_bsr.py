"""Windowed BSR SpMV (ops/windowed_bsr.py): plan correctness + kernel parity."""

import numpy as np
import pytest

import jax.numpy as jnp

from fenics_constitutive_tpu.fem import unit_cube_mesh
from fenics_constitutive_tpu.ops.windowed import reverse_cuthill_mckee
from fenics_constitutive_tpu.ops.windowed_bsr import build_windowed_bsr


def _random_block_matrix(seed=0, n=6, br=3, bc=3):
    """Elastic-pattern block matrix on a shuffled tet-mesh node graph."""
    import itertools

    import scipy.sparse as sp

    mesh = unit_cube_mesh(n, n, n, "tetra")
    rng = np.random.default_rng(seed)
    pi = rng.permutation(mesh.num_nodes)
    cells = pi[mesh.cells]
    M = mesh.num_nodes
    rows, cols = [], []
    for c in cells:
        for a, b in itertools.permutations(c, 2):
            rows.append(a)
            cols.append(b)
    rows += list(range(M))
    cols += list(range(M))
    G = sp.coo_matrix(
        (np.ones(len(rows)), (rows, cols)), shape=(M, M)
    ).tocsr()
    G.sum_duplicates()
    nnz = G.nnz
    blocks = rng.standard_normal((nnz, br, bc))
    A = sp.bsr_matrix(
        (blocks, G.indices, G.indptr), shape=(br * M, bc * M)
    ).tocsr()
    perm = reverse_cuthill_mckee(cells, M)
    return A, perm, M, rng


@pytest.mark.parametrize("tile_rows", [512, 128])
def test_bsr_matvec_matches_scipy(tile_rows):
    A, perm, M, rng = _random_block_matrix()
    w = build_windowed_bsr(A, 3, 3, perm, perm, tile_rows=tile_rows)
    x = rng.standard_normal(3 * M)
    inv = np.argsort(perm)
    x_int = np.zeros((3, w.NC_pad))
    x_int[:, :M] = x.reshape(M, 3).T[:, inv]
    y_int = np.asarray(w.matvec_ref(jnp.asarray(x_int.reshape(-1))))
    y2 = y_int.reshape(3, w.NR_pad)
    got = y2[:, perm].T.reshape(-1)
    np.testing.assert_allclose(got, A @ x, rtol=1e-12, atol=1e-12)
    # pads stay zero
    assert np.abs(y2[:, M:]).max() == 0.0


def test_bsr_rectangular_blocks():
    """P-like transfer: 3x6 blocks, different row/col node sets."""
    import scipy.sparse as sp

    rng = np.random.default_rng(3)
    n_fine, n_coarse = 500, 70
    agg = rng.integers(0, n_coarse, n_fine)
    agg[:n_coarse] = np.arange(n_coarse)  # every aggregate non-empty
    blocks = rng.standard_normal((n_fine, 3, 6))
    P = sp.bsr_matrix(
        (blocks, agg, np.arange(n_fine + 1)),
        shape=(3 * n_fine, 6 * n_coarse),
    ).tocsr()
    rp = rng.permutation(n_fine)
    cp = rng.permutation(n_coarse)
    w = build_windowed_bsr(P, 3, 6, rp, cp, tile_rows=128)
    x = rng.standard_normal(6 * n_coarse)
    x_int = np.zeros((6, w.NC_pad))
    x_int[:, :n_coarse] = x.reshape(n_coarse, 6).T[:, np.argsort(cp)]
    y_int = np.asarray(w.matvec_ref(jnp.asarray(x_int.reshape(-1))))
    got = y_int.reshape(3, w.NR_pad)[:, rp].T.reshape(-1)
    np.testing.assert_allclose(got, P @ x, rtol=1e-12, atol=1e-12)


def test_bsr_pallas_kernel_matches_reference():
    from fenics_constitutive_tpu.ops.pallas_window import windowed_bsr_matvec

    A, perm, M, rng = _random_block_matrix(n=5)
    w = build_windowed_bsr(A, 3, 3, perm, perm, tile_rows=128)
    x = jnp.asarray(
        rng.standard_normal(3 * w.NC_pad).astype(np.float32)
    )
    y_ref = np.asarray(w.matvec_ref(x))
    y_pl = np.asarray(windowed_bsr_matvec(w, x, interpret=True))
    np.testing.assert_allclose(
        y_pl, y_ref, rtol=3e-6, atol=3e-6 * max(np.abs(y_ref).max(), 1.0)
    )
