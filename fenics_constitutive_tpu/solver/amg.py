"""Smoothed-aggregation AMG preconditioner for unstructured meshes.

The reference delegates linear solves to PETSc, whose KSP/AMG runs on any
mesh (dolfinx NewtonSolver, reference _solver.py:30-159). Our geometric
multigrid (solver/multigrid.py) needs a box-structured grid; this module
closes the unstructured gap the TPU way:

- The hierarchy is built ONCE on host (numpy/scipy): assemble the constant-
  coefficient ELASTIC operator (same elastic-hierarchy rationale as
  multigrid.build_multigrid — true-tangent smoothing breaks CG under
  softening), aggregate nodes greedily on the mesh graph, smooth the
  tentative prolongation (classic smoothed aggregation, Vanek et al.), and
  form Galerkin triple products A_{l+1} = P^T A_l P in CSR.
- Each level is then frozen into fixed-width ELL arrays (row-padded
  values/columns), so the device-side V-cycle is nothing but static-shape
  gathers + multiplies + sums — jit/GSPMD-safe, no dynamic sparsity, no
  host round trips inside the solve.

Like the geometric V-cycle, the result is a linear, SPD-preserving callable
``M(r) -> z`` in NODE-MAJOR dof ordering, pluggable into
``make_packed_step(preconditioner=...)`` or used directly with
``solver.linear.cg_solve``.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np

from ..utils import to_device
import jax
import jax.numpy as jnp

from ..ops import mandel
from ..ops.mandel import Constraint

__all__ = ["build_amg", "AmgPreconditioner"]


# ---------------------------------------------------------------------------
# host-side construction
# ---------------------------------------------------------------------------


def _moduli_to_E_nu(mu: float, kappa: float) -> tuple[float, float]:
    E = 9.0 * kappa * mu / (3.0 * kappa + mu)
    nu = (3.0 * kappa - 2.0 * mu) / (2.0 * (3.0 * kappa + mu))
    return E, nu


def _assemble_elastic_csr(space, q_degree: int, C_el: np.ndarray):
    """CSR of the elastic operator K = sum_e B^T C B w|J| (host, chunked)."""
    import scipy.sparse as sp

    from ..fem.kinematics import precompute_geometry

    geo = precompute_geometry(space, q_degree)
    dN = np.asarray(geo.dN_dx, np.float64)  # [C, Q, n, g]
    w = np.asarray(geo.w_detJ, np.float64)  # [C, Q]
    M = np.asarray(
        mandel._mandel_matrix_map(space_constraint(space)), np.float64
    )  # [s, g, g]
    vs = space.value_size
    ncell, Q, n, _g = dN.shape
    nd = n * vs
    dofs = np.asarray(space.dofmap).reshape(ncell, nd)  # [C, n*vs]

    rows_all, cols_all, vals_all = [], [], []
    chunk = max(1, 20_000_000 // (Q * C_el.shape[0] * nd))
    for c0 in range(0, ncell, chunk):
        dNc = dN[c0 : c0 + chunk]
        wc = w[c0 : c0 + chunk]
        # B[c,q,s,(a j)] = M[s,i,j] dN[c,q,a,i]
        B = np.einsum("sij,cqai->cqsaj", M, dNc)
        B = B.reshape(B.shape[0], Q, C_el.shape[0], nd)
        K = np.einsum("cq,cqsa,st,cqtb->cab", wc, B, C_el, B, optimize=True)
        d = dofs[c0 : c0 + chunk]
        rows_all.append(np.repeat(d, nd, axis=1).ravel())
        cols_all.append(np.tile(d, (1, nd)).ravel())
        vals_all.append(K.ravel())
    A = sp.coo_matrix(
        (np.concatenate(vals_all), (np.concatenate(rows_all), np.concatenate(cols_all))),
        shape=(space.ndofs, space.ndofs),
    ).tocsr()
    A.sum_duplicates()
    return A


def space_constraint(space) -> Constraint:
    """The stress/strain constraint implied by the space's dimensions."""
    gdim = space.mesh.gdim
    vs = space.value_size
    if gdim == 3:
        return Constraint.FULL
    if gdim == 2:
        assert vs == 2, (
            f"AMG elastic surrogate needs a vector space (value_size == gdim"
            f" == 2); got value_size={vs} — 2D scalar spaces are unsupported"
        )
        return Constraint.PLANE_STRAIN  # elastic SPD surrogate; 2D precond
    assert vs == 1
    return Constraint.UNIAXIAL_STRESS


def _eliminate_dirichlet(A, free: np.ndarray):
    """D_f A D_f + I_c: constrained dofs become identity rows/cols."""
    import scipy.sparse as sp

    d = free.astype(np.float64)
    Df = sp.diags(d)
    return (Df @ A @ Df + sp.diags(1.0 - d)).tocsr()


def _node_adjacency(A, vs: int, theta: float = 0.0):
    """Node graph from the dof CSR's block sparsity (CSR [nn, nn] 0/1).

    ``theta > 0`` applies classic symmetric strength-of-connection dropping
    on the vs-by-vs node blocks: edge (i, j) survives iff
    ``|A_ij|_F >= theta * sqrt(|A_ii|_F |A_jj|_F)``. On anisotropic
    elements the weak-direction couplings fall below the threshold, so
    aggregation semi-coarsens along the strong direction (the same idea as
    PyAMG's symmetric strength measure)."""
    import scipy.sparse as sp

    n_dof = A.shape[0]
    nn = n_dof // vs
    coo = A.tocoo()
    keep = coo.data != 0.0
    r = coo.row[keep] // vs
    c = coo.col[keep] // vs
    if theta > 0.0:
        # block Frobenius norms squared: N_ij = sum over the block of a^2
        N = sp.coo_matrix(
            (coo.data[keep] ** 2, (r, c)), shape=(nn, nn)
        ).tocsr()
        N.sum_duplicates()
        d = np.sqrt(np.maximum(N.diagonal(), 0.0))
        Nc = N.tocoo()
        strong = Nc.data >= (theta**2) * d[Nc.row] * d[Nc.col]
        r, c = Nc.row[strong], Nc.col[strong]
    G = sp.coo_matrix((np.ones(len(r)), (r, c)), shape=(nn, nn)).tocsr()
    G.sum_duplicates()
    G.setdiag(0)
    G.eliminate_zeros()
    return G


def _aggregate_geometric(
    coords: np.ndarray, factor: float = 3.0, h_axes: np.ndarray | None = None
) -> np.ndarray:
    """Vectorized box aggregation: bucket nodes into boxes of ~factor*h.

    O(n log n) via np.unique — replaces the serial greedy graph walk at the
    fine level, where node counts are large (the graph version is kept for
    coarse levels and as the `aggregation="graph"` option). ``h_axes`` is
    the per-axis node spacing (e.g. the median per-axis cell extent); on
    stretched meshes the box then spans ~factor cells along the SMALL
    (strongly coupled) axis and a single cell along the large axes — the
    classic semi-coarsening shape — instead of lumping many thin cells
    into one physically-cubic aggregate. The box volume stays calibrated
    on the isotropic point-density estimate (which ``geometric_factor``
    was tuned against), so isotropic meshes are unchanged. Empty boxes
    vanish in the unique() compaction."""
    n, g = coords.shape
    lo = coords.min(axis=0)
    span = np.maximum(coords.max(axis=0) - lo, 1e-300)
    h_density = float((np.prod(span) / max(n, 1)) ** (1.0 / g))
    if h_axes is None:
        size = np.full(g, factor * h_density)
    else:
        h = np.maximum(np.asarray(h_axes, np.float64), 1e-300)
        # semi-coarsening on stretched elements: coupling is strong across
        # the SMALL spacing, so aggregate ~factor cells along that axis and
        # clip the box to one cell along the weakly coupled large axes. The
        # reference spacing is capped by the density estimate so isotropic
        # meshes reproduce the h_axes=None calibration exactly.
        size = np.maximum(h, factor * min(h.min(), h_density))
    keys = np.floor((coords - lo) / size).astype(np.int64)
    _, agg = np.unique(keys, axis=0, return_inverse=True)
    return agg.ravel()


def _aggregate(G) -> np.ndarray:
    """Greedy two-pass aggregation on a node graph. Returns agg id per node."""
    nn = G.shape[0]
    agg = np.full(nn, -1, np.int64)
    indptr, indices = G.indptr, G.indices
    n_agg = 0
    # pass 1: seed aggregates from nodes whose neighborhood is untouched
    for i in range(nn):
        if agg[i] != -1:
            continue
        nbrs = indices[indptr[i] : indptr[i + 1]]
        if (agg[nbrs] == -1).all():
            agg[i] = n_agg
            agg[nbrs] = n_agg
            n_agg += 1
    # pass 2: attach leftovers to the most-connected neighboring aggregate
    for i in range(nn):
        if agg[i] != -1:
            continue
        nbrs = indices[indptr[i] : indptr[i + 1]]
        owned = agg[nbrs]
        owned = owned[owned != -1]
        if len(owned):
            agg[i] = np.bincount(owned).argmax()
        else:  # isolated node: own aggregate
            agg[i] = n_agg
            n_agg += 1
    return agg


def _rigid_body_modes(coords: np.ndarray, vs: int) -> np.ndarray:
    """Near-nullspace of the elastic operator: translations + rotations.

    [nn*vs, nb] with nb = 6 (3D), 3 (2D), 1 (1D) — the standard SA
    nullspace for elasticity (what PETSc's GAMG takes via
    MatSetNearNullSpace)."""
    nn = coords.shape[0]
    x = coords - coords.mean(axis=0)
    if vs == 1:
        return np.ones((nn, 1))
    if vs == 2:
        B = np.zeros((nn, 2, 3))
        B[:, 0, 0] = 1.0
        B[:, 1, 1] = 1.0
        B[:, 0, 2] = -x[:, 1]
        B[:, 1, 2] = x[:, 0]
        return B.reshape(nn * 2, 3)
    B = np.zeros((nn, 3, 6))
    for j in range(3):
        B[:, j, j] = 1.0
    # rotations about z, x, y
    B[:, 0, 3] = -x[:, 1]
    B[:, 1, 3] = x[:, 0]
    B[:, 1, 4] = -x[:, 2]
    B[:, 2, 4] = x[:, 1]
    B[:, 0, 5] = x[:, 2]
    B[:, 2, 5] = -x[:, 0]
    return B.reshape(nn * 3, 6)


def _tentative_P(agg: np.ndarray, B: np.ndarray, bs: int):
    """Nullspace-preserving tentative prolongation via per-aggregate QR.

    ``B`` [nn*bs, nb] is the current level's near-nullspace (bs dofs per
    node). Returns (P [nn*bs, n_agg*nb], B_coarse [n_agg*nb, nb]) with
    P @ B_coarse = B restricted to each aggregate (exact nullspace
    interpolation — the property that makes SA convergence mesh-size
    independent)."""
    import scipy.sparse as sp

    nn = len(agg)
    nb = B.shape[1]
    n_agg = int(agg.max()) + 1
    order = np.argsort(agg, kind="stable")
    counts = np.bincount(agg, minlength=n_agg)
    maxm = int(counts.max())
    # padded member table [n_agg, maxm] of node ids (pad = -1)
    members = np.full((n_agg, maxm), -1, np.int64)
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    pos = np.arange(nn) - starts[agg[order]]
    members[agg[order], pos] = order
    valid = members >= 0  # [n_agg, maxm]

    Bn = B.reshape(nn, bs, nb)
    T = np.where(
        valid[:, :, None, None], Bn[np.clip(members, 0, None)], 0.0
    ).reshape(n_agg, maxm * bs, nb)
    Q, R = np.linalg.qr(T)  # batched reduced QR: Q [n_agg, maxm*bs, k<=nb]
    k = Q.shape[2]
    # drop numerically dead modes (all-constrained aggregates etc.)
    diag = np.abs(R[:, np.arange(k), np.arange(k)])
    dead = diag < 1e-12 * max(1.0, float(np.abs(R).max()))
    Qm = np.where(dead[:, None, :], 0.0, Q)
    Rm = np.where(dead[:, :, None], 0.0, R)
    if k < nb:  # tiny aggregates: pad coarse block to nb
        Qm = np.pad(Qm, ((0, 0), (0, 0), (0, nb - k)))
        Rm = np.pad(Rm, ((0, 0), (0, nb - k), (0, 0)))

    rows = (members[:, :, None] * bs + np.arange(bs)[None, None, :]).reshape(
        n_agg, maxm * bs
    )
    cols = (
        np.arange(n_agg)[:, None] * nb + np.arange(nb)[None, :]
    )  # [n_agg, nb]
    r_idx = np.broadcast_to(rows[:, :, None], Qm.shape)
    c_idx = np.broadcast_to(cols[:, None, :], Qm.shape)
    keep = np.broadcast_to(
        valid[:, :, None].repeat(bs, axis=1).reshape(n_agg, maxm * bs, 1),
        Qm.shape,
    ) & (Qm != 0.0)
    P = sp.coo_matrix(
        (Qm[keep], (r_idx[keep], c_idx[keep])),
        shape=(nn * bs, n_agg * nb),
    ).tocsr()
    return P, Rm.reshape(n_agg * nb, nb)


def _rho_DinvA(A, n_iter: int = 12) -> float:
    """Power-iteration estimate of rho(D^-1 A) (host)."""
    d = A.diagonal()
    d = np.where(d > 0, d, 1.0)
    rng = np.random.default_rng(0)
    x = rng.standard_normal(A.shape[0])
    lam = 1.0
    for _ in range(n_iter):
        x = (A @ x) / d
        nrm = np.linalg.norm(x)
        if nrm == 0:
            return 2.0
        lam = nrm
        x /= nrm
    return float(lam) * 1.05


def _to_ell(A, dtype):
    """CSR -> fixed-width ELL (vals [n, k], cols [n, k]); pads with 0@col 0."""
    A = A.tocsr()
    A.sum_duplicates()
    A.eliminate_zeros()
    n = A.shape[0]
    nnz_row = np.diff(A.indptr)
    k = max(1, int(nnz_row.max()))
    vals = np.zeros((n, k))
    cols = np.zeros((n, k), np.int32)
    rows = np.repeat(np.arange(n), nnz_row)
    pos = np.arange(len(A.data)) - A.indptr[rows]
    vals[rows, pos] = A.data
    cols[rows, pos] = A.indices
    return to_device(vals, dtype), jnp.asarray(cols)


def _ell_matvec(vals, cols, v):
    return (vals * v[cols]).sum(axis=1)


# ---------------------------------------------------------------------------
# device-side V-cycle
# ---------------------------------------------------------------------------


@dataclass(frozen=True, eq=False)
class AmgPreconditioner:
    """Callable z = M(r): one V(nu,nu) cycle of the elastic SA hierarchy.

    Levels hold ELL operators (A), transfers (P and R = P^T), inverse Jacobi
    diagonals, and a dense inverse at the coarsest level. Registered as a
    pytree (arrays = leaves), so it can be passed as a jit ARGUMENT instead
    of closed over: closure capture embeds the level arrays as HLO
    constants, which at production sizes bloats the executable (and
    overflows remote-compile request limits — measured: 140k dofs of ELL
    levels is ~90 MB of constants); as an argument the arrays stay
    device-resident and the program is size-independent.
    """

    A_ell: tuple  # per level (vals, cols)
    P_ell: tuple  # per level below fine (vals, cols): coarse -> fine
    R_ell: tuple  # per level below fine (vals, cols): fine -> coarse
    dinv: tuple  # per level inverse (damped) Jacobi diagonal
    coarse_inv: jnp.ndarray
    omega: float
    nu: int
    n_levels: int

    def _cycle(self, lvl: int, b):
        if lvl == self.n_levels - 1:
            return self.coarse_inv @ b
        Av, Ac = self.A_ell[lvl]
        di = self.dinv[lvl]
        # zero-start pre-smoothing: first sweep is x = omega D^-1 b
        x = self.omega * di * b
        for _ in range(self.nu - 1):
            x = x + self.omega * di * (b - _ell_matvec(Av, Ac, x))
        r = b - _ell_matvec(Av, Ac, x)
        Rv, Rc = self.R_ell[lvl]
        bc = _ell_matvec(Rv, Rc, r)
        xc = self._cycle(lvl + 1, bc)
        Pv, Pc = self.P_ell[lvl]
        x = x + _ell_matvec(Pv, Pc, xc)
        for _ in range(self.nu):
            x = x + self.omega * di * (b - _ell_matvec(Av, Ac, x))
        return x

    def __call__(self, r):
        dt = self.coarse_inv.dtype  # single-level problems have no A_ell
        return self._cycle(0, r.astype(dt)).astype(r.dtype)


jax.tree_util.register_dataclass(
    AmgPreconditioner,
    data_fields=["A_ell", "P_ell", "R_ell", "dinv", "coarse_inv"],
    meta_fields=["omega", "nu", "n_levels"],
)


def build_amg(
    space,
    mu: float,
    kappa: float,
    free_mask,
    *,
    q_degree: int = 2,
    omega: float = 0.6,
    nu: int = 2,
    max_coarse: int = 600,
    max_levels: int = 12,
    smooth_prolongation: bool = True,
    aggregation: str = "auto",
    geometric_factor: float = 2.6,
    strength_theta: float = 0.06,
    dtype=None,
    spmv: str = "ell",
    node_perm=None,
    select_passes: int = 1,
    tile_rows: int = 1024,
):
    """Build the smoothed-aggregation elastic hierarchy for ``space``.

    Args:
        space: displacement FunctionSpace on ANY mesh (tet/tri/hex/quad).
        mu/kappa: elastic moduli of the hierarchy operator (same convention
            as build_multigrid; estimate from the law's params).
        free_mask: bool [ndofs], False at Dirichlet dofs.
        smooth_prolongation: P = (I - 4/(3 rho) D^-1 A) P_tent (classic SA);
            False keeps plain (unsmoothed) aggregation.
        aggregation: fine-level aggregation strategy. "graph" = greedy
            two-pass walk on the stiffness graph (serial host loop, best
            aggregate quality); "geometric" = vectorized box bucketing of the
            node coordinates (O(n log n), no Python loop); "auto" switches to
            geometric above 8k nodes where the graph walk's host time
            dominates the build. Coarse levels (no coordinates) always use
            the graph walk — they are small.
        geometric_factor: box edge length in units of the per-axis cell
            extent for ``aggregation="geometric"``.
        strength_theta: strength-of-connection threshold for the graph
            aggregation (0 keeps every coupling). On anisotropic (stretched)
            elements weak-direction block couplings fall below the
            threshold, aggregates follow the strong direction
            (semi-coarsening), and the cycle stays strongly contracting
            where plain aggregation degrades (measured on a 25:1 tet slab,
            10 V-cycles: residual reduction 3e-8 vs 0.27 at theta=0;
            tests/solver/test_amg.py::test_amg_anisotropic_slab_semi_coarsening).
            The 0.06 default is a no-op on isotropic meshes, where all
            block couplings are comparable.
    """
    import scipy.sparse as sp

    dtype = dtype or jnp.zeros(0).dtype
    vs = space.value_size
    E, nu_p = _moduli_to_E_nu(float(mu), float(kappa))
    C_el = mandel.get_elastic_tangent(E, nu_p, space_constraint(space))
    A0 = _assemble_elastic_csr(space, q_degree, np.asarray(C_el, np.float64))
    free = np.asarray(free_mask, bool)
    A0 = _eliminate_dirichlet(A0, free)

    # near-nullspace: rigid body modes, zeroed at constrained dofs so coarse
    # corrections never touch Dirichlet rows
    B = _rigid_body_modes(np.asarray(space.dof_coords), vs)
    B = B * free.astype(np.float64)[:, None]

    if aggregation not in ("auto", "graph", "geometric"):
        msg = f"aggregation must be 'auto'|'graph'|'geometric', got {aggregation!r}"
        raise ValueError(msg)
    coords0 = np.asarray(space.dof_coords, np.float64)
    use_geometric = aggregation == "geometric" or (
        aggregation == "auto" and coords0.shape[0] > 8000
    )

    A_levels = [A0]
    P_levels: list = []
    agg_levels: list = []
    bs_levels = [vs]
    bs = vs  # dofs per "node" at the current level (nb on coarse levels)
    while A_levels[-1].shape[0] > max_coarse and len(A_levels) < max_levels:
        A = A_levels[-1]
        if use_geometric and len(A_levels) == 1:
            cells = np.asarray(space.mesh.cells)
            pts = np.asarray(space.mesh.nodes, np.float64)[cells]
            h_axes = np.median(pts.max(axis=1) - pts.min(axis=1), axis=0)
            agg = _aggregate_geometric(coords0, geometric_factor, h_axes)
        else:
            G = _node_adjacency(A, bs, strength_theta)
            agg = _aggregate(G)
        P, B = _tentative_P(agg, B, bs)
        bs = B.shape[1]
        if P.shape[1] >= A.shape[0]:  # aggregation stalled
            break
        agg_levels.append(np.asarray(agg))
        bs_levels.append(bs)
        if smooth_prolongation:
            d = A.diagonal()
            d = np.where(d > 0, d, 1.0)
            w_p = 4.0 / (3.0 * _rho_DinvA(A))
            P = (P - sp.diags(w_p / d) @ (A @ P)).tocsr()
        A_next = (P.T @ A @ P).tocsr()
        A_next.sum_duplicates()
        # dead coarse dofs (dropped QR modes) leave zero rows — pin them
        dz = A_next.diagonal() == 0.0
        if dz.any():
            A_next = (A_next + sp.diags(dz.astype(np.float64))).tocsr()
        A_levels.append(A_next)
        P_levels.append(P)

    n_coarse = A_levels[-1].shape[0]
    if n_coarse > 20 * max_coarse:
        msg = (
            f"AMG coarsening stalled at {n_coarse} dofs; dense coarse solve "
            "would be too large — check the mesh connectivity"
        )
        raise RuntimeError(msg)
    coarse_inv = to_device(np.linalg.inv(A_levels[-1].toarray()), dtype)

    dinv = []
    for A in A_levels[:-1]:
        d = A.diagonal()
        d = np.where(np.abs(d) > 0, d, 1.0)
        dinv.append(to_device(1.0 / d, dtype))

    if spmv == "windowed":
        return _freeze_windowed(
            space, A_levels, P_levels, agg_levels, bs_levels, dinv,
            coarse_inv, omega, nu, node_perm, dtype, select_passes,
            tile_rows,
        )
    assert spmv == "ell", spmv
    return AmgPreconditioner(
        A_ell=tuple(_to_ell(A, dtype) for A in A_levels[:-1]),
        P_ell=tuple(_to_ell(P, dtype) for P in P_levels),
        R_ell=tuple(_to_ell(P.T.tocsr(), dtype) for P in P_levels),
        dinv=tuple(dinv),
        coarse_inv=coarse_inv,
        omega=omega,
        nu=nu,
        n_levels=len(A_levels),
    )


# ---------------------------------------------------------------------------
# windowed-SpMV variant: TPU-fast V-cycle (no ELL gathers)
# ---------------------------------------------------------------------------


@dataclass(frozen=True, eq=False)
class WindowedAmgPreconditioner:
    """V-cycle whose level SpMVs are windowed BSR contractions
    (ops/windowed_bsr.py) instead of ELL gathers — the TPU-fast AMG.

    Level vectors are component-major over banded node orders (the fine
    level uses the mesh RCM, so it can consume ops/windowed.WindowedGeometry
    internal vectors directly via :meth:`wrap_internal`). The public
    ``__call__`` keeps the node-major natural signature of
    AmgPreconditioner.
    """

    A_win: tuple
    P_win: tuple
    R_win: tuple
    dinv_int: tuple
    coarse_inv: jnp.ndarray  # COMPACT dense inverse [bsc*nc, bsc*nc]
    nc: int  # true coarse node count
    bsc: int  # coarse block size (dofs per node)
    NPc: int  # padded coarse node count (internal vector granule)
    perm_dev: jnp.ndarray  # fine nodes: old -> new
    invperm_dev: jnp.ndarray
    omega: float
    nu: int
    n_levels: int
    vs: int
    n_nodes0: int
    NP0: int

    def _cycle(self, lvl: int, b):
        if lvl == self.n_levels - 1:
            # compact dense solve: slice the real coarse dofs out of the
            # tile-padded internal vector, apply, pad the result back
            b2 = b.reshape(self.bsc, self.NPc)[:, : self.nc].reshape(-1)
            x2 = self.coarse_inv @ b2
            out = jnp.zeros((self.bsc, self.NPc), b.dtype)
            return out.at[:, : self.nc].set(
                x2.reshape(self.bsc, self.nc)
            ).reshape(-1)
        A = self.A_win[lvl]
        di = self.dinv_int[lvl]
        x = self.omega * di * b
        for _ in range(self.nu - 1):
            x = x + self.omega * di * (b - A.matvec(x))
        r = b - A.matvec(x)
        bc = self.R_win[lvl].matvec(r)
        xc = self._cycle(lvl + 1, bc)
        x = x + self.P_win[lvl].matvec(xc)
        for _ in range(self.nu):
            x = x + self.omega * di * (b - A.matvec(x))
        return x

    # -- layout plumbing -------------------------------------------------------

    def to_internal(self, r: jnp.ndarray) -> jnp.ndarray:
        r2 = r.reshape(self.n_nodes0, self.vs).T[:, self.invperm_dev]
        out = jnp.zeros((self.vs, self.NP0), r.dtype)
        return out.at[:, : self.n_nodes0].set(r2).reshape(-1)

    def from_internal(self, zi: jnp.ndarray) -> jnp.ndarray:
        z2 = zi.reshape(self.vs, self.NP0)
        return z2[:, self.perm_dev].T.reshape(-1)

    def __call__(self, r: jnp.ndarray) -> jnp.ndarray:
        dt = self.coarse_inv.dtype
        zi = self._cycle(0, self.to_internal(r).astype(dt))
        return self.from_internal(zi).astype(r.dtype)

    def wrap_internal(self, m_pad: int):
        """M(r) on WindowedGeometry internal vectors [vs * m_pad] built with
        the SAME node permutation — pure static slice/pad, no index ops."""

        def apply(r_int):
            r2 = r_int.reshape(self.vs, m_pad)
            dt = self.coarse_inv.dtype
            if m_pad >= self.NP0:
                ri = r2[:, : self.NP0]
            else:
                ri = jnp.pad(r2, ((0, 0), (0, self.NP0 - m_pad)))
            zi = self._cycle(0, ri.reshape(-1).astype(dt))
            z2 = zi.reshape(self.vs, self.NP0)
            if m_pad >= self.NP0:
                z2 = jnp.pad(z2, ((0, 0), (0, m_pad - self.NP0)))
            else:
                z2 = z2[:, :m_pad]
            return z2.reshape(-1).astype(r_int.dtype)

        return apply


jax.tree_util.register_dataclass(
    WindowedAmgPreconditioner,
    data_fields=["A_win", "P_win", "R_win", "dinv_int", "coarse_inv",
                 "perm_dev", "invperm_dev"],
    meta_fields=["nc", "bsc", "NPc", "omega", "nu", "n_levels", "vs",
                 "n_nodes0", "NP0"],
)


def _freeze_windowed(
    space, A_levels, P_levels, agg_levels, bs_levels, dinv_jnp,
    coarse_inv, omega, nu, node_perm, dtype, select_passes=1,
    tile_rows=1024,
):
    """tile_rows=1024 (r5 default): halves the BSR kernel grid-cell count
    vs 512 — measured V(3,3) cycle 4.78 vs ~7 ms at 1M QPs, identical
    math (plan layout only)."""
    """Freeze the SA hierarchy into windowed BSR plans (see build_amg)."""
    from ..ops.windowed import reverse_cuthill_mckee
    from ..ops.windowed_bsr import _GRAN, _round_up, build_windowed_bsr

    n_levels = len(A_levels)
    # per-level node orderings: mesh RCM at the fine level, aggregates by
    # min contained fine node below
    if node_perm is None:
        node_perm = reverse_cuthill_mckee(
            np.asarray(space.cell_dof_nodes), space.n_dof_nodes
        )
    perms = [np.asarray(node_perm, np.int64)]
    for agg in agg_levels:
        n_agg = int(agg.max()) + 1
        key = np.full(n_agg, np.iinfo(np.int64).max)
        np.minimum.at(key, agg, perms[-1])
        order = np.argsort(key, kind="stable")
        nxt = np.empty(n_agg, np.int64)
        nxt[order] = np.arange(n_agg)
        perms.append(nxt)

    T_r = int(tile_rows)
    n_nodes = [A.shape[0] // bs for A, bs in zip(A_levels, bs_levels)]
    # levels are both row AND col spaces of the inter-level operators, so
    # pad to a common multiple of the row tile and the column granule
    NP = [_round_up(n, math.lcm(T_r, _GRAN)) for n in n_nodes]

    A_win = tuple(
        build_windowed_bsr(
            A_levels[l], bs_levels[l], bs_levels[l], perms[l], perms[l],
            tile_rows=T_r, n_pad_rows=NP[l], n_pad_cols=NP[l], dtype=dtype,
            select_passes=select_passes,
        )
        for l in range(n_levels - 1)
    )
    P_win = tuple(
        build_windowed_bsr(
            P_levels[l], bs_levels[l], bs_levels[l + 1], perms[l],
            perms[l + 1], tile_rows=T_r, n_pad_rows=NP[l],
            n_pad_cols=NP[l + 1], dtype=dtype,
            select_passes=select_passes,
        )
        for l in range(n_levels - 1)
    )
    R_win = tuple(
        build_windowed_bsr(
            P_levels[l].T.tocsr(), bs_levels[l + 1], bs_levels[l],
            perms[l + 1], perms[l], tile_rows=T_r, n_pad_rows=NP[l + 1],
            n_pad_cols=NP[l], dtype=dtype,
            select_passes=select_passes,
        )
        for l in range(n_levels - 1)
    )

    dinv_int = []
    for l in range(n_levels - 1):
        d = A_levels[l].diagonal()
        d = np.where(np.abs(d) > 0, d, 1.0)
        di = (1.0 / d).reshape(n_nodes[l], bs_levels[l]).T
        inv = np.argsort(perms[l])
        full = np.zeros((bs_levels[l], NP[l]))
        full[:, : n_nodes[l]] = di[:, inv]
        dinv_int.append(to_device(full.reshape(-1), dtype))

    # dense coarsest inverse, COMPACT: comp-major over the level-lc node
    # permutation at the natural coarse size (bsc*nc)^2 — NOT embedded in the
    # NP[lc]-padded internal space, which would square the tile padding
    # (e.g. bsc=6, NP=1024 -> a 6144^2 matrix for a few hundred real dofs).
    # _cycle slices/pads the coarse vectors around the dense solve instead.
    lc = n_levels - 1
    nc, bsc = n_nodes[lc], bs_levels[lc]
    Cnat = np.asarray(coarse_inv, np.float64)
    i_cmp = (
        perms[lc][np.arange(nc)][None, :] + (np.arange(bsc) * nc)[:, None]
    ).reshape(-1)  # natural dof (node, comp) -> compact index, comp-major
    # natural dof order is node-major: dof = node*bsc + comp
    nat = (np.arange(nc)[None, :] * bsc + np.arange(bsc)[:, None]).reshape(-1)
    Ccmp = np.zeros((bsc * nc, bsc * nc))
    Ccmp[np.ix_(i_cmp, i_cmp)] = Cnat[np.ix_(nat, nat)]
    del dinv_jnp

    return WindowedAmgPreconditioner(
        A_win=A_win,
        P_win=P_win,
        R_win=R_win,
        dinv_int=tuple(dinv_int),
        coarse_inv=to_device(Ccmp, dtype),
        nc=nc,
        bsc=bsc,
        NPc=NP[lc],
        perm_dev=to_device(perms[0], jnp.int32),
        invperm_dev=to_device(np.argsort(perms[0]), jnp.int32),
        omega=float(omega),
        nu=int(nu),
        n_levels=n_levels,
        vs=bs_levels[0],
        n_nodes0=n_nodes[0],
        NP0=NP[0],
    )
