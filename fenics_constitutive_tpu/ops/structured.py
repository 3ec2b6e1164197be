"""Structured-grid fast path: flat index-space FEM with MXU channel contractions.

TPU arrays are tiled (sublane, lane) = (8, 128) on the two minor dims. The
round-1 engine kept QP fields as ``[comp, Q, X, Y, Z]`` and expressed the
element stencils as convolutions — correct, but every elementwise op then ran
on ``[.., 50, 50]`` tiles using 50 of 128 lanes (2.56x waste) and the compiled
HLO wrapped each conv in layout-change copies. Measured on v5e, a CG
iteration cost 2.3 ms where bandwidth says ~0.2 ms.

This engine flattens the node grid to ONE minor axis of length
``M = prod(grid+1)`` (full lane utilization, no layout copies) and exploits
that on a translation-invariant grid every corner stencil is a CONSTANT flat
offset ``off_a = dx*SY + dy*SZ + dz``:

  * corner gather:  ``U[(a,j), n] = u[j, n + off_a]`` — 2^d static slices of a
    right-padded ``[vs, M]`` array (no gathers, no dynamic shapes);
  * strain:         ``e[(s,q), n] = KEPS_c @ U`` — one ``[s*Q, n*vs] x
    [n*vs, M]`` matmul on the MXU (Mandel map and reference gradients folded
    into the constant matrix);
  * divergence:     ``F[(a,j), n] = KDIV_c @ sig`` (weights folded), then
    ``r[j, n] = sum_a F[(a,j), n - off_a]`` — 2^d static shifted adds that XLA
    fuses into one pass.

Cell/QP fields live on the NODE-grid footprint ("cell-at-origin" layout,
``[k, Q, M]``): cell (x,y,z) sits at its origin node's flat index; origins on
the high faces (x=X etc.) are invalid and masked (~6% padding at 50^3 — the
price of making every shift a plain slice). ``extract_cells``/``cell_index``
map to dense per-cell arrays for observation.

The reference reaches the same math through UFL forms + ffcx-generated
kernels + PETSc assembly (SURVEY §3.2); there is no analog of this layout
work there — dolfinx's unstructured assembly cannot assume a shared cell
Jacobian. ``ops.packed.PackedGeometry`` remains our general-mesh path with
identical semantics (pinned by tests/solver/test_packed.py).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from . import mandel
from .mandel import Constraint
from .packed import IsotropicTangent  # noqa: F401  (re-export convenience)

__all__ = [
    "StructuredGeometry",
    "build_structured_geometry",
    "restrict_structured_geometry",
    "StructuredTetGeometry",
    "build_structured_tet_geometry",
    "restrict_structured_tet_geometry",
    "LatticeGeometry",
    "build_lattice_geometry",
]


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["KEPS_c", "KDIV_c", "mask", "cell_index", "KE_I", "KE_V"],
    meta_fields=[
        "grid", "vs", "ndofs", "constraint", "n_nodes", "n_qp", "n_cells",
        "M", "offsets", "dN_host", "w_host",
    ],
)
@dataclass(frozen=True)
class StructuredGeometry:
    """Uniform-cell tensor-grid geometry, flat index-space formulation.

    KEPS_c: [s*Q, n*vs]  corner dofs -> Mandel strain channels (MXU matrix)
    KDIV_c: [n*vs, s*Q]  weighted stress channels -> per-corner nodal forces
    mask:   [M]          1.0 at valid cell origins, 0.0 on high faces
    cell_index: [C]      flat node index of each cell's origin (mesh ordering)
    offsets: per-corner flat node offsets (host tuple)
    """

    KEPS_c: jnp.ndarray
    KDIV_c: jnp.ndarray
    mask: jnp.ndarray
    cell_index: jnp.ndarray
    #: quadrature-folded CONSTANT-COEFFICIENT element matrices [n*vs, n*vs]:
    #: Ke(kappa, beta) = beta*KE_I + (kappa - beta/3)*KE_V, the closed form of
    #: sum_q w_q B_q^T C B_q for C = kappa (I2 x I2) + beta P_dev. Lets the
    #: multigrid level operators skip the [s*Q, M] strain/stress channel
    #: fields entirely (elastic_matvec_gm): ~2.3x less HBM traffic per apply.
    KE_I: jnp.ndarray
    KE_V: jnp.ndarray
    grid: tuple
    vs: int
    ndofs: int
    constraint: Constraint
    n_nodes: int
    n_qp: int
    n_cells: int
    M: int
    offsets: tuple
    dN_host: tuple  # [n][g][Q] nested tuples (hashable host constants)
    w_host: tuple

    @property
    def N(self) -> int:
        """Logical QP count (valid cells only; flat fields carry Q*M slots)."""
        return self.n_qp * self.n_cells

    @property
    def uniform(self) -> bool:
        return True

    @property
    def gdim(self) -> int:
        return len(self.grid)

    @property
    def sdim(self) -> int:
        return self.constraint.stress_strain_dim

    @property
    def maxoff(self) -> int:
        return max(self.offsets)

    @property
    def qp_layout(self) -> int:
        """Second axis of the [k, qp_layout, M] field layout. Equals n_qp
        here; the structured-TET engine packs its 6 cell classes along this
        axis (qp_layout = 6 * n_qp) while n_qp stays the per-cell count."""
        return self.n_qp

    def qp_shape(self, k: int) -> tuple:
        """Shape of a k-component QP field in this engine's native layout."""
        return (k, self.qp_layout, self.M)

    # -- layout plumbing -------------------------------------------------------
    # "grid-major" (gm) dof vectors are [vs, M] flattened (component-major);
    # the public node-major layout is [M, vs] flattened. The Krylov loop runs
    # grid-major so the corner slices are contiguous; conversion happens once
    # per Newton solve.

    def to_grid_major(self, u: jnp.ndarray) -> jnp.ndarray:
        return u.reshape(self.M, self.vs).T.reshape(-1)

    def to_node_major(self, u_gm: jnp.ndarray) -> jnp.ndarray:
        return u_gm.reshape(self.vs, self.M).T.reshape(-1)

    def _corner_dofs(self, u_cm: jnp.ndarray) -> jnp.ndarray:
        """[vs, M] component-major nodes -> [n*vs, M] corner dof channels."""
        up = jnp.pad(u_cm, ((0, 0), (0, self.maxoff)))
        rows = [up[:, off : off + self.M] for off in self.offsets]
        return jnp.concatenate(rows, axis=0)

    def _scatter_corners(self, F: jnp.ndarray) -> jnp.ndarray:
        """[n*vs, M] per-corner forces -> [vs, M] component-major nodes.

        r[j, n] = sum_a F[(a,j), n - off_a]; implemented as 2^d static
        left-padded slices so XLA fuses the sum into one elementwise pass.
        """
        mo = self.maxoff
        Fp = jnp.pad(F, ((0, 0), (mo, 0)))
        out = None
        for a, off in enumerate(self.offsets):
            sl = Fp[a * self.vs : (a + 1) * self.vs, mo - off : mo - off + self.M]
            out = sl if out is None else out + sl
        return out

    # -- grid-major hot-path ops ----------------------------------------------

    def _qp_mask(self, dtype) -> jnp.ndarray:
        """Valid-QP mask broadcastable to [s, qp_layout, M]. The base engine
        masks whole cube origins ([M]); the simplex engine overrides with a
        per-class mask ([qp_layout, M]) for law-on-subset views."""
        return self.mask.astype(dtype)

    def strain_gm(self, u_gm: jnp.ndarray) -> jnp.ndarray:
        """Mandel strain of a grid-major dof vector: [s, Q, M] (masked)."""
        U = self._corner_dofs(u_gm.reshape(self.vs, self.M))
        e = jnp.matmul(
            self.KEPS_c.astype(U.dtype), U, preferred_element_type=U.dtype
        )
        e = e.reshape(self.sdim, self.qp_layout, self.M) * self._qp_mask(U.dtype)
        return e

    def residual_gm(self, sigma: jnp.ndarray) -> jnp.ndarray:
        """sigma [s, Q, M] -> grid-major assembled force [vs*M]."""
        sig = (
            sigma.reshape(self.sdim, self.qp_layout, self.M)
            * self._qp_mask(sigma.dtype)
        ).reshape(self.sdim * self.qp_layout, self.M)
        F = jnp.matmul(
            self.KDIV_c.astype(sig.dtype), sig, preferred_element_type=sig.dtype
        )
        return self._scatter_corners(F).reshape(-1)

    def matvec_gm(self, v_gm: jnp.ndarray, tangent) -> jnp.ndarray:
        return self.residual_gm(tangent.apply(self.strain_gm(v_gm)))

    def elastic_matvec_gm(self, v_gm: jnp.ndarray, kappa, beta) -> jnp.ndarray:
        """Constant-coefficient elastic operator apply, quadrature folded.

        Equivalent to ``matvec_gm(v, IsotropicTangent(kappa, beta, 0, .))``
        but as ONE [n*vs, n*vs] x [n*vs, M] matmul on corner-dof blocks — no
        [s*Q, M] strain/stress intermediates. kappa/beta may be traced
        scalars (the multigrid's with_moduli adaptation)."""
        U = self._corner_dofs(v_gm.reshape(self.vs, self.M))
        U = U * self.mask.astype(U.dtype)
        Ke = (beta * self.KE_I + (kappa - beta / 3.0) * self.KE_V).astype(U.dtype)
        F = jnp.matmul(Ke, U, preferred_element_type=U.dtype)
        return self._scatter_corners(F).reshape(-1)

    def jacobi_diag_gm(self, tangent) -> jnp.ndarray:
        """diag(A) in grid-major layout via per-corner B^T C B."""
        dtype = self.KEPS_c.dtype
        M_map = jnp.asarray(mandel._mandel_matrix_map(self.constraint), dtype)
        dN = jnp.asarray(np.asarray(self.dN_host), dtype)  # [n, g, Q]
        w = jnp.asarray(np.asarray(self.w_host), dtype)  # [Q]
        m = self.mask.astype(dtype)
        rows = []
        for a in range(self.n_nodes):
            # B_a [s, vs, Q, 1] broadcasts against tangent fields [Q, M]
            B_a = jnp.einsum("sij,iq->sjq", M_map, dN[a])[..., None]
            q = tangent.quad_diag(B_a) * w[:, None]  # [vs, Q, M] (or bcast)
            q = jnp.broadcast_to(q, (self.vs, self.n_qp, self.M))
            rows.append(q.sum(axis=1) * m)  # [vs, M]
        F = jnp.concatenate(rows, axis=0)  # [n*vs, M]
        return self._scatter_corners(F).reshape(-1)

    # -- engine interface (node-major public semantics) -------------------------

    def strain(self, u: jnp.ndarray) -> jnp.ndarray:
        """Mandel strain of a node-major dof vector: [s, Q, M]."""
        return self.strain_gm(self.to_grid_major(u))

    def residual(self, sigma: jnp.ndarray) -> jnp.ndarray:
        """r = integral eps_m(v) . sigma; sigma [s, Q, M] -> node-major [ndofs]."""
        return self.to_node_major(self.residual_gm(sigma))

    def matvec(self, v: jnp.ndarray, tangent) -> jnp.ndarray:
        return self.to_node_major(self.matvec_gm(self.to_grid_major(v), tangent))

    def jacobi_diag(self, tangent) -> jnp.ndarray:
        return self.to_node_major(self.jacobi_diag_gm(tangent))

    def grad(self, u: jnp.ndarray) -> jnp.ndarray:
        """Full displacement gradient [g, vs, Q*M] (observation/debug path;
        the hot path uses `strain` directly). Invalid origins are zeroed."""
        dtype = u.dtype
        U = self._corner_dofs(self.to_grid_major(u).reshape(self.vs, self.M))
        U = U.reshape(self.n_nodes, self.vs, self.M) * self.mask.astype(dtype)
        dN = jnp.asarray(np.asarray(self.dN_host), dtype)  # [n, g, Q]
        out = jnp.einsum("aiq,ajm->ijqm", dN, U)
        return out.reshape(self.gdim, self.vs, self.n_qp * self.M)

    # -- observation helpers ----------------------------------------------------

    def extract_cells(self, field: jnp.ndarray) -> jnp.ndarray:
        """[k, Q, M] cell-at-origin field -> dense [k, Q, C] in mesh cell order."""
        return field[:, :, self.cell_index]

    def insert_cells(self, dense: jnp.ndarray, dtype=None) -> jnp.ndarray:
        """[k, Q, C] dense per-cell field -> [k, Q, M] cell-at-origin layout."""
        k, Q, _ = dense.shape
        out = jnp.zeros((k, Q, self.M), dtype or dense.dtype)
        return out.at[:, :, self.cell_index].set(dense)


def _corner_offsets(gdim: int):
    """local node a = dx + 2 dy + 4 dz (x fastest), matching mesh.py."""
    return [tuple((a >> d) & 1 for d in range(gdim)) for a in range(2**gdim)]


def multi_strain_gm(geos, u_gm):
    """Shared-stencil strains for masked multi-law views of ONE grid.

    MEASURED AND REJECTED for the hot path (kept for reference): sharing
    the corner gather + strain/divergence matmuls across laws is 19%
    SLOWER than per-law sweeps at the 1M-QP 2-law bench state (74.3 vs
    62.6 ms/step, scripts/ab_multimat.py, v5e) — XLA fuses each law's mask
    into its own matmul pipeline, while sharing materializes extra
    [s*Q, M] intermediates. On TPU, recompute-and-fuse beats
    share-and-spill. Returns one masked [s, Q, M] strain per law."""
    g0 = geos[0]
    U = g0._corner_dofs(u_gm.reshape(g0.vs, g0.M))
    e = jnp.matmul(
        g0.KEPS_c.astype(U.dtype), U, preferred_element_type=U.dtype
    ).reshape(g0.sdim, g0.n_qp, g0.M)
    return [e * g.mask.astype(e.dtype) for g in geos]


def multi_residual_gm(geos, sigmas):
    """Shared-stencil assembly: mask + sum the per-law stresses FIRST, then
    one divergence matmul + one corner scatter (the masks partition the
    valid cell origins, so the sum is the global stress field)."""
    g0 = geos[0]
    sig = None
    for g, s in zip(geos, sigmas):
        sm = s.reshape(g0.sdim * g0.n_qp, g0.M) * g.mask.astype(s.dtype)
        sig = sm if sig is None else sig + sm
    F = jnp.matmul(
        g0.KDIV_c.astype(sig.dtype), sig, preferred_element_type=sig.dtype
    )
    return g0._scatter_corners(F).reshape(-1)


def multi_matvec_gm(geos, tangents, v_gm):
    """Tangent action for multi-law views with the stencil work shared:
    gather/strain/divergence once, tangent apply + mask per law (tangent
    applies are pointwise-linear, so mask-after-apply == apply-on-masked)."""
    eps = multi_strain_gm(geos, v_gm)
    return multi_residual_gm(
        geos, [tg.apply(e) for e, tg in zip(eps, tangents)]
    )


def restrict_structured_geometry(geo: StructuredGeometry, cells) -> StructuredGeometry:
    """Cell-subset view of a structured geometry (multi-material fast path).

    The reference assigns laws to cell subsets via submeshes
    (_lawonsubmesh.py); the gather engine supports that with per-law index
    arrays, but a box mesh would then fall OFF the conv fast path. The TPU
    answer: every engine op already multiplies by the valid-origin ``mask``
    and observes through ``cell_index`` — so a law-on-subset is the SAME
    dense masked conv sweep with the mask zeroed at the other laws' cell
    origins. Each law evaluates densely over the whole grid (strain is
    masked to zero off-subset, so histories stay identically zero there) —
    n_laws masked conv sweeps instead of one serialized-gather engine,
    which is the right trade on a TPU (measured: the gather path is ~3
    orders slower per QP than the conv path, docs/performance.md).
    """
    import dataclasses

    cells = np.asarray(cells, np.int64)
    full_index = np.asarray(geo.cell_index)  # [C_full] origin per mesh cell
    own = full_index[cells]
    dtype = geo.mask.dtype
    mask = np.zeros(geo.M, np.float64)
    mask[own] = 1.0
    return dataclasses.replace(
        geo,
        mask=jnp.asarray(mask, dtype),
        cell_index=jnp.asarray(own.astype(np.int32)),
        n_cells=int(len(cells)),
    )


def build_structured_geometry(
    space, q_degree: int, constraint: Constraint, dtype=None
) -> StructuredGeometry:
    """Flat-index geometry for a box mesh from unit_cube_mesh('hex') /
    unit_square_mesh('quad') (requires mesh.structured_shape metadata)."""
    from ..fem.elements import tabulate_element
    from ..fem.kinematics import _geometry_grad_at

    dtype = dtype or jnp.result_type(float)
    mesh = space.mesh
    grid = getattr(mesh, "structured_shape", None)
    if grid is None:
        msg = "mesh has no structured_shape metadata; use build_packed_geometry"
        raise ValueError(msg)
    assert space.degree == 1, "structured fast path currently supports degree 1"

    elem, quad = tabulate_element(mesh.cell_type, space.degree, q_degree)
    verts = mesh.nodes[mesh.cells[0]]
    geom_dN = _geometry_grad_at(mesh.cell_type, quad.points)
    J = np.einsum("vi,qvj->qij", verts, geom_dN)
    detJ = np.abs(np.linalg.det(J))
    Jinv = np.linalg.inv(J)
    dN = np.einsum("qaj,qji->aiq", elem.dN_dxi, Jinv)  # [n, g, Q]
    w = quad.weights * detJ  # [Q]

    gdim = len(grid)
    sdim = constraint.stress_strain_dim
    n = elem.N.shape[1]
    Q = quad.points.shape[0]
    vs = space.value_size
    offs = _corner_offsets(gdim)
    M_map = mandel._mandel_matrix_map(constraint)  # [s, g, g]

    node_grid = tuple(g + 1 for g in grid)
    M = int(np.prod(node_grid))
    # flat strides, row-major [X+1, Y+1, Z+1] with z minor (matching mesh.py
    # node ordering / the old engine's reshape)
    strides = [1]
    for L in reversed(node_grid[1:]):
        strides.append(strides[-1] * L)
    strides = list(reversed(strides))  # strides[d] for dim d
    flat_offsets = tuple(
        int(sum(o * s for o, s in zip(off, strides))) for off in offs
    )

    # coef[(s,q), (a,j)] = sum_i M[s,i,j] dN[a,i,q]
    KEPS_c = np.zeros((sdim * Q, n * vs))
    for a in range(n):
        for s in range(sdim):
            for q in range(Q):
                for j in range(vs):
                    KEPS_c[s * Q + q, a * vs + j] = sum(
                        M_map[s, i, j] * dN[a, i, q] for i in range(gdim)
                    )
    # KDIV folds the quadrature weights: F = (w .* sig)^T contraction
    KDIV_c = KEPS_c.T.copy()
    for q in range(Q):
        KDIV_c[:, [s * Q + q for s in range(sdim)]] *= w[q]

    # constant-coefficient element matrices (see StructuredGeometry.KE_I):
    # B_q [s, n*vs] are the per-QP rows of KEPS_c; i2 spans the first three
    # Mandel (diagonal) slots
    KE_I = np.zeros((n * vs, n * vs))
    KE_V = np.zeros((n * vs, n * vs))
    n_diag = min(3, sdim)
    for q in range(Q):
        B_q = KEPS_c[[s * Q + q for s in range(sdim)], :]  # [s, n*vs]
        KE_I += w[q] * (B_q.T @ B_q)
        bv = B_q[:n_diag].sum(axis=0)  # i2^T B_q
        KE_V += w[q] * np.outer(bv, bv)

    # valid-origin mask and cell origin indices (mesh cell order: row-major
    # over the cell grid, z fastest — same as the node flat order restricted
    # to origins)
    idx_nd = np.indices(node_grid)  # [gdim, *node_grid]
    valid = np.ones(node_grid, bool)
    for d in range(gdim):
        valid &= idx_nd[d] < grid[d]
    mask = valid.reshape(-1).astype(np.float64)
    cell_index = np.flatnonzero(mask).astype(np.int32)

    def _tup(x):
        return tuple(map(_tup, x)) if isinstance(x, np.ndarray) and x.ndim else float(x)

    return StructuredGeometry(
        KEPS_c=jnp.asarray(KEPS_c, dtype),
        KDIV_c=jnp.asarray(KDIV_c, dtype),
        mask=jnp.asarray(mask, dtype),
        cell_index=jnp.asarray(cell_index),
        KE_I=jnp.asarray(KE_I, dtype),
        KE_V=jnp.asarray(KE_V, dtype),
        grid=tuple(grid),
        vs=vs,
        ndofs=space.ndofs,
        constraint=constraint,
        n_nodes=n,
        n_qp=Q,
        n_cells=int(np.prod(grid)),
        M=M,
        offsets=flat_offsets,
        dN_host=_tup(dN),
        w_host=_tup(w),
    )


# ---------------------------------------------------------------------------
# Degree-d lattice stencil engine (P2+ on box meshes)
# ---------------------------------------------------------------------------


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["KEPS_c", "KDIV_c", "w"],
    meta_fields=[
        "grid", "degree", "lattice", "vs", "ndofs", "constraint",
        "n_nodes", "n_qp", "n_cells", "dN_host", "conv_precision",
    ],
)
@dataclass(frozen=True)
class LatticeGeometry:
    """Degree-d tensor-product stencil engine on a box mesh whose dof nodes
    are lattice-ordered (fem/spaces.py renumbers degree-2 dofs row-major).

    Element gather/scatter are STATIC STRIDED SLICES of the [vs, *lattice]
    grid — no gather instructions at all. Measured motivation: a 2.65M-entry
    dof gather for P2 costs ~19 ms on v5e (the general packed path's 77 ms
    CG iteration); the folded-matmul work itself is ~0.05 ms. Cell QP fields
    are DENSE [k, Q, C] in mesh cell order (no cell-at-origin padding: at
    degree 2 the origin footprint would waste 8x).

    KEPS_c: [s*Q, n*vs] lattice-node dofs -> Mandel strain channels
    KDIV_c: [n*vs, s*Q] weighted transpose (quadrature folded)
    w: [Q] quadrature weight x |detJ| (for the Jacobi diagonal)
    """

    KEPS_c: jnp.ndarray
    KDIV_c: jnp.ndarray
    w: jnp.ndarray
    grid: tuple
    degree: int
    lattice: tuple
    vs: int
    ndofs: int
    constraint: Constraint
    n_nodes: int
    n_qp: int
    n_cells: int
    dN_host: tuple  # [n][g][Q] nested tuples (physical-gradient tables)
    # MXU precision for the strain/residual convs ONLY (r5). The TPU default
    # computes f32 convs with bf16 multiplies (eps ~8e-3): the CG OPERATOR
    # then floors the true residual at ~eps_bf16 x cond (measured r/r0
    # 1.6e-4 on 32^3 P2, scripts/ab_p2_precision.py). Pinning the two convs
    # to HIGHEST restores r/r0 ~4e-7 WITHOUT the global 1.9x
    # matmul_precision="highest" tax the r3 fix paid — the V-cycle is a
    # preconditioner (flexible CG absorbs its bf16 error) and the model eval
    # is elementwise, so neither needs the multi-pass rate.
    conv_precision: str = "highest"

    @property
    def gdim(self) -> int:
        return len(self.grid)

    @property
    def sdim(self) -> int:
        return self.constraint.stress_strain_dim

    @property
    def M(self) -> int:
        return int(np.prod(self.lattice))

    @property
    def N(self) -> int:
        return self.n_qp * self.n_cells

    @property
    def uniform(self) -> bool:
        return True

    def qp_shape(self, k: int) -> tuple:
        return (k, self.n_qp, self.n_cells)

    # dense mesh-order cell fields: observation maps are the identity
    def extract_cells(self, field: jnp.ndarray) -> jnp.ndarray:
        return field

    def insert_cells(self, dense: jnp.ndarray, dtype=None) -> jnp.ndarray:
        return dense.astype(dtype) if dtype is not None else dense

    # -- layout plumbing -------------------------------------------------------
    def to_grid_major(self, u: jnp.ndarray) -> jnp.ndarray:
        return u.reshape(self.M, self.vs).T.reshape(-1)

    def to_node_major(self, u_gm: jnp.ndarray) -> jnp.ndarray:
        return u_gm.reshape(self.vs, self.M).T.reshape(-1)

    def _local_offset(self, a: int) -> tuple:
        """Local node a -> lattice offsets (x fastest digit, elements.py
        _tensor_basis ordering)."""
        nb = self.degree + 1
        rem, locs = a, []
        for _ in range(self.gdim):
            locs.append(rem % nb)
            rem //= nb
        return tuple(locs)

    def _cell_slices(self, a: int) -> tuple:
        off = self._local_offset(a)
        d = self.degree
        return tuple(
            slice(off[k], off[k] + d * (self.grid[k] - 1) + 1, d)
            for k in range(self.gdim)
        )

    def _elem_dofs_cm(self, u_cm: jnp.ndarray) -> jnp.ndarray:
        """[vs, M] component-major -> [n*vs, C] element dof blocks."""
        g = u_cm.reshape((self.vs,) + self.lattice)
        parts = []
        for a in range(self.n_nodes):
            sl = (slice(None),) + self._cell_slices(a)
            parts.append(g[sl].reshape(self.vs, self.n_cells))
        return jnp.concatenate(parts, axis=0)

    # -- grid-major hot-path ops ----------------------------------------------
    # strain is a stride-d convolution with a (d+1)^gdim kernel; residual is
    # its EXACT adjoint (transposed conv). TPU convs handle strided windows
    # natively; the equivalent formulation with 27 stride-2 slices /
    # scatter-adds costs 8 / 36 ms per 885k-QP apply on v5e (minor-axis
    # layout copies) vs ~1 ms for the convs.

    def _dimnums(self):
        sp = "DHW"[3 - self.gdim:]
        return (f"NC{sp}", f"OI{sp}", f"NC{sp}")

    def _keps_kernel(self, dtype) -> jnp.ndarray:
        """KEPS_c [sQ, n*vs] -> conv kernel [sQ, vs, *(d+1)^gdim].

        Local node a has lattice offsets (x fastest): a = ox + nb*oy + nb^2*oz;
        kernel spatial dims are (X, Y, Z) in that order.
        """
        nb = self.degree + 1
        K = self.KEPS_c.reshape(
            (self.sdim * self.n_qp,) + (nb,) * self.gdim + (self.vs,)
        )
        # a = ox + nb*oy + nb^2*oz (x FASTEST), so the reshape's spatial dims
        # come out (oz, oy, ox): reverse them to kernel order (X, Y, Z)
        perm = (0, self.gdim + 1) + tuple(range(self.gdim, 0, -1))
        return jnp.transpose(K, perm).astype(dtype)

    def strain_gm(self, u_gm: jnp.ndarray) -> jnp.ndarray:
        g = u_gm.reshape((1, self.vs) + self.lattice)
        out = jax.lax.conv_general_dilated(
            g,
            self._keps_kernel(g.dtype),
            window_strides=(self.degree,) * self.gdim,
            padding="VALID",
            dimension_numbers=self._dimnums(),
            preferred_element_type=g.dtype,
            precision=self.conv_precision,
        )
        return out.reshape(self.sdim, self.n_qp, self.n_cells)

    def residual_gm(self, sigma: jnp.ndarray) -> jnp.ndarray:
        # fold quadrature weights, then apply the exact adjoint of strain_gm
        sig_w = sigma * self.w.astype(sigma.dtype)[None, :, None]
        g = sig_w.reshape((1, self.sdim * self.n_qp) + tuple(self.grid))
        out = jax.lax.conv_transpose(
            g,
            self._keps_kernel(g.dtype),
            strides=(self.degree,) * self.gdim,
            padding="VALID",
            dimension_numbers=self._dimnums(),
            transpose_kernel=True,
            preferred_element_type=g.dtype,
            precision=self.conv_precision,
        )
        return out.reshape(-1)

    def matvec_gm(self, v_gm: jnp.ndarray, tangent) -> jnp.ndarray:
        return self.residual_gm(tangent.apply(self.strain_gm(v_gm)))

    def jacobi_diag_gm(self, tangent) -> jnp.ndarray:
        KE = self.KEPS_c.reshape(self.sdim, self.n_qp, self.n_nodes, self.vs)
        out = jnp.zeros((self.vs,) + self.lattice, self.KEPS_c.dtype)
        w = self.w
        for a in range(self.n_nodes):
            B_a = jnp.transpose(KE[:, :, a, :], (0, 2, 1))[..., None]
            q = tangent.quad_diag(B_a)  # [vs, Q, C] (broadcast)
            q = jnp.broadcast_to(q, (self.vs, self.n_qp, self.n_cells))
            contrib = (q * w[None, :, None]).sum(axis=1)  # [vs, C]
            sl = (slice(None),) + self._cell_slices(a)
            out = out.at[sl].add(
                contrib.reshape((self.vs,) + tuple(self.grid))
            )
        return out.reshape(-1)

    # -- engine interface (node-major public semantics) -------------------------
    def strain(self, u: jnp.ndarray) -> jnp.ndarray:
        return self.strain_gm(self.to_grid_major(u))

    def residual(self, sigma: jnp.ndarray) -> jnp.ndarray:
        return self.to_node_major(self.residual_gm(sigma))

    def matvec(self, v: jnp.ndarray, tangent) -> jnp.ndarray:
        return self.to_node_major(self.matvec_gm(self.to_grid_major(v), tangent))

    def jacobi_diag(self, tangent) -> jnp.ndarray:
        return self.to_node_major(self.jacobi_diag_gm(tangent))

    def grad(self, u: jnp.ndarray) -> jnp.ndarray:
        """Full displacement gradient [g, vs, Q*C] (observation path)."""
        U = self._elem_dofs_cm(
            self.to_grid_major(u).reshape(self.vs, self.M)
        ).reshape(self.n_nodes, self.vs, self.n_cells)
        dN = jnp.asarray(np.asarray(self.dN_host), U.dtype)  # [n, g, Q]
        out = jnp.einsum("aiq,ajc->ijqc", dN, U)
        return out.reshape(self.gdim, self.vs, self.N)


def restrict_structured_tet_geometry(
    geo: StructuredTetGeometry, cells
) -> StructuredTetGeometry:
    """Simplex-subset view of a structured tet/triangle geometry.

    Multi-material on Kuhn box meshes: tet t = cube * K + class (mesh
    ordering), so a law's cell set becomes a per-class ownership mask
    [K, M] over cube origins, threaded through every engine op by
    ``_qp_mask`` — the simplex analog of ``restrict_structured_geometry``
    (VERDICT r3 item 2; mirrors reference _lawonsubmesh.py:21-45). Each law
    stays on the dense conv/stencil path; only its own (class, cube) QPs
    carry strain/stress.
    """
    import dataclasses

    cells = np.asarray(cells, np.int64)
    K = geo.n_classes
    origins = np.asarray(geo.cell_index)  # [Ncube] origin per cube
    cube = cells // K
    kls = cells % K
    cm = np.zeros((K, geo.M), np.float64)
    cm[kls, origins[cube]] = 1.0
    dtype = geo.mask.dtype
    return dataclasses.replace(
        geo,
        class_mask=jnp.asarray(cm, dtype),
        tet_index=jnp.asarray(cells.astype(np.int32)),
        n_cells=int(len(cells)),
    )


def build_lattice_geometry(
    space, q_degree: int, constraint: Constraint, dtype=None
) -> LatticeGeometry:
    """Lattice stencil engine for a degree-2 space on a box mesh (quad/hex)
    with lattice-ordered dofs (fem/spaces.py)."""
    from ..fem.elements import tabulate_element
    from ..fem.kinematics import _geometry_grad_at

    dtype = dtype or jnp.result_type(float)
    mesh = space.mesh
    grid = mesh.structured_shape
    assert grid is not None and mesh.cell_type in ("quad", "hex")
    d = space.degree
    assert d >= 2, "use build_structured_geometry for degree 1"

    elem, quad = tabulate_element(mesh.cell_type, d, q_degree)
    verts = mesh.nodes[mesh.cells[0]]
    geom_dN = _geometry_grad_at(mesh.cell_type, quad.points)
    J = np.einsum("vi,qvj->qij", verts, geom_dN)
    detJ = np.abs(np.linalg.det(J))
    Jinv = np.linalg.inv(J)
    dN = np.einsum("qaj,qji->aiq", elem.dN_dxi, Jinv)  # [n, g, Q]
    w = quad.weights * detJ  # [Q]

    gdim = len(grid)
    sdim = constraint.stress_strain_dim
    n = elem.N.shape[1]
    Q = quad.points.shape[0]
    vs = space.value_size
    M_map = mandel._mandel_matrix_map(constraint)

    KE = np.einsum("sij,aiq->sqaj", M_map, dN)  # [s, Q, n, vs]
    KEPS_c = KE.reshape(sdim * Q, n * vs)
    KD = KE * w[None, :, None, None]
    KDIV_c = KD.reshape(sdim * Q, n * vs).T.copy()

    lattice = tuple(d * g + 1 for g in grid)
    assert space.n_dof_nodes == int(np.prod(lattice))
    # sanity: dof node 0 must be the lattice origin (lattice ordering applied)
    assert np.allclose(space.dof_coords[0], mesh.nodes.min(axis=0))

    def _tup(x):
        return tuple(map(_tup, x)) if isinstance(x, np.ndarray) and x.ndim else float(x)

    return LatticeGeometry(
        KEPS_c=jnp.asarray(KEPS_c, dtype),
        KDIV_c=jnp.asarray(KDIV_c, dtype),
        w=jnp.asarray(w, dtype),
        grid=tuple(grid),
        degree=d,
        lattice=lattice,
        vs=vs,
        ndofs=space.ndofs,
        constraint=constraint,
        n_nodes=n,
        n_qp=Q,
        n_cells=int(np.prod(grid)),
        dN_host=_tup(dN),
    )


# ---------------------------------------------------------------------------
# structured TETRAHEDRA: Kuhn-subdivided box meshes on the hex channel engine
# ---------------------------------------------------------------------------


@partial(
    jax.tree_util.register_dataclass,
    data_fields=[
        "KEPS_c", "KDIV_c", "mask", "cell_index", "KE_I", "KE_V",
        "class_mask", "tet_index",
    ],
    meta_fields=[
        "grid", "vs", "ndofs", "constraint", "n_nodes", "n_qp", "n_cells",
        "M", "offsets", "dN_host", "w_host", "n_classes", "class_dN_host",
        "class_channels",
    ],
)
@dataclass(frozen=True)
class StructuredTetGeometry(StructuredGeometry):
    """Gather-free engine for Kuhn-subdivided box SIMPLEX meshes
    (6 tets per cube in 3D; 2 triangles per quad in 2D).

    Why this exists: the general tet path is the gather engine, and TPU
    scalar gathers are the wall — measured 53.7 ms for ONE [n, vs, C] u-
    gather at 257k tets (scripts/profile_gather.py), ~29 us/QP per Newton
    step overall (scripts/bench_amg_tpu.py). But unit_cube_mesh('tetra')
    splits every cube into the SAME 6 Kuhn tets (fem/mesh.py _KUHN_PATHS),
    so the mesh is translation-invariant per class: every tet vertex is one
    of its cube's 8 corners. The 6 classes therefore FOLD into the hex
    engine's corner-channel machinery — one [8*vs, M] corner gather (static
    slices), one [s*6Q, 8*vs] strain matmul whose rows stack the classes
    along the QP-layout axis, one weighted divergence matmul, one corner
    scatter. Zero gathers, same conv-class cost as the hex engine.

    Layout: fields are [k, 6*Q, M] (qp_layout = n_classes * n_qp) on the
    cube-origin footprint; per-cell observation (n_qp = Q per tet,
    n_cells = 6 * #cubes) goes through the overridden extract/insert with
    tet t = cube * 6 + class.
    """

    n_classes: int = 6
    #: per class: dN/dx [4][g][Q] nested host tuples
    class_dN_host: tuple = ()
    #: per class: cube-corner channel (dx + 2 dy + 4 dz) of each local vertex
    class_channels: tuple = ()
    #: law-on-subset view (restrict_structured_tet_geometry): 1.0 where this
    #: law owns simplex (class, cube-origin); None = whole mesh
    class_mask: jnp.ndarray | None = None
    #: law-on-subset view: owned tet ids in mesh order (observation)
    tet_index: jnp.ndarray | None = None

    @property
    def qp_layout(self) -> int:
        return self.n_classes * self.n_qp

    def _qp_mask(self, dtype) -> jnp.ndarray:
        if self.class_mask is None:
            return self.mask.astype(dtype)
        # [K, M] ownership -> [K*Q, M] rows of the class-stacked QP layout
        cm = self.class_mask.astype(dtype)
        return jnp.broadcast_to(
            cm[:, None, :], (self.n_classes, self.n_qp, self.M)
        ).reshape(self.qp_layout, self.M)

    # -- observation ---------------------------------------------------------

    def extract_cells(self, field: jnp.ndarray) -> jnp.ndarray:
        """[k, 6Q, M] -> dense [k, Q, C_tet] in mesh cell order
        (tet t = cube * 6 + class; cubes in the hex engine's cell order)."""
        k = field.shape[0]
        f = field.reshape(k, self.n_classes, self.n_qp, self.M)
        blk = f[:, :, :, self.cell_index]  # [k, K, Q, Ncube]
        # -> [k, Q, Ncube, K] -> [k, Q, Ncube*K] with tet = cube*K + class
        dense = jnp.transpose(blk, (0, 2, 3, 1)).reshape(k, self.n_qp, -1)
        if self.tet_index is not None:  # law-on-subset view
            dense = dense[:, :, self.tet_index]
        return dense

    def insert_cells(self, dense: jnp.ndarray, dtype=None) -> jnp.ndarray:
        """[k, Q, C_tet] -> [k, 6Q, M] cube-origin layout."""
        k, Q, C = dense.shape
        if self.tet_index is not None:  # law-on-subset view: expand first
            full = jnp.zeros(
                (k, Q, self.cell_index.shape[0] * self.n_classes), dense.dtype
            )
            dense = full.at[:, :, self.tet_index].set(dense)
            C = dense.shape[2]
        ncube = C // self.n_classes
        d = dense.reshape(k, Q, ncube, self.n_classes)
        d = jnp.transpose(d, (0, 3, 1, 2))  # [k, K, Q, Ncube]
        out = jnp.zeros((k, self.n_classes, Q, self.M), dtype or dense.dtype)
        out = out.at[:, :, :, self.cell_index].set(d)
        return out.reshape(k, self.qp_layout, self.M)

    def grad(self, u: jnp.ndarray) -> jnp.ndarray:
        """Full displacement gradient [g, vs, 6Q*M] (observation path)."""
        dtype = u.dtype
        U = self._corner_dofs(self.to_grid_major(u).reshape(self.vs, self.M))
        U = U.reshape(self.n_nodes, self.vs, self.M)
        g = self.gdim
        parts = []
        for kls in range(self.n_classes):
            m = (
                self.mask if self.class_mask is None else self.class_mask[kls]
            ).astype(dtype)
            dN = jnp.asarray(np.asarray(self.class_dN_host[kls]), dtype)
            ch = self.class_channels[kls]
            Uk = jnp.stack([U[c] for c in ch]) * m  # [4, vs, M]
            parts.append(jnp.einsum("aiq,ajm->ijqm", dN, Uk))  # [g, vs, Q, M]
        out = jnp.stack(parts, axis=2)  # [g, vs, K, Q, M]
        return out.reshape(g, self.vs, self.qp_layout * self.M)

    # -- Jacobi diagonal from the folded strain rows --------------------------

    def jacobi_diag_gm(self, tangent) -> jnp.ndarray:
        dtype = self.KEPS_c.dtype
        B = self.KEPS_c.reshape(self.sdim, self.qp_layout, self.n_nodes * self.vs)
        w = jnp.asarray(np.asarray(self.w_host), dtype)  # [6Q] (detJ folded)
        qpm = self._qp_mask(dtype)  # [M] or [qp_layout, M]
        rows = []
        for a in range(self.n_nodes):
            # B_a [s, vs, 6Q, 1] broadcasts against tangent fields [6Q, M]
            B_a = jnp.transpose(
                B[:, :, a * self.vs : (a + 1) * self.vs], (0, 2, 1)
            )[..., None]
            q = tangent.quad_diag(B_a) * w[:, None]
            q = jnp.broadcast_to(q, (self.vs, self.qp_layout, self.M)) * qpm
            rows.append(q.sum(axis=1))
        F = jnp.concatenate(rows, axis=0)
        return self._scatter_corners(F).reshape(-1)


def build_structured_tet_geometry(
    space, q_degree: int, constraint: Constraint, dtype=None
) -> StructuredTetGeometry:
    """Flat-index geometry for Kuhn simplex box meshes: unit_cube_mesh
    ('tetra', 6 classes) and unit_square_mesh('triangle', 2 classes)."""
    from ..fem.elements import tabulate_element
    from ..fem.kinematics import _geometry_grad_at

    dtype = dtype or jnp.result_type(float)
    mesh = space.mesh
    grid = getattr(mesh, "structured_shape", None)
    assert grid is not None and mesh.cell_type in ("tetra", "triangle")
    assert space.degree == 1, "structured simplex path supports degree 1"

    elem, quad = tabulate_element(mesh.cell_type, space.degree, q_degree)
    geom_dN = _geometry_grad_at(mesh.cell_type, quad.points)
    gdim = len(grid)
    sdim = constraint.stress_strain_dim
    Q = quad.points.shape[0]
    vs = space.value_size
    M_map = mandel._mandel_matrix_map(constraint)

    node_grid = tuple(g + 1 for g in grid)
    M = int(np.prod(node_grid))
    strides = [1]
    for L in reversed(node_grid[1:]):
        strides.append(strides[-1] * L)
    strides = list(reversed(strides))
    offs = _corner_offsets(gdim)  # channel a = dx + 2 dy + 4 dz
    flat_offsets = tuple(
        int(sum(o * st for o, st in zip(off, strides))) for off in offs
    )

    # the first K mesh cells ARE the K classes of box (0,..,0); every other
    # box repeats them translated (fem/mesh.py orderings)
    K = mesh.num_cells // int(np.prod(grid))
    n_ch = len(offs)
    KEPS_c = np.zeros((sdim * K * Q, n_ch * vs))
    w_flat = np.zeros(K * Q)
    class_dN = []
    class_channels = []
    KE_I = np.zeros((n_ch * vs, n_ch * vs))
    KE_V = np.zeros((n_ch * vs, n_ch * vs))
    n_diag = min(3, sdim)
    n_vert = gdim + 1  # simplex
    for k in range(K):
        verts = mesh.nodes[mesh.cells[k]]  # [n_vert, gdim] coordinates
        # box-corner bit pattern of each vertex (0/1 in the first box) ->
        # channel id a = sum_d bit_d << d (matching _corner_offsets)
        scaled = verts * np.asarray(grid)
        bits = np.rint(scaled).astype(int)
        if (
            bits.min() < 0
            or bits.max() > 1
            or not np.allclose(scaled, bits, atol=1e-9)
        ):
            msg = (
                "build_structured_tet_geometry: first-box vertex coordinates "
                "scaled by the grid are not 0/1 corner bits — the mesh is not "
                "a unit-domain box mesh (unit_cube_mesh/unit_square_mesh "
                "orderings). Non-unit or translated domains are not supported "
                "by the structured simplex engine; use the packed engine."
            )
            raise ValueError(msg)
        channels = [int(sum(int(b[d]) << d for d in range(gdim))) for b in bits]
        J = np.einsum("vi,qvj->qij", verts, geom_dN)
        detJ = np.abs(np.linalg.det(J))
        Jinv = np.linalg.inv(J)
        dN = np.einsum("qaj,qji->aiq", elem.dN_dxi, Jinv)  # [n_vert, g, Q]
        w = quad.weights * detJ  # [Q]
        class_dN.append(dN)
        class_channels.append(tuple(channels))
        for v in range(n_vert):
            a = channels[v]
            for s in range(sdim):
                for q in range(Q):
                    for j in range(vs):
                        KEPS_c[s * (K * Q) + k * Q + q, a * vs + j] += sum(
                            M_map[s, i, j] * dN[v, i, q] for i in range(gdim)
                        )
        for q in range(Q):
            w_flat[k * Q + q] = w[q]

    KDIV_c = KEPS_c.T.copy()
    for kq in range(K * Q):
        KDIV_c[:, [s * (K * Q) + kq for s in range(sdim)]] *= w_flat[kq]

    for kq in range(K * Q):
        B_q = KEPS_c[[s * (K * Q) + kq for s in range(sdim)], :]
        KE_I += w_flat[kq] * (B_q.T @ B_q)
        bv = B_q[:n_diag].sum(axis=0)
        KE_V += w_flat[kq] * np.outer(bv, bv)

    idx_nd = np.indices(node_grid)
    valid = np.ones(node_grid, bool)
    for d in range(gdim):
        valid &= idx_nd[d] < grid[d]
    mask = valid.reshape(-1).astype(np.float64)
    cell_index = np.flatnonzero(mask).astype(np.int32)

    def _tup(x):
        return tuple(map(_tup, x)) if isinstance(x, np.ndarray) and x.ndim else float(x)

    return StructuredTetGeometry(
        KEPS_c=jnp.asarray(KEPS_c, dtype),
        KDIV_c=jnp.asarray(KDIV_c, dtype),
        mask=jnp.asarray(mask, dtype),
        cell_index=jnp.asarray(cell_index),
        KE_I=jnp.asarray(KE_I, dtype),
        KE_V=jnp.asarray(KE_V, dtype),
        grid=tuple(grid),
        vs=vs,
        ndofs=space.ndofs,
        constraint=constraint,
        n_nodes=n_ch,  # CHANNELS (cube corners), not tet vertices
        n_qp=Q,  # per-TET quadrature count (observation contract)
        n_cells=int(K * np.prod(grid)),
        M=M,
        offsets=flat_offsets,
        dN_host=(),  # unused (hex-specific); class_dN_host replaces it
        w_host=_tup(w_flat),
        n_classes=K,
        class_dN_host=tuple(_tup(d) for d in class_dN),
        class_channels=tuple(class_channels),
    )
