"""Structured-grid fast path: FEM kinematics/assembly as MXU convolutions.

XLA's generic gather/scatter maps poorly onto TPU (measured ~23 ms for a
397k x 24 dof gather on v5e), and shifted slice-adds on a 3-D node grid cost
~0.5 ms each as dynamic-update-slices. On a structured tensor grid both sides
of the element loop are size-2^d stencils, i.e. convolutions — and because the
Mandel strain operator and the quadrature weights are LINEAR, they fold into
the conv kernels:

  * strain:    eps[(s,q), cell] = sum_{a,i,j} M[s,i,j] dN[a,i,q] u[j, cell+off_a]
               == conv(u_grid, KEPS): one MXU op from displacements straight
               to Mandel strains;
  * assembly:  r[j, node] = sum_{s,q,a,i} M[s,i,j] dN[a,i,q] w_q sig[(s,q), node-off_a]
               == conv(sig, KDIV) with padding 1 (KDIV is KEPS mirrored and
               weight-scaled): one MXU op straight from Mandel stresses to
               assembled nodal forces.

Everything between the two convs (the constitutive update, the factored
tangent apply) is elementwise and runs IN the conv-native layout
``[comp, Q, *grid]`` — no transposes, pads, or retiling copies anywhere in
the CG matvec (these dominated the profile before this folding).

All cells share one Jacobian on these grids, so dN/w are compile-time kernel
constants. `ops.packed.PackedGeometry` remains the general-mesh path with
identical semantics (pinned by tests/solver/test_packed.py); QP fields there
are [comp, N] with N = Q*C q-major — the grid layout here flattens to exactly
that ordering, so observation code can reshape freely.
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

__all__ = ["StructuredGeometry", "build_structured_geometry"]


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["KEPS", "KDIV", "KSCAT"],
    meta_fields=[
        "grid", "vs", "ndofs", "constraint", "n_nodes", "n_qp", "n_cells",
        "dN_host", "w_host",
    ],
)
@dataclass(frozen=True)
class StructuredGeometry:
    """Uniform-cell tensor-grid geometry with conv-folded tabulation.

    KEPS:  [(s,q) out, vs in, 2^d]    u-grid -> Mandel strain conv kernel
    KDIV:  [vs out, (s,q) in, 2^d]    Mandel stress -> nodal force conv kernel
    KSCAT: [vs out, (a,vs) in, 2^d]   corner scatter (Jacobi diagonal)
    """

    KEPS: jnp.ndarray
    KDIV: jnp.ndarray
    KSCAT: jnp.ndarray
    grid: tuple
    vs: int
    ndofs: int
    constraint: Constraint
    n_nodes: int
    n_qp: int
    n_cells: int
    dN_host: tuple  # [n][g][Q] nested tuples (hashable host constants)
    w_host: tuple

    @property
    def N(self) -> int:
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

    def qp_shape(self, k: int) -> tuple:
        """Shape of a k-component QP field in this engine's native layout."""
        return (k, self.n_qp, *self.grid)

    # -- conv plumbing --------------------------------------------------------

    def _dimnums(self):
        sp = "DHW"[3 - self.gdim :]
        return (f"NC{sp}", f"OI{sp}", f"NC{sp}")

    def _conv(self, x, k, padding):
        return jax.lax.conv_general_dilated(
            x[None],
            k.astype(x.dtype),
            window_strides=(1,) * self.gdim,
            padding=padding,
            dimension_numbers=self._dimnums(),
            preferred_element_type=x.dtype,
        )[0]

    def _u_grid(self, u: jnp.ndarray) -> jnp.ndarray:
        """[ndofs] (node-major) -> [vs, *node_grid]."""
        shape = tuple(g + 1 for g in self.grid) + (self.vs,)
        ug = u.reshape(shape)
        perm = (self.gdim,) + tuple(range(self.gdim))
        return ug.transpose(perm)

    # -- grid-major dof ordering ----------------------------------------------
    # The public dof layout is node-major ([*nodes, vs] flattened, matching
    # FunctionSpace). Internally every conv wants component-major
    # ([vs, *nodes]); converting per matvec costs two retiling copies per CG
    # iteration — measured comparable to the convs themselves. The solver
    # therefore runs CG in GRID-MAJOR flat vectors (reshape = free) and
    # converts once per Newton step via to_grid_major/to_node_major.

    def to_grid_major(self, u: jnp.ndarray) -> jnp.ndarray:
        return self._u_grid(u).reshape(-1)

    def to_node_major(self, u_gm: jnp.ndarray) -> jnp.ndarray:
        g = u_gm.reshape((self.vs,) + tuple(s + 1 for s in self.grid))
        perm = tuple(range(1, self.gdim + 1)) + (0,)
        return g.transpose(perm).reshape(-1)

    def strain_gm(self, u_gm: jnp.ndarray) -> jnp.ndarray:
        """Mandel strain of a grid-major dof vector: [s, Q, *grid]."""
        g = u_gm.reshape((self.vs,) + tuple(s + 1 for s in self.grid))
        out = self._conv(g, self.KEPS, "VALID")
        return out.reshape(self.sdim, self.n_qp, *self.grid)

    def residual_gm(self, sigma: jnp.ndarray) -> jnp.ndarray:
        """sigma [s, Q, *grid] -> grid-major assembled force [ndofs]."""
        x = sigma.reshape(self.sdim * self.n_qp, *self.grid)
        r = self._conv(x, self.KDIV, [(1, 1)] * self.gdim)
        return r.reshape(-1)

    def matvec_gm(self, v_gm: jnp.ndarray, tangent) -> jnp.ndarray:
        return self.residual_gm(tangent.apply(self.strain_gm(v_gm)))

    def jacobi_diag_gm(self, tangent) -> jnp.ndarray:
        return self.to_grid_major(self.jacobi_diag(tangent))

    # -- engine interface (node-major public semantics) -------------------------

    def strain(self, u: jnp.ndarray) -> jnp.ndarray:
        """Mandel strain of a dof vector: [s, Q, *grid]."""
        out = self._conv(self._u_grid(u), self.KEPS, "VALID")
        return out.reshape(self.sdim, self.n_qp, *self.grid)

    def grad(self, u: jnp.ndarray) -> jnp.ndarray:
        """Full displacement gradient [g, vs, N] (observation/debug path;
        the hot path uses `strain` directly)."""
        # reconstruct from corner slices (not conv-folded; rarely used)
        ug = self._u_grid(u)
        dN = np.asarray(self.dN_host)
        out = 0.0
        for a, off in enumerate(_corner_offsets(self.gdim)):
            sl = (slice(None),) + tuple(slice(o, o + g) for o, g in zip(off, self.grid))
            ue = ug[sl].reshape(self.vs, self.n_cells)  # [j, C]
            out = out + jnp.asarray(dN[a], ue.dtype)[:, :, None, None] * ue[None, None]
        # out: [g, Q, j, C] -> [g, j, N]
        return out.transpose(0, 2, 1, 3).reshape(self.gdim, self.vs, self.N)

    def residual(self, sigma: jnp.ndarray) -> jnp.ndarray:
        """r = integral eps_m(v) . sigma; sigma [s, Q, *grid] -> [ndofs]."""
        x = sigma.reshape(self.sdim * self.n_qp, *self.grid)
        r = self._conv(x, self.KDIV, [(1, 1)] * self.gdim)  # [vs, *node_grid]
        perm = tuple(range(1, self.gdim + 1)) + (0,)
        return r.transpose(perm).reshape(-1)

    def matvec(self, v: jnp.ndarray, tangent) -> jnp.ndarray:
        return self.residual(tangent.apply(self.strain(v)))

    def jacobi_diag(self, tangent) -> jnp.ndarray:
        M = jnp.asarray(mandel._mandel_matrix_map(self.constraint), self.KEPS.dtype)
        n, g, Q = self.n_nodes, self.gdim, self.n_qp
        dN = jnp.asarray(np.asarray(self.dN_host), self.KEPS.dtype)  # [n, g, Q]
        w = jnp.asarray(np.asarray(self.w_host), self.KEPS.dtype)  # [Q]
        ones = (1,) * g
        contribs = []
        for a in range(n):
            # B_a[s, vs, Q] broadcast over the cell grid
            B_a = jnp.einsum("sij,iq->sjq", M, dN[a]).reshape(
                self.sdim, self.vs, Q, *ones
            )
            q = tangent.quad_diag(B_a) * w.reshape(Q, *ones)
            # broadcast explicitly: constant (scalar-coefficient) tangents keep
            # q at singleton grid dims
            q = jnp.broadcast_to(q, (self.vs, Q, *self.grid))
            contribs.append(q.sum(axis=1))  # [vs, *grid]
        x = jnp.stack(contribs, axis=0).reshape(n * self.vs, *self.grid)
        d = self._conv(x, self.KSCAT, [(1, 1)] * self.gdim)
        perm = tuple(range(1, self.gdim + 1)) + (0,)
        return d.transpose(perm).reshape(-1)


def _corner_offsets(gdim: int):
    """local node a = dx + 2 dy + 4 dz (x fastest), matching mesh.py."""
    return [tuple((a >> d) & 1 for d in range(gdim)) for a in range(2**gdim)]


def build_structured_geometry(
    space, q_degree: int, constraint: Constraint, dtype=None
) -> StructuredGeometry:
    """Conv-kernel geometry for a box mesh from unit_cube_mesh('hex') /
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
    ksp = (2,) * gdim
    M = mandel._mandel_matrix_map(constraint)  # [s, g, g]

    # KEPS: VALID conv, out[c] = sum_k K[k] u[c + k]; channel order (s, q) so
    # the output reshapes straight to [s, Q, *grid].
    KEPS = np.zeros((sdim * Q, vs, *ksp))
    for a, off in enumerate(offs):
        for s in range(sdim):
            for q in range(Q):
                for j in range(vs):
                    coef = sum(M[s, i, j] * dN[a, i, q] for i in range(gdim))
                    KEPS[s * Q + q, j][off] += coef

    # KDIV: padding-1 conv, out[p] = sum_k K[k] x[p + k - 1]; cell c feeds node
    # p = c + off via k = 1 - off (mirrored). M^T and w fold in.
    KDIV = np.zeros((vs, sdim * Q, *ksp))
    for a, off in enumerate(offs):
        koff = tuple(1 - o for o in off)
        for s in range(sdim):
            for q in range(Q):
                for j in range(vs):
                    coef = sum(M[s, i, j] * dN[a, i, q] for i in range(gdim))
                    KDIV[j, s * Q + q][koff] += coef * w[q]

    # KSCAT: plain mirrored corner scatter for per-(a, vs) cell fields.
    KSCAT = np.zeros((vs, n * vs, *ksp))
    for a, off in enumerate(offs):
        koff = tuple(1 - o for o in off)
        for j in range(vs):
            KSCAT[j, a * vs + j][koff] = 1.0

    def _tup(x):
        return tuple(map(_tup, x)) if isinstance(x, np.ndarray) and x.ndim else float(x)

    return StructuredGeometry(
        KEPS=jnp.asarray(KEPS, dtype),
        KDIV=jnp.asarray(KDIV, dtype),
        KSCAT=jnp.asarray(KSCAT, dtype),
        grid=tuple(grid),
        vs=vs,
        ndofs=space.ndofs,
        constraint=constraint,
        n_nodes=n,
        n_qp=Q,
        n_cells=int(np.prod(grid)),
        dN_host=_tup(dN),
        w_host=_tup(w),
    )
