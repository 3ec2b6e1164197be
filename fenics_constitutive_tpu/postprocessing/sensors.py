"""Point sensors for displacement and quadrature fields.

The reference declares this intent but never implements it —
tests/postprocessing/test_sensor.py is literally ``#empty`` (SURVEY §4
'Empty placeholders'). Implemented here: a DisplacementSensor interpolates the
displacement field at fixed physical points (shape-function weights are
precomputed host-side, the sample itself is a tiny jit-safe contraction), and
a QPSensor reads the nearest quadrature point of a QP field (stress, history).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..fem.elements import tabulate_element
from ..fem.spaces import FunctionSpace, _geometry_basis_at

__all__ = ["DisplacementSensor", "QPSensor"]


def _try_cell(mesh, c, p, ref_mid, tol=1e-9):
    """Newton inverse map of point p into cell c; returns xi or None.

    Exact in one step for affine cells (interval/triangle/tetra and
    parallelepiped quads/hexes); iterates for distorted bilinear/trilinear
    cells, and VERIFIES the forward map reproduces p — so a sliver cell
    whose midpoint happens to be near p can never be silently mislocated.
    """
    from ..fem.kinematics import _geometry_grad_at

    verts = mesh.nodes[mesh.cells[c]]
    xi = ref_mid.copy()
    for _ in range(25):
        x = _geometry_basis_at(mesh.cell_type, xi[None])[0] @ verts
        r = p - x
        if np.linalg.norm(r) <= 1e-12 * (1.0 + np.linalg.norm(p)):
            break
        J = verts.T @ _geometry_grad_at(mesh.cell_type, xi[None])[0]
        try:
            xi = xi + np.linalg.solve(J, r)
        except np.linalg.LinAlgError:
            return None
        if np.abs(xi).max() > 10.0:  # diverging: p is far from this cell
            return None
    else:
        return None
    inside = np.all(xi >= -tol)
    if mesh.cell_type in ("triangle", "tetra"):
        inside &= xi.sum() <= 1 + tol
    else:
        inside &= np.all(xi <= 1 + tol)
    return xi if inside else None


def _locate(mesh, points):
    """(cell index, reference coords) per point.

    Candidates are ordered by cell-midpoint distance; the nearest 30 are the
    fast path, with a FULL all-cells fallback before declaring a miss (a
    far-from-midpoint sliver cell on stretched/imported meshes would
    otherwise be silently unreachable). Non-affine (distorted) quads/hexes
    are handled by the Newton inverse map in ``_try_cell``.
    """
    mids = mesh.cell_midpoints()
    cells_out, xi_out = [], []
    ref_mid = np.asarray(
        {
            "interval": [0.5],
            "triangle": [1 / 3, 1 / 3],
            "quad": [0.5, 0.5],
            "tetra": [0.25, 0.25, 0.25],
            "hex": [0.5, 0.5, 0.5],
        }[mesh.cell_type]
    )
    for p in np.atleast_2d(points):
        order = np.argsort(np.linalg.norm(mids - p, axis=1))
        found = False
        for c in list(order[:30]) + list(order[30:]):
            xi = _try_cell(mesh, c, p, ref_mid)
            if xi is not None:
                cells_out.append(c)
                xi_out.append(xi)
                found = True
                break
        if not found:
            msg = f"point {p} not found in mesh"
            raise ValueError(msg)
    return np.asarray(cells_out), np.asarray(xi_out)


class DisplacementSensor:
    """Samples the displacement field at fixed physical points.

    Usage::

        sensor = DisplacementSensor(V, [[0.5, 0.5, 0.5]])
        values = sensor(problem.u)     # [n_points, value_size]
    """

    def __init__(self, space: FunctionSpace, points):
        mesh = space.mesh
        cells, xis = _locate(mesh, points)
        elem, _ = tabulate_element(mesh.cell_type, space.degree, space.degree)
        # evaluate the space's shape functions at the reference coordinates
        from ..fem.elements import (
            _interval_basis,
            _tensor_basis,
            _tetra_basis,
            _triangle_basis,
        )

        basis = {
            "interval": lambda p: _interval_basis(space.degree, p)[0],
            "triangle": lambda p: _triangle_basis(space.degree, p)[0],
            "tetra": lambda p: _tetra_basis(space.degree, p)[0],
            "quad": lambda p: _tensor_basis(space.degree, p, 2)[0],
            "hex": lambda p: _tensor_basis(space.degree, p, 3)[0],
        }[mesh.cell_type]
        N = basis(np.asarray(xis))  # [P, n]
        self.dofs = jnp.asarray(space.dofmap[cells])  # [P, n, vs]
        self.weights = jnp.asarray(N)  # [P, n]

    def __call__(self, u: jnp.ndarray) -> jnp.ndarray:
        return jnp.einsum("pn,pnv->pv", self.weights, u[self.dofs])


class QPSensor:
    """Reads the quadrature point nearest to each physical point.

    Works on reference-parity [C, Q, k] fields (problem.stress_0) and on
    packed/grid fields reshaped to [k, Q, C]-compatible layouts.
    """

    def __init__(self, space: FunctionSpace, q_degree: int, points):
        from ..fem.kinematics import precompute_geometry

        geo = precompute_geometry(space, q_degree)
        qp = np.asarray(geo.qp_coords)  # [C, Q, g]
        flat = qp.reshape(-1, qp.shape[-1])
        pts = np.atleast_2d(points)
        idx = np.argmin(
            np.linalg.norm(flat[None] - pts[:, None], axis=2), axis=1
        )
        self.cell = idx // qp.shape[1]
        self.qp = idx % qp.shape[1]

    def __call__(self, field: jnp.ndarray) -> jnp.ndarray:
        """field [C, Q, k] -> [n_points, k]."""
        return field[self.cell, self.qp]
