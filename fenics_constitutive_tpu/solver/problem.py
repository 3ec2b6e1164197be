"""IncrSmallStrainProblem: the incremental small-strain nonlinear problem.

Functional redesign of the reference's solver layer
(/root/reference/src/fenics_constitutive/solver/_solver.py:30-218 together with
_incrementalunknowns.py, _history.py, _lawonsubmesh.py, maps.py):

* the dolfinx NewtonSolver + PETSc stack becomes a Newton loop over ONE jitted
  XLA program per iteration: constitutive evaluation, residual assembly, Jacobi
  diagonal, and a matrix-free CG solve all fuse;
* stress/history double-buffering (stress_0/stress_1, history_0/history_1)
  becomes functional state: `solve()` produces trial state, `update()` commits
  it — the evaluate-from-committed-state invariant (reference _history.py:64-79,
  'reset_trial_state makes evaluation idempotent across Newton iterations')
  holds by construction because every evaluation starts from the committed
  pytree;
* submesh machinery (create_law_on_submesh/SpaceMap) becomes per-law cell-index
  arrays with gather/scatter on the global QP stress array;
* Dirichlet BCs follow dolfinx's lift-on-the-increment semantics: `u[dofs]`
  is set to the BC value before each solve and the Newton correction is
  constrained to zero there, so consecutive load steps solve only the delta
  (reference behavior exercised by tests/models/test_elasticity.py:75-87).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..fem.assembly import (
    assemble_jacobi_diag,
    assemble_residual,
    grad_at_qp,
    tangent_matvec,
)
from ..fem.bcs import DirichletBC, combine_bcs
from ..fem.kinematics import Geometry, precompute_geometry
from ..fem.spaces import FunctionSpace
from ..models.interfaces import IncrSmallStrainModel
from ..ops.mandel import Constraint
from .linear import cg_solve

__all__ = ["IncrSmallStrainProblem", "SimulationTime"]


@dataclass
class SimulationTime:
    """Reference _solver.py:21-27."""

    dt: float
    current: float = 0.0

    def advance(self) -> None:
        self.current += self.dt


class IncrSmallStrainProblem:
    """Incremental small-strain problem over a FunctionSpace.

    Args:
        laws: a single model (homogeneous domain) or a list of
            ``(model, cell_indices)`` covering all cells (multi-material).
        space: the displacement FunctionSpace (value_size == geometric_dim).
        bcs: Dirichlet boundary conditions.
        q_degree: quadrature degree.
        del_t: time increment (mutable via ``del_t``/``_del_t``).
    """

    def __init__(
        self,
        laws: IncrSmallStrainModel | list[tuple[IncrSmallStrainModel, np.ndarray]],
        space: FunctionSpace,
        bcs: list[DirichletBC],
        q_degree: int,
        del_t: float = 1.0,
    ):
        mesh = space.mesh
        if isinstance(laws, IncrSmallStrainModel):
            laws = [(laws, np.arange(mesh.num_cells, dtype=np.int32))]

        constraint = laws[0][0].constraint
        assert all(
            law.constraint == constraint for law, _ in laws
        ), "All laws must have the same constraint"
        assert space.value_size == constraint.geometric_dim, (
            f"space value_size {space.value_size} != geometric_dim "
            f"{constraint.geometric_dim} of {constraint}"
        )
        covered = np.concatenate([np.asarray(c) for _, c in laws])
        assert len(np.unique(covered)) == mesh.num_cells, (
            "law cell sets must partition the mesh"
        )

        self.space = space
        self.constraint = constraint
        self.q_degree = q_degree
        self.bcs = bcs
        self.sim_time = SimulationTime(dt=del_t)
        self._models = tuple(law for law, _ in laws)
        self._law_cells = tuple(
            np.asarray(c, np.int32) for _, c in laws
        )

        ftype = jnp.result_type(float)
        dofmap_full = space.dofmap  # [C, n, vs]
        self._law_data = tuple(
            (
                jnp.asarray(dofmap_full[cells]),
                precompute_geometry(space, q_degree, cells),
                jnp.asarray(cells),
            )
            for cells in self._law_cells
        )
        self._n_qp = int(self._law_data[0][1].n_qp)
        self.ndofs = space.ndofs
        sdim = constraint.stress_strain_dim

        # --- state ---------------------------------------------------------
        self.u = jnp.zeros(self.ndofs, ftype)
        self.u_prev = jnp.zeros(self.ndofs, ftype)
        shape = (mesh.num_cells, self._n_qp, sdim)
        self._stress_prev = jnp.zeros(shape, ftype)  # committed (stress_0)
        self._stress_curr = jnp.zeros(shape, ftype)  # trial (stress_1)
        self._histories = tuple(
            model.init_history(len(cells) * self._n_qp, ftype)
            for model, cells in zip(self._models, self._law_cells)
        )
        self._histories_trial = self._histories
        self._tangents = None
        self.f_ext = jnp.zeros(self.ndofs, ftype)  # external load (Neumann analog)

        # cache for the global quadrature weights (norms, postprocessing)
        self._w_detJ_global = self._build_global_w()

        self._eval_assemble = jax.jit(self._eval_assemble_impl)
        self._linear_solve = jax.jit(
            self._linear_solve_impl, static_argnames=("cg_maxiter",)
        )

    # -- global QP weight field (cells in mesh order) ------------------------
    def _build_global_w(self) -> jnp.ndarray:
        w = jnp.zeros((self.space.mesh.num_cells, self._n_qp))
        for (_, geo, cells) in self._law_data:
            w = w.at[cells].set(geo.w_detJ)
        return w

    @property
    def dxm(self) -> jnp.ndarray:
        """Quadrature measure weights [C, Q] (the analog of the reference's dxm)."""
        return self._w_detJ_global

    # -- jitted cores ---------------------------------------------------------
    def _eval_assemble_impl(
        self, models, law_data, u, u_prev, stress_prev, histories, f_ext, t, dt
    ):
        constraint = self.constraint
        sdim = constraint.stress_strain_dim
        g = constraint.geometric_dim
        du = u - u_prev
        r = -f_ext
        stress_new = stress_prev
        tangents = []
        hists_new = []
        for model, (dofmap, geo, cells), hist in zip(models, law_data, histories):
            grad = grad_at_qp(du, dofmap, geo)  # [Cl, Q, g, g]
            n_l, Q = grad.shape[0], grad.shape[1]
            stress_l = stress_prev[cells].reshape(n_l * Q, sdim)
            s_new, tg, h_new = model.evaluate(
                t, dt, grad.reshape(n_l * Q, g, g), stress_l, hist
            )
            s_new_block = s_new.reshape(n_l, Q, sdim)
            stress_new = stress_new.at[cells].set(s_new_block)
            r = r + assemble_residual(
                s_new_block, dofmap, geo, constraint, self.ndofs
            )
            tangents.append(tg.reshape(n_l, Q, sdim, sdim))
            hists_new.append(h_new)
        return r, stress_new, tuple(tangents), tuple(hists_new)

    def _linear_solve_impl(
        self, law_data, tangents, r, free, cg_rtol, cg_maxiter
    ):
        constraint = self.constraint
        diag = jnp.zeros_like(r)
        for (dofmap, geo, _), tg in zip(law_data, tangents):
            diag = diag + assemble_jacobi_diag(
                tg, dofmap, geo, constraint, self.ndofs
            )
        diag = jnp.where(free, diag, 1.0)

        def matvec(v):
            vm = jnp.where(free, v, 0.0)
            out = jnp.zeros_like(v)
            for (dofmap, geo, _), tg in zip(law_data, tangents):
                out = out + tangent_matvec(
                    vm, tg, dofmap, geo, constraint, self.ndofs
                )
            return jnp.where(free, out, v)

        b = jnp.where(free, r, 0.0)
        delta, k = cg_solve(
            matvec, b, diag, rtol=cg_rtol, maxiter=cg_maxiter
        )
        return delta, k

    # -- public API -----------------------------------------------------------
    def solve(
        self,
        *,
        max_iter: int = 50,
        rtol: float = 1e-12,
        atol: float = 1e-10,
        cg_rtol: float = 1e-14,
        cg_maxiter: int | None = None,
    ) -> tuple[int, bool]:
        """Newton solve for the current load/time step.

        Returns (n_newton_iterations, converged) like dolfinx NewtonSolver.solve
        (e.g. reference tests/models/test_plasticity.py:102).
        """
        bc_dofs, bc_vals = combine_bcs(self.bcs)
        bc_dofs_j = jnp.asarray(bc_dofs)
        bc_vals_j = jnp.asarray(bc_vals, self.u.dtype)
        free = jnp.ones(self.ndofs, bool)
        if len(bc_dofs):
            free = free.at[bc_dofs_j].set(False)

        cg_maxiter = cg_maxiter if cg_maxiter is not None else 4 * self.ndofs
        t = jnp.asarray(self.sim_time.current, self.u.dtype)
        dt = jnp.asarray(self.sim_time.dt, self.u.dtype)

        u = self.u
        converged = False
        niter = 0
        r0_norm = None
        for it in range(max_iter + 1):
            if len(bc_dofs):
                u = u.at[bc_dofs_j].set(bc_vals_j)
            r, stress_new, tangents, hists_new = self._eval_assemble(
                self._models,
                self._law_data,
                u,
                self.u_prev,
                self._stress_prev,
                self._histories,
                self.f_ext,
                t,
                dt,
            )
            r_norm = float(jnp.linalg.norm(jnp.where(free, r, 0.0)))
            if r0_norm is None:
                r0_norm = r_norm
            if r_norm <= max(atol, rtol * r0_norm):
                converged = True
                break
            if it == max_iter:
                break
            delta, _ = self._linear_solve(
                self._law_data, tangents, r, free, cg_rtol, cg_maxiter=cg_maxiter
            )
            # backtracking line search: full Newton steps can overshoot badly
            # on stiff hardening (the reference has no safeguard — its tests
            # only ramp loads gently); try halved steps until the residual
            # decreases, keeping the full step if nothing helps.
            u_candidate = None
            for scale in (1.0, 0.5, 0.25, 0.125):
                u_try = u - scale * delta
                r_try, *_ = self._eval_assemble(
                    self._models, self._law_data, u_try, self.u_prev,
                    self._stress_prev, self._histories, self.f_ext, t, dt,
                )
                r_try_norm = float(jnp.linalg.norm(jnp.where(free, r_try, 0.0)))
                if u_candidate is None:
                    u_candidate = u_try  # default: full step
                if r_try_norm < r_norm:
                    u_candidate = u_try
                    break
            u = u_candidate
            niter += 1

        self.u = u
        self._stress_curr = stress_new
        self._histories_trial = hists_new
        self._tangents = tangents
        return niter, converged

    def update(self) -> None:
        """Commit displacement, stress and history; advance time
        (reference _solver.py:149-159)."""
        self.u_prev = self.u
        self._stress_prev = self._stress_curr
        self._histories = self._histories_trial
        self.sim_time.advance()

    # -- observation / back-compat surface (reference _solver.py:161-218) -----
    @property
    def stress_0(self) -> jnp.ndarray:
        """Committed Mandel stress [C, Q, s]."""
        return self._stress_prev

    @property
    def stress_1(self) -> jnp.ndarray:
        """Trial Mandel stress [C, Q, s] for the in-progress step."""
        return self._stress_curr

    @property
    def _u(self) -> jnp.ndarray:
        return self.u

    @property
    def _u0(self) -> jnp.ndarray:
        return self.u_prev

    @property
    def _history_0(self):
        return [h for h in self._histories]

    @property
    def _history_1(self):
        return [h for h in self._histories_trial]

    @property
    def _time(self) -> float:
        return self.sim_time.current

    @_time.setter
    def _time(self, value: float) -> None:
        self.sim_time.current = value

    @property
    def del_t(self) -> float:
        return self.sim_time.dt

    @del_t.setter
    def del_t(self, value: float) -> None:
        self.sim_time.dt = value

    # reference-compatible alias
    _del_t = del_t

    @property
    def _del_grad_u(self):
        """Per-law displacement-increment gradients at QPs (observation)."""
        du = self.u - self.u_prev
        return [
            grad_at_qp(du, dofmap, geo) for (dofmap, geo, _) in self._law_data
        ]
