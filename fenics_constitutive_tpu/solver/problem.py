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
from ..fem.kinematics import precompute_geometry
from ..fem.spaces import FunctionSpace
from ..models.interfaces import IncrSmallStrainModel
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
        engine: compute engine for the constitutive/assembly/Krylov cores.
            "packed" (default via "auto") runs the TPU-native SoA engines —
            the same kernels as the production PackedSimulation, including
            the gather-free structured fast path on box meshes — underneath
            the interactive Newton loop. "aos" keeps the reference-parity
            array-of-structures layouts (the correctness baseline the packed
            engines are pinned against in tests/solver/test_packed.py).
        preconditioner: None (Jacobi on the consistent tangent), "amg"
            (smoothed-aggregation elastic hierarchy, solver/amg.py — any
            mesh; the analog of handing the reference's NewtonSolver PETSc
            AMG options), or an explicit node-major callable M^-1.
        pc_options: extra kwargs for the preconditioner build — forwarded
            to ``solver.amg.build_amg`` (``aggregation``, ``strength_theta``,
            ``geometric_factor``, ``nu``, ...). The PackedSimulation analog
            is ``mg_options``.
        matmul_precision: MXU precision for the jitted cores ("highest" =
            true-f32 passes; needed for tight tolerances on f32 P2 — the
            TPU default multiplies f32 matmuls/convs in bfloat16; see
            packed_step.make_packed_step's docstring for the measurements).
    """

    def __init__(
        self,
        laws: IncrSmallStrainModel | list[tuple[IncrSmallStrainModel, np.ndarray]],
        space: FunctionSpace,
        bcs: list[DirichletBC],
        q_degree: int,
        del_t: float = 1.0,
        *,
        engine: str = "auto",
        preconditioner=None,
        pc_options: dict | None = None,
        matmul_precision: str | None = None,
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

        if engine == "auto":
            engine = "packed"
        assert engine in ("packed", "aos"), engine
        self.engine = engine
        if (
            engine == "aos"
            and mesh.cell_type in ("hex", "quad")
            and q_degree < 2
        ):
            # the packed engine warns in build_packed_problem; mirror it here
            import warnings

            warnings.warn(
                "q_degree=1 on hex/quad cells is 1-point reduced "
                "integration with hourglass (zero-energy) modes — the "
                "tangent is singular and displacements non-unique. Use "
                "q_degree>=2 unless reduced integration is intended.",
                stacklevel=2,
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
        self.ndofs = space.ndofs
        sdim = constraint.stress_strain_dim
        self._law_data_cache = None

        # --- common state ----------------------------------------------------
        self.u = jnp.zeros(self.ndofs, ftype)
        self.u_prev = jnp.zeros(self.ndofs, ftype)
        self._tangents = None
        self.f_ext = jnp.zeros(self.ndofs, ftype)  # external load (Neumann analog)

        # optional preconditioner: "amg" builds the smoothed-aggregation
        # elastic hierarchy (solver/amg.py — works on any mesh, the
        # PETSc-AMG analog of the reference's petsc_options); a callable is
        # used as-is (node-major M^-1). BC dof SETS are fixed at ctor (only
        # values mutate), so the free mask is a build-time constant.
        self._pc = None
        if preconditioner is not None:
            if callable(preconditioner):
                self._pc = preconditioner
            else:
                assert preconditioner == "amg", preconditioner
                from ..fem.bcs import combine_bcs
                from .amg import build_amg
                from .simulation import _estimate_moduli

                bc_dofs, _ = combine_bcs(bcs)
                free_np = np.ones(self.ndofs, bool)
                free_np[np.asarray(bc_dofs)] = False
                mu_e, kappa_e = _estimate_moduli(self._models[0])
                self._pc = build_amg(
                    space, mu_e, kappa_e, free_np, q_degree=q_degree,
                    **(pc_options or {}),
                )
        # pytree preconditioners (AMG) cross jit as ARGUMENTS so their level
        # arrays are not baked into the program as HLO constants; arbitrary
        # user callables stay closure-captured (they are not pytrees)
        from .amg import AmgPreconditioner

        if isinstance(self._pc, AmgPreconditioner):
            self._pc_arg, self._pc_closure = self._pc, None
        else:
            self._pc_arg, self._pc_closure = None, self._pc

        def _prec(fn):
            # bind the MXU precision at trace time (contexts wrap the trace)
            if matmul_precision is None:
                return fn

            def wrapped(*args, **kwargs):
                with jax.default_matmul_precision(matmul_precision):
                    return fn(*args, **kwargs)

            return wrapped

        if engine == "packed":
            from .packed_step import build_packed_problem

            geos, _, pstate = build_packed_problem(
                space, [(m, c) for m, c in zip(self._models, self._law_cells)],
                q_degree, ftype,
            )
            self._pk_geos = geos
            self._n_qp = int(geos[0].n_qp)
            self._stress_prev = pstate.stress  # committed, per-law packed
            self._stress_curr = pstate.stress  # trial
            self._histories = pstate.histories  # committed, per-law packed
            self._histories_trial = pstate.histories
            self._eval_assemble = jax.jit(_prec(self._eval_assemble_packed_impl))
        else:
            self._pk_geos = None
            self._n_qp = int(self._law_data[0][1].n_qp)
            shape = (mesh.num_cells, self._n_qp, sdim)
            self._stress_prev = jnp.zeros(shape, ftype)  # committed (stress_0)
            self._stress_curr = jnp.zeros(shape, ftype)  # trial (stress_1)
            self._histories = tuple(
                model.init_history(len(cells) * self._n_qp, ftype)
                for model, cells in zip(self._models, self._law_cells)
            )
            self._histories_trial = self._histories
            self._eval_assemble = jax.jit(_prec(self._eval_assemble_impl))
        self._newton_iter = jax.jit(
            _prec(self._newton_iter_impl),
            static_argnames=("cg_maxiter", "cg_flexible"),
        )

    # -- AoS tabulated data (observation surface; built lazily so the packed
    #    engine does not pay for [C, Q, n, g] gradient tables it never reads) --
    @property
    def _law_data(self):
        if self._law_data_cache is None:
            dofmap_full = self.space.dofmap  # [C, n, vs]
            self._law_data_cache = tuple(
                (
                    jnp.asarray(dofmap_full[cells]),
                    precompute_geometry(self.space, self.q_degree, cells),
                    jnp.asarray(cells),
                )
                for cells in self._law_cells
            )
        return self._law_data_cache

    @_law_data.setter
    def _law_data(self, value):  # parallel.shard_problem re-places these arrays
        self._law_data_cache = value

    # -- global QP weight field (cells in mesh order) ------------------------
    def _build_global_w(self) -> jnp.ndarray:
        w = jnp.zeros((self.space.mesh.num_cells, self._n_qp))
        for (_, geo, cells) in self._law_data:
            w = w.at[cells].set(geo.w_detJ)
        return w

    @property
    def _w_detJ_global(self) -> jnp.ndarray:
        if getattr(self, "_w_detJ_global_cache", None) is None:
            self._w_detJ_global_cache = self._build_global_w()
        return self._w_detJ_global_cache

    @_w_detJ_global.setter
    def _w_detJ_global(self, value) -> None:
        self._w_detJ_global_cache = value

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

    # -- packed-engine jitted cores (same kernels as solver/packed_step) -------
    def _eval_assemble_packed_impl(
        self, models, geos, u, u_prev, stress_prev, histories, f_ext, t, dt
    ):
        # the windowed engine's kinematics run on INTERNAL (RCM-permuted,
        # component-major) vectors — convert once per evaluation at the
        # boundary (the fast production path keeps whole Newton loops
        # internal; this is the interactive/compat surface)
        win = hasattr(geos[0], "to_internal")
        du = u - u_prev
        if win:
            du = geos[0].to_internal(du)
        r_acc = None
        stresses, tangents, hists = [], [], []
        for model, geo, sig0, h0 in zip(models, geos, stress_prev, histories):
            eps = geo.strain(du)
            s_new, tg, h_new = model.evaluate_packed(t, dt, eps, sig0, h0)
            rg = geo.residual(s_new)
            r_acc = rg if r_acc is None else r_acc + rg
            stresses.append(s_new)
            tangents.append(tg)
            hists.append(h_new)
        if win:
            r_acc = geos[0].from_internal(r_acc)
        return r_acc - f_ext, tuple(stresses), tuple(tangents), tuple(hists)

    def _linear_solve_packed_impl(
        self, geos, tangents, r, free, cg_rtol, cg_maxiter,
        cg_flexible=False, pc=None,
    ):
        # pc: pytree preconditioner passed as a jit ARGUMENT (AMG levels are
        # O(problem) arrays; closure capture would bake them as HLO
        # constants — see solver/amg.AmgPreconditioner). Non-pytree callables
        # stay on self._pc_closure.
        pc = pc if pc is not None else self._pc_closure
        # grid-major Krylov loop on the single-law structured fast path: the
        # node-major transposes happen once per Newton solve instead of twice
        # per CG iteration (identical to solver/packed_step.linear_solve)
        if len(geos) == 1 and hasattr(geos[0], "matvec_gm"):
            geo, tg = geos[0], tangents[0]
            r_gm = geo.to_grid_major(jnp.where(free, r, 0.0))
            free_gm = geo.to_grid_major(free)

            def matvec(v):
                vm = jnp.where(free_gm, v, 0.0)
                return jnp.where(free_gm, geo.matvec_gm(vm, tg), v)

            if pc is not None:
                def precond(rr):
                    rm = jnp.where(free_gm, rr, 0.0)
                    z = geo.to_grid_major(pc(geo.to_node_major(rm)))
                    return jnp.where(free_gm, z, rr)

                delta_gm, k = cg_solve(
                    matvec, r_gm, rtol=cg_rtol, maxiter=cg_maxiter,
                    precond=precond, flexible=cg_flexible,
                )
                return geo.to_node_major(delta_gm), k
            diag = jnp.where(free_gm, geo.jacobi_diag_gm(tg), 1.0)
            delta_gm, k = cg_solve(
                matvec, r_gm, diag, rtol=cg_rtol, maxiter=cg_maxiter,
                flexible=cg_flexible,
            )
            return geo.to_node_major(delta_gm), k

        if hasattr(geos[0], "to_internal"):
            # windowed engine: the whole CG loop runs on INTERNAL vectors
            # (one boundary permutation per solve, not two per iteration)
            g0 = geos[0]
            fi = g0.to_internal(free.astype(r.dtype)) == 1.0  # pads -> False
            b_int = g0.to_internal(jnp.where(free, r, 0.0))

            def matvec(v):
                vm = jnp.where(fi, v, 0.0)
                out = None
                for geo, tg in zip(geos, tangents):
                    mv = geo.matvec(vm, tg)
                    out = mv if out is None else out + mv
                return jnp.where(fi, out, v)

            if pc is not None:
                if getattr(pc, "internal_layout", False):
                    def precond(rr):
                        rm = jnp.where(fi, rr, 0.0)
                        return jnp.where(fi, pc(rm), rr)
                else:
                    def precond(rr):
                        rm = g0.from_internal(jnp.where(fi, rr, 0.0))
                        return jnp.where(fi, g0.to_internal(pc(rm)), rr)

                delta_int, k = cg_solve(
                    matvec, b_int, rtol=cg_rtol, maxiter=cg_maxiter,
                    precond=precond, flexible=cg_flexible,
                )
                return g0.from_internal(delta_int), k
            diag = None
            for geo, tg in zip(geos, tangents):
                d = geo.jacobi_diag(tg)
                diag = d if diag is None else diag + d
            diag = jnp.where(fi, diag, 1.0)
            delta_int, k = cg_solve(
                matvec, b_int, diag, rtol=cg_rtol, maxiter=cg_maxiter,
                flexible=cg_flexible,
            )
            return g0.from_internal(delta_int), k

        def matvec(v):
            vm = jnp.where(free, v, 0.0)
            out = jnp.zeros_like(v)
            for geo, tg in zip(geos, tangents):
                out = out + geo.matvec(vm, tg)
            return jnp.where(free, out, v)

        if pc is not None:
            def precond(rr):
                rm = jnp.where(free, rr, 0.0)
                return jnp.where(free, pc(rm), rr)

            return cg_solve(
                matvec, jnp.where(free, r, 0.0), rtol=cg_rtol,
                maxiter=cg_maxiter, precond=precond, flexible=cg_flexible,
            )
        diag = jnp.zeros_like(r)
        for geo, tg in zip(geos, tangents):
            diag = diag + geo.jacobi_diag(tg)
        diag = jnp.where(free, diag, 1.0)
        return cg_solve(
            matvec, jnp.where(free, r, 0.0), diag, rtol=cg_rtol,
            maxiter=cg_maxiter, flexible=cg_flexible,
        )

    def _linear_solve_impl(
        self, law_data, tangents, r, free, cg_rtol, cg_maxiter,
        cg_flexible=False, pc=None,
    ):
        pc = pc if pc is not None else self._pc_closure
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
        if pc is not None:
            def precond(rr):
                rm = jnp.where(free, rr, 0.0)
                return jnp.where(free, pc(rm), rr)

            return cg_solve(
                matvec, b, rtol=cg_rtol, maxiter=cg_maxiter,
                precond=precond, flexible=cg_flexible,
            )
        delta, k = cg_solve(
            matvec, b, diag, rtol=cg_rtol, maxiter=cg_maxiter,
            flexible=cg_flexible,
        )
        return delta, k

    def _newton_iter_impl(
        self, models, geom, u, u_prev, stress_prev, histories, f_ext, t, dt,
        r, tangents, r_norm, free, cg_rtol, cg_maxiter, cg_flexible=False,
        pc=None,
    ):
        """ONE full Newton iteration as ONE XLA program: linear solve +
        backtracking line search (fixed halving schedule under
        ``lax.while_loop``) + re-evaluation at the accepted iterate.

        The line search evaluates only as many candidates as it needs and
        never leaves the device — previously each halving was a separate
        eval_assemble dispatch with a host sync; now the common case (full
        step decreases the residual) costs exactly one eval_assemble and one
        linear solve per iteration, and the accepted candidate's evaluation
        is REUSED as the next iteration's residual/tangent instead of being
        recomputed at the loop top.
        """
        eng_solve = (
            self._linear_solve_packed_impl
            if self.engine == "packed"
            else self._linear_solve_impl
        )
        eng_eval = (
            self._eval_assemble_packed_impl
            if self.engine == "packed"
            else self._eval_assemble_impl
        )
        delta, k = eng_solve(
            geom, tangents, r, free, cg_rtol, cg_maxiter, cg_flexible, pc
        )

        def try_at(scale):
            u_try = u - scale * delta
            r_t, s_t, tg_t, h_t = eng_eval(
                models, geom, u_try, u_prev, stress_prev, histories,
                f_ext, t, dt,
            )
            rn_t = jnp.linalg.norm(jnp.where(free, r_t, 0.0))
            return u_try, r_t, rn_t, s_t, tg_t, h_t

        full = try_at(jnp.asarray(1.0, u.dtype))

        # halve while the candidate does not decrease ||r||, down to 1/8
        def cond(carry):
            scale, cand = carry
            return (cand[2] >= r_norm) & (scale > 0.2)

        def body(carry):
            scale, _ = carry
            scale = scale * 0.5
            return scale, try_at(scale)

        _, cand = jax.lax.while_loop(
            cond, body, (jnp.asarray(1.0, u.dtype), full)
        )
        # nothing helped -> keep the FULL Newton step (trust the model; the
        # reference has no safeguard at all and its gentle ramps never need
        # one, SURVEY §5.3)
        accepted = cand[2] < r_norm
        out = jax.tree.map(
            lambda a, b: jnp.where(accepted, a, b), cand, full
        )
        u_new, r_new, rn_new, s_new, tg_new, h_new = out
        return u_new, r_new, rn_new, s_new, tg_new, h_new, k

    # -- public API -----------------------------------------------------------
    def solve(
        self,
        *,
        max_iter: int = 50,
        rtol: float = 1e-12,
        atol: float = 1e-10,
        cg_rtol: float = 1e-14,
        cg_maxiter: int | None = None,
        cg_flexible: bool = False,
    ) -> tuple[int, bool]:
        """Newton solve for the current load/time step.

        Returns (n_newton_iterations, converged) like dolfinx NewtonSolver.solve
        (e.g. reference tests/models/test_plasticity.py:102).

        ``cg_flexible`` switches the inner CG to the Polak-Ribiere beta
        (f32 robustness; see solver/linear.cg_solve).
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

        # both engines share the Newton loop; only the jitted cores and the
        # geometry argument differ (packed SoA engines vs reference-parity AoS)
        geom = self._pk_geos if self.engine == "packed" else self._law_data

        # BC lift once up front: the Newton correction is zero on constrained
        # dofs (matvec is identity there, RHS zeroed), so u keeps satisfying
        # the BCs through every subsequent iterate
        u = self.u
        if len(bc_dofs):
            u = u.at[bc_dofs_j].set(bc_vals_j)
        r, stress_new, tangents, hists_new = self._eval_assemble(
            self._models, geom, u, self.u_prev, self._stress_prev,
            self._histories, self.f_ext, t, dt,
        )
        r_norm = float(jnp.linalg.norm(jnp.where(free, r, 0.0)))
        r0_norm = r_norm
        converged = r_norm <= max(atol, rtol * r0_norm)
        niter = 0
        # one host sync per iteration (the convergence test); the linear
        # solve, the backtracking line search, and the accepted iterate's
        # evaluation all run inside the single jitted _newton_iter program
        while not converged and niter < max_iter:
            u, r, rn, stress_new, tangents, hists_new, _k = self._newton_iter(
                self._models, geom, u, self.u_prev, self._stress_prev,
                self._histories, self.f_ext, t, dt, r, tangents,
                jnp.asarray(r_norm, u.dtype), free,
                cg_rtol, cg_maxiter=cg_maxiter, cg_flexible=cg_flexible,
                pc=self._pc_arg,
            )
            r_norm = float(rn)
            niter += 1
            converged = r_norm <= max(atol, rtol * r0_norm)

        self.u = u
        self._stress_curr = stress_new
        self._histories_trial = hists_new
        self._tangents = tangents
        # convergence record of THIS solve (A5 metrics; mirrors the packed
        # engine's per-step stats dict) — r_norm is the accepted residual, so
        # sharded-vs-serial runs can assert they satisfy the same equations
        self.last_stats = {
            "niter": niter,
            "converged": converged,
            "r_norm": r_norm,
            "r0_norm": r0_norm,
        }
        return niter, converged

    def update(self) -> None:
        """Commit displacement, stress and history; advance time
        (reference _solver.py:149-159)."""
        self.u_prev = self.u
        self._stress_prev = self._stress_curr
        self._histories = self._histories_trial
        self.sim_time.advance()

    # -- packed-layout -> reference-layout observation converters --------------
    def _pk_stress_to_cqs(self, stresses: tuple) -> jnp.ndarray:
        """Per-law packed stress fields -> global [C, Q, s] in mesh cell order."""
        sdim = self.constraint.stress_strain_dim
        out = jnp.zeros(
            (self.space.mesh.num_cells, self._n_qp, sdim), self.u.dtype
        )
        for geo, cells, s in zip(self._pk_geos, self._law_cells, stresses):
            if hasattr(geo, "extract_cells"):  # structured [s, Q, M]
                blk = jnp.transpose(geo.extract_cells(s), (2, 1, 0))
            else:  # packed [s, N], q-major N = q * C_l + c
                blk = jnp.transpose(
                    s.reshape(sdim, self._n_qp, len(cells)), (2, 1, 0)
                )
            out = out.at[jnp.asarray(cells)].set(blk)
        return out

    def _pk_hist_to_aos(self, model, geo, h):
        """Packed history {k: [d, *qp]} -> AoS {k: [N_l, ...entry_shape]}
        in the cell-major QP order the AoS engine stores."""
        if h is None:
            return None
        hd = model.history_dim
        out = {}
        for k, v in h.items():
            if hasattr(geo, "extract_cells"):
                v = geo.extract_cells(v)  # [d, Q, C]
                flat = jnp.transpose(v, (2, 1, 0)).reshape(-1, v.shape[0])
            else:
                d = v.shape[0]
                flat = jnp.transpose(
                    v.reshape(d, self._n_qp, -1), (2, 1, 0)
                ).reshape(-1, d)
            dim = hd[k]
            out[k] = (
                flat if isinstance(dim, int) else flat.reshape(flat.shape[0], *dim)
            )
        return out

    # -- observation / back-compat surface (reference _solver.py:161-218) -----
    @property
    def stress_0(self) -> jnp.ndarray:
        """Committed Mandel stress [C, Q, s]."""
        if self.engine == "packed":
            return self._pk_stress_to_cqs(self._stress_prev)
        return self._stress_prev

    @property
    def stress_1(self) -> jnp.ndarray:
        """Trial Mandel stress [C, Q, s] for the in-progress step."""
        if self.engine == "packed":
            return self._pk_stress_to_cqs(self._stress_curr)
        return self._stress_curr

    @property
    def _u(self) -> jnp.ndarray:
        return self.u

    @property
    def _u0(self) -> jnp.ndarray:
        return self.u_prev

    @property
    def _history_0(self):
        if self.engine == "packed":
            return [
                self._pk_hist_to_aos(m, g, h)
                for m, g, h in zip(self._models, self._pk_geos, self._histories)
            ]
        return [h for h in self._histories]

    @property
    def _history_1(self):
        if self.engine == "packed":
            return [
                self._pk_hist_to_aos(m, g, h)
                for m, g, h in zip(
                    self._models, self._pk_geos, self._histories_trial
                )
            ]
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
        """Per-law displacement-increment gradients at QPs (observation,
        [C_l, Q, g, g] per law)."""
        du = self.u - self.u_prev
        if self.engine == "packed":
            g = self.constraint.geometric_dim
            vs = self.space.value_size
            out = []
            for geo, cells in zip(self._pk_geos, self._law_cells):
                grad = geo.grad(du)  # [g, vs, N] (padded structured: N = lay*M)
                if hasattr(geo, "cell_index"):  # cell-at-origin footprint
                    lay = geo.qp_shape(1)[1]  # layout QP axis (6*Q for tets)
                    grad = geo.extract_cells(
                        grad.reshape(g * vs, lay, geo.M)
                    ).reshape(g, vs, geo.n_qp, len(cells))
                else:  # dense [.., Q*C] (packed / lattice engines)
                    grad = grad.reshape(g, vs, self._n_qp, len(cells))
                out.append(jnp.transpose(grad, (3, 2, 0, 1)))
            return out
        return [
            grad_at_qp(du, dofmap, geo) for (dofmap, geo, _) in self._law_data
        ]
