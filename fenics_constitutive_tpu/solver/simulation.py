"""PackedSimulation: reference-style driver over the production engines.

`IncrSmallStrainProblem` is the reference-parity interactive path (AoS
layouts, per-iteration convergence reporting, line search). For production
time stepping on the fast engines this wrapper provides the same ergonomics —
mutable BC values, `solve() -> (niter, converged)`, observation properties —
while each load step runs as ONE jitted XLA program (solver/packed_step) with
optional multigrid/BPX preconditioning and the Pallas matvec.

Example::

    sim = PackedSimulation(law, V, bcs, q_degree=2, preconditioner="bpx")
    for disp in np.linspace(0.0005, 0.05, 100):
        bc_move.value = disp
        niter, converged = sim.solve()
    sigma = sim.stress  # [C, Q, s], reference-compatible ordering
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..fem.bcs import combine_bcs
from ..fem.spaces import FunctionSpace
from .multigrid import build_multigrid
from .packed_step import PackedState, build_packed_problem, make_packed_step

__all__ = ["PackedSimulation"]


class PackedSimulation:
    """Production time stepper on the packed/structured engines.

    Args:
        laws: model or [(model, cells)] (same as IncrSmallStrainProblem).
        space: displacement FunctionSpace.
        bcs: Dirichlet BCs (values may be mutated between steps).
        q_degree: quadrature degree.
        del_t: time increment (mutable attribute).
        preconditioner: "auto" (default), None (Jacobi), "bpx", "vcycle",
            or "amg". The geometric options ("bpx"/"vcycle") need a
            box-structured mesh; "amg" (smoothed-aggregation, solver/amg.py)
            works on any mesh — the PETSc-AMG analog. "auto" resolves to
            "amg" on the windowed (general imported-mesh) engine — matching
            the reference's PETSc preconditioned-KSP default, and keeping
            the per-dispatch device time short (plain Jacobi needs ~150 CG
            iterations at 1M QPs; long dispatches are killed by the TPU
            worker — docs/performance.md) — and to None (Jacobi) on the
            structured engines, whose in-run-verified bench configs pass
            their preconditioner explicitly. Elastic moduli are taken from
            ``elastic_moduli`` or estimated from the model params.
        matvec_impl: "conv", "pallas", or "auto" (pallas on TPU backends for
            the 3D structured hot path).
        max_subdivisions: retry a failed load step as up to 2^k substeps with
            interpolated BCs/dt (0 = off; see solve()).
        f_ext: optional [ndofs] external (Neumann) load vector — the analog
            of the reference's ``R_form``-appended traction terms
            (/root/reference/src/fenics_constitutive/solver/_solver.py:46-52
            as exercised by tests/models/test_viscoelasticity.py:450-468).
            Build it with ``fem.facets.assemble_facet_traction``; mutate the
            ``f_ext`` attribute between steps for load-controlled paths.
        eval_impl: "conv" (XLA) or "pallas" (fused strain->return-map->
            divergence Mosaic kernel; VonMises3D on the degree-1 structured
            engine only — see ops/pallas_eval.py).
        matmul_precision: MXU precision for every matmul/conv in the step
            (e.g. "highest" = true-f32 passes). REQUIRED for tight
            tolerances on f32 P2 problems: the TPU's default f32 precision
            multiplies in bfloat16, flooring the achievable Newton residual
            at ~1.6e-4 relative; "highest" reaches 3.8e-7 at ~1.9x step
            cost (measured, scripts/ab_p2_precision.py + make_packed_step
            docstring).
        engine: "auto" | "windowed" | "gather" — general-mesh engine
            choice (box meshes keep their stencil fast paths); "auto" uses
            the windowed exchange engine (ops/windowed.py) above
            packed_step.WINDOWED_MIN_CELLS cells.
        newton/cg options are forwarded to make_packed_step.
    """

    def __init__(
        self,
        laws,
        space: FunctionSpace,
        bcs,
        q_degree: int,
        del_t: float = 1.0,
        *,
        preconditioner: str | None = "auto",
        matvec_impl: str = "auto",
        elastic_moduli: tuple[float, float] | None = None,
        newton_rtol: float = 1e-8,
        newton_atol: float = 1e-8,
        max_newton: int = 25,
        cg_rtol: float = 1e-6,
        cg_maxiter: int = 1000,
        cg_flexible: bool | None = None,
        cg_reduce_dtype=None,
        cg_fixed_iters: int | None = None,
        max_subdivisions: int = 0,
        dtype=None,
        mg_options: dict | None = None,
        eval_impl: str = "conv",
        f_ext=None,
        matmul_precision: str | None = None,
        engine: str = "auto",
    ):
        self.space = space
        self.bcs = bcs
        self.del_t = del_t
        from ..models.interfaces import IncrSmallStrainModel

        if isinstance(laws, IncrSmallStrainModel):
            self._law_cells = (
                np.arange(space.mesh.num_cells, dtype=np.int32),
            )
        else:
            self._law_cells = tuple(np.asarray(c, np.int32) for _, c in laws)
        geos, models, state = build_packed_problem(
            space, laws, q_degree, dtype, engine=engine
        )
        self._geos, self._models = geos, models
        self.state: PackedState = state
        self.f_ext = (
            jnp.zeros(space.ndofs, state.u.dtype)
            if f_ext is None
            else jnp.asarray(f_ext, state.u.dtype)
        )
        # last successfully COMMITTED external load, for substep
        # interpolation. Starts at ZERO regardless of the ctor's f_ext: the
        # committed state is the zero-stress/zero-displacement one, so a
        # failing FIRST step must ramp the load from zero, exactly like BC
        # values ramp from state0.u
        self._f_ext_committed = np.zeros(space.ndofs)
        geo = geos[0]
        structured = hasattr(geo, "matvec_gm") and len(geos) == 1
        # multi-material masked views of one grid: the grid-major fast loop
        # handles them too (make_packed_step), so preconditioners are built
        # whole-grid and applied grid-major
        structured_multi = len(geos) > 1 and all(
            hasattr(g, "matvec_gm") for g in geos
        )
        any_structured = structured or structured_multi

        if preconditioner == "auto":
            # the windowed engine's production default: AMG (see class
            # docstring); structured engines default to plain Jacobi-CG
            windowed_eng = all(hasattr(g, "to_internal") for g in geos)
            preconditioner = "amg" if windowed_eng else None

        if matvec_impl == "auto":
            on_tpu = jax.default_backend() not in ("cpu",)
            use_pallas = (
                structured
                and on_tpu
                and hasattr(geo, "offsets")  # degree-1 StructuredGeometry only
                and getattr(geo, "gdim", 0) == 3
                and geo.n_qp == 8
                and geo.vs == 3
            )
            matvec_impl = "pallas" if use_pallas else "conv"

        pc = None
        if preconditioner is not None:
            mu, kappa = (
                elastic_moduli
                if elastic_moduli is not None
                else _estimate_moduli(models[0])
            )
            bc_dofs, _ = combine_bcs(bcs)
            free = jnp.ones(space.ndofs, bool).at[jnp.asarray(bc_dofs)].set(False)
            # tuned V-cycle defaults (measured at the 1M-QP bench state,
            # scripts/ab_nu_fixed.py / ab_coarse.py: V(3,3) with lighter
            # coarse smoothing + direct coarsest solve beats V(2,2) on
            # wall-clock); override any of these via mg_options
            if mg_options is None:
                mg_options = {}
            if preconditioner == "vcycle":
                mg_options = {
                    "nu": 3, "nu_coarse": 2, "coarse_direct": True,
                    **mg_options,
                }
            if preconditioner == "amg":
                # smoothed-aggregation AMG: works on ANY mesh (the PETSc-AMG
                # analog); node-major apply, wrapped with the grid<->node
                # permutation when the step runs grid-major. On the windowed
                # engine the hierarchy is frozen into windowed BSR plans
                # sharing the engine's RCM ordering, so the V-cycle consumes
                # internal vectors directly (ops/windowed_bsr.py) — no ELL
                # gathers, no per-iteration permutations.
                from .amg import build_amg

                windowed_engine = all(
                    hasattr(g, "to_internal") for g in geos
                )
                amg = build_amg(
                    space, mu, kappa, np.asarray(free),
                    q_degree=q_degree,
                    spmv="windowed" if windowed_engine else "ell",
                    node_perm=(
                        geos[0].ex.perm if windowed_engine else None
                    ),
                    **mg_options,
                )
                if any_structured:
                    pc = lambda r: geo.to_grid_major(  # noqa: E731
                        amg(geo.to_node_major(r))
                    )
                else:
                    pc = amg
            elif structured and getattr(geo, "degree", 1) >= 2:
                # lattice engine: precondition with the refined-P1 hierarchy
                # on the SAME dof lattice (identical node ordering, so the
                # grid-major vectors coincide and no permutation is needed)
                from ..fem.mesh import unit_cube_mesh, unit_square_mesh
                from ..fem.spaces import FunctionSpace
                from ..ops.structured import build_structured_geometry

                refined = tuple(geo.degree * g for g in geo.grid)
                m1 = (
                    unit_cube_mesh(*refined, "hex")
                    if geo.gdim == 3
                    else unit_square_mesh(*refined, "quad")
                )
                V1 = FunctionSpace(m1, 1, space.value_size)
                geo1 = build_structured_geometry(
                    V1, 2, geo.constraint, geo.KEPS_c.dtype
                )
                mg = build_multigrid(geo1, mu, kappa, free, **mg_options)
                pc = {"bpx": mg.bpx, "vcycle": mg}[preconditioner]
            elif structured:
                fine_mv = None
                if matvec_impl == "pallas":
                    from ..ops.pallas_matvec import build_pallas_matvec

                    fine_mv = build_pallas_matvec(geo)
                mg = build_multigrid(
                    geo, mu, kappa, free, fine_matvec=fine_mv, **mg_options
                )
                pc = {"bpx": mg.bpx, "vcycle": mg}[preconditioner]
            elif (
                space.degree == 2
                and space.mesh.structured_shape is not None
                and space.mesh.cell_type in ("hex", "quad")
                and len(geos) == 1
            ):
                # degree-2 on a box mesh: the P1 hierarchy on the P2 dof
                # lattice preconditions the P2 operator (spectral equivalence)
                from .multigrid import build_p2_node_preconditioner

                pc = build_p2_node_preconditioner(
                    space, mu, kappa, free,
                    use_bpx=(preconditioner == "bpx"),
                    **mg_options,
                )
            elif structured_multi:
                # MULTI-MATERIAL box mesh (masked structured subset views):
                # ONE whole-grid elastic hierarchy (moduli estimated from
                # the first law — the preconditioner is an elastic surrogate
                # either way), applied grid-major by the shared fast loop
                from ..ops.structured import (
                    build_structured_geometry,
                    build_structured_tet_geometry,
                )

                if space.mesh.cell_type in ("tetra", "triangle"):
                    geo_full = build_structured_tet_geometry(
                        space, q_degree, geos[0].constraint, self.state.u.dtype
                    )
                else:
                    geo_full = build_structured_geometry(
                        space, q_degree, geos[0].constraint, self.state.u.dtype
                    )
                mg = build_multigrid(geo_full, mu, kappa, free, **mg_options)
                pc = {"bpx": mg.bpx, "vcycle": mg}[preconditioner]
            else:
                msg = (
                    "geometric multilevel preconditioning needs a box mesh "
                    "(P1 or P2); use preconditioner='amg' on unstructured "
                    "meshes"
                )
                raise AssertionError(msg)

        # f32 robustness defaults: round-off breaks exact conjugacy at deeply
        # plastic states (plain PCG stalls); flexible CG + f64 scalar
        # reductions restore convergence at negligible cost (TODO.md 'CG
        # robustness'; the dots are O(n) next to the O(n*stencil) matvec).
        if cg_flexible is None:
            cg_flexible = self.state.u.dtype == jnp.float32
        # f64 scalar reductions need x64 enabled (without it the cast is a
        # silent f32 no-op); flexible CG alone is dtype-independent.
        if (
            cg_reduce_dtype is None
            and self.state.u.dtype == jnp.float32
            and jax.config.jax_enable_x64
        ):
            cg_reduce_dtype = jnp.float64

        # NOTE on TPU f32 + the windowed engine: the engine's tiny-dim
        # contractions are unrolled into VPU multiply-adds precisely so the
        # MXU's default bf16 einsum precision never touches the CG operator
        # (einsum-based kinematics stalled the outer Newton at r/r0 ~1e-2;
        # measured on v5e, ops/windowed.py kinematics comment). No
        # matmul_precision override is needed for correctness on any engine.
        step_opts = dict(
            newton_rtol=newton_rtol,
            newton_atol=newton_atol,
            max_newton=max_newton,
            cg_rtol=cg_rtol,
            cg_maxiter=cg_maxiter,
            matvec_impl=matvec_impl,
            cg_flexible=cg_flexible,
            cg_reduce_dtype=cg_reduce_dtype,
            cg_fixed_iters=cg_fixed_iters,
            eval_impl=eval_impl,
            matmul_precision=matmul_precision,
        )
        if any_structured and preconditioner == "amg":
            # structured step with AMG: the folded geometry stays a (small)
            # closure constant, but the AMG levels are O(problem) arrays and
            # must cross jit as an ARGUMENT (same constant-bloat issue as
            # the gather path below); the grid<->node permutation wrapper is
            # rebuilt inside the trace around the argument
            def step(models, st, bc_dofs, bc_vals, f_ext, dt, pc_a):
                def wrapped(r):
                    return geo.to_grid_major(pc_a(geo.to_node_major(r)))

                inner = make_packed_step(
                    geos, preconditioner=wrapped, **step_opts
                )
                return inner(models, st, bc_dofs, bc_vals, f_ext, dt)

            self._operands = (amg,)  # the raw pytree; pc is its wrapper
        elif any_structured:
            # small folded-constant operators: closure capture is cheap, and
            # the Pallas kernels need concrete geometry at build time
            step = make_packed_step(geos, preconditioner=pc, **step_opts)
            self._operands = ()
        else:
            from .amg import AmgPreconditioner, WindowedAmgPreconditioner

            if pc is None or isinstance(
                pc, (AmgPreconditioner, WindowedAmgPreconditioner)
            ):
                # the gather-path geometry (per-QP dN/dofmaps) and AMG levels
                # are O(problem-size) arrays: build the step INSIDE the trace
                # so they cross jit as ARGUMENTS (pytrees) instead of being
                # baked in as HLO constants — constant capture bloats the
                # executable and overflows remote-compile request limits at
                # production sizes (solver/amg.AmgPreconditioner docstring)
                def step(models, st, bc_dofs, bc_vals, f_ext, dt, geos_a, pc_a):
                    pc_call = pc_a
                    if isinstance(pc_a, WindowedAmgPreconditioner):
                        pc_call = pc_a.wrap_internal(geos_a[0].ex.M_pad)
                        pc_call.internal_layout = True
                    inner = make_packed_step(
                        geos_a, preconditioner=pc_call, **step_opts
                    )
                    return inner(models, st, bc_dofs, bc_vals, f_ext, dt)

                self._operands = (geos, pc)
            else:
                # non-pytree preconditioner on a NON-structured geometry
                # (defensive: currently only reachable with a user-supplied
                # callable pc on the gather path — structured cases close
                # over their pc above): geometry still crosses as an
                # argument; the callable closes over its own constants
                def step(models, st, bc_dofs, bc_vals, f_ext, dt, geos_a):
                    inner = make_packed_step(
                        geos_a, preconditioner=pc, **step_opts
                    )
                    return inner(models, st, bc_dofs, bc_vals, f_ext, dt)

                self._operands = (geos,)
        # the TPU backend faults on lax.scan over the GATHER-path packed
        # step with an AMG preconditioner (every size; single-step jit and
        # the CPU backend run the identical program fine — see
        # scripts/repro_scan_amg_fault.py and TODO.md). solve_schedule
        # detects the configuration and falls back to a statically unrolled
        # step chain instead of faulting.
        self._scan_unsafe = (
            preconditioner == "amg"
            and not any_structured
            and not all(hasattr(g, "to_internal") for g in geos)
        )
        self._max_newton = max_newton
        self._newton_rtol = newton_rtol
        self._newton_atol = newton_atol
        self._max_subdivisions = max_subdivisions
        self._step = step
        self._jitted = jax.jit(step)
        self._jitted_schedule = None
        self.last_stats = None
        # windowed engine: state.u (and the step's f_ext argument) live in
        # the INTERNAL RCM layout — steps pay no boundary permutations; the
        # public surfaces (.u, substep bc extraction, f_ext) convert here
        self._win_internal = all(hasattr(g, "to_internal") for g in geos)
        if self._win_internal:
            self._to_int = jax.jit(geos[0].to_internal)
            self._from_int = jax.jit(geos[0].from_internal)
            self._fext_cache = (None, None)

    def _f_ext_int(self, f_ext):
        """Internal-layout f_ext, cached on the source array's identity
        (f_ext rarely changes between steps; the conversion is a scalarized
        ~8 ms permutation at 1M QPs)."""
        src, cached = self._fext_cache
        if src is f_ext:
            return cached
        out = self._to_int(f_ext)
        self._fext_cache = (f_ext, out)
        return out

    def _attempt(self, bc_dofs, bc_vals, f_ext, dt) -> tuple[int, bool]:
        """Run one committed step; returns (niter, converged-and-finite)."""
        if self._win_internal:
            f_ext = self._f_ext_int(f_ext)
        self.state, stats = self._jitted(
            self._models, self.state, bc_dofs, bc_vals, f_ext, dt,
            *self._operands,
        )
        self.last_stats = {k: np.asarray(v) for k, v in stats.items()}
        niter = int(stats["newton_iters"])
        # Convergence = the residual tolerance actually held (dolfinx
        # NewtonSolver semantics the reference relies on), NOT "stopped before
        # the iteration cap": a step converging exactly on the max_newton-th
        # iteration is converged; a capped step with a large residual is not.
        r_norm = float(stats["r_norm"])
        converged = r_norm <= max(
            self._newton_atol, self._newton_rtol * float(stats["r0_norm"])
        )
        # NaN-poisoned constitutive state (diverged local return map) or a
        # non-finite residual also fails the step
        finite = np.isfinite(r_norm) and bool(np.isfinite(self.state.u).all())
        return niter, converged and finite

    def solve(self) -> tuple[int, bool]:
        """One load/time step: solve + commit. Returns (niter, converged).

        With ``max_subdivisions > 0``, a failed step (Newton cap hit or a
        NaN-poisoned local return map) is retried as 2, 4, ..., 2^k substeps
        with linearly interpolated BC values, external loads, and dt —
        adaptive substepping the reference lacks entirely (its models raise
        RuntimeError / panic on local divergence, SURVEY §5.3). On total
        failure the committed state is restored and (niter, False) is
        returned.
        """
        bc_dofs_np, bc_vals_np = combine_bcs(self.bcs)
        bc_dofs = jnp.asarray(bc_dofs_np)
        dtype = self.state.u.dtype
        f_ext = jnp.asarray(self.f_ext, dtype)
        state0 = self.state

        niter, ok = self._attempt(
            bc_dofs, jnp.asarray(bc_vals_np, dtype), f_ext,
            jnp.asarray(self.del_t, dtype),
        )
        if ok or self._max_subdivisions == 0:
            if not ok:
                self.state = state0
            else:
                self._f_ext_committed = np.asarray(f_ext)
            return niter, ok

        if not len(bc_dofs_np):
            start_vals = bc_vals_np
        elif self._win_internal:
            # committed u is internal: index via the internal bc slots
            g0 = self._geos[0]
            node, comp = bc_dofs_np // g0.vs, bc_dofs_np % g0.vs
            idx = comp * g0.ex.M_pad + g0.ex.perm[node]
            start_vals = np.asarray(state0.u)[idx]
        else:
            start_vals = np.asarray(state0.u)[bc_dofs_np]
        f_target = np.asarray(f_ext)
        f_start = self._f_ext_committed
        for level in range(1, self._max_subdivisions + 1):
            n_sub = 2**level
            self.state = state0
            total = 0
            ok = True
            for k in range(1, n_sub + 1):
                frac = k / n_sub
                vals_k = start_vals + frac * (bc_vals_np - start_vals)
                f_k = f_start + frac * (f_target - f_start)
                niter, ok = self._attempt(
                    bc_dofs, jnp.asarray(vals_k, dtype), jnp.asarray(f_k, dtype),
                    jnp.asarray(self.del_t / n_sub, dtype),
                )
                total += niter
                if not ok:
                    break
            if ok:
                self._f_ext_committed = f_target
                return total, True
        self.state = state0
        return niter, False

    def solve_schedule(self, bc_values, dts=None, f_ext_scales=None) -> dict:
        """Run a whole load schedule device-side in ONE dispatch.

        The reference's user loop re-enters Python (and re-crosses the
        host<->device boundary) every load step (SURVEY §3.4); on TPU that
        dispatch latency can rival the step itself. This runs all K steps as
        a single ``lax.scan``-compiled XLA program and commits the final
        state — the production pattern for long load paths.

        Args:
            bc_values: [K, n_bc] Dirichlet values per step, in the
                ``combine_bcs(self.bcs)`` dof ordering (build it with e.g.
                ``np.linspace`` ramps of each BC's value), or a callable
                ``f(step_index) -> [n_bc]`` evaluated host-side for K from
                ``dts``.
            dts: optional [K] time increments (default: ``del_t`` each).
            f_ext_scales: optional per-step external loads. Either a [K]
                array of scalars multiplying ``self.f_ext`` (traction ramps;
                constant load = ``np.ones(K)``), or a full [K, ndofs] array
                of per-step load vectors (``self.f_ext`` is then ignored).
                Default: ``self.f_ext`` applied unscaled at every step — the
                analog of the reference's constant Neumann ``R_form`` term
                (reference test_viscoelasticity.py:450-468).

        Returns:
            dict of per-step stat arrays: ``newton_iters`` [K],
            ``r_norm`` [K], ``r0_norm`` [K], ``cg_iters_last`` [K],
            ``converged`` [K] (bool, residual-tolerance semantics of
            ``solve()``). No adaptive substepping — a failed step simply
            reports unconverged; use ``solve()`` for the recovery path.
        """
        bc_dofs_np, _ = combine_bcs(self.bcs)
        dtype = self.state.u.dtype
        if callable(bc_values):
            assert dts is not None, "callable bc_values needs dts for K"
            bc_values = np.stack([bc_values(i) for i in range(len(dts))])
        vals = jnp.asarray(bc_values, dtype)
        K = vals.shape[0]
        if K == 0:
            return {
                "newton_iters": np.zeros(0, np.int32),
                "r_norm": np.zeros(0), "r0_norm": np.zeros(0),
                "cg_iters_last": np.zeros(0, np.int32),
                "converged": np.zeros(0, bool),
            }
        dts_j = (
            jnp.full((K,), self.del_t, dtype)
            if dts is None
            else jnp.asarray(dts, dtype)
        )
        bc_dofs = jnp.asarray(bc_dofs_np)
        if f_ext_scales is None:
            f_base = jnp.asarray(self.f_ext, dtype)
            f_scales = jnp.ones((K,), dtype)
        else:
            f_scales = jnp.asarray(f_ext_scales, dtype)
            if f_scales.ndim == 1:  # [K] scalars scaling self.f_ext
                f_base = jnp.asarray(self.f_ext, dtype)
            elif f_scales.ndim == 2:  # [K, ndofs] full per-step vectors
                assert f_scales.shape == (K, self.space.ndofs), f_scales.shape
                f_base = jnp.ones((self.space.ndofs,), dtype)
            else:
                msg = f"f_ext_scales must be [K] or [K, ndofs], got {f_scales.shape}"
                raise ValueError(msg)
        assert f_scales.shape[0] == K, (f_scales.shape, K)
        if self._win_internal:
            # the windowed step consumes INTERNAL f_ext vectors
            if f_scales.ndim == 2:
                f_scales = jax.vmap(self._geos[0].to_internal)(f_scales)
                f_base = jnp.ones((self._geos[0].ndofs_int,), dtype)
            else:
                f_base = self._f_ext_int(f_base)

        unroll = self._scan_unsafe and jax.default_backend() not in ("cpu",)
        if self._jitted_schedule is None or unroll:
            step = self._step
            models = self._models

            def body_of(bc_dofs, f_base, operands_):
                def body(st, xs):
                    v, dt, fs = xs
                    s2, stats = step(
                        models, st, bc_dofs, v, f_base * fs, dt, *operands_
                    )
                    return s2, (
                        stats["newton_iters"], stats["r_norm"],
                        stats["r0_norm"], stats["cg_iters_last"],
                    )

                return body

            if unroll:
                # statically unrolled K-step chain: same program as the scan
                # but without the lax.scan wrapper that faults the TPU
                # backend on the gather+AMG configuration (recompiles per K)
                def run(state, vals, dts_j, bc_dofs, f_base, f_scales,
                        *operands_):
                    body = body_of(bc_dofs, f_base, operands_)
                    st, outs = state, []
                    for i in range(vals.shape[0]):
                        st, o = body(
                            st, (vals[i], dts_j[i], f_scales[i])
                        )
                        outs.append(o)
                    stacked = tuple(
                        jnp.stack([o[k] for o in outs])
                        for k in range(len(outs[0]))
                    )
                    return st, stacked

                self._jitted_schedule = jax.jit(run)
            else:
                def run(state, vals, dts_j, bc_dofs, f_base, f_scales,
                        *operands_):
                    return jax.lax.scan(
                        body_of(bc_dofs, f_base, operands_),
                        state,
                        (vals, dts_j, f_scales),
                    )

                self._jitted_schedule = jax.jit(run)

        self.state, (ni, rn, r0, cg) = self._jitted_schedule(
            self.state, vals, dts_j, bc_dofs, f_base, f_scales,
            *self._operands,
        )
        self._f_ext_committed = np.asarray(f_base * f_scales[-1])
        rn = np.asarray(rn)
        r0 = np.asarray(r0)
        conv = rn <= np.maximum(self._newton_atol, self._newton_rtol * r0)
        conv &= np.isfinite(rn)
        stats = {
            "newton_iters": np.asarray(ni),
            "r_norm": rn,
            "r0_norm": r0,
            "cg_iters_last": np.asarray(cg),
            "converged": conv,
        }
        self.last_stats = {k: v[-1] for k, v in stats.items()}
        return stats

    # -- checkpoint / resume ----------------------------------------------------
    # The committed PackedState fully determines the next step (the
    # reference's u_prev/stress_0/history_0 triple, SURVEY §5.4). The
    # registered-dataclass state is exposed as a PLAIN pytree here so
    # utils.save_checkpoint/load_checkpoint round-trip it:
    #     save_checkpoint(path, sim.state_dict())
    #     sim.load_state_dict(load_checkpoint(path))
    # Same-engine restore only: the windowed engine's u is its internal
    # RCM vector and QP fields live in plan-slot order.

    def state_dict(self) -> dict:
        return {
            "u": self.state.u,
            "stress": tuple(self.state.stress),
            "histories": tuple(self.state.histories),
            "t": self.state.t,
        }

    def load_state_dict(self, st: dict) -> None:
        from .packed_step import PackedState

        def restore(node):
            if node is None:
                return None
            if isinstance(node, dict):
                if node and all(k.isdigit() for k in node):
                    # load_checkpoint returns tuples as index-keyed dicts
                    return tuple(
                        restore(node[str(i)]) for i in range(len(node))
                    )
                return {k: restore(v) for k, v in node.items()}
            return jnp.asarray(node)

        self.state = PackedState(
            u=jnp.asarray(st["u"]),
            stress=restore(st["stress"]),
            histories=restore(st["histories"]),
            t=jnp.asarray(st["t"]),
        )

    @property
    def u(self) -> jnp.ndarray:
        """Displacements in the PUBLIC node-major dof order. (The windowed
        engine keeps ``state.u`` in its internal RCM layout so steps pay no
        boundary permutations; this property converts on observation.)"""
        if self._win_internal:
            return self._from_int(self.state.u)
        return self.state.u

    @property
    def stress(self) -> np.ndarray:
        """Committed Mandel stress in reference-compatible [C, Q, s] order
        (all laws scattered into mesh cell order)."""
        sdim = self._geos[0].constraint.stress_strain_dim
        n_qp = self._geos[0].n_qp
        out = np.zeros((self.space.mesh.num_cells, n_qp, sdim))
        for geo, cells, s in zip(self._geos, self._law_cells, self.state.stress):
            if hasattr(geo, "extract_cells"):  # structured [s, Q, M]
                blk = np.asarray(geo.extract_cells(s)).transpose(2, 1, 0)
            else:  # packed [s, N], q-major
                blk = (
                    np.asarray(s)
                    .reshape(sdim, geo.n_qp, geo.n_cells)
                    .transpose(2, 1, 0)
                )
            out[cells] = blk
        return out

    @property
    def histories(self):
        return self.state.histories

    @property
    def time(self) -> float:
        return float(self.state.t)


def _estimate_moduli(model) -> tuple[float, float]:
    """(mu, kappa) for the multilevel hierarchy from common parameter names."""
    p = getattr(model, "params", {})

    def get(*names):
        for n in names:
            if n in p:
                return float(np.asarray(p[n]).reshape(()))
        return None

    mu = get("p_mu", "mu")
    kappa = get("p_ka", "kappa")
    if mu is None or kappa is None:
        E, nu = get("E0", "E"), get("nu")
        if E is not None and nu is not None:
            mu = E / (2 * (1 + nu))
            kappa = E / (3 * (1 - 2 * nu))
    if mu is None or kappa is None:
        msg = "cannot infer elastic moduli; pass elastic_moduli=(mu, kappa)"
        raise ValueError(msg)
    return mu, kappa
