"""Fully-jitted Newton-Krylov load step on the packed (SoA) engine.

Same semantics as solver/step.py (one XLA program per load step, Newton via
lax.while_loop, Jacobi-CG linear solves) but on TPU-native layouts: stress
[s, N], history [h, N], factored tangents. This is the production/benchmark
path; solver/problem.py remains the reference-parity interactive path.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.packed import build_packed_geometry
from ..ops.structured import build_structured_geometry
from . import linear

# ensure the packed kernels are attached to the model classes
from ..models import packed_models as _packed_models  # noqa: F401

__all__ = ["PackedState", "build_packed_problem", "make_packed_step"]


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["u", "stress", "histories", "t"],
    meta_fields=[],
)
@dataclass(frozen=True)
class PackedState:
    u: jnp.ndarray
    stress: tuple  # per-law [s, N_l]
    histories: tuple  # per-law dict of [h, N_l] (or None)
    t: jnp.ndarray


#: general (non-box) meshes at least this many cells default to the windowed
#: engine (ops/windowed.py) — below it the plan padding outweighs the gather
#: tax and problems are interactive-scale anyway
WINDOWED_MIN_CELLS = 4096


def build_packed_problem(space, laws, q_degree, dtype=None, engine="auto"):
    """Tabulate packed geometry + initial state for (model, cells) laws.

    Returns (geos, models, state0).

    ``engine``: "auto" picks the structured stencil engines on box meshes,
    the windowed exchange engine (ops/windowed.py) on large general meshes,
    and the gather engine otherwise; "windowed"/"gather" force the general-
    mesh engine choice (box meshes keep their stencil fast paths).
    """
    from ..models.interfaces import IncrSmallStrainModel

    if engine not in ("auto", "windowed", "gather"):
        msg = f"engine must be 'auto', 'windowed' or 'gather', got {engine!r}"
        raise ValueError(msg)
    dtype = dtype or jnp.result_type(float)
    if isinstance(laws, IncrSmallStrainModel):
        laws = [(laws, np.arange(space.mesh.num_cells, dtype=np.int32))]
    constraint = laws[0][0].constraint

    if space.mesh.cell_type in ("hex", "quad") and q_degree < 2:
        import warnings

        warnings.warn(
            "q_degree=1 on hex/quad cells is 1-point reduced integration: "
            "the element stiffness has hourglass (zero-energy) modes, so "
            "the tangent is singular — displacements are non-unique and a "
            "tightly-converged Krylov solve can amplify round-off along the "
            "null space into diverging steps. Use q_degree>=2 (full "
            "integration) unless you know you want reduced integration.",
            stacklevel=2,
        )

    _full_structured = [None]  # built once, shared by every law's view
    _shared_perm = [None]  # whole-mesh RCM shared across windowed laws

    def make_geo(cells):
        whole_mesh = len(cells) == space.mesh.num_cells
        box = space.mesh.structured_shape is not None
        if box and space.degree == 1 and space.mesh.cell_type in ("hex", "quad"):
            # gather-free stencil fast path for box-structured grids; a law
            # on a cell SUBSET keeps it via a masked view — dense sweeps with
            # the other laws' cell origins zeroed beat falling back to the
            # serialized-gather engine (restrict_structured_geometry)
            if _full_structured[0] is None:
                _full_structured[0] = build_structured_geometry(
                    space, q_degree, constraint, dtype
                )
            geo = _full_structured[0]
            if whole_mesh:
                return geo
            from ..ops.structured import restrict_structured_geometry

            return restrict_structured_geometry(geo, cells)
        if (
            box
            and space.degree == 1
            and space.mesh.cell_type in ("tetra", "triangle")
        ):
            # Kuhn tet box meshes fold onto the hex corner channels — zero
            # gathers (the gather engine measures ~29 us/QP on TPU; see
            # ops.structured.StructuredTetGeometry). A law on a tet SUBSET
            # keeps the engine via a per-class ownership mask
            # (restrict_structured_tet_geometry).
            from ..ops.structured import (
                build_structured_tet_geometry,
                restrict_structured_tet_geometry,
            )

            if _full_structured[0] is None:
                _full_structured[0] = build_structured_tet_geometry(
                    space, q_degree, constraint, dtype
                )
            geo = _full_structured[0]
            if whole_mesh:
                return geo
            return restrict_structured_tet_geometry(geo, cells)
        if (
            whole_mesh
            and box
            and space.degree == 2
            and space.mesh.cell_type in ("quad", "hex")
        ):
            # degree-2 lattice stencil engine: strided slices, no gathers
            from ..ops.structured import build_lattice_geometry

            return build_lattice_geometry(space, q_degree, constraint, dtype)
        use_windowed = engine == "windowed" or (
            engine == "auto"
            and space.mesh.num_cells >= WINDOWED_MIN_CELLS
            and space.mesh.cell_type != "interval"
        )
        if use_windowed:
            # general unstructured meshes: windowed exchange engine — the
            # per-cell dof traffic becomes MXU one-hot contractions instead
            # of ~29 us/QP scalarized gathers (ops/windowed.py)
            from ..ops.windowed import (
                build_windowed_geometry,
                reverse_cuthill_mckee,
            )

            if _shared_perm[0] is None:
                _shared_perm[0] = reverse_cuthill_mckee(
                    space.cell_dof_nodes, space.n_dof_nodes
                )
            return build_windowed_geometry(
                space, q_degree, constraint, cells, dtype,
                perm=_shared_perm[0],
            )
        return build_packed_geometry(space, q_degree, constraint, cells, dtype)

    geos = tuple(make_geo(np.asarray(cells)) for _, cells in laws)
    models = tuple(m for m, _ in laws)
    sdim = constraint.stress_strain_dim
    stress = tuple(jnp.zeros(g.qp_shape(sdim), dtype) for g in geos)
    def _flat(d):  # matrix-valued entries (rows, cols) store flattened packed
        return d if isinstance(d, int) else int(np.prod(d))

    histories = tuple(
        None
        if m.history_dim is None
        else {
            k: jnp.zeros(g.qp_shape(_flat(d)), dtype)
            for k, d in m.history_dim.items()
        }
        for m, g in zip(models, geos)
    )
    # the windowed engine's state.u lives in the INTERNAL (RCM-permuted,
    # component-major, tile-padded) layout so the step pays ZERO boundary
    # permutations (the node<->internal gathers are scalarized ~8 ms each at
    # 1M QPs); PackedSimulation converts at its public boundary (.u) and
    # make_packed_step's windowed path documents the contract
    n_u = geos[0].ndofs_int if hasattr(geos[0], "to_internal") else space.ndofs
    state = PackedState(
        u=jnp.zeros(n_u, dtype),
        stress=stress,
        histories=histories,
        t=jnp.asarray(0.0, dtype),
    )
    return geos, models, state


def make_packed_step(
    geos: tuple,
    *,
    newton_rtol: float = 1e-12,
    newton_atol: float = 1e-10,
    max_newton: int = 25,
    cg_rtol: float = 1e-14,
    cg_maxiter: int = 1000,
    preconditioner=None,
    matvec_impl: str = "conv",
    cg_flexible: bool = False,
    cg_reduce_dtype=None,
    precond_dtype=None,
    cg_fixed_iters: int | None = None,
    eval_impl: str = "conv",
    matmul_precision: str | None = None,
):
    """Build ``step(models, state, bc_dofs, bc_vals, f_ext, dt) -> (state', stats)``.

    ``preconditioner``: optional callable M^-1 (e.g. a
    solver.multigrid.MultigridPreconditioner) replacing Jacobi in the CG.
    ``matvec_impl``: "conv" (XLA conv engine, any backend) or "pallas" (the
    fused Mosaic kernel, TPU-compiled; ~6x faster CG iterations on v5e —
    requires the single-law 3D structured hot path and isotropic factored
    tangents).
    ``cg_flexible``/``cg_reduce_dtype``: flexible (Polak-Ribiere) CG and
    higher-precision scalar reductions — the f32 robustness options of
    solver/linear.cg_solve.
    ``precond_dtype``: run the preconditioner apply in this dtype (e.g.
    ``jnp.bfloat16`` — every level op follows its input dtype, so one cast at
    the boundary halves the HBM traffic of the dominant V-cycle cost; CG's
    own matvec/residual stay in the working dtype, so convergence is still
    measured in full precision). A reduced-precision M is slightly inexact
    as a linear operator; pair with ``cg_flexible=True``.
    (Adapting the hierarchy's moduli per Newton iteration from the mean
    consistent tangent was measured and rejected: no gain at the 1M-QP bench
    state, and with exponential-hardening softening the mean beta collapses,
    degenerating the cycle — CG hit its iteration cap. The elastic hierarchy
    with build-time moduli is the robust choice; see MultigridPreconditioner
    .prepared for the equivalent warning about true-tangent smoothing.)

    ``matmul_precision``: per-step override of the TPU MXU precision for
    every matmul/conv traced inside the step (``"highest"`` = true-f32
    passes). ROOT CAUSE of the r2 "f32 P2 floor": XLA's DEFAULT f32
    einsum/conv precision on TPU uses bfloat16 multiplies, so every matvec
    perturbs the operator at bf16 epsilon and Krylov can never push the
    true residual below ~eps_bf16 x cond. Measured on the 32^3 P2 problem
    (scripts/ab_p2_precision.py, v5e): default floors at r/r0 1.6e-4,
    "highest" reaches 3.8e-7 in PURE f32 at 1.9x the step cost (104 ->
    193 ms). This also explains why f64 residual ASSEMBLY alone did not
    help in r2 — the correction, not the residual, carried the bf16 error.
    The P1 bench path keeps the default (its verified residual envelope
    passes without it).
    """
    if eval_impl not in ("conv", "pallas"):
        msg = f"eval_impl must be 'conv' or 'pallas', got {eval_impl!r}"
        raise ValueError(msg)
    if matvec_impl not in ("conv", "pallas"):
        msg = f"matvec_impl must be 'conv' or 'pallas', got {matvec_impl!r}"
        raise ValueError(msg)
    ndofs = geos[0].ndofs
    constraint = geos[0].constraint

    def _with_precision(fn):
        if matmul_precision is None:
            return fn

        def wrapped(*args, **kwargs):
            with jax.default_matmul_precision(matmul_precision):
                return fn(*args, **kwargs)

        return wrapped

    cg_opts = dict(
        flexible=cg_flexible, reduce_dtype=cg_reduce_dtype,
        fixed_iters=cg_fixed_iters,
    )

    def eval_assemble(models, u, state: PackedState, f_ext, dt):
        du = u - state.u
        r = -f_ext
        stresses, tangents, hists = [], [], []
        for model, geo, sig0, h0 in zip(models, geos, state.stress, state.histories):
            eps = geo.strain(du)
            s_new, tg, h_new = model.evaluate_packed(state.t, dt, eps, sig0, h0)
            r = r + geo.residual(s_new)
            stresses.append(s_new)
            tangents.append(tg)
            hists.append(h_new)
        return r, tuple(stresses), tuple(tangents), tuple(hists)

    # -- windowed step (general unstructured meshes) ---------------------------
    # The whole Newton loop runs on the INTERNAL (RCM-permuted, component-
    # major, tile-padded) dof vectors of ops/windowed.WindowedGeometry: the
    # node<->internal permutation happens once at the step boundary, and the
    # CG loop touches only windowed-exchange ops (MXU one-hot contractions).
    windowed = all(hasattr(g, "to_internal") for g in geos)
    if windowed:
        geo0 = geos[0]
        assert len({(g.ex.M_pad, g.vs) for g in geos}) == 1, (
            "multi-law windowed geometries must share the mesh RCM plan "
            "(build them through build_packed_problem)"
        )

        def eval_assemble_win(models, u, u_prev, state, f_ext_int, dt):
            du = u - u_prev
            r = -f_ext_int
            ss, tgs, hh = [], [], []
            for model, geo, sig0, h0 in zip(
                models, geos, state.stress, state.histories
            ):
                eps = geo.strain(du)
                s_new, tg, h_new = model.evaluate_packed(
                    state.t, dt, eps, sig0, h0
                )
                r = r + geo.residual(s_new)
                ss.append(s_new)
                tgs.append(tg)
                hh.append(h_new)
            return r, tuple(ss), tuple(tgs), tuple(hh)

        def solve_win(tgs, r, free):
            r = jnp.where(free, r, 0.0)

            def matvec(v):
                vm = jnp.where(free, v, 0.0)
                out = None
                for g, tg in zip(geos, tgs):
                    mv = g.matvec(vm, tg)
                    out = mv if out is None else out + mv
                return jnp.where(free, out, v)

            if preconditioner is not None:
                # preconditioners are node-major callables (e.g. ELL AMG),
                # wrapped with the boundary transforms — unless they declare
                # internal_layout (the windowed AMG built on the engine's
                # RCM ordering consumes internal vectors directly)
                if getattr(preconditioner, "internal_layout", False):
                    def precond(rr):
                        rm = jnp.where(free, rr, 0.0)
                        if precond_dtype is not None:
                            z = preconditioner(
                                rm.astype(precond_dtype)
                            ).astype(rr.dtype)
                        else:
                            z = preconditioner(rm)
                        return jnp.where(free, z, rr)
                else:
                    def precond(rr):
                        rm = geo0.from_internal(jnp.where(free, rr, 0.0))
                        if precond_dtype is not None:
                            z = preconditioner(
                                rm.astype(precond_dtype)
                            ).astype(rr.dtype)
                        else:
                            z = preconditioner(rm)
                        return jnp.where(free, geo0.to_internal(z), rr)

                return linear.cg_solve(
                    matvec, r, rtol=cg_rtol, maxiter=cg_maxiter,
                    precond=precond, **cg_opts,
                )
            diag = None
            for g, tg in zip(geos, tgs):
                d = g.jacobi_diag(tg)
                diag = d if diag is None else diag + d
            diag = jnp.where(free, diag, 1.0)
            return linear.cg_solve(
                matvec, r, diag, rtol=cg_rtol, maxiter=cg_maxiter, **cg_opts,
            )

        def step_win(models, state: PackedState, bc_dofs, bc_vals, f_ext, dt):
            """Windowed-engine step. CONTRACT: ``state.u`` and ``f_ext`` are
            INTERNAL [vs * M_pad] vectors (build_packed_problem initializes
            the state that way; PackedSimulation caches the f_ext conversion
            at the host boundary) — the step pays no node<->internal
            permutations at all."""
            bc_int = geo0.bc_internal(bc_dofs)
            free = geo0.free_internal(bc_dofs)
            u_prev = state.u
            f_ext_int = f_ext
            u0 = u_prev.at[bc_int].set(bc_vals)

            def fnorm(r):
                return jnp.linalg.norm(jnp.where(free, r, 0.0))

            r0, s0, tg0, h0 = eval_assemble_win(
                models, u0, u_prev, state, f_ext_int, dt
            )
            r0_norm = fnorm(r0)

            def cond(carry):
                u, it, r, *_ = carry
                return (
                    fnorm(r) > jnp.maximum(newton_atol, newton_rtol * r0_norm)
                ) & (it < max_newton)

            def body(carry):
                u, it, r, s, tg, h, _ = carry
                delta, cg_k = solve_win(tg, r, free)
                u_new = u - delta
                r2, s2, tg2, h2 = eval_assemble_win(
                    models, u_new, u_prev, state, f_ext_int, dt
                )
                return (u_new, it + 1, r2, s2, tg2, h2, cg_k)

            carry = (
                u0, jnp.asarray(0, jnp.int32), r0, s0, tg0, h0,
                jnp.asarray(0, jnp.int32),
            )
            u, niter, r_f, s_f, _, h_f, cg_k = jax.lax.while_loop(
                cond, body, carry
            )
            new_state = PackedState(
                u=u,  # stays internal (see contract above)
                stress=s_f,
                histories=h_f,
                t=state.t + dt,
            )
            stats = {
                "newton_iters": niter,
                "r_norm": fnorm(r_f),
                "r0_norm": r0_norm,
                "cg_iters_last": cg_k,
            }
            return new_state, stats

        return _with_precision(step_win)

    # single-law structured grids run the Krylov loop in GRID-MAJOR dof
    # ordering: all conv ins/outs become free reshapes, the node-major
    # transposes happen once per Newton solve instead of twice per CG
    # iteration (see ops/structured.py to_grid_major).
    # grid-major fast loop: ALL laws are structured views of the SAME grid
    # (multi-material masked subsets share M/vs; see
    # ops.structured.restrict_structured_geometry)
    grid_major = (
        all(hasattr(g, "matvec_gm") for g in geos)
        and len({(g.M, g.vs) for g in geos}) == 1
        # multi-law shared-stencil helpers need the degree-1 corner layout
        and (len(geos) == 1 or all(hasattr(g, "offsets") for g in geos))
    )
    pallas_mv = None
    if matvec_impl == "pallas":
        assert grid_major and len(geos) == 1, (
            "pallas matvec needs the single-law structured path"
        )
        from ..ops.pallas_matvec import build_pallas_matvec

        pallas_mv = build_pallas_matvec(geos[0])

    def linear_solve(tangents, r, free):
        if grid_major:
            geo, tg = geos[0], tangents[0]
            r_gm = geo.to_grid_major(jnp.where(free, r, 0.0))
            free_gm = geo.to_grid_major(free)

            if pallas_mv is not None:
                def matvec(v):
                    vm = jnp.where(free_gm, v, 0.0)
                    return jnp.where(free_gm, pallas_mv(vm, tg), v)
            else:
                def matvec(v):
                    vm = jnp.where(free_gm, v, 0.0)
                    return jnp.where(free_gm, geo.matvec_gm(vm, tg), v)

            if preconditioner is not None:
                # NOTE: pass mg (V-cycle) or mg.bpx here. Do NOT smooth the
                # V-cycle with the true consistent tangent: softening makes
                # its Jacobi diagonal indefinite and the resulting M breaks
                # CG (measured: 28 -> 400-cap iterations).
                pc = preconditioner

                def precond(rr):
                    rm = jnp.where(free_gm, rr, 0.0)
                    if precond_dtype is not None:
                        z = pc(rm.astype(precond_dtype)).astype(rr.dtype)
                    else:
                        z = pc(rm)
                    return jnp.where(free_gm, z, rr)

                delta_gm, k = linear.cg_solve(
                    matvec, r_gm, rtol=cg_rtol, maxiter=cg_maxiter,
                    precond=precond, **cg_opts,
                )
            else:
                diag = jnp.where(free_gm, geo.jacobi_diag_gm(tg), 1.0)
                delta_gm, k = linear.cg_solve(
                    matvec, r_gm, diag, rtol=cg_rtol, maxiter=cg_maxiter,
                    **cg_opts,
                )
            return geo.to_node_major(delta_gm), k

        def matvec(v):
            vm = jnp.where(free, v, 0.0)
            out = jnp.zeros_like(v)
            for geo, tg in zip(geos, tangents):
                out = out + geo.matvec(vm, tg)
            return jnp.where(free, out, v)

        if preconditioner is not None:
            # node-major preconditioner (e.g. multigrid.build_p2_node_
            # preconditioner for degree-2 spaces on box meshes)
            def precond(rr):
                rm = jnp.where(free, rr, 0.0)
                if precond_dtype is not None:
                    z = preconditioner(rm.astype(precond_dtype)).astype(rr.dtype)
                else:
                    z = preconditioner(rm)
                return jnp.where(free, z, rr)

            return linear.cg_solve(
                matvec, jnp.where(free, r, 0.0), rtol=cg_rtol,
                maxiter=cg_maxiter, precond=precond, **cg_opts,
            )

        diag = jnp.zeros_like(r)
        for geo, tg in zip(geos, tangents):
            diag = diag + geo.jacobi_diag(tg)
        diag = jnp.where(free, diag, 1.0)
        return linear.cg_solve(
            matvec, jnp.where(free, r, 0.0), diag, rtol=cg_rtol,
            maxiter=cg_maxiter, **cg_opts,
        )

    def step_generic(models, state: PackedState, bc_dofs, bc_vals, f_ext, dt):
        free = jnp.ones(ndofs, bool).at[bc_dofs].set(False)
        u0 = state.u.at[bc_dofs].set(bc_vals)

        def fnorm(r):
            return jnp.linalg.norm(jnp.where(free, r, 0.0))

        r0, s0, tg0, h0 = eval_assemble(models, u0, state, f_ext, dt)
        r0_norm = fnorm(r0)

        def cond(carry):
            u, it, r, *_ = carry
            return (fnorm(r) > jnp.maximum(newton_atol, newton_rtol * r0_norm)) & (
                it < max_newton
            )

        def body(carry):
            u, it, r, s, tg, h, _ = carry
            delta, cg_k = linear_solve(tg, r, free)
            u_new = u - delta
            r2, s2, tg2, h2 = eval_assemble(models, u_new, state, f_ext, dt)
            return (u_new, it + 1, r2, s2, tg2, h2, cg_k)

        carry = (
            u0, jnp.asarray(0, jnp.int32), r0, s0, tg0, h0,
            jnp.asarray(0, jnp.int32),
        )
        u, niter, r_f, s_f, _, h_f, cg_k = jax.lax.while_loop(cond, body, carry)
        new_state = PackedState(u=u, stress=s_f, histories=h_f, t=state.t + dt)
        stats = {
            "newton_iters": niter,
            "r_norm": fnorm(r_f),
            "r0_norm": r0_norm,
            "cg_iters_last": cg_k,
        }
        return new_state, stats

    if not grid_major:
        return _with_precision(step_generic)

    # -- grid-major step (single-law structured/lattice engines) --------------
    # The whole Newton loop runs on GRID-MAJOR dof vectors: strain/residual
    # lose their per-call node<->grid transposes (6 per step -> 2 at the
    # boundary), and the CG solve consumes/produces grid-major directly.
    # Node-major dof index n*vs+j <-> grid-major index j*M+n (a host-free
    # index transform applied to the bc dof array).
    geo = geos[0]
    M, vs = geo.M, geo.vs

    def eval_assemble_gm(model, u_gm, u_prev_gm, stress, history, t, f_ext_gm, dt):
        eps = geo.strain_gm(u_gm - u_prev_gm)
        s_new, tg, h_new = model.evaluate_packed(t, dt, eps, stress, history)
        r = geo.residual_gm(s_new) - f_ext_gm
        return r, s_new, tg, h_new

    if eval_impl == "pallas":
        # fused strain -> radial return -> weighted divergence kernel
        # (VonMises3D on the degree-1 structured engine; the corner
        # gather/scatter shifts stay at the XLA level)
        from ..models.mises import VonMises3D
        from ..ops.packed import IsotropicTangent
        from ..ops.pallas_eval import build_pallas_eval

        assert len(geos) == 1 and hasattr(geo, "offsets"), (
            "pallas eval needs the single-law degree-1 structured path"
        )
        # WeakKeyDictionary, NOT {id(model): ...}: CPython reuses ids of
        # collected objects, which could silently serve a kernel baked with a
        # different model's static Newton config; the weak entry dies with
        # the model instead
        import weakref

        _fused_cache: weakref.WeakKeyDictionary = weakref.WeakKeyDictionary()

        def eval_assemble_gm(model, u_gm, u_prev_gm, stress, history, t,
                             f_ext_gm, dt):
            del t, dt  # VonMises3D is rate-independent
            assert isinstance(model, VonMises3D)
            if model not in _fused_cache:
                _fused_cache[model] = build_pallas_eval(geo, model)
            F, s_new, (beta, gmm, nf), h_new = _fused_cache[model](
                u_gm - u_prev_gm, stress, history
            )
            tg = IsotropicTangent(
                kappa=jnp.asarray(model.params["p_ka"], F.dtype),
                beta=beta, gamma=gmm, n=nf,
            )
            r = geo._scatter_corners(F).reshape(-1) - f_ext_gm
            return r, s_new, tg, h_new

    def eval_assemble_gm_all(
        models, u_gm, u_prev_gm, stresses, hists, t, f_ext_gm, dt
    ):
        """All laws on the shared grid; single-law defers to eval_assemble_gm
        so the fused Pallas eval override still applies there."""
        if len(geos) == 1:
            r, s, tg, h = eval_assemble_gm(
                models[0], u_gm, u_prev_gm, stresses[0], hists[0],
                t, f_ext_gm, dt,
            )
            return r, (s,), (tg,), (h,)
        # per-law stencil sweeps, NOT the shared-stencil variant
        # (ops.structured.multi_strain_gm/multi_residual_gm): sharing the
        # corner gather + strain/divergence matmuls across laws was measured
        # 19% SLOWER at the 1M-QP 2-law bench state (74.3 vs 62.6 ms/step,
        # scripts/ab_multimat.py) — XLA fuses each law's mask into its own
        # matmul pipeline, while sharing materializes extra [s*Q, M]
        # intermediates; on TPU recompute-and-fuse beats share-and-spill
        du = u_gm - u_prev_gm
        r = -f_ext_gm
        ss, tgs, hh = [], [], []
        for model, g, sig0, h0 in zip(models, geos, stresses, hists):
            eps = g.strain_gm(du)
            s_new, tg, h_new = model.evaluate_packed(t, dt, eps, sig0, h0)
            r = r + g.residual_gm(s_new)
            ss.append(s_new)
            tgs.append(tg)
            hh.append(h_new)
        return r, tuple(ss), tuple(tgs), tuple(hh)

    def solve_gm(tgs, r_gm, free_gm):
        r_gm = jnp.where(free_gm, r_gm, 0.0)
        if pallas_mv is not None:
            def matvec(v):
                vm = jnp.where(free_gm, v, 0.0)
                return jnp.where(free_gm, pallas_mv(vm, tgs[0]), v)
        else:
            # per-law matvec sum (see eval_assemble_gm_all: the shared-
            # stencil variant measured slower)
            def matvec(v):
                vm = jnp.where(free_gm, v, 0.0)
                out = None
                for g, tg in zip(geos, tgs):
                    mv = g.matvec_gm(vm, tg)
                    out = mv if out is None else out + mv
                return jnp.where(free_gm, out, v)

        if preconditioner is not None:
            def precond(rr):
                rm = jnp.where(free_gm, rr, 0.0)
                if precond_dtype is not None:
                    z = preconditioner(rm.astype(precond_dtype)).astype(rr.dtype)
                else:
                    z = preconditioner(rm)
                return jnp.where(free_gm, z, rr)

            return linear.cg_solve(
                matvec, r_gm, rtol=cg_rtol, maxiter=cg_maxiter,
                precond=precond, **cg_opts,
            )
        diag = None
        for g, tg in zip(geos, tgs):
            d = g.jacobi_diag_gm(tg)
            diag = d if diag is None else diag + d
        diag = jnp.where(free_gm, diag, 1.0)
        return linear.cg_solve(
            matvec, r_gm, diag, rtol=cg_rtol, maxiter=cg_maxiter, **cg_opts,
        )

    def step_gm(models, state: PackedState, bc_dofs, bc_vals, f_ext, dt):
        bc_gm = (bc_dofs % vs) * M + bc_dofs // vs
        free_gm = jnp.ones(ndofs, bool).at[bc_gm].set(False)
        u_prev_gm = geo.to_grid_major(state.u)
        f_ext_gm = geo.to_grid_major(f_ext)
        u0 = u_prev_gm.at[bc_gm].set(bc_vals)

        def fnorm(r):
            return jnp.linalg.norm(jnp.where(free_gm, r, 0.0))

        r0, s0, tg0, h0 = eval_assemble_gm_all(
            models, u0, u_prev_gm, state.stress, state.histories,
            state.t, f_ext_gm, dt,
        )
        r0_norm = fnorm(r0)

        def cond(carry):
            u, it, r, *_ = carry
            return (fnorm(r) > jnp.maximum(newton_atol, newton_rtol * r0_norm)) & (
                it < max_newton
            )

        def body(carry):
            u, it, r, s, tg, h, _ = carry
            delta, cg_k = solve_gm(tg, r, free_gm)
            u_new = u - delta
            r2, s2, tg2, h2 = eval_assemble_gm_all(
                models, u_new, u_prev_gm, state.stress, state.histories,
                state.t, f_ext_gm, dt,
            )
            return (u_new, it + 1, r2, s2, tg2, h2, cg_k)

        carry = (
            u0, jnp.asarray(0, jnp.int32), r0, s0, tg0, h0,
            jnp.asarray(0, jnp.int32),
        )
        u, niter, r_f, s_f, _, h_f, cg_k = jax.lax.while_loop(cond, body, carry)
        new_state = PackedState(
            u=geo.to_node_major(u),
            stress=s_f,
            histories=h_f,
            t=state.t + dt,
        )
        stats = {
            "newton_iters": niter,
            "r_norm": fnorm(r_f),
            "r0_norm": r0_norm,
            "cg_iters_last": cg_k,
        }
        return new_state, stats

    return _with_precision(step_gm)
