"""Geometric multigrid preconditioner for structured grids.

The reference delegates its linear solves to PETSc KSP with whatever
preconditioner dolfinx configures; at 1M+ QPs a Jacobi-preconditioned CG
needs hundreds of iterations per Newton step (measured: 325 for rtol 1e-6 on
the 50^3 benchmark). This module provides a matrix-free geometric V-cycle
built entirely from convolutions on the node grid:

  * level operators: the CONSTANT-COEFFICIENT elastic operator per level
    (2 mu P_dev + 3 kappa P_vol), applied through the same conv-folded
    KEPS/KDIV kernels as the fine-grid matvec — spectrally equivalent to the
    consistent elastoplastic tangent (plastic softening is bounded), which is
    what a preconditioner needs;
  * transfer: trilinear prolongation (stride-2 transposed conv, kernel
    [1/2, 1, 1/2]^d) and its scaled adjoint as restriction — depthwise convs
    over the displacement components;
  * smoother: damped Jacobi with the level's constant elastic diagonal;
  * Dirichlet dofs are projected out at the fine level only.

Used as the M^-1 of CG (solver/linear.cg_solve's `diag` generalized to a
callable preconditioner in make_packed_step(multigrid=...)).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.packed import IsotropicTangent
from ..ops.structured import StructuredGeometry

__all__ = [
    "build_multigrid",
    "build_p2_node_preconditioner",
    "MultigridPreconditioner",
]


def _transfer_kernels(vs: int, gdim: int, dtype):
    """Depthwise trilinear kernels [vs, vs, 3^d]: diag in channels."""
    k1 = np.array([0.5, 1.0, 0.5])
    k = k1
    for _ in range(gdim - 1):
        k = np.multiply.outer(k, k1)
    K = np.zeros((vs, vs) + (3,) * gdim)
    for j in range(vs):
        K[j, j] = k
    return jnp.asarray(K, dtype)


def _coarse_len(L: int) -> int:
    return (L - 1) // 2 + 1


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["geos", "diag_kappa", "diag_beta", "frees", "K_transfer",
                 "mu", "kappa", "coarse_inv"],
    meta_fields=[
        "node_grids", "vs", "n_levels", "omega", "nu", "coarse_iters",
        "fine_matvec", "smoother", "lmax", "nu_coarse", "kappa0", "fused",
    ],
)
@dataclass(frozen=True)
class MultigridPreconditioner:
    geos: tuple  # per-level StructuredGeometry (elastic operator carrier)
    #: per-level Jacobi-diagonal components: diag = kappa*diag_kappa + 2mu*diag_beta
    diag_kappa: tuple
    diag_beta: tuple
    frees: tuple  # per-level free-dof masks (Dirichlet dofs injected coarse)
    K_transfer: jnp.ndarray  # depthwise trilinear kernel
    #: TRACED moduli of the level operators — adapt per Newton step with
    #: with_moduli() so the preconditioner tracks plastic softening
    mu: jnp.ndarray
    kappa: jnp.ndarray
    node_grids: tuple  # per-level node-grid shapes
    vs: int
    n_levels: int
    omega: float
    nu: int
    coarse_iters: int
    #: optional fused fine-level operator apply (e.g. the Pallas matvec);
    #: signature (v_gm, IsotropicTangent) -> r_gm. None = conv engine.
    fine_matvec: object = None
    #: "jacobi" (omega-damped) or "chebyshev" (degree-nu polynomial on the
    #: Jacobi-preconditioned operator; same A-applies per smooth, optimal
    #: damping over [lmax/4, lmax])
    smoother: str = "jacobi"
    #: per-level upper bounds on lambda_max(D^-1 A), estimated at build by
    #: power iteration (invariant to a COMMON scaling of mu/kappa, so they
    #: stay valid under with_moduli'd plastic softening)
    lmax: tuple = ()
    #: smoothing sweeps on levels >= 1 (None = same as nu). The coarse
    #: hierarchy is op-overhead-bound on TPU (measured: levels 1+ cost MORE
    #: than the fine level at 50^3 despite 8x less data), so lighter coarse
    #: smoothing trades negligible convergence for real wall-clock.
    nu_coarse: int = None
    #: dense inverse of the coarsest constrained elastic operator (None =
    #: iterative coarse smoothing). Built at the build-time moduli; the apply
    #: rescales by kappa0/kappa so it stays exact under a COMMON with_moduli
    #: scaling. Replaces `coarse_iters` Jacobi sweeps (each op-overhead-bound
    #: at 4^3) with one small matmul.
    coarse_inv: jnp.ndarray = None
    #: build-time kappa (the common-scaling reference for coarse_inv)
    kappa0: float = 1.0
    #: per-level fused Pallas smoothing chains (build_multigrid
    #: fused_smoothing=True): dicts with "pre"/"post"/"coarse" appliers, or
    #: None. Baked at the BUILD-TIME moduli — with_moduli drops them.
    fused: tuple = None

    def with_moduli(self, mu, kappa):
        """New preconditioner with updated (traced) effective moduli — e.g.
        mu_eff = mean(beta)/2 of the current consistent tangent, so the
        elastic hierarchy stays spectrally matched through plastic softening.

        Drops any fused Pallas smoothing chains (their element matrices are
        baked at build-time moduli); the XLA chain tracks the new moduli."""
        import dataclasses

        return dataclasses.replace(
            self, mu=jnp.asarray(mu), kappa=jnp.asarray(kappa), fused=None
        )

    def _diag(self, lvl, dtype):
        return (
            self.kappa * self.diag_kappa[lvl] + 2.0 * self.mu * self.diag_beta[lvl]
        ).astype(dtype)

    # -- grid <-> flat (GRID-MAJOR dof vectors: reshapes only, no copies) ------
    def _to_grid(self, x, lvl):
        return x.reshape((1, self.vs) + self.node_grids[lvl])  # [1, vs, *grid]

    def _to_flat(self, g, lvl):
        del lvl
        return g.reshape(-1)

    def _dimnums(self, gdim):
        sp = "DHW"[3 - gdim:]
        return (f"NC{sp}", f"OI{sp}", f"NC{sp}")

    def restrict(self, x_fine, lvl):
        """fine level lvl -> coarse level lvl+1.

        R = P^T exactly (no 1/2^d scaling): residuals are integrated
        functionals, and for nested linear FEM bases A_coarse(rediscretized)
        == P^T A_fine P, so the Galerkin condition holds with this pairing.
        """
        gdim = len(self.node_grids[lvl])
        g = self._to_grid(x_fine, lvl)
        out = jax.lax.conv_general_dilated(
            g,
            self.K_transfer.astype(g.dtype),
            window_strides=(2,) * gdim,
            padding=[(1, 1)] * gdim,
            dimension_numbers=self._dimnums(gdim),
            preferred_element_type=g.dtype,
        )
        return self._to_flat(out, lvl + 1)

    def prolong(self, x_coarse, lvl):
        """coarse level lvl+1 -> fine level lvl (trilinear interpolation).

        Implemented as a fractionally-strided (lhs-dilated) conv: out length =
        (2 Lc - 1) + lo + hi - 2, so pads (1, Lf - 2 Lc + 2) hit the fine size
        exactly. For nested levels (Lf = 2 Lc - 1) this is (1, 1) and the
        operator is exactly P = R^T; on non-nested (even) levels the extra
        high-side pad extrapolates one row — a negligible asymmetry for a
        preconditioner.
        """
        gdim = len(self.node_grids[lvl])
        fine = self.node_grids[lvl]
        g = self._to_grid(x_coarse, lvl + 1)
        pads = [
            (1, Lf - 2 * Lc + 2)
            for Lf, Lc in zip(fine, self.node_grids[lvl + 1])
        ]
        out = jax.lax.conv_general_dilated(
            g,
            self.K_transfer.astype(g.dtype),
            window_strides=(1,) * gdim,
            padding=pads,
            lhs_dilation=(2,) * gdim,
            dimension_numbers=self._dimnums(gdim),
            preferred_element_type=g.dtype,
        )
        return self._to_flat(out, lvl)

    # -- level ops -------------------------------------------------------------
    def _tangent(self, lvl, dtype):
        del lvl
        # n must carry the QP-field rank ([k, Q, M] in the flat engine) for
        # broadcasting in apply/quad_diag
        n_shape = (6, 1, 1)
        return IsotropicTangent(
            kappa=jnp.asarray(self.kappa, dtype),
            beta=jnp.asarray(2.0 * self.mu, dtype),
            gamma=jnp.asarray(0.0, dtype),
            n=jnp.zeros(n_shape, dtype),
        )

    def vcycle(self, lvl, b, fine_tangent=None, fine_diag=None):
        geo = self.geos[lvl]
        # level 0 can smooth with the TRUE (heterogeneous) consistent tangent:
        # high-frequency error in the plastic zone is invisible to the
        # constant-coefficient coarse hierarchy, but the smoother kills it
        if lvl == 0 and fine_tangent is not None:
            tg = fine_tangent
            diag = jnp.where(self.frees[0], fine_diag, 1.0)
        else:
            tg = self._tangent(lvl, b.dtype)
            diag = jnp.where(
                self.frees[lvl], self._diag(lvl, b.dtype), 1.0
            )
        free = self.frees[lvl]
        inv_d = self.omega / diag
        b = jnp.where(free, b, 0.0)

        # fused Pallas smoothing chains (constant-coefficient levels only;
        # the true-tangent fine level and fine_matvec injection fall back)
        fused = None
        if self.fused is not None and tg is not fine_tangent and not (
            lvl == 0 and self.fine_matvec is not None
        ):
            fused = self.fused[lvl]
        if fused is not None:
            if lvl == self.n_levels - 1:
                if self.coarse_inv is None:
                    return fused["coarse"](b)
            else:
                x, r = fused["pre"](b)
                xc = self.vcycle(lvl + 1, self.restrict(r, lvl))
                x = x + jnp.where(free, self.prolong(xc, lvl), 0.0)
                return fused["post"](x, b)
        if lvl == 0 and self.fine_matvec is not None:
            apply_op = lambda v: self.fine_matvec(v, tg)
        elif tg is not fine_tangent and hasattr(geo, "elastic_matvec_gm"):
            # constant-coefficient level operator: quadrature-folded element
            # matmul, no [s*Q, M] channel intermediates (~2x cheaper apply)
            apply_op = lambda v: geo.elastic_matvec_gm(
                v, self.kappa, 2.0 * self.mu
            )
        else:
            apply_op = lambda v: geo.matvec_gm(v, tg)

        def A(v):
            # constrained (identity-row) elastic operator at this level
            vm = jnp.where(free, v, 0.0)
            return jnp.where(free, apply_op(vm), v)

        # Chebyshev only smooths the CONSTANT-coefficient operator its lmax
        # bound was estimated for — the prepared() true-tangent fine level
        # falls back to damped Jacobi (a heterogeneous tangent's spectrum can
        # exceed the elastic bound, and an undershot Chebyshev interval
        # AMPLIFIES the uncovered top modes).
        use_cheb = (
            self.smoother == "chebyshev"
            and lvl < self.n_levels - 1
            and tg is not fine_tangent
        )
        if use_cheb:
            # degree-`iters` Chebyshev on D^-1 A over [lmax/4, lmax]: same
            # number of A-applies as `iters` Jacobi sweeps, polynomially
            # optimal damping of the upper 3/4 of the spectrum
            inv_d_raw = 1.0 / diag
            lmax_s = 1.1 * self.lmax[lvl]
            lmin_s = lmax_s / 4.0
            theta = 0.5 * (lmax_s + lmin_s)
            delta = 0.5 * (lmax_s - lmin_s)
            sigma = theta / delta

            def smooth(x, b_, iters):
                # x=None means "start from zero": the initial residual is b_
                # and the A(x) apply is skipped (one operator apply saved per
                # level per cycle — pre-smoothing always starts from zero)
                if iters <= 0:
                    return jnp.zeros_like(b_) if x is None else x
                rho = 1.0 / sigma
                if x is None:
                    x = jnp.zeros_like(b_)
                    r = jnp.where(free, b_, 0.0)
                else:
                    r = jnp.where(free, b_ - A(x), 0.0)
                d = jnp.where(free, inv_d_raw * r / theta, 0.0)
                for _ in range(iters - 1):
                    x = x + d
                    r = r - jnp.where(free, A(d), 0.0)
                    rho_new = 1.0 / (2.0 * sigma - rho)
                    d = (rho_new * rho) * d + jnp.where(
                        free, (2.0 * rho_new / delta) * inv_d_raw * r, 0.0
                    )
                    rho = rho_new
                return x + d
        else:
            def smooth(x, b_, iters):
                # x=None = zero start: first sweep is x1 = omega D^-1 b (no
                # operator apply). Statically unrolled (iters is a small host
                # constant) so XLA sees the simplification.
                if iters <= 0:
                    return jnp.zeros_like(b_) if x is None else x
                if x is None:
                    x = jnp.where(free, inv_d * b_, 0.0)
                    iters = iters - 1
                for _ in range(iters):
                    x = x + jnp.where(free, inv_d * (b_ - A(x)), 0.0)
                return x

        if lvl == self.n_levels - 1:
            if self.coarse_inv is not None:
                # exact coarse solve: one small matmul instead of
                # `coarse_iters` op-overhead-bound Jacobi sweeps; the stored
                # inverse is rescaled for common-moduli with_moduli changes
                scale = (self.kappa0 / self.kappa).astype(b.dtype)
                return jnp.where(
                    free, (self.coarse_inv.astype(b.dtype) @ b) * scale, 0.0
                )
            return smooth(None, b, self.coarse_iters)

        nu = self.nu if lvl == 0 else (
            self.nu if self.nu_coarse is None else self.nu_coarse
        )
        x = smooth(None, b, nu)
        r = jnp.where(free, b - A(x), 0.0)
        xc = self.vcycle(lvl + 1, self.restrict(r, lvl))
        x = x + jnp.where(free, self.prolong(xc, lvl), 0.0)
        x = smooth(x, b, nu)
        return x

    def bpx(self, r_gm):
        """Additive (BPX) multilevel preconditioner apply.

        M^-1 = sum_l P_(0..l) D_l^-1 R_(l..0): diagonal scaling on every
        level, combined additively. Symmetric positive definite with O(1)
        multilevel conditioning, and — unlike the multiplicative V-cycle — it
        costs NO fine-level operator applies: per CG iteration only the
        transfers and level diagonals, so each preconditioned iteration is
        barely more expensive than a plain Jacobi one.
        """
        contribs = []
        r = r_gm
        for lvl in range(self.n_levels):
            free = self.frees[lvl]
            r = jnp.where(free, r, 0.0)
            d = jnp.where(free, self._diag(lvl, r.dtype), 1.0)
            contribs.append(jnp.where(free, r / d, 0.0))
            if lvl < self.n_levels - 1:
                r = self.restrict(r, lvl)
        z = contribs[-1]
        for lvl in range(self.n_levels - 2, -1, -1):
            z = contribs[lvl] + jnp.where(
                self.frees[lvl], self.prolong(z, lvl), 0.0
            )
        return z

    def prepared(self, fine_tangent, fine_diag_gm):
        """V-cycle closure smoothing level 0 with the given consistent tangent
        (and its precomputed grid-major Jacobi diagonal).

        WARNING (measured): with softening elastoplastic tangents the true
        Jacobi diagonal can approach zero/indefiniteness and the resulting
        preconditioner breaks CG SPD-ness (iterations blow from ~30 to the
        cap). Prefer the plain elastic cycle (__call__) or bpx; this hook is
        for genuinely SPD heterogeneous tangents."""
        return lambda r_gm: self.vcycle(0, r_gm, fine_tangent, fine_diag_gm)

    def __call__(self, r_gm):
        """Preconditioner apply M^-1 r at the fine level.

        NOTE: operates on GRID-MAJOR dof vectors ([vs, *node_grid] flattened);
        the solver converts once per Newton solve (ops/structured.py
        to_grid_major/to_node_major)."""
        return self.vcycle(0, r_gm)


def build_p2_node_preconditioner(
    space,
    mu: float,
    kappa: float,
    free_mask,
    *,
    dtype=None,
    use_bpx: bool = False,
    **mg_kwargs,
):
    """Multilevel preconditioner for a DEGREE-2 space on a box mesh.

    The structured multigrid hierarchy is degree-1, but on a tensor grid the
    P2 dof nodes form exactly the node lattice of the 2x-refined P1 grid, and
    the P1 operator on that lattice is spectrally equivalent to the P2
    operator (classic p-version trick: precondition high order with the
    low-order operator on the same nodes). This closes the 'P2 beyond the
    gather cliff' gap: without it, f32 Jacobi-CG on the ill-conditioned P2
    operator loses conjugacy and returns unusable directions at scale.

    Returns a callable M^-1 on NODE-MAJOR dof vectors (the layout the packed
    engine's generic Krylov path uses), suitable for
    ``make_packed_step(preconditioner=..., matvec_impl="conv")`` with a
    degree-2 packed geometry.
    """
    from ..fem.mesh import unit_cube_mesh, unit_square_mesh
    from ..fem.spaces import FunctionSpace
    from ..ops.structured import build_structured_geometry

    mesh = space.mesh
    grid = mesh.structured_shape
    assert space.degree == 2 and grid is not None, (
        "p2 node preconditioner needs a degree-2 space on a box-structured mesh"
    )
    vs = space.value_size
    refined_cells = tuple(2 * g for g in grid)
    m1 = (
        unit_cube_mesh(*refined_cells, "hex")
        if len(grid) == 3
        else unit_square_mesh(*refined_cells, "quad")
    )
    V1 = FunctionSpace(m1, 1, vs)
    assert V1.n_dof_nodes == space.n_dof_nodes

    # permutation lattice-node-index -> P2-dof-node-index (exact, via
    # quantized coordinates; both lattices live on the same box)
    def keys(a):
        k = np.round(np.asarray(a, float) * 1e10).astype(np.int64)
        k = np.ascontiguousarray(k)
        return k.view([("", k.dtype)] * k.shape[1]).ravel()

    k2, k1 = keys(space.dof_coords), keys(m1.nodes)
    order = np.argsort(k2)
    pos = np.searchsorted(k2, k1, sorter=order)
    assert (k2[order[pos]] == k1).all(), "P2 dof lattice != refined P1 lattice"
    perm = order[pos]  # [n_nodes]: P2 dof node for each lattice node
    inv_perm = np.empty_like(perm)
    inv_perm[perm] = np.arange(len(perm))
    perm_j = jnp.asarray(perm)
    inv_perm_j = jnp.asarray(inv_perm)

    geo1 = build_structured_geometry(V1, 2, space_constraint(space), dtype)
    free_lat = jnp.asarray(free_mask, bool).reshape(-1, vs)[perm_j].reshape(-1)
    mg = build_multigrid(
        geo1, mu, kappa, free_lat, dtype=dtype, **mg_kwargs
    )
    inner = mg.bpx if use_bpx else mg

    def precond(r):
        """node-major P2 dof vector -> node-major preconditioned vector."""
        r_lat = r.reshape(-1, vs)[perm_j].reshape(-1)
        z_gm = inner(geo1.to_grid_major(r_lat))
        z_lat = geo1.to_node_major(z_gm)
        return z_lat.reshape(-1, vs)[inv_perm_j].reshape(-1)

    return precond


def space_constraint(space):
    """Default FULL/PLANE_STRAIN constraint matching a space's value size
    (the preconditioner only needs the elastic operator's block structure)."""
    from ..ops.mandel import Constraint

    return Constraint.FULL if space.value_size == 3 else Constraint.PLANE_STRAIN


def build_multigrid(
    geo: StructuredGeometry,
    mu: float,
    kappa: float,
    free_mask=None,
    *,
    omega: float = 0.6,
    nu: int = 2,
    coarse_iters: int = 20,
    min_size: int = 4,
    dtype=None,
    fine_matvec=None,
    smoother: str = "jacobi",
    nu_coarse: int = None,
    coarse_direct: bool = False,
    fused_smoothing: bool = False,
) -> MultigridPreconditioner:
    """Build the elastic V-cycle hierarchy below a fine StructuredGeometry.

    ``free_mask``: bool [ndofs] with False at Dirichlet dofs. Constraints are
    carried to coarse levels by injection (every-other-node), keeping each
    level's operator nonsingular (without this the coarse problems contain
    rigid-body modes and the cycle diverges).
    """
    from ..fem.spaces import FunctionSpace
    from ..fem.mesh import Mesh
    from ..ops.structured import build_structured_geometry

    dtype = dtype or geo.KEPS_c.dtype
    vs = geo.vs
    gdim = geo.gdim

    # level cell grids: halve node counts until small
    node_grids = [tuple(g + 1 for g in geo.grid)]
    while min(node_grids[-1]) > min_size + 1:
        node_grids.append(tuple(_coarse_len(L) for L in node_grids[-1]))
    cell_grids = [tuple(L - 1 for L in ng) for ng in node_grids]

    def synth_geo(cells):
        # synthetic uniform box mesh with the same physical extent (h scales
        # per level; the preconditioner only needs the right operator scaling)
        from ..fem.mesh import unit_cube_mesh, unit_square_mesh

        if gdim == 3:
            m = unit_cube_mesh(*cells, "hex")
        else:
            m = unit_square_mesh(*cells, "quad")
        V = FunctionSpace(m, 1, vs)
        return build_structured_geometry(V, 2, geo.constraint, dtype)

    geos = [geo] + [synth_geo(c) for c in cell_grids[1:]]
    # per-level free masks (grid-major) by injection on the node grid
    if free_mask is None:
        free_mask = jnp.ones(geo.ndofs, bool)
    frees = [geo.to_grid_major(jnp.asarray(free_mask, bool))]
    for lvl in range(1, len(node_grids)):
        fine = frees[-1].reshape((vs,) + node_grids[lvl - 1])
        sl = (slice(None),) + (slice(None, None, 2),) * gdim
        frees.append(fine[sl].reshape(-1))

    # diagonal components (linear in kappa and beta=2mu)
    n_shape = (6, 1, 1)
    unit_kappa = IsotropicTangent(
        kappa=jnp.asarray(1.0, dtype), beta=jnp.asarray(0.0, dtype),
        gamma=jnp.asarray(0.0, dtype), n=jnp.zeros(n_shape, dtype),
    )
    unit_beta = IsotropicTangent(
        kappa=jnp.asarray(0.0, dtype), beta=jnp.asarray(1.0, dtype),
        gamma=jnp.asarray(0.0, dtype), n=jnp.zeros(n_shape, dtype),
    )
    diag_kappa = tuple(g.jacobi_diag_gm(unit_kappa) for g in geos)
    diag_beta = tuple(g.jacobi_diag_gm(unit_beta) for g in geos)

    lmax = ()
    if smoother == "chebyshev":
        # per-level lambda_max(D^-1 A) by power iteration with the build-time
        # moduli; D^-1 A is invariant under common scaling of (mu, kappa), so
        # the bound survives with_moduli-tracked softening (1.1 safety in
        # the smoother covers mild ratio drift)
        beta0 = 2.0 * float(mu)
        tangent0 = IsotropicTangent(
            kappa=jnp.asarray(float(kappa), dtype),
            beta=jnp.asarray(beta0, dtype),
            gamma=jnp.asarray(0.0, dtype),
            n=jnp.zeros(n_shape, dtype),
        )
        ests = []
        for lvl, g in enumerate(geos):
            free = frees[lvl]
            d = jnp.where(
                free,
                float(kappa) * diag_kappa[lvl] + beta0 * diag_beta[lvl],
                1.0,
            ).astype(dtype)

            def DA(v, g=g, free=free, d=d):
                vm = jnp.where(free, v, 0.0)
                return jnp.where(free, g.matvec_gm(vm, tangent0), v) / d

            @jax.jit
            def power(v, DA=DA):
                def body(i, carry):
                    v, _ = carry
                    w = DA(v)
                    nrm = jnp.linalg.norm(w)
                    return (w / nrm, nrm)

                # 50 iterations: power iteration converges to lambda_max from
                # BELOW, and elasticity's top eigenvalues cluster on fine
                # grids — together with the 1.1 interval margin in the
                # smoother this keeps the Chebyshev bound an upper bound
                return jax.lax.fori_loop(0, 50, body, (v, jnp.asarray(1.0, dtype)))

            v0 = jnp.sin(jnp.arange(d.shape[0], dtype=dtype) * 0.7) + 0.01
            _, est = power(v0 / jnp.linalg.norm(v0))
            ests.append(float(est))
        lmax = tuple(ests)

    coarse_inv = None
    if coarse_direct:
        # dense inverse of the coarsest constrained elastic operator (tiny:
        # vs * prod(coarsest grid) dofs). Columns by vmapped operator apply.
        gC, freeC = geos[-1], frees[-1]
        tangC = IsotropicTangent(
            kappa=jnp.asarray(float(kappa), dtype),
            beta=jnp.asarray(2.0 * float(mu), dtype),
            gamma=jnp.asarray(0.0, dtype),
            n=jnp.zeros(n_shape, dtype),
        )

        def Acol(v):
            vm = jnp.where(freeC, v, 0.0)
            return jnp.where(freeC, gC.matvec_gm(vm, tangC), v)

        eye = jnp.eye(gC.ndofs, dtype=dtype)
        Amat = jax.jit(jax.vmap(Acol, in_axes=1, out_axes=1))(eye)
        coarse_inv = jnp.asarray(
            np.linalg.inv(np.asarray(Amat, np.float64)), dtype
        )

    fused = None
    if fused_smoothing:
        # whole smoothing chains (sweeps + residual) as single VMEM-resident
        # Pallas kernels per level — see ops/pallas_smoother.py. Constant
        # build-time moduli are baked into the element matrices.
        assert smoother == "jacobi", "fused smoothing implements the Jacobi chain"
        assert fine_matvec is None, "fused smoothing replaces the fine apply"
        from ..ops.pallas_smoother import build_fused_smoother

        beta0 = 2.0 * float(mu)
        ka0 = float(kappa)
        entries = []
        for lvl, g in enumerate(geos):
            ke = beta0 * np.asarray(g.KE_I, np.float64) + (
                ka0 - beta0 / 3.0
            ) * np.asarray(g.KE_V, np.float64)
            d = ka0 * diag_kappa[lvl] + beta0 * diag_beta[lvl]
            inv_d = jnp.where(frees[lvl], omega / d, 0.0).astype(dtype)
            lvl_nu = nu if (lvl == 0 or nu_coarse is None) else nu_coarse
            mk = partial(
                build_fused_smoother, g, ke, inv_d, np.asarray(g.mask)
            )
            if lvl == len(geos) - 1:
                entries.append(
                    {
                        "coarse": mk(
                            nu=coarse_iters, zero_start=True,
                            emit_residual=False,
                        )
                    }
                )
            else:
                entries.append(
                    {
                        "pre": mk(
                            nu=lvl_nu, zero_start=True, emit_residual=True
                        ),
                        "post": mk(
                            nu=lvl_nu, zero_start=False, emit_residual=False
                        ),
                    }
                )
        fused = tuple(entries)

    return MultigridPreconditioner(
        geos=tuple(geos),
        diag_kappa=diag_kappa,
        diag_beta=diag_beta,
        frees=tuple(frees),
        K_transfer=_transfer_kernels(vs, gdim, dtype),
        mu=jnp.asarray(float(mu), dtype),
        kappa=jnp.asarray(float(kappa), dtype),
        node_grids=tuple(node_grids),
        vs=vs,
        n_levels=len(geos),
        omega=omega,
        nu=nu,
        coarse_iters=coarse_iters,
        fine_matvec=fine_matvec,
        smoother=smoother,
        lmax=lmax,
        nu_coarse=nu_coarse,
        coarse_inv=coarse_inv,
        kappa0=float(kappa),
        fused=fused,
    )
