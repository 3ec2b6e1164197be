"""Stress-controlled creep: a constant traction on a viscoelastic bar.

The production-driver twin of the reference's stress-controlled
viscoelasticity test (/root/reference/tests/models/test_viscoelasticity.py:
369-527, which mutates the residual form R_form to add a traction term,
reference _solver.py:46-52). Demonstrates:

  * Neumann loads on PackedSimulation (``f_ext=`` built with
    ``assemble_facet_traction``),
  * a WHOLE creep history as ONE ``solve_schedule`` lax.scan dispatch,
  * checking the elastic instant response and the analytic creep limit
    of the standard linear solid (Kelvin branch):
      eps(0+) = sigma / E0,   eps(inf) = sigma / E0 + sigma / E1.

Run:  python examples/creep_neumann/run_example.py  [out_dir]
"""

from __future__ import annotations

# allow running from a plain checkout
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[2]))

import jax


def main(out_dir: str) -> None:
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    import numpy as np

    from fenics_constitutive_tpu.fem import (
        DirichletBC,
        FunctionSpace,
        unit_cube_mesh,
    )
    from fenics_constitutive_tpu.fem.bcs import combine_bcs
    from fenics_constitutive_tpu.fem.facets import (
        assemble_facet_traction,
        locate_boundary_facets,
    )
    from fenics_constitutive_tpu.models import SpringKelvinModel
    from fenics_constitutive_tpu.models.interfaces import Constraint
    from fenics_constitutive_tpu.solver import PackedSimulation

    E0, E1, TAU, NU, SIGMA = 42.0, 10.0, 1.0, 0.2, 0.1
    mesh = unit_cube_mesh(4, 4, 4, "hex")
    V = FunctionSpace(mesh, 1, 3)

    def plane(axis, v):
        return lambda x: np.isclose(x[:, axis], v)

    # symmetry planes; the x=1 face carries the traction (no Dirichlet there)
    bcs = [
        DirichletBC(V.locate_dofs_geometrical(plane(0, 0.0), component=0), 0.0),
        DirichletBC(V.locate_dofs_geometrical(plane(1, 0.0), component=1), 0.0),
        DirichletBC(V.locate_dofs_geometrical(plane(2, 0.0), component=2), 0.0),
    ]
    facets = locate_boundary_facets(mesh, plane(0, 1.0))
    f_ext = assemble_facet_traction(V, facets, np.array([SIGMA, 0.0, 0.0]))

    law = SpringKelvinModel(
        {"E0": E0, "E1": E1, "tau": TAU, "nu": NU}, Constraint.FULL
    )
    # q_degree=2: 1-point quadrature on hexes has hourglass (zero-energy)
    # modes — a singular tangent that a tightly-converged CG then resolves
    # INTO, amplifying round-off into garbage steps (measured in r3; the
    # solver warns about this combination)
    sim = PackedSimulation(
        law, V, bcs, 2, del_t=1e-8, f_ext=f_ext,
        newton_rtol=1e-12, newton_atol=1e-10, cg_rtol=1e-12,
    )

    # elastic instant response (dt -> 0: the dashpot is rigid)
    niter, converged = sim.solve()
    assert converged
    eps0 = float(np.asarray(sim.histories[0]["strain"]).max())
    print(f"instant strain {eps0:.6f}  (analytic {SIGMA / E0:.6f})")
    assert abs(eps0 - SIGMA / E0) < 1e-8

    # the whole creep history: 40 steps of dt = tau/2 as ONE device dispatch
    sim.del_t = TAU / 2
    K = 40
    n_bc = len(combine_bcs(bcs)[0])
    stats = sim.solve_schedule(
        np.zeros((K, n_bc)), f_ext_scales=np.ones(K)
    )
    assert bool(stats["converged"].all())
    eps_inf = float(np.asarray(sim.histories[0]["strain"]).max())
    analytic = SIGMA / E0 + SIGMA / E1
    print(f"creep limit strain {eps_inf:.6f}  (analytic {analytic:.6f})")
    assert abs(eps_inf - analytic) < 1e-6

    outdir = pathlib.Path(out_dir)
    outdir.mkdir(parents=True, exist_ok=True)
    out = outdir / "creep_history.csv"
    times = np.concatenate([[0.0], np.cumsum(np.full(K, TAU / 2))])
    out.write_text(
        "t,max_strain\n"
        + f"0.0,{eps0:.9f}\n"
        + "".join(f"{t},{eps_inf:.9f}\n" for t in times[-1:])
    )
    print(f"creep_neumann example OK (history -> {out})")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else ".")
