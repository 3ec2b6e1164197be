"""Cell-subset map round-trips — the analog of the reference's
tests/solver/test_maps.py (random-subset round trip over 10 draws at exact
tolerance, maps.py:76-122; identity fast path, maps.py:124-154), plus a
multi-material BVP whose per-law QP blocks land in the right parent rows.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from fenics_constitutive_tpu.fem import DirichletBC, FunctionSpace, unit_cube_mesh
from fenics_constitutive_tpu.models import Constraint, LinearElasticityModel
from fenics_constitutive_tpu.solver import IncrSmallStrainProblem
from fenics_constitutive_tpu.solver.maps import build_cell_subset_map


@pytest.mark.parametrize("shape_tail", [(), (6,), (6, 6)])
def test_random_subset_roundtrip(shape_tail):
    """scalar / vector / tensor QP values round-trip exactly (maps.py:29-72)."""
    rng = np.random.default_rng(42)
    n_parent, Q = 64, 4
    for _ in range(10):
        k = rng.integers(1, n_parent + 1)
        cells = np.sort(rng.choice(n_parent, size=k, replace=False)).astype(np.int32)
        m = build_cell_subset_map(cells, n_parent)
        parent = jnp.asarray(rng.normal(size=(n_parent, Q, *shape_tail)))
        sub = m.map_to_sub(parent)
        assert sub.shape[0] == k
        back = m.map_to_parent(sub, parent)
        np.testing.assert_array_equal(np.asarray(back), np.asarray(parent))
        # overwrite semantics: a modified sub block lands exactly in its rows
        sub2 = sub + 1.0
        back2 = np.asarray(m.map_to_parent(sub2, parent))
        np.testing.assert_array_equal(back2[cells], np.asarray(sub2))
        mask = np.ones(n_parent, bool)
        mask[cells] = False
        np.testing.assert_array_equal(back2[mask], np.asarray(parent)[mask])


def test_identity_fast_path():
    m = build_cell_subset_map(np.arange(10, dtype=np.int32), 10)
    assert m.identity
    x = jnp.arange(10.0)
    assert m.map_to_sub(x) is x
    assert m.map_to_parent(x, jnp.zeros(10)) is x


def test_multimaterial_stress_blocks_land_in_parent_rows():
    """Two-material cube: each law's stress block occupies exactly its cells."""
    mesh = unit_cube_mesh(2, 2, 2, "tetra")
    V = FunctionSpace(mesh, 1, 3)
    half = mesh.num_cells // 2
    cells_a = np.arange(half, dtype=np.int32)
    cells_b = np.arange(half, mesh.num_cells, dtype=np.int32)
    laws = [
        (LinearElasticityModel({"E": 42.0, "nu": 0.3}, Constraint.FULL), cells_a),
        (LinearElasticityModel({"E": 84.0, "nu": 0.3}, Constraint.FULL), cells_b),
    ]

    def close(axis, v):
        return lambda x: np.isclose(x[:, axis], v)

    bcs = [
        DirichletBC(V.locate_dofs_geometrical(close(0, 0.0)), np.zeros(3)),
        DirichletBC(V.locate_dofs_geometrical(close(0, 1.0)), np.array([0.01, 0, 0.0])),
    ]
    problem = IncrSmallStrainProblem(laws, V, bcs, 1)
    n, converged = problem.solve()
    assert converged
    problem.update()
    s = np.asarray(problem.stress_0)
    assert np.abs(s[cells_a]).max() > 0 and np.abs(s[cells_b]).max() > 0
    # continuity of traction across the material interface plane x=0.5:
    # sigma_xx must be (approximately) equal on both sides for this 1D-like load
    sxx_a = s[cells_a, :, 0].mean()
    sxx_b = s[cells_b, :, 0].mean()
    assert abs(sxx_a - sxx_b) / abs(sxx_a) < 0.2  # same order; not a 1D bar
