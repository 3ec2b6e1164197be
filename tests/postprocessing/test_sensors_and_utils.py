"""Sensors (the reference's empty test_sensor.py, implemented), checkpoint
round-trip, and timers."""

import numpy as np
import pytest

import jax.numpy as jnp

from fenics_constitutive_tpu.fem import DirichletBC, FunctionSpace, unit_cube_mesh
from fenics_constitutive_tpu.models import VonMises3D
from fenics_constitutive_tpu.postprocessing import DisplacementSensor, QPSensor
from fenics_constitutive_tpu.solver import IncrSmallStrainProblem
from fenics_constitutive_tpu.utils import (
    get_timings,
    load_checkpoint,
    load_state_dict,
    reset_timings,
    save_checkpoint,
    state_dict,
    timed,
)

MAT = {
    "p_ka": 175000.0,
    "p_mu": 80769.0,
    "p_y0": 1200.0,
    "p_y00": 2500.0,
    "p_w": 200.0,
}


def make_problem():
    # 3x3x3: the structured-tet engine shards on the 64-node grid axis
    mesh = unit_cube_mesh(3, 3, 3, "tetra")
    V = FunctionSpace(mesh, 1, 3)

    def close(axis, v):
        return lambda x: np.isclose(x[:, axis], v)

    bc_move = DirichletBC(V.locate_dofs_geometrical(close(0, 1.0), component=0), 0.0)
    bcs = [
        DirichletBC(V.locate_dofs_geometrical(close(0, 0.0), component=0), 0.0),
        bc_move,
        DirichletBC(V.locate_dofs_geometrical(close(1, 0.0), component=1), 0.0),
        DirichletBC(V.locate_dofs_geometrical(close(2, 0.0), component=2), 0.0),
    ]
    return IncrSmallStrainProblem(VonMises3D(MAT), V, bcs, 1), bc_move, V


def test_displacement_sensor_linear_field():
    problem, bc_move, V = make_problem()
    bc_move.value = 0.02
    problem.solve()
    problem.update()
    sensor = DisplacementSensor(V, [[0.5, 0.25, 0.25], [1.0, 0.0, 0.0]])
    vals = np.asarray(sensor(problem.u))
    # ux is affine in x for this BVP
    assert vals[0, 0] == pytest.approx(0.01, rel=1e-8)
    assert vals[1, 0] == pytest.approx(0.02, rel=1e-12)


@pytest.mark.slow
def test_qp_sensor_reads_stress():
    problem, bc_move, V = make_problem()
    bc_move.value = 0.02
    problem.solve()
    problem.update()
    sensor = QPSensor(V, 1, [[0.4, 0.4, 0.4]])
    s = np.asarray(sensor(problem.stress_0))
    assert s.shape == (1, 6)
    # homogeneous state: matches any other QP
    np.testing.assert_allclose(
        s[0], np.asarray(problem.stress_0).reshape(-1, 6)[0], rtol=1e-9, atol=1e-9
    )


@pytest.mark.slow
def test_checkpoint_roundtrip(tmp_path):
    """Committed state is a resumable snapshot (SURVEY §5.4): a restored run
    continues bit-identically."""
    problem, bc_move, V = make_problem()
    for k in (1, 2):
        bc_move.value = 0.01 * k
        problem.solve()
        problem.update()

    path = tmp_path / "ckpt.npz"
    save_checkpoint(path, state_dict(problem))

    # continue the original
    bc_move.value = 0.03
    problem.solve()
    problem.update()
    u_ref = np.asarray(problem.u)

    # fresh problem, resume, continue identically
    problem2, bc_move2, _ = make_problem()
    load_state_dict(problem2, load_checkpoint(path))
    bc_move2.value = 0.03
    problem2.solve()
    problem2.update()
    np.testing.assert_array_equal(np.asarray(problem2.u), u_ref)
    assert problem2.sim_time.current == problem.sim_time.current


def test_timers():
    reset_timings()

    @timed("unit-test-scope")
    def f(x):
        return x + 1

    for _ in range(3):
        f(1)
    n, total = get_timings()["unit-test-scope"]
    assert n == 3 and total >= 0.0


@pytest.mark.slow
def test_checkpoint_orbax_sharded_roundtrip(tmp_path):
    """Orbax checkpointing round-trips a GSPMD-SHARDED committed state with
    shardings reapplied on restore (the at-scale analog of the reference's
    adios4dolfinx MPI serialization, SURVEY §5.4) — the npz path would
    gather to host and lose the layout."""
    pytest.importorskip("orbax")
    import jax

    from fenics_constitutive_tpu.parallel import make_device_mesh, shard_problem
    from fenics_constitutive_tpu.utils import (
        load_checkpoint_orbax,
        save_checkpoint_orbax,
    )

    problem, bc_move, V = make_problem()
    shard_problem(problem, make_device_mesh(8))
    for k in (1, 2):
        bc_move.value = 0.01 * k
        problem.solve()
        problem.update()

    path = tmp_path / "ckpt_orbax"
    snap = state_dict(problem)
    save_checkpoint_orbax(path, snap)

    bc_move.value = 0.03
    problem.solve()
    problem.update()
    u_ref = np.asarray(problem.u)

    problem2, bc_move2, _ = make_problem()
    shard_problem(problem2, make_device_mesh(8))
    restored = load_checkpoint_orbax(path, like=state_dict(problem2))
    load_state_dict(problem2, restored)
    # shardings survive the round trip (restored onto the template layout)
    s_prev = problem2._stress_prev
    leaf = s_prev[0] if isinstance(s_prev, tuple) else s_prev
    if len(jax.devices()) >= 8:
        assert not restored_is_fully_replicated(leaf)
    bc_move2.value = 0.03
    problem2.solve()
    problem2.update()
    np.testing.assert_array_equal(np.asarray(problem2.u), u_ref)


def restored_is_fully_replicated(leaf):
    return leaf.sharding.is_fully_replicated


def test_sensor_graded_mesh_beyond_candidate_window():
    """A huge cell whose midpoint is farther than dozens of tiny-cell
    midpoints: the all-cells fallback must still locate the point (the old
    30-nearest-midpoints heuristic missed it)."""
    from fenics_constitutive_tpu.fem.mesh import Mesh
    from fenics_constitutive_tpu.postprocessing.sensors import DisplacementSensor

    xs = np.concatenate([np.linspace(0.0, 0.5, 41), [10.0]])
    nodes = xs[:, None]
    cells = np.stack(
        [np.arange(len(xs) - 1), np.arange(1, len(xs))], axis=1
    ).astype(np.int32)
    mesh = Mesh(nodes, cells, "interval")
    V = FunctionSpace(mesh, 1, 1)
    # linear field u = 3x + 1; sample inside the huge cell near its left end
    u = 3.0 * V.dof_coords[:, 0] + 1.0
    sensor = DisplacementSensor(V, [[0.55]])
    val = np.asarray(sensor(jnp.asarray(u)))
    np.testing.assert_allclose(val, [[3.0 * 0.55 + 1.0]], rtol=1e-12)


def test_sensor_distorted_quad():
    """Non-affine (trapezoidal) quads: the Newton inverse map locates points
    the affine one-shot solve mislocates; Q1 isoparametric interpolation of a
    linear field is exact, so the sampled value pins the located xi."""
    from dataclasses import replace

    from fenics_constitutive_tpu.fem import unit_square_mesh
    from fenics_constitutive_tpu.postprocessing.sensors import DisplacementSensor

    mesh = unit_square_mesh(4, 4, "quad")
    nodes = mesh.nodes.copy()
    # shear the interior: x' = x + 0.2 * x * (1 - x) * y makes every cell a
    # distinct trapezoid (boundary stays put)
    nodes[:, 0] = nodes[:, 0] + 0.2 * nodes[:, 0] * (1 - nodes[:, 0]) * nodes[:, 1]
    mesh = replace(mesh, nodes=nodes, structured_shape=None)
    V = FunctionSpace(mesh, 1, 2)
    u = np.stack(
        [2.0 * V.dof_coords[:, 0] - V.dof_coords[:, 1], V.dof_coords[:, 1]],
        axis=1,
    ).reshape(-1)
    pts = [[0.52, 0.37], [0.13, 0.81], [0.97, 0.55]]
    sensor = DisplacementSensor(V, pts)
    vals = np.asarray(sensor(jnp.asarray(u)))
    want = np.asarray(
        [[2.0 * x - y, y] for x, y in pts]
    )
    np.testing.assert_allclose(vals, want, rtol=1e-9, atol=1e-12)
