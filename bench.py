"""Headline benchmark: 1M-quadrature-point von Mises plasticity Newton step.

Runs on the real TPU chip. Workload = BASELINE.json's north-star config: a
50x50x50 hex mesh with 2x2x2 Gauss points = exactly 1,000,000 QPs, von Mises
with nonlinear isotropic hardening driven past yield. One "Newton step" =
constitutive evaluation (batched masked radial-return Newton) + residual
assembly + Jacobi diagonal + fixed-count CG on the factored consistent
tangent + state threading, compiled as ONE XLA program on the packed SoA
engine (ops/packed.py).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "r_norm",
"r_norm_ref", "converged"}.

The bench SELF-VERIFIES: the timed step uses a fixed-iteration CG (no
convergence sync), so every run re-runs the SAME load schedule with a
definitely-converged deep fixed count (BENCH_VERIFY_ITERS, default 40 — the
Newton residual saturates at the linearization error well before that, so
this equals the adaptive-CG residual; r2 calibration: adaptive rtol-1e-5
2.3376 vs fixed-40-class solves within 0.05%) and asserts the timed scan's
settled residual is within 2% of that in-run reference. A regression in the
V-cycle, the Mises kernel, or the fixed count itself makes the run FAIL
(converged=false + exit 1) instead of silently timing an under-converged
step. Deliberate check: ``BENCH_FIXED_ITERS=4 python bench.py`` must fail.

vs_baseline: BASELINE.json targets "1M-QP Mises Newton step < 10 ms on v5p-8"
(8 chips = 80 chip-ms per step). vs_baseline = 80 / (value_ms * n_chips), so
>= 1.0 beats the per-chip-normalized target. The reference itself publishes no
performance numbers (BASELINE.md) — its VonMises3D is a per-QP Python loop.

Multi-chip mode: ``python bench.py --sharded N`` runs the SAME step with the
QP state sharded over an N-device mesh (GSPMD; the sharding validated by
tests/parallel/test_sharding.py) and reports the per-chip-normalized metric.
Without ``--real`` it forces N virtual CPU devices (proof-of-mechanics on a
single-chip host — the numbers are CPU numbers); with ``--real`` it uses the
first N devices of the default backend, so on real multi-chip TPU hardware
the number is ``python bench.py --sharded N --real`` away.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

# Envelope: the timed scan's settled Newton residual must be within this
# factor of the in-run deep-CG (BENCH_VERIFY_ITERS) reference residual.
# History: the r2 offline calibration (scripts/ab_fixed_count.py) measured
# the fixed-11 residual 0.04% above the adaptive rtol-1e-5 one at a
# big-jump state; the in-run reference replaces that stale constant.
R_NORM_ENVELOPE = 1.02


def main() -> None:
    import argparse
    import os

    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument(
        "--sharded", type=int, default=0, metavar="N",
        help="shard the QP state over an N-device mesh (default: single chip)",
    )
    ap.add_argument(
        "--real", action="store_true",
        help="with --sharded: use the default backend's first N devices "
        "instead of forcing N virtual CPU devices",
    )
    args = ap.parse_args()
    n_sh = args.sharded
    cpu_proof = bool(n_sh) and not args.real

    if cpu_proof:
        # must happen BEFORE the backend initializes (same sequence as
        # __graft_entry__.dryrun_multichip / tests/conftest.py)
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + f" --xla_force_host_platform_device_count={n_sh}"
            ).strip()

    import jax
    import jax.numpy as jnp

    if cpu_proof:
        jax.config.update("jax_platforms", "cpu")

    from fenics_constitutive_tpu.fem import DirichletBC, FunctionSpace, unit_cube_mesh
    from fenics_constitutive_tpu.fem.bcs import combine_bcs
    from fenics_constitutive_tpu.models import VonMises3D
    from fenics_constitutive_tpu.solver.packed_step import (
        build_packed_problem,
        make_packed_step,
    )

    # 50^3 hexes x 8 QP = 1,000,000 QPs (headline). BENCH_N shrinks the mesh
    # for A/B runs. Self-verification runs at EVERY config; off the
    # calibrated headline state (n=50, single chip) the deep-CG reference is
    # additionally checked against a 2x-deeper run, so 'converged: true' is
    # trustworthy for resized/sharded invocations too.
    default_n = 24 if cpu_proof else 50
    n = int(os.environ.get("BENCH_N", str(default_n)))
    mesh = unit_cube_mesh(n, n, n, "hex")
    V = FunctionSpace(mesh, 1, 3)

    def close(axis, v):
        return lambda x: np.isclose(x[:, axis], v)

    bcs = [
        DirichletBC(V.locate_dofs_geometrical(close(0, 0.0), component=0), 0.0),
        DirichletBC(V.locate_dofs_geometrical(close(0, 1.0), component=0), 0.004),
        DirichletBC(V.locate_dofs_geometrical(close(1, 0.0), component=1), 0.0),
        DirichletBC(V.locate_dofs_geometrical(close(2, 0.0), component=2), 0.0),
    ]
    law = VonMises3D(
        {
            "p_ka": 175000.0,
            "p_mu": 80769.0,
            "p_y0": 1200.0,
            "p_y00": 2500.0,
            "p_w": 200.0,
        }
    )

    geos, models, state = build_packed_problem(V, law, q_degree=2)
    n_qp = geos[0].N
    if n == 50:
        assert n_qp == 1_000_000, n_qp

    if n_sh:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from fenics_constitutive_tpu.parallel import make_device_mesh

        assert len(jax.devices()) >= n_sh, (
            f"need {n_sh} devices, have {len(jax.devices())}"
        )
        dmesh = make_device_mesh(n_sh)
        repl = NamedSharding(dmesh, P())

        def qp_shard(a):
            """Shard on the trailing flat-QP axis; replicate if indivisible."""
            if a.shape[-1] % n_sh == 0:
                return jax.device_put(
                    a, NamedSharding(dmesh, P(*([None] * (a.ndim - 1)), "cells"))
                )
            return jax.device_put(a, repl)

        state = type(state)(
            u=jax.device_put(state.u, repl),
            stress=tuple(qp_shard(s) for s in state.stress),
            histories=tuple(
                {k: qp_shard(v) for k, v in h.items()} if h is not None else None
                for h in state.histories
            ),
            t=jax.device_put(state.t, repl),
        )

    # one Newton iteration per dispatch (max_newton=1), linear solve CONVERGED
    # to rtol 1e-5 with the multiplicative V-cycle. History: BPX won round 1
    # when the conv engine's fine apply cost 1.2 ms; the flat index-space
    # engine dropped it to ~0.02 ms, so the V-cycle's better convergence
    # (23 vs 76 CG iterations at the bench state) now wins on wall-clock
    # (measured: 36 vs 56 device-ms per converged step).
    from fenics_constitutive_tpu.solver.multigrid import build_multigrid

    bc_dofs, bc_vals = combine_bcs(bcs)
    free0 = jnp.ones(V.ndofs, bool).at[jnp.asarray(bc_dofs)].set(False)
    # V(3,3) cycle: the r2 sweep (scripts/ab_nu_fixed.py) measured nu=3 with
    # fixed-16 CG beating nu=2/fixed-22 (34.6 vs 37.6 ms/step) — heavier
    # smoothing per cycle buys more than its cost once the fine apply is the
    # folded elastic matmul. (The fused Pallas smoothing chains were measured
    # SLOWER here — Mosaic pays lane rotations for the misaligned corner
    # shifts that XLA's pad/slice fusion handles well; kept as an option.)
    mg = build_multigrid(
        geos[0], 80769.0, 175000.0, free0,
        nu=int(os.environ.get("BENCH_NU", "3")),
        nu_coarse=int(os.environ.get("BENCH_NU_COARSE", "2")),
        coarse_direct=True,
    )
    # CG runs a fixed 9-iteration fori_loop (no per-iteration convergence
    # dot / while-loop sync). Every run re-verifies the count against the
    # in-run deep-CG reference (see below); the r3 sweep on the real-ramp
    # schedule measured settled residuals fixed-9 1.4049 vs deep-40 1.4045
    # (+0.03%, passes), fixed-8 1.4497 (+3.3%, FAILS), fixed-11 1.3964.
    # 9 is the honest minimum: 18.6 ms/step vs 21.9 (fixed-11).
    fixed_iters = int(os.environ.get("BENCH_FIXED_ITERS", "9"))
    step = make_packed_step(
        geos, max_newton=1, newton_rtol=0.0, newton_atol=0.0,
        cg_rtol=1e-5, cg_maxiter=400, preconditioner=mg,
        cg_fixed_iters=fixed_iters,
    )
    bc_dofs_j = jnp.asarray(bc_dofs)
    bc_vals_j = jnp.asarray(bc_vals, state.u.dtype)
    f_ext = jnp.zeros(V.ndofs, state.u.dtype)
    dt = jnp.asarray(1.0, state.u.dtype)

    # the timed unit: a REAL load ramp from a FIXED past-yield state. Each
    # scanned step adds +0.05 load scale (= 2e-4 boundary displacement, the
    # reference's own per-step granularity in its 100-step plasticity ramps)
    # so every step does a representative plastic Newton iteration — NOT a
    # quiescent micro-increment (an earlier bench version ramped by 1e-6 per
    # step, under which even a fixed-8 CG "converges"; honest steps need the
    # full count). Windows vary by a 1e-4 scale offset so every timed call
    # does identical work on distinct inputs (the remote-TPU tunnel memoizes
    # byte-identical dispatches). K steps run per dispatch so the tunnel's
    # per-dispatch latency amortizes.
    jitted = jax.jit(
        lambda st, scale: step(models, st, bc_dofs_j, bc_vals_j * scale, f_ext, dt)
    )

    K_STEPS = int(os.environ.get("BENCH_STEPS", "4" if cpu_proof else "48"))
    # steps per dispatch: production stepping runs many steps
    # device-side per host round trip (PackedSimulation.solve_schedule is
    # exactly this pattern as a public API, and the reference's own tests
    # drive 100-step load paths, tests/models/test_plasticity.py:96); this
    # amortizes the tunnel's per-dispatch latency (measured 80-150 ms
    # depending on session) the same way a real load-path run does. The
    # schedule compiles as one lax.scan (one step trace, K trips).

    def make_stepsK(step_fn):
        def stepsK(st, scales):
            def body(carry, scale):
                s_out, stats = step_fn(
                    models, carry, bc_dofs_j, bc_vals_j * scale, f_ext, dt
                )
                return s_out, stats["r_norm"]

            s_out, probes = jax.lax.scan(body, st, scales)
            return probes, s_out

        return jax.jit(stepsK)

    jittedK = make_stepsK(step)

    st = state
    for k in (0.5, 1.0, 1.5):  # warmup + drive past yield (compile included)
        st, stats = jitted(st, jnp.asarray(k, state.u.dtype))
    jax.block_until_ready(st.u)

    # min over several windows: the tunnel adds sporadic latency
    best = float("inf")
    j = 0

    def mkscales(j):
        return jnp.asarray(
            [2.0 + 1e-4 * j + 0.05 * i for i in range(K_STEPS)],
            state.u.dtype,
        )

    debug = os.environ.get("BENCH_DEBUG")
    probes = jax.block_until_ready(jittedK(st, mkscales(0)))[0]  # compile
    n_windows = 1 if cpu_proof else 4
    window_ms = []
    for _w in range(n_windows):
        j += 1
        t0 = time.perf_counter()
        probes, out_state = jittedK(st, mkscales(j))
        jax.block_until_ready(probes)
        window_ms.append((time.perf_counter() - t0) / K_STEPS * 1000.0)
        best = min(best, window_ms[-1] / 1000.0)
    if debug:
        print(f"windows ms/step: {[round(w, 3) for w in window_ms]}",
              file=sys.stderr)
    # the remote-TPU tunnel can return a cached result despite the varied
    # scales (sporadic; root cause in the tunnel, not XLA) — a window faster
    # than one tunnel ROUND TRIP (~80 ms per dispatch; each window is one
    # dispatch regardless of K_STEPS) is physically impossible, so discard
    # such windows rather than report fiction. The guard only applies on the
    # remote ("axon") tunnel backend: local CPU/TPU runs have no round-trip
    # floor, so a legitimately fast small-K run must not be discarded.
    tunneled = not cpu_proof and jax.default_backend() == "axon"
    plausible = [w for w in window_ms if not tunneled or w * K_STEPS >= 50.0]
    if not plausible:
        print(
            f"FAIL: every timing window {[round(w, 3) for w in window_ms]} "
            "is faster than one tunnel round trip — the tunnel memoized the "
            "whole run; no honest number exists. Re-run.", file=sys.stderr,
        )
        sys.exit(1)
    if len(plausible) < len(window_ms):
        best = min(plausible) / 1000.0
        print(
            f"WARN: discarded {len(window_ms) - len(plausible)} implausibly "
            f"fast window(s) {[round(w, 3) for w in window_ms]} (tunnel "
            "memoization)", file=sys.stderr,
        )

    ms_per_step = best * 1000.0
    n_chips = n_sh if n_sh else jax.device_count()
    vs_baseline = 80.0 / (ms_per_step * n_chips)

    # ---- in-run self-verification of the fixed CG count ---------------------
    # re-run the SAME schedule with a deep fixed count: the Newton residual
    # saturates at the linearization error once the linear solve is converged
    # (measured r2: adaptive rtol-1e-5 vs fixed-12 within 0.2%), so the deep
    # run IS the converged-step reference. The timed scan's settled (final
    # probe, i.e. hardest/deepest-plastic state) residual must match it to
    # R_NORM_ENVELOPE. BENCH_VERIFY_ITERS=0 skips (e.g. for pure-timing A/Bs).
    verify_iters = int(os.environ.get("BENCH_VERIFY_ITERS", "40"))
    r_norm_settled = float(np.asarray(probes)[-1])
    r_norm_ref = None
    r_norm_ref2 = None
    converged = True

    def deep_ref(iters):
        step_ref = make_packed_step(
            geos, max_newton=1, newton_rtol=0.0, newton_atol=0.0,
            cg_rtol=1e-5, cg_maxiter=400, preconditioner=mg,
            cg_fixed_iters=iters,
        )
        probes_ref = jax.block_until_ready(
            make_stepsK(step_ref)(st, mkscales(j))
        )[0]
        return float(np.asarray(probes_ref)[-1])

    if verify_iters:
        r_norm_ref = deep_ref(verify_iters)
        converged = r_norm_settled <= R_NORM_ENVELOPE * r_norm_ref
        # off the calibrated headline config (n=50, single chip), the deep
        # reference itself is unswept — a resized/sharded problem could need
        # more than fixed-40, making BOTH runs under-converged and the ratio
        # meaninglessly green. Verify the verifier: a 2x-deeper scan must
        # agree with it (the Newton residual saturates at linearization
        # error once the linear solve converges, so deep == 2x-deep iff
        # deep is converged).
        if n != 50 or n_sh:
            r_norm_ref2 = deep_ref(2 * verify_iters)
            converged = converged and (
                r_norm_ref <= R_NORM_ENVELOPE * r_norm_ref2
            )

    metric = "mises_1MQP_newton_step_converged"
    if n_sh:
        metric += f"_sharded{n_sh}" + ("cpu" if cpu_proof else "")
    print(
        json.dumps(
            {
                "metric": metric,
                "value": round(ms_per_step, 3),
                "unit": "ms",
                "vs_baseline": round(vs_baseline, 4),
                "r_norm": round(r_norm_settled, 4),
                "r_norm_ref": None if r_norm_ref is None else round(r_norm_ref, 4),
                **(
                    {"r_norm_ref2": round(r_norm_ref2, 4)}
                    if r_norm_ref2 is not None
                    else {}
                ),
                "converged": converged,
            }
        )
    )
    if not converged:
        print(
            f"FAIL: settled scanned r_norm {r_norm_settled:.4f} exceeds "
            f"{R_NORM_ENVELOPE} x the in-run deep-CG (fixed-{verify_iters}) "
            f"reference {r_norm_ref:.4f}; the fixed-{fixed_iters} CG step is "
            "under-converged — raise BENCH_FIXED_ITERS or fix the regression.",
            file=sys.stderr,
        )
        sys.exit(1)


if __name__ == "__main__":
    main()
