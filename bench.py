"""Benchmark: the reference's headline TEAM7-modified case on one chip.

Runs the full 100-step transient of ``compare_to_Elmer.vxc`` (102x102x24
voxels, tol 5e-3 — reference wall time ~365 s / ~3.65 s per step on the
README's machine, README.md:110-111) and prints one JSON line with the
measured time per timestep and the speedup vs that baseline.

Usage: python bench.py [--case team7|lim|move] [--steps N] [--f64]

Extra modes (all still print exactly one JSON line):

* ``--mode roofline``: time the fused stencil matvec on the case's operator
  and report effective SpMV nnz/s as a fraction of the *measured* HBM
  streaming bandwidth of the chip (a triad kernel measures the speed of
  light; the BASELINE target is >=70%).
* ``--mode scaling --devices N``: weak-scaling efficiency of the sharded
  step on an N-virtual-device CPU mesh (the multi-host test strategy —
  z extent and device count scale together; ideal == 1.0).
* ``--mode scale256``: the BASELINE "scaled LIM at 256^3"-class config — a
  large synthetic conducting-plate problem stepped with the production
  stencil path (reports time/step; no reference baseline exists, so
  vs_baseline is nnz/s in millions).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


BASELINES = {
    # reference end-to-end seconds / steps (README.md:110,188,235)
    "team7": (365.0, 100, "/root/reference/src/compare_to_Elmer.vxc"),
    "move": (295.0, 100, "/root/reference/src/ec_src_move_hole.vxc"),
    "lim": (105.0, 200, "/root/reference/src/LIM.vxc"),
}

# production solve configuration per case — the measured winner of the
# recorded `--mode precond` shoot-out for EVERY workload (round 4,
# full-transient subprocess runs on TPU v5e with the conductor-gated
# fused coded kernel; tables in BENCH_ALL_r04.json).  Delta-form right
# preconditioning preserves the reference's ||b - A x||/||b|| < tol
# stopping criterion (solvers/bicgstab.py: bicgstab_wr_right), so this is
# pure speed.  The optimum is workload-dependent AND kernel-cost-
# dependent — it was measured, not extrapolated, and it moved twice this
# round as the matvec got cheaper: with the 12.8-us gated matvec team7
# wins with order-8 Chebyshev-on-Jacobi (3.52 ms/step at 9.4 iters,
# 1038x), move's recorded winner is plain Jacobi (3.67 ms at 56.7 iters,
# 805x; cheb8 ties within 1% run-to-run), LIM keeps plain Jacobi
# (1.38 ms, 380x; the polynomial's fixed per-apply vector work loses at
# small grids), and scale256 stays unpreconditioned.
BEST_CONFIG = {
    "team7": {"precond": "cheb_jacobi", "cheb_order": 8},
    "move": {"precond": "jacobi"},
    "lim": {"precond": "jacobi"},
    # the 256^3-class synthetic scale case (--mode scale256), measured by
    # `--mode precond --case scale256` (subprocess shoot-out, 10 steps;
    # round 5, with the y-tiled CODED operator engaged): UNPRECONDITIONED
    # wins again (62.6 ms/step at 27.6 iters vs cheb 82.9 @ 10.2, ilu0
    # 83.5 @ 7.8, jacobi 84.8, cheb_jacobi 94.8, cheb8 133.2 @ 6.0; mg is
    # rejected typed above 2.5M cells).  At 4.2M cells the step is bound
    # by per-iteration state traffic (dots/axpys on 67 MB State), so
    # preconditioners that multiply operator applies lose even at 3-5x
    # fewer iterations.
    "scale256": {},
}


def ap_default_shape() -> str:
    return "256,256,64"


def _force(x) -> float:
    """Truly synchronize: reduce on device, fetch the scalar to host.
    (Over the remote-TPU tunnel ``block_until_ready`` returns before the
    computation finishes; a host readback is the only reliable barrier.)"""
    import jax
    import jax.numpy as jnp
    import numpy as np

    leaves = jax.tree.leaves(x)
    return float(np.asarray(sum(jnp.sum(l) for l in leaves)))


def _rtt() -> float:
    """Measured host<->device round-trip latency (dispatch + readback of a
    trivial scalar) — subtracted from chained-kernel timings."""
    import jax
    import jax.numpy as jnp

    f = jax.jit(lambda a: jnp.sum(a))
    z = jnp.zeros(8, jnp.float32)
    _force(f(z))
    t0 = time.perf_counter()
    _force(f(z))
    return time.perf_counter() - t0


def _emit(metric, value, unit, vs_baseline, **extra):
    print(json.dumps({"metric": metric, "value": round(value, 6),
                      "unit": unit, "vs_baseline": round(vs_baseline, 4),
                      **extra}))
    return 0


def _load(path, fallback_shape, steps):
    from eddy_currents_3d_tpu.models.vxc import read_vxc
    from eddy_currents_3d_tpu.testing.cases import case_static, load_case

    if path and os.path.exists(path):
        return read_vxc(path)
    return load_case(case_static(shape_xyz=fallback_shape, steps=steps))


def run_roofline(args) -> int:
    """Effective stencil-SpMV nnz/s vs measured HBM streaming bandwidth."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from eddy_currents_3d_tpu.assembly.assemble import assemble_operator
    from eddy_currents_3d_tpu.assembly.stencil import State
    from eddy_currents_3d_tpu.ops import pallas_stencil

    if args.shape and args.mode == "roofline" and args.shape != ap_default_shape():
        from eddy_currents_3d_tpu.testing.cases import case_static, load_case
        shape = tuple(int(v) for v in args.shape.split(","))
        model = load_case(case_static(shape_xyz=shape, steps=2))
    else:
        _, base_steps, path = BASELINES[args.case]
        model = _load(path, (102, 102, 24), base_steps)
    sysm = assemble_operator(model, jnp.float32)
    csize = 4
    if args.coeff_dtype == "bf16":
        import dataclasses
        sysm = dataclasses.replace(sysm, op=sysm.op.astype(jnp.bfloat16))
        csize = 2
    # matrix nnz actually encoded in the coefficient streams: each ka offset
    # field feeds all three A components
    nnz = (3 * np.count_nonzero(sysm.np_ka) + np.count_nonzero(sysm.np_gu)
           + np.count_nonzero(sysm.np_ku) + np.count_nonzero(sysm.np_da))

    use_pallas = pallas_stencil.pallas_available()
    nz, ny, nx = sysm.np_ka.shape[1:]
    rng = np.random.default_rng(0)
    st = State(jnp.asarray(rng.standard_normal((3, nz, ny, nx)), jnp.float32),
               jnp.asarray(rng.standard_normal((nz, ny, nx))
                           * np.asarray(sysm.cond_mask), jnp.float32))
    if args.op == "coded":
        from eddy_currents_3d_tpu.ops.pallas_coded import (
            from_assembled_coded, traffic_bytes)
        op = from_assembled_coded(sysm, model)
        st = op.pad_state(st)
        apply_fn = op.apply
        coeff = None
        bytes_mv = traffic_bytes(op)   # exact chunk layout + DMA gating
        n_state = int(st.A.size + st.U.size)
    elif use_pallas:
        op = pallas_stencil.from_assembled(sysm)
        st = op.pad_state(st)
        apply_fn = op.apply
        coeff = sum(int(a.size) for a in (op.ka_p, op.gu_p, op.ku_p, op.da_p))
        n_state = int(st.A.size + st.U.size)
    else:
        op = sysm.op
        apply_fn = op.apply
        coeff = sum(int(np.asarray(a).size)
                    for a in (sysm.np_ka, sysm.np_gu, sysm.np_ku, sysm.np_da))
        n_state = int(st.A.size + st.U.size)
    # bytes per matvec: the coded op uses its exact traffic model (chunk
    # layout + measured conductor-z DMA gating, ops/pallas_coded.py
    # traffic_bytes); the field ops assume every coefficient streams once
    # and the state is read + written once
    if coeff is not None:
        bytes_mv = csize * coeff + 4 * 2 * n_state

    def chain_of(reps):
        @jax.jit
        def chain(s):
            def body(_, s):
                y = apply_fn(s)
                # rescale to keep the iterated state finite (fuses in)
                return State(y.A * 1e-4, y.U * 1e-4)
            s = jax.lax.fori_loop(0, reps, body, s)
            return jnp.sum(s.A) + jnp.sum(s.U)
        return chain

    def timed(fn, *args):
        """Median of 5 host-synced wall times."""
        _force(fn(*args))
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            _force(fn(*args))
            ts.append(time.perf_counter() - t0)
        return sorted(ts)[len(ts) // 2]

    def diffed(c2, c1, R, *args):
        """t(2R) - t(R) cancels dispatch/readback latency.  The chip
        behind the tunnel drifts in speed run-to-run (measured marginal
        per-rep times vary ~2x between adjacent R points), so take the
        MEDIAN of five interleaved difference pairs and report the spread
        — an early exit on the first positive difference (the round-4
        scheme) systematically selected low-side fluctuations and
        inflated the roofline metric past 100%."""
        ds = []
        for _ in range(5):
            ds.append(timed(c2, *args) - timed(c1, *args))
        ds = [max(d, 1e-9) / R for d in sorted(ds)]
        return ds[len(ds) // 2], ds[0], ds[-1]

    # R sized so the differenced work is ~40 ms at any grid size
    R = int(min(2048, max(96, 3.0e10 // bytes_mv)))
    t_mv, t_mv_min, t_mv_max = diffed(chain_of(2 * R), chain_of(R), R, st)

    # measured speed of light: same two-point chained triad on big
    # buffers.  The buffers must be far larger than VMEM: a triad sized
    # to the operator's ~10-50 MB working set stays VMEM-resident across
    # loop iterations and reads 8.9-17.6 TB/s (measured round 5) — not
    # an HBM bound at all.  Runtime random inputs so nothing
    # constant-folds.
    big = 1 << 26  # 64M f32 per array (768 MB of triad traffic per rep)
    x = jax.random.normal(jax.random.PRNGKey(0), (big,), jnp.float32)
    y = jax.random.normal(jax.random.PRNGKey(1), (big,), jnp.float32)

    def triad_of(reps):
        return jax.jit(lambda a, b: jnp.sum(
            jax.lax.fori_loop(0, reps, lambda _, a: a * 0.999 + 2.0 * b, a)))

    Rt = int(min(2048, max(48, 3.0e10 // (3 * big * 4))))
    t_triad, _, _ = diffed(triad_of(2 * Rt), triad_of(Rt), Rt, x, y)
    stream_bw = 3 * big * 4 / t_triad            # bytes/s, measured triad

    # The bound is the larger of the measured triad and the chip's
    # nominal HBM bandwidth: the XLA triad achieves only ~78% of the v5e
    # spec (measured 641 GB/s vs 819), while the hand-pipelined coded
    # kernel reaches ~93% of spec — dividing by the triad alone pushed
    # the metric past 100% (the round-4 confusion).  bytes_mv for the
    # coded op is its exact traffic model (measured DMA gating included,
    # ops/pallas_coded.traffic_bytes); for the field ops it is the
    # once-per-operand assumption.
    nominal = {"tpu": 819e9, "axon": 819e9}.get(
        jax.devices()[0].platform, 0.0)         # TPU v5e HBM spec
    bound_bw = max(stream_bw, nominal)
    achieved_bw = bytes_mv / t_mv
    pct = 100.0 * achieved_bw / bound_bw
    tag = "_bf16" if args.coeff_dtype == "bf16" else ""
    if args.op == "coded":
        tag += "_coded"
    return _emit(
        f"{args.case}_spmv_roofline{tag}", pct, "% of measured HBM stream", pct / 70.0,
        nnz_per_s=round(nnz / t_mv / 1e6, 1),
        matvec_us=round(t_mv * 1e6, 1),
        matvec_us_min=round(t_mv_min * 1e6, 1),
        matvec_us_max=round(t_mv_max * 1e6, 1),
        stream_gbps=round(stream_bw / 1e9, 1),
        bound_gbps=round(bound_bw / 1e9, 1),
        bytes_mv=int(bytes_mv),
        backend=jax.devices()[0].platform,
        **({"excess_note": (
            "pct > 100 means the traffic MODEL divided by wall time "
            "exceeds the nominal-HBM bound; the residual excess is "
            "bounded by the model's revolving-window z-neighbor-plane "
            "term (~15% of modeled bytes on TEAM7, re-fetched planes "
            "the pipeliner may coalesce with adjacent chunk fetches) "
            "and by read-heavy mixes exceeding the symmetric-spec "
            "number — the kernel is at the streaming limit either "
            "way, the uncertainty is which accounting of it")}
           if pct > 100.0 else {}),
    )


def run_scaling(args) -> int:
    """Weak-scaling overhead of the sharded matvec on one host: N virtual
    devices do N devices' work on the same silicon, so ideal wall time is
    N x the 1-device time; the metric is (N*t1)/tN (1.0 = zero sharding
    overhead).  On real multi-chip hardware the same harness measures true
    weak scaling.  Mesh runs go through the explicit shard_map tier
    (parallel/shard_op.py: per-shard kernels + halo ppermute)."""
    import jax
    import jax.numpy as jnp
    from eddy_currents_3d_tpu.parallel.mesh import make_mesh
    from eddy_currents_3d_tpu.sim.simulate import Simulation
    from eddy_currents_3d_tpu.testing.cases import case_static, load_case

    from eddy_currents_3d_tpu.assembly.stencil import State

    d = args.devices
    base_z = 16
    R = 32

    def time_matvec(nz, mesh):
        """Seconds per sharded operator application (the weak-scaled unit of
        solver work; full-solve timing would confound scaling with the
        iteration-count change of a physically larger domain)."""
        model = load_case(case_static(shape_xyz=(64, 64, nz), steps=3))
        sim = Simulation(model, dtype=jnp.float32, mesh=mesh, donate=False)
        if sim.shard_op is not None:
            apply_fn = sim.shard_op.apply
            st = sim.init_state()
            x = sim.shard_op.pad_state(State(st.A + 1.0, st.U))
        else:
            apply_fn = sim.system.op.apply
            st = sim.init_state()
            x = State(st.A + 1.0, st.U)

        @jax.jit
        def chain(s):
            def body(_, s):
                y = apply_fn(s)
                return State(y.A * 1e-2, y.U * 1e-2)
            s = jax.lax.fori_loop(0, R, body, s)
            return jnp.sum(s.A) + jnp.sum(s.U)

        _force(chain(x))
        t0 = time.perf_counter()
        _force(chain(x))
        return (time.perf_counter() - t0) / R

    # median of >=5 interleaved (t1, tN) pairs with spread: a single
    # sample on a shared-host CPU mesh ranged ~0.9-1.3 across rounds
    # (round-4 VERDICT weak #7), which certifies nothing; the median plus
    # min/max makes rounds comparable
    effs = []
    for _ in range(5):
        t1 = time_matvec(base_z, None)
        tN = time_matvec(base_z * d, make_mesh(d, 1))
        effs.append((d * t1 / tN, t1, tN))
    effs.sort()
    eff, t1, tN = effs[len(effs) // 2]
    # honest label: on one host this bounds sharding *overhead*, not true
    # weak scaling (all virtual devices share the same silicon); on a real
    # pod the identical harness measures weak scaling proper
    return _emit(f"weak_scaling_proxy_{d}dev", eff,
                 "N*t1/tN matvec ratio (N virtual devices share one host; "
                 "sharding-overhead proxy, 1.0 = no overhead)",
                 eff / 0.8, t1_ms=round(t1 * 1e3, 3), tN_ms=round(tN * 1e3, 3),
                 devices=d, median=round(eff, 4),
                 min=round(effs[0][0], 4), max=round(effs[-1][0], 4),
                 samples=len(effs))


def run_shardmv(args) -> int:
    """Strong-scaling view of the explicit shard_map tier on a fixed
    problem: sharded-matvec wall time on an N-virtual-device z mesh vs the
    single-device flat matvec, plus an HLO check that the halo exchange
    lowers to collective-permutes (point-to-point) and not all-gathers."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from eddy_currents_3d_tpu.assembly.assemble import assemble_operator
    from eddy_currents_3d_tpu.assembly.stencil import State
    from eddy_currents_3d_tpu.parallel.mesh import make_mesh
    from eddy_currents_3d_tpu.parallel.shard_op import ShardedStencilOperator
    from eddy_currents_3d_tpu.testing.cases import case_static, load_case

    d = args.devices
    R = 32
    model = load_case(case_static(shape_xyz=(64, 64, 8 * max(d // 8, 1) * 8),
                                  steps=2))
    sysm = assemble_operator(model, jnp.float32)
    nz, ny, nx = model.shape_zyx
    rng = np.random.default_rng(0)
    st = State(jnp.asarray(rng.standard_normal((3, nz, ny, nx)), jnp.float32),
               jnp.asarray(rng.standard_normal((nz, ny, nx))
                           * np.asarray(sysm.cond_mask), jnp.float32))

    def timed_chain(apply_fn, x):
        @jax.jit
        def chain(s):
            def body(_, s):
                y = apply_fn(s)
                return State(y.A * 1e-2, y.U * 1e-2)
            s = jax.lax.fori_loop(0, R, body, s)
            return jnp.sum(s.A) + jnp.sum(s.U)
        _force(chain(x))
        t0 = time.perf_counter()
        _force(chain(x))
        return (time.perf_counter() - t0) / R

    t1 = timed_chain(sysm.op.apply, st)
    sop = ShardedStencilOperator(sysm, make_mesh(d, 1), jnp.float32)
    stp = sop.pad_state(st)
    tN = timed_chain(sop.apply, stp)
    hlo = jax.jit(sop.apply).lower(stp).compile().as_text()
    return _emit(
        f"sharded_matvec_{d}dev", tN * 1e6, "us/matvec (fixed problem)",
        t1 / tN,
        single_device_us=round(t1 * 1e6, 1),
        devices=d,
        hlo_collective_permute="collective-permute" in hlo,
        hlo_all_gather="all-gather" in hlo,
    )


def run_shardmv_tpu(args) -> int:
    """Hardware evidence for the bf16 shard-tier path (round-4 VERDICT
    weak #6): run the explicit shard_map field tier with coeff_dtype=bf16
    on a 1-device mesh ON THE REAL TPU — shard_map on a single chip
    executes the same per-shard sublane-16 repad Pallas kernels as a pod
    would, so this is real-hardware coverage of the kernels that
    previously had interpret-mode coverage only.  Asserts numerics vs the
    unsharded f32 operator (bf16-coefficient rounding tolerance), then
    reports matvec latency."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from eddy_currents_3d_tpu.assembly.assemble import assemble_operator
    from eddy_currents_3d_tpu.assembly.stencil import State
    from eddy_currents_3d_tpu.parallel.mesh import make_mesh
    from eddy_currents_3d_tpu.parallel.shard_op import ShardedStencilOperator

    _, base_steps, path = BASELINES[args.case]
    model = _load(path, (102, 102, 24), base_steps)
    sysm = assemble_operator(model, jnp.float32)
    nz, ny, nx = model.shape_zyx
    rng = np.random.default_rng(0)
    st = State(jnp.asarray(rng.standard_normal((3, nz, ny, nx)), jnp.float32),
               jnp.asarray(rng.standard_normal((nz, ny, nx))
                           * np.asarray(sysm.cond_mask), jnp.float32))
    y_ref = jax.jit(sysm.op.apply)(st)

    mesh = make_mesh(1, 1)
    sop = ShardedStencilOperator(sysm, mesh, jnp.float32, use_pallas=True,
                                 coeff_dtype=jnp.bfloat16)
    stp = sop.pad_state(st)
    y_sh = sop.unpad_state(jax.jit(sop.apply)(stp))
    scale = float(np.abs(np.asarray(y_ref.A)).max())
    err = float(np.abs(np.asarray(y_sh.A) - np.asarray(y_ref.A)).max()) / scale
    # bf16 coefficients carry ~8 mantissa bits
    ok = err < 2e-2

    R = 256
    @jax.jit
    def chain(s):
        def body(_, s):
            y = sop.apply(s)
            return State(y.A * 1e-4, y.U * 1e-4)
        s = jax.lax.fori_loop(0, R, body, s)
        return jnp.sum(s.A) + jnp.sum(s.U)

    def timed():
        _force(chain(stp))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            _force(chain(stp))
            ts.append(time.perf_counter() - t0)
        return sorted(ts)[1] / R

    t_mv = timed()
    return _emit(
        f"{args.case}_bf16_shard_tier_matvec_tpu", t_mv * 1e6, "us/matvec",
        1.0 if ok else 0.0,
        rel_err_vs_f32=round(err, 6), numerics_ok=ok,
        backend=jax.devices()[0].platform, mesh="1x1",
        note="real-hardware run of the bf16 sublane-16 shard-tier kernels")


def run_precond1(args) -> int:
    """One preconditioner's full-transient timing (scan path) — one JSON
    line; invoked per candidate by run_precond in its own process (six
    sims + their compiled executables in one process have crashed the TPU
    worker)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from eddy_currents_3d_tpu.sim.simulate import Simulation

    model, n_steps, base_per_step = _precond_case(args)
    name = args.precond or "none"
    kw = {}
    if name == "cheb_jacobi8":          # higher-order Chebyshev candidate
        kw = {"precond": "cheb_jacobi", "cheb_order": 8}
    elif name != "none":
        kw = {"precond": name}
    try:
        sim = Simulation(model, dtype=jnp.float32, **kw)
        warm, _ = sim.run_scan(num_steps=n_steps)
        _force(warm.A)
        del warm
        t0 = time.perf_counter()
        state, diag = sim.run_scan(num_steps=n_steps)
        _force(state.A)
        wall = time.perf_counter() - t0
    except Exception as e:
        # structured rejection for the shoot-out table: exception type +
        # message head, never a traceback tail (round-4 VERDICT weak #3)
        print(json.dumps({"metric": f"{args.case}_precond_{name}",
                          "error_type": type(e).__name__,
                          "error": str(e)[:400]}))
        return 1
    iters = np.asarray(diag["iterations"])
    return _emit(
        f"{args.case}_precond_{name}", wall / n_steps, "s/step",
        (base_per_step / (wall / n_steps)) if base_per_step else 0.0,
        iters_mean=round(float(iters.mean()), 1),
        converged=bool(np.asarray(diag["converged"]).all()),
        steps=n_steps,
    )


def _precond_case(args):
    """(model, n_steps, reference s/step or None) for a shoot-out case —
    the three reference workloads plus the synthetic scale256 class."""
    if args.case == "scale256":
        from eddy_currents_3d_tpu.testing.cases import case_static, load_case
        n_steps = args.steps or 10
        shape = tuple(int(v) for v in args.shape.split(","))
        return (load_case(case_static(shape_xyz=shape, steps=n_steps)),
                n_steps, None)
    base_total, base_steps, path = BASELINES[args.case]
    model = _load(path, (102, 102, 24), base_steps)
    return model, args.steps or base_steps, base_total / base_steps


def run_precond(args) -> int:
    """Preconditioner shoot-out on the case's full transient: wall time and
    iteration counts for none/jacobi/cheb/cheb_jacobi/mg/ilu0, each in its
    own subprocess.  The reference is always unpreconditioned
    (solvers.f90)."""
    import subprocess

    if args.case == "scale256":
        base_total, base_steps = None, args.steps or 10
    else:
        base_total, base_steps, _ = BASELINES[args.case]
    table = {}
    for name in ("none", "jacobi", "cheb", "cheb_jacobi", "cheb_jacobi8",
                 "mg", "ilu0"):
        cmd = [sys.executable, __file__, "--mode", "precond1",
               "--case", args.case, "--precond", name]
        if args.steps:
            cmd += ["--steps", str(args.steps)]
        if args.case == "scale256":
            cmd += ["--shape", args.shape]
        r = subprocess.run(cmd, capture_output=True, text=True, timeout=3600)
        out = [l for l in r.stdout.strip().splitlines() if l.startswith("{")]
        if r.returncode or not out:
            d = json.loads(out[-1]) if out else {}
            if "error_type" in d:
                # structured in-process rejection (run_precond1)
                table[name] = {"error_type": d["error_type"],
                               "error": d["error"]}
            else:
                # process died before the in-process handler (crash/OOM):
                # pull the exception line out of the traceback if there is
                # one, never a raw traceback fragment
                import re
                err = r.stderr.strip()
                m = re.findall(r"^\w[\w.]*(?:Error|Exception|Exit|Interrupt)"
                               r"\b.*$", err, re.M)
                table[name] = {"error": (m[-1] if m else err[:400])[:400],
                               "returncode": r.returncode}
            continue
        d = json.loads(out[-1])
        table[name] = {"s_per_step": d["value"],
                       "iters_mean": d.get("iters_mean"),
                       "converged": d.get("converged")}
    ok = {k: v for k, v in table.items() if v.get("converged")}
    if not ok:
        print(json.dumps({"error": f"all precond runs failed", "table": table}))
        return 1
    best = min(ok, key=lambda k: ok[k]["s_per_step"])
    return _emit(
        f"{args.case}_precond_best", ok[best]["s_per_step"], "s/step",
        ((base_total / base_steps) / ok[best]["s_per_step"]
         if base_total else 0.0),
        best=best, table=table, steps=args.steps or base_steps,
    )


def run_all(args) -> int:
    """Run the full benchmark suite as sequential subprocesses (one JSON
    line each; separate processes because the scaling/shardmv modes must
    set XLA device-count flags before importing jax) and echo every line."""
    import subprocess

    cmds = [
        ["--case", "team7"],
        ["--case", "move"],
        ["--case", "lim"],
        ["--case", "team7", "--coeff-dtype", "bf16"],
        ["--mode", "roofline"],
        ["--mode", "roofline", "--op", "coded"],
        ["--mode", "roofline", "--coeff-dtype", "bf16"],
        ["--mode", "scale256"],
        ["--mode", "shardmv_tpu", "--case", "team7"],
        ["--mode", "scaling", "--devices", "4"],
        ["--mode", "shardmv", "--devices", "8"],
        ["--mode", "precond", "--case", "team7"],
        ["--mode", "precond", "--case", "lim"],
        ["--mode", "precond", "--case", "move"],
        ["--mode", "precond", "--case", "scale256", "--steps", "10"],
    ]
    lines = []
    fail = 0
    for c in cmds:
        r = subprocess.run([sys.executable, __file__] + c,
                           capture_output=True, text=True, timeout=3600)
        out = [l for l in r.stdout.strip().splitlines() if l.startswith("{")]
        if r.returncode or not out:
            fail += 1
            line = json.dumps({"error": f"bench {' '.join(c)} failed",
                               "stderr": r.stderr.strip()[-400:]})
        else:
            line = out[-1]
        print(line, flush=True)
        lines.append(line)
    if args.save:
        with open(args.save, "w") as f:
            f.write("\n".join(lines) + "\n")
    return 1 if fail else 0


def run_scale256(args) -> int:
    """BASELINE's 'scaled to 256^3-class' config: a large synthetic static
    case on the production stencil path."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from eddy_currents_3d_tpu.sim.simulate import Simulation
    from eddy_currents_3d_tpu.testing.cases import case_static, load_case

    shape = tuple(int(v) for v in args.shape.split(","))
    n_steps = args.steps or 10
    model = load_case(case_static(shape_xyz=shape, steps=n_steps))
    # production solve config, from the recorded scale256 shoot-out
    sim = Simulation(model, dtype=jnp.float32, **BEST_CONFIG["scale256"])
    nnz = (3 * np.count_nonzero(sim.system.np_ka)
           + np.count_nonzero(sim.system.np_gu)
           + np.count_nonzero(sim.system.np_ku)
           + np.count_nonzero(sim.system.np_da))
    # scan protocol (one on-device dispatch), same as the shoot-out: a
    # host loop pays a per-step dispatch+readback over the TPU tunnel
    # that dominates at this step cost (~40 ms/step measured)
    warm, _ = sim.run_scan(num_steps=n_steps)
    _force(warm.A)
    del warm
    t0 = time.perf_counter()
    state, diag = sim.run_scan(num_steps=n_steps)
    _force(state.A)
    per_step = (time.perf_counter() - t0) / n_steps
    iters = float(np.asarray(diag["iterations"]).mean())
    cells = shape[0] * shape[1] * shape[2]
    return _emit("scale256_time_per_step", per_step, "s/step",
                 nnz * iters / per_step / 1e6,  # solver Mnnz/s
                 cells=cells, nnz=int(nnz), iters_per_step=iters,
                 steps=n_steps,
                 op=("coded" if sim.coded_op is not None else
                     "fields" if sim.pallas_op is not None else "jnp"),
                 config=BEST_CONFIG["scale256"])


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--case", default="team7",
                    choices=sorted(BASELINES) + ["scale256"],
                    help="reference workload; 'scale256' (synthetic scale "
                    "class) is valid for the precond modes only")
    ap.add_argument("--steps", type=int, default=None, help="limit step count")
    ap.add_argument("--f64", action="store_true")
    ap.add_argument("--cpu", action="store_true", help="force CPU backend")
    ap.add_argument("--mode", default="e2e",
                    choices=["e2e", "roofline", "scaling", "scale256",
                             "shardmv", "shardmv_tpu", "precond", "precond1",
                             "all"])
    ap.add_argument("--devices", type=int, default=8,
                    help="virtual device count for --mode scaling/shardmv")
    ap.add_argument("--shape", default="256,256,64",
                    help="grid for --mode scale256 (nx,ny,nz)")
    ap.add_argument("--save", default=None,
                    help="--mode all: also write the JSON lines to this file")
    ap.add_argument("--op", default="auto", choices=["auto", "coded"],
                    help="--mode roofline: measure the case-coded operator "
                    "instead of the field kernels")
    ap.add_argument("--coeff-dtype", default=None, choices=[None, "bf16"],
                    help="store operator coefficients in bf16 (state stays "
                    "f32) for e2e/roofline modes")
    ap.add_argument("--precond", default=None,
                    choices=[None, "none", "jacobi", "cheb", "cheb_jacobi",
                             "cheb_jacobi8", "mg", "ilu0"],
                    help="--mode precond1: which preconditioner to time")
    args = ap.parse_args()

    if args.case == "scale256" and args.mode not in ("precond", "precond1"):
        print(json.dumps({"error": "--case scale256 is valid for the "
                          "precond modes only; use --mode scale256 for its "
                          "e2e timing"}))
        return 2
    if args.mode == "all":
        return run_all(args)
    if args.mode == "precond":
        # pure subprocess dispatcher: must NOT import jax here — the axon
        # TPU plugin takes a device lock at first backend init and the
        # children need the chip (tpu-tunnel constraint, round 2)
        return run_precond(args)

    if args.mode in ("scaling", "shardmv"):
        # must happen before jax import
        os.environ["JAX_PLATFORMS"] = "cpu"
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + f" --xla_force_host_platform_device_count={args.devices}"
            ).strip()

    import jax

    if args.cpu or args.mode in ("scaling", "shardmv"):
        jax.config.update("jax_platforms", "cpu")

    if args.mode == "roofline":
        return run_roofline(args)
    if args.mode == "scaling":
        return run_scaling(args)
    if args.mode == "shardmv":
        return run_shardmv(args)
    if args.mode == "shardmv_tpu":
        return run_shardmv_tpu(args)
    if args.mode == "precond1":
        return run_precond1(args)
    if args.mode == "scale256":
        return run_scale256(args)
    if args.f64:
        jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from eddy_currents_3d_tpu.models.vxc import read_vxc
    from eddy_currents_3d_tpu.sim.simulate import Simulation

    base_total, base_steps, path = BASELINES[args.case]
    baseline_per_step = base_total / base_steps

    if os.path.exists(path):
        model = read_vxc(path)
    else:  # fallback: synthetic stand-in at the same scale
        from eddy_currents_3d_tpu.testing.cases import case_static, load_case
        model = load_case(case_static(shape_xyz=(102, 102, 24), steps=base_steps))

    dtype = jnp.float64 if args.f64 else jnp.float32
    best = BEST_CONFIG.get(args.case, {})
    sim = Simulation(model, dtype=dtype,
                     coeff_dtype=jnp.bfloat16 if args.coeff_dtype == "bf16"
                     else None, **best)
    n_steps = args.steps if args.steps is not None else len(sim.steps)

    # compile once on a throwaway state (first step dominates otherwise);
    # the timed transient runs as ONE on-device lax.scan dispatch
    warm, _ = sim.run_scan(num_steps=n_steps)
    _force(warm.A)
    del warm

    t0 = time.perf_counter()
    state, diag = sim.run_scan(num_steps=n_steps)
    _force(state.A)          # true device-completion barrier (see _force)
    wall = time.perf_counter() - t0
    if not bool(jnp.all(diag["converged"])):
        print(json.dumps({"error": "unconverged steps in benchmark run"}))
        return 1
    per_step = wall / n_steps

    # ---- solver-statistics attribution (so per-round perf changes are
    # explainable): iterations/step, matvec latency on the solve path, and
    # the matvec/dot wall shares of one solver iteration ----
    import numpy as np
    from eddy_currents_3d_tpu.assembly.stencil import State
    iters = np.asarray(diag["iterations"])
    total_it = int(iters.sum())
    op = sim.shard_op or sim.coded_op or sim.pallas_op
    if op is not None:
        st0 = op.pad_state(State(state.A, state.U))
        apply_fn = op.apply
    else:
        st0 = State(state.A, state.U)
        apply_fn = sim.system.op.apply

    def chain(fn, reps):
        @jax.jit
        def c(s):
            def body(_, s):
                y = fn(s)
                return State(y.A * 1e-4, y.U * 1e-4)
            s = jax.lax.fori_loop(0, reps, body, s)
            return jnp.sum(s.A) + jnp.sum(s.U)
        return c

    def timed(fn, *a):
        """Median of 3 synced wall times (tunnel RTT jitter is ~ms; the
        differenced work below must stay well above it)."""
        _force(fn(*a))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            _force(fn(*a))
            ts.append(time.perf_counter() - t0)
        return sorted(ts)[1]

    R = 512
    t_mv = max(timed(chain(apply_fn, 2 * R), st0)
               - timed(chain(apply_fn, R), st0), 1e-9) / R
    # one fused State dot (a BiCGSTAB iteration runs ~5 of them).  NOTE:
    # standalone costs are NOT additive inside the solver loop — XLA fuses
    # the dots into the matvec passes (measured: iter_us ~= 2 * matvec_us
    # with the 5 dots effectively free) — so raw latencies are reported
    # instead of wall "shares".
    dot = lambda s: State(s.A * (1e-30 * (jnp.sum(s.A * s.A)
                                          + jnp.sum(s.U * s.U)) + 1.0), s.U)
    t_dot = max(timed(chain(dot, 2 * R), st0)
                - timed(chain(dot, R), st0), 1e-9) / R
    t_iter = wall / max(total_it, 1)

    print(
        json.dumps(
            {
                "metric": f"{args.case}_time_per_step"
                          + ("_bf16" if args.coeff_dtype == "bf16" else ""),
                "value": round(per_step, 6),
                "unit": "s/step",
                "vs_baseline": round(baseline_per_step / per_step, 2),
                "iters_mean": round(float(iters.mean()), 1),
                "iters_max": int(iters.max()),
                "total_iterations": total_it,
                "iter_us": round(t_iter * 1e6, 1),
                "matvec_us": round(t_mv * 1e6, 1),
                "dot_us": round(t_dot * 1e6, 1),
                "config": {"precond": best.get("precond", "none"),
                           "warm_start": "extrapolate",
                           "op": ("coded" if sim.coded_op is not None
                                  else "fields"),
                           **({"cheb_order": best["cheb_order"]}
                              if "cheb_order" in best else {})},
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
