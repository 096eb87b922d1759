"""Per-op-class cycle audit of the flagship fused kernel.

Round-4's roofline (`benchmarks/roofline.py`) priced the kernel against a
HAND-COUNTED issue floor (16.8k cheap ops/sample) and reported 66%
utilization, attributing the 0.25 ms residual to "gathers, transcendentals
and the serial chain" without measurement.  This harness replaces both
sides of that comparison with measured quantities:

1. **Exact op counts** — the audit traces the *production* kernel
   (``ops/fused_solve.py``) and counts the primitives of the
   ``pallas_call``'s inner jaxpr per op class.  No hand model: every
   select/compare the interval walk or the sincos polynomial actually
   issues is counted, including the ones the round-4 count missed
   (~24k vector ops/tile vs the hand-counted ~17k).
2. **Measured per-op costs** — each op class (VPU ALU op, select,
   compare, dynamic lane-gather, floor, exp/log/sqrt, the sincos_2pi
   polynomial, PRNG draw, [8,128]->scalar reduction) is microbenched in
   isolation at the kernel's vreg shape with L-vs-2L differencing (launch
   and loop overheads cancel), 8 independent chains (issue-bound, like
   the kernel's unrolled body).
3. **The budget** — per-class ``count x cost`` summed across classes and
   tiles, compared against the same scanned kernel measurement
   ``benchmarks/kernel_fraction.py`` reports.  The residual is what no
   counted class explains (register spills, scheduling bubbles, grid
   overhead).

Also prices one LBPS golden-section iteration and one ESSPS bisection
iteration per class (the auto-lambda floor accounting of
``docs/ARCHITECTURE.md``).

Run:  python benchmarks/cycle_audit.py            (TPU)
      python benchmarks/cycle_audit.py --count    (counts only, any backend)
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import statistics
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

HORIZON = 50
K = 100_000
SCAN_N = 20
L_BASE = 8192          # fori_loop iterations for the microbench base size
CHAINS = 8             # independent dependency chains (issue-bound)
OPS_PER_CHAIN = 8      # composite applications per chain per iteration
# (64 composites per loop iteration dilutes the fori_loop's scalar
# counter/branch overhead to <2% of a 1-cycle op's measurement)

# classification of jaxpr primitives into measured cost classes
_VECTOR = {
    "add", "sub", "mul", "div", "max", "min", "neg", "abs", "sign",
    "and", "or", "xor", "not", "rem", "round", "nextafter",
    "shift_right_arithmetic", "shift_right_logical", "shift_left",
    "integer_pow", "convert_element_type", "iota", "clamp",
}
_CMP = {"lt", "le", "gt", "ge", "eq", "ne"}
_LAYOUT = {"reshape", "broadcast_in_dim", "slice", "squeeze",
           "concatenate", "transpose", "expand_dims", "copy"}
_WRAPPERS = {"jit", "pjit", "custom_jvp_call", "custom_vjp_call",
             "closed_call", "core_call", "remat", "checkpoint"}
_CLASS_OF = {
    "select_n": "select", "floor": "floor", "exp": "exp", "log": "log",
    "sqrt": "sqrt", "rsqrt": "sqrt", "gather": "gather",
    "prng_random_bits": "prng", "reduce_sum": "reduce",
    "reduce_max": "reduce", "reduce_min": "reduce",
    "get": "vmem_ldst", "swap": "vmem_ldst",
}


def _classify(name: str) -> str | None:
    if name in _CLASS_OF:
        return _CLASS_OF[name]
    if name in _CMP:
        return "cmp"
    if name in _VECTOR:
        return "alu"
    if name in _LAYOUT:
        return "layout"
    return None


def _walk(jxp, counts, unknown):
    import jax

    for e in jxp.eqns:
        name = e.primitive.name
        recursed = False
        for v in e.params.values():
            if isinstance(v, jax.extend.core.ClosedJaxpr):
                _walk(v.jaxpr, counts, unknown)
                recursed = True
            elif hasattr(v, "eqns"):
                _walk(v, counts, unknown)
                recursed = True
        if name in _WRAPPERS or recursed:
            # wrappers and control-flow/pallas wrappers: the body was
            # counted by the recursion above.  NOTE: lax loop bodies are
            # counted ONCE — callers must multiply by trip count (the
            # flagship kernel body is fully unrolled, no lax loops).
            continue
        sizes = [
            int(np.prod(ov.aval.shape))
            for ov in e.outvars
            if hasattr(ov.aval, "shape")
        ]
        if name.startswith("reduce_") or name == "argmin" or name == "argmax":
            # reductions consume full vregs but output scalars/rows:
            # their cost scales with the INPUT size
            sizes = [
                int(np.prod(iv.aval.shape))
                for iv in e.invars
                if hasattr(iv.aval, "shape")
            ]
        size = max(sizes, default=0)
        if size < 1024:
            # scalar / sub-vreg ops run on the scalar unit or fold into
            # vector ops; they are not issue-budget items at tile scale
            continue
        vregs = size // 1024
        cls = _classify(name)
        if cls is None:
            unknown[name] += vregs
        else:
            counts[cls] += vregs


def count_classes(fn, *args) -> dict:
    """Per-op-class vreg-op counts of ``fn``'s jaxpr (recursing into the
    ``pallas_call`` inner jaxpr when present)."""
    import jax

    jaxpr = jax.make_jaxpr(fn)(*args)
    counts: dict = defaultdict(int)
    unknown: dict = defaultdict(int)
    _walk(jaxpr.jaxpr, counts, unknown)
    out = dict(counts)
    if unknown:
        out["_unclassified"] = dict(unknown)
    return out


# ---------------------------------------------------------------------------
# microbenches
# ---------------------------------------------------------------------------


def _make_bench(body_fn, n_int_inputs: int, reps: int, interpret: bool):
    """Pallas kernel: ``reps`` fori_loop iterations of CHAINS x
    OPS_PER_CHAIN composite ops, seeded from int32 vreg inputs.

    A per-launch ``tweak`` scalar (SMEM) perturbs every chain's seed and
    is derived from the scan carry, so consecutive launches in the timing
    scan are data-dependent — without it XLA hoists the loop-invariant
    ``pallas_call`` out of the scan and the 'N launches' measure one.
    """
    import jax
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(tweak_ref, *refs):
        tweak = tweak_ref[0]
        ins = [r[:, :] ^ tweak for r in refs[:n_int_inputs]]
        out_ref = refs[n_int_inputs]
        state = body_fn("init", ins, None)

        def body(_, st):
            for _ in range(OPS_PER_CHAIN):
                st = body_fn("step", ins, st)
            return st

        state = lax.fori_loop(0, reps, body, state)
        out_ref[:, :] = body_fn("fini", ins, state)

    f = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [
            pl.BlockSpec(memory_space=pltpu.VMEM)
            for _ in range(n_int_inputs)
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        interpret=interpret,
    )

    def scanned(*ins):
        def step(carry, _):
            out = f(carry.reshape(1), *ins)
            # fold the launch's output back into the next launch's tweak:
            # serializes the scan without changing the op mix
            return (carry + out[0, 0].astype(jnp.int32)) | 1, None

        acc, _ = lax.scan(step, jnp.int32(1), None, length=SCAN_N)
        return acc

    return jax.jit(scanned)


def _time_bench(fn, ins) -> float:
    """Median seconds per pallas launch (scan-amortized)."""
    import jax

    out = fn(*ins)
    jax.block_until_ready(out)
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        for _ in range(3):
            out = fn(*ins)
        jax.block_until_ready(out)
        ts.append((time.perf_counter() - t0) / (3 * SCAN_N))
    return statistics.median(ts)


def measure_classes(interpret: bool = False) -> dict:
    """Measured ns per vreg-op per class, via L-vs-2L differencing."""
    import jax
    import jax.numpy as jnp

    from mppi_playground_tpu.utils.fastmath import sincos_2pi

    rng = np.random.default_rng(0)
    # all bench inputs are int32 so the per-launch tweak can XOR them
    # (see _make_bench); f32 chains derive uniform [1, 2) values at init
    i32 = [
        jnp.asarray(rng.integers(0, 1 << 20, (8, 128)), jnp.int32)
        for _ in range(CHAINS)
    ]
    f32 = i32

    def chains_f(ins):
        return [
            (x & 0xFFFF).astype(jnp.float32) * (2.0**-16) + 1.0
            for x in ins
        ]

    # Each body: ("init", ins, None) -> state; ("step", ins, st) -> st
    # (ONE composite op per chain); ("fini", ins, st) -> [8,128] f32.
    def body_mul(phase, ins, st):
        if phase == "init":
            return tuple(chains_f(ins))
        if phase == "step":
            return tuple(x * 1.0000001 for x in st)
        return sum(st)

    def body_add(phase, ins, st):
        if phase == "init":
            return tuple(chains_f(ins))
        if phase == "step":
            return tuple(x + 1e-7 for x in st)
        return sum(st)

    def body_select(phase, ins, st):
        if phase == "init":
            fs = chains_f(ins)
            masks = tuple(x > 1.5 for x in fs)
            return (tuple(fs), masks)
        if phase == "step":
            fs, masks = st
            fs = tuple(
                jnp.where(m, x, 1.25) for x, m in zip(fs, masks)
            )
            return (fs, masks)
        return sum(st[0])

    def body_cmp_select(phase, ins, st):
        if phase == "init":
            return tuple(chains_f(ins))
        if phase == "step":
            return tuple(jnp.where(x > 1.5, x, 1.75) for x in st)
        return sum(st)

    def body_floor(phase, ins, st):
        if phase == "init":
            return tuple(chains_f(ins))
        if phase == "step":
            return tuple(jnp.floor(x) + 0.5 for x in st)
        return sum(st)

    def body_exp(phase, ins, st):
        if phase == "init":
            return tuple(x * 1e-9 for x in chains_f(ins))
        if phase == "step":
            return tuple(jnp.exp(x) * 1e-9 for x in st)
        return sum(st)

    def body_log(phase, ins, st):
        if phase == "init":
            return tuple(chains_f(ins))
        if phase == "step":
            return tuple(jnp.log(x + 2.0) for x in st)
        return sum(st)

    def body_sqrt(phase, ins, st):
        if phase == "init":
            return tuple(chains_f(ins))
        if phase == "step":
            return tuple(jnp.sqrt(x) + 1.0 for x in st)
        return sum(st)

    def body_sincos(phase, ins, st):
        if phase == "init":
            return tuple(chains_f(ins))
        if phase == "step":
            out = []
            for x in st:
                s, c = sincos_2pi(x)
                out.append(s * 0.25 + 1.5)
            return tuple(out)
        return sum(st)

    def body_gather(phase, ins, st):
        # THROUGHPUT variant: each chain's gather index evolves by a cheap
        # int recurrence (cannot be hoisted or CSE'd), but the gathers
        # themselves are independent of each other — mirroring the
        # kernel's map walk (40 independent gathers per step).  The
        # composite is and+add+gather+add; body_gather_ctl subtracts the
        # non-gather part.
        if phase == "init":
            return (tuple(ins), tuple(x ^ 0x5A5A for x in ins))
        if phase == "step":
            accs, idxs = st
            row = jnp.broadcast_to(ins[0][0:1, :] & 63, (8, 128))
            new_accs, new_idxs = [], []
            for x, ix in zip(accs, idxs):
                ix = (ix + 13) & 127
                g = jnp.take_along_axis(row, ix, axis=1)
                new_accs.append(x + g)
                new_idxs.append(ix)
            return (tuple(new_accs), tuple(new_idxs))
        return sum(st[0]).astype(jnp.float32)

    def body_gather_ctl(phase, ins, st):
        # the gather composite minus the gather itself
        if phase == "init":
            return (tuple(ins), tuple(x ^ 0x5A5A for x in ins))
        if phase == "step":
            accs, idxs = st
            new_accs, new_idxs = [], []
            for x, ix in zip(accs, idxs):
                ix = (ix + 13) & 127
                new_accs.append(x + ix)
                new_idxs.append(ix)
            return (tuple(new_accs), tuple(new_idxs))
        return sum(st[0]).astype(jnp.float32)

    def body_gather_latency(phase, ins, st):
        # LATENCY variant: each chain's next gather depends on the last
        # gather's result — prices the serial-dependent worst case
        if phase == "init":
            return tuple(ins)
        if phase == "step":
            out = []
            row = jnp.broadcast_to(ins[0][0:1, :] & 63, (8, 128))
            for x in st:
                g = jnp.take_along_axis(row, x & 127, axis=1)
                out.append(x + g)
            return tuple(out)
        return sum(st).astype(jnp.float32)

    def body_prng(phase, ins, st):
        from jax.experimental.pallas import tpu as pltpu

        if phase == "init":
            pltpu.prng_seed(ins[0][0, 0])
            return tuple(ins)
        if phase == "step":
            return tuple(
                x ^ pltpu.prng_random_bits((8, 128)) for x in st
            )
        return sum(st).astype(jnp.float32)

    def body_reduce(phase, ins, st):
        # THROUGHPUT variant: the (8,128)->scalar reduces are independent
        # across chains (like the kernel's 100 numer reduces); each chain
        # evolves by one add so the reduce cannot be hoisted, and the
        # scalar results accumulate into per-chain scalar chains.
        # Composite = add + reduce (+ scalar add); subtract body_add.
        if phase == "init":
            fs = chains_f(ins)
            return (tuple(fs), tuple(jnp.float32(0.0) for _ in fs))
        if phase == "step":
            fs, scs = st
            fs = tuple(x + 1e-7 for x in fs)
            scs = tuple(sc + jnp.sum(x) for sc, x in zip(scs, fs))
            return (fs, scs)
        fs, scs = st
        return sum(fs) + sum(scs) * 1e-9

    def body_reduce_latency(phase, ins, st):
        # LATENCY variant: each reduce feeds the next via a broadcast add
        if phase == "init":
            return tuple(chains_f(ins))
        if phase == "step":
            return tuple(x + jnp.sum(x) * 1e-9 for x in st)
        return sum(st)

    benches = {
        "mul": (body_mul, f32),
        "add": (body_add, f32),
        "select": (body_select, f32),
        "cmp_select": (body_cmp_select, f32),
        "floor": (body_floor, f32),
        "exp": (body_exp, f32),
        "log": (body_log, f32),
        "sqrt": (body_sqrt, f32),
        "sincos_2pi": (body_sincos, f32),
        "gather_composite": (body_gather, i32),
        "gather_ctl": (body_gather_ctl, i32),
        "gather_latency": (body_gather_latency, i32),
        "prng_xor": (body_prng, i32),
        "reduce_saxpy": (body_reduce, f32),
        "reduce_latency": (body_reduce_latency, f32),
    }

    raw = {}
    for name, (body, ins) in benches.items():
        ts = {}
        for reps in (L_BASE, 2 * L_BASE):
            fn = _make_bench(body, len(ins), reps, interpret)
            ts[reps] = _time_bench(fn, ins)
        per_comp = (ts[2 * L_BASE] - ts[L_BASE]) / (
            L_BASE * CHAINS * OPS_PER_CHAIN
        )
        raw[name] = per_comp * 1e9  # ns per composite op

    # decompose composites into per-class costs (ns per vreg-op);
    # throughput variants price the budget (the kernel's gathers/reduces
    # are independent across slots), latency variants are recorded as the
    # serial-dependent worst case
    mul = raw["mul"]
    add = raw["add"]
    alu = (mul + add) / 2
    out = {
        "alu": alu,
        "select": raw["select"],
        "cmp": max(raw["cmp_select"] - raw["select"], 0.0),
        "floor": max(raw["floor"] - add, 0.0),
        "exp": max(raw["exp"] - mul, 0.0),
        "log": max(raw["log"] - add, 0.0),
        "sqrt": max(raw["sqrt"] - add, 0.0),
        "sincos_2pi_composite": raw["sincos_2pi"],
        "gather": max(raw["gather_composite"] - raw["gather_ctl"], 0.0),
        "gather_latency_bound": raw["gather_latency"],
        "prng": max(raw["prng_xor"] - alu, 0.0),
        "reduce": max(raw["reduce_saxpy"] - add, 0.0),
        "reduce_latency_bound": raw["reduce_latency"],
        "_raw_composites_ns": {k: round(v, 4) for k, v in raw.items()},
    }
    return out


# ---------------------------------------------------------------------------
# flagship kernel: counts, components, measurement
# ---------------------------------------------------------------------------


def build_flagship_core():
    import jax
    import jax.numpy as jnp

    from mppi_playground_tpu.core.config import MPPIConfig
    from mppi_playground_tpu.envs.racing_env import RacingEnv
    from mppi_playground_tpu.models.racing_mpcc import (
        calc_ref_trajectory,
        make_racing_fused_task_from_env,
    )
    from mppi_playground_tpu.ops.fused_solve import make_fused_solve

    env = RacingEnv()
    config = MPPIConfig(
        horizon=HORIZON, num_samples=K, dim_state=4, dim_control=2,
        u_min=tuple(float(v) for v in env.u_min.tolist()),
        u_max=tuple(float(v) for v in env.u_max.tolist()),
        sigmas=(0.5, 0.1), lambda_=1.0, store_rollouts=False,
    )
    task = make_racing_fused_task_from_env(env)
    core = make_fused_solve(config, task, interpret=False)
    x0 = env.reset()
    xref, _ = jax.jit(
        lambda x: calc_ref_trajectory(
            x, env.racing_center_path, jnp.asarray(0, jnp.int32), HORIZON
        )
    )(x0)
    smem = task.smem_builder({"reference_path": xref})
    return core, task, config, x0, smem


def component_counts(task) -> dict:
    """Attribution traces: the real SoA component functions at vreg shape."""
    import jax.numpy as jnp

    from mppi_playground_tpu.utils.fastmath import sincos_2pi

    rng = np.random.default_rng(1)
    vreg = lambda: jnp.asarray(rng.uniform(1.0, 2.0, (8, 128)), jnp.float32)
    xs = tuple(vreg() for _ in range(4))
    us = tuple(vreg() for _ in range(2))

    comp = {}
    comp["dynamics_step"] = count_classes(
        lambda x, u: task.dynamics_soa(x, u), xs, us
    )

    tables = task.vmem_args
    xref = jnp.zeros((HORIZON + 1, 5), jnp.float32)

    def cost_step(x, u, pu):
        ctx = dict(t=10, prev_xs=x, prev_us=pu, x0=x, vmem=tables,
                   smem={"xref": xref})
        return task.stage_cost_soa(x, u, ctx)

    comp["cost_step"] = count_classes(cost_step, xs, us, us)

    # Box-Muller pair from raw bits (ops/fused_solve._normal_pair minus
    # the PRNG draws, which are counted as their own class)
    def bm_pair(b1, b2):
        u1 = (b1 & 0xFFFFFF).astype(jnp.float32) * (2.0**-24) + (2.0**-25)
        u2 = (b2 & 0xFFFFFF).astype(jnp.float32) * (2.0**-24)
        r = jnp.sqrt(-2.0 * jnp.log(u1))
        s, c = sincos_2pi(2.0 * np.pi * u2)
        return r * c, r * s

    bits = jnp.asarray(rng.integers(0, 1 << 24, (8, 128)), jnp.int32)
    comp["box_muller_pair"] = count_classes(bm_pair, bits, bits)

    # tile softmin + numer epilogue (ops/fused_solve.py kernel tail)
    d_flat = HORIZON * 2

    def softmin_numer(acc, pert_flat):
        import jax

        lane = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
        sub = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
        s = -acc / 1.0
        mx = jnp.max(s)
        e = jnp.exp(s - mx)
        z = jnp.sum(e)
        sq = jnp.sum(e * e)
        stats = jnp.where(
            lane == 0, mx, jnp.where(lane == 1, z, jnp.where(lane == 2, sq, 0.0))
        )
        numer = jnp.zeros((8, 128), jnp.float32)
        for f in range(d_flat):
            w = jnp.sum(e * pert_flat[f])
            numer = jnp.where((sub == f // 128) & (lane == f % 128), w, numer)
        return stats, numer

    pert_flat = jnp.zeros((d_flat, 8, 128), jnp.float32) + vreg()
    comp["softmin_numer_tile"] = count_classes(softmin_numer, vreg(), pert_flat)
    return comp


def lambda_iteration_counts() -> dict:
    """Vector passes per auto-lambda search iteration at flagship K.

    ``lax.fori_loop`` bodies appear once in a jaxpr regardless of trip
    count, so the search loops cannot be diffed by ``iters``; instead the
    per-iteration vector work is traced from replicas of the loop bodies
    (``ops/lambda_search.py`` ``essps_bisect``/``lbps_golden`` — one ESS
    evaluation, one LBPS objective evaluation)."""
    import jax.numpy as jnp

    rows = (-(-K // 1024) * 1024) // 128
    c = jnp.abs(jnp.asarray(
        np.random.default_rng(2).uniform(0.0, 9.0, (rows, 128)), jnp.float32
    ))
    vregs_per_pass = rows // 8

    def essps_iteration(cc, lam):
        # essps_bisect body: d is hoisted outside the loop; per iteration
        # one exp pass + two sum-reductions + the e*e mul
        d = jnp.float32(1.0) - cc  # stands in for the hoisted min(c) - c
        e = jnp.exp(d * (1.0 / lam))
        z = jnp.sum(e)
        sq = jnp.sum(e * e)
        return z * z / sq

    essps = count_classes(essps_iteration, c, jnp.float32(3.0))

    def lbps_iteration(cc, lam, cmin, range_pen):
        # lbps_golden objective: per iteration one scale pass, one shifted
        # exp pass, three reductions (z, sum e^2, sum e*c)
        s = cc * (-1.0 / lam)
        e = jnp.exp(s - cmin * (-1.0 / lam))
        z = jnp.sum(e)
        sq = jnp.sum(e * e)
        ess = (z * z) / sq
        expected_return = -jnp.sum(e * cc) / z
        return -(expected_return - range_pen / jnp.sqrt(ess))

    lbps = count_classes(
        lbps_iteration, c, jnp.float32(3.0), jnp.float32(0.1),
        jnp.float32(5.0),
    )
    return {
        "essps_per_iter_vregs": {
            k: v for k, v in essps.items() if k != "_unclassified"
        },
        "lbps_per_iter_vregs": {
            k: v for k, v in lbps.items() if k != "_unclassified"
        },
        "vregs_per_K_pass": vregs_per_pass,
        "note": "replicas of the ops/lambda_search.py loop bodies (lax "
        "loop bodies count once per jaxpr, so iters cannot be diffed)",
    }


def measure_kernel_ms(core, x0, smem) -> float:
    import jax
    import jax.numpy as jnp
    from jax import lax

    lam = jnp.asarray(1.0, jnp.float32)
    prev = jnp.zeros((HORIZON, 2), jnp.float32)

    def kernel_scan(x, p, seed0):
        def body(carry, _):
            sd, acc = carry
            costs, stats, numer = core.run_kernel(x, p, lam, sd, smem)
            return (sd + 1 + (costs[0] > 1e30).astype(jnp.int32),
                    acc + stats[0, 0]), None

        (sd, acc), _ = lax.scan(body, (seed0, 0.0), None, length=50)
        return acc

    fn = jax.jit(kernel_scan)
    out = fn(x0, prev, jnp.asarray(7, jnp.int32))
    jax.block_until_ready(out)
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        for _ in range(3):
            out = fn(x0, prev, jnp.asarray(7, jnp.int32))
        jax.block_until_ready(out)
        ts.append((time.perf_counter() - t0) / (3 * 50))
    return statistics.median(ts) * 1e3


# ---------------------------------------------------------------------------
# in-context per-class cost fit over measured ablation variants
# ---------------------------------------------------------------------------

# grouped classes for the fit (individual microbench classes are too
# optimizer-sensitive to price in isolation; these four explain the
# variant matrix with full rank):
#   issue    — every 1-slot VPU vector op (alu/cmp/select/floor)
#   layout   — reshape/broadcast/slice (may lower to real ops or be free)
#   gather   — dynamic lane-gather
#   noisegen — PRNG draws + Box-Muller log/sqrt (constant across variants;
#              resolves from the zero-cost baselines)
#   reduce   — [8,128]->scalar reductions + the softmin exp
_FIT_GROUPS = {
    "issue": ("alu", "cmp", "select", "floor"),
    "layout": ("layout",),
    "gather": ("gather",),
    "noisegen": ("prng", "log", "sqrt"),
    "reduce": ("reduce", "exp"),
}


def _group_counts(counts: dict) -> dict:
    out = {}
    for g, members in _FIT_GROUPS.items():
        out[g] = sum(counts.get(m, 0) for m in members)
    return out


def fit_in_context_costs():
    """Least-squares per-class costs fitted from measured ablation kernels.

    Builds the `benchmarks/ablate_kernel.py` variants plus a full-solve
    (softmin+numer) variant, counts each one's pallas jaxpr classes
    exactly, measures each as a 50-iteration scan on hardware, and solves
    nonneg-least-squares  A @ t = y  for per-class ns/vreg-op — the
    in-context prices (including whatever overlap the real instruction
    mix achieves), which the standalone microbenches cannot see.
    """
    import jax
    import jax.numpy as jnp
    from jax import lax
    from scipy.optimize import nnls

    from benchmarks.ablate_kernel import build_variants
    from mppi_playground_tpu.core.config import MPPIConfig
    from mppi_playground_tpu.envs.racing_env import RacingEnv
    from mppi_playground_tpu.models.racing_mpcc import (
        calc_ref_trajectory,
        make_racing_fused_task_from_env,
    )
    from mppi_playground_tpu.ops.fused_solve import FusedTask, make_fused_solve

    env = RacingEnv()
    config = MPPIConfig(
        horizon=HORIZON, num_samples=K, dim_state=4, dim_control=2,
        u_min=tuple(float(v) for v in env.u_min.tolist()),
        u_max=tuple(float(v) for v in env.u_max.tolist()),
        sigmas=(0.5, 0.1), lambda_=1.0, store_rollouts=False,
    )
    base_task = make_racing_fused_task_from_env(env)
    x0 = env.reset()
    xref, _ = jax.jit(
        lambda x: calc_ref_trajectory(
            x, env.racing_center_path, jnp.asarray(0, jnp.int32), HORIZON
        )
    )(x0)
    info = {"reference_path": xref}
    lam = jnp.asarray(1.0, jnp.float32)
    prev = jnp.zeros((HORIZON, 2), jnp.float32)
    seedv = jnp.asarray(1234, jnp.int32)

    def measure(call):
        def scan(seed):
            def body(carry, _):
                sd, acc = carry
                costs = call(sd)
                return (sd + 1 + (costs[0] > 1e30).astype(jnp.int32),
                        acc + costs[0]), None

            (sd, acc), _ = lax.scan(body, (seed, 0.0), None, length=50)
            return acc

        fn = jax.jit(scan)
        out = fn(seedv)
        jax.block_until_ready(out)
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            for _ in range(3):
                out = fn(seedv)
            jax.block_until_ready(out)
            ts.append((time.perf_counter() - t0) / (3 * 50))
        return statistics.median(ts) * 1e3

    rows = []  # (name, grouped counts, measured ms)
    for name, (d, c, vmem) in build_variants(env, base_task).items():
        task = FusedTask(dynamics_soa=d, stage_cost_soa=c, vmem_args=vmem,
                         smem_builder=base_task.smem_builder)
        core = make_fused_solve(config, task)
        smem = task.smem_builder(info)

        def costs_call(sd, core=core, smem=smem):
            (costs,) = core.run_kernel(
                x0, prev, lam, sd, smem, costs_only=True
            )
            return costs

        counts = count_classes(
            lambda sd: costs_call(sd), seedv
        )
        rows.append((name, _group_counts(counts), measure(costs_call)))
        if name == "full":
            # full-solve point: adds the softmin/numer tail (reduce col)
            def full_call(sd, core=core, smem=smem):
                costs, stats, numer = core.run_kernel(
                    x0, prev, lam, sd, smem
                )
                return costs

            counts = count_classes(lambda sd: full_call(sd), seedv)
            rows.append(
                ("full_solve", _group_counts(counts), measure(full_call))
            )

    classes = list(_FIT_GROUPS.keys())
    A = np.array(
        [[r[1][cl] for cl in classes] for r in rows], dtype=np.float64
    )
    y = np.array([r[2] for r in rows], dtype=np.float64)
    # counts are per tile; scale to ms per ns-per-op: ms = n*98*1e-6 * t_ns
    scale = 98 * 1e-6
    t, rnorm = nnls(A * scale, y)
    fitted = dict(zip(classes, [round(v, 4) for v in t]))
    pred = (A * scale) @ t
    per_variant = {
        r[0]: {"measured_ms": round(r[2], 4), "fitted_ms": round(p, 4),
               "counts": r[1]}
        for r, p in zip(rows, pred)
    }
    return fitted, per_variant, float(rnorm)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--count", action="store_true", help="skip measurement")
    ap.add_argument(
        "--fit", action="store_true",
        help="also fit in-context per-class costs over the measured "
        "ablation variants (TPU; ~10 extra kernel compiles)",
    )
    args = ap.parse_args()

    import jax

    from mppi_playground_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    on_tpu = jax.default_backend() == "tpu"

    core, task, config, x0, smem = build_flagship_core()
    import jax.numpy as jnp

    lam = jnp.asarray(1.0, jnp.float32)
    seed = jnp.asarray(7, jnp.int32)
    prev = jnp.zeros((HORIZON, 2), jnp.float32)
    kernel_counts = count_classes(
        lambda x, p: core.run_kernel(x, p, lam, seed, smem), x0, prev
    )
    comp = component_counts(task)
    lam_iters = lambda_iteration_counts()
    num_tiles = -(-K // 1024)

    result = {
        "workload": f"racing MPCC fused, T={HORIZON}, K={K}",
        "per_tile_vreg_ops": {
            k: v for k, v in kernel_counts.items() if k != "_unclassified"
        },
        "unclassified": kernel_counts.get("_unclassified", {}),
        "num_tiles": num_tiles,
        "component_attribution_per_call": comp,
        "lambda_search": lam_iters,
    }

    if not args.count and on_tpu:
        if args.fit:
            fitted, per_variant, rnorm = fit_in_context_costs()
            grouped = _group_counts(result["per_tile_vreg_ops"])
            fit_budget = {
                cl: round(grouped[cl] * fitted[cl] * 98 * 1e-6, 4)
                for cl in fitted
            }
            result["fit"] = {
                "fitted_ns_per_vreg_op": fitted,
                "budget_ms_per_group_full_kernel": fit_budget,
                "per_variant": per_variant,
                "residual_norm_ms": round(rnorm, 4),
                "note": "nonneg least squares over measured ablation "
                "kernels with exactly counted class totals — in-context "
                "prices including the real mix's dual-issue overlap",
            }
        per_op = measure_classes(interpret=False)
        measured_ms = measure_kernel_ms(core, x0, smem)
        budget = {}
        for cls, cnt in result["per_tile_vreg_ops"].items():
            if cls in per_op:
                budget[cls] = cnt * per_op[cls] * num_tiles * 1e-6
            elif cls == "layout":
                # bounded by [free, alu-cost]; budget at half as estimate
                budget[cls] = cnt * 0.5 * per_op["alu"] * num_tiles * 1e-6
            elif cls == "vmem_ldst":
                budget[cls] = cnt * per_op["alu"] * num_tiles * 1e-6
        explained = sum(budget.values())
        result["per_op_ns"] = {
            k: (round(v, 4) if isinstance(v, float) else v)
            for k, v in per_op.items()
        }
        result["budget_ms_per_class"] = {
            k: round(v, 4) for k, v in sorted(
                budget.items(), key=lambda kv: -kv[1]
            )
        }
        result["explained_ms"] = round(explained, 4)
        result["measured_kernel_ms"] = round(measured_ms, 4)
        result["residual_ms"] = round(measured_ms - explained, 4)
        result["explained_fraction"] = round(explained / measured_ms, 4)
        result["device"] = str(jax.devices()[0])

    print(json.dumps({
        "metric": "cycle_audit_per_class_budget",
        "value": result.get("explained_fraction"),
        "unit": "fraction of measured kernel time explained",
        "vs_baseline": None,
        "extra": result,
    }))


if __name__ == "__main__":
    main()
