"""Per-primitive VPU cost measurement + thermal-kernel cycle accounting.

Round-4 verdict #1 offered two acceptable outcomes for the thermal kernel's
"35.8% of the VPU ops ceiling" (vs 55.5% deterministic): close the gap, or
prove the floor with cycle accounting. The trip-level noise-prefetch
restructure measured UNCHANGED (docs/BENCH_NOISE_PREFETCH_TPU_v5e.json) -
consistent with the sampler's ops already overlapping the RK4 chain - so
this script settles WHY the gap exists: the roofline's "ops ceiling"
counts every elementwise op as one VPU slot, but the sampler is built from
log/cos/sqrt, which Mosaic lowers to multi-slot polynomial/iterative
sequences.

Method: for each primitive, a Pallas kernel runs a SERIAL DEPENDENT chain
of the op over one (8, 128) vreg (dependent so each op's full latency is
exposed and nothing overlaps - the same worst-case the RK4 chain lives
in), wrapped in an in-kernel fori_loop so total work is tens of ms (the
tunneled dispatch costs ~2 ms/call and would swamp a microsecond chain);
the slope between two trip counts gives ns per op per vreg. The sampler's
op inventory (from _normal_pair_from_bits + _noise3) then prices the
thermal premium in measured op costs and compares it to the measured
thermal-vs-det kernel marginal.

Writes docs/VPU_OP_COSTS_TPU_v5e.json. Run on the TPU (one process).
"""

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


_BODY_OPS = 100  # dependent ops per loop trip (loop overhead cancels in slope)


def _chain_kernel(x_ref, o_ref, *, op, trips):
    def body(_, x):
        for _ in range(_BODY_OPS):
            x = op(x)
        return x

    o_ref[:] = jax.lax.fori_loop(0, trips, body, x_ref[:])


# Every chain step holds its value at a float32 FIXED POINT (x=1) so the
# output can legally feed the next kernel call (see time_chain), and every
# step is NONLINEAR in x: a chain of x*c folds to x*c^n by reassociation
# (measured: a 1e7-multiply constant chain ran at dispatch speed with the
# exact sequential-f32 result), so constant-affine steps cannot be used.
# ``ops`` lists each step's op composition for the linear pricing model.
OPS = {
    "base2": lambda x: x * (2.0 - x),  # Newton-reciprocal step; 2 simple ops
    "sqrt": jnp.sqrt,
    "rsqrt": jax.lax.rsqrt,
    "log": lambda x: jnp.log(x) + 1.0,
    "exp": lambda x: jnp.exp(x) * (1.0 / 2.718281828459045),
    "cos": lambda x: jnp.cos(x) + 0.4596976941,
    "div": lambda x: 2.0 / (x + 1.0),
    "select": lambda x: jnp.where(x > 0.5, x, x + 1e-7),
}
# companion simple-op count per step (priced at base2/2 each and
# subtracted to isolate the headline op's cost)
OP_COMPANIONS = {
    "base2": 0, "sqrt": 0, "rsqrt": 0, "log": 1, "exp": 1, "cos": 1,
    "div": 1, "select": 1,
}


def time_chain(op, trips, iters=8, warmup=12):
    """Wall time per kernel call, with calls CHAINED output->input.

    Two traps this harness dodges (both measured on the axon tunnel):
      * independent identical calls overlap in the remote pool, so timing
        `f(x)` eight times measures one call's latency, not eight - every
        OPS entry holds its value near a float32 fixed point so the output
        can legally feed the next call;
      * `block_until_ready` alone returned before remote completion for
        this call pattern - a host scalar read is the reliable sync.
    """
    f = pl.pallas_call(
        lambda x_ref, o_ref: _chain_kernel(x_ref, o_ref, op=OPS[op],
                                           trips=trips),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
    )
    x = jnp.ones((8, 128), jnp.float32)
    fj = jax.jit(f)
    out = x
    for _ in range(warmup):
        out = fj(out)
    float(out[0, 0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fj(out)
    float(out[0, 0])  # host read: the only reliable remote sync here
    return (time.perf_counter() - t0) / iters


def measure_op(op):
    """ns per op per vreg from the slope between two trip counts (the
    intercept absorbs dispatch overhead and loop control)."""
    lo, hi = 40_000, 120_000  # 4e6 / 1.2e7 dependent ops: >=10 ms signal
    t_lo = min(time_chain(op, lo) for _ in range(3))
    t_hi = min(time_chain(op, hi) for _ in range(3))
    return (t_hi - t_lo) / ((hi - lo) * _BODY_OPS) * 1e9


def main():
    print(f"backend={jax.default_backend()} devices={jax.devices()}",
          flush=True)
    step_ns = {}
    for op in OPS:
        step_ns[op] = round(measure_op(op), 3)
        print(f"{op:8s} {step_ns[op]:7.3f} ns/step/vreg", flush=True)

    simple = step_ns["base2"] / 2.0  # one mul/add-class op
    isolated = {
        op: round(step_ns[op] - OP_COMPANIONS[op] * simple, 3)
        for op in OPS if op != "base2"
    }
    isolated["simple"] = round(simple, 3)
    print("isolated ns/op/vreg:", isolated, flush=True)

    # Sampler op inventory per 3-normal field draw (rk4_noise='per_substep'
    # = one field per substep), from the CURRENT ops/pallas_integrator.py
    # sampler (round 5, quadrant-folded trig — _normal_pair_from_bits +
    # _cos_sin_2pi): 1.5 transforms, each = log x1 (r^2), sqrt x1 (r),
    # ~4 selects (quadrant swap/sign), ~37 simple ops (two uniform
    # constructions, fold arithmetic, the two Cephes polynomials, bit
    # ops, r*c / r*s); + 3 sigma multiplies + 3 adds into the field.
    inv = {"log": 1.5, "sqrt": 1.5, "select": 6.0, "simple": 1.5 * 37 + 6}
    sampler_ns_per_vreg = sum(isolated[k] * v for k, v in inv.items())

    # The round-4 sampler this analysis originally priced (libm cos +
    # sign-times-sqrt sin recovery) — kept on record because its ~64
    # ns/vreg cos line item is what motivated the trig fold
    # (docs/BENCH_TRIG_FOLD_TPU_v5e.json).
    inv_prefold = {"log": 1.5, "cos": 1.5, "sqrt": 3.0, "select": 1.5,
                   "simple": 1.5 * 12 + 6}
    prefold_ns = sum(isolated[k] * v for k, v in inv_prefold.items())

    # The RK4 deterministic body (easy_z RHS x4 stages + combine +
    # normalize): ~185 mul/add-class ops + 1 sqrt + 3 div + selects
    det_inv = {"simple": 185, "sqrt": 1.0, "div": 3.0, "select": 8.0}
    det_ns_per_vreg = sum(isolated[k] * v for k, v in det_inv.items())

    out = {
        "bench": "vpu_op_costs",
        "backend": jax.default_backend(),
        "method": (
            "serial dependent fixed-point op chains in one (8,128) vreg, "
            "kernel calls chained output->input (independent calls overlap "
            "in the remote pool), host-read sync; ns/step from the slope "
            "between 4e6 and 1.2e7 total ops; companion simple ops priced "
            "at base2/2 and subtracted"
        ),
        "step_ns_per_vreg": step_ns,
        "isolated_ns_per_op_per_vreg": isolated,
        "sampler_inventory_per_substep_field": inv,
        "sampler_pred_ns_per_vreg_substep": round(sampler_ns_per_vreg, 2),
        "prefold_sampler_inventory": inv_prefold,
        "prefold_sampler_pred_ns_per_vreg_substep": round(prefold_ns, 2),
        "det_body_inventory_per_substep": det_inv,
        "det_pred_ns_per_vreg_substep": round(det_ns_per_vreg, 2),
        "note": (
            "Comparison scale: ns/vreg x 4 vregs (4096 envs / 1024 per vreg) "
            "vs the roofline marginals (docs/ROOFLINE_TPU_v5e.json). Serial- "
            "latency predictions consistently overstate the pipelined kernel "
            "by ~2.4-3.1x (the chains' ILP): det 304 ns/vreg -> 1.22 us "
            "serial vs 0.399 measured (3.1x); CURRENT folded sampler 116 "
            "ns/vreg -> 0.46 us serial vs the measured 0.197 us thermal-det "
            "marginal gap (2.4x); PRE-FOLD sampler 180 ns/vreg -> 0.72 us "
            "serial vs round-4's measured 0.243 us gap (3.0x). The closed "
            "loop says: (a) the round-4 '35.8% of ops ceiling' figure was an "
            "op-counting artifact (a transcendental is not one slot - cos "
            "alone is ~48 simple-op equivalents), and (b) the remaining "
            "thermal premium is the folded sampler's log/sqrt/polynomial "
            "work at its measured per-op price, i.e. near the real cycle "
            "floor."
        ),
    }
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "docs", "VPU_OP_COSTS_TPU_v5e.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print("wrote", path)


if __name__ == "__main__":
    main()
