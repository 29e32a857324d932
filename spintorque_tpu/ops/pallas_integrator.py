"""Pallas TPU kernel for the LLGS pulse integrator hot loop.

The XLA path (physics/integrator.py) runs one fused elementwise program per
substep inside a lax.while_loop; at small state sizes the loop becomes
latency-bound on per-iteration overhead. This kernel keeps the entire state
resident in VMEM for ALL substeps: one pallas_call runs the full masked
RK4/Euler loop with zero HBM traffic between substeps, plus native
on-core PRNG (pltpu.prng_random_bits + Box-Muller) for the thermal field
instead of host-keyed threefry.

Specializations (enforced by ``pallas_supported``):
  * float32
  * methods 'rk4', 'heun' and 'euler'; noise modes 'reference' and 'physical'

Any finite unit easy axis is covered, scalar (3,) or per-env (B, 3). The
common +z case (every canned device type) compiles a specialized RHS that
skips the axis loads and projection arithmetic; tilted axes take a general
RHS whose op order mirrors physics/llgs.py exactly.

Numerics match the XLA path op-for-op in the deterministic case (verified
by tests/unit/test_pallas_integrator.py at near-bitwise tolerance).
Layout: the (B,) env axis is reshaped to (B/128, 128) lanes; one grid
program per ROWS_PER_TILE-row tile of envs.
"""

from __future__ import annotations

import functools
import math
import threading
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..constants import GAMMA, KB_SOLVER, MU0
from ..physics.integrator import IntegratorConfig, substep_counts
from ..physics.llgs import LLGSParams

LANES = 128
# Tuning knob for scripts/bench_pallas_tiles.py / bench_pallas_dual.py;
# None = per-config default chosen inside _pallas_core (32 rows paired with
# 4 per-bound chains - see the tile comment there and docs/BENCH_DUAL*.json).
_TILE_ROWS_OVERRIDE: Optional[int] = None
# In-kernel substep-loop unroll factor (scripts/bench_pallas_unroll.py);
# None = per-config default inside _integrate_pulse_pallas. Masked substeps
# are no-ops, so running ceil(nmax/u) iterations of u body copies is exact.
_SUBSTEP_UNROLL_OVERRIDE: Optional[int] = None
# Independent row-group chains per tile, each with its OWN loop bound
# (scripts/bench_pallas_dual.py). None = per-config default. 1 = the plain
# single-chain tile; k > 1 = duration bucketing at tile/k granularity via
# segmented loops (chains retire as their bound is reached).
_CHAINS_OVERRIDE: Optional[int] = None

_N_STAGES = {"euler": 1, "heun": 2, "rk4": 4}


def pallas_supported(params: LLGSParams, config: IntegratorConfig, dtype) -> bool:
    """Whether the fast kernel covers this configuration (concrete params)."""
    if config.method not in _N_STAGES:
        return False
    if jnp.dtype(dtype) != jnp.float32:
        return False
    try:
        e = np.asarray(params.easy_axis)
    except Exception:  # traced easy axis: cannot decide here
        return False
    norm = np.linalg.norm(np.atleast_2d(e), axis=-1)
    return bool(np.all(np.isfinite(e)) and np.all(norm > 1e-12))


def _is_plus_z(easy_axis) -> bool:
    """True when every easy axis is exactly +z (specialized RHS applies).

    Returns False for traced axes (conservative: general RHS is used)."""
    try:
        e = np.asarray(easy_axis)
    except Exception:
        return False
    e = np.atleast_2d(e)
    return bool(
        np.all(np.abs(e[..., 0]) < 1e-12)
        and np.all(np.abs(e[..., 1]) < 1e-12)
        and np.all(e[..., 2] > 0)
    )


_TPU_PROBE: Optional[bool] = None


def tpu_kernel_available() -> bool:
    """Robust fast-path detection: the default device must identify as a TPU
    AND a trivial Pallas kernel must compile and run on it.

    jax.default_backend() alone is fragile - tunneled/experimental TPU
    plugins can register under another platform name (e.g. 'axon') while the
    device itself reports platform 'tpu'. The compile-probe settles it
    definitively either way. Result is cached for the process lifetime.
    """
    global _TPU_PROBE
    if _TPU_PROBE is not None:
        return _TPU_PROBE
    try:
        dev = jax.devices()[0]
        kind = getattr(dev, "device_kind", "") or ""
        looks_tpu = (
            dev.platform == "tpu"
            or "tpu" in kind.lower()
            or jax.default_backend() == "tpu"
        )
        if not looks_tpu:
            _TPU_PROBE = False
            return False

        def _probe_kernel(x_ref, o_ref):
            o_ref[:] = x_ref[:] + 1.0

        x = jnp.zeros((8, LANES), jnp.float32)
        out = pl.pallas_call(
            _probe_kernel,
            out_shape=jax.ShapeDtypeStruct((8, LANES), jnp.float32),
        )(x)
        _TPU_PROBE = bool(jax.block_until_ready(out)[0, 0] == 1.0)
    except Exception:
        _TPU_PROBE = False
    return _TPU_PROBE


def _cos_sin_2pi(u):
    """Signed (cos, sin) of theta = 2*pi*u for u in [0, 1).

    Quadrant folding (theta = (pi/2)(k + r), |r| <= 1/2, k = round(4u))
    plus the classic Cephes float32 minimax polynomials for cos/sin on
    |x| <= pi/4 - the same ~1-ulp accuracy class as the generic libm cos
    this replaces, WITHOUT its general-purpose range reduction. Motivation
    (docs/VPU_OP_COSTS_TPU_v5e.json, measured dependent-op latencies on
    v5e): lowered jnp.cos costs ~64 ns/vreg while mul/add-class ops cost
    ~1.3 ns, so the single cos dominated the whole Box-Muller transform;
    this fold + two short polynomials yields BOTH trig values for about a
    third of one lowered cos. The quadrant index also supplies the signs,
    so the pair needs no separate sign draw and no second sqrt.
    """
    q = u * 4.0
    k = jnp.floor(q + 0.5)
    x = (q - k) * (0.5 * math.pi)  # |x| <= pi/4
    z = x * x
    cp = ((2.443315711809948e-5 * z - 1.388731625493765e-3) * z
          + 4.166664568298827e-2) * (z * z) - 0.5 * z + 1.0
    sp = (((-1.9515295891e-4 * z + 8.3321608736e-3) * z
           - 1.6666654611e-1) * z) * x + x
    kb = jnp.bitwise_and(k.astype(jnp.int32), 3)
    swap = jnp.bitwise_and(kb, 1) == 1
    c = jnp.where(swap, sp, cp)
    s = jnp.where(swap, cp, sp)
    c = jnp.where((kb == 1) | (kb == 2), -c, c)
    s = jnp.where((kb == 2) | (kb == 3), -s, s)
    return c, s


def _normal_pair_from_bits(shape):
    """Two independent standard normals per Box-Muller transform (using both
    halves costs one log per TWO draws).

    prng_random_bits returns SIGNED int32 in this JAX version, so a naive
    .astype(float32) makes half the draws negative and log(u1) NaN - the
    thermal field would then silently reset trajectories via the per-substep
    normalize fallback. Mosaic also cannot lower uint32->f32 casts, so
    uniforms are built with the mantissa-bitcast trick: keep 23 random
    mantissa bits under exponent 0x3F8 to get f in [1, 2), subtract 1.

    The pair is (r cos theta, r sin theta) with r = sqrt(-2 log u1) and
    theta = 2 pi u2 - EXACT Box-Muller (no tail truncation - the
    Neel-Brown switching-rate test gates that), with both trig values from
    one quadrant-folded polynomial evaluation (_cos_sin_2pi; ~1 ulp, the
    same accuracy class as the lowered libm cos it replaced - history:
    round 4 used one cos and recovered sin as a sign times
    sqrt(r^2 - z0^2); the fold is cheaper than that single cos was).
    Validated by the KS/moment tests in
    tests/unit/test_pallas_integrator.py (which also check half-to-half
    independence) and on hardware by scripts/verify_pallas_thermal.py.
    """
    u1 = 1.0 - _uniform_from_bits(shape)  # (0, 1] - safe for log
    u2 = _uniform_from_bits(shape)
    r = jnp.sqrt(-2.0 * jnp.log(u1))
    c, s = _cos_sin_2pi(u2)
    return r * c, r * s


# Raw-bits source, indirected so tests can substitute a threefry-based
# stream: pltpu.prng_random_bits returns all ZEROS under interpret mode on
# CPU, which would otherwise make the thermal path untestable off-hardware
# (tests/unit/test_pallas_integrator.py monkeypatches this).
_prng_random_bits = pltpu.prng_random_bits


def _uniform_from_bits(shape):
    """Uniform [0, 1) floats from raw PRNG bits via mantissa bitcast."""
    bits = _prng_random_bits(shape)
    mant = jnp.bitwise_or(
        jnp.bitwise_and(bits, jnp.int32(0x7FFFFF)), jnp.int32(0x3F800000)
    )
    return pltpu.bitcast(mant, jnp.float32) - 1.0


# Trace-time spare buffer for Box-Muller's second half. Each transform
# yields TWO normals but a 3-component field draw needs an odd count; the
# spare carries the leftover to the NEXT draw in the same loop-body trace,
# so an unrolled body of u thermal substeps costs ceil(3u/2) transforms
# instead of 2u (the transcendentals dominate thermal cost - measured 0.74
# of the 0.80 ms thermal-vs-det kernel gap at B=4096). The buffer holds
# TRACERS, so it must never cross a trace boundary: it is cleared at every
# loop-body entry (see run() in _kernel) and at kernel entry - and it is
# THREAD-LOCAL, since two kernels may trace concurrently (e.g. the
# coalescing solver pool's daemon thread compiling a pulse while the main
# thread compiles an env step) and a shared list would hand one trace's
# tracer to the other. Spares are unscaled (sigma applied at use), so
# carrying one across chain boundaries inside a segment body is exact -
# iid draws have no order.
_SPARE_TLS = threading.local()


class _Spare:
    """Module-level facade so _SPARE.clear()/use sites stay simple while the
    storage is per-thread."""

    @staticmethod
    def _list():
        lst = getattr(_SPARE_TLS, "lst", None)
        if lst is None:
            lst = _SPARE_TLS.lst = []
        return lst

    def clear(self):
        self._list().clear()

    def pop(self):
        return self._list().pop()

    def append(self, x):
        self._list().append(x)

    def __bool__(self):
        return bool(self._list())

    def __getitem__(self, i):
        return self._list()[i]


_SPARE = _Spare()


def _normal_from_bits(shape):
    """One standard normal; every Box-Muller half is eventually used."""
    if _SPARE:
        if _SPARE[-1].shape == shape:
            return _SPARE.pop()
        # A shape change mid-trace (e.g. future heterogeneous chain heights)
        # must not strand stale spares behind the new one: drop them so the
        # buffer holds at most one live spare (review finding).
        _SPARE.clear()
    a, b = _normal_pair_from_bits(shape)
    _SPARE.append(b)
    return a


def _noise3(sigma, shape):
    """Three scaled normal fields (1.5 transforms amortized via _SPARE)."""
    return (
        sigma * _normal_from_bits(shape),
        sigma * _normal_from_bits(shape),
        sigma * _normal_from_bits(shape),
    )


def _noise_stages(sigma, shape, n_stages):
    """Per-stage (nx, ny, nz) noise for all RK stages of one substep."""
    return [_noise3(sigma, shape) for _ in range(n_stages)]


def _kernel(
    # scalar prefetch
    nmax_ref,  # (tiles, chains) int32 in SMEM: per-CHAIN substep bound
    seed_ref,  # (1,) int32 in SMEM
    # tensor inputs (VMEM blocks), then outputs; the easy-axis component
    # blocks (ex, ey, ez) are present only when easy_z=False.
    *refs,
    method: str,
    thermal: bool,
    easy_z: bool,
    rk4_per_substep: bool,
    unroll: int,
    chains: int,
    bf16_rhs: bool,
):
    n_in = 12 if easy_z else 15
    in_refs = refs[:n_in]
    ox_ref, oy_ref, oz_ref, failed_ref = refs[n_in:]

    tile = pl.program_id(0)
    if thermal:
        pltpu.prng_seed(seed_ref[0] + tile)
    _SPARE.clear()  # never reuse a draw tracer from another trace

    loads = [r[:] for r in in_refs]

    def make_body(vals):
        """Build one integration chain over the given (rows, LANES) arrays.
        ``dual`` builds TWO of these over disjoint half-tiles so each loop
        iteration carries two independent dependency chains - the RK4 body
        is latency-bound on its serial chain, and explicit second-chain ILP
        lets the scheduler fill the stalls."""
        (mx0, my0, mz0, current, dt, n, sigma,
         h_k, ms, gamma_eff, alpha, stt_c, *axis) = vals
        if bf16_rhs:
            # bf16 RHS variant: stage arithmetic in bfloat16, state carry /
            # accumulation / normalize in f32, noise transcendentals in f32
            # (cast after scaling). IntegratorConfig.bf16_rhs.
            def _c(x):
                return x.astype(jnp.bfloat16)

            h_k, ms, gamma_eff, alpha, stt_c = (
                _c(h_k), _c(ms), _c(gamma_eff), _c(alpha), _c(stt_c)
            )
            axis = [_c(a) for a in axis]
            dt_c = _c(dt)
        else:
            dt_c = dt
        if not easy_z:
            ex, ey, ez = axis
        shape = mx0.shape

        def cast_state(mx, my, mz):
            if bf16_rhs:
                return (
                    mx.astype(jnp.bfloat16),
                    my.astype(jnp.bfloat16),
                    mz.astype(jnp.bfloat16),
                )
            return mx, my, mz

        def cast_noise(noise):
            if bf16_rhs:
                return tuple(
                    v.astype(jnp.bfloat16) if hasattr(v, "astype") else v
                    for v in noise
                )
            return noise

        def acc(state, delta):
            """f32 state + (possibly bf16) delta."""
            if bf16_rhs:
                return state + delta.astype(jnp.float32)
            return state + delta

        def rhs_with_noise(mx, my, mz, noise):
            """dm/dt; op order mirrors physics/llgs.py for bitwise agreement.
            easy_z=True specializes e=(0,0,1): the projections collapse and
            the axis loads disappear (~30% fewer VPU ops deterministic)."""
            nx, ny, nz = noise
            if easy_z:
                anis = h_k * mz  # (m . z) scaled
                hx = 0.0 + nx
                hy = 0.0 + ny
                hz = anis - ms * mz + nz
                # torque: u = m x z = (my, -mx, 0); v = m x u (uz = 0).
                ux = my
                uy = -mx
                vx = -(mz * uy)
                vy = mz * ux
                vz = mx * uy - my * ux
            else:
                m_dot_e = mx * ex + my * ey + mz * ez
                anis = h_k * m_dot_e
                hx = anis * ex + nx
                hy = anis * ey + ny
                hz = anis * ez - ms * mz + nz
                # u = m x e; v = m x u  (llgs.py cross() term order)
                ux = my * ez - mz * ey
                uy = mz * ex - mx * ez
                uz = mx * ey - my * ex
                vx = my * uz - mz * uy
                vy = mz * ux - mx * uz
                vz = mx * uy - my * ux
            # precession p = m x h
            px = my * hz - mz * hy
            py = mz * hx - mx * hz
            pz = mx * hy - my * hx
            # damping d = m x p
            dx = my * pz - mz * py
            dy = mz * px - mx * pz
            dz = mx * py - my * px
            fx = -gamma_eff * (px + alpha * dx) + stt_c * vx
            fy = -gamma_eff * (py + alpha * dy) + stt_c * vy
            fz = -gamma_eff * (pz + alpha * dz) + stt_c * vz
            return fx, fy, fz

        zero_noise = (0.0, 0.0, 0.0)

        def normalize(mx, my, mz):
            norm = jnp.sqrt(mx * mx + my * my + mz * mz)
            finite = jnp.isfinite(mx) & jnp.isfinite(my) & jnp.isfinite(mz)
            ok = finite & (norm >= 1e-12)
            safe = jnp.where(ok, norm, 1.0)
            nx, ny, nz = mx / safe, my / safe, mz / safe
            ok = ok & jnp.isfinite(nx) & jnp.isfinite(ny) & jnp.isfinite(nz)
            return (
                jnp.where(ok, nx, 0.0),
                jnp.where(ok, ny, 0.0),
                jnp.where(ok, nz, 1.0),
            )

        def draw_noise():
            """All PRNG work for ONE substep (None when deterministic).

            Split out of substep_delta so the unrolled loop body can issue
            a whole trip's draws BEFORE the first RK4 chain op (see run()):
            the sampler's transcendentals depend only on the serial PRNG
            state, never on the magnetization chain, so fronting them gives
            the static scheduler license to fill the chain's dependency
            stalls with sampling work instead of interleaving draw->use
            pairs in program order (round-4 verdict #1)."""
            if not thermal:
                return None
            if method in ("euler", "heun"):
                return cast_noise(_noise3(sigma, shape))
            if rk4_per_substep:
                # One field realization across all four stages
                # (rk4_noise='per_substep'): 2 Box-Muller transforms per
                # substep instead of 6 - transcendentals dominate thermal.
                return [cast_noise(_noise3(sigma, shape))] * 4
            return [cast_noise(s) for s in _noise_stages(sigma, shape, 4)]

        def substep_delta(mx, my, mz, drawn):
            """One substep's (dx, dy, dz) increment - in bf16 when
            bf16_rhs, else f32 with the exact op order of the XLA path."""
            mx, my, mz = cast_state(mx, my, mz)
            if method == "euler":
                noise = drawn if thermal else zero_noise
                fx, fy, fz = rhs_with_noise(mx, my, mz, noise)
                return dt_c * fx, dt_c * fy, dt_c * fz
            if method == "heun":
                # Stochastic Heun: corrector reuses the predictor's noise.
                noise = drawn if thermal else zero_noise
                fx, fy, fz = rhs_with_noise(mx, my, mz, noise)
                gx, gy, gz = rhs_with_noise(
                    mx + dt_c * fx, my + dt_c * fy, mz + dt_c * fz, noise
                )
                return (
                    0.5 * dt_c * (fx + gx),
                    0.5 * dt_c * (fy + gy),
                    0.5 * dt_c * (fz + gz),
                )
            stage = drawn if thermal else [zero_noise] * 4
            k1x, k1y, k1z = rhs_with_noise(mx, my, mz, stage[0])
            k1x, k1y, k1z = dt_c * k1x, dt_c * k1y, dt_c * k1z
            k2x, k2y, k2z = rhs_with_noise(mx + k1x / 2, my + k1y / 2, mz + k1z / 2, stage[1])
            k2x, k2y, k2z = dt_c * k2x, dt_c * k2y, dt_c * k2z
            k3x, k3y, k3z = rhs_with_noise(mx + k2x / 2, my + k2y / 2, mz + k2z / 2, stage[2])
            k3x, k3y, k3z = dt_c * k3x, dt_c * k3y, dt_c * k3z
            k4x, k4y, k4z = rhs_with_noise(mx + k3x, my + k3y, mz + k3z, stage[3])
            k4x, k4y, k4z = dt_c * k4x, dt_c * k4y, dt_c * k4z
            return (
                (k1x + 2 * k2x + 2 * k3x + k4x) / 6,
                (k1y + 2 * k2y + 2 * k3y + k4y) / 6,
                (k1z + 2 * k2z + 2 * k3z + k4z) / 6,
            )

        def body(i, carry, drawn):
            # ``failed`` is carried as int32: Mosaic cannot legalize i1
            # vectors as scf.for loop carries.
            mx, my, mz, failed = carry
            dx, dy, dz = substep_delta(mx, my, mz, drawn)
            nx, ny, nz = acc(mx, dx), acc(my, dy), acc(mz, dz)
            nx, ny, nz = normalize(nx, ny, nz)
            active = i < n
            zero_row = active & (nx == 0.0) & (ny == 0.0) & (nz == 0.0)
            return (
                jnp.where(active, nx, mx),
                jnp.where(active, ny, my),
                jnp.where(active, nz, mz),
                jnp.maximum(failed, zero_row.astype(jnp.int32)),
            )

        return body, (mx0, my0, mz0, jnp.zeros(shape, jnp.int32)), draw_noise

    def run(body, draw, init, lo, hi):
        """Masked loop over substep indices [lo, hi) with in-body unroll;
        returns (carry, end_index) where end_index >= hi is the first index
        NOT executed (unrolled trips overshoot hi by up to unroll-1).
        Overshoot iterations are exact no-ops for envs with n <= i (the
        per-env masks), and the returned end_index lets multi-chain
        segments resume WITHOUT re-running overshot indices for chains that
        stay active (re-running would double-advance those envs). The
        thermal PRNG stream advances through overshoot, which is fine -
        the kernel stream is self-defined. Unrolling trades scf.for
        control overhead for ILP in the latency-bound body.

        The WHOLE trip's noise is drawn up front (``draw``), before the
        first chain op, so the sampler's serial-PRNG work is free to
        overlap the magnetization chain's dependency stalls instead of
        being interleaved draw->use in program order (round-4 verdict #1;
        deterministic mode draws nothing and is bit-identical)."""
        if unroll <= 1:
            def body1(i, carry):
                _SPARE.clear()  # spare tracers must not cross the body trace
                return body(i, carry, draw())

            return jax.lax.fori_loop(lo, hi, body1, init), hi

        def body_u(j, carry):
            _SPARE.clear()  # fresh per body trace; amortizes WITHIN the trip
            drawn = [draw() for _ in range(unroll)]  # front-load PRNG work
            for k in range(unroll):
                carry = body(lo + j * unroll + k, carry, drawn[k])
            return carry

        trips = (hi - lo + unroll - 1) // unroll
        return jax.lax.fori_loop(0, trips, body_u, init), lo + trips * unroll

    if chains <= 1:
        body, init, draw = make_body(loads)
        (mx, my, mz, failed), _ = run(body, draw, init, 0, nmax_ref[tile, 0])
        ox_ref[:] = mx
        oy_ref[:] = my
        oz_ref[:] = mz
        failed_ref[:] = failed
    else:
        # Multi-chain tile with PER-CHAIN trip counts. The tile splits into
        # ``chains`` independent row groups; envs are globally sorted by
        # descending n, so chain 0 holds the longest pulses in the tile and
        # the per-chain bounds satisfy B0 >= B1 >= ... The loop runs in
        # SEGMENTS: [0, B_{k-1}) advances every chain (full VPU width +
        # cross-chain ILP), [B_{k-1}, B_{k-2}) advances all but the last,
        # ..., [B_1, B_0) advances only chain 0. Work shrinks from
        # rows*B0 toward sum_c rows_c*B_c - duration bucketing INSIDE the
        # tile, at chain granularity, without paying narrow-tile iteration
        # latency while several chains are live. Numerically identical to
        # the single chain in DETERMINISTIC mode: identical per-lane ops,
        # and every segment bound only skips iterations the per-env masks
        # would no-op (tests/unit/test_pallas_unroll.py asserts bitwise
        # equality). Thermal results are statistically equivalent but not
        # bitwise comparable across chains/unroll/tile knobs - retiring a
        # chain stops its PRNG draws, so the realization depends on the
        # loop structure (the kernel stream is self-defined).
        rows_per_chain = loads[0].shape[0] // chains
        bodies = []
        inits = []
        draws = []
        for c in range(chains):
            sl = slice(c * rows_per_chain, (c + 1) * rows_per_chain)
            b, i0, d = make_body([v[sl] for v in loads])
            bodies.append(b)
            inits.append(i0)
            draws.append(d)

        def seg_body(active_chains):
            def body(i, carry, drawn):
                return tuple(
                    bodies[c](i, carry[c], drawn[c])
                    if c < active_chains else carry[c]
                    for c in range(chains)
                )
            return body

        def seg_draw(active_chains):
            def draw():
                return tuple(
                    draws[c]() if c < active_chains else None
                    for c in range(chains)
                )
            return draw

        carry = tuple(inits)
        lo = jnp.int32(0)
        # Segment j advances chains 0..j for i in [B_{j+1}, B_j); ``lo``
        # threads the unroll-overshoot end forward so no index repeats.
        for j in range(chains - 1, -1, -1):
            hi = jnp.maximum(nmax_ref[tile, j], lo)
            carry, lo = run(seg_body(j + 1), seg_draw(j + 1), carry, lo, hi)
        for c in range(chains):
            sl = slice(c * rows_per_chain, (c + 1) * rows_per_chain)
            mx, my, mz, failed = carry[c]
            ox_ref[sl] = mx
            oy_ref[sl] = my
            oz_ref[sl] = mz
            failed_ref[sl] = failed
    _SPARE.clear()  # do not hold this trace's tracers past kernel trace end


def _pad_rows(x, rows):
    r = x.shape[0]
    if r == rows:
        return x
    return jnp.pad(x, ((0, rows - r), (0, 0)))


def integrate_pulse_pallas(
    m0: Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray],
    span: jnp.ndarray,
    current: jnp.ndarray,
    params: LLGSParams,
    config: IntegratorConfig,
    key: Optional[jax.Array] = None,
    temperature: jnp.ndarray | float = 300.0,
    *,
    mesh=None,
    data_axis: str = "data",
):
    """Drop-in fast path for physics.integrator.integrate_pulse.

    Returns (mx, my, mz), n_substeps, dt, failed - same semantics as
    PulseResult fields. Requires pallas_supported(...) conditions.

    The +z-axis RHS specialization is resolved HERE, outside jit, where the
    easy axis is still a concrete array; inside the jitted impl it would be
    a tracer. Callers inside an outer jit get the general RHS (correct for
    every axis, ~1.3x the deterministic VPU work).

    ``mesh``: when the batch is sharded over a multi-device mesh, pass the
    mesh so the duration sort / inverse-permutation scatter / kernel all run
    PER SHARD under shard_map. Without it, jit's automatic partitioner would
    have to all-gather the batch for the global argsort - exactly the
    collective the zero-collective hot-loop design forbids. Per-shard
    sorting does not change results: the sort only groups envs into
    duration buckets; each env's integration is independent of its
    neighbors (tests/unit/test_pallas_sharding.py asserts bitwise equality).
    """
    easy_z = _is_plus_z(params.easy_axis)
    n_data = dict(mesh.shape).get(data_axis, 1) if mesh is not None else 1
    B = jnp.shape(m0[0])[0]
    # shard_map requires B % n_data == 0. Batches that do not divide the
    # mesh were never shardable over 'data' in the first place -
    # parallel.shard_env_state replicates them - so fall back to the plain
    # path (GSPMD handles replicated operands) instead of crashing at
    # trace time (review finding).
    if n_data > 1 and B % n_data == 0:
        return _integrate_pulse_pallas_sharded(
            m0, span, current, params, config, key, temperature,
            easy_z=easy_z, mesh=mesh, data_axis=data_axis,
        )
    return _integrate_pulse_pallas(
        m0, span, current, params, config, key, temperature, easy_z=easy_z
    )


def _prep_operands(m0, span, current, params, config, key, temperature, easy_z):
    """Broadcast every per-env quantity to a (B,) component array + scalar
    seed, so the core (and its shard_map wrapper) sees one uniform operand
    layout. Pure elementwise/broadcast work - partitions with the batch."""
    dtype = jnp.float32
    mx0, my0, mz0 = (jnp.asarray(c, dtype) for c in m0)
    B = mx0.shape[0]

    def bcast(x):
        return jnp.broadcast_to(jnp.asarray(x, dtype), (B,))

    arrays = [
        mx0, my0, mz0,
        bcast(span), bcast(current),
        bcast(params.saturation_magnetization),
        bcast(params.damping),
        bcast(params.uniaxial_anisotropy),
        bcast(params.volume),
        bcast(params.polarization),
    ]
    if config.thermal:
        if config.noise_mode not in ("reference", "physical"):
            raise ValueError(f"Unknown noise_mode: {config.noise_mode}")
        if config.rk4_noise not in ("per_stage", "per_substep"):
            raise ValueError(f"Unknown rk4_noise: {config.rk4_noise}")
        arrays.append(bcast(temperature))
        seed = (
            jax.random.randint(key, (), 0, 2**31 - 1, jnp.int32)
            if key is not None
            else jnp.int32(0)
        )
    else:
        arrays.append(jnp.zeros((B,), dtype))
        seed = jnp.int32(0)
    if not easy_z:
        exn, eyn, ezn = params.normalized_easy_axis()
        arrays += [bcast(exn), bcast(eyn), bcast(ezn)]
    return tuple(arrays), seed


def _shard_seed(seed, shard_idx):
    """Decorrelate the on-core PRNG across data shards: the kernel seeds each
    grid tile with seed + program_id, and every shard has the same tile ids,
    so without an offset all shards would draw IDENTICAL thermal fields. The
    stride (0x9E3779B ~ 1.7e8) dwarfs any realistic per-shard tile count;
    int32 wraparound for very large meshes is harmless (any distinct offset
    decorrelates the counter-based stream)."""
    return seed + shard_idx.astype(jnp.int32) * jnp.int32(0x9E3779B)


@functools.partial(jax.jit, static_argnames=("config", "easy_z"))
def _integrate_pulse_pallas(
    m0: Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray],
    span: jnp.ndarray,
    current: jnp.ndarray,
    params: LLGSParams,
    config: IntegratorConfig,
    key: Optional[jax.Array] = None,
    temperature: jnp.ndarray | float = 300.0,
    *,
    easy_z: bool = True,
):
    arrays, seed = _prep_operands(
        m0, span, current, params, config, key, temperature, easy_z
    )
    return _pallas_core(arrays, seed, config=config, easy_z=easy_z)


@functools.partial(
    jax.jit, static_argnames=("config", "easy_z", "mesh", "data_axis")
)
def _integrate_pulse_pallas_sharded(
    m0, span, current, params, config, key, temperature,
    *, easy_z, mesh, data_axis,
):
    """Shard-safe fast path: everything from the duration sort through the
    kernel and the inverse-permutation scatter runs PER SHARD of the 'data'
    axis. Each chip sorts/buckets its LOCAL batch - bucketing quality is
    per-chip and unchanged - and no data collective ever crosses the ICI
    (asserted on HLO by tests/integration/test_sharding.py with the Pallas
    path engaged)."""
    from jax.sharding import PartitionSpec as P

    arrays, seed = _prep_operands(
        m0, span, current, params, config, key, temperature, easy_z
    )

    def body(arrs, s):
        s = _shard_seed(s, jax.lax.axis_index(data_axis))
        return _pallas_core(arrs, s, config=config, easy_z=easy_z)

    return jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P(data_axis), P()),
        out_specs=((P(data_axis),) * 3, P(data_axis), P(data_axis), P(data_axis)),
        check_vma=False,
    )(arrays, seed)


def _pallas_core(arrays, seed, *, config: IntegratorConfig, easy_z: bool):
    """Sort -> tile -> kernel -> unsort for one (possibly per-shard) batch.

    ``arrays`` is the uniform (B,) operand tuple from _prep_operands; under
    shard_map B is the LOCAL batch and the sort/scatter below touch only
    this shard's rows."""
    if easy_z:
        (mx0, my0, mz0, span, current, ms_a, alpha_a, k_u_a, vol_a, pol_a,
         temp_a) = arrays
    else:
        (mx0, my0, mz0, span, current, ms_a, alpha_a, k_u_a, vol_a, pol_a,
         temp_a, ex_a, ey_a, ez_a) = arrays
    dtype = jnp.float32
    B = mx0.shape[0]

    dt, n = substep_counts(span, config.max_step)
    n = jnp.minimum(n, config.max_substeps)
    dt = span / n.astype(dtype)  # full-span integration when n is clamped

    # Sort envs by descending substep count so each grid tile holds pulses
    # of similar length and runs only to ITS OWN maximum (per-tile bound via
    # scalar prefetch). With uniformly random durations this cuts total
    # substep work from B*max(n) toward sum(n) - the masked loop otherwise
    # spends ~half its iterations holding finished envs. Outputs are
    # scattered back through the inverse permutation.
    perm = jnp.argsort(-n)
    # Inverse permutation via scatter, not a second argsort: TPU sorts are
    # multi-pass bitonic networks (~O(B log^2 B) passes) and this one sits
    # on the per-step critical path; scatter(iota) is a single pass.
    inv_perm = jnp.zeros_like(perm).at[perm].set(jnp.arange(B, dtype=perm.dtype))
    n_s = n[perm]
    dt_s = dt[perm]
    current = current[perm]
    mx0 = mx0[perm]
    my0 = my0[perm]
    mz0 = mz0[perm]

    # Per-env physics coefficients ride through the SAME sort as the state,
    # so each env integrates with its own parameters (and stt below mixes
    # only sorted arrays with the sorted current). The gathers are a
    # negligible (B,) shuffle.
    ms = ms_a[perm]
    alpha = alpha_a[perm]
    k_u = k_u_a[perm]
    vol = vol_a[perm]
    pol = pol_a[perm]
    h_k = (2.0 * k_u) / (MU0 * ms)
    gamma_eff = GAMMA / (1.0 + alpha**2)
    stt = pol * current / (ms * vol)
    stt = jnp.where(jnp.abs(current) > 1e-12, stt, 0.0)

    if not easy_z:
        ex_s = ex_a[perm]
        ey_s = ey_a[perm]
        ez_s = ez_a[perm]

    if config.thermal:
        temperature = temp_a[perm]
        denom = MU0 * ms * vol * GAMMA
        if config.noise_mode == "physical":
            # sigma ~ 1/sqrt(dt) must use the SORTED dt so each env's noise
            # amplitude rides with its env through the sort.
            sigma = jnp.sqrt(2.0 * alpha * KB_SOLVER * temperature / (denom * dt_s))
        else:
            sigma = jnp.sqrt(2.0 * alpha * KB_SOLVER * temperature / denom)
        sigma = jnp.where(temperature > 0.0, sigma, 0.0)
    else:
        sigma = jnp.zeros((B,), dtype)

    # Reshape (B,) -> (rows, 128), padded to a multiple of the tile rows.
    # (The round-2/3 narrow-tile bucketing rationale - 16-row tiles so each
    # serialized grid tile runs only to its own max n - is superseded by
    # per-chain bounds; docs/BENCH_TILES_TPU_v5e.json keeps the old sweep.)
    rows = -(-B // LANES)
    # Tile default 32 rows paired with 4 per-bound chains (below): duration
    # bucketing happens INSIDE the tile at 8-row chain granularity, so the
    # tile no longer needs to be narrow for bucketing - wide tiles amortize
    # loop latency while chains are live. Recorded sweep (v5e, B=4096,
    # random 0-5 ns, medians over fresh compiles, docs/BENCH_DUAL*.json):
    # det 2.78 ms (16-row single-chain round-3 default) -> 2.57 (32-row,
    # 4 chains, unroll 16); thermal 3.87 -> 3.49 (4 chains, unroll 4).
    pref_rows = _TILE_ROWS_OVERRIDE or 32
    rows_per_tile = min(pref_rows, max(8, -(-rows // 8) * 8))
    tiles = -(-rows // rows_per_tile)
    rows_padded = tiles * rows_per_tile

    def to2d(x, fill=0.0):
        flat = jnp.pad(x, (0, rows * LANES - B), constant_values=fill)
        return _pad_rows(flat.reshape(rows, LANES), rows_padded)

    n_tiled = _pad_rows(
        jnp.pad(n_s, (0, rows * LANES - B)).reshape(rows, LANES), rows_padded
    )
    args = [
        to2d(jnp.asarray(mx0, dtype)),
        to2d(jnp.asarray(my0, dtype)),
        to2d(jnp.asarray(mz0, dtype), fill=1.0),
        to2d(current),
        to2d(dt_s, fill=1.0),
        n_tiled,
        to2d(sigma),
        to2d(h_k),
        to2d(ms, fill=1.0),
        to2d(gamma_eff),
        to2d(alpha),
        to2d(stt),
    ]
    if not easy_z:
        args += [to2d(ex_s), to2d(ey_s), to2d(ez_s, fill=1.0)]

    # Per-CHAIN substep bounds: envs are sorted by descending n, so each of
    # the tile's ``chains`` row groups runs only to ITS OWN max n (computed
    # as a reduction so it stays correct even if the sort is disabled; the
    # segment logic in the kernel additionally maxes against the running
    # bound, so unsorted bounds degrade to extra masked iterations, never
    # missed ones... bounds here ARE descending because the global sort is).
    if _CHAINS_OVERRIDE is None:
        # Default: 8-row chains, at most 4 per tile (the recorded winner at
        # 32-row tiles; narrower chains are sub-vreg and regress - see
        # chains=8 rows in docs/BENCH_DUAL2_TPU_v5e.json).
        chains = min(4, max(1, rows_per_tile // 8))
    else:
        chains = max(1, int(_CHAINS_OVERRIDE))
    if rows_per_tile % chains:
        chains = 1
    rows_per_chain = rows_per_tile // chains
    chain_nmax = n_tiled.reshape(
        tiles, chains, rows_per_chain * LANES
    ).max(axis=2)  # (tiles, chains)

    block = (rows_per_tile, LANES)
    # index_map receives (grid_idx, *scalar_prefetch_refs).
    tensor_spec = pl.BlockSpec(
        block, lambda i, *prefetch: (i, 0), memory_space=pltpu.VMEM
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(tiles,),
        in_specs=[tensor_spec] * len(args),
        out_specs=[tensor_spec] * 4,
    )
    # Masked overshoot iterations are exact no-ops, so any unroll is
    # numerically identical (tests/unit/test_pallas_unroll.py). The round-3
    # single-chain sweep lives in docs/BENCH_UNROLL_TPU_v5e.json; defaults
    # below follow the round-4 chains-aware sweep.
    kernel = functools.partial(
        _kernel, method=config.method, thermal=config.thermal, easy_z=easy_z,
        rk4_per_substep=(config.rk4_noise == "per_substep"),
        # Per the round-5 fresh-compile-median sweeps under the
        # chains=4/32-row defaults: deterministic fastest at unroll=16
        # (2.64 ms median, docs/BENCH_DUAL4 + BENCH_TRIG_FOLD), and with
        # the quadrant-folded trig sampler the thermal winner moved
        # 8 -> 16 too (2.77 ms median vs 2.89 at u8, 3.34 at u4 -
        # docs/BENCH_TRIG_FOLD_TPU_v5e.json; the round-4 libm-cos sampler
        # had favored u8 at 3.16-3.31, docs/BENCH_DUAL5/6).
        unroll=_SUBSTEP_UNROLL_OVERRIDE or 16,
        chains=chains,
        bf16_rhs=bool(config.bf16_rhs),
    )
    ox, oy, oz, failed = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((rows_padded, LANES), dtype),
            jax.ShapeDtypeStruct((rows_padded, LANES), dtype),
            jax.ShapeDtypeStruct((rows_padded, LANES), dtype),
            jax.ShapeDtypeStruct((rows_padded, LANES), jnp.int32),
        ],
    )(
        chain_nmax.astype(jnp.int32),
        jnp.asarray([seed], jnp.int32),
        *args,
    )

    def back(x):
        return x.reshape(-1)[:B][inv_perm]

    return (
        (back(ox), back(oy), back(oz)),
        n,
        dt,
        back(failed).astype(bool),
    )
