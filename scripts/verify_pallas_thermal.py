"""Real-TPU verification of the Pallas thermal noise distribution.

Interpret mode stubs the on-core PRNG, so this check needs hardware:
run `python scripts/verify_pallas_thermal.py` on a TPU backend.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from spintorque_tpu.physics import IntegratorConfig, LLGSParams
from spintorque_tpu.ops.pallas_integrator import integrate_pulse_pallas

PARAMS = LLGSParams(
    saturation_magnetization=800e3, damping=0.01, uniaxial_anisotropy=1.2e6,
    volume=1e-24, polarization=0.7,
    easy_axis=jnp.array([0.0, 0.0, 1.0], jnp.float32),
)


def main() -> int:
    from spintorque_tpu.ops.pallas_integrator import tpu_kernel_available

    if not tpu_kernel_available():
        print("SKIP: needs a real TPU backend")
        return 0
    B = 4096
    m = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32), (B, 1))
    # 'physical' noise mode scales with 1/sqrt(dt): visible deflections.
    cfg = IntegratorConfig(method="heun", thermal=True, noise_mode="physical",
                           max_substeps=256)
    (px, py, pz), n, dt, failed = integrate_pulse_pallas(
        (m[:, 0], m[:, 1], m[:, 2]),
        jnp.full((B,), 1e-10, jnp.float32),
        jnp.zeros((B,), jnp.float32),
        PARAMS, cfg, key=jax.random.PRNGKey(0), temperature=300.0,
    )
    px, py, pz = np.asarray(px), np.asarray(py), np.asarray(pz)
    ok = True
    def check(name, cond):
        nonlocal ok
        print(f"  {name}: {'OK' if cond else 'FAIL'}")
        ok &= bool(cond)
    check("finite", np.isfinite(px).all() and np.isfinite(py).all())
    check("two-sided x", (px > 1e-5).any() and (px < -1e-5).any())
    check("two-sided y", (py > 1e-5).any() and (py < -1e-5).any())
    check("mean ~ 0 (|mean| < 3 std/sqrt(B))",
          abs(px.mean()) < 3 * px.std() / np.sqrt(B) + 1e-9)
    check("x/y isotropy (std ratio in [0.8, 1.25])",
          0.8 < px.std() / max(py.std(), 1e-12) < 1.25)
    check("no silent pole resets", not (pz == 1.0).all())
    print("thermal tilt std:", px.std())
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
