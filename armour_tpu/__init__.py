"""armour_tpu: TPU-native receding-horizon safe planning and robust control
for serial manipulators (capabilities of roahmlab/armour, re-designed for
JAX/XLA/Pallas on TPU)."""

__version__ = "0.1.0"

import jax as _jax

# Safety-critical set arithmetic: the TPU MXU's default matmul precision is
# bfloat16, which loses ~2e-2 relative on reachable-set radii (measured on
# the hyperplane buffer delta) — far outside the 1e-4 reference-match
# tolerance and unsound for containment.  Pin every dot to full fp32.  The
# hot path is VPU/bandwidth-bound elementwise math, so this costs ~nothing.
_jax.config.update("jax_default_matmul_precision", "highest")
