"""armour_tpu: TPU-native receding-horizon safe planning and robust control
for serial manipulators (capabilities of roahmlab/armour, re-designed for
JAX/XLA/Pallas on TPU)."""

__version__ = "0.1.0"
