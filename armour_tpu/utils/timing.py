"""Reliable wall-clock timing of jitted functions.

On the tunneled TPU platform, jax.block_until_ready has been observed to
return before execution completes (timings off by 20x with backpressure
artifacts).  sync() forces a true host round-trip by summing one leaf and
converting to a Python float, which cannot complete until the computation
has finished.
"""

import time

import jax
import numpy as np


def sync(out) -> float:
    leaves = jax.tree_util.tree_leaves(out)
    acc = 0.0
    for leaf in leaves:
        try:
            acc += float(np.asarray(leaf).ravel()[0])
        except (TypeError, ValueError):
            pass
    return acc


def bench(fn, *args, iters: int = 5, warmup: int = 1):
    """Returns (best_seconds, last_output)."""
    out = None
    for _ in range(warmup):
        out = fn(*args)
        sync(out)
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        sync(out)
        best = min(best, time.perf_counter() - t0)
    return best, out
