"""Debug / observability switches.

TPU-native equivalents of the reference's runtime checks
(reference: geotransformer/utils/torch.py:83-94 — cudnn determinism +
autograd anomaly detection; engine/base_trainer.py:219-227 — NaN/Inf grad
dump): JAX is deterministic by construction with threaded PRNG keys; NaN
checks map to jax_debug_nans/jax_debug_infs; profiling maps to
jax.profiler traces.
"""

from __future__ import annotations

import contextlib
import os
from typing import Optional

import jax


def enable_anomaly_detection(nans: bool = True, infs: bool = False) -> None:
    """Fail fast (with a traceback to the offending primitive) when a NaN or
    Inf is produced anywhere — the analogue of torch's anomaly detection
    (reference utils/torch.py:94). Expensive: re-runs ops un-jitted on
    failure; use for debugging, not production."""
    jax.config.update("jax_debug_nans", nans)
    jax.config.update("jax_debug_infs", infs)


def seed_everything(seed: int) -> jax.Array:
    """Deterministic seeding (reference utils/torch.py:83-94): JAX has no
    global RNG — return the root key that all randomness must thread
    through; numpy's global state is seeded for host-side code."""
    import numpy as np
    import random

    random.seed(seed)
    np.random.seed(seed)
    return jax.random.PRNGKey(seed)


@contextlib.contextmanager
def profile_trace(log_dir: str, enabled: bool = True):
    """jax.profiler trace context: replaces the reference's wall-clock-only
    Timer instrumentation (reference utils/timer.py:4-79) with full XLA
    traces viewable in TensorBoard / Perfetto."""
    if not enabled:
        yield
        return
    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named trace span (jax.profiler.TraceAnnotation) for profiling."""
    return jax.profiler.TraceAnnotation(name)
