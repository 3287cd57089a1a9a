"""Device profiling helpers (reference analogue: -pg / PGO build flavors,
Makefile:16-28; here: jax.profiler traces)."""

from __future__ import annotations

import contextlib
from typing import Iterator, Optional


@contextlib.contextmanager
def trace(logdir: Optional[str] = None) -> Iterator[None]:
    """Capture a jax.profiler device trace around a codec run.

    View with TensorBoard or xprof: ``x3tpu.utils.profiling.trace('/tmp/tr')``.
    No-op when logdir is None.
    """
    if logdir is None:
        yield
        return
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named trace span for host-side phases."""
    import jax

    return jax.profiler.TraceAnnotation(name)
