"""Profiling hooks (SURVEY.md §5): jax.profiler traces viewable in
Perfetto/XProf, and named scopes so each pipeline stage is attributable in
the trace timeline."""

from __future__ import annotations

import contextlib
from typing import Iterator, Optional

import jax


@contextlib.contextmanager
def profile_trace(log_dir: str, host_tracer_level: int = 2) -> Iterator[None]:
    """Capture a device+host trace into ``log_dir`` (open with XProf or
    Perfetto via tensorboard's profile plugin)."""
    options = jax.profiler.ProfileOptions()
    options.host_tracer_level = host_tracer_level
    jax.profiler.start_trace(log_dir, profiler_options=options)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def stage(name: str):
    """Named scope for a pipeline stage; shows up in traces and HLO metadata.

    Usable as decorator or context manager::

        with stage("illumination"):
            l = illumination_map(x)
    """
    return jax.named_scope(name)
