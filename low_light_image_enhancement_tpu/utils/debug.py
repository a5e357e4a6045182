"""Numerical-safety instrumentation (SURVEY.md §5 "race detection /
sanitizers" slot): the device graph is functional so there are no data races;
the failure mode that exists is NaN/Inf creep. ``checked(fn)`` wraps a jnp
function with jax.experimental.checkify float checks so any NaN/Inf raised
inside the jitted graph surfaces as a Python error with location info."""

from __future__ import annotations

from typing import Callable

import jax
from jax.experimental import checkify


def checked(fn: Callable, *, jit: bool = True) -> Callable:
    """Returns a wrapper that runs ``fn`` under checkify float/div checks and
    throws on the first NaN/Inf/zero-division produced inside."""
    errs = checkify.float_checks | checkify.div_checks
    cfn = checkify.checkify(fn, errors=errs)
    if jit:
        cfn = jax.jit(cfn)

    def wrapper(*args, **kwargs):
        err, out = cfn(*args, **kwargs)
        err.throw()
        return out

    return wrapper
