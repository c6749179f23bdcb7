"""Debug utilities: NaN/Inf checking for jitted programs.

The reference sprinkles ``check_nan`` asserts through the solver
(algorithms.py:886, :1988); under jit those must become ``checkify``
checks.  ``checked(fn)`` wraps a jittable function so NaN/Inf production
raises a Python error with a location, at the cost of extra bookkeeping —
enable with ``--debug_nan`` in the train CLI or wrap ad hoc.
"""

from __future__ import annotations

from typing import Callable

import jax
from jax.experimental import checkify


def checked(fn: Callable, jit: bool = True) -> Callable:
    """Wrap ``fn`` with float error checking (NaN/Inf/div-by-zero/OOB).

    The wrapper raises ``checkify.JaxRuntimeError`` when a check fires.
    """
    err_fn = checkify.checkify(fn, errors=checkify.float_checks)
    if jit:
        err_fn = jax.jit(err_fn)

    def wrapper(*args, **kwargs):
        err, out = err_fn(*args, **kwargs)
        checkify.check_error(err)
        return out

    return wrapper
