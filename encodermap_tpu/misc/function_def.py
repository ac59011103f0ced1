# encodermap_tpu/misc/function_def.py
"""The ``em.function`` decorator: jit with an eager debug escape.

Mirrors the reference's re-wrap of ``tf.function``
(``/root/reference/encodermap/misc/function_def.py:38-61``): with
``debug=True`` the function runs eagerly (python) so breakpoints and prints
work; otherwise it is ``jax.jit``-compiled.
"""

from __future__ import annotations

import functools
from typing import Any, Callable

import jax

__all__ = ["function"]


def function(fn: Callable = None, *, debug: bool = False, **jit_kwargs: Any):
    """Decorator: ``@function`` jits; ``@function(debug=True)`` stays eager."""

    def wrap(f: Callable) -> Callable:
        if debug:
            @functools.wraps(f)
            def eager(*args, **kwargs):
                with jax.disable_jit():
                    return f(*args, **kwargs)

            return eager
        return jax.jit(f, **jit_kwargs)

    if fn is not None:
        return wrap(fn)
    return wrap
