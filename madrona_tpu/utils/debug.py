"""Debug utilities: in-kernel printing + NaN/bounds checking.

Reference parity (SURVEY.md §5.2/§5.5): HostPrint (device printf over a
unified-memory channel + drain thread, ``src/mw/device/host_print.cpp``)
maps to ``jax.debug.print`` — the channel/thread machinery is the
runtime's problem; ``Tensor::Printer`` maps to :func:`print_tensor`; the
debug-compile mode maps to :func:`checked` (jax.experimental.checkify:
NaN/OOB/div-by-zero checks compiled into the step)."""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax.experimental import checkify


def host_print(fmt: str, *args, **kwargs):
    """Device-side print (HostPrint::log equivalent); works under jit."""
    jax.debug.print(fmt, *args, **kwargs)


def print_tensor(name: str, value, summarize: bool = True):
    """Tensor::Printer equivalent: dump a named tensor from inside jit."""
    if summarize:
        jax.debug.print(
            name + ": shape={s} min={mn} max={mx} mean={me}",
            s=value.shape, mn=jnp.min(value), mx=jnp.max(value),
            me=jnp.mean(value.astype(jnp.float32)),
        )
    else:
        jax.debug.print(name + ": {v}", v=value)


def checked(fn: Callable) -> Callable:
    """Wrap a step function with float/index/div checks (the TPU analogue
    of the reference's Debug-mode megakernel compile,
    ``CompileConfig::OptMode::Debug``). Returns fn' that raises on the
    first NaN/OOB with a traceback to the offending op."""
    cfn = checkify.checkify(
        fn, errors=checkify.float_checks | checkify.index_checks
    )

    def wrapped(*args, **kwargs):
        err, out = cfn(*args, **kwargs)
        checkify.check_error(err)
        return out

    return wrapped
