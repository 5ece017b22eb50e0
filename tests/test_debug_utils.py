"""Debug utilities: checkify wrapper catches NaNs; prints don't crash."""

import jax
import jax.numpy as jnp
import pytest

from madrona_tpu.utils.debug import checked, host_print, print_tensor


def test_checked_catches_nan():
    @checked
    @jax.jit
    def bad(x):
        return jnp.log(x)  # NaN for negative input

    bad(jnp.asarray([1.0, 2.0]))  # fine
    with pytest.raises(Exception):
        jax.block_until_ready(bad(jnp.asarray([-1.0])))


def test_prints_work_under_jit(capsys):
    @jax.jit
    def f(x):
        host_print("value {v}", v=x[0])
        print_tensor("x", x)
        return x * 2

    jax.block_until_ready(f(jnp.arange(4.0)))
