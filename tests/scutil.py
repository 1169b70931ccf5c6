"""Split-complex test helpers."""
import numpy as np
import jax.numpy as jnp


def sc_of(c):
    """numpy complex -> (re, im) jnp float32 pair."""
    c = np.asarray(c)
    return (jnp.asarray(np.ascontiguousarray(c.real).astype(np.float32)),
            jnp.asarray(np.ascontiguousarray(c.imag).astype(np.float32)))


def c_of(x):
    """(re, im) pair -> numpy complex128."""
    return np.asarray(x[0]).astype(np.float64) + 1j * np.asarray(x[1]).astype(np.float64)
