"""Fourth-order moments of the electric field.

Equivalent of the reference ``dsp::FourthMoment``
(``Signal/General/FourthMoment.C``; the dspsr ``-4`` option feeding pdmp
statistics): from the detected Stokes vector S = (I, Q, U, V) per sample,
accumulate the 10 unique second-order products S_i S_j (i <= j), giving the
4 Stokes + 10 moments = 14 planes that fold into phase bins.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

#: (i, j) index pairs of the 10 unique products, in reference order
PAIRS = [(i, j) for i in range(4) for j in range(i, 4)]


@jax.jit
def fourth_moment(stokes: jnp.ndarray) -> jnp.ndarray:
    """[nchan, 4, ndat] Stokes -> [nchan, 14, ndat]: S then S_i*S_j."""
    prods = [stokes[:, i] * stokes[:, j] for (i, j) in PAIRS]
    return jnp.concatenate([stokes, jnp.stack(prods, axis=1)], axis=1)
