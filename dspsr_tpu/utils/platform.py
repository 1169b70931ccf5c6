"""Platform selection helper.

The ambient "axon" TPU plugin registers itself regardless of the
``JAX_PLATFORMS`` environment variable, so honoring the user's choice needs
an explicit ``jax.config.update``.  CLI apps call :func:`configure_from_env`
before any jax computation.
"""

from __future__ import annotations

import os


def configure_from_env(default: str | None = None) -> None:
    """Force jax onto the platform named by $JAX_PLATFORMS (or ``default``).

    Must run before the first jax computation (importing jax is fine).
    """
    plat = os.environ.get("JAX_PLATFORMS", default)
    if not plat:
        return
    import jax

    try:
        jax.config.update("jax_platforms", plat)
    except Exception:
        pass
