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
    if plat:
        import jax

        try:
            jax.config.update("jax_platforms", plat)
        except Exception:
            pass
    enable_compilation_cache()


def enable_compilation_cache(path: str | None = None) -> str | None:
    """Enable JAX's persistent compilation cache so a CLI re-run with the
    same geometry skips the (minutes-long on TPU) XLA compile.

    The reference amortizes plan creation with FFTW wisdom / the OptimalFFT
    cost-table cache (``Signal/General/OptimalFFT.C``); the XLA analogue is
    the on-disk executable cache.  Directory: ``path`` argument, else
    ``$DSPSR_TPU_CACHE_DIR``, else ``~/.cache/dspsr_tpu/jax``.  Set
    ``DSPSR_TPU_CACHE_DIR=0`` to disable.  Returns the directory used (or
    None when disabled/unavailable).
    """
    d = path or os.environ.get("DSPSR_TPU_CACHE_DIR")
    if d == "0":
        return None
    if not d:
        d = os.path.join(os.path.expanduser("~"), ".cache", "dspsr_tpu", "jax")
    try:
        os.makedirs(d, exist_ok=True)
        import jax

        jax.config.update("jax_compilation_cache_dir", d)
        # cache every compile that took longer than a second (the default
        # 1 s floor skips nothing we care about; CLI compiles are 30-200 s)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        return d
    except Exception:
        return None
