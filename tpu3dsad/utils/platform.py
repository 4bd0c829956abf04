"""Process-level JAX platform forcing for the CLI entry points.

One shared implementation of the ``TPU3DSAD_PLATFORM`` debug/bench toggle
(CLAUDE.md env-var convention) so every entry point behaves identically:
the axon sitecustomize force-registers the tunneled TPU in every process
and a DEAD tunnel hangs backend init >150s rather than raising, so a
plain ``JAX_PLATFORMS=cpu`` environment variable is not honored — the
platform must be forced via ``jax.config`` BEFORE the first backend
touch. Call this first thing in ``main()`` (before building models,
datasets, or anything that could trigger backend init).
"""

from __future__ import annotations

import os


def force_platform_from_env(var: str = "TPU3DSAD_PLATFORM") -> str | None:
    """If ``$TPU3DSAD_PLATFORM`` is set (e.g. ``cpu`` | ``axon``), pin the
    JAX platform before backend init. Returns the forced platform or None.

    Importing jax here (not at module import) keeps this safe to call
    from entry points that delay their jax import (demo.py).
    """
    plat = os.environ.get(var)
    if plat:
        import jax

        jax.config.update("jax_platforms", plat)
    return plat or None
