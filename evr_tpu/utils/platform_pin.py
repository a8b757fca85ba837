"""Honor ``JAX_PLATFORMS`` at jax-config level for every CLI.

Some hosts force-register an accelerator platform from sitecustomize at
import time, which silently overrides the ``JAX_PLATFORMS`` environment
variable — a CLI the operator explicitly pinned to CPU then lands on the
accelerator anyway (and N such processes contend for one chip). Calling
:func:`pin_platform_from_env` right after ``import jax`` re-asserts the
operator's choice at config level, which wins over the sitecustomize
registration. No-op when ``JAX_PLATFORMS`` is unset.

Every ``evr_tpu.tools`` entry point calls this before touching any device
(same pattern `tools/finetune.py` pioneered for pod-simulation workers).
"""

from __future__ import annotations

import os


def pin_platform_from_env() -> str | None:
    """If ``JAX_PLATFORMS`` is set, pin it via ``jax.config`` and return it."""
    plat = os.environ.get("JAX_PLATFORMS")
    if plat:
        import jax

        jax.config.update("jax_platforms", plat)
    return plat or None
