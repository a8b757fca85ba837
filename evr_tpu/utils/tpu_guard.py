"""Bounded TPU-backend liveness probe with honest CPU fallback.

This environment reaches its one TPU chip through a relayed transport
whose backend initialization can wedge INDEFINITELY after an earlier
TPU-attached process was killed (observed: hours — see CLAUDE.md). A
process that calls ``jax.devices()`` during such a wedge hangs forever,
which would stall the external driver that runs ``bench.py`` and the
``__graft_entry__`` compile checks.

:func:`ensure_live_backend` probes the configured default platform in a
SUBPROCESS with a hard timeout. If the probe cannot initialize a backend
in time, the CURRENT process is config-pinned to CPU
(``jax.config.update("jax_platforms", "cpu")`` — the env var alone is not
enough here, the sitecustomize force-registers the relay platform at
config level) so the caller still produces an artifact, clearly marked as
a fallback, instead of hanging. A healthy chip passes the probe in
seconds and nothing changes.
"""

from __future__ import annotations

import os
import subprocess
import sys

# The probe subprocess must honor an operator-pinned JAX_PLATFORMS at
# jax-config level (the utils.platform_pin pattern): the sitecustomize
# force-registers the relay platform at config level in EVERY interpreter,
# so a bare `import jax; jax.devices()` would ignore the env var, boot the
# healthy relay, and report ok even when the operator pinned a platform
# that cannot initialize. Pinning inside the probe makes the guard honor
# operator pins and makes the dead-platform fallback deterministic.
_PROBE_SRC = (
    "import os, jax\n"
    "plat = os.environ.get('JAX_PLATFORMS')\n"
    "if plat:\n"
    "    jax.config.update('jax_platforms', plat)\n"
    "print('backend:', jax.default_backend(), len(jax.devices()))\n"
)


def ensure_live_backend(timeout_s: float | None = None) -> str:
    """Return the platform the current process should use ('tpu-ok' means
    the configured platform probed healthy; 'cpu-fallback' means the probe
    hung or errored and this process has been config-pinned to CPU).

    No-op (returns 'cpu') when the environment is already CPU-pinned.
    Timeout defaults to 900 s, overridable via ``EVR_TPU_PROBE_TIMEOUT``.
    (Raised from 240 s in round 4: after ANY previous chip process exits —
    even cleanly — the next claim through this relay reliably takes
    10-30 min in a polling loop before proceeding normally. A 240 s probe
    declared those healthy-but-slow claims dead and pinned the artifact
    run to CPU; 900 s rides out the observed delays while still bounding
    a true wedge.)
    """
    if os.environ.get("JAX_PLATFORMS", "").strip().lower() == "cpu":
        # The env var alone does NOT win here: the sitecustomize
        # force-registers the relay platform at jax-config level, so an
        # operator-pinned CPU process would still boot (and possibly hang
        # on) the relay. Re-assert the pin at config level before
        # returning (same pattern as utils.platform_pin).
        from evr_tpu.utils.platform_pin import pin_platform_from_env

        pin_platform_from_env()
        return "cpu"
    if timeout_s is None:
        timeout_s = float(os.environ.get("EVR_TPU_PROBE_TIMEOUT", "900"))
    try:
        proc = subprocess.run(
            [sys.executable, "-c", _PROBE_SRC],
            timeout=timeout_s,
            capture_output=True,
            text=True,
        )
        ok = proc.returncode == 0 and "backend:" in proc.stdout
    except subprocess.TimeoutExpired:
        ok = False
    if ok:
        return "tpu-ok"
    import jax

    print(
        f"WARNING: accelerator backend failed to initialize within "
        f"{timeout_s:.0f}s (relay wedge or unavailable); falling back to "
        "CPU so this run still completes. Numbers from this run are "
        "CPU-bound — re-run when the chip is reachable.",
        file=sys.stderr,
        flush=True,
    )
    os.environ["JAX_PLATFORMS"] = "cpu"
    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass
    return "cpu-fallback"
