"""Persistent XLA compile cache for the CLIs.

Production TPU pods restart often (preemption, rolling deploys); without a
persistent cache every restart pays full retrace+compile. Enabling JAX's
compilation cache makes warm restarts near-instant — and on this repo's
1-core dev hosts it is the difference between a multi-minute and a
seconds-long pod-simulation run.

The CPU cache directory is keyed by host CPU identity: XLA:CPU stores AOT
machine code, and reusing a cache populated on a host with different vector
features warns about (and risks) SIGILL (same rationale as
`__graft_entry__._reexec_dryrun_on_virtual_cpu_mesh`).
"""

from __future__ import annotations

import hashlib
import os
import platform


def _host_cpu_tag() -> str:
    try:
        with open("/proc/cpuinfo") as f:
            cpu_id = next((l for l in f if l.startswith("flags")), platform.machine())
    except OSError:
        cpu_id = platform.machine()
    return hashlib.sha1(cpu_id.encode()).hexdigest()[:8]


def enable_compile_cache() -> None:
    """Idempotent; honors an explicit ``JAX_COMPILATION_CACHE_DIR``."""
    import jax

    backend = jax.default_backend()
    default = (
        f"/tmp/evr_tpu_jax_cache_cpu_{_host_cpu_tag()}"
        if backend == "cpu"
        else f"/tmp/evr_tpu_jax_cache_{backend}"
    )
    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            os.environ.get("JAX_COMPILATION_CACHE_DIR", default),
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # cache is an optimization, never a hard dependency
        pass
