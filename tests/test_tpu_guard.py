"""Bounded TPU liveness probe (utils.tpu_guard) — the guard that keeps
bench.py / __graft_entry__.entry from hanging the driver when the relayed
TPU backend wedges (CLAUDE.md: observed wedges of hours after a killed
TPU-attached process)."""

import os

import jax

from evr_tpu.utils.tpu_guard import ensure_live_backend


def test_cpu_pinned_env_also_pins_config():
    """JAX_PLATFORMS=cpu must short-circuit the probe AND re-assert the pin
    at jax-config level: the sitecustomize force-registers the relay
    platform at config level, so the env var alone would still boot (and
    possibly hang on) the wedged relay."""
    old = os.environ.get("JAX_PLATFORMS")
    os.environ["JAX_PLATFORMS"] = "cpu"
    try:
        assert ensure_live_backend(timeout_s=5) == "cpu"
        assert jax.config.jax_platforms == "cpu"
    finally:
        if old is None:
            os.environ.pop("JAX_PLATFORMS", None)
        else:
            os.environ["JAX_PLATFORMS"] = old


def test_dead_platform_falls_back_to_cpu():
    """A platform that cannot initialize → probe fails → the process is
    (re)pinned to CPU and the caller is told it's a fallback."""
    old = os.environ.get("JAX_PLATFORMS")
    os.environ["JAX_PLATFORMS"] = "no_such_platform"
    try:
        assert ensure_live_backend(timeout_s=30) == "cpu-fallback"
        assert os.environ["JAX_PLATFORMS"] == "cpu"
        # the pin must be at jax-config level too (sitecustomize overrides
        # the env var alone in this environment)
        assert jax.config.jax_platforms == "cpu"
    finally:
        if old is None:
            os.environ.pop("JAX_PLATFORMS", None)
        else:
            os.environ["JAX_PLATFORMS"] = old
        jax.config.update("jax_platforms", "cpu")
