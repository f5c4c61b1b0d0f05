"""JAX platform selection helper.

Some deployment images register an out-of-tree PJRT plugin at interpreter
startup (sitecustomize) and force it as the default platform, overriding the
``JAX_PLATFORMS`` environment variable.  ``ensure_platform_from_env`` makes
the env var authoritative again by re-applying it through jax.config after
import.  CLI entry points call this so driving the tools with
``JAX_PLATFORMS=cpu`` actually runs on host CPU.
"""

from __future__ import annotations

import os


def ensure_platform_from_env() -> None:
    want = os.environ.get("JAX_PLATFORMS")
    if want:
        try:
            import jax
            jax.config.update("jax_platforms", want)
        except Exception:
            pass
    _maybe_start_trace()


def _maybe_start_trace() -> None:
    """Whole-process XLA profiler capture when AAT_TRACE_DIR is set
    (utils/profiling.py): trace starts here, stops at interpreter exit."""
    logdir = os.environ.get("AAT_TRACE_DIR")
    if not logdir:
        return
    try:
        import atexit
        import jax
        jax.profiler.start_trace(logdir)
        atexit.register(jax.profiler.stop_trace)
    except Exception:
        pass
