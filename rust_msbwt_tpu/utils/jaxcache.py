"""Persistent XLA compilation cache for CLI entry points.

A cold ``msbwt2-build`` pays a multi-minute BCR-loop compile; with the
persistent cache every later invocation (same shapes) loads the compiled
program instead. Cache dir: ``$MSBWT_TPU_CACHE`` or
``~/.cache/msbwt_tpu/jax``.
"""

from __future__ import annotations

import logging
import os

logger = logging.getLogger(__name__)


def enable_persistent_cache() -> None:
    import jax

    path = os.environ.get(
        "MSBWT_TPU_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "msbwt_tpu", "jax"),
    )
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        # cache everything, including small/fast-compiling programs
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
    except Exception as e:  # cache is an optimization, never fatal
        logger.info("persistent compile cache unavailable: %s", e)
