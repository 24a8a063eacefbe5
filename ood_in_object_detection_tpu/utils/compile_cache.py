"""Persistent XLA compilation cache.

The reference has no compile step to cache (torch eager). Here everything is
one jitted executable whose first TPU compile costs ~20-40 s per (model,
batch, img_size) — a real tax on serving cold-starts and short CLI sweeps.
JAX's persistent compilation cache serializes compiled executables to disk
keyed by HLO fingerprint; enabling it makes every process after the first
start in ~1 s for already-seen shapes.

Exposed to every CLI as ``--compile_cache DIR`` (empty = off, the JAX
default). Safe to share between processes and across runs; stale entries are
keyed out automatically by the HLO/compiler-version fingerprint.
"""

from __future__ import annotations

import logging
from pathlib import Path

log = logging.getLogger("compile_cache")


def enable_compilation_cache(path: str) -> None:
    """Turn on the persistent compilation cache rooted at ``path``."""
    if not path:
        return
    import jax

    p = Path(path).expanduser().resolve()
    p.mkdir(parents=True, exist_ok=True)
    # the cache singleton initializes lazily at the dir configured at FIRST
    # compile; reset it so a mid-process enable (or re-target) takes effect
    from jax.experimental.compilation_cache import compilation_cache

    compilation_cache.reset_cache()
    jax.config.update("jax_compilation_cache_dir", str(p))
    # cache every real model compile (default 1 min would skip small steps)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    log.info("persistent compilation cache at %s", p)


def add_compile_cache_flag(parser) -> None:
    parser.add_argument(
        "--compile_cache", default="",
        help="directory for JAX's persistent compilation cache (reuses "
             "compiled executables across processes; ~20-40 s saved per "
             "jitted model shape after the first run)")
