"""Persistent compilation cache flag (utils/compile_cache.py)."""

import jax
import jax.numpy as jnp


def test_compile_cache_writes_entries(tmp_path):
    from ood_in_object_detection_tpu.utils.compile_cache import (
        enable_compilation_cache,
    )

    cc = tmp_path / "cc"
    enable_compilation_cache(str(cc))
    try:
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

        @jax.jit
        def f(x):
            return (x * 2.5 + 1.0).sum()

        f(jnp.arange(4096.0)).block_until_ready()
        assert list(cc.iterdir()), "no cache entry was persisted"
    finally:
        jax.config.update("jax_compilation_cache_dir", None)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def test_compile_cache_disabled_by_default():
    from ood_in_object_detection_tpu.cli.predict import build_parser

    args = build_parser().parse_args(["--source", "x"])
    assert args.compile_cache == ""
