"""Logit-based OoD scores as fused, batched JAX kernels.

Capability parity with the reference's per-box Python loops
(ood_utils.py:1195-1208, 1366-1443):

- MSP:     softmax(logits)[cls]                      (ood_utils.py:1394-1397)
- Energy:  T * logsumexp(logits / T)                 (ood_utils.py:1400-1412)
- ODIN:    softmax(logits / T)[cls]                  (ood_utils.py:1415-1427)
- Sigmoid: sigmoid(logit)[cls]                       (ood_utils.py:1430-1443)
- NoMethod: constant 1 (always in-distribution)      (ood_utils.py:1366-1384)

All functions take (N, nc) pre-sigmoid logits + (N,) predicted class and
return (N,) scores in one vectorized pass — XLA fuses each into a single
reduction kernel over the padded max_det box tensor.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

LOGITS_METHODS = ("NoMethod", "MSP", "Energy", "ODIN", "Sigmoid")


def _take_cls(values: jnp.ndarray, cls: jnp.ndarray) -> jnp.ndarray:
    """values[..., cls] as a one-hot reduction — per-element lane gathers
    (take_along_axis) cost tens of ns each on TPU (PERF.md); the compare+sum
    is a fused VPU pass over the small (..., nc) tensor."""
    nc = values.shape[-1]
    sel = cls[..., None].astype(jnp.int32) == jnp.arange(nc, dtype=jnp.int32)
    return jnp.sum(jnp.where(sel, values, 0.0), axis=-1)


def table_lookup(table, *idx) -> jnp.ndarray:
    """``table[idx]`` / ``table[idx0, idx1]`` for small tables (per-class or
    per-class-per-stride thresholds) as a one-hot reduction — elementwise
    gathers cost tens of ns each on TPU (PERF.md), a (..., K) compare+sum is
    one fused VPU pass. NaN entries propagate for selected indices."""
    t = jnp.asarray(table)
    if len(idx) == 2:
        k2 = t.shape[1]
        flat = idx[0].astype(jnp.int32) * k2 + idx[1].astype(jnp.int32)
    else:
        flat = idx[0].astype(jnp.int32)
    t = t.reshape(-1)
    sel = flat[..., None] == jnp.arange(t.shape[0], dtype=jnp.int32)
    return jnp.sum(jnp.where(sel, t, jnp.zeros_like(t)), axis=-1)


def msp_score(logits: jnp.ndarray, cls: jnp.ndarray) -> jnp.ndarray:
    return _take_cls(jax.nn.softmax(logits.astype(jnp.float32), axis=-1), cls)


def energy_score(logits: jnp.ndarray, cls: jnp.ndarray, temper: float = 1.0) -> jnp.ndarray:
    del cls
    return temper * jax.scipy.special.logsumexp(logits.astype(jnp.float32) / temper, axis=-1)


def odin_score(logits: jnp.ndarray, cls: jnp.ndarray, temper: float = 1000.0) -> jnp.ndarray:
    return _take_cls(jax.nn.softmax(logits.astype(jnp.float32) / temper, axis=-1), cls)


def sigmoid_score(logits: jnp.ndarray, cls: jnp.ndarray) -> jnp.ndarray:
    return _take_cls(jax.nn.sigmoid(logits.astype(jnp.float32)), cls)


def no_method_score(logits: jnp.ndarray, cls: jnp.ndarray) -> jnp.ndarray:
    return jnp.ones(logits.shape[:-1], jnp.float32)


def logits_score_fn(name: str, temper: float = 1.0):
    """Return score(logits, cls) for a logits-method name.

    ``temper`` is applied as-is; the reference's per-method CLI defaults
    (Energy T=1, ODIN T=1000 — ood_evaluation.py:70) live in the method
    layer (LogitsOODMethod via cli/factory.py), not here.
    """
    if name == "MSP":
        return msp_score
    if name == "Energy":
        return lambda l, c: energy_score(l, c, temper)
    if name == "ODIN":
        return lambda l, c: odin_score(l, c, temper)
    if name == "Sigmoid":
        return sigmoid_score
    if name == "NoMethod":
        return no_method_score
    raise ValueError(f"unknown logits method {name}")
