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
    return jnp.take_along_axis(values, cls[..., None].astype(jnp.int32), axis=-1)[..., 0]


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

    ``temper`` defaults per the reference CLI: Energy T=1 and ODIN T=1000
    (ood_evaluation.py:70 and method factory ood_evaluation.py:179-289).
    """
    if name == "MSP":
        return msp_score
    if name == "Energy":
        return lambda l, c: energy_score(l, c, temper)
    if name == "ODIN":
        return lambda l, c: odin_score(l, c, temper if temper != 1.0 else 1000.0)
    if name == "Sigmoid":
        return sigmoid_score
    if name == "NoMethod":
        return no_method_score
    raise ValueError(f"unknown logits method {name}")
