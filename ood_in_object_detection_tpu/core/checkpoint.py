"""Orbax checkpointing with the reference's cache-key contract.

The reference stores torch ``.pt`` checkpoints whose ``train_args['name']``
is load-bearing for the OoD cache paths (ood_evaluation.py:296-300). Here a
checkpoint is an orbax directory holding params / batch_stats / EMA /
opt_state plus a JSON metadata blob carrying ``train_args`` (including
``name``), model name and epoch.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Dict, Optional

import jax
import numpy as np


def _to_numpy_tree(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


def save_checkpoint(path: str, state, train_args: Dict[str, Any],
                    model_name: str, epoch: int = 0) -> None:
    """Save inference weights + (when present) the full optimizer state so
    training can resume mid-run (reference trainer.py save_model stores
    model+EMA+optimizer+epoch in one .pt)."""
    import orbax.checkpoint as ocp

    p = Path(path).resolve()
    p.mkdir(parents=True, exist_ok=True)
    ckptr = ocp.StandardCheckpointer()
    payload = {
        "params": _to_numpy_tree(state.params),
        "batch_stats": _to_numpy_tree(state.batch_stats),
        "ema_params": _to_numpy_tree(state.ema_params),
    }
    if getattr(state, "opt_state", None) is not None:
        payload["opt_state"] = _to_numpy_tree(state.opt_state)
        payload["step"] = np.asarray(state.step)
    ckptr.save(p / "state", payload, force=True)
    ckptr.wait_until_finished()
    (p / "meta.json").write_text(json.dumps({
        "train_args": train_args,
        "model_name": model_name,
        "epoch": epoch,
    }))


def load_checkpoint(path: str, use_ema: bool = True):
    """-> (variables dict for model.apply, meta dict)."""
    import orbax.checkpoint as ocp

    p = Path(path).resolve()
    meta = json.loads((p / "meta.json").read_text())
    ckptr = ocp.StandardCheckpointer()
    payload = ckptr.restore(p / "state")
    params = payload["ema_params" if use_ema else "params"]
    variables = {"params": params, "batch_stats": payload["batch_stats"]}
    return variables, meta


def restore_train_state(path: str, model, cfg, sample_images):
    """Restore a FULL TrainState (params + batch_stats + EMA + optimizer
    momentum + step) for mid-training resume (reference engine/trainer.py
    resume_training: model, EMA, optimizer, start_epoch).

    -> (TrainState, meta dict); resume from epoch meta['epoch'] + 1.
    """
    import jax as _jax
    import orbax.checkpoint as ocp

    from ..train.trainer import TrainState, init_state

    p = Path(path).resolve()
    meta = json.loads((p / "meta.json").read_text())
    target = init_state(model, cfg, _jax.random.PRNGKey(0), sample_images)
    abstract = {
        "params": target.params,
        "batch_stats": target.batch_stats,
        "ema_params": target.ema_params,
        "opt_state": target.opt_state,
        "step": target.step,
    }
    ckptr = ocp.StandardCheckpointer()
    payload = ckptr.restore(p / "state", abstract)
    state = TrainState(
        params=payload["params"],
        batch_stats=payload["batch_stats"],
        opt_state=payload["opt_state"],
        ema_params=payload["ema_params"],
        step=payload["step"],
    )
    return state, meta


def checkpoint_name(path: str) -> str:
    """The ``train_args.name`` used in activation/threshold cache keys
    (reference ood_evaluation.py:296-300)."""
    meta = json.loads((Path(path) / "meta.json").read_text())
    return meta["train_args"].get("name", Path(path).stem)
