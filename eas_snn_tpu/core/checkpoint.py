"""Orbax checkpointing: save/restore {params, batch_stats, opt_state,
ema_params, step, best_ap}.

Replaces the reference's torch.save checkpoint files
(reference: yolox/core/trainer.py:388-419, utils/checkpoint.py:11-43) with
async-capable Orbax; 'latest'/'best' naming contract is preserved.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

__all__ = ["CheckpointManager", "load_partial_params"]


class CheckpointManager:
    """Thin wrapper over ocp.CheckpointManager with the reference's
    latest/best semantics."""

    def __init__(self, directory: str, max_to_keep: int = 3):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True
            ),
        )

    def save(self, step: int, state, best_ap: float = 0.0, is_best: bool = False):
        payload = {
            "params": state.params,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
            "step": np.asarray(state.step),
            "best_ap": np.asarray(best_ap, np.float32),
        }
        if state.ema_params is not None:
            payload["ema_params"] = state.ema_params
        self._mgr.save(step, args=ocp.args.StandardSave(payload))
        self._mgr.wait_until_finished()
        if is_best:
            # separate 'best' tree, mirroring save_checkpoint's best copy
            ckptr = ocp.StandardCheckpointer()
            ckptr.save(os.path.join(self.best_dir, "state"), payload,
                       force=True)
            ckptr.wait_until_finished()

    @property
    def best_dir(self) -> str:
        return os.path.join(self.directory, "best")

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, state, step: Optional[int] = None):
        step = step if step is not None else self._mgr.latest_step()
        if step is None:
            return state, 0.0
        template = {
            "params": state.params,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
            "step": np.asarray(state.step),
            "best_ap": np.asarray(0.0, np.float32),
        }
        if state.ema_params is not None:
            template["ema_params"] = state.ema_params
        restored = self._mgr.restore(
            step, args=ocp.args.StandardRestore(template)
        )
        new_state = state.replace(
            params=restored["params"],
            batch_stats=restored["batch_stats"],
            opt_state=restored["opt_state"],
            step=jax.numpy.asarray(restored["step"]),
            ema_params=restored.get("ema_params", state.ema_params),
        )
        return new_state, float(restored["best_ap"])


def load_partial_params(params: Dict[str, Any], loaded: Dict[str, Any]):
    """Shape-checked partial load for fine-tuning
    (reference utils/checkpoint.py:11-33): keep the current leaf whenever the
    checkpoint's shape mismatches or the key is absent."""

    def merge(cur, new):
        if isinstance(cur, dict):
            out = {}
            for k, v in cur.items():
                out[k] = merge(v, new.get(k)) if isinstance(new, dict) else v
            return out
        if new is None:
            return cur
        cur_arr = np.asarray(cur)
        new_arr = np.asarray(new)
        return new if cur_arr.shape == new_arr.shape else cur

    return merge(params, loaded)
