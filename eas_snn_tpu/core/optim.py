"""Optimizer and LR schedule factory.

Reproduces the reference's Adam parameter-group policy (reference:
yolox/exp/event_yolox_base.py:353-416): weight decay only on conv/linear
kernels (not BN scales or biases), and a separate learning rate for the
embedding front end (``emb_lr``). Implemented with optax masks instead of
torch param groups.

Note on ``emb_lr`` fidelity: the reference trainer overwrites every param
group's lr each iteration (core/trainer.py:123-125), which silently disables
``emb_lr`` after the first step. Here ``emb_lr`` is applied persistently as a
separate schedule scale — the documented intent rather than the accidental
behavior.

LR schedules mirror yolox/utils/lr_scheduler.py: 'fixed', 'cos', 'warmcos',
'yoloxwarmcos' (quadratic warmup, cosine to min_lr_ratio, flat min during
the no-aug tail), 'yoloxsemiwarmcos' (semi-supervised phase with a slower
per-iter clock, lr_scheduler.py:63-84,155-203) and 'multistep'
(lr_scheduler.py:86-92,206-210).
"""

from __future__ import annotations

import math
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import optax

__all__ = ["build_lr_schedule", "build_optimizer"]


def build_lr_schedule(
    name: str,
    lr: float,
    iters_per_epoch: int,
    total_epochs: int,
    warmup_epochs: float = 0,
    warmup_lr_start: float = 0.0,
    no_aug_epochs: int = 0,
    min_lr_ratio: float = 0.05,
    milestones: tuple = (),
    gamma: float = 0.1,
    semi_epoch: int = 0,
    iters_per_epoch_semi: Optional[int] = None,
) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """Per-iteration LR schedule (reference lr_scheduler.py:100-210)."""
    total_iters = iters_per_epoch * total_epochs
    warmup_iters = iters_per_epoch * warmup_epochs
    no_aug_iters = iters_per_epoch * no_aug_epochs

    def sched(step):
        it = jnp.asarray(step, jnp.float32)
        if name == "fixed":
            return jnp.full_like(it, lr)
        if name == "cos":
            return lr * 0.5 * (1.0 + jnp.cos(math.pi * it / total_iters))
        if name == "warmcos":
            warm = (lr - warmup_lr_start) * it / max(warmup_iters, 1) + warmup_lr_start
            cos = lr * 0.5 * (
                1.0 + jnp.cos(math.pi * (it - warmup_iters) / (total_iters - warmup_iters))
            )
            return jnp.where(it <= warmup_iters, warm, cos)
        if name == "yoloxwarmcos":
            min_lr = lr * min_lr_ratio
            warm = (lr - warmup_lr_start) * (it / max(warmup_iters, 1)) ** 2 + warmup_lr_start
            cos = min_lr + 0.5 * (lr - min_lr) * (
                1.0
                + jnp.cos(
                    math.pi
                    * (it - warmup_iters)
                    / max(total_iters - warmup_iters - no_aug_iters, 1)
                )
            )
            out = jnp.where(it <= warmup_iters, warm, cos)
            if no_aug_iters > 0:
                out = jnp.where(it >= total_iters - no_aug_iters, min_lr, out)
            return out
        if name == "yoloxsemiwarmcos":
            # reference lr_scheduler.py:63-84,155-203: after `semi_epoch`
            # full epochs the per-iter cosine clock slows by the ratio of
            # the semi-phase epoch length to the normal one.
            ipe_semi = iters_per_epoch_semi or iters_per_epoch
            normal_iters = iters_per_epoch * semi_epoch
            semi_iters = ipe_semi * (total_epochs - semi_epoch - no_aug_epochs)
            min_lr = lr * min_lr_ratio
            denom = max(total_iters - warmup_iters - no_aug_iters, 1)
            warm = (lr - warmup_lr_start) * (
                it / max(warmup_iters, 1)
            ) ** 2 + warmup_lr_start
            cos_normal = min_lr + 0.5 * (lr - min_lr) * (
                1.0 + jnp.cos(math.pi * (it - warmup_iters) / denom)
            )
            cos_semi = min_lr + 0.5 * (lr - min_lr) * (
                1.0
                + jnp.cos(
                    math.pi
                    * (
                        normal_iters
                        - warmup_iters
                        + (it - normal_iters) * iters_per_epoch / ipe_semi
                    )
                    / denom
                )
            )
            out = jnp.where(it <= normal_iters, cos_normal, cos_semi)
            out = jnp.where(it >= normal_iters + semi_iters, min_lr, out)
            return jnp.where(it <= warmup_iters, warm, out)
        if name == "multistep":
            # milestones are given in epochs (reference exp attribute),
            # converted to iters exactly as lr_scheduler.py:86-92 does.
            ms_iters = jnp.asarray(
                [
                    int(total_iters * m / total_epochs)
                    for m in (milestones or ())
                ],
                jnp.float32,
            )
            n_hit = jnp.sum(it[..., None] >= ms_iters, axis=-1) if len(
                milestones or ()
            ) else jnp.zeros_like(it)
            return lr * gamma ** n_hit
        raise ValueError(f"unknown scheduler '{name}'")

    return sched


def _label_params(params: Dict[str, Any]) -> Dict[str, Any]:
    """Label each leaf 'emb' (embedding subtree) or 'main'.

    The embedding gets its own lr scale, mirroring pg4
    (event_yolox_base.py:404-411).
    """

    def walk(tree, in_emb):
        if isinstance(tree, dict):
            return {
                k: walk(v, in_emb or k in ("emb", "embedding")) for k, v in tree.items()
            }
        return "emb" if in_emb else "main"

    return walk(params, False)


def _decay_mask(params: Dict[str, Any]) -> Dict[str, Any]:
    """True only for conv/dense kernels outside BN — the reference's pg1.

    The embedding subtree is excluded entirely: the reference skips
    embedding modules when building pg0-2 and adds ALL embedding params as
    pg4 with no weight_decay (event_yolox_base.py:389,404-411)."""

    def walk(tree, path):
        if isinstance(tree, dict):
            return {k: walk(v, path + (k,)) for k, v in tree.items()}
        name = path[-1] if path else ""
        is_kernel = name in ("kernel",) or name.endswith("kernel") or (
            "kernel" in name
        )
        in_bn = any(p == "bn" or p.startswith("bn") for p in path)
        in_emb = any(p in ("emb", "embedding") for p in path)
        return bool(is_kernel and not in_bn and not in_emb)

    return walk(params, ())


def build_optimizer(
    params: Dict[str, Any],
    lr_schedule: Callable,
    optimizer: str = "ADAM",
    weight_decay: float = 0.0,
    momentum: float = 0.9,
    emb_lr: float = -1.0,
    base_lr: float = 1e-3,
    grad_clip: Optional[float] = None,
) -> optax.GradientTransformation:
    """Adam (default) or SGD with the reference's group policy."""
    emb_scale = (emb_lr / base_lr) if emb_lr > 0 else 1.0

    def core(scale: float) -> optax.GradientTransformation:
        chain = []
        if grad_clip is not None:
            chain.append(optax.clip_by_global_norm(grad_clip))
        # torch couples weight decay INTO the gradient before the moment
        # estimates (torch.optim.Adam/SGD semantics, which the reference's
        # get_optimizer relies on) — so add_decayed_weights must run BEFORE
        # scale_by_adam/trace, not after (which would be decoupled AdamW).
        # Verified end-to-end by the Adam train-trajectory cross-check in
        # tests/test_pipeline_parity.py::TestFullCompositionParity.
        if weight_decay > 0:
            chain.append(
                optax.add_decayed_weights(weight_decay, mask=_decay_mask(params))
            )
        if optimizer.upper() == "ADAM":
            chain.append(optax.scale_by_adam())
        else:
            chain.append(optax.trace(decay=momentum, nesterov=True))
        chain.append(optax.scale_by_learning_rate(lambda s: lr_schedule(s) * scale))
        return optax.chain(*chain)

    labels = _label_params(params)
    return optax.multi_transform(
        {"main": core(1.0), "emb": core(emb_scale)}, labels
    )
