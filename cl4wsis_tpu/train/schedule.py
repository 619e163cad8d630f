"""LR schedules and the grouped optimizer.

Re-design of reference ``utils/scheduler.py`` (poly / warmup-poly / step /
none, stepped per iteration) and ``Trainer.get_optimizer``
(``train.py:144-185``): param groups with distinct LR multipliers —
body at lr, decoders/heads at lr*lr_head, pseudo-labeler+peak-generator at
lr_pseudo — expressed here as a single optax chain whose updates are scaled
per-parameter by a multiplier tree (0 freezes a group).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import optax


def poly_schedule(base_lr: float, max_iters: int, power: float = 0.9):
    def fn(step):
        frac = jnp.clip(step / max_iters, 0.0, 1.0)
        return base_lr * (1.0 - frac) ** power
    return fn


def warmup_poly_schedule(base_lr: float, max_iters: int, start_decay: int,
                         power: float = 0.9):
    """Constant until `start_decay`, then poly with t counted from 0
    (``utils/scheduler.py:39-51``: the poly term uses the global step)."""
    def fn(step):
        frac = jnp.clip(step / max_iters, 0.0, 1.0)
        return jnp.where(step >= start_decay,
                         base_lr * (1.0 - frac) ** power, base_lr)
    return fn


def step_schedule(base_lr: float, decay_step: int, decay_factor: float):
    def fn(step):
        return base_lr * decay_factor ** (step // decay_step)
    return fn


def make_schedule(policy: str, base_lr: float, max_iters: int,
                  start_decay: int = 0, power: float = 0.9,
                  decay_step: int = 5000, decay_factor: float = 0.1):
    if policy == "poly":
        return poly_schedule(base_lr, max_iters, power)
    if policy == "warmup":
        return warmup_poly_schedule(base_lr, max_iters, start_decay, power)
    if policy == "step":
        return step_schedule(base_lr, decay_step, decay_factor)
    if policy == "none":
        return lambda step: jnp.asarray(base_lr)
    raise NotImplementedError(policy)


def _scale_by_tree(multipliers):
    """Scale each update leaf by the matching multiplier leaf."""
    def init_fn(params):
        del params
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        del params
        return jax.tree_util.tree_map(lambda u, m: u * m, updates, multipliers), state

    return optax.GradientTransformation(init_fn, update_fn)


def param_group_multipliers(params: Any,
                            group_fn: Callable[[str], str],
                            group_scale: Dict[str, float]) -> Any:
    """Build a per-leaf multiplier tree.

    `group_fn` maps a '/'-joined param path to a group name; `group_scale`
    maps group name to LR multiplier (0.0 = frozen).
    """
    flat, treedef = jax.tree_util.tree_flatten_with_path(params)

    def leaf_scale(path):
        name = "/".join(str(getattr(k, "key", k)) for k in path)
        return group_scale[group_fn(name)]

    return jax.tree_util.tree_unflatten(treedef, [leaf_scale(p) for p, _ in flat])


def default_group_fn(path: str) -> str:
    """Map a param path to its LR group, mirroring ``train.py:144-185``."""
    if path.startswith("body/"):
        return "body"
    if path.startswith(("seg_head/", "cls/")):
        return "seg"
    if path.startswith(("instance_decoder/", "instance_head/")):
        return "instance"
    if path.startswith(("pseudolabeler/", "peakgenerator/")):
        return "pseudo"
    return "seg"


def make_optimizer(params: Any,
                   optim: str,
                   lr_schedule: Callable,
                   weight_decay: float = 0.0,
                   group_scale: Optional[Dict[str, float]] = None,
                   group_fn: Callable[[str], str] = default_group_fn,
                   momentum: float = 0.9) -> optax.GradientTransformation:
    """SGD(momentum .9, nesterov) or Adam with per-group LR multipliers.

    Weight decay follows the torch semantics of each optimizer: SGD adds
    wd*param to the gradient; Adam(weight_decay) is L2-in-gradient too
    (reference uses torch.optim.Adam, not AdamW).
    """
    txs = []
    if weight_decay > 0:
        txs.append(optax.add_decayed_weights(weight_decay))
    if optim == "sgd":
        txs.append(optax.trace(decay=momentum, nesterov=True))
    elif optim == "adam":
        txs.append(optax.scale_by_adam())
    else:
        raise NotImplementedError(optim)
    if group_scale:
        txs.append(_scale_by_tree(param_group_multipliers(params, group_fn, group_scale)))
    txs.append(optax.scale_by_schedule(lambda s: -lr_schedule(s)))
    return optax.chain(*txs)
