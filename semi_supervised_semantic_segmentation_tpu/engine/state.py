"""TrainState pytree + optimizer factory (rebuilds C16/C17 state handling).

One state type serves every SSL method:
  - supervised:       params/batch_stats only
  - mean_teacher /
    fixmatch_cutmix:  + ema_params/ema_batch_stats (the teacher)
  - cps:              params = {'net1': ..., 'net2': ...} (both trained by
                      one optimizer over the concatenated pytree)

Optimizer = torch-parity SGD: grad += wd * param; buf = momentum * buf + grad;
param -= lr * buf, with poly LR and a 10x multiplier on decoder ('head')
params — the universal recipe (SURVEY C16).  The whole schedule traces into
the jitted step (LR is a function of ``state.step``), so there is no host
schedule state to checkpoint beyond the step counter.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

from semi_supervised_semantic_segmentation_tpu.config import Config
from semi_supervised_semantic_segmentation_tpu.ops.schedules import poly_lr


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray  # () int32
    params: Any
    batch_stats: Any
    ema_params: Optional[Any]
    ema_batch_stats: Optional[Any]
    opt_state: Any
    # Base RNG stored as raw key *data* (uint32) so the state pytree is
    # plain-array serializable (Orbax/numpy); wrap with
    # jax.random.wrap_key_data before use.  Per-step keys: fold_in(key, step).
    rng: jax.Array


def head_label_tree(params: Any) -> Any:
    """Label each leaf 'head' if its path goes through a 'decoder' module,
    else 'backbone' (drives the 10x decoder LR multiplier)."""

    def label(path, _):
        for k in path:
            key = getattr(k, "key", None)
            if key is not None and str(key).startswith("decoder"):
                return "head"
        return "backbone"

    return jax.tree_util.tree_map_with_path(label, params)


def make_optimizer(cfg: Config, total_steps: int) -> optax.GradientTransformation:
    o = cfg.optim

    def lr_schedule(step):
        return poly_lr(step, o.lr, total_steps, o.poly_power)

    def sgd(mult: float) -> optax.GradientTransformation:
        parts = []
        if o.weight_decay > 0:
            parts.append(optax.add_decayed_weights(o.weight_decay))
        parts.append(optax.trace(decay=o.momentum, nesterov=o.nesterov))
        parts.append(optax.scale_by_schedule(lambda s: -lr_schedule(s) * mult))
        return optax.chain(*parts)

    base: optax.GradientTransformation = optax.multi_transform(
        {"backbone": sgd(1.0), "head": sgd(o.head_lr_mult)},
        head_label_tree,
    )
    if o.grad_clip_norm > 0:
        base = optax.chain(optax.clip_by_global_norm(o.grad_clip_norm), base)
    return base


def _find_multi_transform_state(opt_state):
    """Locate the MultiTransformState inside the (optionally clip-wrapped)
    optimizer state built by make_optimizer."""
    if hasattr(opt_state, "inner_states"):
        return opt_state
    if isinstance(opt_state, tuple):
        for s in opt_state:
            if hasattr(s, "inner_states"):
                return s
    raise ValueError("opt_state does not match make_optimizer's structure")


def get_momentum_trees(opt_state):
    """{'backbone': trace_tree, 'head': trace_tree} from an opt_state built
    by make_optimizer.  Each trace tree mirrors the params tree; leaves that
    belong to the OTHER group are optax.MaskedNode sentinels.  The optax
    ``trace`` buffer equals torch SGD's ``momentum_buffer`` exactly (both
    store buf after ``buf = momentum * buf + grad``) — the basis of the
    checkpoint-format optimizer interop (SURVEY §3.4)."""
    mts = _find_multi_transform_state(opt_state)
    out = {}
    for label, masked in mts.inner_states.items():
        trace_state = next(s for s in masked.inner_state if hasattr(s, "trace"))
        out[label] = trace_state.trace
    return out


def replace_momentum_trees(opt_state, new_traces):
    """Return a new opt_state with each group's trace tree replaced (leaves
    where the group's mask is off must stay MaskedNode)."""
    mts = _find_multi_transform_state(opt_state)
    new_inner_states = {}
    for label, masked in mts.inner_states.items():
        parts = []
        for s in masked.inner_state:
            if hasattr(s, "trace"):
                parts.append(s._replace(trace=new_traces[label]))
            else:
                parts.append(s)
        new_inner_states[label] = masked._replace(inner_state=tuple(parts))
    new_mts = mts._replace(inner_states=new_inner_states)
    if mts is opt_state:
        return new_mts
    return tuple(new_mts if s is mts else s for s in opt_state)


def set_opt_step(opt_state, step):
    """Sync the LR-schedule counter (scale_by_schedule's ``count``) to
    ``step`` so an imported optimizer continues the poly schedule where the
    checkpoint left off."""
    import numpy as np

    mts = _find_multi_transform_state(opt_state)
    new_inner_states = {}
    for label, masked in mts.inner_states.items():
        # NB: hasattr(s, "count") is True for EVERY namedtuple (tuple.count
        # method) — check the declared fields instead.  A FRESH array per
        # leaf: sharing one buffer across groups breaks donation (XLA
        # rejects donating the same buffer twice).
        parts = tuple(
            s._replace(count=jnp.asarray(np.int32(step)))
            if "count" in getattr(s, "_fields", ())
            else s
            for s in masked.inner_state
        )
        new_inner_states[label] = masked._replace(inner_state=parts)
    new_mts = mts._replace(inner_states=new_inner_states)
    if mts is opt_state:
        return new_mts
    return tuple(new_mts if s is mts else s for s in opt_state)


def current_lr(cfg: Config, total_steps: int, step: int) -> float:
    return float(poly_lr(step, cfg.optim.lr, total_steps, cfg.optim.poly_power))


def ema_update(ema_tree: Any, new_tree: Any, alpha) -> Any:
    """theta_t <- alpha * theta_t + (1 - alpha) * theta_s (C12).

    Runs inside the jitted step; with buffer donation the teacher copy is
    updated in place in HBM (~2x params resident, not 4x — SURVEY §7)."""
    return jax.tree.map(
        lambda t, s: (alpha * t + (1.0 - alpha) * s.astype(t.dtype)),
        ema_tree,
        new_tree,
    )
