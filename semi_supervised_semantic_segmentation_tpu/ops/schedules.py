"""LR + consistency-weight schedules (rebuilds C16 + C13 ramp-up).

Poly LR ``base * (1 - iter/max_iter)^power`` with SGD momentum is the
universal recipe of this genre (SURVEY.md §2 C16); the ramp-up is the
Mean-Teacher sigmoid ``exp(-5 (1 - t)^2)`` (Tarvainen & Valpola) or linear.
Both are pure functions of the step counter so they trace into the jitted
train step — no host-side schedule state.
"""

from __future__ import annotations

import jax.numpy as jnp


def poly_lr(step, base_lr: float, total_steps: int, power: float = 0.9):
    """Polynomial decay; never negative even if step overruns total_steps."""
    frac = jnp.clip(step / max(total_steps, 1), 0.0, 1.0)
    return base_lr * (1.0 - frac) ** power


def sigmoid_rampup(step, rampup_steps: int):
    """exp(-5(1-t)^2) ramp from 0 -> 1 over rampup_steps; 1 afterwards."""
    if rampup_steps <= 0:
        return jnp.asarray(1.0, dtype=jnp.float32)
    t = jnp.clip(step / rampup_steps, 0.0, 1.0)
    return jnp.exp(-5.0 * (1.0 - t) ** 2).astype(jnp.float32)


def linear_rampup(step, rampup_steps: int):
    if rampup_steps <= 0:
        return jnp.asarray(1.0, dtype=jnp.float32)
    return jnp.clip(step / rampup_steps, 0.0, 1.0).astype(jnp.float32)


def consistency_weight(step, base_weight: float, rampup_steps: int, kind: str = "sigmoid"):
    ramp = sigmoid_rampup(step, rampup_steps) if kind == "sigmoid" else linear_rampup(step, rampup_steps)
    return base_weight * ramp
