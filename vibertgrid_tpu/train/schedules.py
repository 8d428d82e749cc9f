"""Per-iteration schedule arrays.

Same semantics as the reference's array-based schedulers
(``/root/reference/pipeline/train_val_utils.py:83-148``): cosine decay with
optional linear warmup, and a step schedule with per-epoch boundaries. The
reference writes these arrays into optimizer param groups every iteration
(``:215-246``); here they become optax schedule functions closed over the
array, evaluated inside the jitted step.
"""

from __future__ import annotations

import math

import numpy as np
import jax.numpy as jnp


def cosine_scheduler(
    base_value: float,
    final_value: float,
    epoches: int,
    niter_per_ep: int,
    warmup_epoches: int = 0,
    start_warmup_value: float = 0.0,
    warmup_steps: int = -1,
) -> np.ndarray:
    """Cosine array (ref :83-113). Length ``epoches * (niter_per_ep + 1)``."""
    warmup_schedule = np.array([])
    warmup_iters = warmup_epoches * (niter_per_ep + 1)
    if warmup_steps > 0:
        warmup_iters = warmup_steps
    if warmup_epoches > 0:
        warmup_schedule = np.linspace(start_warmup_value, base_value, warmup_iters)

    iters = np.arange(epoches * (niter_per_ep + 1) - warmup_iters)
    schedule = np.array(
        [
            final_value
            + 0.5
            * (base_value - final_value)
            * (1 + math.cos(math.pi * i / len(iters)))
            for i in iters
        ]
    )
    return np.concatenate((warmup_schedule, schedule))


def step_scheduler(
    base_value: float,
    steps: list,
    gamma: float,
    num_epoches: int,
    niter_per_ep: int,
    warmup_epoches: int = 0,
    start_warmup_value: float = 0.0,
    warmup_steps: int = -1,
) -> np.ndarray:
    """Piecewise-constant array (ref :116-148)."""
    warmup_schedule = np.array([])
    warmup_iters = warmup_epoches * (niter_per_ep + 1)
    if warmup_steps > 0:
        warmup_iters = warmup_steps
    if warmup_epoches > 0:
        warmup_schedule = np.linspace(start_warmup_value, base_value, warmup_iters)

    total = num_epoches * (niter_per_ep + 1)
    change_steps = [step * niter_per_ep for step in steps]
    change_steps.append(total)
    schedule = [warmup_schedule]
    curr_value = base_value
    start_step = warmup_iters
    for change_step in change_steps:
        # Boundaries past the end of a short run contribute nothing
        # (the reference assumes steps < num_epoches; clamp instead).
        end_step = min(max(change_step, start_step), total)
        schedule.append(curr_value * np.ones(end_step - start_step))
        curr_value *= gamma
        start_step = end_step
    out = np.concatenate(schedule)
    assert len(out) == total, (len(out), total)
    return out


def array_schedule(arr: np.ndarray):
    """Wrap a per-iteration array as an optax schedule fn; steps past the end
    hold the last value (ref :220-223)."""
    jarr = jnp.asarray(arr, jnp.float32)

    def schedule(step):
        idx = jnp.clip(step, 0, jarr.shape[0] - 1)
        return jarr[idx]

    return schedule
