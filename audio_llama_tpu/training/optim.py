"""Optimizer + LR schedule (optax).

Reference recipe (src/train.py:243-254): AdamW(weight_decay) over trainable
params only, HF get_cosine_schedule_with_warmup, grad clipping by global norm,
fp16 GradScaler AMP. On TPU we train in bf16 compute with f32 masters — no
loss scaler is needed (bf16 has f32's exponent range), so the GradScaler has
no analog here by design.
"""

from __future__ import annotations

import optax


def cosine_schedule_with_warmup(
    peak_lr: float, warmup_steps: int, total_steps: int, end_lr: float = 0.0
) -> optax.Schedule:
    """Matches HF get_cosine_schedule_with_warmup (linear 0->peak over warmup,
    then half-cosine peak->0 over the remainder)."""
    warmup_steps = max(warmup_steps, 1)
    decay_steps = max(total_steps - warmup_steps, 1)
    return optax.join_schedules(
        [
            optax.linear_schedule(0.0, peak_lr, warmup_steps),
            optax.cosine_decay_schedule(peak_lr, decay_steps, alpha=end_lr / peak_lr if peak_lr else 0.0),
        ],
        boundaries=[warmup_steps],
    )


def make_optimizer(
    learning_rate,
    weight_decay: float = 0.01,
    max_grad_norm: float = 1.0,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
) -> optax.GradientTransformation:
    """clip-by-global-norm -> AdamW. learning_rate may be a float or schedule."""
    tx = [
        optax.clip_by_global_norm(max_grad_norm),
        optax.adamw(
            learning_rate, b1=b1, b2=b2, eps=eps, weight_decay=weight_decay
        ),
    ]
    return optax.chain(*tx)
