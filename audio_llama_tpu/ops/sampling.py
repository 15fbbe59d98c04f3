"""Token sampling: greedy, temperature, top-k, top-p (nucleus).

The reference delegates sampling to HF `generate(temperature, top_p,
do_sample)` (reference src/models/allm.py:326-331, src/inference.py:158-167).
Here sampling is a pure jit-able function of (logits, PRNG key) so the whole
decode loop compiles into one XLA program.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .attention import NEG_INF


def apply_temperature(logits: jnp.ndarray, temperature: float) -> jnp.ndarray:
    return logits / jnp.maximum(temperature, 1e-6)


def apply_top_k(logits: jnp.ndarray, k: int) -> jnp.ndarray:
    """Mask all but the k highest logits. k is static; k <= 0 or k >= vocab
    disables filtering (the common 'no top-k' idioms)."""
    if k <= 0 or k >= logits.shape[-1]:
        return logits
    kth = jnp.sort(logits, axis=-1)[..., -k][..., None]
    return jnp.where(logits < kth, NEG_INF, logits)


def apply_top_p(logits: jnp.ndarray, top_p: float) -> jnp.ndarray:
    """Nucleus filtering: keep the smallest prefix of the sorted distribution
    whose cumulative probability reaches top_p (HF semantics: a token stays if
    the cumulative probability *before* it is < top_p)."""
    sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
    sorted_probs = jax.nn.softmax(sorted_logits, axis=-1)
    cum = jnp.cumsum(sorted_probs, axis=-1)
    cum_before = cum - sorted_probs
    keep_sorted = cum_before < top_p  # always keeps the top token
    # Threshold logit = smallest kept logit; mask everything below it.
    masked = jnp.where(keep_sorted, sorted_logits, jnp.inf)
    threshold = jnp.min(masked, axis=-1, keepdims=True)
    return jnp.where(logits < threshold, NEG_INF, logits)


def filtered_logits(
    logits: jnp.ndarray, temperature: float = 1.0, top_p: float = 1.0,
    top_k: int = 0,
) -> jnp.ndarray:
    """Post-filter (temperature -> top-k -> top-p) logits in f32 — the log
    of the actual SAMPLING distribution. Speculative decoding's
    accept/reject must compare these distributions, not the raw ones."""
    x = apply_temperature(logits.astype(jnp.float32), temperature)
    if top_k > 0:
        x = apply_top_k(x, top_k)
    if top_p < 1.0:
        x = apply_top_p(x, top_p)
    return x


def filtered_probs(
    logits: jnp.ndarray, temperature: float = 1.0, top_p: float = 1.0,
    top_k: int = 0,
) -> jnp.ndarray:
    """Normalized post-filter sampling distribution (see filtered_logits)."""
    return jax.nn.softmax(
        filtered_logits(logits, temperature, top_p, top_k), axis=-1
    )


def sample_token(
    logits: jnp.ndarray,  # [B, V] f32
    key: jax.Array,
    temperature: float = 1.0,
    top_p: float = 1.0,
    top_k: int = 0,
    greedy: bool = False,
) -> jnp.ndarray:
    """-> [B] int32 next tokens. All filter params are static (trace-time)."""
    if greedy:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    x = filtered_logits(logits, temperature, top_p, top_k)
    return jax.random.categorical(key, x, axis=-1).astype(jnp.int32)
