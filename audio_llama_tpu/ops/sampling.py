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


def filtered_logits_per_row(
    logits: jnp.ndarray,  # [B, V]
    temperature: jnp.ndarray,  # [B] f32
    top_p: jnp.ndarray,  # [B] f32
    top_k: jnp.ndarray,  # [B] int32 (<=0 disables)
) -> jnp.ndarray:
    """Per-ROW sampling filters as traced array arguments: one compiled
    program serves every (temperature, top_p, top_k) mix across the batch —
    the serving pool's per-request sampling needs this (engine-level static
    params would retrace per combination). Row semantics match the static
    filtered_logits exactly (same filter order, same HF top-p rule), so a
    batch with uniform params produces identical logits."""
    V = logits.shape[-1]
    x = logits.astype(jnp.float32) / jnp.maximum(temperature, 1e-6)[:, None]

    # per-row top-k: kth-highest logit as the threshold (traced k)
    sorted_desc = jnp.sort(x, axis=-1)[..., ::-1]
    k = jnp.clip(top_k, 1, V)
    kth = jnp.take_along_axis(sorted_desc, (k - 1)[:, None], axis=-1)
    k_on = (top_k > 0) & (top_k < V)
    x = jnp.where(k_on[:, None] & (x < kth), NEG_INF, x)

    # per-row top-p (broadcasts; top_p >= 1 keeps everything)
    sorted_logits = jnp.sort(x, axis=-1)[..., ::-1]
    sorted_probs = jax.nn.softmax(sorted_logits, axis=-1)
    cum = jnp.cumsum(sorted_probs, axis=-1)
    keep_sorted = (cum - sorted_probs) < top_p[:, None]
    masked = jnp.where(keep_sorted, sorted_logits, jnp.inf)
    threshold = jnp.min(masked, axis=-1, keepdims=True)
    return jnp.where(x < threshold, NEG_INF, x)


def sample_token_per_row(
    logits: jnp.ndarray,  # [B, V] f32
    key: jax.Array,
    temperature: jnp.ndarray,  # [B] f32
    top_p: jnp.ndarray,  # [B] f32
    top_k: jnp.ndarray,  # [B] int32
    greedy: jnp.ndarray,  # [B] bool
) -> jnp.ndarray:
    """-> [B] int32; per-row params as traced arrays (see
    filtered_logits_per_row). Greedy rows are EXACT argmax — mixing greedy
    and sampled requests in one batch stays token-exact for the greedy
    rows."""
    arg = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    x = filtered_logits_per_row(logits, temperature, top_p, top_k)
    samp = jax.random.categorical(key, x, axis=-1).astype(jnp.int32)
    return jnp.where(greedy, arg, samp)
