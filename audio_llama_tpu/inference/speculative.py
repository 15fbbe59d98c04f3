"""Speculative decoding (draft-and-verify), fully jit-compiled.

Single-token decode at 3B dims is weight-stream-bound (~5 ms/step at B=1,
BASELINE.md): the chip reads 3 GB of weights to emit ONE token. Speculative
decoding spends that same read on gamma+1 tokens: a small DRAFT model
proposes gamma tokens autoregressively, the TARGET model scores the whole
proposal in one cached forward (T=gamma+1 positions — the big weight read
amortizes), and the longest agreeing prefix is accepted. Greedy mode is
LOSSLESS: the output is bit-identical to plain greedy decoding of the
target (tests/test_speculative.py proves it against inference.generate).

The pure-function design makes the classic algorithm a lax.while_loop:
both KV caches ride the carry, rejection is just rewinding the cache
`length` scalar (stale slots are never attendable and get overwritten),
and the whole prefill+draft+verify loop is ONE compiled XLA program.

Scope: batch 1 (per-row acceptance lengths diverge, and the cache timeline
offset is a scalar — the latency use case spec decode exists for), text or
audio prompts. Two sampling modes:
  - greedy=True: LOSSLESS — bit-identical to plain greedy target decoding.
  - greedy=False: STOCHASTIC speculative sampling (Leviathan et al. 2023,
    arXiv:2211.17192): draft samples x_i ~ q_i, the target accepts with
    probability min(1, p_i(x_i)/q_i(x_i)) and on rejection resamples from
    the normalized residual max(p_i - q_i, 0) — the output is EXACTLY
    target-distributed (p, q are the post-temperature/top-p/top-k SAMPLING
    distributions, ops/sampling.filtered_probs). The all-accept bonus token
    falls out of the same residual formula with q := 0.
    tests/test_speculative.py checks the marginal empirically and the
    all-accept invariant when draft == target.

Throughput honesty: with RANDOM weights draft/target agreement is chance,
so no speedup can be demonstrated in this environment — the mechanism +
losslessness are what's testable here; measure acceptance on real
checkpoints before serving with it. Reference analog: none (reference
delegates to HF generate, src/models/allm.py:326-331).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax

from ..config import AudioLLMConfig
from ..models import llama as llama_mod
from ..ops import sampling
from . import generate as gen


class SpecResult(NamedTuple):
    tokens: jnp.ndarray  # [1, max_new_tokens] int32, pad_id after EOS
    num_generated: jnp.ndarray  # [1] int32
    num_target_calls: jnp.ndarray  # [] int32 — verify forwards spent
    num_drafted: jnp.ndarray  # [] int32 — draft tokens proposed
    num_accepted: jnp.ndarray  # [] int32 — draft tokens accepted


def _greedy(logits):
    return jnp.argmax(logits, axis=-1).astype(jnp.int32)


@functools.partial(
    jax.jit,
    static_argnames=(
        "cfg", "draft_cfg", "max_new_tokens", "gamma", "eos_id", "pad_id",
        "audio_start_id", "audio_end_id", "compute_dtype", "has_audio",
        "greedy", "temperature", "top_p", "top_k", "kv_quant",
    ),
)
def generate_speculative(
    frozen: dict,  # target {'llama', 'whisper'}
    draft_params: dict,  # draft llama param tree
    trainable: Optional[dict],
    cfg: AudioLLMConfig,
    draft_cfg,  # LlamaConfig of the draft (same tokenizer/vocab!)
    input_ids: jnp.ndarray,  # [1, T]
    attention_mask: jnp.ndarray,  # [1, T]
    audio_features: Optional[jnp.ndarray],
    key: Optional[jax.Array] = None,  # required when greedy=False
    *,
    max_new_tokens: int = 64,
    gamma: int = 4,
    eos_id: int = 2,
    pad_id: int = 0,
    audio_start_id: int = 0,
    audio_end_id: int = 0,
    compute_dtype=jnp.bfloat16,
    has_audio: bool = True,
    greedy: bool = True,
    temperature: float = 1.0,
    top_p: float = 1.0,
    top_k: int = 0,
    kv_quant=False,
) -> SpecResult:
    if input_ids.shape[0] != 1:
        raise ValueError("speculative decoding v1 is batch-1 (latency path)")
    if cfg.llama.vocab_size != draft_cfg.vocab_size:
        raise ValueError("draft and target must share the vocabulary")
    if not greedy and key is None:
        raise ValueError("stochastic speculative sampling needs a PRNG key")
    if key is None:
        key = jax.random.PRNGKey(0)  # greedy path never consumes it
    k_first, k_loop = jax.random.split(key)

    def _probs(logits):
        return sampling.filtered_probs(
            logits, temperature=temperature, top_p=top_p, top_k=top_k
        )

    if not has_audio:
        audio_features = None
    embeds, mask = gen.build_prefix(
        frozen, trainable, cfg, input_ids, attention_mask, audio_features,
        audio_start_id, audio_end_id, compute_dtype,
    )
    B, P, _ = embeds.shape
    total = P + max_new_tokens + gamma + 1
    full_mask = jnp.concatenate(
        [mask.astype(jnp.int32),
         jnp.ones((B, max_new_tokens + gamma + 1), jnp.int32)], axis=1
    )

    # --- target prefill (multimodal prefix) ---
    t_cache = llama_mod.KVCache.zeros(
        cfg.llama, B, total, dtype=compute_dtype, quantized=kv_quant
    )
    _, t_cache, hidden = llama_mod.llama_forward(
        frozen["llama"], cfg.llama,
        inputs_embeds=embeds, attention_mask=full_mask,
        kv_cache=t_cache, compute_dtype=compute_dtype,
        assume_fresh_cache=True, return_hidden=True, unembed_logits=False,
        lora=None if trainable is None else _lora(trainable, cfg),
    )
    real_len = jnp.sum(mask, axis=1).astype(jnp.int32)  # [1]
    last_hidden = jnp.take_along_axis(
        hidden, (real_len - 1)[:, None, None], axis=1
    )
    first_logits = llama_mod.unembed(
        frozen["llama"], cfg.llama, last_hidden, compute_dtype
    )[:, 0]
    if greedy:
        first_tok = _greedy(first_logits)  # [1]
    else:
        first_tok = sampling.sample_token(
            first_logits, k_first, temperature=temperature, top_p=top_p,
            top_k=top_k,
        )

    # --- draft prefill: TEXT prompt only (the draft is a text LM; it sees
    # the token prompt — audio conditioning lives in the target, which is
    # the only model whose output matters for correctness) ---
    d_cache = llama_mod.KVCache.zeros(
        draft_cfg, B, total, dtype=compute_dtype, quantized=kv_quant
    )
    d_mask = jnp.concatenate(
        [attention_mask.astype(jnp.int32),
         jnp.ones((B, max_new_tokens + gamma + 1), jnp.int32)], axis=1
    )
    d_mask = jnp.pad(
        d_mask, ((0, 0), (0, d_cache.k.shape[3] - d_mask.shape[1]))
    )
    _, d_cache = llama_mod.llama_forward(
        draft_params, draft_cfg,
        input_ids=input_ids, attention_mask=d_mask,
        kv_cache=d_cache, compute_dtype=compute_dtype,
    )
    d_real_len = jnp.sum(attention_mask, axis=1).astype(jnp.int32)

    tokens0 = jnp.full((1, max_new_tokens), pad_id, jnp.int32)
    tokens0 = tokens0.at[0, 0].set(first_tok[0])

    # carry: (t_cache, d_cache, tokens, n_out, last_tok, done, stats)
    def cond(carry):
        _, _, _, n_out, _, done, _ = carry
        return jnp.logical_and(n_out < max_new_tokens, ~done)

    def body(carry):
        t_cache, d_cache, tokens, n_out, last_tok, done, stats = carry
        n_calls, n_draft, n_acc = stats
        k_round = jax.random.fold_in(k_loop, n_calls)

        # ----- draft proposes gamma tokens (its cache tracks the target's
        # accepted prefix; rewind happens by resetting length below) -----
        def d_step(c, i):
            d_cache, tok = c
            # logical position of the token being fed: last_tok is output
            # token n_out-1, so its position is d_real_len + n_out - 1
            pos = (d_real_len + n_out - 1 + i)[:, None]
            logits, d_cache = llama_mod.llama_forward(
                draft_params, draft_cfg, input_ids=tok[:, None],
                attention_mask=d_mask, positions=pos,
                kv_cache=d_cache, compute_dtype=compute_dtype,
            )
            if greedy:
                nxt = _greedy(logits[:, 0])
                return (d_cache, nxt), nxt
            q = _probs(logits[:, 0])  # [1, V] — the draft's SAMPLING dist
            nxt = sampling.sample_token(
                logits[:, 0], jax.random.fold_in(k_round, i),
                temperature=temperature, top_p=top_p, top_k=top_k,
            )
            return (d_cache, nxt), (nxt, q[0])

        (d_cache, last_drafted), d_ys = lax.scan(
            d_step, (d_cache, last_tok), jnp.arange(gamma)
        )
        if greedy:
            drafted, qs = d_ys, None  # [gamma, 1]
        else:
            drafted, qs = d_ys  # [gamma, 1], [gamma, V]
        drafted = drafted[:, 0]  # [gamma]
        # One extra draft forward feeding the FINAL drafted token: the scan
        # writes K/V only for its inputs, so without this the all-accept
        # case leaves a hole at the last drafted token's cache slot and the
        # next round's draft attends garbage (output discarded — only the
        # K/V write matters).
        (d_cache, _), _ = d_step((d_cache, last_drafted), gamma)

        # ----- target verifies: score [last_tok, drafted...] in ONE pass ---
        block = jnp.concatenate([last_tok, drafted])[None, :]  # [1, gamma+1]
        pos = (real_len + n_out - 1)[:, None] + jnp.arange(gamma + 1)[None, :]
        t_logits, t_cache_new = llama_mod.llama_forward(
            frozen["llama"], cfg.llama, input_ids=block,
            attention_mask=full_mask, positions=pos,
            kv_cache=t_cache, compute_dtype=compute_dtype,
            lora=None if trainable is None else _lora(trainable, cfg),
        )
        if greedy:
            t_next = _greedy(t_logits[0])  # [gamma+1] token after each pos
            # accepted[i] = drafted[i] agreed with the target at position i
            agree = drafted == t_next[:gamma]
        else:
            # Leviathan accept/reject on the post-filter distributions:
            # accept x_i ~ q_i with prob min(1, p_i(x_i)/q_i(x_i))
            # <=> u * q_i(x_i) < p_i(x_i), u ~ U(0,1)
            t_probs = _probs(t_logits[0])  # [gamma+1, V]
            idx = jnp.arange(gamma)
            p_x = t_probs[idx, drafted]
            q_x = qs[idx, drafted]
            u = jax.random.uniform(
                jax.random.fold_in(k_round, gamma), (gamma,)
            )
            agree = u * jnp.maximum(q_x, 1e-30) < p_x
        n_match = jnp.argmin(
            jnp.concatenate([agree.astype(jnp.int32), jnp.zeros((1,), jnp.int32)])
        )  # first disagreement (gamma if all agree)
        if greedy:
            fix = t_next[n_match]  # target's correction/bonus token
        else:
            # rejection at n_match < gamma: resample from the normalized
            # residual max(p - q, 0); all-accept (n_match == gamma): the
            # bonus token is the same formula with q := 0, i.e. p itself
            p_r = t_probs[n_match]
            q_r = jnp.where(
                n_match < gamma,
                qs[jnp.minimum(n_match, gamma - 1)],
                jnp.zeros_like(p_r),
            )
            r = jnp.maximum(p_r - q_r, 0.0)
            rs = jnp.sum(r)
            # rs == 0 only if p <= q everywhere => p == q => rejection had
            # probability 0; numerically fall back to p
            r = jnp.where(rs > 0, r / rs, p_r)
            fix = jax.random.categorical(
                jax.random.fold_in(k_round, gamma + 1),
                jnp.where(r > 0, jnp.log(jnp.maximum(r, 1e-30)), -jnp.inf),
            ).astype(jnp.int32)
        # emitted this round: drafted[:n_match] ++ correction/bonus
        n_emit = n_match + 1
        emit = jnp.where(
            jnp.arange(gamma + 1) < n_match,
            jnp.concatenate([drafted, jnp.zeros((1,), jnp.int32)]),
            jnp.broadcast_to(fix, (gamma + 1,)),
        )  # positions >= n_match all hold the fix token; only
        # index n_match of those is actually written (see write mask)

        # write emit[0..n_emit) into tokens at n_out: gather formulation
        # (a scatter with clipped duplicate indices has undefined winner)
        j = jnp.arange(max_new_tokens)
        rel = j - n_out
        val = emit[jnp.clip(rel, 0, gamma)]
        take = (rel >= 0) & (rel < n_emit)
        tokens = jnp.where(take[None, :], val[None, :], tokens)

        # EOS latch: stop if any token emitted IN RANGE is EOS
        emitted_eos = jnp.any((val == eos_id) & take)
        n_out_new = jnp.minimum(n_out + n_emit, max_new_tokens)

        # ----- cache rewinds -----
        # target cache: keep exactly prefix + n_out_new appended tokens
        t_cache_new = t_cache_new._replace(
            length=t_cache.length + n_emit  # only the accepted+bonus count
        )
        # The verify pass WROTE gamma+1 K/V rows; rows beyond length are
        # unattendable (slot-causal masks) and get overwritten next round.
        # draft cache invariant: at body entry it holds prompt + n_out - 1
        # appended rows; the scan + the KV-materializing extra step appended
        # gamma + 1; the next round needs prompt + n_out_new - 1 (= + n_emit)
        # — rewind the difference.
        d_cache = d_cache._replace(length=d_cache.length - (gamma + 1) + n_emit)

        last_tok_new = emit[jnp.minimum(n_emit - 1, gamma)][None]
        stats = (n_calls + 1, n_draft + gamma, n_acc + n_match)
        return (
            t_cache_new, d_cache, tokens, n_out_new, last_tok_new,
            done | emitted_eos, stats,
        )

    # draft cache length bookkeeping baseline: after its prefill it holds
    # the prompt; the loop invariant keeps it at prompt + n_out - ... (the
    # rewind arithmetic in body maintains it relative to its own writes).
    carry = (
        t_cache, d_cache, tokens0, jnp.asarray(1, jnp.int32), first_tok,
        jnp.asarray(False), (jnp.asarray(0, jnp.int32),) * 3,
    )
    t_cache, d_cache, tokens, n_out, _, done, stats = lax.while_loop(
        cond, body, carry
    )
    hit_eos = tokens[0] == eos_id
    any_eos = jnp.any(hit_eos)
    first_eos = jnp.argmax(hit_eos)
    num = jnp.where(any_eos, first_eos + 1, n_out).astype(jnp.int32)
    # pad after EOS for cosmetic parity with generate()
    keep = jnp.arange(max_new_tokens) < num
    tokens = jnp.where(keep[None, :], tokens, pad_id)
    return SpecResult(
        tokens=tokens, num_generated=num[None],
        num_target_calls=stats[0], num_drafted=stats[1],
        num_accepted=stats[2],
    )


def _lora(trainable, cfg):
    from ..models import lora as lora_mod

    if trainable is None or "lora" not in trainable or cfg.lora is None:
        return None
    return lora_mod.with_scaling(trainable["lora"], cfg.lora)


@functools.partial(
    jax.jit,
    static_argnames=(
        "cfg", "draft_cfg", "max_new_tokens", "gamma", "eos_id", "pad_id",
        "audio_start_id", "audio_end_id", "compute_dtype", "has_audio",
        "greedy", "temperature", "top_p", "top_k", "kv_quant",
    ),
)
def generate_speculative_batched(
    frozen: dict,
    draft_params: dict,
    trainable: Optional[dict],
    cfg: AudioLLMConfig,
    draft_cfg,
    input_ids: jnp.ndarray,  # [B, T] right-padded
    attention_mask: jnp.ndarray,  # [B, T]
    audio_features: Optional[jnp.ndarray],
    key: Optional[jax.Array] = None,
    *,
    max_new_tokens: int = 64,
    gamma: int = 4,
    eos_id: int = 2,
    pad_id: int = 0,
    audio_start_id: int = 0,
    audio_end_id: int = 0,
    compute_dtype=jnp.bfloat16,
    has_audio: bool = True,
    greedy: bool = True,
    temperature: float = 1.0,
    top_p: float = 1.0,
    top_k: int = 0,
    kv_quant=False,
) -> SpecResult:
    """Batched speculative decoding: per-row acceptance, divergent timelines.

    The batch-1 algorithm (generate_speculative) rewinds ONE scalar cache
    length on rejection; with a batch, each row accepts a different number of
    draft tokens per round, so rows' cache timelines diverge. llama_forward's
    `cache_offsets` ([B] per-row physical append offsets) is the primitive:
    every round derives each row's offset STATELESSLY from its output count —
    target rows append at P + n_out_b - 1, draft rows at T_text + n_out_b - 1
    — so there is no rewind bookkeeping at all; rejected rows' stale slots are
    simply overwritten next round and are never attendable (slot-causal masks
    relative to the row's own offset).

    Rows run in lockstep rounds (one draft scan + one verify forward per
    round); a finished row (EOS or max_new_tokens) keeps riding the batch with
    n_emit = 0 — its writes land on its own dead slots and its outputs are
    masked. Greedy mode stays LOSSLESS per row (bit-identical to plain greedy
    decoding of that row, tests/test_speculative.py); stochastic mode applies
    the Leviathan accept/reject row-wise on the post-filter distributions.

    Stats are per-row ([B] num_drafted / num_accepted) so acceptance rates can
    be measured per stream; num_target_calls counts verify rounds (each round
    costs ONE [B, gamma+1] target forward regardless of batch).

    Reference analog: none (reference delegates to HF generate,
    src/models/allm.py:326-331).
    """
    B = input_ids.shape[0]
    if cfg.llama.vocab_size != draft_cfg.vocab_size:
        raise ValueError("draft and target must share the vocabulary")
    if not greedy and key is None:
        raise ValueError("stochastic speculative sampling needs a PRNG key")
    if key is None:
        key = jax.random.PRNGKey(0)
    k_first, k_loop = jax.random.split(key)

    def _probs(logits):
        return sampling.filtered_probs(
            logits, temperature=temperature, top_p=top_p, top_k=top_k
        )

    if not has_audio:
        audio_features = None
    embeds, mask = gen.build_prefix(
        frozen, trainable, cfg, input_ids, attention_mask, audio_features,
        audio_start_id, audio_end_id, compute_dtype,
    )
    _, P, _ = embeds.shape
    total = P + max_new_tokens + gamma + 1
    full_mask = jnp.concatenate(
        [mask.astype(jnp.int32),
         jnp.ones((B, max_new_tokens + gamma + 1), jnp.int32)], axis=1
    )
    lora = None if trainable is None else _lora(trainable, cfg)

    # --- target prefill ---
    t_cache = llama_mod.KVCache.zeros(
        cfg.llama, B, total, dtype=compute_dtype, quantized=kv_quant
    )
    _, t_cache, hidden = llama_mod.llama_forward(
        frozen["llama"], cfg.llama,
        inputs_embeds=embeds, attention_mask=full_mask,
        kv_cache=t_cache, compute_dtype=compute_dtype,
        assume_fresh_cache=True, return_hidden=True, unembed_logits=False,
        lora=lora,
    )
    real_len = jnp.sum(mask, axis=1).astype(jnp.int32)  # [B]
    last_hidden = jnp.take_along_axis(
        hidden, (real_len - 1)[:, None, None], axis=1
    )
    first_logits = llama_mod.unembed(
        frozen["llama"], cfg.llama, last_hidden, compute_dtype
    )[:, 0]  # [B, V]
    first_tok = sampling.sample_token(
        first_logits, k_first, temperature=temperature, top_p=top_p,
        top_k=top_k, greedy=greedy,
    )  # [B]

    # --- draft prefill (text prompt only; see generate_speculative) ---
    T_text = input_ids.shape[1]
    d_cache = llama_mod.KVCache.zeros(
        draft_cfg, B, total, dtype=compute_dtype, quantized=kv_quant
    )
    d_mask = jnp.concatenate(
        [attention_mask.astype(jnp.int32),
         jnp.ones((B, max_new_tokens + gamma + 1), jnp.int32)], axis=1
    )
    d_mask = jnp.pad(d_mask, ((0, 0), (0, d_cache.k.shape[3] - d_mask.shape[1])))
    _, d_cache = llama_mod.llama_forward(
        draft_params, draft_cfg,
        input_ids=input_ids, attention_mask=d_mask,
        kv_cache=d_cache, compute_dtype=compute_dtype,
    )
    d_real_len = jnp.sum(attention_mask, axis=1).astype(jnp.int32)  # [B]

    tokens0 = jnp.full((B, max_new_tokens), pad_id, jnp.int32)
    tokens0 = tokens0.at[:, 0].set(first_tok)
    done0 = first_tok == eos_id
    n_out0 = jnp.ones((B,), jnp.int32)
    stats0 = (
        jnp.asarray(0, jnp.int32),  # rounds (= target verify calls)
        jnp.zeros((B,), jnp.int32),  # drafted per row
        jnp.zeros((B,), jnp.int32),  # accepted per row
    )

    def cond(carry):
        _, _, _, _, _, done, _ = carry
        return jnp.any(~done)

    def body(carry):
        t_cache, d_cache, tokens, n_out, last_tok, done, stats = carry
        n_rounds, n_draft, n_acc = stats
        active = ~done
        k_round = jax.random.fold_in(k_loop, n_rounds)
        d_off = T_text + n_out - 1  # [B] physical draft append offsets
        t_off = P + n_out - 1  # [B] physical target append offsets

        # ----- draft proposes gamma tokens (per-row offsets) -----
        def d_step(c, i):
            d_cache, tok = c
            pos = (d_real_len + n_out - 1 + i)[:, None]
            logits, d_cache = llama_mod.llama_forward(
                draft_params, draft_cfg, input_ids=tok[:, None],
                attention_mask=d_mask, positions=pos,
                kv_cache=d_cache, cache_offsets=d_off + i,
                compute_dtype=compute_dtype,
            )
            if greedy:
                nxt = _greedy(logits[:, 0])  # [B]
                return (d_cache, nxt), nxt
            q = _probs(logits[:, 0])  # [B, V]
            nxt = sampling.sample_token(
                logits[:, 0], jax.random.fold_in(k_round, i),
                temperature=temperature, top_p=top_p, top_k=top_k,
            )
            return (d_cache, nxt), (nxt, q)

        (d_cache, last_drafted), d_ys = lax.scan(
            d_step, (d_cache, last_tok), jnp.arange(gamma)
        )
        if greedy:
            drafted, qs = d_ys, None  # [gamma, B]
        else:
            drafted, qs = d_ys  # [gamma, B], [gamma, B, V]
        drafted = drafted.T  # [B, gamma]
        # Materialize the final drafted token's K/V (scan wrote K/V only for
        # its inputs — without this the all-accept case leaves a cache hole).
        (d_cache, _), _ = d_step((d_cache, last_drafted), gamma)

        # ----- target verifies all rows in ONE forward -----
        block = jnp.concatenate([last_tok[:, None], drafted], axis=1)
        pos = (real_len + n_out - 1)[:, None] + jnp.arange(gamma + 1)[None, :]
        t_logits, t_cache = llama_mod.llama_forward(
            frozen["llama"], cfg.llama, input_ids=block,
            attention_mask=full_mask, positions=pos,
            kv_cache=t_cache, cache_offsets=t_off,
            compute_dtype=compute_dtype, lora=lora,
        )  # [B, gamma+1, V]
        if greedy:
            t_next = _greedy(t_logits)  # [B, gamma+1]
            agree = drafted == t_next[:, :gamma]  # [B, gamma]
        else:
            t_probs = _probs(t_logits)  # [B, gamma+1, V]
            q_all = jnp.transpose(qs, (1, 0, 2))  # [B, gamma, V]
            p_x = jnp.take_along_axis(
                t_probs[:, :gamma], drafted[..., None], axis=-1
            )[..., 0]
            q_x = jnp.take_along_axis(q_all, drafted[..., None], axis=-1)[..., 0]
            u = jax.random.uniform(
                jax.random.fold_in(k_round, gamma), (B, gamma)
            )
            agree = u * jnp.maximum(q_x, 1e-30) < p_x
        n_match = jnp.argmin(
            jnp.concatenate(
                [agree.astype(jnp.int32), jnp.zeros((B, 1), jnp.int32)], axis=1
            ),
            axis=1,
        ).astype(jnp.int32)  # [B] first disagreement (gamma if all agree)
        if greedy:
            fix = jnp.take_along_axis(t_next, n_match[:, None], axis=1)[:, 0]
        else:
            p_r = jnp.take_along_axis(
                t_probs, n_match[:, None, None], axis=1
            )[:, 0]  # [B, V]
            q_r = jnp.take_along_axis(
                q_all, jnp.minimum(n_match, gamma - 1)[:, None, None], axis=1
            )[:, 0]
            q_r = jnp.where((n_match < gamma)[:, None], q_r, 0.0)
            r = jnp.maximum(p_r - q_r, 0.0)
            rs = jnp.sum(r, axis=1, keepdims=True)
            r = jnp.where(rs > 0, r / jnp.maximum(rs, 1e-30), p_r)
            fix = jax.random.categorical(
                jax.random.fold_in(k_round, gamma + 1),
                jnp.where(r > 0, jnp.log(jnp.maximum(r, 1e-30)), -jnp.inf),
                axis=-1,
            ).astype(jnp.int32)  # [B]
        n_emit = jnp.where(active, n_match + 1, 0)  # [B]

        # emitted block per row: accepted prefix then the fix/bonus token
        emit = jnp.where(
            jnp.arange(gamma + 1)[None, :] < n_match[:, None],
            jnp.concatenate([drafted, jnp.zeros((B, 1), jnp.int32)], axis=1),
            fix[:, None],
        )  # [B, gamma+1]

        # gather-write emit[b, 0..n_emit_b) at tokens[b, n_out_b..]
        j = jnp.arange(max_new_tokens)[None, :]
        rel = j - n_out[:, None]  # [B, max_new]
        val = jnp.take_along_axis(emit, jnp.clip(rel, 0, gamma), axis=1)
        take = (rel >= 0) & (rel < n_emit[:, None])
        tokens = jnp.where(take, val, tokens)

        emitted_eos = jnp.any((val == eos_id) & take, axis=1)  # [B]
        n_out_new = jnp.minimum(n_out + n_emit, max_new_tokens)
        done_new = done | emitted_eos | (n_out_new >= max_new_tokens)
        last_tok_new = jnp.where(
            active,
            jnp.take_along_axis(
                emit, jnp.clip(n_emit - 1, 0, gamma)[:, None], axis=1
            )[:, 0],
            last_tok,
        )
        stats = (
            n_rounds + 1,
            n_draft + gamma * active.astype(jnp.int32),
            n_acc + n_match * active.astype(jnp.int32),
        )
        return (
            t_cache, d_cache, tokens, n_out_new, last_tok_new, done_new, stats
        )

    carry = (t_cache, d_cache, tokens0, n_out0, first_tok, done0, stats0)
    _, _, tokens, n_out, _, _, stats = lax.while_loop(cond, body, carry)

    hit_eos = tokens == eos_id
    any_eos = jnp.any(hit_eos, axis=1)
    first_eos = jnp.argmax(hit_eos, axis=1)
    num = jnp.where(any_eos, first_eos + 1, n_out).astype(jnp.int32)  # [B]
    keep = jnp.arange(max_new_tokens)[None, :] < num[:, None]
    tokens = jnp.where(keep, tokens, pad_id)
    return SpecResult(
        tokens=tokens, num_generated=num,
        num_target_calls=stats[0], num_drafted=stats[1],
        num_accepted=stats[2],
    )
