"""Decode chunks: the jitted pool-advance programs (plain and
speculative draft-and-verify), sampling, and their shard_map wraps."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ...models import llama as llama_mod
from ...ops import sampling
from ..generate import build_prefix

from .state import _Row, _Staging, _Pending, _Prefix


class DecodeMixin:
    def _sample(self, logits, key):
        return sampling.sample_token(
            logits, key, temperature=self.temperature, top_p=self.top_p,
            top_k=self.top_k, greedy=self.greedy,
        )

    def _decode_chunk(self):
        if self._chunk_fn is None:
            cfg = self.cfg
            cdt = self.compute_dtype
            eng = self
            tpax = "tp" if self.tp > 1 else None

            def chunk(W, state, key):
                frozen, lora = W["frozen"], W.get("lora")
                samp = state["samp"]
                if eng.mesh is not None:
                    # independent sampling per row shard (greedy ignores
                    # it; tp shards must NOT fold — identical logits need
                    # identical samples on every weight shard)
                    key = jax.random.fold_in(
                        key, jax.lax.axis_index(eng.dp_axis)
                    )

                def step(carry, k):
                    cache, offsets, last_tok, active, remaining = carry
                    # The first chunk token for a just-admitted row is its
                    # prefill-sampled token — emit it before computing the
                    # next one (its K/V row is appended by this forward).
                    emit = jnp.where(active, last_tok, eng.pad_id)
                    fire = active
                    logits, cache = llama_mod.llama_forward(
                        frozen["llama"], cfg.llama,
                        input_ids=last_tok[:, None],
                        positions=offsets[:, None],
                        kv_cache=cache, cache_offsets=offsets,
                        lora=lora, compute_dtype=cdt,
                        attn_impl=eng.attn_impl, tp_axis=tpax,
                    )
                    tok = sampling.sample_token_per_row(
                        logits[:, 0], k, samp["temperature"],
                        samp["top_p"], samp["top_k"], samp["greedy"],
                    )
                    done = (emit == eng.eos_id) | (remaining <= 0)
                    nxt_active = active & ~done
                    offsets = jnp.where(active, offsets + 1, offsets)
                    remaining = jnp.where(
                        nxt_active, remaining - 1, remaining
                    )
                    last_tok = jnp.where(nxt_active, tok, last_tok)
                    return (
                        (cache, offsets, last_tok, nxt_active, remaining),
                        (emit, fire),
                    )

                keys = jax.random.split(key, eng.chunk_steps)
                carry = (
                    state["cache"], state["offsets"], state["last_tok"],
                    state["active"], state["remaining"],
                )
                carry, (emit, fire) = jax.lax.scan(step, carry, keys)
                cache, offsets, last_tok, active, remaining = carry
                return {
                    "cache": cache, "offsets": offsets,
                    "last_tok": last_tok, "active": active,
                    "remaining": remaining, "samp": samp,
                }, emit, fire

            if eng.mesh is None:
                self._chunk_fn = jax.jit(chunk, donate_argnums=(1,))
            else:
                from jax.sharding import PartitionSpec as P

                sspec = eng._state_specs()
                emit_spec = P(None, eng.dp_axis)  # [chunk_steps, rows]
                self._chunk_fn = jax.jit(
                    jax.shard_map(
                        chunk, mesh=eng.mesh,
                        in_specs=(eng._weight_specs(), sspec, P()),
                        out_specs=(sspec, emit_spec, emit_spec),
                        check_vma=False,
                    ),
                    donate_argnums=(1,),
                )

        self._key, k = jax.random.split(self._key)
        self._state, emit, fire = self._chunk_fn(self._W, self._state, k)
        return emit, fire

    def _decode_chunk_spec(self):
        """chunk_steps ROUNDS of draft-gamma + one-forward verify over the
        pool. Per round each row emits its carried token + the accepted
        draft prefix (1..gamma+1 tokens) and carries the corrected/bonus
        token; target/draft offsets advance by the emission count, so
        rejected rows' stale cache slots are overwritten before becoming
        attendable (the pool's slot-causal invariant — no rewinds). The
        algorithm is generate_speculative_batched's, restated over pool
        state; greedy mode is lossless per row.

        Returns (emit [K, R, gamma+2], n_emit [K, R]) — the +2nd column
        carries the budget-final fix token (spliced at col n_raw)."""
        if self._chunk_fn is None:
            cfg = self.cfg
            dcfg = self.draft_cfg
            cdt = self.compute_dtype
            gamma = self.gamma
            eng = self
            tpax = "tp" if self.tp > 1 else None

            def probs(logits):
                return sampling.filtered_probs(
                    logits, temperature=eng.temperature, top_p=eng.top_p,
                    top_k=eng.top_k,
                )

            def greedy_tok(logits):
                return jnp.argmax(logits, axis=-1).astype(jnp.int32)

            def chunk(W, state, key):
                frozen, lora = W["frozen"], W.get("lora")
                dparams = W["draft"]
                # LOCAL row count (under mesh= this runs inside shard_map
                # on a rows/dp shard; sampling keys fold in the dp shard —
                # never the tp shard, whose rows are the same)
                R = state["offsets"].shape[0]
                if eng.mesh is not None:
                    key = jax.random.fold_in(
                        key, jax.lax.axis_index(eng.dp_axis)
                    )

                def round_step(carry, k_round):
                    (t_cache, d_cache, offs, d_offs, last_tok, active,
                     remaining) = carry

                    # ----- draft proposes gamma tokens -----
                    def d_step(c, i):
                        dc, tok = c
                        logits, dc = llama_mod.llama_forward(
                            dparams, dcfg, input_ids=tok[:, None],
                            positions=(d_offs + i)[:, None],
                            kv_cache=dc, cache_offsets=d_offs + i,
                            compute_dtype=cdt, attn_impl=eng.attn_impl,
                        )
                        if eng.greedy:
                            nxt = greedy_tok(logits[:, 0])
                            return (dc, nxt), nxt
                        q = probs(logits[:, 0])
                        nxt = sampling.sample_token(
                            logits[:, 0], jax.random.fold_in(k_round, i),
                            temperature=eng.temperature, top_p=eng.top_p,
                            top_k=eng.top_k,
                        )
                        return (dc, nxt), (nxt, q)

                    (d_cache, last_drafted), d_ys = lax.scan(
                        d_step, (d_cache, last_tok), jnp.arange(gamma)
                    )
                    drafted = (d_ys if eng.greedy else d_ys[0]).T  # [R, g]
                    qs = None if eng.greedy else d_ys[1]  # [g, R, V]
                    # materialize the final drafted token's K/V (the scan
                    # wrote K/V only for its inputs)
                    (d_cache, _), _ = d_step((d_cache, last_drafted), gamma)

                    # ----- one multi-token target verify -----
                    block = jnp.concatenate(
                        [last_tok[:, None], drafted], axis=1
                    )  # [R, gamma+1]
                    pos = offs[:, None] + jnp.arange(gamma + 1)[None, :]
                    t_logits, t_cache = llama_mod.llama_forward(
                        frozen["llama"], cfg.llama, input_ids=block,
                        positions=pos, kv_cache=t_cache,
                        cache_offsets=offs, lora=lora,
                        compute_dtype=cdt, attn_impl=eng.attn_impl,
                        tp_axis=tpax,
                    )  # [R, gamma+1, V]
                    if eng.greedy:
                        t_next = greedy_tok(t_logits)  # [R, gamma+1]
                        agree = drafted == t_next[:, :gamma]
                    else:
                        t_probs = probs(t_logits)
                        q_all = jnp.transpose(qs, (1, 0, 2))  # [R, g, V]
                        p_x = jnp.take_along_axis(
                            t_probs[:, :gamma], drafted[..., None], axis=-1
                        )[..., 0]
                        q_x = jnp.take_along_axis(
                            q_all, drafted[..., None], axis=-1
                        )[..., 0]
                        u = jax.random.uniform(
                            jax.random.fold_in(k_round, gamma), (R, gamma)
                        )
                        agree = u * jnp.maximum(q_x, 1e-30) < p_x
                    n_match = jnp.argmin(
                        jnp.concatenate(
                            [agree.astype(jnp.int32),
                             jnp.zeros((R, 1), jnp.int32)], axis=1
                        ),
                        axis=1,
                    ).astype(jnp.int32)  # [R]
                    if eng.greedy:
                        fix = jnp.take_along_axis(
                            t_next, n_match[:, None], axis=1
                        )[:, 0]
                    else:
                        # Leviathan residual (or bonus when all accepted)
                        p_r = jnp.take_along_axis(
                            t_probs, n_match[:, None, None], axis=1
                        )[:, 0]
                        q_r = jnp.take_along_axis(
                            q_all,
                            jnp.minimum(n_match, gamma - 1)[:, None, None],
                            axis=1,
                        )[:, 0]
                        q_r = jnp.where((n_match < gamma)[:, None], q_r, 0.0)
                        res = jnp.maximum(p_r - q_r, 0.0)
                        rs = jnp.sum(res, axis=1, keepdims=True)
                        res = jnp.where(
                            rs > 0, res / jnp.maximum(rs, 1e-30), p_r
                        )
                        fix = jax.random.categorical(
                            jax.random.fold_in(k_round, gamma + 1),
                            jnp.where(
                                res > 0,
                                jnp.log(jnp.maximum(res, 1e-30)),
                                -jnp.inf,
                            ),
                            axis=-1,
                        ).astype(jnp.int32)

                    # emitted this round: carried token + accepted prefix
                    # (block[:, :n_match+1]); fix becomes the next carry —
                    # EXCEPT when this round exhausts the budget, where fix
                    # is the final token and ships in the extra column
                    # (otherwise it would be counted but never delivered)
                    n_raw = n_match + 1
                    cols = jnp.arange(gamma + 1)[None, :]
                    valid = cols < n_raw[:, None]
                    block_eos = jnp.any(
                        (block == eng.eos_id) & valid, axis=1
                    )
                    remaining = jnp.where(
                        active, remaining - n_raw, remaining
                    )
                    spent = (remaining <= 0) & ~block_eos
                    done = block_eos | (remaining <= 0)
                    n_emit = jnp.where(
                        active, n_raw + spent.astype(jnp.int32), 0
                    )
                    # [R, gamma+2]: accepted prefix, then fix at col n_raw
                    # (harvest reads columns 0..n_emit-1 contiguously)
                    ext = jnp.concatenate(
                        [block, jnp.zeros((R, 1), jnp.int32)], axis=1
                    )
                    cols2 = jnp.arange(gamma + 2)[None, :]
                    emit_block = jnp.where(
                        cols2 == n_raw[:, None], fix[:, None], ext
                    )
                    nxt_active = active & ~done
                    # physical offsets advance past every VERIFIED slot
                    # (carry + accepted), not past a budget-final fix whose
                    # K/V was never appended
                    adv = jnp.where(active, n_raw, 0)
                    offs = offs + adv
                    d_offs = d_offs + adv
                    last_tok = jnp.where(nxt_active, fix, last_tok)
                    return (
                        (t_cache, d_cache, offs, d_offs, last_tok,
                         nxt_active, remaining),
                        (emit_block, n_emit),
                    )

                keys = jax.random.split(key, eng.chunk_steps)
                carry = (
                    state["cache"], state["d_cache"], state["offsets"],
                    state["d_offsets"], state["last_tok"],
                    state["active"], state["remaining"],
                )
                carry, (emit, n_emit) = lax.scan(round_step, carry, keys)
                (t_cache, d_cache, offs, d_offs, last_tok, active,
                 remaining) = carry
                return {
                    "cache": t_cache, "d_cache": d_cache,
                    "offsets": offs, "d_offsets": d_offs,
                    "last_tok": last_tok, "active": active,
                    "remaining": remaining, "samp": state["samp"],
                }, emit, n_emit

            if eng.mesh is None:
                self._chunk_fn = jax.jit(chunk, donate_argnums=(1,))
            else:
                from jax.sharding import PartitionSpec as P

                sspec = eng._state_specs()
                self._chunk_fn = jax.jit(
                    jax.shard_map(
                        chunk, mesh=eng.mesh,
                        in_specs=(eng._weight_specs(), sspec, P()),
                        out_specs=(
                            sspec,
                            P(None, eng.dp_axis, None),  # emit [K,R,g+2]
                            P(None, eng.dp_axis),  # n_emit [K,R]
                        ),
                        check_vma=False,
                    ),
                    donate_argnums=(1,),
                )

        self._key, k = jax.random.split(self._key)
        self._state, emit, n_emit = self._chunk_fn(self._W, self._state, k)
        return emit, n_emit
