"""Chunked prefill (prefill_chunk_tokens): admissions fill a staging
cache piece by piece between decode chunks, bounding the decode stall
any admission causes (vLLM chunked prefill restated over static
shapes). Prefix-cached suffixes stage too (pieces block-append at
base=prefix_len into a slab pre-loaded with the prefix KV)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ...models import llama as llama_mod
from ...ops import sampling
from ..generate import build_prefix

from .state import _Row, _Staging, _Pending, _Prefix, samp_arrays


class StagingMixin:
    def _stage_admission(self, r: int, req: _Pending, bucket: int):
        """Reserve row r and start a chunked prefill: the combined prompt
        embeds are computed once (audio encode included), then
        _advance_staging block-appends prefill_chunk_tokens-sized pieces
        into a staging cache across scheduling rounds, bounding the
        decode stall any single round pays (vLLM's chunked prefill,
        restated over static shapes: one piece program per geometry)."""
        c = self.prefill_chunk_tokens
        ids = np.full((1, bucket), self.pad_id, np.int32)
        mask = np.zeros((1, bucket), np.int32)
        n = len(req.input_ids)
        ids[0, :n] = req.input_ids
        mask[0, :n] = 1
        if req.prefix is not None:
            # prefix-cached suffix: embed only the text suffix; the
            # staging slab starts as a copy of the registered prefix KV
            # and pieces block-append at base + i*c (same divergent-
            # timeline primitive as the one-shot suffix path)
            pfx = self._prefixes[req.prefix]
            embeds, emask = self._get_embed_fn(bucket, False)(
                jnp.asarray(ids), jnp.asarray(mask), None
            )
            cache = self._get_prefix_stage_fn(
                pfx.cap, embeds.shape[1]
            )(pfx.cache)
            self._staging_rows[r] = _Staging(
                req=req, cache=cache, embeds=embeds, emask=emask,
                total=n, embeds_bucket=bucket, base=pfx.length,
                d_pcache=pfx.d_cache, d_plen=pfx.d_length,
            )
            self._rows[r] = _Row(rid=req.rid, budget=req.max_new_tokens,
                                 emitted=[], free=False, staging=True)
            self.prefix_admits += 1
            return
        has_audio = req.audio_features is not None
        blk = (
            self._resolve_audio_len(req.audio_features.shape)
            if has_audio else None
        )
        total = self._combined_len(n, blk)
        embeds, emask = self._get_embed_fn(bucket, has_audio)(
            jnp.asarray(ids), jnp.asarray(mask),
            jnp.asarray(req.audio_features)[None] if has_audio else None,
        )
        cache = llama_mod.KVCache.zeros(
            self.cfg.llama, 1, embeds.shape[1], dtype=self.compute_dtype,
            quantized=self.kv_quant,
        )
        self._staging_rows[r] = _Staging(
            req=req, cache=cache, embeds=embeds, emask=emask, total=total,
            embeds_bucket=bucket,
        )
        self._rows[r] = _Row(rid=req.rid, budget=req.max_new_tokens,
                             emitted=[], free=False, staging=True)

    def _advance_staging(self):
        """Advance chunked prefills by ONE piece this round — the stall
        bound: between any two decode chunks the device runs at most
        prefill_chunk_tokens of prompt processing. Staged rows take turns
        (round-robin); a finished staging splices into its pool row and
        decodes from the next chunk. Rounds with no live decode rows
        skip straight back here, so an idle pool prefills back-to-back."""
        if not self._staging_rows:
            return
        c = self.prefill_chunk_tokens
        order = sorted(self._staging_rows)
        start = self._staging_rr
        r = min((x for x in order if x >= start), default=order[0])
        self._staging_rr = r + 1
        st = self._staging_rows[r]
        fn = self._get_piece_fn(st.embeds.shape[1], st.cache.k.shape[3])
        self._key, k = jax.random.split(self._key)
        st.cache, st.tok0 = fn(
            st.cache, st.embeds, st.emask, jnp.int32(st.written // c),
            jnp.int32(st.base), k, samp_arrays([st.req]),
        )
        st.written += c
        if st.written >= st.total:
            extra = ()
            if self.draft_params is not None:
                # the draft model is small by definition — its prefill
                # over the text prompt runs one-shot at the final piece
                # (chunking it would add scheduling for negligible work)
                bucket = st.embeds_bucket
                ids = np.full((1, bucket), self.pad_id, np.int32)
                mask = np.zeros((1, bucket), np.int32)
                n = len(st.req.input_ids)
                ids[0, :n] = st.req.input_ids
                mask[0, :n] = 1
                if st.d_pcache is not None:
                    # prefix staging: suffix block-appends into the
                    # draft's registered prefix slab
                    extra = self._get_draft_suffix_fn(
                        bucket, st.d_pcache.k.shape[3]
                    )(st.d_pcache, jnp.int32(st.d_plen),
                      jnp.asarray(ids), jnp.asarray(mask))
                else:
                    extra = self._get_draft_prefill_fn(bucket)(
                        jnp.asarray(ids), jnp.asarray(mask)
                    )
            self._state = self._get_insert_fn()(
                self._state, st.cache, jnp.int32(st.base + st.total),
                st.tok0, jnp.int32(r), jnp.int32(st.req.max_new_tokens),
                jnp.float32(st.req.temperature), jnp.float32(st.req.top_p),
                jnp.int32(st.req.top_k), jnp.bool_(st.req.greedy),
                *extra,
            )
            del self._staging_rows[r]
            self._rows[r] = _Row(
                rid=st.req.rid, budget=st.req.max_new_tokens,
                emitted=[], free=False,
            )

    def _get_draft_prefill_fn(self, bucket: int):
        """Draft-only prefill over the text prompt (spec pools under
        chunked prefill) -> (d_fresh, d_text) for the pool splice."""
        if bucket in self._draft_fns:
            return self._draft_fns[bucket]
        cdt = self.compute_dtype
        eng = self

        def dprefill(W, ids, mask):
            d_fresh = llama_mod.KVCache.zeros(
                eng.draft_cfg, 1, ids.shape[1], dtype=cdt,
                quantized=eng.kv_quant,
            )
            Tkd = d_fresh.k.shape[3]
            dm = jnp.pad(
                mask.astype(jnp.int32), ((0, 0), (0, Tkd - mask.shape[1]))
            )
            _, d_fresh = llama_mod.llama_forward(
                W["draft"], eng.draft_cfg, input_ids=ids,
                attention_mask=dm, kv_cache=d_fresh, compute_dtype=cdt,
                assume_fresh_cache=True,
            )
            return d_fresh, jnp.sum(mask, axis=1).astype(jnp.int32)[0]

        W = self._W
        f = jax.jit(dprefill)
        fn = lambda *a: f(W, *a)  # noqa: E731
        self._draft_fns[bucket] = fn
        return fn

    def _get_draft_suffix_fn(self, bucket: int, d_cap: int):
        """Draft-side suffix append for STAGED prefix-cached admissions
        (spec pools under chunked prefill): block-append the text suffix
        into the draft's registered prefix slab at cache_offsets=pdlen —
        the draft half of _get_suffix_fn's sprefill, run one-shot at the
        final piece. (The draft is replicated under tp, like
        _get_draft_prefill_fn.)"""
        keyfn = (bucket, d_cap)
        if keyfn in self._draft_sfx_fns:
            return self._draft_sfx_fns[keyfn]
        cfg = self.cfg
        cdt = self.compute_dtype
        eng = self

        def dsuffix(W, pdcache, pdlen, ids, mask):
            fresh = llama_mod.KVCache.zeros(
                eng.draft_cfg, 1, pdcache.k.shape[3] + ids.shape[1],
                dtype=cdt, quantized=eng.kv_quant,
            )

            def put(dst, src):
                if dst is None:
                    return None
                return jax.lax.dynamic_update_slice(
                    dst, src.astype(dst.dtype), (0,) * dst.ndim
                )

            d_fresh = llama_mod.KVCache(
                k=put(fresh.k, pdcache.k), v=put(fresh.v, pdcache.v),
                length=fresh.length,
                k_scale=put(fresh.k_scale, pdcache.k_scale),
                v_scale=put(fresh.v_scale, pdcache.v_scale),
            )
            n = jnp.sum(mask, axis=1).astype(jnp.int32)[0]
            dm = (
                jnp.arange(d_fresh.k.shape[3])[None, :] < pdlen + n
            ).astype(jnp.int32)
            _, d_fresh = llama_mod.llama_forward(
                W["draft"], eng.draft_cfg, input_ids=ids,
                attention_mask=dm, kv_cache=d_fresh,
                cache_offsets=jnp.reshape(pdlen, (1,)).astype(jnp.int32),
                compute_dtype=cdt,
            )
            return d_fresh, pdlen + n

        W = self._W
        f = jax.jit(dsuffix)
        fn = lambda *a: f(W, *a)  # noqa: E731
        self._draft_sfx_fns[keyfn] = fn
        return fn

    def _get_prefix_stage_fn(self, pcap: int, Pp: int):
        """Staging slab for a chunked prefix-cached admission: a fresh
        [pcap + Pp]-timeline cache pre-loaded with the registered prefix
        KV at the origin (the target-model half of _get_suffix_fn's
        splice_fresh, split out because pieces then fill the rest across
        rounds). Sharded over the KV-head axis under tp like every pool
        slab."""
        keyfn = (pcap, Pp)
        if keyfn in self._stage_fns:
            return self._stage_fns[keyfn]
        cfg = self.cfg
        cdt = self.compute_dtype
        eng = self

        def stage(pcache):
            fresh = llama_mod.KVCache.zeros(
                cfg.llama, 1, pcache.k.shape[3] + Pp, dtype=cdt,
                quantized=eng.kv_quant,
                kv_heads=cfg.llama.num_kv_heads // eng.tp,
            )

            def put(dst, src):
                if dst is None:
                    return None
                return jax.lax.dynamic_update_slice(
                    dst, src.astype(dst.dtype), (0,) * dst.ndim
                )

            return llama_mod.KVCache(
                k=put(fresh.k, pcache.k), v=put(fresh.v, pcache.v),
                length=fresh.length,
                k_scale=put(fresh.k_scale, pcache.k_scale),
                v_scale=put(fresh.v_scale, pcache.v_scale),
            )

        if self.tp <= 1:
            f = jax.jit(stage)
        else:
            from jax.sharding import PartitionSpec as P

            f = jax.jit(jax.shard_map(
                stage, mesh=self.mesh,
                in_specs=(self._fresh_spec(True),),
                out_specs=self._fresh_spec(True),
                check_vma=False,
            ))
        self._stage_fns[keyfn] = f
        return f

    def _get_embed_fn(self, bucket: int, has_audio: bool):
        """Combined prompt embeds for staging, padded to a whole number
        of pieces (the final piece's static slice must not read past the
        end; pad K/V rows land past the final offset, never attended)."""
        keyfn = (bucket, has_audio)
        if keyfn in self._embed_fns:
            return self._embed_fns[keyfn]
        cfg = self.cfg
        cdt = self.compute_dtype
        c = self.prefill_chunk_tokens
        eng = self

        def embeds_fn(W, ids, mask, feats):
            # embed table / whisper / projector are replicated under tp —
            # a plain jit suffices (no llama layers run here)
            e, m = build_prefix(
                W["frozen"], W.get("trainable"), cfg, ids, mask, feats,
                eng.audio_start_id, eng.audio_end_id, cdt,
            )
            P = e.shape[1]
            Pp = -(-P // c) * c
            if Pp != P:
                e = jnp.pad(e, ((0, 0), (0, Pp - P), (0, 0)))
                m = jnp.pad(m, ((0, 0), (0, Pp - P)))
            return e, m.astype(jnp.int32)

        W = self._W
        f = jax.jit(embeds_fn)
        fn = lambda *a: f(W, *a)  # noqa: E731
        self._embed_fns[keyfn] = fn
        return fn

    def _get_piece_fn(self, Pb: int, cap: int):
        """One prefill piece: block-append embeds[:, i*c:(i+1)*c) at
        cache_offsets=base+i*c (the same divergent-timeline primitive the
        prefix-cache suffix uses; base=0 for plain admissions, the prefix
        real length for staged prefix-cached suffixes) and sample a
        candidate first token from the piece's last real position (the
        FINAL piece's sample is the admission's tok0). The staging cache
        is donated — pieces fill it in place."""
        keyfn = (Pb, cap)
        if keyfn in self._piece_fns:
            return self._piece_fns[keyfn]
        cfg = self.cfg
        cdt = self.compute_dtype
        c = self.prefill_chunk_tokens
        eng = self
        tpax = "tp" if self.tp > 1 else None

        def piece(W, cache, embeds, emask, i, base, key, samp):
            frozen, lora = W["frozen"], W.get("lora")
            eoff = i * c  # position within the staged embeds
            off = base + eoff  # position on the cache timeline
            e = jax.lax.dynamic_slice(
                embeds, (0, eoff, 0), (1, c, embeds.shape[2])
            )
            m = jax.lax.dynamic_slice(emask, (0, eoff), (1, c))
            n_i = jnp.sum(m, axis=1).astype(jnp.int32)[0]
            Tk = cache.k.shape[3]
            am = (jnp.arange(Tk)[None, :] < off + n_i).astype(jnp.int32)
            _, cache, hidden = llama_mod.llama_forward(
                frozen["llama"], cfg.llama, inputs_embeds=e,
                attention_mask=am, kv_cache=cache,
                cache_offsets=jnp.reshape(off, (1,)).astype(jnp.int32),
                lora=lora, compute_dtype=cdt,
                return_hidden=True, unembed_logits=False, tp_axis=tpax,
            )
            last = jax.lax.dynamic_slice_in_dim(
                hidden, jnp.maximum(n_i - 1, 0), 1, axis=1
            )
            logits = llama_mod.unembed_with_tp(
                frozen["llama"], cfg.llama, last, cdt, tpax
            )
            tok0 = sampling.sample_token_per_row(
                logits[:, 0], key, samp["temperature"],
                samp["top_p"], samp["top_k"], samp["greedy"],
            )[0]
            return cache, tok0

        W = self._W
        if self.tp <= 1:
            f = jax.jit(piece, donate_argnums=(1,))
        else:
            from jax.sharding import PartitionSpec as P

            f = jax.jit(
                jax.shard_map(
                    piece, mesh=self.mesh,
                    in_specs=(self._weight_specs(), self._fresh_spec(True),
                              P(), P(), P(), P(), P(),
                              {"temperature": P(), "top_p": P(),
                               "top_k": P(), "greedy": P()}),
                    out_specs=(self._fresh_spec(True), P()),
                    check_vma=False,
                ),
                donate_argnums=(1,),
            )
        fn = lambda *a: f(W, *a)  # noqa: E731
        self._piece_fns[keyfn] = fn
        return fn
