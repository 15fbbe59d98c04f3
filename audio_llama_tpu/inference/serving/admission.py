"""Admission: bucket selection, one-shot and batched prefill program
factories, the prefix-suffix prefill, and the donated pool-splice.
Chunked (staged) prefill lives in serving/staging.py."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ...models import llama as llama_mod
from ...ops import sampling
from ..generate import build_prefix

from .state import _Row, _Staging, _Pending, _Prefix, samp_arrays


class AdmissionMixin:
    @staticmethod
    def _combined_len(n_text: int, block_len: Optional[int]) -> int:
        """Prompt timeline length: text tokens plus the audio embedding
        block (None for text-only requests)."""
        return n_text if block_len is None else n_text + block_len

    def _resolve_audio_len(self, feat_shape) -> int:
        """Audio embedding block length (enc frames + 2 delimiters) via
        eval_shape — no compute; cached PER FEATURE SHAPE (chunked long
        audio yields N x 30 s windows with N-dependent block lengths, so
        a single cached value would under-reserve longer requests)."""
        key = tuple(feat_shape)
        if key not in self._audio_block_lens:
            def f(feats):
                e, _ = build_prefix(
                    self.frozen, self.trainable, self.cfg,
                    jnp.zeros((1, 1), jnp.int32), jnp.ones((1, 1), jnp.int32),
                    feats, self.audio_start_id, self.audio_end_id,
                    self.compute_dtype,
                )
                return e
            shape = jax.eval_shape(
                f, jax.ShapeDtypeStruct((1,) + key, jnp.float32)
            )
            self._audio_block_lens[key] = shape.shape[1] - 1
        return self._audio_block_lens[key]

    def _pick_bucket(self, n: int) -> int:
        for b in self.buckets:
            if n <= b:
                return b
        raise ValueError(
            f"prompt length {n} exceeds the largest prefill bucket "
            f"{self.buckets[-1]}"
        )

    def _admit_pending(self):
        free = [r for r, row in enumerate(self._rows) if row.free]
        while free and self._queue:
            req = self._queue[0]
            if req.prefix is not None:
                pfx = self._prefixes.get(req.prefix)
                if pfx is None:  # unregistered while queued: reject
                    self._queue.pop(0)
                    self._results[req.rid] = []
                    continue
                comb = pfx.length + len(req.input_ids)
            else:
                has_audio = req.audio_features is not None
                blk = (
                    self._resolve_audio_len(req.audio_features.shape)
                    if has_audio else None
                )
                comb = self._combined_len(len(req.input_ids), blk)
            try:
                # bucket over the TEXT length; audio (or a registered
                # prefix slab) is a fixed-size timeline prefix. The
                # BUCKETED prefill timeline must also fit the pool (its
                # rows splice in whole) alongside the generation budget.
                tb = self._pick_bucket(len(req.input_ids))
                if req.prefix is not None:
                    sb = tb
                    if self.prefill_chunk_tokens is not None:
                        # staged suffixes pad to whole pieces
                        c = self.prefill_chunk_tokens
                        sb = -(-tb // c) * c
                    comb_b = llama_mod.KVCache.rounded_len(pfx.cap + sb)
                else:
                    cb = self._combined_len(tb, blk)
                    if self.prefill_chunk_tokens is not None:
                        # staging pads to whole pieces; the spliced slab
                        # carries that padding into the pool row
                        c = self.prefill_chunk_tokens
                        cb = -(-cb // c) * c
                    comb_b = llama_mod.KVCache.rounded_len(cb)
                # speculative verify appends up to gamma slots past the
                # final accepted offset — reserve them
                extra = 0 if self.draft_params is None else self.gamma
                if (
                    comb + req.max_new_tokens + extra > self.max_len
                    or comb_b > self.max_len
                ):
                    raise ValueError("request does not fit the pool")
            except ValueError:
                self._queue.pop(0)
                self._results[req.rid] = []  # rejected: cannot fit
                continue
            r = free.pop(0)
            self._queue.pop(0)
            if (
                self.admit_batch > 1
                and req.prefix is None
                and self.prefill_chunk_tokens is None
            ):
                # batched admission: pull the consecutive run of queued
                # requests sharing this request's prefill geometry (same
                # bucket + audio-ness, no prefix, fits the pool) into ONE
                # B>1 prefill program — admissions through a remote
                # tunnel pay ~30 ms dispatch each, and short-bucket
                # prefills underfill the MXU at B=1
                group = [(r, req)]
                while (
                    free and self._queue
                    and len(group) < self.admit_batch
                ):
                    nxt = self._queue[0]
                    if nxt.prefix is not None:
                        break
                    if (nxt.audio_features is None) != (
                        req.audio_features is None
                    ):
                        break
                    if (
                        nxt.audio_features is not None
                        and nxt.audio_features.shape
                        != req.audio_features.shape
                    ):
                        break
                    nblk = (
                        self._resolve_audio_len(nxt.audio_features.shape)
                        if nxt.audio_features is not None else None
                    )
                    ncomb = self._combined_len(len(nxt.input_ids), nblk)
                    try:
                        if self._pick_bucket(len(nxt.input_ids)) != tb:
                            break
                    except ValueError:
                        break
                    if ncomb + nxt.max_new_tokens > self.max_len:
                        break
                    group.append((free.pop(0), self._queue.pop(0)))
                # round DOWN to a power of two: group sizes are program
                # shapes, and an unforeseen size mid-run means a fresh
                # remote compile stalling the pool (measured: 11.2 s vs
                # 4.0 s drained wall — BASELINE.md admit-batch A/B).
                # {1,2,4,...} is a warmable set.
                keep = 1 << (len(group).bit_length() - 1)
                while len(group) > keep:
                    r2, q2 = group.pop()
                    free.insert(0, r2)
                    self._queue.insert(0, q2)
                if len(group) > 1:
                    self._admit_batch(group, tb)
                    continue
            self._admit(r, req, tb)

    def _admit(self, r: int, req: _Pending, bucket: int):
        if self.prefill_chunk_tokens is not None:
            # chunked prefill: reserve the row, fill across rounds
            # (prefix-cached suffixes stage too — pieces append at
            # base=prefix_len into a slab pre-loaded with the prefix KV)
            self._stage_admission(r, req, bucket)
            return
        ids = np.full((1, bucket), self.pad_id, np.int32)
        mask = np.zeros((1, bucket), np.int32)
        n = len(req.input_ids)
        ids[0, :n] = req.input_ids
        mask[0, :n] = 1
        self._key, k = jax.random.split(self._key)
        samp = samp_arrays([req])
        if req.prefix is not None:
            pfx = self._prefixes[req.prefix]
            fn = self._get_suffix_fn(bucket, pfx.cap, pfx.d_cap)
            args = [pfx.cache, jnp.int32(pfx.length)]
            if self.draft_params is not None:
                args += [pfx.d_cache, jnp.int32(pfx.d_length)]
            res = fn(*args, jnp.asarray(ids), jnp.asarray(mask), k, samp)
            self.prefix_admits += 1
        else:
            has_audio = req.audio_features is not None
            fn = self._get_prefill_fn(bucket, has_audio)
            feats = (
                jnp.asarray(req.audio_features)[None] if has_audio else None
            )
            res = fn(jnp.asarray(ids), jnp.asarray(mask), feats, k, samp)
        self.admit_sizes.append(1)
        self._state = self._get_insert_fn()(
            self._state, *res[:3], jnp.int32(r),
            jnp.int32(req.max_new_tokens),
            jnp.float32(req.temperature), jnp.float32(req.top_p),
            jnp.int32(req.top_k), jnp.bool_(req.greedy),
            *res[3:],
        )
        self._rows[r] = _Row(rid=req.rid, budget=req.max_new_tokens,
                             emitted=[], free=False)

    def _admit_batch(self, group, bucket: int):
        """Admit len(group) same-geometry requests through ONE batched
        prefill program, then splice each row with the existing
        per-request insert (the batched fresh cache is sliced per row on
        device)."""
        Ba = len(group)
        ids = np.full((Ba, bucket), self.pad_id, np.int32)
        mask = np.zeros((Ba, bucket), np.int32)
        for b, (_, req) in enumerate(group):
            n = len(req.input_ids)
            ids[b, :n] = req.input_ids
            mask[b, :n] = 1
        has_audio = group[0][1].audio_features is not None
        feats = (
            jnp.asarray(np.stack([q.audio_features for _, q in group]))
            if has_audio else None
        )
        self._key, k = jax.random.split(self._key)
        fn = self._get_batch_prefill_fn(bucket, has_audio, Ba)
        self.admit_sizes.append(Ba)
        res = fn(jnp.asarray(ids), jnp.asarray(mask), feats, k,
                 samp_arrays([q for _, q in group]))
        fresh, real, tok0 = res[:3]
        d_res = res[3:]
        ins = self._get_insert_fn()
        sl = self._get_slice_fn()
        for b, (r, req) in enumerate(group):
            extra = ()
            if d_res:
                extra = (sl(d_res[0], jnp.int32(b)), d_res[1][b])
            self._state = ins(
                self._state, sl(fresh, jnp.int32(b)), real[b], tok0[b],
                jnp.int32(r), jnp.int32(req.max_new_tokens),
                jnp.float32(req.temperature), jnp.float32(req.top_p),
                jnp.int32(req.top_k), jnp.bool_(req.greedy),
                *extra,
            )
            self._rows[r] = _Row(rid=req.rid, budget=req.max_new_tokens,
                                 emitted=[], free=False)

    def _get_slice_fn(self):
        """[L, Ba, ...] batched fresh cache -> row b's [L, 1, ...]
        sub-cache (device-side; feeds the per-request insert)."""
        if self._slice_fn is None:
            def sl(c, b):
                cut = lambda a: (  # noqa: E731
                    None if a is None
                    else jax.lax.dynamic_slice_in_dim(a, b, 1, axis=1)
                )
                return llama_mod.KVCache(
                    k=cut(c.k), v=cut(c.v), length=c.length,
                    k_scale=cut(c.k_scale), v_scale=cut(c.v_scale),
                )
            self._slice_fn = jax.jit(sl)
        return self._slice_fn

    def _get_batch_prefill_fn(self, bucket: int, has_audio: bool, Ba: int):
        """Batched (Ba >= 2) variant of _get_prefill_fn: one program
        prefills Ba same-bucket prompts and samples their first tokens.
        Vector outputs (real [Ba], tok0 [Ba]); the fresh caches share one
        [L, Ba, ...] slab sliced per row at splice time."""
        keyfn = (bucket, has_audio, Ba)
        if keyfn in self._batch_prefill_fns:
            return self._batch_prefill_fns[keyfn]

        cfg = self.cfg
        cdt = self.compute_dtype
        eng = self
        tpax = "tp" if self.tp > 1 else None

        def prefill(W, ids, mask, feats, key, samp):
            frozen, trainable = W["frozen"], W.get("trainable")
            lora = W.get("lora")
            embeds, emask = build_prefix(
                frozen, trainable, cfg, ids, mask, feats,
                eng.audio_start_id, eng.audio_end_id, cdt,
            )
            P = embeds.shape[1]
            fresh = llama_mod.KVCache.zeros(
                cfg.llama, Ba, P, dtype=cdt, quantized=eng.kv_quant,
                kv_heads=cfg.llama.num_kv_heads // eng.tp,
            )
            Tk = fresh.k.shape[3]
            fm = jnp.pad(
                emask.astype(jnp.int32), ((0, 0), (0, Tk - P))
            ) if Tk != P else emask.astype(jnp.int32)
            _, fresh, hidden = llama_mod.llama_forward(
                frozen["llama"], cfg.llama, inputs_embeds=embeds,
                attention_mask=fm, kv_cache=fresh, lora=lora,
                compute_dtype=cdt, assume_fresh_cache=True,
                return_hidden=True, unembed_logits=False, tp_axis=tpax,
            )
            real = jnp.sum(emask, axis=1).astype(jnp.int32)  # [Ba]
            last = jnp.take_along_axis(
                hidden, (real - 1)[:, None, None], axis=1
            )  # [Ba, 1, D]
            logits = llama_mod.unembed_with_tp(
                frozen["llama"], cfg.llama, last, cdt, tpax
            )
            tok0 = sampling.sample_token_per_row(
                logits[:, 0], key, samp["temperature"],
                samp["top_p"], samp["top_k"], samp["greedy"],
            )  # [Ba]
            if eng.draft_params is None:
                return fresh, real, tok0
            d_fresh = llama_mod.KVCache.zeros(
                eng.draft_cfg, Ba, ids.shape[1], dtype=cdt,
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
            d_text = jnp.sum(mask, axis=1).astype(jnp.int32)  # [Ba]
            return fresh, real, tok0, d_fresh, d_text

        fn = self._wrap_prefill(prefill, has_feats=has_audio)
        self._batch_prefill_fns[keyfn] = fn
        return fn

    def _get_prefill_fn(self, bucket: int, has_audio: bool):
        """Admission = TWO programs: (a) this bucketed prefill +
        first-token sample (undonated; the same program shape as the
        benched one-shot generation prefill), and (b) a trivial donated
        pool-splice (_get_insert_fn). One combined program measured
        pathological remote-XLA compile times (30-70 min vs minutes for
        the parts) — the split keeps every program a proven shape at the
        cost of one device-side slab round-trip per admission (negligible
        vs decode)."""
        keyfn = (bucket, has_audio)
        if keyfn in self._prefill_fns:
            return self._prefill_fns[keyfn]

        cfg = self.cfg
        cdt = self.compute_dtype
        eng = self
        tpax = "tp" if self.tp > 1 else None

        def prefill(W, ids, mask, feats, key, samp):
            frozen, trainable = W["frozen"], W.get("trainable")
            lora = W.get("lora")
            embeds, emask = build_prefix(
                frozen, trainable, cfg, ids, mask, feats,
                eng.audio_start_id, eng.audio_end_id, cdt,
            )
            P = embeds.shape[1]
            fresh = llama_mod.KVCache.zeros(
                cfg.llama, 1, P, dtype=cdt, quantized=eng.kv_quant,
                kv_heads=cfg.llama.num_kv_heads // eng.tp,
            )
            Tk = fresh.k.shape[3]
            fm = jnp.pad(
                emask.astype(jnp.int32), ((0, 0), (0, Tk - P))
            ) if Tk != P else emask.astype(jnp.int32)
            _, fresh, hidden = llama_mod.llama_forward(
                frozen["llama"], cfg.llama, inputs_embeds=embeds,
                attention_mask=fm, kv_cache=fresh, lora=lora,
                compute_dtype=cdt, assume_fresh_cache=True,
                return_hidden=True, unembed_logits=False, tp_axis=tpax,
            )
            real = jnp.sum(emask, axis=1).astype(jnp.int32)[0]
            last = jax.lax.dynamic_slice_in_dim(
                hidden, real - 1, 1, axis=1
            )  # [1, 1, D]
            logits = llama_mod.unembed_with_tp(
                frozen["llama"], cfg.llama, last, cdt, tpax
            )
            tok0 = sampling.sample_token_per_row(
                logits[:, 0], key, samp["temperature"],
                samp["top_p"], samp["top_k"], samp["greedy"],
            )[0]
            if eng.draft_params is None:
                return fresh, real, tok0
            # draft prefill over the TEXT prompt only (audio conditioning
            # is target-side; the draft merely proposes — lossless either
            # way in greedy mode, acceptance rate is what audio affects).
            # The draft stays REPLICATED under tp (it is small).
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
            d_text = jnp.sum(mask, axis=1).astype(jnp.int32)[0]
            return fresh, real, tok0, d_fresh, d_text

        fn = self._wrap_prefill(prefill, has_feats=has_audio)
        self._prefill_fns[keyfn] = fn
        return fn

    def _get_suffix_fn(self, bucket: int, cap: int, d_cap: int = 0):
        """Prefix-cached admission prefill: embed ONLY the text suffix and
        block-append it at cache_offsets=prefix_len into a fresh cache
        pre-loaded with the registered prefix slab (llama_forward's
        divergent-timeline primitive, models/llama.py:325-). The prefix's
        encoder/projector/prefill FLOPs never re-run; RoPE positions and
        slot-causality come from the offset; padded suffix slots land past
        the final offset so the pool's slot-causal invariant excludes
        them. Speculative pools block-append the suffix into the draft's
        prefix slab the same way. Keyed by (suffix bucket, prefix cap,
        draft cap) — one compiled program per geometry."""
        keyfn = (bucket, cap, d_cap)
        if keyfn in self._suffix_fns:
            return self._suffix_fns[keyfn]

        cfg = self.cfg
        cdt = self.compute_dtype
        eng = self
        tpax = "tp" if self.tp > 1 else None

        def splice_fresh(pcache, lcfg, Sb, kv_heads=None):
            fresh = llama_mod.KVCache.zeros(
                lcfg, 1, pcache.k.shape[3] + Sb, dtype=cdt,
                quantized=eng.kv_quant, kv_heads=kv_heads,
            )

            def put(dst, src):
                if dst is None:
                    return None
                return jax.lax.dynamic_update_slice(
                    dst, src.astype(dst.dtype), (0,) * dst.ndim
                )

            return llama_mod.KVCache(
                k=put(fresh.k, pcache.k),
                v=put(fresh.v, pcache.v),
                length=fresh.length,
                k_scale=put(fresh.k_scale, pcache.k_scale),
                v_scale=put(fresh.v_scale, pcache.v_scale),
            )

        def sprefill(W, pcache, plen, *rest):
            frozen, lora = W["frozen"], W.get("lora")
            if eng.draft_params is not None:
                pdcache, pdlen, ids, mask, key, samp = rest
            else:
                ids, mask, key, samp = rest
            embeds = llama_mod.embed_tokens(frozen["llama"], ids, cdt)
            fresh = splice_fresh(
                pcache, cfg.llama, ids.shape[1],
                kv_heads=cfg.llama.num_kv_heads // eng.tp,
            )
            n = jnp.sum(mask, axis=1).astype(jnp.int32)[0]
            Tk = fresh.k.shape[3]
            # full-timeline key mask: prefix real slots + suffix real
            # slots (suffix K/V rows are appended at [plen, plen+n) by
            # this same forward; slot-causality handles intra-suffix
            # ordering and everything past plen+n)
            am = (jnp.arange(Tk)[None, :] < plen + n).astype(jnp.int32)
            _, fresh, hidden = llama_mod.llama_forward(
                frozen["llama"], cfg.llama, inputs_embeds=embeds,
                attention_mask=am, kv_cache=fresh,
                cache_offsets=jnp.reshape(plen, (1,)).astype(jnp.int32),
                lora=lora, compute_dtype=cdt,
                return_hidden=True, unembed_logits=False, tp_axis=tpax,
            )
            last = jax.lax.dynamic_slice_in_dim(hidden, n - 1, 1, axis=1)
            logits = llama_mod.unembed_with_tp(
                frozen["llama"], cfg.llama, last, cdt, tpax
            )
            tok0 = sampling.sample_token_per_row(
                logits[:, 0], key, samp["temperature"],
                samp["top_p"], samp["top_k"], samp["greedy"],
            )[0]
            if eng.draft_params is None:
                return fresh, plen + n, tok0
            d_fresh = splice_fresh(pdcache, eng.draft_cfg, ids.shape[1])
            dm = (
                jnp.arange(d_fresh.k.shape[3])[None, :] < pdlen + n
            ).astype(jnp.int32)
            _, d_fresh = llama_mod.llama_forward(
                W["draft"], eng.draft_cfg, input_ids=ids,
                attention_mask=dm, kv_cache=d_fresh,
                cache_offsets=jnp.reshape(pdlen, (1,)).astype(jnp.int32),
                compute_dtype=cdt,
            )
            return fresh, plen + n, tok0, d_fresh, pdlen + n

        W = self._W
        if self.tp <= 1:
            f = jax.jit(sprefill)
        else:
            from jax.sharding import PartitionSpec as P

            in_specs = [self._weight_specs(), self._fresh_spec(True), P()]
            out_specs = (self._fresh_spec(True), P(), P())
            if self.draft_params is not None:
                in_specs += [self._fresh_spec(False), P()]
                out_specs = out_specs + (self._fresh_spec(False), P())
            in_specs += [P(), P(), P(),
                         {"temperature": P(), "top_p": P(),
                          "top_k": P(), "greedy": P()}]  # ids, mask, key, samp
            f = jax.jit(jax.shard_map(
                sprefill, mesh=self.mesh, in_specs=tuple(in_specs),
                out_specs=out_specs, check_vma=False,
            ))
        fn = lambda *a: f(W, *a)  # noqa: E731
        self._suffix_fns[keyfn] = fn
        return fn

    def _get_insert_fn(self):
        """The donated pool-splice program (admission's second half) —
        ONE python callable for every fresh-slab geometry (jit retraces
        per shape; the splice body is shape-generic)."""
        if self._insert_fn is not None:
            return self._insert_fn

        eng = self

        def insert(state, fresh, real, tok0, row, max_new,
                   temp, top_p, top_k, greedy,
                   d_fresh=None, d_text=None):
            cache = state["cache"]
            if eng.mesh is None:
                loc, in_r = row, None
            else:
                # row is a GLOBAL pool index; this shard owns rows
                # [my0, my0 + local). Out-of-range shards re-write their
                # clamped row with its own current contents (cheap: one
                # slab read), keeping every shard's program identical.
                local = eng.rows // eng.mesh.shape[eng.dp_axis]
                my0 = jax.lax.axis_index(eng.dp_axis) * local
                loc = row - my0
                in_r = (loc >= 0) & (loc < local)
                loc = jnp.clip(loc, 0, local - 1)

            def put(pool, slab):
                if pool is None:
                    return None
                slab = slab.astype(pool.dtype)
                at = (0, loc) + (0,) * (pool.ndim - 2)
                if in_r is not None:
                    cur = jax.lax.dynamic_slice(pool, at, slab.shape)
                    slab = jnp.where(in_r, slab, cur)
                return jax.lax.dynamic_update_slice(pool, slab, at)

            cache = llama_mod.KVCache(
                k=put(cache.k, fresh.k),
                v=put(cache.v, fresh.v) if cache.v is not None else None,
                length=cache.length,
                k_scale=put(cache.k_scale, fresh.k_scale)
                if cache.k_scale is not None else None,
                v_scale=put(cache.v_scale, fresh.v_scale)
                if cache.v_scale is not None else None,
            )

            def one(a, v):
                v = jnp.reshape(v, (1,)).astype(a.dtype)
                if in_r is not None:
                    cur = jax.lax.dynamic_slice(a, (loc,), (1,))
                    v = jnp.where(in_r, v, cur)
                return jax.lax.dynamic_update_slice(a, v, (loc,))

            samp = state["samp"]
            out = {
                "cache": cache,
                "offsets": one(state["offsets"], real),
                "last_tok": one(state["last_tok"], tok0),
                "active": one(state["active"], True),
                "remaining": one(state["remaining"], max_new - 1),
                "samp": {
                    "temperature": one(samp["temperature"], temp),
                    "top_p": one(samp["top_p"], top_p),
                    "top_k": one(samp["top_k"], top_k),
                    "greedy": one(samp["greedy"], greedy),
                },
            }
            if d_fresh is not None:
                dc = state["d_cache"]
                out["d_cache"] = llama_mod.KVCache(
                    k=put(dc.k, d_fresh.k),
                    v=put(dc.v, d_fresh.v) if dc.v is not None else None,
                    length=dc.length,
                    k_scale=put(dc.k_scale, d_fresh.k_scale)
                    if dc.k_scale is not None else None,
                    v_scale=put(dc.v_scale, d_fresh.v_scale)
                    if dc.v_scale is not None else None,
                )
                out["d_offsets"] = one(state["d_offsets"], d_text)
            return out

        if eng.mesh is None:
            self._insert_fn = jax.jit(insert, donate_argnums=(0,))
        else:
            from jax.sharding import PartitionSpec as P

            sspec = eng._state_specs()
            in_specs = (sspec, eng._fresh_spec(True),
                        P(), P(), P(), P(), P(), P(), P(), P())
            if eng.draft_params is not None:
                # broadcast the draft slab + its real length alongside
                in_specs = in_specs + (eng._fresh_spec(False), P())
            self._insert_fn = jax.jit(
                jax.shard_map(
                    insert, mesh=eng.mesh,
                    in_specs=in_specs,
                    out_specs=sspec, check_vma=False,
                ),
                donate_argnums=(0,),
            )
        return self._insert_fn
