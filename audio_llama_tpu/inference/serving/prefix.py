"""Prefix KV caching: register a shared prompt prefix once, admit
suffixes against the stored slab (+ auto-match and eviction)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ...models import llama as llama_mod
from ...ops import sampling
from ..generate import build_prefix

from .state import _Row, _Staging, _Pending, _Prefix


class PrefixMixin:
    def register_prefix(self, input_ids, audio_features=None) -> int:
        """Register a SHARED prompt prefix and return its handle.

        The prefix's KV (audio block + text — e.g. a fixed instruction
        template, or one audio clip for multi-turn "chat with your audio")
        is computed ONCE here; every later submit(prefix=handle) prefills
        only its text suffix against the stored slab, skipping the
        whisper encode + projector + prefix llama prefill per request.
        Prefix slabs are engine-lifetime device constants: reset() keeps
        them (they are independent of pool state).

        Speculative pools register the DRAFT model's prefix slab alongside
        (over the prefix text; the admission prefill program already
        returns both), so suffix admissions block-append into both caches.

        The reference regenerates the full prompt per request (reference
        src/inference.py:175-220); prefix reuse is serving-layer-only."""
        ids = np.asarray(input_ids, np.int32).reshape(-1)
        if ids.size == 0:
            raise ValueError("prefix prompt is empty")
        has_audio = audio_features is not None
        if has_audio and self.trainable is None:
            raise ValueError("audio prefix on a text-only engine")
        feats = np.asarray(audio_features) if has_audio else None
        blk = self._resolve_audio_len(feats.shape) if has_audio else None
        tb = self._pick_bucket(len(ids))
        if llama_mod.KVCache.rounded_len(
            self._combined_len(tb, blk)
        ) > self.max_len:
            raise ValueError("prefix does not fit the pool timeline")
        idsb = np.full((1, tb), self.pad_id, np.int32)
        maskb = np.zeros((1, tb), np.int32)
        idsb[0, : len(ids)] = ids
        maskb[0, : len(ids)] = 1
        fn = self._get_prefill_fn(tb, has_audio)
        # tok0 is discarded for prefixes; engine-default sampling params
        # keep the program shape identical to admission prefills
        samp = {
            "temperature": np.asarray([self.temperature], np.float32),
            "top_p": np.asarray([self.top_p], np.float32),
            "top_k": np.asarray([self.top_k], np.int32),
            "greedy": np.asarray([self.greedy], np.bool_),
        }
        fresh, real, _tok0, *d_res = fn(
            jnp.asarray(idsb), jnp.asarray(maskb),
            jnp.asarray(feats)[None] if has_audio else None,
            jax.random.PRNGKey(0), samp,
        )
        length = int(real)

        # trim the slabs to the real prefix (tile-rounded): a short prefix
        # registered through a large bucket must not carry the bucket's
        # slots into every admission splice for its lifetime
        def _trim(c, cap):
            if cap >= c.k.shape[3]:
                return c
            return jax.jit(
                lambda c: llama_mod.KVCache(
                    k=c.k[:, :, :, :cap],
                    v=None if c.v is None else c.v[:, :, :, :cap],
                    length=c.length,
                    k_scale=None if c.k_scale is None
                    else c.k_scale[..., :cap],
                    v_scale=None if c.v_scale is None
                    else c.v_scale[..., :cap],
                )
            )(c)

        cap = llama_mod.KVCache.rounded_len(length)
        pfx = _Prefix(cache=_trim(fresh, cap), length=length, cap=cap,
                      ids=tuple(int(t) for t in ids), has_audio=has_audio)
        if d_res:  # speculative pool: (d_fresh, d_text)
            d_fresh, d_text = d_res
            pfx.d_length = int(d_text)
            pfx.d_cap = llama_mod.KVCache.rounded_len(pfx.d_length)
            pfx.d_cache = _trim(d_fresh, pfx.d_cap)
        pid = self._next_pid
        self._next_pid += 1
        self._prefixes[pid] = pfx
        return pid

    def unregister_prefix(self, handle: int):
        """Drop a registered prefix (frees its device slabs once queued
        requests pinned to it drain — those admit normally; new
        submit(prefix=handle) calls are rejected)."""
        del self._prefixes[handle]

    def _match_prefix(self, ids: np.ndarray):
        """auto_prefix: transparently split a text prompt on the LONGEST
        registered text-only prefix matching its head (at least one
        suffix token must remain). Returns (pid or None, suffix ids)."""
        best, blen = None, 0
        for pid, p in self._prefixes.items():
            n = len(p.ids)
            if (
                not p.has_audio
                and n > blen
                and n < ids.size
                and tuple(int(t) for t in ids[:n]) == p.ids
            ):
                best, blen = pid, n
        return best, (ids[blen:] if best is not None else ids)
