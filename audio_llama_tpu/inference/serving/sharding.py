"""Multi-chip pool sharding: PartitionSpec pytrees for weights, fresh
slabs, and pool state, plus the shard_map prefill wrapper (the
make_dp_generate / make_tp_generate patterns restated for the pool)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ...models import llama as llama_mod
from ...ops import sampling
from ..generate import build_prefix

from .state import _Row, _Staging, _Pending, _Prefix


class ShardingMixin:
    def _weight_specs(self):
        """PartitionSpec pytree matching self._W. tp>1: llama weights get
        the Megatron column/row specs (parallel/sharding.py) and LoRA
        factors follow their target's output sharding; whisper, the
        projector, and the draft model replicate. tp==1: everything
        replicates (the dp pool keeps weights whole per device)."""
        from jax.sharding import PartitionSpec as P

        if self.tp <= 1:
            return jax.tree_util.tree_map(lambda _: P(), self._W)
        from ...parallel import sharding as shd

        specs = {
            "frozen": {
                "llama": shd.llama_specs(self._W["frozen"]["llama"]),
                "whisper": jax.tree_util.tree_map(
                    lambda _: P(), self._W["frozen"].get("whisper", {})
                ),
            }
        }
        if "whisper" not in self._W["frozen"]:
            specs["frozen"].pop("whisper")
        if "trainable" in self._W:
            specs["trainable"] = shd.trainable_specs(self._W["trainable"])
        if "lora" in self._W:
            # with_scaling wraps trainable['lora']: spec through the same
            # path logic by re-wrapping (paths must contain 'lora')
            specs["lora"] = shd.trainable_specs(
                {"lora": {"layers": self._W["lora"]["layers"]}}
            )["lora"] | {"scaling": P()}
        if "draft" in self._W:
            specs["draft"] = jax.tree_util.tree_map(
                lambda _: P(), self._W["draft"]
            )
        return specs

    def _fresh_spec(self, tp_heads: bool):
        """PartitionSpec for a fresh/staging/prefix KVCache slab: batch=1
        replicated; the TARGET's head axis shards over tp (the draft's
        stays whole — replicated model)."""
        from jax.sharding import PartitionSpec as P

        q = self.kv_quant
        h = "tp" if (tp_heads and self.tp > 1) else None
        s = P(None, None, h)
        return llama_mod.KVCache(
            k=s, v=None if q == 4 else s, length=P(),
            k_scale=s if q else None, v_scale=s if q else None,
        )

    def _wrap_prefill(self, body, has_feats: bool):
        """Bind the weights bundle and jit an admission-prefill body
        (W, ids, mask, feats, key, samp) -> (fresh, real, tok0[, d_fresh,
        d_text]). samp is the per-request sampling-param dict (array
        args — no retrace per config). tp>1 wraps in shard_map with the
        Megatron weight specs (the make_tp_generate pattern) — each shard
        prefills its local heads/FFN columns and psums the row-parallel
        matmuls."""
        W = self._W
        if self.tp <= 1:
            f = jax.jit(body)
        else:
            from jax.sharding import PartitionSpec as P

            out_specs = (self._fresh_spec(True), P(), P())
            if self.draft_params is not None:
                out_specs = out_specs + (self._fresh_spec(False), P())
            f = jax.jit(jax.shard_map(
                body, mesh=self.mesh,
                in_specs=(self._weight_specs(), P(), P(), P(), P(),
                          {"temperature": P(), "top_p": P(), "top_k": P(),
                           "greedy": P()}),
                out_specs=out_specs, check_vma=False,
            ))
        return lambda ids, mask, feats, key, samp: f(
            W, ids, mask, feats, key, samp)

    def _state_specs(self, state=None):
        """PartitionSpec pytree for the pool state: cache slabs shard
        their batch axis (axis 1) over dp and the TARGET cache's head
        axis (axis 2) over tp; per-row vectors shard axis 0 over dp; the
        cache length scalar replicates. The draft cache (speculative
        pools) keeps whole heads — the draft model is replicated."""
        from jax.sharding import PartitionSpec as P

        dp = self.dp_axis
        st = self._state if state is None else state

        def cache_spec(c, tp_heads: bool):
            h = "tp" if (tp_heads and self.tp > 1) else None
            slab = lambda a, d=None: (  # noqa: E731
                None if a is None else P(None, dp, h)
            )
            return llama_mod.KVCache(
                k=slab(c.k), v=slab(c.v), length=P(),
                k_scale=slab(c.k_scale), v_scale=slab(c.v_scale),
            )

        specs = {
            "cache": cache_spec(st["cache"], True),
            "offsets": P(dp),
            "last_tok": P(dp),
            "active": P(dp),
            "remaining": P(dp),
            "samp": {k: P(dp) for k in st["samp"]},
        }
        if "d_cache" in st:  # speculative pool: draft rows shard alike
            specs["d_cache"] = cache_spec(st["d_cache"], False)
            specs["d_offsets"] = P(dp)
        return specs

    def _place_state(self, state):
        if self.mesh is None:
            return state
        from jax.sharding import NamedSharding

        specs = self._state_specs(state)
        # None leaves (e.g. KVCache.v in int4 mode) are empty subtrees in
        # both pytrees, so tree.map never sees them.
        return jax.tree.map(
            lambda a, s: jax.device_put(a, NamedSharding(self.mesh, s)),
            state, specs,
        )
