"""Continuous-batching serving engine (static-shape, TPU-idiomatic).

The reference serves one request at a time through a CLI
(reference src/inference.py:175-220 — load, generate, print); it has no
serving layer at all (SURVEY §1 "explicitly absent layers"). This module is
the production-serving extension the TPU target demands: a fixed pool of
decode rows over ONE persistent KV cache, with requests admitted into free
rows as they arrive and retired on EOS — GPU-world "continuous batching"
(vLLM/Orca-style), restructured for XLA's static-shape compilation model:

- The pool is a static [rows, max_len] KV cache; admission, decode, and
  retirement never change any array shape, so the engine runs exactly
  `len(prefill buckets) (+audio variants) + 1` compiled programs total.
- Prompts prefill into a per-request fresh cache at a BUCKETED static
  length, and the resulting cache rows are spliced into the pool at the
  assigned row (one donated-jit program per bucket: prefill + splice +
  first-token sample, no host round-trip of cache slabs).
- Decode advances ALL rows one token per step with per-row cache offsets
  (models/llama.py cache_offsets; on quantized caches this runs the
  production mono decode kernels, which take a [B] offset vector). Rows
  are left-aligned single streams, so each row's RoPE position == its
  append offset, and slot-causal validity needs no timeline mask at all.
- Steps run in jit-compiled CHUNKS of `chunk_steps` (a lax.scan) between
  host syncs: through a remote-TPU tunnel a per-token host round-trip
  costs ~30 ms, so the engine amortizes scheduling over the chunk. Rows
  that hit EOS mid-chunk idle (flag-gated) until the next admission window
  — the static-shape price of chunking, bounded by chunk_steps.

Retired rows need no cache scrubbing: a new request overwrites slots
[0, P) at prefill and every decode append lands at its own offset, so any
stale slot is either overwritten or excluded by slot-causality (kpos <=
offset) before it can ever be attended.

- PREFIX CACHING: register_prefix() computes the KV of a shared prompt
  prefix (instruction template, or audio + instruction for multi-turn
  audio chat) ONCE; submit(prefix=handle) then prefills only the text
  suffix, block-appended at cache_offsets=prefix_len against the stored
  slab — the whisper encode + projector + prefix llama prefill are
  skipped per request (vLLM's prefix caching, restated over static
  shapes: one compiled suffix program per (suffix bucket, prefix cap)).

Sampling config (greedy/temperature/top_p/top_k) is engine-level — per-row
sampling params would retrace per combination; run one engine per config.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..config import AudioLLMConfig
from ..models import llama as llama_mod, lora as lora_mod
from ..ops import sampling
from .generate import build_prefix


@dataclass
class _Row:
    """Host-side bookkeeping for one pool row."""
    rid: int = -1
    budget: int = 0
    emitted: List[int] = field(default_factory=list)
    free: bool = True
    staging: bool = False  # reserved for a chunked prefill in progress


@dataclass
class _Staging:
    """A chunked-prefill admission in progress (prefill_chunk_tokens):
    the staging cache fills piece by piece across scheduling rounds while
    the pool keeps decoding; on the last piece it splices like any
    admission."""
    req: "_Pending"
    cache: object  # staging KVCache [L, 1, Hkv, comb_b, hd]
    embeds: object  # combined prompt embeds [1, Pb, D] (device)
    emask: object  # [1, Pb] int32 (device)
    total: int  # real slots STAGED here (suffix only for prefix admissions)
    written: int = 0  # slots appended so far
    tok0: object = None  # first sampled token (set by the last piece)
    embeds_bucket: int = 0  # TEXT bucket (draft prefill at completion)
    base: int = 0  # prefix real length (pieces append at base + i*c)
    d_pcache: object = None  # draft prefix slab (spec pools; captured at
    d_plen: int = 0  # staging start so eviction mid-stage is harmless)


@dataclass
class _Pending:
    rid: int
    input_ids: np.ndarray  # [T] int32
    audio_features: Optional[np.ndarray]  # [n_mels, F] or None
    max_new_tokens: int
    prefix: Optional[int] = None  # registered-prefix handle


@dataclass
class _Prefix:
    """A registered shared prompt prefix: its KV slab (computed once) plus
    the host bookkeeping admission needs. Speculative pools also store the
    draft model's slab over the prefix TEXT (audio stays target-only)."""
    cache: object  # llama KVCache [L, 1, Hkv, cap, hd] (+ scales)
    length: int  # real prompt slots (audio block + text)
    cap: int  # slab timeline (tile-rounded)
    ids: tuple = ()  # prefix TEXT token ids (auto-match key)
    has_audio: bool = False
    d_cache: object = None  # draft KVCache (speculative pools)
    d_length: int = 0  # real draft slots (text tokens)
    d_cap: int = 0


def _check_tp_int4_layout(frozen: dict, tp: int):
    """int4 trees must be pack-after-shard quantized for THIS tp
    (quantize_llama_int4(..., tp=tp, fuse=False) — models/llama_int4.py):
    canonical packing pairs output column j with j+N/2, so a tp shard of
    the packed dim would split the pairs (same check as
    make_tp_generate, inference/generate.py:241-271)."""
    lyr = frozen["llama"]["layers"]
    if isinstance(lyr.get("qkv_proj"), dict):
        raise ValueError(
            "fused int4 tree (quantize_llama_int4 fuse=True) is tp=1 "
            f"only; quantize with tp={tp}, fuse=False for tensor-parallel "
            "serving"
        )
    w = lyr.get("q_proj")
    if not (isinstance(w, dict) and "w_p" in w):
        return
    p = w["w_p"]
    if p.ndim != 4 or p.shape[2] != tp:
        got = p.shape[2] if p.ndim == 4 else 1
        raise ValueError(
            f"tensor-parallel serving (tp={tp}) needs an int4 tree "
            f"quantized with quantize_llama_int4(..., tp={tp}); this one "
            f"was packed for tp={got}"
        )


class ServingEngine:
    """Fixed-row continuous-batching decode pool over one KV cache.

    Args:
      frozen/trainable/cfg: the model triple (trainable may be None for a
        bare llama; audio requests then raise).
      rows: pool width (static decode batch; idle rows ride along).
      max_len: per-row timeline slots (admission requires
        prompt_len + max_new_tokens <= max_len).
      prefill_buckets: static prompt lengths compiled for admission; a
        prompt pads to the smallest bucket that fits its COMBINED
        (audio + text) embedding length.
      chunk_steps: decode steps per jitted chunk between host syncs.
      kv_quant: False/8/4 — pool cache precision (8/4 run the mono decode
        kernels on TPU; the serving configs).
      draft_params/draft_cfg/gamma: SPECULATIVE decoding inside the pool
        (draft-and-verify continuous batching): each chunk round drafts
        `gamma` tokens per row with the small model and verifies them in
        ONE multi-token target forward; rows accept divergent prefixes
        per round via the same per-row cache-offset primitive the plain
        pool uses (stale rejected slots are overwritten before they can
        be attended — slot-causality handles speculation natively).
        Greedy mode is lossless: token-exact vs the non-speculative pool
        regardless of the draft (tests/test_spec_serving.py). Admission
        additionally prefills the draft cache from the TEXT prompt (audio
        conditioning stays target-only, as in generate_speculative).
        chunk_steps then counts ROUNDS (1..gamma+1 tokens each). Composes
        with mesh= (draft cache rows shard with the pool rows) and with
        prefix caching (the draft's prefix slab is registered alongside).
      mesh/dp_axis: multi-chip serving, two composable axes.
        dp: shard the POOL ROWS — the decode chunk and the pool-splice
        run in shard_map with per-device local shapes (weights
        replicated, rows split — the make_dp_generate pattern, so the
        Pallas decode kernels keep working where GSPMD could not
        partition them); bucketed prefill stays a single whole-batch=1
        program whose outputs broadcast into the splice.
        tp (a 'tp' axis in the mesh, e.g. make_mesh(MeshConfig(tp=N))):
        shard the LLAMA WEIGHTS Megatron-style and the pool cache's HEAD
        axis — every program (prefill, suffix, piece, chunk, splice)
        takes the weights as shard_map args with the parallel/sharding
        specs and psums the row-parallel matmuls (the make_tp_generate
        pattern; serves models beyond one chip's HBM). Whisper/projector
        /draft stay replicated. int4 trees must be pack-after-shard
        (quantize_llama_int4(tp=N, fuse=False)).
        Greedy results are identical to the unsharded engine; stochastic
        sampling folds the dp shard index into the chunk key (never the
        tp index), so sampled streams differ from single-chip under dp>1
        (still independent rows).
      auto_prefix: transparently split text requests on the longest
        registered text-only prefix matching their head (register_prefix
        without explicit prefix= plumbing at submit).
      admit_batch: BATCHED ADMISSION — up to N consecutive queued
        requests sharing a prefill geometry (bucket + audio-ness, no
        prefix) admit through one B=N prefill program (one dispatch, one
        MXU-filling batch) and splice row by row. Greedy-exact vs
        single admission; stochastic streams differ (one sampling key
        per batch instead of per request). Default 1 (off).
      prefill_chunk_tokens: CHUNKED PREFILL — admissions fill a staging
        cache in pieces of this many tokens, at most one piece between
        decode chunks (round-robin across staged rows), bounding the
        decode stall any admission causes; the piece block-appends at
        cache_offsets like the prefix-cache suffix path, and the audio
        encode still runs once up front. None (default) = whole-prompt
        admission. Token-exact either way. Speculative pools compose
        (the small draft's prefill runs one-shot at the final piece),
        and so do prefix-cached admissions: the suffix stages in pieces
        appended at base=prefix_len into a slab pre-loaded with the
        registered prefix KV.
    """

    def __init__(
        self,
        frozen: dict,
        trainable: Optional[dict],
        cfg: AudioLLMConfig,
        *,
        rows: int = 8,
        max_len: int = 2048,
        prefill_buckets=(128, 256, 512, 1024),
        chunk_steps: int = 16,
        kv_quant=False,
        compute_dtype=jnp.bfloat16,
        greedy: bool = True,
        temperature: float = 0.7,
        top_p: float = 0.9,
        top_k: int = 0,
        eos_id: int = 2,
        pad_id: int = 0,
        audio_start_id: int = 0,
        audio_end_id: int = 0,
        attn_impl: str = "auto",
        seed: int = 0,
        mesh=None,
        dp_axis: str = "dp",
        draft_params: Optional[dict] = None,
        draft_cfg=None,
        gamma: int = 4,
        auto_prefix: bool = False,
        prefill_chunk_tokens: Optional[int] = None,
        admit_batch: int = 1,
    ):
        self.frozen = frozen
        self.trainable = trainable
        self.cfg = cfg
        self.rows = rows
        self.buckets = tuple(sorted(prefill_buckets))
        self.chunk_steps = chunk_steps
        self.kv_quant = kv_quant
        self.compute_dtype = compute_dtype
        self.greedy = greedy
        self.temperature = temperature
        self.top_p = top_p
        self.top_k = top_k
        self.eos_id = eos_id
        self.pad_id = pad_id
        self.audio_start_id = audio_start_id
        self.audio_end_id = audio_end_id
        self.attn_impl = attn_impl
        self.draft_params = draft_params
        self.draft_cfg = draft_cfg
        self.gamma = gamma
        self.auto_prefix = auto_prefix
        self.admit_batch = admit_batch
        if admit_batch < 1:
            raise ValueError("admit_batch must be >= 1")
        self.prefill_chunk_tokens = prefill_chunk_tokens
        if prefill_chunk_tokens is not None and prefill_chunk_tokens < 1:
            raise ValueError("prefill_chunk_tokens must be >= 1")
        if draft_params is not None:
            if draft_cfg is None:
                raise ValueError("draft_params needs draft_cfg")
            if draft_cfg.vocab_size != cfg.llama.vocab_size:
                raise ValueError("draft and target must share the vocabulary")
            if gamma < 1:
                raise ValueError("gamma must be >= 1")
        self.mesh = mesh
        self.dp_axis = dp_axis
        self.tp = 1
        if mesh is not None:
            if dp_axis not in mesh.axis_names:
                raise ValueError(
                    f"mesh must contain the '{dp_axis}' axis (size 1 is "
                    "fine for pure tensor-parallel serving)"
                )
            ndp = mesh.shape[dp_axis]
            self.tp = mesh.shape.get("tp", 1)
            if rows % ndp:
                raise ValueError(
                    f"rows={rows} must be a multiple of mesh "
                    f"{dp_axis}={ndp}"
                )
            for ax, n in mesh.shape.items():
                if ax not in (dp_axis, "tp") and n != 1:
                    raise ValueError(
                        "ServingEngine shards rows over the dp axis and "
                        f"weights over 'tp'; mesh axis {ax}={n} must be 1"
                    )
            if self.tp > 1:
                if (
                    cfg.llama.num_heads % self.tp
                    or cfg.llama.num_kv_heads % self.tp
                ):
                    raise ValueError(
                        f"tp={self.tp} must divide num_heads="
                        f"{cfg.llama.num_heads} and num_kv_heads="
                        f"{cfg.llama.num_kv_heads}"
                    )
                _check_tp_int4_layout(frozen, self.tp)
                # pre-place: llama Megatron-sharded, whisper/projector/
                # draft replicated (the make_tp_generate placement)
                from ..parallel import sharding as shd
                from jax.sharding import NamedSharding, PartitionSpec as P

                frozen = shd.shard_frozen_for_generation(mesh, frozen)
                self.frozen = frozen
                if trainable is not None:
                    trainable = shd.shard_trainable(mesh, trainable)
                    self.trainable = trainable
                if draft_params is not None:
                    rep = NamedSharding(mesh, P())
                    draft_params = jax.tree.map(
                        lambda x: jax.device_put(x, rep), draft_params
                    )
                    self.draft_params = draft_params
        self._key = jax.random.PRNGKey(seed)

        self._lora = None
        if trainable is not None and "lora" in trainable and cfg.lora is not None:
            self._lora = lora_mod.with_scaling(trainable["lora"], cfg.lora)
        # weights ride every program as an ARGUMENT (not a closure) so the
        # tensor-parallel shard_map programs can declare their Megatron
        # in_specs; non-tp programs get them replicated. Structure is
        # stable, so jit never retraces for it.
        self._W = {"frozen": self.frozen}
        if self.trainable is not None:
            self._W["trainable"] = self.trainable
        if self._lora is not None:
            self._W["lora"] = self._lora
        if self.draft_params is not None:
            self._W["draft"] = self.draft_params

        # sized arithmetically — allocating a throwaway pool cache here
        # would double peak HBM next to _zero_state()'s real one
        self.max_len = llama_mod.KVCache.rounded_len(max_len)
        self._state = self._zero_state()

        self._rows: List[_Row] = [_Row() for _ in range(rows)]
        self._queue: List[_Pending] = []
        self._results: Dict[int, List[int]] = {}
        # speculation telemetry: lifetime active verify rounds and tokens
        # they emitted; acceptance ~= (emitted - rounds) / (rounds * gamma)
        self.spec_rounds = 0
        self.spec_emitted = 0
        self.prefix_admits = 0  # lifetime prefix-cached admissions
        self.admit_sizes: List[int] = []  # per-admission group sizes
        self._audio_block_lens: Dict[tuple, int] = {}
        self._next_rid = 0
        self._prefixes: Dict[int, _Prefix] = {}
        self._next_pid = 0
        self._prefill_fns: Dict = {}  # (bucket, has_audio) -> jitted prefill
        self._batch_prefill_fns: Dict = {}  # + Ba>=2 (batched admission)
        self._slice_fn = None  # batched fresh slab -> one row's sub-cache
        self._suffix_fns: Dict = {}  # (bucket, prefix cap) -> jitted prefill
        self._insert_fn = None  # one pool-splice, retraced per slab shape
        self._chunk_fn = None
        # chunked prefill (prefill_chunk_tokens)
        self._staging_rows: Dict[int, _Staging] = {}  # row -> in-progress
        self._staging_rr = 0  # round-robin cursor over staged rows
        self._embed_fns: Dict = {}  # (bucket, has_audio) -> jitted embeds
        self._piece_fns: Dict = {}  # (Pb, cap) -> jitted piece append
        self._draft_fns: Dict = {}  # bucket -> draft-only prefill
        self._draft_sfx_fns: Dict = {}  # (bucket, d_cap) -> draft suffix
        self._stage_fns: Dict = {}  # (pcap, Pp) -> prefix staging slab

    # ------------------------------------------------------------------
    # row sharding (multi-chip pool)
    # ------------------------------------------------------------------

    def _weight_specs(self):
        """PartitionSpec pytree matching self._W. tp>1: llama weights get
        the Megatron column/row specs (parallel/sharding.py) and LoRA
        factors follow their target's output sharding; whisper, the
        projector, and the draft model replicate. tp==1: everything
        replicates (the dp pool keeps weights whole per device)."""
        from jax.sharding import PartitionSpec as P

        if self.tp <= 1:
            return jax.tree_util.tree_map(lambda _: P(), self._W)
        from ..parallel import sharding as shd

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
        (W, ids, mask, feats, key) -> (fresh, real, tok0[, d_fresh,
        d_text]). tp>1 wraps in shard_map with the Megatron weight specs
        (the make_tp_generate pattern) — each shard prefills its local
        heads/FFN columns and psums the row-parallel matmuls."""
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
                in_specs=(self._weight_specs(), P(), P(), P(), P()),
                out_specs=out_specs, check_vma=False,
            ))
        return lambda ids, mask, feats, key: f(W, ids, mask, feats, key)

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

    # ------------------------------------------------------------------
    # public API
    # ------------------------------------------------------------------

    def _zero_state(self):
        """Fresh pool device state: cache + per-row (offset, last token,
        active flag, remaining budget). offsets double as RoPE positions
        (left-aligned single streams). Speculative pools add the draft
        cache + its per-row offsets."""
        cache = llama_mod.KVCache.zeros(
            self.cfg.llama, self.rows, self.max_len,
            dtype=self.compute_dtype, quantized=self.kv_quant,
        )
        state = {
            "cache": cache,
            "offsets": jnp.zeros((self.rows,), jnp.int32),
            "last_tok": jnp.full((self.rows,), self.pad_id, jnp.int32),
            "active": jnp.zeros((self.rows,), jnp.bool_),
            "remaining": jnp.zeros((self.rows,), jnp.int32),
        }
        if self.draft_params is not None:
            state["d_cache"] = llama_mod.KVCache.zeros(
                self.draft_cfg, self.rows, self.max_len,
                dtype=self.compute_dtype, quantized=self.kv_quant,
            )
            state["d_offsets"] = jnp.zeros((self.rows,), jnp.int32)
        return self._place_state(state)

    def reset(self, seed: int = 0):
        """Clear pool state and host bookkeeping, keeping the compiled
        programs (benchmark warm-up / multi-tenant reuse)."""
        self._state = self._zero_state()
        self._rows = [_Row() for _ in range(self.rows)]
        self._queue = []
        self._results = {}
        self._staging_rows = {}
        self.spec_rounds = 0
        self.spec_emitted = 0
        self._key = jax.random.PRNGKey(seed)

    def submit(
        self,
        input_ids,
        audio_features=None,
        max_new_tokens: int = 64,
        prefix: Optional[int] = None,
    ) -> int:
        """Queue a request; returns its id. Tokens come back from run()/
        drain() as a dict rid -> generated ids (EOS included if hit).

        prefix: a register_prefix handle — input_ids are then the text
        SUFFIX continuing that prefix (audio, if any, lives in the
        prefix; audio_features here would be a second audio block)."""
        ids = np.asarray(input_ids, np.int32).reshape(-1)
        if audio_features is not None and self.trainable is None:
            raise ValueError("audio request on a text-only engine")
        if prefix is not None:
            if prefix not in self._prefixes:
                raise ValueError(f"unknown prefix handle {prefix}")
            if audio_features is not None:
                raise ValueError(
                    "audio_features with prefix=: register the audio as "
                    "part of the prefix instead"
                )
        elif self.auto_prefix and audio_features is None:
            prefix, ids = self._match_prefix(ids)
        rid = self._next_rid
        self._next_rid += 1
        self._queue.append(
            _Pending(rid, ids, None if audio_features is None
                     else np.asarray(audio_features), max_new_tokens,
                     prefix=prefix)
        )
        return rid

    def run(self, max_chunks: Optional[int] = None,
            progress=None) -> Dict[int, List[int]]:
        """Serve until queue and pool drain; returns all results.

        max_chunks guards against scheduling bugs (raises instead of
        spinning); progress(chunk_idx, n_active, n_queued) is called after
        each chunk (benchmark instrumentation)."""
        n = 0
        while self._queue or any(not r.free for r in self._rows):
            if max_chunks is not None and n >= max_chunks:
                raise RuntimeError(
                    f"run() exceeded {max_chunks} chunks with "
                    f"{len(self._queue)} queued and "
                    f"{sum(not r.free for r in self._rows)} live rows"
                )
            self.step_chunk()
            n += 1
            if progress is not None:
                progress(n, sum(not r.free for r in self._rows),
                         len(self._queue))
        return dict(self._results)

    def step_chunk(self):
        """One scheduling round: admit into free rows, advance chunked
        prefills by the round's token budget, then decode one jitted
        chunk and harvest its tokens."""
        self._admit_pending()
        self._advance_staging()
        if not any(not r.free and not r.staging for r in self._rows):
            return
        if self.draft_params is not None:
            self._harvest_spec(*self._decode_chunk_spec())
        else:
            self._harvest(*self._decode_chunk())
        self._retire_rows()

    def _harvest(self, emit, fire):
        emit = np.asarray(emit)  # [K, R]
        fire = np.asarray(fire)
        for r, row in enumerate(self._rows):
            if row.free:
                continue
            for s in range(emit.shape[0]):
                if not fire[s, r]:
                    continue
                tok = int(emit[s, r])
                row.emitted.append(tok)
                if tok == self.eos_id or len(row.emitted) >= row.budget:
                    break

    def _harvest_spec(self, emit, n_emit):
        emit = np.asarray(emit)  # [K, R, gamma+2] per-round token blocks
        n_emit = np.asarray(n_emit)  # [K, R]
        self.spec_rounds += int((n_emit > 0).sum())
        self.spec_emitted += int(n_emit.sum())
        for r, row in enumerate(self._rows):
            if row.free:
                continue
            stop = False
            for s in range(emit.shape[0]):
                for j in range(int(n_emit[s, r])):
                    tok = int(emit[s, r, j])
                    row.emitted.append(tok)
                    if (
                        tok == self.eos_id
                        or len(row.emitted) >= row.budget
                    ):
                        stop = True
                        break
                if stop:
                    break

    def _retire_rows(self):
        for r, row in enumerate(self._rows):
            if row.free:
                continue
            if (row.emitted and row.emitted[-1] == self.eos_id) or (
                len(row.emitted) >= row.budget
            ):
                self._results[row.rid] = row.emitted
                self._rows[r] = _Row()  # free the row

    # ------------------------------------------------------------------
    # admission
    # ------------------------------------------------------------------

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
        if req.prefix is not None:
            pfx = self._prefixes[req.prefix]
            fn = self._get_suffix_fn(bucket, pfx.cap, pfx.d_cap)
            args = [pfx.cache, jnp.int32(pfx.length)]
            if self.draft_params is not None:
                args += [pfx.d_cache, jnp.int32(pfx.d_length)]
            res = fn(*args, jnp.asarray(ids), jnp.asarray(mask), k)
            self.prefix_admits += 1
        else:
            has_audio = req.audio_features is not None
            fn = self._get_prefill_fn(bucket, has_audio)
            feats = (
                jnp.asarray(req.audio_features)[None] if has_audio else None
            )
            res = fn(jnp.asarray(ids), jnp.asarray(mask), feats, k)
        self.admit_sizes.append(1)
        self._state = self._get_insert_fn()(
            self._state, *res[:3], jnp.int32(r),
            jnp.int32(req.max_new_tokens), *res[3:],
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
        res = fn(jnp.asarray(ids), jnp.asarray(mask), feats, k)
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
                jnp.int32(r), jnp.int32(req.max_new_tokens), *extra,
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

        def prefill(W, ids, mask, feats, key):
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
            tok0 = eng._sample(logits[:, 0], key)  # [Ba]
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

    # ------------------------------------------------------------------
    # chunked prefill (prefill_chunk_tokens)
    # ------------------------------------------------------------------

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
            jnp.int32(st.base), k,
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

        def piece(W, cache, embeds, emask, i, base, key):
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
            tok0 = eng._sample(logits[:, 0], key)[0]
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
                              P(), P(), P(), P(), P()),
                    out_specs=(self._fresh_spec(True), P()),
                    check_vma=False,
                ),
                donate_argnums=(1,),
            )
        fn = lambda *a: f(W, *a)  # noqa: E731
        self._piece_fns[keyfn] = fn
        return fn

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
        fresh, real, _tok0, *d_res = fn(
            jnp.asarray(idsb), jnp.asarray(maskb),
            jnp.asarray(feats)[None] if has_audio else None,
            jax.random.PRNGKey(0),
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

        def prefill(W, ids, mask, feats, key):
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
            tok0 = eng._sample(logits[:, 0], key)[0]
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
                pdcache, pdlen, ids, mask, key = rest
            else:
                ids, mask, key = rest
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
            tok0 = eng._sample(logits[:, 0], key)[0]
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
            in_specs += [P(), P(), P()]  # ids, mask, key
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

            out = {
                "cache": cache,
                "offsets": one(state["offsets"], real),
                "last_tok": one(state["last_tok"], tok0),
                "active": one(state["active"], True),
                "remaining": one(state["remaining"], max_new - 1),
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
            in_specs = (sspec, eng._fresh_spec(True), P(), P(), P(), P())
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

    # ------------------------------------------------------------------
    # decode
    # ------------------------------------------------------------------

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
                    tok = eng._sample(logits[:, 0], k)
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
                    "remaining": remaining,
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
                    "remaining": remaining,
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
