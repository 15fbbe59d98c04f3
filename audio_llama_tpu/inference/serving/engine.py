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

Sampling config (greedy/temperature/top_p/top_k) has engine-level DEFAULTS
and per-request overrides (submit(temperature=..., greedy=...)): the params
ride every program as per-row ARRAY arguments (ops/sampling.py
sample_token_per_row), so a pool mixing greedy and sampled requests still
runs one compiled chunk program — no retrace per config. Exception:
speculative pools compile the filter params into the draft-and-verify
accept rule and stay engine-level.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ...config import AudioLLMConfig
from ...models import llama as llama_mod, lora as lora_mod

from .admission import AdmissionMixin
from .decode import DecodeMixin
from .prefix import PrefixMixin
from .sharding import ShardingMixin
from .staging import StagingMixin
from .state import _Pending, _Prefix, _Row, _Staging, _check_tp_int4_layout


class ServingEngine(ShardingMixin, AdmissionMixin, StagingMixin,
                    PrefixMixin, DecodeMixin):
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
                from ...parallel import sharding as shd
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
            # per-row sampling params (written at admission; array args,
            # so mixed greedy/sampled pools share one compiled chunk)
            "samp": {
                "temperature": jnp.full((self.rows,), self.temperature,
                                        jnp.float32),
                "top_p": jnp.full((self.rows,), self.top_p, jnp.float32),
                "top_k": jnp.full((self.rows,), self.top_k, jnp.int32),
                "greedy": jnp.full((self.rows,), self.greedy, jnp.bool_),
            },
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
        temperature: Optional[float] = None,
        top_p: Optional[float] = None,
        top_k: Optional[int] = None,
        greedy: Optional[bool] = None,
    ) -> int:
        """Queue a request; returns its id. Tokens come back from run()/
        drain() as a dict rid -> generated ids (EOS included if hit).

        prefix: a register_prefix handle — input_ids are then the text
        SUFFIX continuing that prefix (audio, if any, lives in the
        prefix; audio_features here would be a second audio block).

        temperature/top_p/top_k/greedy: PER-REQUEST sampling overrides
        (None = the engine default). They ride every program as per-row
        ARRAY arguments, so a pool mixing greedy and sampled requests still
        runs one compiled chunk program — no retrace per config (the
        reference exposes per-call sampling params on generate, reference
        src/models/allm.py:263-270; this is the pool-level analog).
        Speculative pools (draft_params=) keep engine-level sampling: the
        draft-and-verify accept rule compiles the filter params into both
        model paths."""
        ids = np.asarray(input_ids, np.int32).reshape(-1)
        if audio_features is not None and self.trainable is None:
            raise ValueError("audio request on a text-only engine")
        overrides = (temperature, top_p, top_k, greedy)
        if self.draft_params is not None and any(
            o is not None for o in overrides
        ):
            raise ValueError(
                "per-request sampling params are not supported on "
                "speculative pools (draft_params=); run one engine per "
                "sampling config there"
            )
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
        # a per-request greedy=False alone switches the row to the engine's
        # stochastic defaults; explicit params refine further
        g = self.greedy if greedy is None else bool(greedy)
        self._queue.append(
            _Pending(rid, ids, None if audio_features is None
                     else np.asarray(audio_features), max_new_tokens,
                     prefix=prefix,
                     temperature=float(
                         self.temperature if temperature is None
                         else temperature),
                     top_p=float(self.top_p if top_p is None else top_p),
                     top_k=int(self.top_k if top_k is None else top_k),
                     greedy=g)
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
