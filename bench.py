"""Headline benchmark: audio-seconds encoded per second per chip.

North star (BASELINE.json): >= 50x real-time audio encoding per v5e chip.
The measured program is the full audio hot path of the framework — on-device
log-mel (ops/mel.py) -> whisper-large-v3-turbo encoder (32 layers, d=1280,
bf16, random-initialized ON DEVICE so no host transfer skews timing) ->
trainable projector — as ONE jitted XLA program, exactly what training and
inference run per batch.

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is the multiple of the 50x-real-time target.

Flags: --batch, --iters, --backend (default: whatever jax.devices() gives,
i.e. the real TPU under the driver; tests can pass --backend cpu --tiny).
"""

from __future__ import annotations

import argparse
import functools
import json
import sys
import time


def _debug_timing(label, n_small, d1, n_large, d2):
    print(
        f"[{label} timing] d_small({n_small})={d1:.3f}s "
        f"d_large({n_large})={d2:.3f}s",
        file=sys.stderr,
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--warmup", type=int, default=3)
    ap.add_argument("--backend", type=str, default=None)
    ap.add_argument(
        "--mode", type=str, default="encode",
        choices=["encode", "decode", "train", "serve"],
        help="encode: audio-sec/sec (headline); decode: KV-cached tokens/sec; "
             "train: full train-step tokens/sec + MFU; serve: continuous-"
             "batching engine tokens/sec on a mixed-length request stream",
    )
    ap.add_argument(
        "--tiny", action="store_true", help="toy dims (CI/CPU smoke run)"
    )
    ap.add_argument(
        "--int8_encoder", action="store_true",
        help="(now the default) W8A8 int8 encoder matmuls with SmoothQuant "
             "activation smoothing calibrated on the bench batch — 2x MXU "
             "peak, gated by tests/test_outlier_gate.py (WER + logit-KL "
             "under outlier-injected weights)",
    )
    ap.add_argument(
        "--bf16_encoder", action="store_true",
        help="encode mode: disable the default int8 encoder (the pre-"
             "round-4 headline path, kept for A/B)",
    )
    ap.add_argument(
        "--enc_algo", default="v3",
        help="encoder attention kernel algo for the int8 path: v3 (bf16 "
             "attention) | v3q (int8 QK+PV, SageAttention-family scheme) | "
             "twopass | bounded",
    )
    ap.add_argument(
        "--int8_weights", action="store_true",
        help="weight-only int8 frozen decoder in decode mode (halves the "
             "per-step HBM weight stream; see models/llama_int8.py)",
    )
    ap.add_argument(
        "--int4_weights", action="store_true",
        help="weight-only int4 (W4A16) frozen decoder in decode mode — "
             "Pallas dequant matmul kernel, halves the weight stream AGAIN "
             "vs int8 (see ops/int4_matmul.py; validate WER before serving)",
    )
    ap.add_argument(
        "--kv_quant", action="store_true",
        help="quantized KV cache in decode mode (halves cache HBM at int8; "
             "enables larger batches at 3B dims)",
    )
    ap.add_argument(
        "--rotate", action="store_true",
        help="decode mode: apply the exact QuaRot residual-stream rotation "
             "(models/llama_rotate.py) before weight quantization — "
             "measures the runtime cost of the two [*, D] @ [D, D] "
             "sandwich matmuls per step (the accuracy win is gated offline "
             "by experiments/int4_rotate_gate.py)",
    )
    ap.add_argument(
        "--kv_bits", type=int, default=8, choices=[8, 4],
        help="KV-cache precision with --kv_quant: int8 rows or nibble-"
             "packed int4 rows (quarters cache HBM, halves the decode "
             "cache-read stream vs int8; validate WER before serving)",
    )
    ap.add_argument(
        "--decode_impl", type=str, default="auto",
        choices=["auto", "decode_kernel", "decode_packed", "decode_mono"],
        help="decode-step attention kernel: double-buffered (decode_kernel, "
             "the auto default on TPU), head-packed chunked (decode_packed; "
             "ops/decode_attention_packed.py), or mono-grid (decode_mono; "
             "ops/decode_attention_mono.py, quantized caches only)",
    )
    ap.add_argument(
        "--serve_requests", type=int, default=0,
        help="serve mode: number of requests in the mixed stream (default "
             "64). The default stream saturates a 32-64 row pool; larger "
             "pools (rows >= 128) are tail-dominated with 64 requests — "
             "scale this with --batch to measure steady-state delivery.",
    )
    ap.add_argument(
        "--draft", action="store_true",
        help="serve mode: speculative pool with a random 1B-dims bf16 "
             "draft. Random draft+target means ~zero acceptance, so this "
             "measures the WORST-CASE speculative throughput (the cost "
             "side c_draft/c_verify of the speedup model; acceptance "
             "itself is measured offline on trained toy pairs — "
             "experiments/spec_acceptance.py).",
    )
    ap.add_argument(
        "--gamma", type=int, default=4,
        help="draft tokens per verify round with --draft",
    )
    ap.add_argument(
        "--prefill_rows", type=int, default=0,
        help="decode mode: prefill the pool in row-chunks of this size "
             "(one fori_loop program; loop-carry aliasing keeps the full-B "
             "cache in place). 0 = one-shot prefill. Required for batches "
             "whose one-shot 2014-token prefill exceeds HBM (B128 int4-KV "
             "OOMs at 20 GB one-shot; the decode pool itself fits ~11 GB).",
    )
    ap.add_argument(
        "--accum", type=int, default=1,
        help="grad-accumulation microbatches in train mode",
    )
    ap.add_argument(
        "--no_remat", action="store_true",
        help="disable decoder layer rematerialization in train mode",
    )
    ap.add_argument(
        "--loss_chunk", type=int, default=512,
        help="chunked cross-entropy chunk size in train mode",
    )
    ap.add_argument(
        "--text_only", action="store_true",
        help="train mode without the audio path (isolates the llama side "
             "when attributing batch-scaling behavior)",
    )
    ap.add_argument(
        "--exact_gelu", action="store_true",
        help="HF-exact erf GELU in the encoder (default: tanh approximation, "
             "the serving configuration — ~18%% faster, ~1e-3 activation "
             "deltas; see BASELINE.md)",
    )
    args = ap.parse_args()

    import os

    import jax

    if args.backend:
        jax.config.update("jax_platforms", args.backend)
    # Persistent compiled-executable cache: works through the axon remote-
    # compile tunnel (verified round 3), so multi-minute flagship compiles
    # survive the tunnel's occasional mid-compile broken pipes — a retry
    # re-uses every program that finished. Opt out with
    # JAX_COMPILATION_CACHE_DIR="".
    cache = os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")
    if cache:
        jax.config.update("jax_compilation_cache_dir", cache)

    if args.mode == "decode":
        return run_decode(args)
    if args.mode == "train":
        return run_train(args)
    if args.mode == "serve":
        return run_serve(args)

    import jax.numpy as jnp

    from audio_llama_tpu.config import AudioLLMConfig, MelConfig, WhisperConfig
    from audio_llama_tpu.models import projector as proj_mod
    from audio_llama_tpu.models import whisper as whisper_mod
    from audio_llama_tpu.ops import mel as mel_ops

    if args.tiny:
        wcfg = WhisperConfig.tiny()
        mcfg = MelConfig(num_mel_bins=80, max_audio_seconds=1.28)
    else:
        wcfg = WhisperConfig.large_v3_turbo()
        mcfg = MelConfig(num_mel_bins=128)
    if not args.exact_gelu:
        wcfg = wcfg.replace(gelu_approx=True)

    pcfg = AudioLLMConfig(whisper=wcfg, mel=mcfg).projector
    B = args.batch
    clip_seconds = mcfg.max_audio_seconds

    key = jax.random.PRNGKey(0)
    kw, kp, ka = jax.random.split(key, 3)

    # Init on device inside jit: no host->device weight transfer in the timing.
    wparams = jax.jit(
        lambda k: whisper_mod.init_params(wcfg, k, dtype=jnp.bfloat16)
    )(kw)
    pparams = jax.jit(lambda k: proj_mod.init_params(pcfg, k))(kp)
    audio = jax.random.normal(ka, (B, mcfg.max_samples), jnp.float32) * 0.1

    if not args.bf16_encoder:
        # DEFAULT since round 4: W8A8 encoder with SmoothQuant smoothing
        # (+17% measured at flagship dims, 1814 -> 2128 audio-s/s).
        # Calibration runs once on the bench batch, outside the timed loop;
        # accuracy is gated by tests/test_outlier_gate.py and the flagship-
        # dims error probe (experiments/int8_outlier_probe.py).
        from audio_llama_tpu.models import whisper_int8 as w8

        wparams = jax.jit(
            lambda wp, a: w8.quantize_encoder_smoothed(
                wp, wcfg, mel_ops.log_mel(a, mcfg)
            )
        )(wparams, audio)

        def encode_once(wparams, pparams, audio):
            mel = mel_ops.log_mel(audio, mcfg)
            enc = w8.encode_int8(
                wparams, wcfg, mel, jnp.bfloat16, attn_algo=args.enc_algo
            )
            return proj_mod.project(pparams, enc, jnp.bfloat16)
    else:
        def encode_once(wparams, pparams, audio):
            mel = mel_ops.log_mel(audio, mcfg)
            enc = whisper_mod.encode(wparams, wcfg, mel, jnp.bfloat16)
            return proj_mod.project(pparams, enc, jnp.bfloat16)

    @jax.jit
    def encode_loop(wparams, pparams, audio, n):
        # Iterations are chained by a data dependency (the audio is perturbed
        # by the previous output), so neither XLA nor any remote-execution
        # cache can elide or dedup them — the timing is n real encodes.
        def body(_, carry):
            audio, acc = carry
            out = encode_once(wparams, pparams, audio)
            bump = jnp.mean(out.astype(jnp.float32)) * 1e-6
            return (audio + bump, acc + bump)

        audio, acc = jax.lax.fori_loop(0, n, body, (audio, jnp.float32(0)))
        return acc

    # warmup (compile; n is traced so one executable serves all loop lengths)
    float(encode_loop(wparams, pparams, audio, args.warmup))

    # Some transports (the axon tunnel) make block_until_ready a no-op and add
    # a fixed dispatch latency; fetching the scalar result synchronizes, and
    # timing two loop lengths cancels the fixed overhead.
    n_small = max(1, args.iters // 10)
    if args.iters <= n_small:  # degenerate --iters values still measure
        args.iters = n_small + 1
    t0 = time.perf_counter()
    float(encode_loop(wparams, pparams, audio, n_small))
    dt_small = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(encode_loop(wparams, pparams, audio, args.iters))
    dt_large = time.perf_counter() - t0
    dt = max(dt_large - dt_small, 1e-9)

    audio_sec = B * clip_seconds * (args.iters - n_small)
    value = audio_sec / dt
    target = 50.0  # 50x real-time per chip (BASELINE.json north_star)
    print(
        json.dumps(
            {
                "metric": "audio_sec_encoded_per_sec_per_chip",
                "value": round(value, 2),
                "unit": "audio-sec/sec",
                "vs_baseline": round(value / target, 3),
            }
        )
    )


def run_train(args):
    """Full training-step throughput at flagship dims: mel -> whisper encode
    -> project -> splice -> 3B llama fwd+bwd (remat, chunked loss) -> AdamW on
    projector+LoRA. Reports decoder tokens/sec (the reference logs no
    throughput numbers at all; this is our end-to-end hot-loop metric)."""
    import time

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from audio_llama_tpu.config import AudioLLMConfig
    from audio_llama_tpu.models import allm
    from audio_llama_tpu.training import train_step as steps_mod

    if args.tiny:
        cfg = AudioLLMConfig.tiny()
        T = 16
    else:
        cfg = AudioLLMConfig()  # Llama-3.2-3B + whisper-large-v3-turbo dims
        T = 512
    B = args.batch
    vocab = cfg.llama.vocab_size
    sid, eid = vocab - 2, vocab - 1

    accum = max(1, args.accum)
    kf, kt, kb = jax.random.split(jax.random.PRNGKey(0), 3)
    frozen = jax.jit(lambda k: allm.init_frozen(cfg, k, dtype=jnp.bfloat16))(kf)
    trainable = jax.jit(lambda k: allm.init_trainable(cfg, k))(kt)

    def mk(key, shape, lo, hi):
        return jax.random.randint(key, shape, lo, hi)

    bshape = (accum, B) if accum > 1 else (B,)
    batch = allm.AudioLLMBatch(
        input_ids=mk(kb, (*bshape, T), 3, vocab - 8),
        attention_mask=jnp.ones((*bshape, T), jnp.int32),
        audio_features=None if args.text_only
        else jax.random.normal(kb, (*bshape, cfg.mel.max_samples)) * 0.1,
        labels=mk(kb, (*bshape, T), 3, vocab - 8),
    )
    optimizer = optax.chain(
        optax.clip_by_global_norm(2.0), optax.adamw(2e-5, weight_decay=0.01)
    )
    state = steps_mod.init_train_state(trainable, optimizer)
    step = steps_mod.make_train_step(
        cfg, optimizer, sid, eid, compute_dtype=jnp.bfloat16,
        accum_steps=accum,
        with_audio=not args.text_only,
        loss_chunk_size=0 if args.tiny else args.loss_chunk,
        remat=(not args.tiny) and not args.no_remat,
    )

    @jax.jit
    def run_n(state, frozen, batch, n):
        def body(_, carry):
            state, batch = carry
            state, metrics = step(state, frozen, batch)
            bump = metrics["loss"] * 1e-9
            if batch.audio_features is not None:
                batch = batch._replace(
                    audio_features=batch.audio_features
                    + bump.astype(batch.audio_features.dtype)
                )
            else:  # text-only: chain the dependency through the ids
                batch = batch._replace(
                    input_ids=jnp.minimum(
                        batch.input_ids + (bump > 1e30).astype(jnp.int32),
                        vocab - 1,
                    )
                )
            return (state, batch)

        state, _ = jax.lax.fori_loop(0, n, body, (state, batch))
        # Depend on the UPDATED WEIGHTS, not just the step counter — fetching
        # only state.step lets XLA dead-code-eliminate the entire train step.
        checksum = sum(
            jnp.sum(x.astype(jnp.float32)) for x in jax.tree_util.tree_leaves(
                state.trainable
            )
        )
        return checksum + state.step

    int(run_n(state, frozen, batch, 1))  # compile
    n_small, n_large = 2, max(args.iters, 6)
    t0 = time.perf_counter()
    int(run_n(state, frozen, batch, n_small))
    d1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    int(run_n(state, frozen, batch, n_large))
    d2 = time.perf_counter() - t0
    _debug_timing("train", n_small, d1, n_large, d2)
    dt = max(d2 - d1, 1e-9)
    steps_per_sec = (n_large - n_small) / dt
    audio_tok = 0 if args.text_only else cfg.audio_seq_len + 2
    tokens_per_micro = B * (T + audio_tok)
    tokens_per_step = tokens_per_micro * accum

    from audio_llama_tpu.training.train import _flops_per_step

    flops = _flops_per_step(
        cfg, tokens_per_micro,
        0 if args.text_only else B * cfg.audio_seq_len, accum,
    )
    peak = 197e12  # v5e bf16 peak
    print(
        json.dumps(
            {
                "metric": "train_decoder_tokens_per_sec",
                "value": round(steps_per_sec * tokens_per_step, 2),
                "unit": "tokens/sec",
                "vs_baseline": 0.0,  # reference logged no throughput numbers
                "mfu": round(steps_per_sec * flops / peak, 4),
                "batch": B, "accum": accum, "remat": not args.no_remat,
            }
        )
    )


def make_prefill_fns(cfg, B, max_len, kvq, compute_dtype, prefill_rows=0):
    """Build the jitted decode-pool prefill program(s): (one_shot, chunked).

    ``chunked`` is None unless prefill_rows > 0. Exposed at module level so
    tests can parity-pin the REAL jitted fori_loop path (traced chunk index,
    loop-carry cache aliasing) against the one-shot program — not a Python
    re-implementation of the chunking."""
    import jax
    import jax.numpy as jnp

    from audio_llama_tpu.models import llama as lm

    @jax.jit
    def prefill(params, ids):
        cache = lm.KVCache.zeros(
            cfg, B, max_len, dtype=compute_dtype, quantized=kvq
        )
        _, cache, hidden = lm.llama_forward(
            params, cfg, input_ids=ids, kv_cache=cache,
            compute_dtype=compute_dtype,
            # Match the production generation prefill (flash path); without
            # it the warmup materializes [B, H, P, total] attention logits.
            assume_fresh_cache=True,
            # unembed only the last position — full prefill logits are
            # [B, P, V] f32 (~15 GB at B16), see inference/generate.py
            return_hidden=True,
            unembed_logits=False,
        )
        logits = lm.unembed(params, cfg, hidden[:, -1:], compute_dtype)
        return jnp.argmax(logits[:, 0], axis=-1).astype(jnp.int32), cache

    prefill_chunked = None
    if prefill_rows:
        R = prefill_rows

        @jax.jit
        def prefill_chunked(params, ids):
            """Row-chunked prefill for pools whose one-shot [B, P] prefill
            exceeds HBM: the full-B cache rides the fori_loop carry (aliased
            in place by XLA) and each iteration prefills R rows into it via
            dynamic_update_slice on the batch axis. Same flash prefill +
            last-position unembed as the one-shot path."""
            cache = lm.KVCache.zeros(
                cfg, B, max_len, dtype=compute_dtype, quantized=kvq
            )
            ids_c = ids.reshape(B // R, R, ids.shape[1])

            def body(i, carry):
                cache, toks = carry
                small = lm.KVCache.zeros(
                    cfg, R, max_len, dtype=compute_dtype, quantized=kvq
                )
                _, small, hidden = lm.llama_forward(
                    params, cfg, input_ids=ids_c[i], kv_cache=small,
                    compute_dtype=compute_dtype, assume_fresh_cache=True,
                    return_hidden=True, unembed_logits=False,
                )
                logits = lm.unembed(params, cfg, hidden[:, -1:], compute_dtype)
                tok = jnp.argmax(logits[:, 0], axis=-1).astype(jnp.int32)

                def put(big, part):
                    return jax.lax.dynamic_update_slice_in_dim(
                        big, part, i * R, axis=1
                    )

                cache = cache._replace(
                    k=put(cache.k, small.k),
                    v=None if cache.v is None else put(cache.v, small.v),
                    k_scale=None if cache.k_scale is None
                    else put(cache.k_scale, small.k_scale),
                    v_scale=None if cache.v_scale is None
                    else put(cache.v_scale, small.v_scale),
                    length=small.length,
                )
                toks = jax.lax.dynamic_update_slice(toks, tok, (i * R,))
                return cache, toks

            cache, toks = jax.lax.fori_loop(
                0, B // R, body, (cache, jnp.zeros((B,), jnp.int32))
            )
            return toks, cache

    return prefill, prefill_chunked


def run_decode(args):
    """KV-cached autoregressive decode throughput on the flagship decoder
    (Llama-3.2-3B dims, bf16, random weights init'd on device): tokens/sec at
    batch B after a 2014-token multimodal-sized prefill. No reference number
    exists (BASELINE.md: 'measure, no reference number')."""
    import time

    import jax
    import jax.numpy as jnp

    from audio_llama_tpu.config import LlamaConfig
    from audio_llama_tpu.models import llama as lm

    if args.iters <= 0:  # degenerate --iters would make n_large == n_small
        args.iters = 1
    cfg = LlamaConfig.tiny(vocab_size=2048) if args.tiny else LlamaConfig.llama32_3b()
    B = args.batch
    prefill_len = 64 if args.tiny else 2014  # audio 1502 + text 512
    # The cache is DONATED to the decode program (without donation XLA
    # copies the whole cache input before the in-place loop updates — a
    # 7 GB HLO temp at B128 that OOMs; the copy was per-call constant so
    # removing it cancels out of the d2-d1 subtraction). Donation threads
    # one cache through all three calls, so size the timeline for their
    # cumulative appends: warmup 2 + n_small 8 + n_large (iters+8).
    max_len = prefill_len + 2 + 8 + (args.iters + 8) + 2

    def _maybe_rotate(tree, key):
        if not args.rotate:
            return tree
        from audio_llama_tpu.models import llama_rotate as rt

        return rt.rotate_llama(tree, cfg, jax.random.fold_in(key, 1))

    if args.int4_weights:
        import os as _os

        from audio_llama_tpu.models import llama_int4 as l4

        _fuse = _os.environ.get("INT4_FUSE", "1") == "1"  # A/B knob
        # pack format: obin wins at B1 (epilogue lo recovery; +6..45%
        # across sessions, tunnel-noise-dominated) and loses ~5% at B64 —
        # auto-pick by pool batch; INT4_FMT overrides
        _fmt = _os.environ.get("INT4_FMT") or ("obin" if B <= 32 else "pair")
        # tiny dims: hidden < the flagship scale-group depth
        _grp = min(128, cfg.hidden_size)
        params = jax.jit(
            lambda k: l4.quantize_llama_int4(
                _maybe_rotate(lm.init_params(cfg, k, dtype=jnp.bfloat16), k),
                fuse=_fuse, fmt=_fmt, group=_grp,
            )
        )(jax.random.PRNGKey(0))
    elif args.int8_weights:
        from audio_llama_tpu.models import llama_int8 as l8

        params = jax.jit(
            lambda k: l8.quantize_llama(
                _maybe_rotate(lm.init_params(cfg, k, dtype=jnp.bfloat16), k)
            )
        )(jax.random.PRNGKey(0))
    else:
        params = jax.jit(
            lambda k: _maybe_rotate(
                lm.init_params(cfg, k, dtype=jnp.bfloat16), k
            )
        )(jax.random.PRNGKey(0))
    ids = jax.random.randint(
        jax.random.PRNGKey(1), (B, prefill_len), 3, cfg.vocab_size - 8
    )

    kvq = (4 if args.kv_bits == 4 else True) if args.kv_quant else False

    prefill, prefill_chunked = make_prefill_fns(
        cfg, B, max_len, kvq, jnp.bfloat16, prefill_rows=args.prefill_rows
    )

    @functools.partial(jax.jit, donate_argnums=(2,))
    def decode(params, tok, cache, n):
        # fori_loop (not scan) so n stays a traced arg: one compile serves
        # every loop length — compiles through the tunnel cost minutes.
        def body(_, carry):
            tok, cache = carry
            logits, cache = lm.llama_forward(
                params, cfg, input_ids=tok[:, None], kv_cache=cache,
                compute_dtype=jnp.bfloat16, attn_impl=args.decode_impl,
            )
            nxt = jnp.argmax(logits[:, 0], axis=-1).astype(jnp.int32)
            return (nxt, cache)

        tok, cache = jax.lax.fori_loop(0, n, body, (tok, cache))
        return jnp.sum(tok), cache

    if args.prefill_rows:
        if B % args.prefill_rows:
            raise SystemExit("--prefill_rows must divide --batch")
        tok, cache = prefill_chunked(params, ids)
    else:
        tok, cache = prefill(params, ids)
    s, cache = decode(params, tok, cache, 2)  # compile (n stays traced)
    float(s)

    n_small, n_large = 8, args.iters + 8
    t0 = time.perf_counter()
    s, cache = decode(params, tok, cache, n_small)
    float(s)
    d1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    s, cache = decode(params, tok, cache, n_large)
    float(s)
    d2 = time.perf_counter() - t0
    _debug_timing("decode", n_small, d1, n_large, d2)
    dt = max(d2 - d1, 1e-9)
    toks_per_sec = B * (n_large - n_small) / dt
    print(
        json.dumps(
            {
                "metric": "decode_tokens_per_sec",
                "value": round(toks_per_sec, 2),
                "unit": "tokens/sec",
                "vs_baseline": 0.0,  # reference never measured decode speed
            }
        )
    )


def run_serve(args):
    """Continuous-batching serving throughput (inference/serving.py): a
    mixed prompt-length / mixed-budget request stream through the decode
    pool. Tokens/sec counts delivered (requested) tokens over the wall
    time of the drained pool — admission prefills, chunk sync latency, and
    tail idling included. The reference has no serving layer at all
    (SURVEY §1); no baseline number exists."""
    import time

    import jax
    import jax.numpy as jnp
    import numpy as np

    from audio_llama_tpu.config import AudioLLMConfig, LlamaConfig
    from audio_llama_tpu.models import llama as lm
    from audio_llama_tpu.inference.serving import ServingEngine

    tiny = args.tiny
    if tiny:
        cfg = AudioLLMConfig.tiny()
        lcfg = cfg.llama
        params = jax.jit(
            lambda k: lm.init_params(lcfg, k, dtype=jnp.float32)
        )(jax.random.PRNGKey(0))
        rows, buckets, max_len, chunk, n_req = 2, (8, 16), 64, 4, 6
        kvq = False
        cdt = jnp.float32
    else:
        cfg = AudioLLMConfig()
        lcfg = cfg.llama
        from audio_llama_tpu.models import llama_int4 as l4

        params = jax.jit(
            lambda k: l4.quantize_llama_int4(
                lm.init_params(lcfg, k, dtype=jnp.bfloat16)
            )
        )(jax.random.PRNGKey(0))
        rows, buckets, max_len, chunk, n_req = (
            args.batch if args.batch != 8 else 32, (256, 1024), 1312, 32, 64
        )
        kvq = 4
        cdt = jnp.bfloat16
    if args.serve_requests:
        n_req = args.serve_requests

    rng = np.random.default_rng(0)
    reqs = []
    for i in range(n_req):
        lo, hi = (2, buckets[0]) if i % 2 == 0 else (buckets[0], buckets[1])
        plen = int(rng.integers(max(lo, int(hi * 0.7)), hi))
        budget = (
            int(rng.integers(2, 7)) if tiny else int(rng.integers(32, 257))
        )
        reqs.append((
            rng.integers(3, lcfg.vocab_size - 8, (plen,)).astype(np.int32),
            budget,
        ))

    spec_kw = {}
    if args.draft:
        from audio_llama_tpu.config import LlamaConfig

        dcfg = (
            LlamaConfig.tiny(vocab_size=lcfg.vocab_size) if tiny
            else LlamaConfig.llama32_1b().replace(
                vocab_size=lcfg.vocab_size)
        )
        if tiny:
            dparams = jax.jit(
                lambda k: lm.init_params(dcfg, k, dtype=cdt)
            )(jax.random.PRNGKey(7))
        else:
            # the draft must match the pool's weight precision: a bf16 1B
            # draft streams MORE bytes per step (2.5 GB) than the int4 3B
            # target (1.5 GB) — measured 3.5x all-reject slowdown vs
            # the int4 draft's cost (BASELINE.md round-4 spec cost arms)
            from audio_llama_tpu.models import llama_int4 as l4d

            dparams = jax.jit(
                lambda k: l4d.quantize_llama_int4(
                    lm.init_params(dcfg, k, dtype=jnp.bfloat16)
                )
            )(jax.random.PRNGKey(7))
        spec_kw = dict(
            draft_params=dparams,
            draft_cfg=dcfg,
            gamma=args.gamma,
        )
    eng = ServingEngine(
        {"llama": params}, None, cfg, rows=rows, max_len=max_len,
        prefill_buckets=buckets, chunk_steps=chunk, kv_quant=kvq,
        compute_dtype=cdt, greedy=True, eos_id=-1, pad_id=0, **spec_kw,
    )
    # warm-up: compile each admit bucket + the chunk program
    for ids, _ in reqs[:2]:
        eng.submit(ids, max_new_tokens=2)
    eng.run()
    eng.reset()

    t0 = time.time()
    for ids, budget in reqs:
        eng.submit(ids, max_new_tokens=budget)
    out = eng.run()
    dt = time.time() - t0
    got = sum(len(v) for v in out.values())
    print(
        json.dumps(
            {
                "metric": "serve_tokens_per_sec",
                "value": round(got / dt, 2),
                "unit": "tokens/sec",
                "vs_baseline": 0.0,  # reference has no serving layer
            }
        )
    )


if __name__ == "__main__":
    main()
