"""Flagship-dims quality flight (round-5 VERDICT #6).

The closest-to-real validation this egress-blocked environment allows:
an OUTLIER-INJECTED flagship-shape model (Llama-3.2-3B + whisper-large-
v3-turbo dims, the models/outliers.py regime real checkpoints occupy) is
built on-device, round-tripped through the training checkpoint format,
and every quantized serving arm is gated with teacher-forced logit-KL at
REAL dims on the chip — proving (a) the full quality pipeline RUNS at
3B+turbo scale and (b) the toy-gate deltas (rotate+int4 < int4,
int8 << int4, smoothed-int8 encoder ~ bf16) hold at flagship dims.

Arms:
  ckpt        flagship trainable save/load round-trip (exact leaves)
  e2e_audio   full multimodal forward (30 s audio + text) bf16 — loss
  enc_int8    smoothed-int8 encoder: relative output error vs bf16 + the
              naive-int8 arm (the round-4 12-57% break, at real dims)
  kl_int8     W8A16 decoder KL (toy gate: 0.034)
  kl_int4     clipped-RTN W4A16 KL, no rotation (toy gate: 0.376)
  kl_int4_rot rotate+RTN W4A16 KL (toy gate: 0.197 — must beat kl_int4)

Teacher-forced KL uses a TEXT batch (the decoder arms quantize llama
only); the encoder arm is gated on encoder outputs directly, which is
where its quantization damage lives (attention is linear in v).

Run (TPU): nohup python -u experiments/flagship_quality_flight.py \
    > /tmp/flagship_flight.log 2>&1 &
CPU smoke: python experiments/flagship_quality_flight.py --tiny \
    --platform cpu

Reference evidence analog: the reference's only first-party quality
numbers are real-weight training artifacts (reference src/training.log);
BASELINE.json's north star is real-weight WER parity. This flight is the
stand-in until egress allows the real checkpoints (README one-command
path).
"""

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")

import jax
import jax.numpy as jnp
import numpy as np


def emit(**kw):
    print(json.dumps(kw), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default=None)
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--text_len", type=int, default=256)
    ap.add_argument("--skip", nargs="*", default=[],
                    help="arm names to skip")
    args = ap.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    jax.config.update(
        "jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"]
    )

    from audio_llama_tpu.config import AudioLLMConfig
    from audio_llama_tpu.eval.kl import batch_logit_kl
    from audio_llama_tpu.models import allm, outliers
    from audio_llama_tpu.models import llama_int4 as l4
    from audio_llama_tpu.models import llama_int8 as l8
    from audio_llama_tpu.models import llama_rotate as rt
    from audio_llama_tpu.models import whisper as wh
    from audio_llama_tpu.models import whisper_int8 as w8
    from audio_llama_tpu.ops import mel as mel_ops
    from audio_llama_tpu.training import checkpoint as ckpt_mod

    cfg = AudioLLMConfig.tiny() if args.tiny else AudioLLMConfig()
    cdt = jnp.float32 if args.tiny else jnp.bfloat16
    B, T = args.batch, (32 if args.tiny else args.text_len)
    vocab = cfg.llama.vocab_size
    sid, eid = vocab - 2, vocab - 1
    emit(arm="config", llama_hidden=cfg.llama.hidden_size,
         llama_layers=cfg.llama.num_layers, vocab=vocab,
         whisper_d=cfg.whisper.d_model, whisper_layers=cfg.whisper.num_layers)

    # --- on-device init + outlier injection (zero host weight transfers;
    # deterministic in the seeds, so the "checkpoint" is reconstructable
    # from metadata exactly like the toy-gate synth checkpoints) ---
    @jax.jit
    def build_frozen(key):
        fz = allm.init_frozen(cfg, key, dtype=cdt)
        fz["llama"] = outliers.inject_llama_outliers(
            fz["llama"], jax.random.PRNGKey(11), scale=20.0
        )
        fz["whisper"] = outliers.inject_whisper_outliers(
            fz["whisper"], jax.random.PRNGKey(12), scale=40.0
        )
        return fz

    t0 = time.time()
    frozen = build_frozen(jax.random.PRNGKey(0))
    trainable = jax.jit(
        lambda k: allm.init_trainable(cfg, k)
    )(jax.random.PRNGKey(1))
    jax.tree.map(lambda x: x.block_until_ready(), trainable)
    emit(arm="init", secs=round(time.time() - t0, 1))

    # --- arm: checkpoint round-trip at flagship dims ---
    if "ckpt" not in args.skip:
        t0 = time.time()
        with tempfile.TemporaryDirectory() as td:
            path = ckpt_mod.save_checkpoint(
                td, trainable=trainable, opt_state={}, step=1, epoch=0,
                model_cfg=cfg,
                args={"flight": "flagship", "outlier_seeds": [11, 12],
                      "init_seed": 0},
            )
            tr2, _, step, _ = ckpt_mod.load_checkpoint(
                path, trainable_template=jax.tree.map(np.asarray, trainable)
            )
        ok = all(
            np.array_equal(np.asarray(a), np.asarray(b))
            for a, b in zip(jax.tree.leaves(trainable), jax.tree.leaves(tr2))
        )
        emit(arm="ckpt", roundtrip_exact=bool(ok), step=step,
             secs=round(time.time() - t0, 1))
        assert ok

    # --- arm: end-to-end multimodal forward at flagship dims ---
    rng = np.random.RandomState(0)
    if "e2e_audio" not in args.skip:
        batch_a = allm.AudioLLMBatch(
            input_ids=jnp.asarray(rng.randint(3, vocab - 8, (B, T)), jnp.int32),
            attention_mask=jnp.ones((B, T), jnp.int32),
            audio_features=jnp.asarray(
                rng.randn(B, cfg.mel.max_samples).astype(np.float32) * 0.1
            ),
            labels=jnp.asarray(rng.randint(3, vocab - 8, (B, T)), jnp.int32),
        )

        @jax.jit
        def audio_loss(fz, tr, b):
            loss, _ = allm.forward(
                fz, tr, cfg, b, sid, eid, compute_dtype=cdt,
                loss_chunk_size=0 if args.tiny else 128,
            )
            return loss

        t0 = time.time()
        l0 = float(audio_loss(frozen, trainable, batch_a))
        emit(arm="e2e_audio", loss=round(l0, 4), finite=bool(np.isfinite(l0)),
             secs=round(time.time() - t0, 1))
        assert np.isfinite(l0)

    # --- arm: smoothed-int8 encoder at flagship dims (output error) ---
    if "enc_int8" not in args.skip:
        audio = jnp.asarray(
            rng.randn(B, cfg.mel.max_samples).astype(np.float32) * 0.1
        )
        calib_mel = jax.jit(
            lambda a: mel_ops.log_mel(a, cfg.mel)
        )(audio)

        # SPLIT compiles (round-5 lesson): the fused ref+int8 program was
        # one giant compile that the tunnel transport dropped mid-compile
        # on 4 consecutive attempts (Broken pipe at enc_err, r5s2/r5s3
        # logs) — the persistent cache never banks an unfinished program,
        # so retries could not converge. Three programs (bf16 ref, int8
        # encode+norm with the ref as an on-device ARG, and the shared
        # mel) each compile well under the drop window and bank
        # independently.
        @jax.jit
        def enc_ref(m):
            return wh.encode(
                frozen["whisper"], cfg.whisper, m, cdt
            ).astype(jnp.float32)

        ref_out = enc_ref(calib_mel)

        def enc_err(wq):
            @jax.jit
            def _e(m, ref):
                got = w8.encode_int8(
                    wq, cfg.whisper, m, cdt
                ).astype(jnp.float32)
                return jnp.linalg.norm(got - ref) / jnp.linalg.norm(ref)
            return float(_e(calib_mel, ref_out))

        t0 = time.time()
        w_naive = jax.jit(lambda p: w8.quantize_encoder(p))(frozen["whisper"])
        err_naive = enc_err(w_naive)
        del w_naive
        w_smooth = jax.jit(
            lambda p, m: w8.quantize_encoder_smoothed(p, cfg.whisper, m, compute_dtype=cdt)
        )(frozen["whisper"], calib_mel)
        err_smooth = enc_err(w_smooth)
        del w_smooth
        emit(arm="enc_int8", rel_err_naive=round(err_naive, 4),
             rel_err_smoothed=round(err_smooth, 4),
             secs=round(time.time() - t0, 1))

    # --- decoder KL arms (text batch; llama is what these arms quantize) ---
    batch_t = allm.AudioLLMBatch(
        input_ids=jnp.asarray(rng.randint(3, vocab - 8, (B, T)), jnp.int32),
        attention_mask=jnp.ones((B, T), jnp.int32),
        audio_features=None,
        labels=jnp.asarray(rng.randint(3, vocab - 8, (B, T)), jnp.int32),
    )

    def kl_arm(name, make_llama, trainable_test=None):
        t0 = time.time()
        fz_t = dict(frozen)
        fz_t["llama"] = make_llama()
        r = batch_logit_kl(
            cfg, frozen, fz_t, trainable, batch_t, sid, eid,
            compute_dtype=cdt, trainable_test=trainable_test,
        )
        del fz_t
        emit(arm=name, kl_mean=round(float(r["kl_mean"]), 4),
             kl_max=round(float(r["kl_max"]), 4),
             n_positions=int(r["n_positions"]),
             secs=round(time.time() - t0, 1))
        return r

    if "kl_int8" not in args.skip:
        kl_arm("kl_int8", lambda: jax.jit(l8.quantize_llama)(frozen["llama"]))

    grp = min(128, cfg.llama.hidden_size)
    if "kl_int4" not in args.skip:
        kl_arm(
            "kl_int4",
            lambda: jax.jit(
                lambda p: l4.quantize_llama_int4(p, group=grp)
            )(frozen["llama"]),
        )

    if "kl_int4_rot" not in args.skip:
        lo_rot, lora_rot = rt.rotate_llama(
            frozen["llama"], cfg.llama, jax.random.PRNGKey(42),
            lora=trainable.get("lora"),
        )
        tr_rot = dict(trainable)
        if lora_rot is not None:
            tr_rot["lora"] = lora_rot
        kl_arm(
            "kl_int4_rot",
            lambda: jax.jit(
                lambda p: l4.quantize_llama_int4(p, group=grp)
            )(lo_rot),
            trainable_test=tr_rot,
        )

    emit(arm="FLIGHT_DONE")


if __name__ == "__main__":
    main()
