"""GPTQ arm of the int4 outlier gate (continues int4_smooth_gate.py).

Same regime as tests/test_outlier_gate.py (synthetic speech, trained toy
checkpoint, outlier-injected llama, teacher-forced KL). Calibration stats
come from the ACTUAL audio-spliced inputs (combined embeds through the
trained projector) on the outlier-injected tree — exactly what serving
quantizes. Measured round-4 envelope to beat: RTN 0.657, clip 0.376,
smooth 0.365 (target < 0.2 per NEXT #6).

Caches the corpus + trained checkpoint in /tmp/int4gate_cache so arms
iterate without retraining.

Run: nohup python -u experiments/int4_gptq_gate.py > /tmp/int4_gptq_gate.log 2>&1 &
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

CACHE = "/tmp/int4gate_cache"


def get_checkpoint():
    from audio_llama_tpu.data import synth_speech as ss
    from audio_llama_tpu.training.train import parse_args, train

    marker = os.path.join(CACHE, "ckpt_path.txt")
    if os.path.exists(marker):
        with open(marker) as f:
            ckpt = f.read().strip()
        data_path = os.path.join(CACHE, "examples.json")
        audio_dir = CACHE
        with open(os.path.join(CACHE, "entries.json")) as f:
            entries = json.load(f)
        return ckpt, data_path, audio_dir, entries
    os.makedirs(CACHE, exist_ok=True)
    data_path, audio_dir, entries = ss.build_corpus(
        CACHE, n_utts=96, vocab_size=12, seed=0, fmt="flac"
    )
    with open(os.path.join(CACHE, "entries.json"), "w") as f:
        json.dump(entries, f)
    out = os.path.join(CACHE, "run")
    args = parse_args([
        "--data_path", data_path, "--audio_dir", audio_dir,
        "--output_dir", out,
        "--toy_model", "--tokenizer", "byte", "--toy_outliers", "20",
        "--batch_size", "8", "--eval_batch_size", "8",
        "--grad_accum_steps", "1",
        "--num_epochs", "80", "--max_steps", "650",
        "--learning_rate", "3e-3", "--warmup_steps", "10",
        "--val_split", "0.125",
        "--eval_steps", "0", "--save_steps", "0", "--log_steps", "100",
        "--num_workers", "2", "--no_tensorboard",
        "--compute_dtype", "float32", "--seed", "3",
    ])
    result = train(args)
    with open(marker, "w") as f:
        f.write(result["final_checkpoint"])
    return result["final_checkpoint"], data_path, audio_dir, entries


def main():
    from audio_llama_tpu.data.dataset import DatasetConfig
    from audio_llama_tpu.data.loader import create_dataloaders
    from audio_llama_tpu.eval.kl import batch_logit_kl
    from audio_llama_tpu.inference.cli import load_audio_llm
    from audio_llama_tpu.models import allm, outliers
    from audio_llama_tpu.models import llama as lm
    from audio_llama_tpu.models import llama_gptq as gq
    from audio_llama_tpu.models import llama_int4 as l4
    from audio_llama_tpu.models import lora as lora_mod
    from audio_llama_tpu.models import projector as proj_mod

    ckpt, data_path, audio_dir, entries = get_checkpoint()
    print(json.dumps({"checkpoint": ckpt}), flush=True)
    cfg, frozen, trainable, tk = load_audio_llm(ckpt, toy_model=True, seed=3)
    dl, _, _ = create_dataloaders(
        data_path, audio_dir, tk, batch_size=8, val_split=0.125,
        num_workers=0,
        dataset_config=DatasetConfig(
            max_audio_seconds=cfg.mel.max_audio_seconds, text_max_length=32
        ),
    )
    it = iter(dl)
    hb = next(it)
    batch = allm.AudioLLMBatch(
        input_ids=jnp.asarray(hb["input_ids"]),
        attention_mask=jnp.asarray(hb["attention_mask"]),
        audio_features=jnp.asarray(hb["audio"]),
        labels=jnp.asarray(hb["labels"]),
    )
    a_s = tk.token_to_id(cfg.audio_start_token)
    a_e = tk.token_to_id(cfg.audio_end_token)
    kl = lambda ref, fz: batch_logit_kl(  # noqa: E731
        cfg, ref, fz, trainable, batch, a_s, a_e
    )

    lo = outliers.inject_llama_outliers(
        frozen["llama"], jax.random.PRNGKey(11), scale=20.0
    )
    fz_ref = dict(frozen)
    fz_ref["llama"] = lo

    # ---- calibration: Grams over the audio-spliced combined embeds ------
    def combined_of(b):
        enc = allm.process_audio_features(
            fz_ref, cfg, b.audio_features, jnp.float32
        )
        audio_embeds = proj_mod.project(
            trainable["projector"], enc, jnp.float32
        )
        combined, combined_mask = allm.combine_text_and_audio_embeddings(
            fz_ref, trainable, cfg, b.input_ids, b.attention_mask,
            audio_embeds, a_s, a_e, jnp.float32,
        )
        return combined, combined_mask

    stats = None
    n_calib_batches = 3
    bb = batch
    for i in range(n_calib_batches):
        emb, msk = combined_of(bb)
        _, _, st = lm.llama_forward(
            lo, cfg.llama, inputs_embeds=emb, attention_mask=msk,
            compute_dtype=jnp.float32, attn_impl="xla",
            collect_quant_stats=("qkv", "o", "gateup", "down"),
        )
        stats = st if stats is None else jax.tree_util.tree_map(
            jnp.add, stats, st
        )
        try:
            hb = next(it)
        except StopIteration:
            break
        bb = allm.AudioLLMBatch(
            input_ids=jnp.asarray(hb["input_ids"]),
            attention_mask=jnp.asarray(hb["attention_mask"]),
            audio_features=jnp.asarray(hb["audio"]),
            labels=jnp.asarray(hb["labels"]),
        )
    print(json.dumps({"calib": "done",
                      "roles": sorted(stats.keys())}), flush=True)

    # ---- arms ------------------------------------------------------------
    for damp, cands in ((0.01, None), (0.01, l4.CLIP_CANDS),
                        (0.05, l4.CLIP_CANDS)):
        fz = dict(fz_ref)
        fz["llama"] = gq.quantize_llama_int4_gptq(
            lo, stats, group=32, damp=damp, clip_cands=cands,
        )
        r = kl(fz_ref, fz)
        print(json.dumps({
            "mode": f"int4 GPTQ damp={damp} clip={int(bool(cands))}",
            **{k: round(float(v), 4) for k, v in r.items()}}), flush=True)

    # reference arms re-measured in-session for comparability
    for smooth, clip in ((False, False), (False, True)):
        fz = dict(fz_ref)
        fz["llama"] = l4.quantize_llama_int4(
            lo, group=32, smooth=smooth, clip=clip
        )
        r = kl(fz_ref, fz)
        print(json.dumps({
            "mode": f"int4 smooth={int(smooth)} clip={int(clip)}",
            **{k: round(float(v), 4) for k, v in r.items()},
        }), flush=True)
    print(json.dumps({"done": True}), flush=True)


if __name__ == "__main__":
    main()
