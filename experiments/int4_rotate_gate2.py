"""Rotation gate, part 2: settle the clip default on rotated trees.

Part 1 measured clip HURTING rotated RTN (0.284 vs 0.197) while
GPTQ+clip won overall (0.125) — this disambiguates whether clip helps
GPTQ's error-feedback or was noise, and adds the damp sweep.

Run: nohup python -u experiments/int4_rotate_gate2.py > /tmp/int4_rotate_gate2.log 2>&1 &
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

from int4_gptq_gate import get_checkpoint  # noqa: E402


def main():
    from audio_llama_tpu.data.dataset import DatasetConfig
    from audio_llama_tpu.data.loader import create_dataloaders
    from audio_llama_tpu.eval.kl import batch_logit_kl
    from audio_llama_tpu.inference.cli import load_audio_llm
    from audio_llama_tpu.models import allm, outliers
    from audio_llama_tpu.models import llama as lm
    from audio_llama_tpu.models import llama_gptq as gq
    from audio_llama_tpu.models import llama_int4 as l4
    from audio_llama_tpu.models import llama_rotate as rt
    from audio_llama_tpu.models import projector as proj_mod

    ckpt, data_path, audio_dir, entries = get_checkpoint()
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

    lo = outliers.inject_llama_outliers(
        frozen["llama"], jax.random.PRNGKey(11), scale=20.0
    )
    fz_ref = dict(frozen)
    fz_ref["llama"] = lo

    lo_rot, lora_rot = rt.rotate_llama(
        lo, cfg.llama, jax.random.PRNGKey(42), lora=trainable["lora"]
    ) if "lora" in trainable else (
        rt.rotate_llama(lo, cfg.llama, jax.random.PRNGKey(42)), None
    )
    tr_rot = dict(trainable)
    if lora_rot is not None:
        tr_rot["lora"] = lora_rot

    def kl(fz_llama):
        fz = dict(fz_ref)
        fz["llama"] = fz_llama
        return batch_logit_kl(
            cfg, fz_ref, fz, trainable, batch, a_s, a_e,
            trainable_test=tr_rot,
        )

    # calibration Grams on the rotated tree (same recipe as part 1)
    def combined_of(b):
        enc = allm.process_audio_features(
            fz_ref, cfg, b.audio_features, jnp.float32
        )
        audio_embeds = proj_mod.project(
            trainable["projector"], enc, jnp.float32
        )
        return allm.combine_text_and_audio_embeddings(
            fz_ref, trainable, cfg, b.input_ids, b.attention_mask,
            audio_embeds, a_s, a_e, jnp.float32,
        )

    stats = None
    bb = batch
    for i in range(3):
        emb, msk = combined_of(bb)
        _, _, st = lm.llama_forward(
            lo_rot, cfg.llama, inputs_embeds=emb, attention_mask=msk,
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
    print(json.dumps({"calib": "done"}), flush=True)

    for name, quant in (
        ("rotate + GPTQ damp=0.01 NO clip",
         lambda: gq.quantize_llama_int4_gptq(
             lo_rot, stats, group=32, damp=0.01, clip_cands=None)),
        ("rotate + GPTQ damp=0.05 + clip",
         lambda: gq.quantize_llama_int4_gptq(
             lo_rot, stats, group=32, damp=0.05,
             clip_cands=l4.CLIP_CANDS)),
        ("rotate + RTN group=128 (flagship group)",
         lambda: l4.quantize_llama_int4(lo_rot, group=32 if
             cfg.llama.hidden_size % 128 else 128, clip=False)),
    ):
        r = kl(quant())
        print(json.dumps({"mode": name,
                          **{k: round(float(v), 4) for k, v in r.items()}}),
              flush=True)
    print(json.dumps({"done": True}), flush=True)


if __name__ == "__main__":
    main()
