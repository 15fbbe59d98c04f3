"""QuaRot-rotation arm of the int4 outlier gate (continues
int4_smooth_gate.py / int4_gptq_gate.py).

Same regime as tests/test_outlier_gate.py (synthetic speech, trained toy
checkpoint, outlier-injected llama, teacher-forced KL). Round-4 envelope:
RTN 0.657, clip 0.376, smooth 0.365, GPTQ+clip 0.336 — the diagonal family
is closed by the scaling argument (BASELINE.md), so this measures the
non-diagonal lever: the exact residual-stream rotation R1 + per-head v/o
rotation R2 (models/llama_rotate.py), alone and composed with clip and
with calibrated GPTQ (Grams collected on the ROTATED tree — llama_forward
rotates the stream before the linears, so collect_quant_stats sees rotated
inputs automatically). Flip bar: KL < 0.2 (NEXT #6).

Shares /tmp/int4gate_cache with the sibling gates so arms iterate without
retraining.

Run: nohup python -u experiments/int4_rotate_gate.py > /tmp/int4_rotate_gate.log 2>&1 &
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

from int4_gptq_gate import get_checkpoint  # noqa: E402  (shared cache/trainer)


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

    lo = outliers.inject_llama_outliers(
        frozen["llama"], jax.random.PRNGKey(11), scale=20.0
    )
    fz_ref = dict(frozen)
    fz_ref["llama"] = lo

    def kl(fz, tr_test=None):
        return batch_logit_kl(
            cfg, fz_ref, fz, trainable, batch, a_s, a_e,
            trainable_test=tr_test,
        )

    # ---- rotated base (exact transform of the outlier-injected tree) ----
    has_lora = "lora" in trainable
    if has_lora:
        lo_rot, lora_rot = rt.rotate_llama(
            lo, cfg.llama, jax.random.PRNGKey(42), lora=trainable["lora"]
        )
        tr_rot = dict(trainable)
        tr_rot["lora"] = lora_rot
    else:
        lo_rot = rt.rotate_llama(lo, cfg.llama, jax.random.PRNGKey(42))
        tr_rot = trainable
    # sanity: the unquantized rotated tree must be KL~0 vs the original
    fz = dict(fz_ref)
    fz["llama"] = lo_rot
    r = kl(fz, tr_rot)
    print(json.dumps({"mode": "rotated fp32 (sanity, expect ~0)",
                      **{k: round(float(v), 5) for k, v in r.items()}}),
          flush=True)

    # ---- calibration Grams on the ROTATED tree --------------------------
    def combined_of(tree, b):
        enc = allm.process_audio_features(
            tree, cfg, b.audio_features, jnp.float32
        )
        audio_embeds = proj_mod.project(
            trainable["projector"], enc, jnp.float32
        )
        combined, combined_mask = allm.combine_text_and_audio_embeddings(
            tree, trainable, cfg, b.input_ids, b.attention_mask,
            audio_embeds, a_s, a_e, jnp.float32,
        )
        return combined, combined_mask

    fz_rot = dict(fz_ref)
    fz_rot["llama"] = lo_rot
    stats = None
    bb = batch
    for i in range(3):
        emb, msk = combined_of(fz_rot, bb)
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
    print(json.dumps({"calib": "done (rotated tree)"}), flush=True)

    # ---- arms ------------------------------------------------------------
    arms = []
    for name, tree, tr, quant in (
        ("int4 clip (baseline)", lo, None,
         lambda t: l4.quantize_llama_int4(t, group=32, clip=True)),
        ("rotate R1+R2 + clip", lo_rot, tr_rot,
         lambda t: l4.quantize_llama_int4(t, group=32, clip=True)),
        ("rotate R1+R2 + RTN", lo_rot, tr_rot,
         lambda t: l4.quantize_llama_int4(t, group=32, clip=False)),
        ("rotate R1+R2 + GPTQ + clip", lo_rot, tr_rot,
         lambda t: gq.quantize_llama_int4_gptq(
             t, stats, group=32, damp=0.01, clip_cands=l4.CLIP_CANDS)),
    ):
        fz = dict(fz_ref)
        fz["llama"] = quant(tree)
        r = kl(fz, tr)
        arms.append((name, r))
        print(json.dumps({"mode": name,
                          **{k: round(float(v), 4) for k, v in r.items()}}),
              flush=True)
    print(json.dumps({"done": True}), flush=True)


if __name__ == "__main__":
    main()
