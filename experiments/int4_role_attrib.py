"""Attribute the residual int4 KL by slab role: quantize ONE role at a time
(others stay full-precision, via dequant-splice into the fp tree) and
measure the teacher-forced KL. Tells whether a mixed int4/int8 precision
tree can reach the < 0.2 default-flip bar (NEXT #6) and which role pays.

Run after experiments/int4_gptq_gate.py has cached its checkpoint.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

from experiments.int4_gptq_gate import CACHE, get_checkpoint  # noqa: E402


def main():
    from audio_llama_tpu.data.dataset import DatasetConfig
    from audio_llama_tpu.data.loader import create_dataloaders
    from audio_llama_tpu.eval.kl import batch_logit_kl
    from audio_llama_tpu.inference.cli import load_audio_llm
    from audio_llama_tpu.models import allm, outliers
    from audio_llama_tpu.models import llama_int4 as l4
    from audio_llama_tpu.models import llama_int8 as l8

    ckpt, data_path, audio_dir, entries = get_checkpoint()
    cfg, frozen, trainable, tk = load_audio_llm(ckpt, toy_model=True, seed=3)
    dl, _, _ = create_dataloaders(
        data_path, audio_dir, tk, batch_size=8, val_split=0.125,
        num_workers=0,
        dataset_config=DatasetConfig(
            max_audio_seconds=cfg.mel.max_audio_seconds, text_max_length=32
        ),
    )
    hb = next(iter(dl))
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

    # int4(clip) dequantized weights per linear, unfused names
    qt = l4.quantize_llama_int4(lo, group=32, fuse=False, clip=True)
    dq = l4.dequantize_llama_int4(qt)

    roles = {
        "qkv": ("q_proj", "k_proj", "v_proj"),
        "o": ("o_proj",),
        "gateup": ("gate_proj", "up_proj"),
        "down": ("down_proj",),
        "embed+head": (),  # int8 embed/lm_head alone
    }
    for role, names in roles.items():
        hy = dict(lo)
        hy_layers = dict(lo["layers"])
        for n in names:
            hy_layers[n] = dq["layers"][n]
        hy["layers"] = hy_layers
        if role == "embed+head":
            # int8 embed + lm_head (what every int4 tree also carries)
            q8 = l8.quantize_llama(lo)
            de = jnp.asarray(
                q8["embed"]["weight"], jnp.float32
            ) * q8["embed"]["scale"][:, None]
            hy["embed"] = {"weight": de}
            if "lm_head" in q8 and isinstance(q8["lm_head"], dict):
                hy["lm_head"] = (
                    q8["lm_head"]["w_q"].astype(jnp.float32)
                    * q8["lm_head"]["w_s"][None, :]
                )
        fz = dict(fz_ref)
        fz["llama"] = hy
        r = kl(fz_ref, fz)
        print(json.dumps({"role": role,
                          **{k: round(float(v), 4) for k, v in r.items()}}),
              flush=True)
    print(json.dumps({"done": True}), flush=True)


if __name__ == "__main__":
    main()
