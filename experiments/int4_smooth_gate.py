"""Measure the outlier-regime int4 KL envelope for the round-4 smoothing +
clipped-RTN upgrade (models/llama_int4.py smooth=/clip=).

Mirrors tests/test_outlier_gate.py::test_kl_gates_quantized_modes exactly
(same corpus, same trained checkpoint recipe, same outlier injection, same
teacher-forced KL) and sweeps the quantizer variants. The round-4 measured
envelope was: int8 0.034, int4-RTN 0.66 (vs 0.14 clean) — NEXT #6 says
KL < ~0.2 is the signal to flip the int4 decode default.

Run: nohup python -u experiments/int4_smooth_gate.py > /tmp/int4_gate.log 2>&1 &
"""

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402


def main():
    from audio_llama_tpu.data import synth_speech as ss
    from audio_llama_tpu.data.dataset import DatasetConfig
    from audio_llama_tpu.data.loader import create_dataloaders
    from audio_llama_tpu.eval.kl import batch_logit_kl
    from audio_llama_tpu.inference.cli import load_audio_llm
    from audio_llama_tpu.models import allm, outliers
    from audio_llama_tpu.models import llama_int4 as l4
    from audio_llama_tpu.models import llama_int8 as l8
    from audio_llama_tpu.training.train import parse_args, train

    root = tempfile.mkdtemp(prefix="int4gate")
    data_path, audio_dir, entries = ss.build_corpus(
        root, n_utts=96, vocab_size=12, seed=0, fmt="flac"
    )
    out = os.path.join(root, "run")
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
    print(json.dumps({"trained_steps": result["steps"]}), flush=True)

    cfg, frozen, trainable, tk = load_audio_llm(
        result["final_checkpoint"], toy_model=True, seed=3
    )
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

    fz = dict(fz_ref)
    fz["llama"] = l8.quantize_llama(lo)
    print(json.dumps({"mode": "int8", **{k: round(float(v), 4)
          for k, v in kl(fz_ref, fz).items()}}), flush=True)

    for smooth in (False, True):
        for clip in (False, True):
            fz = dict(fz_ref)
            fz["llama"] = l4.quantize_llama_int4(
                lo, group=32, smooth=smooth, clip=clip
            )
            r = kl(fz_ref, fz)
            print(json.dumps({
                "mode": f"int4 smooth={int(smooth)} clip={int(clip)}",
                **{k: round(float(v), 4) for k, v in r.items()},
            }), flush=True)

    # clean-weights (no outliers) reference points
    fz_clean_ref = dict(frozen)
    for smooth in (False, True):
        fz = dict(frozen)
        fz["llama"] = l4.quantize_llama_int4(
            frozen["llama"], group=32, smooth=smooth, clip=True
        )
        r = kl(fz_clean_ref, fz)
        print(json.dumps({
            "mode": f"int4 CLEAN smooth={int(smooth)} clip=1",
            **{k: round(float(v), 4) for k, v in r.items()},
        }), flush=True)
    print(json.dumps({"done": True}), flush=True)


if __name__ == "__main__":
    main()
