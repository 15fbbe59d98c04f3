"""Offline speculative-decoding acceptance measurement (VERDICT r3 #8).

Real-weight drafts are egress-blocked, so this measures acceptance on the
strongest offline pair available: the synthetic-speech-trained toy pipeline
as TARGET, and its own LoRA-merged text llama as DRAFT — a draft that knows
the target's text statistics (pseudo-word byte structure) but not the
audio, exactly the information asymmetry a real 1B text draft has against a
3B audio target. A random-init draft provides the acceptance floor.

Per (draft, gamma): run the speculative serving pool greedily over the eval
clips and read the engine telemetry —
  acceptance  = (emitted - rounds) / (rounds * gamma)
  tokens/round = emitted / rounds   (the decode-step multiplier)
Greedy speculation is lossless (tests/test_spec_serving.py), so WER is
unchanged by construction; acceptance is the whole story.

Cost model to combine with TPU timings (bench.py --mode serve --draft):
  speedup(a) = (1 + a*gamma) / (gamma*c_draft + c_verify)
with c_* in units of the plain decode step. The toy acceptance below gives
the operating point; the c_* come from the flagship bench arms.

Run: python experiments/spec_acceptance.py --platform cpu
     [--checkpoint DIR --data_path J --audio_dir D] to reuse a trained run.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _train_text_draft(cfg, tk, entries, a_s, a_e, steps=500, lr=3e-3):
    """Train a tiny llama as a TEXT LM over (prompt + transcript) byte
    sequences — the draft's decode-time context in the pool is exactly
    prompt tokens + emitted transcript tokens."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from audio_llama_tpu.models import llama as llama_mod

    dcfg = cfg.llama
    rows = []
    for e in entries:
        pi, _ = tk.encode(e["text"])
        ri, _ = tk.encode(e["response"], add_bos=False, add_eos=True)
        rows.append(list(pi) + list(ri))
    T = max(len(r) for r in rows)
    ids = np.full((len(rows), T), tk.pad_id, np.int32)
    msk = np.zeros((len(rows), T), np.int32)
    for i, r in enumerate(rows):
        ids[i, : len(r)] = r
        msk[i, : len(r)] = 1
    ids, msk = jnp.asarray(ids), jnp.asarray(msk)

    params = llama_mod.init_params(dcfg, jax.random.PRNGKey(123),
                                   jnp.float32)
    opt = optax.adamw(lr, weight_decay=0.01)
    ost = opt.init(params)

    def loss_fn(p):
        logits, _ = llama_mod.llama_forward(
            p, dcfg, input_ids=ids, attention_mask=msk,
            compute_dtype=jnp.float32,
        )
        lp = jax.nn.log_softmax(logits[:, :-1].astype(jnp.float32), -1)
        tgt = ids[:, 1:]
        nll = -jnp.take_along_axis(lp, tgt[..., None], -1)[..., 0]
        w = msk[:, 1:].astype(jnp.float32)
        return jnp.sum(nll * w) / jnp.maximum(jnp.sum(w), 1.0)

    @jax.jit
    def step(p, o):
        l, g = jax.value_and_grad(loss_fn)(p)
        u, o = opt.update(g, o, p)
        return optax.apply_updates(p, u), o, l

    for i in range(steps):
        params, ost, l = step(params, ost)
        if i % 100 == 0:
            print(f"# draft LM step {i} loss {float(l):.4f}", flush=True)
    print(f"# draft LM final loss {float(l):.4f}", flush=True)
    return params


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default=None)
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--data_path", default=None)
    ap.add_argument("--audio_dir", default=None)
    ap.add_argument("--steps", type=int, default=650)
    ap.add_argument("--gammas", type=int, nargs="*", default=[2, 4, 8])
    ap.add_argument("--n_eval", type=int, default=24)
    ap.add_argument("--max_new", type=int, default=12)
    args = ap.parse_args()
    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    import numpy as np

    from audio_llama_tpu.data import synth_speech as ss
    from audio_llama_tpu.inference.cli import load_audio_llm, process_audio
    from audio_llama_tpu.inference.serving import ServingEngine
    from audio_llama_tpu.models import lora as lora_mod

    if args.checkpoint is None:
        root = tempfile.mkdtemp(prefix="specacc_")
        data_path, audio_dir, entries = ss.build_corpus(
            root, n_utts=96, vocab_size=12, seed=0, fmt="flac"
        )
        from audio_llama_tpu.training.train import parse_args, train

        targs = parse_args([
            "--data_path", data_path, "--audio_dir", audio_dir,
            "--output_dir", os.path.join(root, "run"),
            "--toy_model", "--tokenizer", "byte",
            "--batch_size", "8", "--eval_batch_size", "8",
            "--grad_accum_steps", "1",
            "--num_epochs", "80", "--max_steps", str(args.steps),
            "--learning_rate", "3e-3", "--warmup_steps", "10",
            "--val_split", "0.125", "--eval_steps", "0", "--save_steps", "0",
            "--log_steps", "100", "--num_workers", "2", "--no_tensorboard",
            "--compute_dtype", "float32", "--seed", "3",
        ] + (["--platform", args.platform] if args.platform else []))
        ckpt = train(targs)["final_checkpoint"]
    else:
        ckpt, data_path, audio_dir = (
            args.checkpoint, args.data_path, args.audio_dir
        )
        entries = json.load(open(data_path))

    import jax.numpy as jnp

    cfg, frozen, trainable, tk = load_audio_llm(ckpt, toy_model=True, seed=3)
    a_s = tk.token_to_id(cfg.audio_start_token)
    a_e = tk.token_to_id(cfg.audio_end_token)

    # drafts, strongest to weakest:
    #   trained_text_draft — a tiny llama trained AS A TEXT LM on the
    #     corpus (prompt + transcript) byte sequences: the realistic analog
    #     of a 1B text draft (knows the transcript language, not the audio);
    #   merged_lora_draft — the target's own LoRA-merged text path (was
    #     measured ~0 acceptance: the text path never trained as a
    #     transcript LM, so it predicts nothing useful);
    #   random_draft — the floor.
    scaling = cfg.lora.alpha / cfg.lora.rank if cfg.lora else 1.0
    merged = lora_mod.merge_into_llama(
        frozen["llama"], trainable["lora"], scaling=scaling
    )
    from audio_llama_tpu.models import llama as llama_mod

    rnd = llama_mod.init_params(
        cfg.llama, jax.random.PRNGKey(99), dtype=jnp.float32
    )
    trained_draft = _train_text_draft(cfg, tk, entries, a_s, a_e)
    ev = entries[: args.n_eval]
    reqs = []
    for e in ev:
        ids, _ = tk.encode(e["text"])
        wav = process_audio(os.path.join(audio_dir, e["audio_paths"]),
                            cfg.mel)[0]
        reqs.append((np.asarray(ids, np.int32), wav))

    def run_pool(draft, gamma):
        eng = ServingEngine(
            frozen, trainable, cfg, rows=4, max_len=256,
            prefill_buckets=(16, 32), chunk_steps=4,
            compute_dtype=jnp.float32, greedy=True,
            eos_id=tk.eos_id, pad_id=tk.pad_id,
            audio_start_id=a_s, audio_end_id=a_e,
            draft_params=draft, draft_cfg=cfg.llama if draft is not None
            else None, gamma=gamma,
        )
        for ids, wav in reqs:
            eng.submit(ids, audio_features=wav, max_new_tokens=args.max_new)
        out = eng.run(max_chunks=20000)
        total = sum(len(v) for v in out.values())
        acc = (
            (eng.spec_emitted - eng.spec_rounds)
            / max(eng.spec_rounds * gamma, 1)
        )
        return {
            "gamma": gamma,
            "acceptance": round(acc, 4),
            "tokens_per_round": round(
                eng.spec_emitted / max(eng.spec_rounds, 1), 3),
            "rounds": eng.spec_rounds,
            "emitted": eng.spec_emitted,
            "delivered": total,
        }

    for name, draft in (("trained_text_draft", trained_draft),
                        ("merged_lora_draft", merged),
                        ("random_draft", rnd)):
        for g in args.gammas:
            r = run_pool(draft, g)
            r["draft"] = name
            print(json.dumps(r), flush=True)


if __name__ == "__main__":
    main()
