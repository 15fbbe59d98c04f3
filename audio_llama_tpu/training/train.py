"""Training driver CLI.

The TPU-native re-design of the reference trainer (src/train.py:1-375):
same capability surface — argparse flags (superset of reference
src/train.py:29-94), seeded runs, AdamW + cosine warmup schedule, gradient
accumulation + clipping, periodic eval (loss + perplexity) with best-model
checkpointing, periodic + final checkpoints, file/TensorBoard/wandb logging —
but the training step is ONE jit-compiled XLA program per microbatch-stack
(grad accumulation via lax.scan, training/train_step.py) laid out over a
('dp','fsdp','tp') device mesh (parallel/), with bf16 compute + f32 masters
instead of fp16 GradScaler AMP.

Differences from the reference, by design (SURVEY.md §5, §7):
  - --resume_from actually restores optimizer/step (reference saved but never
    loaded, SURVEY.md §5 'Checkpoint / resume');
  - --lora_rank is actually plumbed into the model (the reference's flag was
    dead — AudioLLM always used rank 64, SURVEY.md §2); default is therefore
    64 to match the reference's *effective* behavior;
  - wandb logging is fully gated behind --use_wandb (reference crashed at
    src/train.py:331 when wandb was off);
  - --fp16 is accepted for CLI compatibility but maps to bf16 on TPU.

Run (offline smoke):
  python -m audio_llama_tpu.training.train --toy_model --tokenizer byte \
      --data_path examples.json --audio_dir ./audio --num_epochs 1
Run (real models from local HF checkout):
  python -m audio_llama_tpu.training.train \
      --llama_path /ckpt/Llama-3.2-3B-Instruct \
      --whisper_path /ckpt/whisper-large-v3-turbo \
      --data_path data/examples.json --audio_dir data
"""

from __future__ import annotations

import argparse
import logging
import math
import os
import random
import time
from typing import Optional

import numpy as np

logger = logging.getLogger("audio_llama_tpu")


def parse_args(argv=None):
    p = _build_parser()
    # --config FILE supplies defaults (YAML or JSON); explicit CLI flags win.
    # The reference shipped a config.yaml that nothing ever read
    # (SURVEY.md §5 'Config / flag system') — here it is honored.
    import sys as _sys

    argv_list = list(argv if argv is not None else _sys.argv[1:])
    if "--config" in argv_list:
        i = argv_list.index("--config")
        path = argv_list[i + 1]
        del argv_list[i : i + 2]
        p.set_defaults(**_load_config_file(path, p))
    return p.parse_args(argv_list)


def _load_config_file(path: str, parser) -> dict:
    import json as _json

    with open(path) as f:
        text = f.read()
    try:
        data = _json.loads(text)
    except ValueError:
        data = _parse_simple_yaml(text)
    known = {a.dest for a in parser._actions}
    unknown = set(data) - known
    if unknown:
        raise ValueError(f"unknown config keys in {path}: {sorted(unknown)}")
    return data


def _parse_simple_yaml(text: str) -> dict:
    """Flat key: value YAML subset (no external yaml dependency)."""
    out = {}
    for line in text.splitlines():
        line = line.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        k, v = line.split(":", 1)
        v = v.strip().strip("'\"")
        if v.lower() in ("true", "false"):
            out[k.strip()] = v.lower() == "true"
        else:
            try:
                out[k.strip()] = int(v)
            except ValueError:
                try:
                    out[k.strip()] = float(v)
                except ValueError:
                    out[k.strip()] = v
    return out


def _build_parser():
    p = argparse.ArgumentParser(description="Train AudioLLM (TPU-native)")
    p.add_argument("--config", type=str, default=None,
                   help="YAML/JSON file of flag defaults (CLI flags override)")
    # Model paths (reference src/train.py:33-36)
    p.add_argument("--llama_path", type=str, default="meta-llama/Llama-3.2-3B-Instruct")
    p.add_argument("--whisper_path", type=str, default="openai/whisper-large-v3-turbo")
    p.add_argument("--synthetic_flagship", action="store_true",
                   help="random-init the flagship dims (Llama-3.2-3B + "
                        "whisper-large-v3-turbo) with the byte tokenizer — "
                        "the full-recipe flight at real scale without HF "
                        "checkpoints (egress-blocked environments)")
    p.add_argument("--toy_model", action="store_true",
                   help="random tiny model + byte tokenizer (offline smoke/CI)")
    p.add_argument("--toy_outliers", type=float, default=0.0,
                   help="with --toy_model: inject outlier-channel structure "
                        "of this magnitude into the random frozen weights "
                        "(models/outliers.py) — the hard regime for the "
                        "quantization accuracy gates. Recorded in the "
                        "checkpoint so inference reconstructs the same "
                        "frozen tree.")
    p.add_argument("--tokenizer", type=str, default=None,
                   help="'byte' or local tokenizer path (default: llama_path)")
    # Data paths (reference src/train.py:39-46)
    p.add_argument("--data_path", type=str, required=True)
    p.add_argument("--audio_dir", type=str, required=True)
    p.add_argument("--output_dir", type=str, default="./checkpoints")
    p.add_argument("--dataset_config", type=str, default=None)
    # Training hyperparameters (reference src/train.py:48-67)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--eval_batch_size", type=int, default=16)
    p.add_argument("--grad_accum_steps", type=int, default=4)
    p.add_argument("--num_epochs", type=int, default=5)
    p.add_argument("--learning_rate", type=float, default=2e-5)
    p.add_argument("--weight_decay", type=float, default=0.01)
    p.add_argument("--warmup_steps", type=int, default=50)
    p.add_argument("--max_grad_norm", type=float, default=2.0)
    p.add_argument("--lora_rank", type=int, default=64,
                   help="LoRA rank (reference's effective rank was 64)")
    p.add_argument("--lora_alpha", type=float, default=16.0)
    p.add_argument("--no_lora", action="store_true", help="projector-only training")
    # Cadence (reference src/train.py:69-76)
    p.add_argument("--save_steps", type=int, default=50)
    p.add_argument("--eval_steps", type=int, default=100)
    p.add_argument("--log_steps", type=int, default=5)
    p.add_argument("--max_steps", type=int, default=0, help="0 = no cap")
    # Shapes (reference src/train.py:77-80)
    p.add_argument("--max_audio_length", type=int, default=30)
    p.add_argument("--text_max_length", type=int, default=512)
    # Logging (reference src/train.py:81-84)
    p.add_argument("--use_wandb", action="store_true")
    p.add_argument("--wandb_project", type=str, default="audio-llm")
    p.add_argument("--no_tensorboard", action="store_true")
    # Misc (reference src/train.py:85-92)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--fp16", action="store_true",
                   help="accepted for reference-CLI compat; maps to bf16 on TPU")
    p.add_argument("--compute_dtype", type=str, default="bfloat16",
                   choices=["bfloat16", "float32"])
    p.add_argument("--num_workers", type=int, default=4)
    p.add_argument("--worker_processes", type=int, default=0,
                   help="build batches in N separate PROCESSES instead of "
                        "threads (scales host decode past one core; the "
                        "reference's torch num_workers fork analog)")
    p.add_argument("--skip_missing_files", action="store_true")
    p.add_argument("--use_dummy_audio", action="store_true")
    # TPU-native extensions
    p.add_argument("--mesh_dp", type=int, default=-1)
    p.add_argument("--mesh_fsdp", type=int, default=1)
    p.add_argument(
        "--mesh_tp", type=int, default=1,
        help="tensor-parallel width; -1 = auto (largest power-of-two "
        "dividing both the device count and the KV-head count, capped at 8)",
    )
    p.add_argument("--resume_from", type=str, default=None)
    p.add_argument("--label_mode", type=str, default="concat",
                   choices=["concat", "reference"],
                   help="'reference' replicates the reference's label semantics")
    p.add_argument("--splice_mode", type=str, default="prepend",
                   choices=["prepend", "inplace"],
                   help="'prepend' = reference behavior (audio block before "
                        "all text); 'inplace' = splice at the <audio> "
                        "placeholder (the reference's documented intent)")
    p.add_argument("--audio_placeholder", type=int, default=-1,
                   choices=[-1, 0, 1],
                   help="insert '<audio></audio>' into audio prompts that "
                        "lack one; -1 = auto (on iff --splice_mode inplace)")
    p.add_argument("--max_samples", type=int, default=0, help="0 = all data")
    p.add_argument("--val_split", type=float, default=0.1)
    p.add_argument("--platform", type=str, default=None,
                   help="force a jax backend, e.g. 'cpu' (env vars are too "
                        "late when jax is pre-imported at interpreter start)")
    p.add_argument("--profile_steps", type=str, default=None, metavar="N:M",
                   help="capture a jax.profiler trace over global steps "
                        "[N, M) into {output_dir}/profile")
    p.add_argument("--debug_nans", action="store_true",
                   help="enable jax_debug_nans (fail fast on NaN; slow)")
    p.add_argument("--remat", action="store_true",
                   help="rematerialize decoder layers in backward "
                        "(O(1-layer) activation memory; needed at 3B scale)")
    # Multi-host (SURVEY §2 stretch config: dp across a v5e-16 slice).
    # One trainer process per host; see parallel/distributed.py for the
    # launch recipe. batch_size stays the GLOBAL batch size.
    p.add_argument("--distributed", action="store_true",
                   help="initialize jax.distributed (multi-host SPMD); on "
                        "TPU pods coordinator/rank auto-detect, elsewhere "
                        "pass the three flags below")
    p.add_argument("--coordinator_address", type=str, default=None,
                   help="host:port of process 0's coordination service")
    p.add_argument("--num_processes", type=int, default=0,
                   help="total trainer processes (0 = auto-detect)")
    p.add_argument("--process_id", type=int, default=-1,
                   help="this process's rank (-1 = auto-detect)")
    p.add_argument("--loss_chunk_size", type=int, default=0,
                   help="compute cross-entropy in sequence chunks of this "
                        "size without materializing [B,T,V] logits "
                        "(recommended 256 for 3B/128k-vocab training)")
    p.add_argument("--attn_impl", type=str, default="auto",
                   help="llama attention implementation: auto (measured-best "
                        "per backend) | causal_kernel | flash | xla | "
                        "causal_kernel_interpret (CPU debug)")
    p.add_argument("--enc_attn_impl", type=str, default="auto",
                   help="whisper-encoder attention: auto | enc_kernel | "
                        "flash | xla | enc_kernel_interpret (CPU debug)")
    p.add_argument("--mel_impl", type=str, default="auto",
                   help="log-mel featurizer: auto | pallas | xla | "
                        "pallas_interpret (CPU debug)")
    return p


def set_seed(seed: int):
    """Reference src/train.py:96-99 (JAX randomness is explicit via keys)."""
    random.seed(seed)
    np.random.seed(seed)


def _build_model(args):
    """Returns (cfg, frozen, tokenizer, n_added_tokens)."""
    import jax
    import jax.numpy as jnp

    from ..config import (
        AudioLLMConfig,
        LlamaConfig,
        LoraConfig,
        MelConfig,
        WhisperConfig,
    )
    from ..data.tokenizer import load_tokenizer
    from ..models import allm, hf_loader
    from ..models import llama as llama_mod

    lora = None
    if not args.no_lora:
        lora = LoraConfig(rank=args.lora_rank, alpha=args.lora_alpha)

    if args.toy_model:
        tokenizer = load_tokenizer(args.tokenizer or "byte")
        llama_cfg = LlamaConfig.tiny(vocab_size=max(tokenizer.vocab_size, 384))
        whisper_cfg = WhisperConfig.tiny()
        cfg = AudioLLMConfig(
            llama=llama_cfg,
            whisper=whisper_cfg,
            mel=MelConfig(
                num_mel_bins=whisper_cfg.num_mel_bins,
                max_audio_seconds=min(args.max_audio_length, 1.28),
            ),
            lora=LoraConfig(rank=4, alpha=8) if lora else None,
            splice_mode=args.splice_mode,
        )
        frozen = allm.init_frozen(
            cfg, jax.random.PRNGKey(args.seed),
            outlier_scale=args.toy_outliers,
        )
        return cfg, frozen, tokenizer, 2

    if args.synthetic_flagship:
        # Random-init FLAGSHIP dims (Llama-3.2-3B + whisper-large-v3-turbo)
        # without HF checkpoints: the full user recipe — data pipeline,
        # sharded steps, eval, checkpoints — exercised at the real scale
        # the reference's README recipe ran at (reference src/training.log)
        # when checkpoint egress is unavailable. bf16 frozen init happens
        # ON DEVICE inside jit (a 7.7 GB host transfer through the remote
        # tunnel would take minutes).
        tokenizer = load_tokenizer(args.tokenizer or "byte")
        cfg = AudioLLMConfig(
            mel=MelConfig(
                num_mel_bins=128,
                max_audio_seconds=float(min(args.max_audio_length, 30)),
            ),
            lora=lora,
            splice_mode=args.splice_mode,
        )
        frozen = jax.jit(
            lambda k: allm.init_frozen(cfg, k, dtype=jnp.bfloat16)
        )(jax.random.PRNGKey(args.seed))
        return cfg, frozen, tokenizer, 2

    tokenizer = load_tokenizer(args.tokenizer or args.llama_path)
    llama_params, llama_cfg = hf_loader.load_llama(args.llama_path)
    whisper_params, whisper_cfg = hf_loader.load_whisper_encoder(args.whisper_path)
    new_vocab = tokenizer.vocab_size
    llama_params = llama_mod.resize_embeddings(llama_params, new_vocab, llama_cfg)
    llama_cfg = llama_cfg.replace(vocab_size=max(llama_cfg.vocab_size, new_vocab))
    # One Whisper window is 30 s; --max_audio_length beyond that becomes N
    # chunked windows (the dataset emits N*30 s waveforms; the model encodes
    # them window-wise and concatenates encoder frames — models/allm.py).
    if args.max_audio_length > 30 and args.max_audio_length % 30 != 0:
        raise ValueError("--max_audio_length beyond 30 must be a multiple of 30")
    cfg = AudioLLMConfig(
        llama=llama_cfg,
        whisper=whisper_cfg,
        mel=MelConfig(
            num_mel_bins=whisper_cfg.num_mel_bins,
            max_audio_seconds=float(min(args.max_audio_length, 30)),
        ),
        lora=lora,
        splice_mode=args.splice_mode,
    )
    return cfg, {"llama": llama_params, "whisper": whisper_params}, tokenizer, 2


def _to_batch(accum_group):
    """Stack collated host batches into AudioLLMBatch arrays ([A,B,...] when
    len>1, else [B,...])."""
    from ..models.allm import AudioLLMBatch

    def stack(key):
        arrs = [b[key] for b in accum_group]
        return np.stack(arrs) if len(arrs) > 1 else arrs[0]

    flags = [b["audio"] is not None for b in accum_group]
    if any(flags) and not all(flags):
        # Silently dropping audio would train audio rows without their
        # conditioning; the trainer groups microbatches by modality upstream
        # (group_by_modality), so reaching here is a bug.
        raise ValueError(
            "accumulation group mixes audio and text-only microbatches"
        )
    has_audio = flags[0]
    return AudioLLMBatch(
        input_ids=stack("input_ids"),
        attention_mask=stack("attention_mask"),
        audio_features=stack("audio") if has_audio else None,
        labels=stack("labels"),
    )


def group_by_modality(batches, accum):
    """Yield accumulation groups of `accum` collated microbatches, grouped so
    every group is modality-uniform (all-audio or all-text-only). The jitted
    train step is compiled per structure; mixing would either recompile per
    group or (round-1 bug) silently drop the audio features of a group whose
    other members are text-only. Ragged per-modality tails at epoch end are
    dropped, matching drop_last batch semantics."""
    groups = {True: [], False: []}
    for np_batch in batches:
        g = groups[np_batch["audio"] is not None]
        g.append(np_batch)
        if len(g) == accum:
            yield _to_batch(g)
            g.clear()


def _flops_per_step(cfg, tokens_per_micro, audio_frames, micros):
    """Rough fwd+bwd FLOPs for MFU: whisper fwd (frozen, no bwd) +
    llama fwd+bwd (activation grads flow through every layer for LoRA)."""
    n_llama = (
        cfg.llama.num_layers
        * (
            cfg.llama.hidden_size * (cfg.llama.q_dim + 2 * cfg.llama.kv_dim)
            + cfg.llama.q_dim * cfg.llama.hidden_size
            + 3 * cfg.llama.hidden_size * cfg.llama.intermediate_size
        )
    )
    n_whisper = cfg.whisper.num_layers * (
        4 * cfg.whisper.d_model ** 2 + 2 * cfg.whisper.d_model * cfg.whisper.ffn_dim
    )
    per_micro = 2 * n_whisper * audio_frames + 6 * n_llama * tokens_per_micro
    return per_micro * micros


def evaluate(get_eval_step, state, frozen, val_loader, accum=1, put_fn=None) -> dict:
    """Mean val loss + perplexity (reference src/train.py:133-163).

    get_eval_step maps a batch to the matching compiled program (with-audio
    and text-only batches each get their own). put_fn (multi-host): assembles
    this process's local rows into the global device batch."""
    # Accumulate the per-batch losses ON DEVICE and fetch one scalar at the
    # end: through the remote-TPU tunnel every float() is a ~30 ms round
    # trip, so fetching per batch makes eval transfer-bound.
    total, n = None, 0
    for np_batch in val_loader:
        batch = _to_batch([np_batch])
        dev_batch = put_fn(batch) if put_fn is not None else batch
        loss = get_eval_step(batch)(state.trainable, frozen, dev_batch)
        total = loss if total is None else total + loss
        n += 1
    if n == 0:
        return {"eval/loss": float("nan"), "eval/perplexity": float("nan")}
    mean = float(total) / n
    return {"eval/loss": mean, "eval/perplexity": math.exp(min(mean, 30.0))}


def train(args) -> dict:
    import jax

    if getattr(args, "platform", None):
        jax.config.update("jax_platforms", args.platform)
    if getattr(args, "debug_nans", False):
        jax.config.update("jax_debug_nans", True)
    import jax.numpy as jnp

    from .. import parallel
    from ..data.dataset import DatasetConfig
    from ..data.loader import create_dataloaders
    from ..models import allm
    from ..training import checkpoint as ckpt
    from ..training import train_step as steps_mod
    from .metrics import MetricsWriter, NullWriter, Throughput, setup_logging
    from .optim import cosine_schedule_with_warmup, make_optimizer

    if getattr(args, "distributed", False):
        proc_idx, proc_count = parallel.distributed.initialize(
            coordinator_address=args.coordinator_address,
            num_processes=args.num_processes,
            process_id=args.process_id,
        )
    else:
        proc_idx, proc_count = parallel.distributed.process_info()
    is_coord = proc_idx == 0

    set_seed(args.seed)
    setup_logging(args.output_dir)
    logger.info("devices: %s", jax.devices())

    cfg, frozen, tokenizer, _ = _build_model(args)
    sid = tokenizer.token_to_id(cfg.audio_start_token)
    eid = tokenizer.token_to_id(cfg.audio_end_token)
    compute_dtype = jnp.bfloat16 if args.compute_dtype == "bfloat16" else jnp.float32

    ds_cfg = DatasetConfig(
        text_max_length=args.text_max_length,
        max_audio_seconds=float(args.max_audio_length)
        if not args.toy_model
        else cfg.mel.max_audio_seconds,
        label_mode=args.label_mode,
        skip_missing_files=args.skip_missing_files,
        use_dummy_audio_for_missing=args.use_dummy_audio,
        audio_placeholder=(args.splice_mode == "inplace")
        if args.audio_placeholder == -1
        else bool(args.audio_placeholder),
    )
    train_loader, val_loader, ds_cfg = create_dataloaders(
        args.data_path,
        args.audio_dir,
        tokenizer,
        batch_size=args.batch_size,
        val_split=args.val_split,
        seed=args.seed,
        num_workers=args.num_workers,
        dataset_config=ds_cfg,
        dataset_config_path=args.dataset_config,
        max_samples=args.max_samples or None,
        val_batch_size=args.eval_batch_size,
        process_index=proc_idx,
        process_count=proc_count,
        worker_processes=args.worker_processes,
    )

    accum = max(1, args.grad_accum_steps)
    steps_per_epoch = max(len(train_loader) // accum, 1)
    total_steps = steps_per_epoch * args.num_epochs
    if args.max_steps:
        total_steps = min(total_steps, args.max_steps)

    schedule = cosine_schedule_with_warmup(
        args.learning_rate, args.warmup_steps, total_steps
    )
    optimizer = make_optimizer(
        schedule, weight_decay=args.weight_decay, max_grad_norm=args.max_grad_norm
    )

    n_dev = len(jax.devices())
    fsdp, tp = args.mesh_fsdp, args.mesh_tp
    if tp == -1:
        tp = parallel.best_mesh_shape(
            max(n_dev // fsdp, 1), model_heads=cfg.llama.num_kv_heads
        ).tp
        logger.info("auto tensor-parallel width: tp=%d", tp)
    if args.mesh_dp == -1:
        # Auto: the largest dp that divides both the per-step batch and the
        # devices left after fsdp×tp. Unused devices are left out of the mesh.
        avail = max(n_dev // (fsdp * tp), 1)
        dp = math.gcd(args.batch_size, avail)
    else:
        dp = args.mesh_dp
        if args.batch_size % (dp * fsdp) != 0:
            raise ValueError(
                f"batch_size {args.batch_size} must be divisible by "
                f"dp*fsdp = {dp * fsdp}"
            )
    used = dp * fsdp * tp
    mesh = parallel.make_mesh(
        parallel.MeshConfig(dp=dp, fsdp=fsdp, tp=tp),
        devices=jax.devices()[:used],
    )
    if used < n_dev:
        logger.warning("mesh uses %d of %d devices", used, n_dev)
    logger.info("mesh: %s", mesh)
    if proc_count > 1:
        if args.batch_size % (dp * fsdp):
            raise ValueError(
                f"multi-host: global batch_size {args.batch_size} must "
                f"be a multiple of dp*fsdp={dp * fsdp}"
            )
        if len(val_loader) and val_loader.batch_size % (dp * fsdp):
            # the replicated-eval fallback needs full batches on every host,
            # but multi-host loaders only hold per-process rows
            raise ValueError(
                f"multi-host: eval batch size {val_loader.batch_size} must "
                f"be a multiple of dp*fsdp={dp * fsdp} "
                "(set --eval_batch_size accordingly)"
            )
    frozen = parallel.sharding.shard_frozen(mesh, frozen)
    trainable = allm.init_trainable(cfg, jax.random.PRNGKey(args.seed + 1))

    def fetch_tree(tree):
        """Materialize a (possibly sharded) pytree on the host for
        checkpointing. Multi-host: LoRA a/b leaves are tp-sharded
        (parallel/sharding.py:_trainable_leaf_spec) and NOT fully
        addressable when the tp axis spans hosts, so device_get would raise
        — process_allgather replicates first. Every process must call this
        (it is a collective); only the coordinator then writes."""
        if proc_count > 1:
            from jax.experimental import multihost_utils

            return multihost_utils.process_allgather(tree, tiled=True)
        return jax.device_get(tree)
    logger.info("trainable params: %s", f"{allm.num_trainable_params(trainable):,}")

    start_step, start_epoch = 0, 0
    state = parallel.init_sharded_state(mesh, trainable, optimizer)
    if args.resume_from:
        t, o, start_step, start_epoch = ckpt.load_checkpoint(
            args.resume_from,
            trainable_template=fetch_tree(state.trainable),
            opt_state_template=fetch_tree(state.opt_state),
        )
        t_sharded = parallel.sharding.shard_trainable(mesh, t)
        if o is not None:
            # Keep restored optimizer leaves as UNCOMMITTED host arrays: the
            # first jitted step places them per its own layout. Committing
            # them up front (device_put) can pin scalars to one device and
            # clash with mesh-committed trainables.
            opt_state = jax.tree_util.tree_map(np.asarray, o)
        else:
            opt_state = state.opt_state
        state = steps_mod.TrainState(
            trainable=t_sharded,
            opt_state=opt_state,
            step=jnp.asarray(start_step, jnp.int32),
        )
        logger.info("resumed from %s at step %d", args.resume_from, start_step)

    # Only the coordinator writes metrics/checkpoints; other hosts run the
    # same SPMD programs but stay silent on disk.
    writer = MetricsWriter(
        args.output_dir,
        use_tensorboard=not args.no_tensorboard,
        use_wandb=args.use_wandb,
        wandb_project=args.wandb_project,
        wandb_config=vars(args),
    ) if is_coord else NullWriter()

    # Two compiled programs: with-audio and text-only batches.
    step_fns = {}

    def get_step(batch):
        key = batch.audio_features is not None
        if key not in step_fns:
            step_fns[key] = parallel.make_sharded_train_step(
                cfg, optimizer, mesh, batch, sid, eid,
                compute_dtype=compute_dtype, accum_steps=accum,
                loss_chunk_size=args.loss_chunk_size, remat=args.remat,
                attn_impl=args.attn_impl, enc_attn_impl=args.enc_attn_impl,
                mel_impl=args.mel_impl,
            )
        return step_fns[key]

    eval_fns = {}

    def get_eval_step(batch):
        # Keyed by structure (audio vs text-only) like the train steps: a
        # template from one structure cannot serve batches of the other.
        key = batch.audio_features is not None
        if key not in eval_fns:
            eval_fns[key] = parallel.make_sharded_eval_step(
                cfg, mesh, batch, sid, eid, compute_dtype=compute_dtype,
                attn_impl=args.attn_impl, enc_attn_impl=args.enc_attn_impl,
                mel_impl=args.mel_impl,
            )
        return eval_fns[key]

    n_windows = max(1, int(args.max_audio_length) // 30) if not args.toy_model else 1
    tokens_per_micro = args.batch_size * (
        args.text_max_length + n_windows * cfg.audio_seq_len + 2
    )
    tput = Throughput(
        flops_per_step=_flops_per_step(
            cfg, tokens_per_micro, args.batch_size * cfg.audio_seq_len, accum
        )
    )

    # One-ahead device prefetch: batch i+1's host->device transfer overlaps
    # step i's compute (the TPU-native analog of the reference's
    # pin_memory=True DataLoaders, reference src/dataloaders.py:99).
    batch_shardings = {}

    def put(batch):
        key = batch.audio_features is not None
        if key not in batch_shardings:
            batch_shardings[key] = parallel.sharding.batch_shardings(
                mesh, batch, accum=accum > 1
            )
        if proc_count > 1:
            # each host holds only its rows; assemble the global array
            return parallel.distributed.make_global_batch(
                batch, batch_shardings[key]
            )
        return jax.device_put(batch, batch_shardings[key])

    eval_shardings = {}

    def eval_put(batch):
        # eval batches are single micros ([B, ...], never accum-stacked)
        key = batch.audio_features is not None
        if key not in eval_shardings:
            eval_shardings[key] = parallel.sharding.batch_shardings(
                mesh, batch, accum=False
            )
        if proc_count > 1:
            return parallel.distributed.make_global_batch(
                batch, eval_shardings[key]
            )
        return batch  # single-process: jit in_shardings place host arrays

    def epoch_batches():
        return group_by_modality(train_loader, accum)

    def prefetched(it):
        it = iter(it)
        try:
            nxt = put(next(it))
        except StopIteration:
            return
        while nxt is not None:
            cur, nxt = nxt, None
            try:
                nxt = put(next(it))  # async transfer while cur computes
            except StopIteration:
                pass
            yield cur

    profile_window = None
    if args.profile_steps:
        lo, hi = (int(x) for x in args.profile_steps.split(":"))
        profile_window = (lo, hi, os.path.join(args.output_dir, "profile"))
    profiling_active = False

    best_eval = float("inf")
    global_step = start_step
    last_metrics = {}
    t_start = time.time()
    done = False

    for epoch in range(start_epoch, args.num_epochs):
        if done:
            break
        train_loader.set_epoch(epoch)
        for batch in prefetched(epoch_batches()):
            if profile_window is not None:
                lo, hi, pdir = profile_window
                if not profiling_active and global_step == lo:
                    jax.profiler.start_trace(pdir)
                    profiling_active = True
                elif profiling_active and global_step >= hi:
                    jax.block_until_ready(state.trainable)
                    jax.profiler.stop_trace()
                    profiling_active = False
                    logger.info("profiler trace written to %s", pdir)
            state, metrics = get_step(batch)(state, frozen, batch)
            global_step += 1
            tput.update(
                steps=1,
                tokens=tokens_per_micro * accum,
                audio_sec=args.batch_size * accum * n_windows
                * cfg.mel.max_audio_seconds
                if batch.audio_features is not None
                else 0.0,
            )

            if global_step % args.log_steps == 0:
                loss = float(metrics["loss"])
                gnorm = float(metrics["grad_norm"])
                lr = float(schedule(min(global_step, total_steps) - 1))
                scalars = {
                    "train/loss": loss,
                    "train/grad_norm": gnorm,
                    "train/lr": lr,
                    "train/epoch": epoch,
                    **{f"perf/{k}": v for k, v in tput.window().items()},
                }
                writer.log(global_step, scalars)
                logger.info(
                    "step %d/%d epoch %d loss %.4f lr %.2e",
                    global_step, total_steps, epoch, loss, lr,
                )
                last_metrics = scalars

            if args.eval_steps and global_step % args.eval_steps == 0 and len(val_loader):
                ev = evaluate(
                    get_eval_step, state, frozen, val_loader, put_fn=eval_put
                )
                writer.log(global_step, ev)
                logger.info(
                    "eval @ %d: loss %.4f ppl %.4f",
                    global_step, ev["eval/loss"], ev["eval/perplexity"],
                )
                last_metrics.update(ev)
                # best_eval tracks on every host (eval loss is SPMD-
                # identical) so the collective fetch below stays in step.
                if ev["eval/loss"] < best_eval:
                    best_eval = ev["eval/loss"]
                    t_host = fetch_tree(state.trainable)
                    o_host = fetch_tree(state.opt_state)
                    if is_coord:
                        ckpt.save_checkpoint(
                            args.output_dir,
                            trainable=t_host, opt_state=o_host,
                            step=global_step, epoch=epoch, model_cfg=cfg,
                            args=vars(args), dataset_config=ds_cfg.__dict__,
                            best=True,
                        )

            if args.save_steps and global_step % args.save_steps == 0:
                t_host = fetch_tree(state.trainable)
                o_host = fetch_tree(state.opt_state)
                if is_coord:
                    ckpt.save_checkpoint(
                        args.output_dir,
                        trainable=t_host, opt_state=o_host,
                        step=global_step, epoch=epoch, model_cfg=cfg,
                        args=vars(args), dataset_config=ds_cfg.__dict__,
                    )

            if args.max_steps and global_step >= args.max_steps:
                done = True
                break

    if profiling_active:
        jax.block_until_ready(state.trainable)
        jax.profiler.stop_trace()

    # Final eval + final checkpoint (reference src/train.py:357-363).
    if len(val_loader):
        ev = evaluate(get_eval_step, state, frozen, val_loader, put_fn=eval_put)
        writer.log(global_step, ev)
        logger.info(
            "final eval: loss %.4f ppl %.4f", ev["eval/loss"], ev["eval/perplexity"]
        )
        last_metrics.update(ev)
    t_host = fetch_tree(state.trainable)
    o_host = fetch_tree(state.opt_state)
    path = ckpt.save_checkpoint(
        args.output_dir,
        trainable=t_host, opt_state=o_host,
        step=global_step, epoch=args.num_epochs - 1, model_cfg=cfg,
        args=vars(args), dataset_config=ds_cfg.__dict__,
        final=True,
    ) if is_coord else None
    writer.close()
    logger.info(
        "done: %d steps in %.1fs; final checkpoint %s",
        global_step, time.time() - t_start, path,
    )
    return {"steps": global_step, "final_checkpoint": path, **last_metrics}


def main(argv=None):
    train(parse_args(argv))


if __name__ == "__main__":
    main()
