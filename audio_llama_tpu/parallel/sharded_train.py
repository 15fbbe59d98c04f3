"""Sharded (multi-chip) train/eval steps.

Wraps training.train_step's pure step functions in `jax.jit` with
NamedSharding annotations over a ('dp','fsdp','tp') mesh. XLA/GSPMD inserts
every collective (gradient psum over dp, tensor-parallel all-reduces over tp,
fsdp all-gathers) from the sharding annotations — the TPU-native replacement
for the distributed runtime the reference never had (SURVEY.md §2
'Parallelism strategies': reference is single-GPU, no torch.distributed).

Usage:
    mesh = make_mesh(MeshConfig(dp=4, tp=2))
    frozen = sharding.shard_frozen(mesh, frozen)
    state = init_sharded_state(mesh, trainable, optimizer)
    step = make_sharded_train_step(cfg, optimizer, mesh, batch_template, ...)
    state, metrics = step(state, frozen, batch)   # batch: host numpy ok
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import optax

from ..config import AudioLLMConfig
from ..models import allm
from ..training import train_step as base_steps
from . import sharding


def init_sharded_state(
    mesh, trainable: dict, optimizer: optax.GradientTransformation
) -> base_steps.TrainState:
    """Place the trainable pytree per its specs and build matching-sharded
    optimizer state (jit propagates input shardings into mu/nu)."""
    t_sh = sharding.shard_trainable(mesh, trainable)
    opt_state = jax.jit(optimizer.init)(t_sh)
    return base_steps.TrainState(
        trainable=t_sh,
        opt_state=opt_state,
        step=jnp.zeros((), jnp.int32),
    )


def shard_train_state(mesh, state: base_steps.TrainState) -> base_steps.TrainState:
    """Re-place an existing (e.g. checkpoint-restored) TrainState on the mesh.

    mu/nu subtrees of the optimizer state mirror the trainable structure and
    get its shardings; counts/scalars are replicated."""
    t_sh = sharding.shard_trainable(mesh, state.trainable)
    t_shardings = sharding.trainable_shardings(mesh, state.trainable)
    opt_state = jax.jit(
        lambda s: s, out_shardings=_opt_state_shardings(mesh, state, t_shardings)
    )(state.opt_state)
    return base_steps.TrainState(
        trainable=t_sh, opt_state=opt_state, step=jax.device_put(state.step)
    )


def _opt_state_shardings(mesh, state, t_shardings):
    """Best-effort: subtrees of opt_state whose structure matches the trainable
    tree get its shardings; everything else is replicated."""
    t_struct = jax.tree_util.tree_structure(state.trainable)

    def rec(node):
        try:
            if jax.tree_util.tree_structure(node) == t_struct:
                return t_shardings
        except Exception:
            pass
        if isinstance(node, dict):
            return {k: rec(v) for k, v in node.items()}
        if isinstance(node, (list, tuple)) and not hasattr(node, "_fields"):
            return type(node)(rec(v) for v in node)
        if hasattr(node, "_fields"):  # NamedTuple
            return type(node)(*(rec(getattr(node, f)) for f in node._fields))
        return sharding.replicated(mesh)

    return rec(state.opt_state)


def make_sharded_train_step(
    cfg: AudioLLMConfig,
    optimizer: optax.GradientTransformation,
    mesh,
    batch_template: allm.AudioLLMBatch,
    audio_start_id: int,
    audio_end_id: int,
    compute_dtype=jnp.bfloat16,
    accum_steps: int = 1,
    donate_state: bool = True,
    loss_chunk_size: int = 0,
    remat: bool = False,
    attn_impl: str = "auto",
    enc_attn_impl: str = "auto",
    mel_impl: str = "auto",
    kernel_partition: bool = True,
):
    """jit-compiled sharded step(state, frozen, batch) -> (state, metrics).

    `batch_template` fixes the batch pytree structure (with/without audio) so
    the input sharding tree matches; host numpy batches are transferred and
    laid out by jit itself.

    kernel_partition=True (default) traces the step under
    ops.partitioning.kernel_partitioning(mesh): every Pallas kernel on the
    path (causal/flash llama attention, encoder attention, fused LN, mel)
    self-wraps in a nested shard_map so it lowers and runs PARTITIONED
    inside this GSPMD program — without it, GSPMD cannot partition a
    pallas_call and a multi-chip TPU step would fail to lower or replicate
    full-shape kernels per device (round-2 VERDICT #1). On CPU meshes the
    kernels only engage via the '*_interpret' impls, which is exactly how
    tests/test_kernel_partition.py validates this path.
    """
    step = base_steps.make_train_step(
        cfg, optimizer, audio_start_id, audio_end_id, compute_dtype, accum_steps,
        loss_chunk_size=loss_chunk_size, remat=remat,
        attn_impl=attn_impl, enc_attn_impl=enc_attn_impl, mel_impl=mel_impl,
    )
    if kernel_partition:
        from ..ops import partitioning as ptn

        inner = step

        def step(state, frozen, batch):
            # context is consulted at TRACE time by each kernel entry; the
            # with-block wraps every (re)trace of this function
            with ptn.kernel_partitioning(mesh):
                return inner(state, frozen, batch)

    seq_axis = "sp" if mesh.shape.get("sp", 1) > 1 else None
    batch_sh = sharding.batch_shardings(
        mesh, batch_template, accum=accum_steps > 1, seq_axis=seq_axis
    )
    return jax.jit(
        step,
        in_shardings=(None, None, batch_sh),
        donate_argnums=(0,) if donate_state else (),
    )


def make_sharded_eval_step(
    cfg: AudioLLMConfig,
    mesh,
    batch_template: allm.AudioLLMBatch,
    audio_start_id: int,
    audio_end_id: int,
    compute_dtype=jnp.bfloat16,
    attn_impl: str = "auto",
    enc_attn_impl: str = "auto",
    mel_impl: str = "auto",
    kernel_partition: bool = True,
):
    step = base_steps.make_eval_step(
        cfg, audio_start_id, audio_end_id, compute_dtype,
        attn_impl=attn_impl, enc_attn_impl=enc_attn_impl, mel_impl=mel_impl,
    )
    if kernel_partition:
        from ..ops import partitioning as ptn

        inner = step

        def step(trainable, frozen, batch):
            with ptn.kernel_partitioning(mesh):
                return inner(trainable, frozen, batch)

    # Small eval batches that don't divide the dp×fsdp axis run replicated
    # (eval is a tiny fraction of the work; correctness over layout).
    dp_size = mesh.shape["dp"] * mesh.shape["fsdp"]
    b = batch_template.input_ids.shape[0]
    if b % dp_size == 0:
        batch_sh = sharding.batch_shardings(
            mesh, batch_template, accum=False,
            seq_axis="sp" if mesh.shape.get("sp", 1) > 1 else None,
        )
    else:
        batch_sh = jax.tree_util.tree_map(
            lambda _: sharding.replicated(mesh), batch_template
        )
    return jax.jit(step, in_shardings=(None, None, batch_sh))
