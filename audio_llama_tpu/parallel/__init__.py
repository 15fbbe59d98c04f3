"""Mesh + sharding: dp/fsdp/tp axes over a jax.sharding.Mesh.

The reference is strictly single-GPU (SURVEY.md §2 'Parallelism strategies':
no torch.distributed anywhere). This subpackage is the TPU-native extension
demanded by the target hardware: a device mesh with named axes, Megatron-style
tensor-parallel partition specs for the frozen Llama/Whisper stacks, batch
sharding over the data axis, and jit-compiled train/eval steps whose
collectives XLA derives from the sharding annotations (GSPMD) and routes over
ICI.
"""

from . import distributed
from .mesh import MeshConfig, make_mesh, best_mesh_shape
from .sharding import (
    batch_specs,
    frozen_shardings,
    frozen_specs,
    llama_specs,
    replicated,
    trainable_shardings,
    trainable_specs,
    whisper_specs,
)
from .seq_parallel import make_sp_encode, make_sp_generate
from .sharded_train import (
    init_sharded_state,
    make_sharded_eval_step,
    make_sharded_train_step,
    shard_train_state,
)

__all__ = [
    "MeshConfig",
    "make_mesh",
    "best_mesh_shape",
    "llama_specs",
    "whisper_specs",
    "frozen_specs",
    "trainable_specs",
    "batch_specs",
    "replicated",
    "frozen_shardings",
    "trainable_shardings",
    "make_sharded_train_step",
    "make_sharded_eval_step",
    "init_sharded_state",
    "shard_train_state",
    "make_sp_encode",
    "make_sp_generate",
]
