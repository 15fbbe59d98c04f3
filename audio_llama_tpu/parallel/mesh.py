"""Device-mesh construction.

Axes:
  dp    data parallel — batch axis; gradients all-reduce over it (XLA psum).
  fsdp  optional parameter/optimizer sharding axis (batch is sharded over
        dp×fsdp jointly; trainable + optimizer state shard over fsdp).
  tp    tensor parallel — Megatron-style column/row sharding of the frozen
        transformer linears and matching LoRA branches.
  sp    sequence parallel (optional) — shards the decoder TIME axis; llama
        causal attention then runs as a ppermute ring
        (parallel/ring_attention.py; docs/LONG_CONTEXT.md step 2).

On a real slice the physical device order from jax.devices() already follows
the ICI torus; keeping tp innermost puts tensor-parallel collectives on
nearest-neighbor links.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

AXES = ("dp", "fsdp", "tp", "sp")


@dataclass(frozen=True)
class MeshConfig:
    dp: int = -1  # -1 = fill with remaining devices
    fsdp: int = 1
    tp: int = 1
    sp: int = 1

    def resolve(self, n_devices: int) -> tuple[int, int, int, int]:
        dp, fsdp, tp, sp = self.dp, self.fsdp, self.tp, self.sp
        if dp == -1:
            if n_devices % (fsdp * tp * sp) != 0:
                raise ValueError(
                    f"{n_devices} devices not divisible by "
                    f"fsdp*tp*sp={fsdp * tp * sp}"
                )
            dp = n_devices // (fsdp * tp * sp)
        if dp * fsdp * tp * sp != n_devices:
            raise ValueError(
                f"mesh {dp}x{fsdp}x{tp}x{sp} != {n_devices} devices"
            )
        return dp, fsdp, tp, sp


def make_mesh(
    cfg: MeshConfig = MeshConfig(), devices: Optional[Sequence] = None
) -> Mesh:
    """('dp','fsdp','tp','sp') Mesh over the given (default: all) devices."""
    devices = list(devices if devices is not None else jax.devices())
    dp, fsdp, tp, sp = cfg.resolve(len(devices))
    arr = np.asarray(devices).reshape(dp, fsdp, tp, sp)
    return Mesh(arr, AXES)


def best_mesh_shape(n_devices: int, model_heads: int = 8) -> MeshConfig:
    """Pick a dp×tp split for n devices: tp = largest power-of-two divisor of
    both n and the KV-head count (so attention heads shard evenly), capped at 8;
    everything else goes to dp."""
    tp = 1
    while (
        tp * 2 <= 8
        and n_devices % (tp * 2) == 0
        and model_heads % (tp * 2) == 0
    ):
        tp *= 2
    return MeshConfig(dp=n_devices // tp, fsdp=1, tp=tp)
