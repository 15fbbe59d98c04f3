"""Fused int4 decode-MLP kernel: gate|up matmul + SiLU·mul + down matmul
in ONE pallas_call per layer.

At B1 decode the step is weight-stream-bound and LAUNCH-bound: the int4
matmul custom-calls carry ~all the step time (B1 trace: 3.0 of 4.06 ms)
against a ~1.7 ms weight-byte floor, and fusing the qkv / gate|up slabs
(fewer calls, same bytes) measured +10% at B1. This kernel continues that
line for the MLP half: the gate|up and down weight streams flow through a
single kernel whose grid walks the F (ffn) dimension — each grid step
dequant-matmuls one [K, cn] gate|up column chunk, applies SiLU·mul in
VMEM, and immediately contracts the [M, cn] activation chunk into the
down-projection accumulator with that chunk's [cn, D/2] down rows. One
call boundary instead of two, no [M, 2F] or [M, F] HBM intermediates, and
the down stream overlaps the gate|up compute via Mosaic's block pipeline.

Layout contracts match ops/int4_matmul.py (column-pair halves packing,
GROUP-row scale groups):
  gate|up packed [L, K, F]   (lo nibble = gate col j, hi = up col j)
  gate|up scales [L, K/G, 2F]
  down    packed [L, F, D/2] (lo = down col j, hi = col j + D/2)
  down    scales [L, F/G, D]

Decode-only (M <= 64, no VJP): training/prefill keep the two-call planes
path (models/llama.py). Numerics: identical contraction order to the
two-kernel path per chunk, f32 accumulation; SiLU computed in f32.

Reference analog: none (reference decodes through HF fp16 Linear layers,
src/models/lora.py:41-43 hooks); this is the TPU serving fast path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .int4_matmul import GROUP, INT4_FMT, _group_dots, int4_matmul_stacked_ref


def _kernel(
    li_ref,
    x_ref,      # [m, K]
    gup_ref,    # [1, K, cn] int8 (gate lo / up hi for this F chunk)
    gsl_ref,    # [1, kg, cn] f32 gate scales
    gsh_ref,    # [1, kg, cn] f32 up scales
    dnp_ref,    # [1, cn, nd] int8 (down lo/hi column pairs)
    dsl_ref,    # [1, 1, cg, nd] f32 (chunk axis is a major grid axis —
    dsh_ref,    # [1, 1, cg, nd]      see the 4-D reshape in the caller)
    *rest,      # [dnr_ref [1, 1, 1, cn]] if has_dnr, then o_ref, acc
    group: int,
    kg: int,    # K / group
    cg: int,    # cn / group
    m: int,
    nc: int,    # grid size (F / cn)
    has_dnr: bool = False,
    fmt: str = "pair",
):
    del li_ref  # consumed by the BlockSpec index maps
    if has_dnr:
        dnr_ref, o_ref, acc = rest
    else:
        o_ref, acc = rest
    c = pl.program_id(0)

    @pl.when(c == 0)
    def _():
        acc[...] = jnp.zeros_like(acc)

    x = x_ref[:]
    cdt = x.dtype
    cn_ = gup_ref.shape[2]
    g_acc = jnp.zeros((m, cn_), jnp.float32)
    u_acc = jnp.zeros((m, cn_), jnp.float32)
    for g in range(kg):
        rows = slice(g * group, (g + 1) * group)
        pg, pu = _group_dots(x[:, rows], gup_ref[0, rows, :], cdt, fmt)
        g_acc = g_acc + pg * gsl_ref[0, g, :][None, :]
        u_acc = u_acc + pu * gsh_ref[0, g, :][None, :]
    # SiLU(gate) * up in f32, then to compute dtype for the down MXU pass
    a = g_acc * jax.nn.sigmoid(g_acc) * u_acc  # [m, cn] f32
    if has_dnr:
        # smoothed down slab (llama_int4 smooth=True): the down matmul's
        # effective weight is diag(w_r) @ dequant — multiply its input by
        # this chunk's equalizer slice (one VPU op per grid step)
        a = a * dnr_ref[0, 0, 0, :][None, :]
    a = a.astype(cdt)

    for g2 in range(cg):
        rows = slice(g2 * group, (g2 + 1) * group)
        plo, phi = _group_dots(a[:, rows], dnp_ref[0, rows, :], cdt, fmt)
        acc[0] += plo * dsl_ref[0, 0, g2, :][None, :]
        acc[1] += phi * dsh_ref[0, 0, g2, :][None, :]

    @pl.when(c == nc - 1)
    def _():
        o_ref[...] = acc[...].astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("group", "chunk", "interpret", "fmt")
)
def mlp_int4_stacked(
    x: jnp.ndarray,          # [..., K] bf16/f32 (M = prod(lead) <= 64)
    gup_packed: jnp.ndarray,  # [L, K, F] int8
    gup_scales: jnp.ndarray,  # [L, K/group, 2F] f32
    dn_packed: jnp.ndarray,   # [L, F, D/2] int8
    dn_scales: jnp.ndarray,   # [L, F/group, D] f32
    layer,                    # [] int32 traced layer index
    group: int = GROUP,
    chunk: int = 512,         # F columns per grid step
    interpret: bool = False,
    dn_r: jnp.ndarray | None = None,  # [L, F] f32 equalizer (smooth trees)
    fmt: str | None = None,
) -> jnp.ndarray:
    """silu(x @ Wgate) * (x @ Wup) @ Wdown -> [..., D] in x.dtype."""
    fmt = fmt or INT4_FMT
    *lead, K = x.shape
    L, _, F = gup_packed.shape
    nd = dn_packed.shape[2]
    if F % chunk or chunk % group or K % group:
        raise ValueError(
            f"need chunk|F, group|chunk, group|K; got F={F} chunk={chunk} "
            f"group={group} K={K}"
        )
    nc = F // chunk
    kg = K // group
    cg = chunk // group
    # Mosaic tiling: a block's minor dim must be lane-divisible (128) or
    # span the whole array dim. The down-scales nd block spans only half
    # of D, and the gate/up scale + weight blocks span `chunk` of F/2F —
    # so both need the 128 multiple. Dispatch (llama._fused_mlp_ok ->
    # geometry_ok) falls back to the planes path instead of tripping this.
    if not interpret and (nd % 128 or chunk % 128):
        raise ValueError(
            f"TPU lowering needs 128 | D/2 and 128 | chunk; got nd={nd} "
            f"chunk={chunk} (use geometry_ok() before dispatching)"
        )
    # The down scales' group-row axis blocks cg(=chunk/group) rows per grid
    # step; cg is typically < 8, which Mosaic's sublane rule rejects as a
    # 2nd-minor block size. Splitting [L, F/G, D] -> [L, nc, cg, D] makes
    # the chunk axis a major (grid-indexed) axis and the cg block span its
    # whole (now-minor-2) dim, which is always legal.
    dn_scales4 = dn_scales.reshape(L, nc, cg, 2 * nd)
    x2 = x.reshape(-1, K)
    M = x2.shape[0]
    m = -(-M // 8) * 8
    if m != M:
        x2 = jnp.pad(x2, ((0, m - M), (0, 0)))

    kernel = functools.partial(
        _kernel, group=group, kg=kg, cg=cg, m=m, nc=nc,
        has_dnr=dn_r is not None, fmt=fmt,
    )
    in_specs = [
        pl.BlockSpec((m, K), lambda c, li: (0, 0)),
        pl.BlockSpec((1, K, chunk), lambda c, li: (li[0], 0, c)),
        # gate scales: F-column block c of [L, kg, 2F]; up at block c+nc
        pl.BlockSpec((1, kg, chunk), lambda c, li: (li[0], 0, c)),
        pl.BlockSpec(
            (1, kg, chunk), lambda c, li, _nc=nc: (li[0], 0, c + _nc)
        ),
        pl.BlockSpec((1, chunk, nd), lambda c, li: (li[0], c, 0)),
        # down scales: chunk-c block of [L, nc, cg, D]; lo/hi col halves
        pl.BlockSpec((1, 1, cg, nd), lambda c, li: (li[0], c, 0, 0)),
        pl.BlockSpec((1, 1, cg, nd), lambda c, li: (li[0], c, 0, 1)),
    ]
    operands = [
        x2, gup_packed, gup_scales, gup_scales, dn_packed,
        dn_scales4, dn_scales4,
    ]
    if dn_r is not None:
        # [L, F] -> [L, nc, 1, chunk]: the last two block dims span their
        # whole array dims (Mosaic tiling rule — same trick as dn_scales4)
        in_specs.append(
            pl.BlockSpec((1, 1, 1, chunk), lambda c, li: (li[0], c, 0, 0))
        )
        operands.append(
            dn_r.astype(jnp.float32).reshape(L, nc, 1, chunk)
        )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nc,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((2, m, nd), lambda c, li: (0, 0, 0)),
        scratch_shapes=[pltpu.VMEM((2, m, nd), jnp.float32)],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((2, m, nd), x.dtype),
        interpret=interpret,
    )(
        jnp.asarray(layer, jnp.int32).reshape(1), *operands
    )
    y = jnp.concatenate([out[0], out[1]], axis=-1)  # [m, D]
    if m != M:
        y = y[:M]
    return y.reshape(*lead, 2 * nd)


def mlp_int4_stacked_ref(
    x, gup_packed, gup_scales, dn_packed, dn_scales, layer,
    group: int = GROUP, compute_dtype=jnp.bfloat16, dn_r=None, fmt=None,
):
    """XLA oracle: the two-call planes path this kernel fuses."""
    g, u = int4_matmul_stacked_ref(
        x, gup_packed, gup_scales, layer, group=group,
        compute_dtype=compute_dtype, return_planes=True, fmt=fmt,
    )
    a = jax.nn.silu(g.astype(jnp.float32)) * u.astype(jnp.float32)
    if dn_r is not None:
        a = a * jax.lax.dynamic_index_in_dim(
            dn_r, layer, 0, keepdims=False
        ).astype(jnp.float32)
    return int4_matmul_stacked_ref(
        a.astype(compute_dtype), dn_packed, dn_scales, layer, group=group,
        compute_dtype=compute_dtype, fmt=fmt,
    )


def geometry_ok(K: int, F: int, D: int, group: int = GROUP,
                chunk: int = None) -> bool:
    """True when the fused kernel can lower on TPU for this MLP geometry
    (see the tiling notes in mlp_int4_stacked). Dispatch falls back to the
    two-call planes path otherwise."""
    c = pick_chunk(F, group) if chunk is None else chunk
    return (
        c is not None
        and c % 128 == 0
        and (D // 2) % 128 == 0
        and K % group == 0
    )


# F-columns per grid step (tuning knob; round-4 B1 trace showed the MLP
# kernel at 74% of its weight-DMA floor — sweep via env for A/B)
import os as _os

MLP4_CHUNK = int(_os.environ.get("MLP4_CHUNK", "512"))


def pick_chunk(F: int, group: int = GROUP, target: int | None = None):
    """Largest F-chunk <= target satisfying chunk|F and group|chunk, or
    None when the geometry cannot be tiled (dispatch falls back)."""
    if target is None:
        target = MLP4_CHUNK
    c = min(target, F)
    c -= c % group
    while c >= group:
        if F % c == 0:
            return c
        c -= group
    return None


def available() -> bool:
    from . import flash_attention as fa

    return fa.available()
