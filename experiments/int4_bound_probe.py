"""Is the B1 int4 weight stream DMA-bound or unpack(VPU)-bound?

The round-4 B1 decode trace put mlp_int4 at 74% and int4_matmul (qkv/o) at
57% of their weight-byte DMA floors, and NEXT #1 points the round-5 lever
at kernel-internal DMA tuning. But at M=1 nothing amortizes the per-byte
nibble unpack (int32 widen + 4 shifts + 2 converts per byte), so the gap
may be VPU time, not DMA bubbles. This probe separates them with isolated
same-session arms at the flagship decode geometry (M=1, L=28 layer walk):

  full    — production unpack (lo: shl28/shr28, hi: shl24/shr28, int32)
  i32lite — exact, 3 shifts (hi = b >> 4 arithmetic); candidate
  fp      — exact, all-bf16 (convert, *0.0625, floor, mul-sub, cmp-sel);
            half the VPU lane traffic of int32; candidate
  raw     — convert-only (numerics WRONG, timing-only): the no-unpack bound
  dma     — blocks fetched, no compute: the pure pipeline/DMA bound
  nh/chunk sweeps on 'full' — the block-size lever NEXT #1 proposed

Weights are generated ON DEVICE inside jit (tunnel uploads are slow), the
fori chain walks the layer index (li = i % L) so every iteration streams a
different layer's slab, and the output feeds the next x (data dependency
defeats hoisting/dedup). Floors at 810 GB/s HBM.

Run: nohup python -u experiments/int4_bound_probe.py > /tmp/int4_probe.log 2>&1 &
"""

import functools
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")

from experiments.enc_kernel_bench import timed_loop, report  # noqa: E402

L, K, NH_QKV = 28, 3072, 2560          # fused qkv slab at llama-3.2-3B dims
F, D = 8192, 3072                      # MLP dims (nd = D/2)
GROUP = 128
INTERPRET = bool(int(os.environ.get("PROBE_INTERPRET", "0")))
if INTERPRET:  # CPU smoke: tiny dims, interpret-mode pallas
    L, K, NH_QKV = 2, 256, 256
    F, D = 512, 256


def _unpack(b_i8, cdt, mode):
    """packed int8 block -> (lo, hi) planes in compute dtype."""
    if mode == "fp":
        bf = b_i8.astype(jnp.bfloat16)
        hi = jnp.floor(bf * 0.0625)
        lo_u = bf - hi * 16.0
        lo = jnp.where(lo_u >= 8.0, lo_u - 16.0, lo_u)
        return lo.astype(cdt), hi.astype(cdt)
    if mode == "raw":
        bf = b_i8.astype(cdt)
        return bf, bf
    b = b_i8.astype(jnp.int32)
    if mode == "i32lite":
        lo = jnp.right_shift(jnp.left_shift(b, 28), 28)
        hi = jnp.right_shift(b, 4)
    else:  # 'full' — the production unpack
        lo = jnp.right_shift(jnp.left_shift(b, 28), 28)
        hi = jnp.right_shift(jnp.left_shift(b, 24), 28)
    return lo.astype(cdt), hi.astype(cdt)


# --------------------------------------------------------------------------
# stacked qkv-style matmul (mirror of ops/int4_matmul._kernel_stacked)
# --------------------------------------------------------------------------

def _qkv_kernel(li_ref, x_ref, p_ref, slo_ref, shi_ref, o_ref, *,
                n_groups, bm, nh, mode):
    del li_ref
    if mode == "dma":
        # touch one sublane so the read cannot be dropped; no unpack/matmul
        o_ref[0] = jnp.broadcast_to(
            p_ref[0, :1, :].astype(o_ref.dtype), (bm, nh))
        o_ref[1] = jnp.broadcast_to(
            slo_ref[0, :1, :].astype(o_ref.dtype) +
            shi_ref[0, :1, :].astype(o_ref.dtype) +
            x_ref[:1, :1], (bm, nh))
        return
    x = x_ref[:]
    acc_lo = jnp.zeros((bm, nh), jnp.float32)
    acc_hi = jnp.zeros((bm, nh), jnp.float32)
    for g in range(n_groups):
        rows = slice(g * GROUP, (g + 1) * GROUP)
        lo, hi = _unpack(p_ref[0, rows, :], x.dtype, mode)
        xg = x[:, rows]
        plo = jax.lax.dot_general(
            xg, lo, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        phi = jax.lax.dot_general(
            xg, hi, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc_lo = acc_lo + plo * slo_ref[0, g, :][None, :]
        acc_hi = acc_hi + phi * shi_ref[0, g, :][None, :]
    o_ref[0] = acc_lo.astype(o_ref.dtype)
    o_ref[1] = acc_hi.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("nh", "mode"))
def qkv_call(x2, packed_all, scales_all, layer, nh=512, mode="full"):
    bm = 8
    n_groups = K // GROUP
    nn = NH_QKV // nh
    kernel = functools.partial(
        _qkv_kernel, n_groups=n_groups, bm=bm, nh=nh, mode=mode)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1, nn),
        in_specs=[
            pl.BlockSpec((bm, K), lambda mi, ni, li: (mi, 0)),
            pl.BlockSpec((1, K, nh), lambda mi, ni, li: (li[0], 0, ni)),
            pl.BlockSpec((1, n_groups, nh), lambda mi, ni, li: (li[0], 0, ni)),
            pl.BlockSpec(
                (1, n_groups, nh),
                lambda mi, ni, li, _nn=nn: (li[0], 0, ni + _nn)),
        ],
        out_specs=pl.BlockSpec((2, bm, nh), lambda mi, ni, li: (0, mi, ni)),
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((2, bm, NH_QKV), x2.dtype),
        interpret=INTERPRET,
    )(jnp.asarray(layer, jnp.int32).reshape(1),
      x2, packed_all, scales_all, scales_all)
    return out


# --------------------------------------------------------------------------
# fused MLP (mirror of ops/mlp_int4._kernel)
# --------------------------------------------------------------------------

def _mlp_kernel(li_ref, x_ref, gup_ref, gsl_ref, gsh_ref, dnp_ref,
                dsl_ref, dsh_ref, o_ref, acc, *, kg, cg, m, nc, mode):
    del li_ref
    c = pl.program_id(0)

    @pl.when(c == 0)
    def _():
        acc[...] = jnp.zeros_like(acc)

    if mode == "dma":
        acc[0, :1, :] += (
            jnp.broadcast_to(gup_ref[0, :1, :1], (1, acc.shape[2])) +
            dnp_ref[0, :1, :].astype(jnp.float32) +
            gsl_ref[0, :1, :1] + gsh_ref[0, :1, :1] +
            dsl_ref[0, 0, :1, :] + dsh_ref[0, 0, :1, :] + x_ref[:1, :1])

        @pl.when(c == nc - 1)
        def _():
            o_ref[...] = acc[...].astype(o_ref.dtype)
        return

    x = x_ref[:]
    cdt = x.dtype
    cn = gup_ref.shape[2]
    g_acc = jnp.zeros((m, cn), jnp.float32)
    u_acc = jnp.zeros((m, cn), jnp.float32)
    for g in range(kg):
        rows = slice(g * GROUP, (g + 1) * GROUP)
        lo, hi = _unpack(gup_ref[0, rows, :], cdt, mode)
        xg = x[:, rows]
        pg = jax.lax.dot_general(
            xg, lo, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        pu = jax.lax.dot_general(
            xg, hi, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        g_acc = g_acc + pg * gsl_ref[0, g, :][None, :]
        u_acc = u_acc + pu * gsh_ref[0, g, :][None, :]
    a = (g_acc * jax.nn.sigmoid(g_acc) * u_acc).astype(cdt)

    for g2 in range(cg):
        rows = slice(g2 * GROUP, (g2 + 1) * GROUP)
        lo, hi = _unpack(dnp_ref[0, rows, :], cdt, mode)
        ag = a[:, rows]
        plo = jax.lax.dot_general(
            ag, lo, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        phi = jax.lax.dot_general(
            ag, hi, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc[0] += plo * dsl_ref[0, 0, g2, :][None, :]
        acc[1] += phi * dsh_ref[0, 0, g2, :][None, :]

    @pl.when(c == nc - 1)
    def _():
        o_ref[...] = acc[...].astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("chunk", "mode"))
def mlp_call(x2, gup_packed, gup_scales, dn_packed, dn_scales4, layer,
             chunk=512, mode="full"):
    m = 8
    nd = D // 2
    nc = F // chunk
    kg = K // GROUP
    cg = chunk // GROUP
    kernel = functools.partial(
        _mlp_kernel, kg=kg, cg=cg, m=m, nc=nc, mode=mode)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nc,),
        in_specs=[
            pl.BlockSpec((m, K), lambda c, li: (0, 0)),
            pl.BlockSpec((1, K, chunk), lambda c, li: (li[0], 0, c)),
            pl.BlockSpec((1, kg, chunk), lambda c, li: (li[0], 0, c)),
            pl.BlockSpec(
                (1, kg, chunk), lambda c, li, _nc=nc: (li[0], 0, c + _nc)),
            pl.BlockSpec((1, chunk, nd), lambda c, li: (li[0], c, 0)),
            pl.BlockSpec((1, 1, cg, nd), lambda c, li: (li[0], c, 0, 0)),
            pl.BlockSpec((1, 1, cg, nd), lambda c, li: (li[0], c, 0, 1)),
        ],
        out_specs=pl.BlockSpec((2, m, nd), lambda c, li: (0, 0, 0)),
        scratch_shapes=[pltpu.VMEM((2, m, nd), jnp.float32)],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((2, m, nd), x2.dtype),
        interpret=INTERPRET,
    )(jnp.asarray(layer, jnp.int32).reshape(1),
      x2, gup_packed, gup_scales, gup_scales, dn_packed,
      dn_scales4, dn_scales4)


# --------------------------------------------------------------------------
# device-side weight init + timed chains
# --------------------------------------------------------------------------

@jax.jit
def make_qkv(key):
    k1, k2 = jax.random.split(key)
    packed = jax.random.randint(
        k1, (L, K, NH_QKV), -128, 128, jnp.int32).astype(jnp.int8)
    scales = jax.random.uniform(
        k2, (L, K // GROUP, 2 * NH_QKV), jnp.float32, 0.001, 0.02)
    return packed, scales


@jax.jit
def make_mlp(key):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    gup = jax.random.randint(
        k1, (L, K, F), -128, 128, jnp.int32).astype(jnp.int8)
    gs = jax.random.uniform(
        k2, (L, K // GROUP, 2 * F), jnp.float32, 0.001, 0.02)
    dn = jax.random.randint(
        k3, (L, F, D // 2), -128, 128, jnp.int32).astype(jnp.int8)
    ds = jax.random.uniform(
        k4, (L, F // GROUP, D), jnp.float32, 0.001, 0.02)
    return gup, gs, dn, ds


def run_qkv(packed, scales, nh, mode, iters):
    x0 = jnp.zeros((8, K), jnp.bfloat16).at[0, :].set(0.01)

    def fstep(args):
        x, i = args
        out = qkv_call(x2=x, packed_all=packed, scales_all=scales,
                       layer=jnp.mod(i, L), nh=nh, mode=mode)
        bump = (jnp.mean(out.astype(jnp.float32)) * 1e-9).astype(x.dtype)
        return bump.astype(jnp.float32), (x + bump, i + 1)

    sec = timed_loop(fstep, (x0, jnp.int32(0)), iters)
    bytes_per = K * NH_QKV + (K // GROUP) * 2 * NH_QKV * 4
    report(f"qkv_nh{nh}_{mode}", sec, elems=bytes_per,
           note=f"floor {bytes_per / 810e9 * 1e6:.1f} us; "
                f"eff {bytes_per / 810e9 / sec * 100:.0f}%")
    return sec


def run_mlp(gup, gs, dn, ds, chunk, mode, iters):
    nc = F // chunk
    cg = chunk // GROUP
    ds4 = ds.reshape(L, nc, cg, D)
    x0 = jnp.zeros((8, K), jnp.bfloat16).at[0, :].set(0.01)

    def fstep(args):
        x, i = args
        out = mlp_call(x2=x, gup_packed=gup, gup_scales=gs, dn_packed=dn,
                       dn_scales4=ds4, layer=jnp.mod(i, L),
                       chunk=chunk, mode=mode)
        bump = (jnp.mean(out.astype(jnp.float32)) * 1e-9).astype(x.dtype)
        return bump.astype(jnp.float32), (x + bump, i + 1)

    sec = timed_loop(fstep, (x0, jnp.int32(0)), iters)
    bytes_per = (K * F + F * (D // 2)
                 + (K // GROUP) * 2 * F * 4 + (F // GROUP) * D * 4)
    report(f"mlp_c{chunk}_{mode}", sec, elems=bytes_per,
           note=f"floor {bytes_per / 810e9 * 1e6:.1f} us; "
                f"eff {bytes_per / 810e9 / sec * 100:.0f}%")
    return sec


if __name__ == "__main__":
    print(json.dumps({"backend": jax.default_backend()}), flush=True)
    key = jax.random.PRNGKey(0)
    iters = int(os.environ.get("PROBE_ITERS", "300"))

    qp, qs = make_qkv(key)
    qkv_arms = [(512, m) for m in ("full", "dma", "raw", "i32lite", "fp")]
    qkv_arms += [(256, "full"), (1280, "full")]
    for nh, mode in qkv_arms:
        try:
            run_qkv(qp, qs, nh, mode, iters)
        except Exception as e:  # noqa: BLE001 — keep sweeping past one bad arm
            print(json.dumps({"exp": f"qkv_nh{nh}_{mode}",
                              "error": str(e)[:300]}), flush=True)
    del qp, qs

    gup, gs, dn, ds = make_mlp(key)
    mlp_arms = [(512, m) for m in ("full", "dma", "raw", "i32lite", "fp")]
    mlp_arms += [(256, "full"), (1024, "full")]
    for chunk, mode in mlp_arms:
        try:
            run_mlp(gup, gs, dn, ds, chunk, mode, iters)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"exp": f"mlp_c{chunk}_{mode}",
                              "error": str(e)[:300]}), flush=True)
    print(json.dumps({"done": True}), flush=True)
