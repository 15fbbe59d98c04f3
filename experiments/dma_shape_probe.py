"""HBM->VMEM streaming bandwidth vs block size (Pallas auto-pipelined
BlockSpec fetches — the same machinery the decode-attention kernel's slab
reads use). Decides whether the decode kernel's ~260 GB/s effective rate is
a per-DMA-size problem (262 KB slabs) fixable by batching heads into
fewer, bigger slabs.

    nohup python -u experiments/dma_shape_probe.py > /tmp/dma_probe.log 2>&1 &
"""

import functools
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from experiments.enc_kernel_bench import timed_loop, report


def make_reader(total_mb=128, block_kb=256):
    """Stream a total_mb int8 array through VMEM in block_kb blocks; emit a
    1-element checksum per block (forces the read, output traffic trivial)."""
    rows = 8
    lane = block_kb * 1024 // rows  # block [8, lane] int8
    n = total_mb * 1024 * 1024 // (rows * lane)

    def kernel(x_ref, o_ref):
        # touch only a [8,128] corner: the BlockSpec DMAs the WHOLE block
        # regardless, and the reduce must not scale with bytes (the first
        # version summed the full block and measured VPU reduce throughput,
        # ~250 GB/s — see the superseded numbers in /tmp/dma_probe.log)
        o_ref[:, :] = jnp.sum(x_ref[:, :128].astype(jnp.int32), keepdims=True)

    @jax.jit
    def read(x):
        return pl.pallas_call(
            kernel,
            grid=(n,),
            in_specs=[pl.BlockSpec((rows, lane), lambda i: (i, 0))],
            out_specs=pl.BlockSpec((1, 1), lambda i: (0, 0)),
            out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32),
        )(x)

    shape = (n * rows, lane)
    return read, shape, n


def main():
    print(json.dumps({"backend": jax.default_backend()}), flush=True)
    total_mb = 128
    for block_kb in (64, 256, 1024, 4096):
        read, shape, n = make_reader(total_mb, block_kb)
        x = jnp.ones(shape, jnp.int8)

        def fstep(a, read=read):
            x, = a
            s = read(x)
            bump = (s[0, 0] % 2).astype(jnp.int8)
            return s[0, 0].astype(jnp.float32) * 1e-9, (x + bump,)

        sec = timed_loop(fstep, (x,), 20)
        gbps = total_mb / 1024 / sec
        report(f"stream_{block_kb}kb", sec,
               elems=total_mb * 1024 * 1024,
               note=f"{n} blocks")
    print(json.dumps({"done": True}), flush=True)


if __name__ == "__main__":
    main()
