"""int4_matmul block-size sweep at PREFILL geometry (NEXT r3 #3: the
M-large path was built for correctness, never measured). Sweeps block_m x
block_n at the three llama-3.2-3B linear shapes on an M=2048 activation
(bucket-1024 B2 admission / B16 prefill scale), vs the bf16 matmul and
the auto-picked blocks.

    nohup python -u experiments/int4_prefill_sweep.py > /tmp/int4_sweep.log 2>&1 &
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")

from experiments.enc_kernel_bench import timed_loop, report  # noqa: E402
from audio_llama_tpu.ops.int4_matmul import int4_matmul, quantize_pack  # noqa: E402


SHAPES = [  # (name, K, N) — llama-3.2-3B linears
    ("qkv", 3072, 4096),      # fused q|k|v (3072 + 512 + 512)
    ("gate_up", 3072, 16384),  # fused gate|up
    ("down", 8192, 3072),
]
M = 2048


def main():
    print(json.dumps({"backend": jax.default_backend()}), flush=True)
    rng = np.random.RandomState(0)
    for name, K, N in SHAPES:
        w = jnp.asarray(rng.randn(K, N).astype(np.float32) * 0.02)
        packed, scales = quantize_pack(w)
        x = jnp.asarray(rng.randn(M, K).astype(np.float32), jnp.bfloat16)
        flops = 2 * M * K * N

        # bf16 reference matmul
        wb = w.astype(jnp.bfloat16)

        def ref_step(a, wb=wb):
            x, = a
            y = x @ wb
            bump = (jnp.mean(y.astype(jnp.float32)) * 1e-6).astype(x.dtype)
            return bump.astype(jnp.float32), (x + bump,)

        sec = timed_loop(ref_step, (x,), 30)
        report(f"{name}_bf16", sec, flops=flops)

        cands = [(0, 0)]  # auto
        for bm in (128, 256, 512):
            for bn in (128, 256, 512):
                if (N // 2) % bn == 0:
                    cands.append((bm, bn))
        best = None
        for bm, bn in cands:
            def step(a, bm=bm, bn=bn, packed=packed, scales=scales):
                x, = a
                y = int4_matmul(x, packed, scales, block_m=bm, block_n=bn)
                bump = (jnp.mean(y.astype(jnp.float32)) * 1e-6).astype(x.dtype)
                return bump.astype(jnp.float32), (x + bump,)

            tag = "auto" if bm == 0 else f"m{bm}n{bn}"
            try:
                sec = timed_loop(step, (x,), 30)
                report(f"{name}_int4_{tag}", sec, flops=flops)
                if best is None or sec < best[0]:
                    best = (sec, tag)
            except Exception as e:  # noqa: BLE001
                print(json.dumps({"exp": f"{name}_int4_{tag}",
                                  "err": str(e).split(chr(10))[0][:120]}),
                      flush=True)
        print(json.dumps({"shape": name, "best": best[1],
                          "best_ms": round(best[0] * 1e3, 3)}), flush=True)
    print(json.dumps({"done": True}), flush=True)


if __name__ == "__main__":
    main()
