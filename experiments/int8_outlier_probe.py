"""Flagship-dims W8A8-encoder accuracy probe under outlier-channel weights.

The question the round-3 VERDICT asks before the +17% --int8_encoder path
can become the default: does W8A8 (dynamic per-row activation quant) hold
its ~1% error claim in the OUTLIER regime real checkpoints occupy, not just
on easy Gaussian random inits?

Method: whisper-large-v3-turbo dims (32L, d=1280), random init, optional
models/outliers.py injection at several magnitudes. For each arm, run the
SAME mel through
  f32  encode        (ground truth)
  bf16 encode        (the current default headline path — the error floor)
  int8 encode_int8   (the candidate default)
and report per-token relative-L2 error of bf16 and int8 vs f32, plus
int8-vs-bf16 directly. The gate: int8 error must stay within a small
multiple of the bf16 floor at every outlier magnitude.

Run: python experiments/int8_outlier_probe.py --platform cpu --seq 512
     (CPU, ~10 min) or on TPU with --seq 1500 after the bench queue drains.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default=None)
    ap.add_argument("--seq", type=int, default=1500,
                    help="encoder frames (mel frames / 2); 1500 = 30 s")
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--scales", type=float, nargs="*",
                    default=[0.0, 20.0, 50.0, 100.0])
    ap.add_argument("--n_channels", type=int, default=4)
    ap.add_argument("--alphas", type=float, nargs="*", default=[0.5, 0.75],
                    help="SmoothQuant migration strengths to probe "
                         "alongside the naive (unsmoothed) arm")
    args = ap.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")

    from audio_llama_tpu.config import MelConfig, WhisperConfig
    from audio_llama_tpu.models import outliers, whisper, whisper_int8
    from audio_llama_tpu.ops import mel as mel_ops

    wcfg = WhisperConfig.large_v3_turbo().replace(gelu_approx=True)
    mcfg = MelConfig(num_mel_bins=128,
                     max_audio_seconds=args.seq * 2 * 160 / 16000)

    key = jax.random.PRNGKey(0)
    kw, ka, ko = jax.random.split(key, 3)
    params = jax.jit(
        lambda k: whisper.init_params(wcfg, k, dtype=jnp.float32)
    )(kw)
    audio = jax.random.normal(
        ka, (args.batch, mcfg.max_samples), jnp.float32) * 0.1
    mel = jax.jit(lambda a: mel_ops.log_mel(a, mcfg))(audio)

    @jax.jit
    def run_f32(p):
        return whisper.encode(p, wcfg, mel, jnp.float32)

    @jax.jit
    def run_bf16(p):
        return whisper.encode(p, wcfg, mel, jnp.bfloat16)

    @jax.jit
    def run_int8(p):
        return whisper_int8.encode_int8(
            whisper_int8.quantize_encoder(p), wcfg, mel, jnp.bfloat16)

    def make_run_smooth(alpha):
        @jax.jit
        def run_smooth(p):
            stats = whisper_int8.calibrate_encoder(p, wcfg, mel, jnp.bfloat16)
            return whisper_int8.encode_int8(
                whisper_int8.quantize_encoder(p, act_stats=stats, alpha=alpha),
                wcfg, mel, jnp.bfloat16)
        return run_smooth

    smooth_runs = {a: make_run_smooth(a) for a in args.alphas}

    @jax.jit
    def rel_err(y, ref):
        ref = ref.astype(jnp.float32)
        d = y.astype(jnp.float32) - ref
        num = jnp.linalg.norm(d, axis=-1)
        den = jnp.maximum(jnp.linalg.norm(ref, axis=-1), 1e-6)
        r = num / den
        return jnp.mean(r), jnp.percentile(r, 99), jnp.max(r)

    inject = jax.jit(
        lambda p, s: outliers.inject_whisper_outliers(
            p, ko, n=args.n_channels, scale=s),
        static_argnums=(1,),
    )

    rows = []
    for s in args.scales:
        p = params if s == 0 else inject(params, s)
        ref = run_f32(p)
        b = run_bf16(p)
        q = run_int8(p)
        eb = tuple(float(x) for x in rel_err(b, ref))
        eq = tuple(float(x) for x in rel_err(q, ref))
        row = {
            "outlier_scale": s,
            "bf16_vs_f32": {"mean": eb[0], "p99": eb[1], "max": eb[2]},
            "int8_vs_f32": {"mean": eq[0], "p99": eq[1], "max": eq[2]},
            "int8_over_bf16_floor": eq[0] / max(eb[0], 1e-9),
        }
        for a, fn in smooth_runs.items():
            es = tuple(float(x) for x in rel_err(fn(p), ref))
            row[f"smooth{a}_vs_f32"] = {
                "mean": es[0], "p99": es[1], "max": es[2]}
            row[f"smooth{a}_over_bf16_floor"] = es[0] / max(eb[0], 1e-9)
        rows.append(row)
        print(json.dumps(row), flush=True)

    worst = max(r["int8_over_bf16_floor"] for r in rows)
    print(f"# worst naive int8/bf16 error ratio across arms: {worst:.2f}",
          file=sys.stderr)


if __name__ == "__main__":
    main()
