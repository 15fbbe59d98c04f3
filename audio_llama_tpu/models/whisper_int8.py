"""W8A8 int8 Whisper encoder with SmoothQuant activation smoothing.

v5e's MXU runs int8 at 2x bf16 peak (~394 TOPS vs ~197 TFLOPs). For the
FROZEN encoder — the dominant FLOPs of audio encoding — this provides:

  calibrate_encoder(params, cfg, mel):  one full-precision forward that
      records the per-INPUT-CHANNEL absmax at each quantized linear
      (q/k/v share the attn_ln output; out_proj sees the attention output;
      fc1 the mlp_ln output; fc2 the GELU output).
  quantize_encoder(params, act_stats=None, alpha=0.5):  per-OUTPUT-CHANNEL
      symmetric int8 weights for q/k/v/out_proj/fc1/fc2 (conv stem, norms,
      biases stay bf16/f32). With act_stats, each linear also gets a
      calibrated per-channel SMOOTHER s_j = act_max_j^alpha /
      w_max_j^(1-alpha) (SmoothQuant): the weight is scaled by s before
      int8 rounding, and the activation is divided by s at runtime.
  encode_int8(...):  same architecture as whisper.encode, but every linear
      is dynamic-activation W8A8: (optional) smoother divide, per-row
      activation scales, int8 x int8 matmul with int32 accumulation,
      rescale in f32. Attention itself (flash) stays bf16.

Why smoothing is mandatory, not optional polish: real encoder checkpoints
have outlier channels 20-100x the median magnitude, and dynamic per-ROW
activation quant lets one hot channel inflate the row absmax and crush
every other channel's resolution. Measured on flagship dims with injected
outliers (experiments/int8_outlier_probe.py): naive W8A8 hits 12-57%
relative output error (10x the bf16 error floor); smoothing restores it to
within ~2x the floor. The smoother divide costs one fusable elementwise
multiply per linear — zero extra matmuls, XLA fuses it into the quantize
step. Accuracy is gated offline by tests/test_outlier_gate.py (WER +
logit-KL on the synthetic-speech corpus under outlier-injected weights).

The reference has no quantization path at all (fp16 AMP only, reference
src/train.py:254); this guards OUR serving opt-in.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from ..config import WhisperConfig
from ..ops.norms import layer_norm


def _quantize_weight(w: jnp.ndarray):
    """[..., in, out] -> (int8 [..., in, out], f32 scales [..., out]):
    symmetric per-output-channel."""
    absmax = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=-2)
    scale = jnp.maximum(absmax, 1e-8) / 127.0
    q = jnp.clip(
        jnp.round(w.astype(jnp.float32) / scale[..., None, :]), -127, 127
    ).astype(jnp.int8)
    return q, scale


_QUANT_TARGETS = ("q_proj", "k_proj", "v_proj", "out_proj", "fc1", "fc2")

# which calibration stat feeds each linear's smoother
_STAT_KEY = {
    "q_proj": "qkv", "k_proj": "qkv", "v_proj": "qkv",
    "out_proj": "out", "fc1": "fc1", "fc2": "fc2",
}


def _row_absmax(w: jnp.ndarray) -> jnp.ndarray:
    """[..., in, out] -> per-input-channel |w| max [..., in]."""
    return jnp.maximum(
        jnp.max(jnp.abs(w.astype(jnp.float32)), axis=-1), 1e-5
    )


def _smooth_from_max(act_max: jnp.ndarray, wmax: jnp.ndarray,
                     alpha: float) -> jnp.ndarray:
    a = jnp.maximum(act_max.astype(jnp.float32), 1e-5)
    s = a ** alpha / wmax ** (1.0 - alpha)
    s = s / jnp.median(s, axis=-1, keepdims=True)
    return jnp.clip(s, 1e-2, 1e4)


def smooth_scales(act_max: jnp.ndarray, w: jnp.ndarray,
                  alpha: float = 0.5) -> jnp.ndarray:
    """SmoothQuant migration strength: s_j = act_max_j^a / w_max_j^(1-a),
    normalized to median 1 (keeps the global scale stable) and clipped.
    act_max [..., in] per-channel absmax; w [..., in, out]."""
    return _smooth_from_max(act_max, _row_absmax(w), alpha)


def _mulcast(x, m):
    return (x.astype(jnp.float32) * m).astype(x.dtype)


def quantize_encoder(params: dict, act_stats: dict | None = None,
                     alpha: float = 0.5, fold: bool = True) -> dict:
    """Whisper param tree -> same tree with int8 {'w_q','w_s'} replacing 'w'
    in the transformer linears. With act_stats (from calibrate_encoder),
    each linear is SmoothQuant-smoothed: the weight absorbs s and the
    activation is divided by s.

    fold=True (production) makes 5 of the 6 per-layer activation divides
    FREE by algebraic folding — measured on TPU, the runtime divides cost
    ~6% encode throughput (2128 -> 1996 audio-s/s), and all but fc2's fold
    exactly:
      q/k/v share the attn_ln output -> one joint smoother folded into the
        attn_ln scale/bias (LN output is elementwise-scaled per channel);
      fc1 reads the mlp_ln output -> folded into mlp_ln likewise;
      out_proj reads the attention output, which is LINEAR in v -> 1/s
        folds into v_proj's output columns (+bias), s into out_proj's rows;
      fc2 reads gelu(fc1 out) — a nonlinearity, so its smoother stays a
        runtime 'a_s' divide (one per layer instead of six).
    fold=False keeps every smoother as a runtime divide (parity twin)."""
    out = dict(params)
    layers = dict(params["layers"])

    if act_stats is not None and fold:
        # joint q/k/v smoother (they share the attn_ln output, so one
        # fold must serve all three): conservative wmax = max over the
        # three weights' rows
        w_q, w_k, w_v = (layers[n]["w"] for n in ("q_proj", "k_proj",
                                                  "v_proj"))
        s_qkv = _smooth_from_max(
            act_stats["qkv"],
            jnp.maximum(_row_absmax(w_q),
                        jnp.maximum(_row_absmax(w_k), _row_absmax(w_v))),
            alpha,
        )
        s_out = smooth_scales(act_stats["out"], layers["out_proj"]["w"],
                              alpha)
        s_fc1 = smooth_scales(act_stats["fc1"], layers["fc1"]["w"], alpha)

        ln = dict(layers["attn_ln"])
        ln["scale"] = _mulcast(ln["scale"], 1.0 / s_qkv)
        ln["bias"] = _mulcast(ln["bias"], 1.0 / s_qkv)
        layers["attn_ln"] = ln
        ln = dict(layers["mlp_ln"])
        ln["scale"] = _mulcast(ln["scale"], 1.0 / s_fc1)
        ln["bias"] = _mulcast(ln["bias"], 1.0 / s_fc1)
        layers["mlp_ln"] = ln

        for n in ("q_proj", "k_proj", "v_proj"):
            mod = dict(layers[n])
            mod["w"] = _mulcast(mod["w"], s_qkv[..., :, None])
            layers[n] = mod
        mod = dict(layers["fc1"])
        mod["w"] = _mulcast(mod["w"], s_fc1[..., :, None])
        layers["fc1"] = mod
        # attention is linear in v: 1/s_out on v's output columns (+bias)
        # scales the attention output per channel; s_out on out_proj rows
        # undoes it inside the matmul
        mod = dict(layers["v_proj"])
        mod["w"] = _mulcast(mod["w"], (1.0 / s_out)[..., None, :])
        mod["b"] = _mulcast(mod["b"], 1.0 / s_out)
        layers["v_proj"] = mod
        mod = dict(layers["out_proj"])
        mod["w"] = _mulcast(mod["w"], s_out[..., :, None])
        layers["out_proj"] = mod

    for name in _QUANT_TARGETS:
        mod = dict(layers[name])
        w = mod.pop("w")
        if act_stats is not None and (not fold or name == "fc2"):
            s = smooth_scales(act_stats[_STAT_KEY[name]], w, alpha)
            w = w.astype(jnp.float32) * s[..., :, None]
            mod["a_s"] = s
        wq, ws = _quantize_weight(w)
        mod["w_q"] = wq
        mod["w_s"] = ws
        layers[name] = mod
    out["layers"] = layers
    return out


def quantize_encoder_smoothed(
    params: dict,
    cfg: WhisperConfig,
    calib_mel: jnp.ndarray,
    alpha: float = 0.5,
    compute_dtype=jnp.bfloat16,
) -> dict:
    """The production int8-encoder quantization: calibrate on a
    representative mel batch, then quantize with SmoothQuant smoothing.
    Measured vs naive quantize_encoder() at flagship dims with injected
    outlier channels (experiments/int8_outlier_probe.py): naive 12-57%
    relative output error; smoothed alpha=0.5 within ~2x the bf16 error
    floor at every outlier magnitude (and no worse than naive on clean
    Gaussian weights)."""
    stats = calibrate_encoder(params, cfg, calib_mel, compute_dtype)
    return quantize_encoder(params, act_stats=stats, alpha=alpha)


def _int8_linear(x: jnp.ndarray, wq: jnp.ndarray, ws: jnp.ndarray, b=None,
                 a_s=None):
    """(Optional smoother divide) + dynamic per-row activation quant + int8
    matmul + f32 rescale.

    x [B, T, in] (bf16/f32), wq [in, out] int8, ws [out] f32, a_s [in] f32.
    """
    xf = x.astype(jnp.float32)
    if a_s is not None:
        xf = xf / a_s
    s_r = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1, keepdims=True), 1e-8) / 127.0
    xq = jnp.clip(jnp.round(xf / s_r), -127, 127).astype(jnp.int8)
    acc = lax.dot_general(
        xq, wq, (((2,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )
    y = acc.astype(jnp.float32) * s_r * ws.astype(jnp.float32)
    if b is not None:
        y = y + b.astype(jnp.float32)
    return y


def encode_int8(
    params: dict,
    cfg: WhisperConfig,
    mel: jnp.ndarray,
    compute_dtype=jnp.bfloat16,
    attn_impl: str = "auto",
    attn_algo: str = "v3",  # fastest measured: 0.906 ms/layer attention (v3_sweep)
) -> jnp.ndarray:
    """W8A8 twin of whisper.encode over quantize_encoder(params)."""
    from . import whisper as wm
    from ..ops import enc_attention as ea
    from ..ops import flash_attention as fa
    from ..ops.attention import mha

    # the encoder kernel's in-kernel head slicing wants MXU-friendly head
    # widths; off-sized (toy) dims fall back to stock flash on TPU
    kernel_dims_ok = cfg.head_dim % 64 == 0 and cfg.d_model % 128 == 0
    use_kernel = (
        attn_impl in ("enc_kernel", "enc_kernel_interpret")
        or (attn_impl == "auto" and fa.available() and kernel_dims_ok)
    )
    use_flash = not use_kernel and (
        attn_impl == "flash" or (attn_impl == "auto" and fa.available())
    )
    approx = cfg.gelu_approx
    x = mel.astype(compute_dtype)
    x = jax.nn.gelu(
        wm._conv1d(x, params["conv1"]["w"].astype(compute_dtype),
                   params["conv1"]["b"].astype(compute_dtype), 1),
        approximate=approx,
    )
    x = jax.nn.gelu(
        wm._conv1d(x, params["conv2"]["w"].astype(compute_dtype),
                   params["conv2"]["b"].astype(compute_dtype), 2),
        approximate=approx,
    )
    x = jnp.swapaxes(x, 1, 2)
    B, T, D = x.shape
    x = x + params["pos_embed"][:T].astype(compute_dtype)

    T_real = T
    seg_mask = None
    if use_flash or use_kernel:
        T_pad = fa._round_up(T, 128 if use_kernel else fa._TILE)
        if T_pad != T:
            x = jnp.pad(x, ((0, 0), (0, T_pad - T), (0, 0)))
            if use_flash:
                seg_mask = jnp.concatenate(
                    [jnp.ones((B, T), jnp.int32),
                     jnp.zeros((B, T_pad - T), jnp.int32)], axis=1,
                )
            T = T_pad

    H, hd = cfg.num_heads, cfg.head_dim

    def lin(p, name, xx, bias=True):
        m = p[name]
        return _int8_linear(xx, m["w_q"], m["w_s"],
                            m.get("b") if bias else None, m.get("a_s"))

    def layer_step(carry, p):
        (x,) = carry
        h = layer_norm(x, p["attn_ln"]["scale"], p["attn_ln"]["bias"], cfg.layer_norm_eps)
        q = lin(p, "q_proj", h).astype(compute_dtype)
        k = lin(p, "k_proj", h, bias=False).astype(compute_dtype)
        v = lin(p, "v_proj", h).astype(compute_dtype)
        q = q.reshape(B, T, H, hd)
        k = k.reshape(B, T, H, hd)
        v = v.reshape(B, T, H, hd)
        if use_kernel:
            attn = ea.enc_attention(
                q, k, v,
                valid_len=T_real if T_real != T else None,
                scale=hd ** -0.5,
                interpret=attn_impl == "enc_kernel_interpret",
                algo=attn_algo,
            )
        elif use_flash:
            attn = fa.flash_mha(q, k, v, mask=seg_mask, causal=False, scale=hd ** -0.5)
        else:
            attn = mha(q, k, v, bias=None, scale=hd ** -0.5)
        attn = lin(p, "out_proj", attn.reshape(B, T, D)).astype(compute_dtype)
        x = x + attn
        h = layer_norm(x, p["mlp_ln"]["scale"], p["mlp_ln"]["bias"], cfg.layer_norm_eps)
        h = jax.nn.gelu(lin(p, "fc1", h), approximate=approx).astype(compute_dtype)
        x = x + lin(p, "fc2", h).astype(compute_dtype)
        return (x,), None

    (x,), _ = lax.scan(layer_step, (x,), params["layers"])
    if T_real != T:
        x = x[:, :T_real]
    x = layer_norm(x, params["ln_post"]["scale"], params["ln_post"]["bias"], cfg.layer_norm_eps)
    return x


def calibrate_encoder(
    params: dict,
    cfg: WhisperConfig,
    mel: jnp.ndarray,
    compute_dtype=jnp.bfloat16,
) -> dict:
    """One full-precision encoder forward over a calibration mel batch,
    recording the per-input-channel absmax each quantized linear sees:
    {'qkv': [L, D], 'out': [L, D], 'fc1': [L, D], 'fc2': [L, F]}.

    Run once offline on representative audio (real clips for real
    checkpoints; the bench batch for random-weight throughput runs), feed
    into quantize_encoder(act_stats=...). Uses stock XLA attention — the
    stats are absmax envelopes, insensitive to the attention kernel."""
    from . import whisper as wm
    from ..ops.attention import mha

    approx = cfg.gelu_approx
    x = mel.astype(compute_dtype)
    x = jax.nn.gelu(
        wm._conv1d(x, params["conv1"]["w"].astype(compute_dtype),
                   params["conv1"]["b"].astype(compute_dtype), 1),
        approximate=approx,
    )
    x = jax.nn.gelu(
        wm._conv1d(x, params["conv2"]["w"].astype(compute_dtype),
                   params["conv2"]["b"].astype(compute_dtype), 2),
        approximate=approx,
    )
    x = jnp.swapaxes(x, 1, 2)
    B, T, D = x.shape
    x = x + params["pos_embed"][:T].astype(compute_dtype)
    H, hd = cfg.num_heads, cfg.head_dim

    def absmax(v):
        return jnp.max(jnp.abs(v.astype(jnp.float32)), axis=(0, 1))

    def lin(p, name, xx, bias=True):
        m = p[name]
        y = xx.astype(compute_dtype) @ m["w"].astype(compute_dtype)
        if bias and "b" in m:
            y = y + m["b"].astype(compute_dtype)
        return y

    def layer_step(carry, p):
        (x,) = carry
        h = layer_norm(x, p["attn_ln"]["scale"], p["attn_ln"]["bias"],
                       cfg.layer_norm_eps)
        st_qkv = absmax(h)
        q = lin(p, "q_proj", h).reshape(B, T, H, hd)
        k = lin(p, "k_proj", h, bias=False).reshape(B, T, H, hd)
        v = lin(p, "v_proj", h).reshape(B, T, H, hd)
        attn = mha(q, k, v, bias=None, scale=hd ** -0.5).reshape(B, T, D)
        st_out = absmax(attn)
        x = x + lin(p, "out_proj", attn)
        h = layer_norm(x, p["mlp_ln"]["scale"], p["mlp_ln"]["bias"],
                       cfg.layer_norm_eps)
        st_fc1 = absmax(h)
        h = jax.nn.gelu(lin(p, "fc1", h), approximate=approx)
        st_fc2 = absmax(h)
        x = x + lin(p, "fc2", h)
        return (x,), {"qkv": st_qkv, "out": st_out,
                      "fc1": st_fc1, "fc2": st_fc2}

    (_,), stats = lax.scan(layer_step, (x,), params["layers"])
    return stats
