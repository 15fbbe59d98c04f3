"""QuaRot-style residual-stream rotation for low-bit llama quantization.

The diagonal family (SmoothQuant row equalization, clipped-RTN) is closed
by a scaling argument (BASELINE.md round-4 int4 quality table): for any
diagonal rescaling D, sum_k |x_k|*|W_k| is invariant, so hot channels keep
dominating their scale groups. The non-diagonal generalization is an
ORTHOGONAL rotation R of the residual stream (QuaRot / SpinQuant): every
stream channel becomes a random mixture of all channels, outlier mass
spreads as 1/sqrt(D) across the group-absmax windows, and the transform is
EXACT — attention and MLP are invariant because R cancels algebraically:

    q = norm(x R) @ (R^T diag(g) Wq) = (norm(x) * g) @ Wq        (RMSNorm is
rotation-invariant once its elementwise gamma is folded into the consuming
projections: rms(x R) == rms(x)).

We use the "sandwich" form: the rotation rides the tree as params["rot"]
and llama_forward rotates the stream ONCE after the embedding lookup and
un-rotates ONCE before the final norm (models/llama.py). That keeps the
embedding table and the (tied) unembedding untouched — folding R into a
tied table would corrupt the unembed — and it makes the audio path free:
the spliced projector output enters llama_forward as inputs_embeds and is
rotated with everything else. Runtime cost: two [*, D] @ [D, D] matmuls
per program (~2 x 18 MB bf16 weight reads per decode step at 3B — ~2% of
the int4 weight stream; zero at prefill scale).

What gets transformed offline (rotate_llama):
  - q/k/v/gate/up_proj:  W <- R^T diag(gamma_ln) W   (gamma folded, LN -> 1)
  - o/down_proj:         W <- W R                     (outputs re-enter the
                                                       rotated stream)
  - trainable LoRA factors ride along (rotate_lora): input-side A factors
    get the same R^T diag(gamma) fold; down/o B factors get B R.
  - embed / final_ln / lm_head: untouched (sandwich form).

Quantizers (llama_int4 / llama_gptq / llama_int8) pass "rot" through and
quantize the rotated weights; GPTQ calibration Grams collected on the
rotated full-precision tree are automatically Grams of the rotated inputs.

Reference analog: none (the reference serves fp16 HF modules,
src/inference.py:24-49); this extends our own quantized-serving lead.
Technique: QuaRot (arXiv 2404.00456) / SpinQuant (2405.16406) — reimplemented
from the papers' math for our stacked-[L] functional trees.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .llama import LlamaConfig, Params

# LoRA targets whose INPUT is the (rotated, gamma-stripped) stream, keyed to
# the LN whose gamma they absorbed.
_IN_SIDE = {
    "q_proj": "input_ln",
    "k_proj": "input_ln",
    "v_proj": "input_ln",
    "gate_proj": "post_attn_ln",
    "up_proj": "post_attn_ln",
}
# LoRA targets whose OUTPUT re-enters the stream.
_OUT_SIDE = ("o_proj", "down_proj")


def random_rotation(key: jax.Array, d: int, dtype=jnp.float32) -> jnp.ndarray:
    """Haar-uniform random orthogonal [d, d] via QR with sign fix."""
    a = jax.random.normal(key, (d, d), jnp.float32)
    q, r = jnp.linalg.qr(a)
    q = q * jnp.sign(jnp.diagonal(r))[None, :]
    return q.astype(dtype)


def _in_rot(w: jnp.ndarray, gamma: jnp.ndarray, rf: jnp.ndarray) -> jnp.ndarray:
    """[L, D, N] input-side fold: W <- R^T diag(gamma_l) W, per layer."""

    def one(args):
        m, g = args
        return (rf.T @ (m.astype(jnp.float32) * g[:, None])).astype(w.dtype)

    return jax.lax.map(one, (w, gamma.astype(jnp.float32)))


def _out_rot(w: jnp.ndarray, rf: jnp.ndarray) -> jnp.ndarray:
    """[L, A, D] output-side fold: W <- W R, per layer."""
    return jax.lax.map(
        lambda m: (m.astype(jnp.float32) @ rf).astype(w.dtype), w
    )


def _head_cols_rot(w: jnp.ndarray, r2: jnp.ndarray, hd: int) -> jnp.ndarray:
    """[L, D, H*hd]: rotate each head's OUTPUT column block by R2."""
    L, D, N = w.shape

    def one(m):
        m3 = m.astype(jnp.float32).reshape(D, N // hd, hd)
        return jnp.einsum("dhk,kj->dhj", m3, r2).reshape(D, N).astype(w.dtype)

    return jax.lax.map(one, w)


def _head_rows_rot(w: jnp.ndarray, r2: jnp.ndarray, hd: int) -> jnp.ndarray:
    """[L, H*hd, D]: counter-rotate each head's INPUT row block (R2^T @)."""
    L, N, D = w.shape

    def one(m):
        m3 = m.astype(jnp.float32).reshape(N // hd, hd, D)
        return jnp.einsum("kj,hkd->hjd", r2, m3).reshape(N, D).astype(w.dtype)

    return jax.lax.map(one, w)


def rotate_llama(
    params: Params,
    cfg: LlamaConfig,
    key_or_rot,
    lora: dict | None = None,
    heads: bool = True,
):
    """Full-precision llama tree -> exactly-equivalent rotated tree.

    key_or_rot: a PRNGKey (a fresh Haar rotation is drawn) or an explicit
    orthogonal [D, D] matrix. Returns the rotated tree (with params["rot"])
    — and, if a trainable LoRA overlay is passed, (tree, rotated_lora) so
    adapters trained on the unrotated model keep working verbatim.

    heads (default on): also apply the per-head R2 [hd, hd] rotation of
    the v/o pair — v_proj's per-head output columns get R2 and o_proj's
    per-head input rows get R2^T, cancelling through the (linear-in-v)
    attention mix. This spreads o_proj's head-space input outliers AND the
    v activations that the int8/int4 KV cache quantizes per row. It folds
    completely (no runtime term, nothing stored); q/k stay untouched —
    RoPE sits between their projections and the dot product, so an hd
    rotation would not commute.

    The input tree must be full precision (quantize AFTER rotating) and
    not already rotated.
    """
    if "rot" in params:
        raise ValueError("tree is already rotated")
    layers = params["layers"]
    if isinstance(layers.get("q_proj", layers.get("qkv_proj")), dict):
        raise ValueError(
            "rotate_llama expects a full-precision tree (rotate before "
            "quantizing)"
        )
    d = cfg.hidden_size
    if isinstance(key_or_rot, jnp.ndarray) and key_or_rot.ndim == 2:
        rot = key_or_rot
        if rot.shape != (d, d):
            raise ValueError(f"rotation must be [{d}, {d}], got {rot.shape}")
    else:
        rot = random_rotation(key_or_rot, d)
    rf = rot.astype(jnp.float32)

    new_layers = dict(layers)
    g_in = layers["input_ln"]
    g_post = layers["post_attn_ln"]
    for name, ln in _IN_SIDE.items():
        g = g_in if ln == "input_ln" else g_post
        new_layers[name] = _in_rot(layers[name], g, rf)
    for name in _OUT_SIDE:
        new_layers[name] = _out_rot(layers[name], rf)
    new_layers["input_ln"] = jnp.ones_like(g_in)
    new_layers["post_attn_ln"] = jnp.ones_like(g_post)

    r2 = None
    if heads:
        hd = cfg.head_dim
        key2 = (
            jax.random.PRNGKey(0x52) if isinstance(key_or_rot, jnp.ndarray)
            and key_or_rot.ndim == 2 else jax.random.fold_in(key_or_rot, 2)
        )
        r2 = random_rotation(key2, hd).astype(jnp.float32)
        new_layers["v_proj"] = _head_cols_rot(new_layers["v_proj"], r2, hd)
        new_layers["o_proj"] = _head_rows_rot(new_layers["o_proj"], r2, hd)

    out = dict(params)
    out["layers"] = new_layers
    out["rot"] = rot
    if lora is None:
        return out
    return out, rotate_lora(lora, g_in, g_post, rot, r2=r2, hd=cfg.head_dim)


def rotate_lora(lora: dict, g_in: jnp.ndarray, g_post: jnp.ndarray,
                rot: jnp.ndarray, r2: jnp.ndarray | None = None,
                hd: int | None = None) -> dict:
    """Transform a trainable LoRA overlay to act on the rotated stream.

    Input-side factors a [L, D, r] absorb the same R^T diag(gamma) as their
    base weights; output-side b [L, r, D] factors of o/down get b R. With
    the per-head R2 (r2, hd): v_proj's b columns rotate per head and
    o_proj's a rows counter-rotate, mirroring the base v/o fold. The
    adapted model's logits are unchanged (same algebra as the base fold).
    """
    rf = rot.astype(jnp.float32)
    layers = dict(lora["layers"])
    for name, br in list(layers.items()):
        br = dict(br)
        if name in _IN_SIDE:
            g = g_in if _IN_SIDE[name] == "input_ln" else g_post
            br["a"] = _in_rot(br["a"], g, rf)
        if name in _OUT_SIDE:
            br["b"] = _out_rot(br["b"], rf)
        if r2 is not None:
            if name == "v_proj":  # b [L, r, Hkv*hd]: per-head columns
                br["b"] = _head_cols_rot(br["b"], r2, hd)
            if name == "o_proj":  # a [L, Hq*hd, r]: per-head rows
                br["a"] = _head_rows_rot(br["a"], r2, hd)
        layers[name] = br
    out = dict(lora)
    out["layers"] = layers
    return out
