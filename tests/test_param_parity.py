"""Trainable-parameter-count parity vs the reference's logged runs
(reference src/training.log). Counting uses jax.eval_shape so no flagship-
sized arrays are materialized.

Mapping (flagship dims: Llama-3.2-3B + whisper-large-v3-turbo, projector
hid=(1280+3072)//2=2176, LoRA targets {q,k,v,gate,up,down}_proj over 28
layers):

    projector = 1280*2176+2176 + 2176*3072+3072 + 2*3072 =  9,481,344
    lora(r)   = 28 * r * 48,128   (48,128 = sum of in+out over targets)

    r=64  ->  95,726,720  == reference run 2025-04-01 17:27:15 (exact)
    r=160 -> 225,094,784  == reference run 2025-04-01 17:25:41 (exact)

The other two logged counts (48,253,504 / 436,357,696) both sit exactly
4,350,528 below our r=32 / r=320 counts — a fixed-size block the log doesn't
explain (no config is recorded); they do not correspond to any rank under
the reference's own stated target set."""

import os
import sys

import jax
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from audio_llama_tpu.config import (
    AudioLLMConfig,
    LlamaConfig,
    LoraConfig,
    WhisperConfig,
)
from audio_llama_tpu.models import allm


def _flagship_count(rank: int) -> int:
    cfg = AudioLLMConfig(
        llama=LlamaConfig.llama32_3b(),
        whisper=WhisperConfig.large_v3_turbo(),
        lora=LoraConfig(rank=rank, alpha=2 * rank),
    )
    tree = jax.eval_shape(
        lambda k: allm.init_trainable(cfg, k), jax.random.PRNGKey(0)
    )
    return sum(x.size for x in jax.tree.leaves(tree))


@pytest.mark.parametrize(
    "rank,expected",
    [
        (64, 95_726_720),  # reference training.log 2025-04-01 17:27:15
        (160, 225_094_784),  # reference training.log 2025-04-01 17:25:41
    ],
)
def test_flagship_trainable_count_matches_reference_log(rank, expected):
    assert _flagship_count(rank) == expected


def test_flagship_count_formula():
    """Analytic formula stays in sync with init_trainable."""
    proj = 1280 * 2176 + 2176 + 2176 * 3072 + 3072 + 2 * 3072
    per_rank = 28 * 48_128
    for r in (8, 64, 160):
        assert _flagship_count(r) == proj + per_rank * r
