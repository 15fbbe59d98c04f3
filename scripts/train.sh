#!/usr/bin/env bash
# Canonical training invocation (analog of reference scripts/train.sh:1-5;
# --fp16 maps to bf16 on TPU).
python -m audio_llama_tpu.training.train \
	--data_path ./audio_instruction_examples.json \
	--audio_dir ./ \
	--batch_size 16 \
	--fp16
