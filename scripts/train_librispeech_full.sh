#!/usr/bin/env bash
# Full LibriSpeech run (analog of reference src/run_train.sh:1-8).
python -m audio_llama_tpu.training.train \
	--data_path data/librispeech_full/examples.json \
	--audio_dir audio/ \
	--dataset_config data/librispeech_full/dataset_config.json \
	--batch_size 4 \
	--fp16 \
	--num_workers 16 \
	--use_wandb
