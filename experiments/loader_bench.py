"""Host data-pipeline throughput: threaded vs process-pool batch building
(round-3 VERDICT #6 — the loader must outrun N chips, not one).

Builds a synthetic corpus of 30 s FLAC clips with the repo's own encoder
(native/flac_encoder via data.audio_io), then measures end-to-end loader
throughput (decode -> resample -> tokenize -> collate) for both pool
flavors at several widths. Reports audio-seconds/sec; divide by the chip
encode rate (BASELINE.md) for chips-fed-per-host.

    python experiments/loader_bench.py [--clips 48] [--seconds 30]
"""

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--clips", type=int, default=48)
    ap.add_argument("--seconds", type=float, default=30.0)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--widths", type=str, default="1,2,4,8")
    args = ap.parse_args()

    from audio_llama_tpu.data import flac_write
    from audio_llama_tpu.data.dataset import AudioLLMDataset, DatasetConfig
    from audio_llama_tpu.data.loader import DataLoader
    from audio_llama_tpu.data.tokenizer import ByteTokenizer

    print(json.dumps({"cpus": os.cpu_count(), "clips": args.clips,
                      "clip_seconds": args.seconds}), flush=True)

    with tempfile.TemporaryDirectory() as root:
        audio_dir = os.path.join(root, "audio")
        os.makedirs(audio_dir)
        rng = np.random.default_rng(0)
        n = int(args.seconds * 16000)
        entries = []
        for i in range(args.clips):
            rel = f"clip_{i}.flac"
            x = (rng.normal(0, 0.1, n) * 32767).clip(-32768, 32767).astype(np.int64)
            flac_write.write_flac(os.path.join(audio_dir, rel), x, 16000)
            entries.append({
                "audio_paths": f"audio/{rel}",
                "text": "Transcribe the audio clip please.",
                "response": "a plausible transcript of roughly usual length "
                            "for a thirty second librispeech utterance chunk",
            })
        cfg = DatasetConfig(max_audio_seconds=args.seconds)
        ds = AudioLLMDataset(entries, root, ByteTokenizer(), cfg)

        def measure(**kw):
            dl = DataLoader(ds, batch_size=args.batch, shuffle=False, **kw)
            # warm one pass (page cache, pool spawn)
            for _ in dl:
                pass
            t0 = time.perf_counter()
            nb = 0
            for b in dl:
                nb += 1
            dt = time.perf_counter() - t0
            return nb * args.batch * args.seconds / dt

        for w in [int(x) for x in args.widths.split(",")]:
            v = measure(num_workers=w)
            print(json.dumps({"pool": "threads", "width": w,
                              "audio_sec_per_sec": round(v, 1)}), flush=True)
        for w in [int(x) for x in args.widths.split(",")]:
            v = measure(num_workers=1, worker_processes=w)
            print(json.dumps({"pool": "processes", "width": w,
                              "audio_sec_per_sec": round(v, 1)}), flush=True)
    print(json.dumps({"done": True}), flush=True)


if __name__ == "__main__":
    main()
