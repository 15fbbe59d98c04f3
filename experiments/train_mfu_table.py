"""Train-step throughput characterization (VERDICT round-1 item 8).

Runs bench.py --mode train across batch sizes / accumulation / remat and
prints one JSON line per point (tokens/sec + MFU). Each point is a separate
process so XLA programs don't accumulate HBM.

    nohup python -u experiments/train_mfu_table.py > /tmp/mfu_table.log 2>&1 &
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# no_remat points measured once: OOM at 3B dims (remat is mandatory —
# activations of 28 layers at [B, 2014, 3072] exceed HBM); see BASELINE.md
POINTS = [
    # (batch, accum, no_remat)
    (2, 1, False),
    (4, 1, False),
    (8, 1, False),
]


def main():
    for b, accum, no_remat in POINTS:
        cmd = [
            sys.executable, os.path.join(REPO, "bench.py"),
            "--mode", "train", "--batch", str(b), "--accum", str(accum),
            "--iters", "8",
        ]
        if no_remat:
            cmd.append("--no_remat")
        print(json.dumps({"point": {"batch": b, "accum": accum,
                                    "remat": not no_remat}}), flush=True)
        try:
            out = subprocess.run(
                cmd, capture_output=True, text=True, timeout=3600, cwd=REPO
            )
            for line in out.stdout.splitlines():
                if line.startswith("{"):
                    print(line, flush=True)
            if out.returncode != 0:
                print(json.dumps({"error": out.stderr[-500:]}), flush=True)
        except subprocess.TimeoutExpired:
            print(json.dumps({"error": "timeout"}), flush=True)
    print(json.dumps({"done": True}), flush=True)


if __name__ == "__main__":
    main()
