"""Analyze jax.profiler Chrome traces (vm.trace.json.gz) from the train-step
profiling runs (experiments/round3_tpu_batch5.py) and attribute time by op
class — the VERDICT #2 B-scaling question.

    python experiments/analyze_trace.py experiments/traces/trainB2 \
        experiments/traces/trainB8
"""

import glob
import gzip
import json
import re
import sys
from collections import defaultdict

# op-name -> bucket classification, first match wins
BUCKETS = [
    ("causal_attn_fwd", r"^_fwd_kernel"),
    ("causal_attn_dq", r"^_dq_kernel"),
    ("causal_attn_dkv", r"^_dkv_kernel"),
    ("enc_attn", r"_kernel_v3|_kernel_v2|enc_attention"),
    ("mel", r"mel|_frame_kernel"),
    ("layernorm_pallas", r"ln_pallas|layer_norm"),
    ("fusion(matmul)", r"^fusion.*"),  # placeholder; refined below
    ("convolution", r"^convolution"),
    ("dot/matmul", r"^dot|^cublas|matmul"),
    ("dynamic-update", r"dynamic-update-slice"),
    ("dynamic-slice", r"dynamic-slice"),
    ("copy/transpose", r"^copy|^transpose|^bitcast"),
    ("all-reduce", r"all-reduce|reduce-scatter|all-gather"),
    ("reduce", r"^reduce"),
    ("scatter/gather", r"gather|scatter"),
    ("loop-overhead", r"^while|^condition|^body"),
    ("infeed/outfeed", r"infeed|outfeed"),
]


def load_events(trace_dir):
    paths = glob.glob(trace_dir + "/**/*.trace.json.gz", recursive=True)
    if not paths:
        raise SystemExit(f"no trace.json.gz under {trace_dir}")
    with gzip.open(sorted(paths)[-1], "rt") as f:
        data = json.load(f)
    return data.get("traceEvents", [])


def device_op_times(events):
    """Sum complete-event durations on TPU device lanes, keyed by op name."""
    # find pids whose process_name mentions TPU / device
    pid_names = {}
    tid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tid_names[(e["pid"], e.get("tid"))] = e["args"].get("name", "")
    device_pids = {
        p for p, n in pid_names.items()
        if re.search(r"TPU|/device|XLA Op", n, re.I)
    }
    # the op-level lane only — "Steps"/"XLA Modules" are parent aggregates
    # on their own tids, so per-lane nesting can't deduplicate them
    xla_lanes = {
        k for k, n in tid_names.items()
        if n in ("XLA Ops", "TensorFlow Ops")
    }
    # Collect complete events per (pid, tid) lane, then compute SELF time
    # (dur minus nested children) with a timestamp stack — trace spans nest
    # (step > while > fusion), and counting parents double-counts 3-4x.
    lanes = defaultdict(list)
    for e in events:
        if e.get("ph") != "X":
            continue
        pid, tid = e.get("pid"), e.get("tid")
        if device_pids and pid not in device_pids:
            continue
        if xla_lanes and (pid, tid) not in xla_lanes:
            continue
        lanes[(pid, tid)].append(
            (float(e.get("ts", 0.0)), float(e.get("dur", 0.0)),
             e.get("name", "?"))
        )
    per_op = defaultdict(float)
    total = 0.0
    for lane in lanes.values():
        lane.sort(key=lambda t: (t[0], -t[1]))  # by start; parents first
        stack = []  # (end_ts, name, child_time_accum)
        def pop_finished(now):
            nonlocal total
            while stack and stack[-1][0] <= now + 1e-9:
                end, name, child, dur = stack.pop()
                self_t = max(dur - child, 0.0)
                per_op[name] += self_t
                total += self_t
                if stack:
                    stack[-1][2] += dur
        for ts, dur, name in lane:
            pop_finished(ts)
            stack.append([ts + dur, name, 0.0, dur])
        pop_finished(float("inf"))
    return per_op, total, pid_names, tid_names


def bucketize(per_op):
    out = defaultdict(float)
    for name, dur in per_op.items():
        base = name.split(".")[0]
        for bucket, pat in BUCKETS:
            if re.search(pat, name) or re.search(pat, base):
                out[bucket] += dur
                break
        else:
            out["other:" + base[:40]] += dur
    return out


def report(trace_dir):
    events = load_events(trace_dir)
    per_op, total, pid_names, tid_names = device_op_times(events)
    print(f"\n=== {trace_dir} ===")
    print("process lanes:", json.dumps(pid_names))
    print(f"total device-op time: {total/1e3:.2f} ms (all traced steps)")
    buckets = bucketize(per_op)
    for name, dur in sorted(buckets.items(), key=lambda kv: -kv[1])[:20]:
        print(f"  {name:<40} {dur/1e3:9.2f} ms  {100*dur/max(total,1e-9):5.1f}%")
    print("  top raw ops:")
    for name, dur in sorted(per_op.items(), key=lambda kv: -kv[1])[:15]:
        print(f"    {name[:70]:<70} {dur/1e3:8.2f} ms")
    return buckets, total


if __name__ == "__main__":
    results = {}
    for d in sys.argv[1:]:
        results[d] = report(d)
    if len(results) == 2:
        (da, (ba, ta)), (db, (bb, tb)) = results.items()
        print(f"\n=== scaling comparison ({db} / {da}) ===")
        keys = sorted(set(ba) | set(bb), key=lambda k: -(bb.get(k, 0)))
        for k in keys[:20]:
            a, b = ba.get(k, 0.0), bb.get(k, 0.0)
            ratio = b / a if a > 0 else float("inf")
            print(f"  {k:<40} {a/1e3:8.2f} -> {b/1e3:8.2f} ms   x{ratio:5.2f}")
