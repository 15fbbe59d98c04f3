"""Attribute device time to HLO *source lines* from jax.profiler xplane.pb.

analyze_trace.py buckets the Chrome trace by op class; this reads the richer
xplane (XLA Ops lane) and keys SELF time by (hlo_category, producing source
line) so the B-scaling glue (NEXT.md #1: convolution-class HLOs, layout/
convert fusions) gets a file:line owner.

    python experiments/analyze_xplane.py experiments/traces/trainB2 \
        experiments/traces/trainB8

Requires tensorflow (baked in) for the xplane proto only.
"""

import glob
import sys
from collections import defaultdict


def load_plane(trace_dir):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2  # noqa: E501 (tf baked in)

    paths = glob.glob(trace_dir + "/**/*.xplane.pb", recursive=True)
    if not paths:
        raise SystemExit(f"no xplane.pb under {trace_dir}")
    xs = xplane_pb2.XSpace()
    with open(sorted(paths)[-1], "rb") as f:
        xs.ParseFromString(f.read())
    for plane in xs.planes:
        if plane.name.startswith("/device:TPU"):
            return plane
    raise SystemExit("no TPU plane")


def op_table(plane):
    """[(self_time_ps, name, category, source, flops, bytes)] from XLA Ops."""
    smd = {k: v.name for k, v in plane.stat_metadata.items()}

    def md_stats(md):
        out = {}
        for s in md.stats:
            n = smd.get(s.metadata_id, "?")
            out[n] = s.str_value or s.int64_value or s.uint64_value \
                or s.double_value
        return out

    rows = []
    for line in plane.lines:
        if line.name != "XLA Ops":
            continue
        evs = sorted(
            ((e.offset_ps, e.duration_ps, e.metadata_id) for e in line.events),
            key=lambda t: (t[0], -t[1]),
        )
        stack = []  # [end_ps, metadata_id, child_accum, dur]
        self_ps = defaultdict(float)
        counts = defaultdict(int)

        def pop_finished(now):
            while stack and stack[-1][0] <= now:
                end, mid, child, dur = stack.pop()
                self_ps[mid] += max(dur - child, 0.0)
                counts[mid] += 1
                if stack:
                    stack[-1][2] += dur
        for ts, dur, mid in evs:
            pop_finished(ts)
            stack.append([ts + dur, mid, 0.0, dur])
        pop_finished(float("inf"))

        for mid, ps in self_ps.items():
            md = plane.event_metadata[mid]
            st = md_stats(md)
            n = counts[mid]
            # flops/bytes stats are PER EXECUTION; weight by occurrence count
            rows.append((
                ps,
                md.display_name or md.name.split(" = ")[0],
                str(st.get("hlo_category", "?")),
                str(st.get("source", "?")),
                float(st.get("flops", 0) or 0) * n,
                float(st.get("bytes_accessed", 0) or 0) * n,
            ))
    return rows


def grouped(rows, key):
    g = defaultdict(lambda: [0.0, 0.0, 0.0])
    for ps, name, cat, src, fl, by in rows:
        k = key(name, cat, src)
        g[k][0] += ps
        g[k][1] += fl
        g[k][2] += by
    return g


def report(trace_dir, top=25):
    plane = load_plane(trace_dir)
    rows = op_table(plane)
    total = sum(r[0] for r in rows)
    print(f"\n=== {trace_dir}: total XLA-Ops self time "
          f"{total/1e9:.2f} ms (all traced steps) ===")
    bysrc = grouped(rows, lambda n, c, s: (c, s))
    print(f"{'ms':>9} {'%':>5}  {'TF/s':>6} {'GB/s':>6}  category  source")
    for (cat, src), (ps, fl, by) in sorted(
            bysrc.items(), key=lambda kv: -kv[1][0])[:top]:
        sec = ps / 1e12
        tf = fl / sec / 1e12 if sec else 0
        gb = by / sec / 1e9 if sec else 0
        srcs = src.replace("/root/repo/", "")
        print(f"{ps/1e9:9.2f} {100*ps/max(total,1):5.1f}  {tf:6.1f} {gb:6.0f}"
              f"  {cat:<12} {srcs}")
    return bysrc, total


if __name__ == "__main__":
    results = {}
    for d in sys.argv[1:]:
        results[d] = report(d)
    if len(results) == 2:
        (da, (ga, ta)), (db, (gb, tb)) = results.items()
        print(f"\n=== scaling ({db} vs {da}), by (category, source) ===")
        keys = sorted(set(ga) | set(gb), key=lambda k: -(gb.get(k, [0])[0]))
        print(f"{'A ms':>9} {'B ms':>9} {'x':>6}  category  source")
        for k in keys[:30]:
            a = ga.get(k, [0.0])[0]
            b = gb.get(k, [0.0])[0]
            ratio = b / a if a > 0 else float("inf")
            cat, src = k
            srcs = src.replace("/root/repo/", "")
            print(f"{a/1e9:9.2f} {b/1e9:9.2f} {ratio:6.2f}  {cat:<12} {srcs}")
