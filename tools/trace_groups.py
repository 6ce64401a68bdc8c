"""Group a device trace by (hlo_category, output shape): time, bytes, GB/s.

Usage: python tools/trace_groups.py <profile_dir_or_trace.json(.gz)> [top_n]

Complements tools/parse_trace.py (per-op table): this view answers "where do
the bytes go" — each row is an op *class* with its achieved bandwidth and
MXU throughput, so bandwidth-bound row groups pop out (v5e peak ~819 GB/s,
197 bf16 TFLOP/s). Leaf slices only: `while` rows contain their body and
are excluded (CLAUDE.md double-count trap).
"""

import gzip
import json
import re
import sys
from collections import defaultdict
from pathlib import Path


def load_trace(path: Path):
    p = Path(path)
    if p.is_dir():
        cands = sorted(p.rglob("*.trace.json.gz"), key=lambda q: q.stat().st_mtime)
        if not cands:
            cands = sorted(p.rglob("*.trace.json"), key=lambda q: q.stat().st_mtime)
        assert cands, f"no trace json under {p}"
        p = cands[-1]
    print(f"# {p}")
    if p.suffix == ".gz":
        with gzip.open(p, "rt") as f:
            return json.load(f)
    with open(p) as f:
        return json.load(f)


_SHAPE = re.compile(r"=\s*(\([^)]*\)|\S+?)\s+(\w+)\(")


def group_key(name, args):
    cat = args.get("hlo_category", "?")
    long = args.get("long_name", "")
    m = _SHAPE.search(long)
    shape = m.group(1) if m else "?"
    # strip layout/tiling annotations for grouping
    shape = re.sub(r"\{[^}]*\}", "", shape)
    base = re.sub(r"\.\d+$", "", name)
    return f"{cat:<18} {base:<28} {shape}"


def main():
    path = sys.argv[1]
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 35
    data = load_trace(path)
    events = data["traceEvents"] if isinstance(data, dict) else data

    groups = defaultdict(lambda: [0.0, 0.0, 0.0, 0])  # ms, bytes, flops, count
    total_ms = 0.0
    for e in events:
        if e.get("ph") != "X" or not e.get("args"):
            continue
        a = e["args"]
        if "device_duration_ps" not in a:
            continue
        name = e.get("name", "")
        if name.startswith("while"):
            continue  # contains body ops: double-count
        ms = int(a["device_duration_ps"]) / 1e9
        total_ms += ms
        g = groups[group_key(name, a)]
        g[0] += ms
        g[1] += float(a.get("bytes_accessed", 0) or 0)
        g[2] += float(a.get("model_flops", 0) or 0)
        g[3] += 1

    print(f"total leaf device time: {total_ms:.1f} ms\n")
    print(f"{'ms':>9} {'%':>5} {'n':>5} {'GB':>8} {'GB/s':>7} {'TF/s':>6}  group")
    rows = sorted(groups.items(), key=lambda kv: -kv[1][0])
    for k, (ms, b, f, n) in rows[:top_n]:
        gbps = b / 1e9 / (ms / 1e3) if ms else 0.0
        tfs = f / 1e12 / (ms / 1e3) if ms else 0.0
        print(f"{ms:9.2f} {100*ms/total_ms:5.1f} {n:5d} {b/1e9:8.2f} "
              f"{gbps:7.0f} {tfs:6.1f}  {k}")


if __name__ == "__main__":
    main()
