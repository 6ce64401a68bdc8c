"""Aggregate a jax.profiler perfetto trace: per-op device time.

Usage: python tools/parse_trace.py <profile_dir_or_trace.json(.gz)> [top_n]

Finds the newest *.trace.json.gz under the directory, sums 'X' slice
durations per op name on the device (XLA Ops) threads, and prints the top
table. NOTE (CLAUDE.md): a scan's `while` op CONTAINS its body ops — the
while row double-counts its children; read leaf rows for attribution.
"""

import gzip
import json
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


def main():
    path = sys.argv[1]
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    data = load_trace(path)
    events = data["traceEvents"] if isinstance(data, dict) else data

    # map (pid, tid) -> names so we can select device op threads
    proc_names, thread_names = {}, {}
    for e in events:
        if e.get("ph") == "M":
            if e.get("name") == "process_name":
                proc_names[e["pid"]] = e["args"].get("name", "")
            elif e.get("name") == "thread_name":
                thread_names[(e["pid"], e.get("tid"))] = e["args"].get("name", "")

    def is_device_ops(pid, tid):
        tn = thread_names.get((pid, tid), "")
        pn = proc_names.get(pid, "")
        return ("XLA Ops" in tn) or ("TensorFlow Op" in tn) or (
            "/device:" in pn and "Steps" not in tn and "XLA Modules" not in tn
        )

    per_op = defaultdict(float)
    per_cat = defaultdict(float)
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        if not is_device_ops(e.get("pid"), e.get("tid")):
            continue
        name = e.get("name", "?")
        dur = e["dur"] / 1e3  # us -> ms
        per_op[name] += dur
        # crude category: leading token before '.' / digits
        cat = name.split(".")[0].rstrip("0123456789_")
        per_cat[cat] += dur
        total += dur

    print(f"total device op time (incl. while double-count): {total:.1f} ms")
    print("\n== top ops ==")
    for name, ms in sorted(per_op.items(), key=lambda kv: -kv[1])[:top_n]:
        print(f"{ms:10.2f} ms  {name[:110]}")
    print("\n== by category ==")
    for cat, ms in sorted(per_cat.items(), key=lambda kv: -kv[1])[:25]:
        print(f"{ms:10.2f} ms  {cat}")


if __name__ == "__main__":
    main()
