#!/usr/bin/env python3
"""Offline xplane trace analyzer: per-op device time + DMA/copy coverage.

Parses the ``.xplane.pb`` files ``jax.profiler`` writes (the
tensorboard-plugin converter is version-broken in this environment; the raw
proto is stable). Methodology per docs/performance.md round-2 notes:

* aggregate event durations per op on the device "XLA Ops" line;
* copy-start/copy-done DMA spans overlap, so report their interval-UNION
  coverage (sum of durations overcounts);
* report the trace's total device-busy wall vs compute wall — the gap is
  the bandwidth bound.

Usage: PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python \\
           python scripts/analyze_xplane.py /tmp/xplane_yolo_b64 [top_n]
"""

from __future__ import annotations

import os
import sys
from collections import defaultdict
from pathlib import Path

os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")


def interval_union(spans: "list[tuple[int, int]]") -> int:
    total = 0
    cur_a = cur_b = None
    for a, b in sorted(spans):
        if cur_a is None:
            cur_a, cur_b = a, b
        elif a <= cur_b:
            cur_b = max(cur_b, b)
        else:
            total += cur_b - cur_a
            cur_a, cur_b = a, b
    if cur_a is not None:
        total += cur_b - cur_a
    return total


def analyze(trace_dir: "str | Path", top_n: int = 25) -> dict:
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    pbs = sorted(Path(trace_dir).rglob("*.xplane.pb"))
    if not pbs:
        raise SystemExit(f"no .xplane.pb under {trace_dir}")
    space = xplane_pb2.XSpace()
    space.ParseFromString(pbs[-1].read_bytes())

    report = {"planes": []}
    for plane in space.planes:
        if "TPU" not in plane.name and "/device" not in plane.name.lower():
            continue
        ev_meta = {m.id: plane.event_metadata[m.id].name for m in plane.event_metadata.values()}
        per_op = defaultdict(int)
        copy_spans = []
        all_spans = []
        for line in plane.lines:
            is_ops_line = "XLA Ops" in line.name or "Steps" not in line.name
            for ev in line.events:
                name = ev_meta.get(ev.metadata_id, str(ev.metadata_id))
                start, dur = ev.offset_ps, ev.duration_ps
                if "copy" in name.lower() or "dma" in name.lower():
                    copy_spans.append((start, start + dur))
                if "XLA Ops" in line.name:
                    per_op[name] += dur
                    all_spans.append((start, start + dur))
        if not per_op and not copy_spans:
            continue
        total_op = sum(per_op.values())
        top = sorted(per_op.items(), key=lambda kv: -kv[1])[:top_n]
        report["planes"].append(
            {
                "plane": plane.name,
                "op_wall_union_ms": interval_union(all_spans) / 1e9,
                "op_sum_ms": total_op / 1e9,
                "copy_union_ms": interval_union(copy_spans) / 1e9,
                "top_ops_ms": [(n, round(d / 1e9, 3)) for n, d in top],
            }
        )
    return report


def main():
    trace_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/xplane_yolo_b64"
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 25
    rep = analyze(trace_dir, top_n)
    for p in rep["planes"]:
        print(f"== {p['plane']} ==")
        print(
            f"op busy (union) {p['op_wall_union_ms']:.2f} ms | op sum "
            f"{p['op_sum_ms']:.2f} ms | copy union {p['copy_union_ms']:.2f} ms"
        )
        for name, ms in p["top_ops_ms"]:
            print(f"  {ms:9.3f} ms  {name[:110]}")


if __name__ == "__main__":
    main()
