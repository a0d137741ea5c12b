"""Aggregate an xplane capture into op-category buckets (ms/step).

Usage: python bench/analyze_buckets.py <vm.xplane.pb> [steps=5]
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import collections
import re
import sys

from tensorflow.tsl.profiler.protobuf import xplane_pb2

STEPS = int(sys.argv[2]) if len(sys.argv) > 2 else 5


def bucket(name: str) -> str:
    if "convert_reduce_fusion" in name:
        return "bn-stat reduces (f32 stats over bf16 NHWC)"
    if re.search(r"multiply_add_fusion.*f32\[\d,\d,1,", name):
        return "depthwise-kernel grad fusions (f32[k,k,1,C])"
    if "multiply_add_fusion" in name:
        return "param-grad multiply_add fusions"
    if "multiply_reduce_fusion" in name:
        return "SE squeeze/grad reduces"
    if name.startswith("%convolution") or ".convolution" in name:
        return "convolutions"
    if "conv" in name and "fusion" in name:
        return "conv fusions"
    if name.startswith("%copy") or "copy_fusion" in name:
        return "layout copies"
    if "dot" in name:
        return "dots"
    if "reduce_window" in name or "select_and_scatter" in name:
        return "pooling"
    if "all_reduce" in name or "collective" in name:
        return "collectives"
    return "other fusions/ops"


xs = xplane_pb2.XSpace()
with open(sys.argv[1], "rb") as f:
    xs.ParseFromString(f.read())
for plane in xs.planes:
    if not plane.name.startswith("/device:TPU"):
        continue
    ev_names = {i: m.name for i, m in plane.event_metadata.items()}
    tot = collections.Counter()
    cnt = collections.Counter()
    grand = 0
    for line in plane.lines:
        if line.name != "XLA Ops":
            continue
        for ev in line.events:
            name = ev_names.get(ev.metadata_id, "?")
            b = bucket(name)
            tot[b] += ev.duration_ps
            cnt[b] += 1
            grand += ev.duration_ps
    print(f"total device op time: {grand / 1e9 / STEPS:.2f} ms/step")
    for b, ps in tot.most_common():
        print(f"{ps / 1e9 / STEPS:8.2f} ms/step ({100 * ps / grand:4.1f}%) "
              f"x{cnt[b] // STEPS:4d}  {b}")
