import os as _os, sys as _sys  # repo-root import shim (scripts live in bench/)
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import collections, sys
from tensorflow.tsl.profiler.protobuf import xplane_pb2
xs = xplane_pb2.XSpace()
with open(sys.argv[1], "rb") as f:
    xs.ParseFromString(f.read())
for plane in xs.planes:
    if not plane.name.startswith("/device:TPU"):
        continue
    ev_names = {i: m.name for i, m in plane.event_metadata.items()}
    tot = collections.Counter()
    cnt = collections.Counter()
    for line in plane.lines:
        if line.name != "XLA Ops":
            continue
        for ev in line.events:
            name = ev_names.get(ev.metadata_id, "?")
            tot[name] += ev.duration_ps
            cnt[name] += 1
    for name, ps in tot.most_common(30):
        print(f"{ps/1e9/5:8.3f} ms/step x{cnt[name]//5:3d}  {name[:140]}")
