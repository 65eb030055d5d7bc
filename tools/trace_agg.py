"""Aggregate a captured xplane trace by op category and spatial grid."""
import glob, os, re, sys
from collections import defaultdict
from tensorflow.tsl.profiler.protobuf import xplane_pb2


def agg(trace_dir):
    files = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"), recursive=True)
    xs = xplane_pb2.XSpace()
    with open(max(files, key=os.path.getmtime), "rb") as f:
        xs.ParseFromString(f.read())
    for plane in xs.planes:
        if "TensorCore" not in plane.name and "TPU" not in plane.name:
            continue
        print(f"=== plane {plane.name}")
        for line in plane.lines:
            if "XLA Ops" not in line.name or "Async" in line.name:
                continue
            cat = defaultdict(float)
            cnt = defaultdict(int)
            total = 0.0
            for ev in line.events:
                name = plane.event_metadata[ev.metadata_id].name
                ms = ev.duration_ps / 1e9
                total += ms
                kind = re.match(r"%?([a-zA-Z_\-]+)", name).group(1)
                m = re.search(r"\[([0-9,]+)\]", name)
                shape = m.group(1) if m else "?"
                grid = "?"
                for g in ("16,88,88", "8,44,44", "4,22,22", "2,11,11",
                          "32,176,176", "16,88,88"):
                    if g in name:
                        grid = g
                        break
                cat[(kind, grid)] += ms
                cnt[(kind, grid)] += 1
            print(f"line {line.name}: TOTAL {total:.1f} ms")
            for (kind, grid), ms in sorted(cat.items(), key=lambda kv: -kv[1]):
                if ms < 2:
                    continue
                print(f"  {ms:9.1f} ms x{cnt[(kind, grid)]:<4d} {kind:28s} grid {grid}")


if __name__ == "__main__":
    agg(sys.argv[1])
