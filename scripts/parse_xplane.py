"""Aggregate a jax.profiler xplane.pb into a per-op self-time table (the
tensorboard_plugin_profile native bridge mismatches this TF build, so parse
the proto directly). Prints top ops by total duration per device plane.

Usage: python scripts/parse_xplane.py /tmp/trace_step [top_n]
"""
import collections
import glob
import sys

from tensorflow.tsl.profiler.protobuf import xplane_pb2


def load(path):
    xs = xplane_pb2.XSpace()
    pb = sorted(glob.glob(f"{path}/**/*.xplane.pb", recursive=True))[-1]
    with open(pb, "rb") as f:
        xs.ParseFromString(f.read())
    return xs


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/trace_step"
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    xs = load(path)
    for p in xs.planes:
        if "TPU" not in p.name and "tpu" not in p.name.lower():
            continue
        emeta = {m.id: m.name for m in p.event_metadata.values()}
        for line in p.lines:
            if not line.events:
                continue
            agg = collections.defaultdict(lambda: [0.0, 0])
            t0, t1 = float("inf"), 0.0
            for ev in line.events:
                name = emeta.get(ev.metadata_id, str(ev.metadata_id))
                agg[name][0] += ev.duration_ps / 1e9  # ms
                agg[name][1] += 1
                t0 = min(t0, ev.offset_ps)
                t1 = max(t1, ev.offset_ps + ev.duration_ps)
            total = sum(v[0] for v in agg.values())
            span = (t1 - t0) / 1e9
            print(f"\n== plane '{p.name}' line '{line.name}' "
                  f"events={len(line.events)} sum={total:.1f}ms "
                  f"span={span:.1f}ms ==")
            for name, (ms, cnt) in sorted(
                agg.items(), key=lambda kv: -kv[1][0]
            )[:top_n]:
                print(f"  {ms:9.3f} ms  x{cnt:<5d} {name[:110]}")


if __name__ == "__main__":
    main()
