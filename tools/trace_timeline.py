"""Print a time-ordered slice of the TPU 'XLA Ops' line from an xplane trace
— shows per-op serialized durations and inter-op gaps for one window.

Usage: python tools/trace_timeline.py <trace_dir> <start_ms> <len_ms>
"""

import glob
import sys

from tensorflow.tsl.profiler.protobuf import xplane_pb2


def main():
    trace_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/jax_trace_ar"
    start_ms = float(sys.argv[2]) if len(sys.argv) > 2 else 100.0
    len_ms = float(sys.argv[3]) if len(sys.argv) > 3 else 0.5
    path = sorted(glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True))[-1]
    xs = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        xs.ParseFromString(f.read())
    for plane in xs.planes:
        if "TPU" not in plane.name:
            continue
        ev_names = dict(plane.event_metadata.items())
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            evs = []
            t0 = min(e.offset_ps for e in line.events)
            for ev in line.events:
                s = (ev.offset_ps - t0) / 1e9
                if s < start_ms or s > start_ms + len_ms:
                    continue
                md = ev_names.get(ev.metadata_id)
                name = md.name if md else str(ev.metadata_id)
                if name.startswith("%while"):
                    continue
                evs.append((s, ev.duration_ps / 1e9, name))
            evs.sort()
            prev_end = None
            for s, d, name in evs:
                gap = "" if prev_end is None else f" gap {1000*(s-prev_end):7.2f}us"
                print(f"{s:10.4f} ms  dur {d*1000:8.2f}us{gap}  {name.split(' = ')[0][:70]}")
                prev_end = s + d


if __name__ == "__main__":
    main()
