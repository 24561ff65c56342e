"""Summarize a jax.profiler xplane trace: per-op totals on the TPU device
plane, busy-vs-wall accounting, and the top-N ops by self time.

The hosted tensorboard profile plugin is version-skewed against the baked-in
TF in this image, so this parses the xplane.pb directly.

Usage: python tools/trace_top_ops.py /tmp/jax_trace_ar [top_n] [name_filter]
"""

import collections
import glob
import sys

from tensorflow.tsl.profiler.protobuf import xplane_pb2


def load(trace_dir):
    paths = sorted(glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True))
    if not paths:
        raise SystemExit(f"no xplane.pb under {trace_dir}")
    xs = xplane_pb2.XSpace()
    with open(paths[-1], "rb") as f:
        xs.ParseFromString(f.read())
    return xs, paths[-1]


def main():
    trace_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/jax_trace_ar"
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    name_filter = sys.argv[3] if len(sys.argv) > 3 else ""
    xs, path = load(trace_dir)
    print(f"# {path}")
    for plane in xs.planes:
        if "TPU" not in plane.name and "tpu" not in plane.name.lower():
            continue
        ev_names = dict(plane.event_metadata.items())
        per_op = collections.defaultdict(lambda: [0.0, 0])  # ps, count
        t_lo, t_hi = None, None
        for line in plane.lines:
            # xla op lines carry per-op events; step lines etc. too
            for ev in line.events:
                md = ev_names.get(ev.metadata_id)
                name = md.name if md else str(ev.metadata_id)
                per_op[(line.name, name)][0] += ev.duration_ps
                per_op[(line.name, name)][1] += 1
                start = ev.offset_ps
                end = ev.offset_ps + ev.duration_ps
                t_lo = start if t_lo is None else min(t_lo, start)
                t_hi = end if t_hi is None else max(t_hi, end)
        if not per_op:
            continue
        print(f"\n== plane: {plane.name} ==")
        lines_totals = collections.defaultdict(float)
        for (ln, name), (ps, _) in per_op.items():
            lines_totals[ln] += ps
        wall = (t_hi - t_lo) / 1e9 if t_hi else 0.0
        print(f"span {wall:.1f} ms")
        for ln, ps in sorted(lines_totals.items(), key=lambda kv: -kv[1])[:6]:
            print(f"  line {ln!r}: busy {ps/1e9:.1f} ms")
        # top ops on each of the busiest lines (the sync 'XLA Ops' line is
        # where device time actually serializes; 'Async XLA Ops' shows the
        # overlapped DMA prefetch stream)
        for ln, _ in sorted(lines_totals.items(), key=lambda kv: -kv[1])[:3]:
            rows = [
                (ps, n, name)
                for (ln2, name), (ps, n) in per_op.items()
                if ln2 == ln and (name_filter in name)
            ]
            rows.sort(reverse=True)
            print(f"\n  top ops on line {ln!r}:")
            for ps, n, name in rows[:top_n]:
                print(f"   {ps/1e9:9.2f} ms  x{n:<6d} {name[:110]}")


if __name__ == "__main__":
    main()
