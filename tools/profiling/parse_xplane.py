"""Aggregate per-HLO-op device time from a jax.profiler xplane trace.

Usage:
    PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python \
        python tools/profiling/parse_xplane.py /tmp/trace_dir [top_n]

(The pure-python protobuf impl is required: the tensorboard profile plugin's
native parser is version-incompatible with the installed TF.)
"""
import collections
import glob
import sys

from tensorflow.tsl.profiler.protobuf import xplane_pb2  # noqa: E402


def main():
    root = sys.argv[1]
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    xs = sorted(glob.glob(f"{root}/**/*.xplane.pb", recursive=True))
    if not xs:
        sys.exit(f"no .xplane.pb under {root}")
    sp = xplane_pb2.XSpace()
    with open(xs[-1], "rb") as f:
        sp.ParseFromString(f.read())
    for plane in sp.planes:
        if "TPU" not in plane.name and "Device" not in plane.name:
            continue
        agg = collections.Counter()
        cnt = collections.Counter()
        for line in plane.lines:
            for ev in line.events:
                name = plane.event_metadata[ev.metadata_id].name
                agg[name] += ev.duration_ps / 1e9  # -> ms
                cnt[name] += 1
        if not agg:
            continue
        print(f"== {plane.name} ==")
        for name, ms in agg.most_common(top_n):
            print(f"{ms:9.3f} ms  x{cnt[name]:4d}  {name[:110]}")


if __name__ == "__main__":
    main()
