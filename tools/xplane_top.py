#!/usr/bin/env python3
"""Aggregate op durations from a JAX profiler xplane.pb trace.

Minimal hand-rolled protobuf wire reader for the public XPlane schema
(tsl/profiler/protobuf/xplane.proto) so no tensorflow/tensorboard install
is needed.  Prints the top-N event names by total device duration.

Usage: python tools/xplane_top.py /tmp/trace_dir [N]
       (finds the newest plugins/profile/*/ *.xplane.pb under the dir)
"""

import glob
import os
import sys
from collections import defaultdict


def read_varint(buf, pos):
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7


def fields(buf):
    """Yield (field_number, wire_type, value) over a protobuf message."""
    pos = 0
    n = len(buf)
    while pos < n:
        tag, pos = read_varint(buf, pos)
        fnum, wt = tag >> 3, tag & 7
        if wt == 0:
            val, pos = read_varint(buf, pos)
        elif wt == 2:
            ln, pos = read_varint(buf, pos)
            val = buf[pos : pos + ln]
            pos += ln
        elif wt == 5:
            val = buf[pos : pos + 4]
            pos += 4
        elif wt == 1:
            val = buf[pos : pos + 8]
            pos += 8
        else:
            raise ValueError(f"wire type {wt}")
        yield fnum, wt, val


def parse_plane(buf):
    name = ""
    meta = {}  # id -> name
    lines = []
    for fnum, wt, val in fields(buf):
        if fnum == 2:
            name = val.decode()
        elif fnum == 3:
            lines.append(val)
        elif fnum == 4:  # map<int64, XEventMetadata>
            k = v = None
            for f2, _, val2 in fields(val):
                if f2 == 1:
                    k = val2
                elif f2 == 2:
                    v = val2
            if k is not None and v is not None:
                mname = ""
                for f3, _, val3 in fields(v):
                    if f3 == 2:
                        mname = val3.decode()
                meta[k] = mname
    return name, meta, lines


def parse_line_events(buf):
    """Yield (metadata_id, duration_ps) for each XEvent on an XLine."""
    for fnum, wt, val in fields(buf):
        if fnum == 4:  # XEvent
            mid = dur = 0
            for f2, _, val2 in fields(val):
                if f2 == 1:
                    mid = val2
                elif f2 == 3:
                    dur = val2
            yield mid, dur


def main():
    root = sys.argv[1]
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    pbs = sorted(glob.glob(os.path.join(root, "plugins/profile/*/*.xplane.pb")))
    if not pbs:
        sys.exit(f"no xplane.pb under {root}")
    path = pbs[-1]
    print(f"# {path}")
    buf = open(path, "rb").read()

    for fnum, wt, val in fields(buf):  # XSpace.planes
        if fnum != 1:
            continue
        name, meta, lines = parse_plane(val)
        if "TPU" not in name and "tpu" not in name.lower():
            continue
        total = defaultdict(int)
        count = defaultdict(int)
        for line in lines:
            for mid, dur in parse_line_events(line):
                total[meta.get(mid, f"#{mid}")] += dur
                count[meta.get(mid, f"#{mid}")] += 1
        grand = sum(total.values())
        print(f"\n== plane: {name}  (total {grand/1e9:.3f} ms over "
              f"{sum(count.values())} events)")
        for nm in sorted(total, key=total.get, reverse=True)[:top_n]:
            print(f"{total[nm]/1e9:10.3f} ms  x{count[nm]:<7d} "
                  f"{total[nm]/max(count[nm],1)/1e6:8.2f} us/ev  {nm[:110]}")


if __name__ == "__main__":
    main()
