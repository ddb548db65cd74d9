"""Minimal .xplane.pb reader: print top device ops by total duration.

tensorflow's xplane_pb2 is not importable in this image, so this decodes
the protobuf wire format directly (XSpace -> XPlane -> XLine -> XEvent,
schema from tsl/profiler/protobuf/xplane.proto). Good enough to attribute
composed-frame device time op by op.

Usage:
  python scripts/xplane_top.py <trace.xplane.pb> [--top 40] [--plane TPU]
Or from another script:
  from xplane_top import top_ops
"""

import argparse
import collections
import struct
import sys


def _varint(buf, i):
    x = 0
    s = 0
    while True:
        b = buf[i]
        i += 1
        x |= (b & 0x7F) << s
        if not b & 0x80:
            return x, i
        s += 7


def _fields(buf, start, end):
    """Yield (field_no, wire_type, value, next_i). value: int for varint/
    fixed, memoryview slice for length-delimited."""
    i = start
    while i < end:
        tag, i = _varint(buf, i)
        fno, wt = tag >> 3, tag & 7
        if wt == 0:
            v, i = _varint(buf, i)
        elif wt == 1:
            v = struct.unpack_from("<q", buf, i)[0]
            i += 8
        elif wt == 2:
            ln, i = _varint(buf, i)
            v = (i, i + ln)
            i += ln
        elif wt == 5:
            v = struct.unpack_from("<i", buf, i)[0]
            i += 4
        else:
            raise ValueError(f"wire type {wt}")
        yield fno, wt, v, i


def _parse_event(buf, s, e):
    md, dur = 0, 0
    for fno, wt, v, _ in _fields(buf, s, e):
        if fno == 1 and wt == 0:
            md = v
        elif fno == 3 and wt == 0:
            dur = v
    return md, dur


def _parse_line(buf, s, e, totals, names, line_filter=""):
    lname = ""
    evs = []
    for fno, wt, v, _ in _fields(buf, s, e):
        if fno == 2 and wt == 2:
            lname = bytes(buf[v[0]:v[1]]).decode("utf-8", "replace")
        elif fno == 4 and wt == 2:          # events
            evs.append(v)
    if line_filter and line_filter.lower() not in lname.lower():
        return
    for v in evs:
        md, dur = _parse_event(buf, *v)
        totals[md] += dur


def _parse_event_metadata_entry(buf, s, e):
    """map<int64, XEventMetadata> entry: key=1, value=2 (XEventMetadata)."""
    key, name = 0, ""
    for fno, wt, v, _ in _fields(buf, s, e):
        if fno == 1 and wt == 0:
            key = v
        elif fno == 2 and wt == 2:
            for f2, w2, v2, _ in _fields(buf, *v):
                if f2 == 2 and w2 == 2:      # name
                    name = bytes(buf[v2[0]:v2[1]]).decode(
                        "utf-8", "replace")
    return key, name


def _parse_plane(buf, s, e, line_filter=""):
    name = ""
    totals = collections.Counter()
    names = {}
    spans = []
    for fno, wt, v, _ in _fields(buf, s, e):
        if fno == 2 and wt == 2:
            name = bytes(buf[v[0]:v[1]]).decode("utf-8", "replace")
        elif fno == 3 and wt == 2:
            spans.append(("line", v))
        elif fno == 4 and wt == 2:
            k, n = _parse_event_metadata_entry(buf, *v)
            names[k] = n
    for _, v in spans:
        _parse_line(buf, v[0], v[1], totals, names, line_filter)
    return name, totals, names


def top_ops(path, plane_filter="", loops=1, line_filter=""):
    """Return [(total_ms, op_name)] summed over matching planes/lines."""
    with open(path, "rb") as f:
        buf = memoryview(f.read())
    agg = collections.Counter()
    for fno, wt, v, _ in _fields(buf, 0, len(buf)):
        if fno == 1 and wt == 2:             # planes
            pname, totals, names = _parse_plane(buf, *v, line_filter)
            if plane_filter and plane_filter.lower() not in pname.lower():
                continue
            for md, dur in totals.items():
                agg[names.get(md, f"<md {md}>")] += dur
    return sorted(
        ((dur / 1e9 / loops, name) for name, dur in agg.items()),
        reverse=True)


def list_planes(path):
    with open(path, "rb") as f:
        buf = memoryview(f.read())
    out = []
    for fno, wt, v, _ in _fields(buf, 0, len(buf)):
        if fno == 1 and wt == 2:
            pname, totals, _ = _parse_plane(buf, *v)
            out.append((pname, sum(totals.values()) / 1e9))
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("path")
    p.add_argument("--top", type=int, default=40)
    p.add_argument("--plane", default="")
    p.add_argument("--line", default="",
                   help="only events on lines whose name contains this")
    p.add_argument("--loops", type=int, default=1,
                   help="divide durations by this (trace loop count)")
    p.add_argument("--list-planes", action="store_true")
    args = p.parse_args()

    if args.list_planes:
        for name, ms in list_planes(args.path):
            print(f"{ms:10.3f} ms  {name}")
        return
    rows = top_ops(args.path, args.plane, args.loops, args.line)
    total = sum(ms for ms, _ in rows)
    print(f"total {total:.2f} ms across {len(rows)} ops "
          f"(plane filter: {args.plane!r})")
    for ms, name in rows[: args.top]:
        print(f"{ms:9.3f} ms  {name[:110]}")


if __name__ == "__main__":
    main()
