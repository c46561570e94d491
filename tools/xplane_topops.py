"""Minimal protobuf wire-format parser for XSpace traces: prints top ops by
total self duration per plane. No tensorflow/tensorboard dependency (the
sandbox's plugin protos are incompatible with its protobuf runtime).

Usage: python tools/xplane_topops.py <trace_dir_or_xplane.pb> [topN]
"""

from __future__ import annotations

import glob
import os
import sys
from collections import defaultdict


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


def fields(buf):
    """Yield (field_no, wire_type, value) over a serialized message."""
    i, n = 0, len(buf)
    while i < n:
        key, i = _varint(buf, i)
        fno, wt = key >> 3, key & 7
        if wt == 0:
            v, i = _varint(buf, i)
        elif wt == 2:
            ln, i = _varint(buf, i)
            v = buf[i : i + ln]
            i += ln
        elif wt == 5:
            v = buf[i : i + 4]
            i += 4
        elif wt == 1:
            v = buf[i : i + 8]
            i += 8
        else:
            raise ValueError(f"wire type {wt}")
        yield fno, wt, v


def parse_plane(buf):
    name = ""
    lines = []
    meta = {}
    for fno, wt, v in fields(buf):
        if fno == 2 and wt == 2:
            name = v.decode(errors="replace")
        elif fno == 3 and wt == 2:
            lines.append(v)
        elif fno == 4 and wt == 2:
            # map<int64, XEventMetadata> entry: 1=key, 2=value
            k = None
            mname = ""
            for f2, w2, v2 in fields(v):
                if f2 == 1:
                    k = v2
                elif f2 == 2 and w2 == 2:
                    for f3, w3, v3 in fields(v2):
                        if f3 == 2 and w3 == 2:
                            mname = v3.decode(errors="replace")
            if k is not None:
                meta[k] = mname
    return name, lines, meta


def parse_line(buf):
    lname = ""
    events = []
    for fno, wt, v in fields(buf):
        if fno in (2, 11) and wt == 2:
            lname = v.decode(errors="replace")
        elif fno == 4 and wt == 2:
            mid = dur = 0
            occ = 1
            for f2, w2, v2 in fields(v):
                if f2 == 1:
                    mid = v2
                elif f2 == 3:
                    dur = v2
                elif f2 == 5:
                    occ = v2
            events.append((mid, dur, occ))
    return lname, events


def summarize(path, topn=30):
    buf = open(path, "rb").read()
    for fno, wt, v in fields(buf):
        if fno != 1 or wt != 2:
            continue
        pname, lines, meta = parse_plane(v)
        agg = defaultdict(lambda: [0, 0])
        total = 0
        nlines = 0
        for lb in lines:
            lname, events = parse_line(lb)
            nlines += 1
            for mid, dur, occ in events:
                a = agg[meta.get(mid, f"#{mid}")]
                a[0] += dur
                a[1] += occ if occ > 1 else 1
                total += dur
        if not agg:
            continue
        print(f"\n=== plane: {pname} ({nlines} lines, total {total/1e9:.3f} ms)")
        for name, (dur, cnt) in sorted(
            agg.items(), key=lambda kv: -kv[1][0]
        )[:topn]:
            print(f"  {dur/1e9:10.3f} ms  x{cnt:<6d} {name[:110]}")


if __name__ == "__main__":
    target = sys.argv[1]
    topn = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    if os.path.isdir(target):
        pbs = sorted(glob.glob(target + "/**/*.xplane.pb", recursive=True))
        target = pbs[-1]
        print("parsing", target)
    summarize(target, topn)
