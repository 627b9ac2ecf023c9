"""Minimal XSpace (jax.profiler device trace) reader.

Parses .xplane.pb protobuf wire format directly (the environment's
tensorboard_plugin_profile protos are unloadable), extracting per-plane event
names and durations. Schema: tsl/profiler/protobuf/xplane.proto (public):

  XSpace { repeated XPlane planes = 1; }
  XPlane { int64 id = 1; string name = 2; repeated XLine lines = 3;
           map<int64, XEventMetadata> event_metadata = 4; }
  XLine  { int64 id = 1; string name = 2; repeated XEvent events = 4; }
  XEvent { int64 metadata_id = 1; int64 offset_ps = 2; int64 duration_ps = 3; }
  XEventMetadata { int64 id = 1; string name = 2; }

Needed on this rig because block_until_ready resolves before remote device
execution completes (see PERFNOTES.md), so device traces are the only honest
timing instrument.
"""
from typing import Dict, Iterator, List, Tuple


def _varint(buf: bytes, i: int) -> Tuple[int, int]:
    out = 0
    shift = 0
    while True:
        b = buf[i]
        i += 1
        out |= (b & 0x7F) << shift
        if not b & 0x80:
            return out, i
        shift += 7


def _fields(buf: bytes) -> Iterator[Tuple[int, int, object]]:
    """Yield (field_number, wire_type, value) over a message buffer."""
    i = 0
    n = len(buf)
    while i < n:
        key, i = _varint(buf, i)
        fnum, wt = key >> 3, key & 7
        if wt == 0:
            v, i = _varint(buf, i)
        elif wt == 1:
            v = int.from_bytes(buf[i:i + 8], 'little')
            i += 8
        elif wt == 2:
            ln, i = _varint(buf, i)
            v = buf[i:i + ln]
            i += ln
        elif wt == 5:
            v = int.from_bytes(buf[i:i + 4], 'little')
            i += 4
        else:
            raise ValueError(f'unsupported wire type {wt}')
        yield fnum, wt, v


def _parse_event(buf: bytes):
    mid = dur = 0
    for f, _, v in _fields(buf):
        if f == 1:
            mid = v
        elif f == 3:
            dur = v
    return mid, dur


def _parse_line(buf: bytes):
    name = ''
    events = []
    for f, wt, v in _fields(buf):
        if f == 2 and wt == 2:
            name = v.decode('utf-8', 'replace')
        elif f == 4 and wt == 2:
            events.append(_parse_event(v))
    return name, events


def _parse_meta_entry(buf: bytes):
    """map entry: key=1 varint, value=2 XEventMetadata (name=2,
    display_name=3)."""
    key = 0
    name = ''
    display = ''
    for f, wt, v in _fields(buf):
        if f == 1 and wt == 0:
            key = v
        elif f == 2 and wt == 2:
            for f2, wt2, v2 in _fields(v):
                if f2 == 2 and wt2 == 2:
                    name = v2.decode('utf-8', 'replace')
                elif f2 == 3 and wt2 == 2:
                    display = v2.decode('utf-8', 'replace')
    return key, name, display


def parse_xplane(path: str, with_display: bool = False):
    """-> {plane_name: [(line_name, event_name, duration_ps), ...]};
    with_display=True appends the event metadata's display_name (XLA ops
    carry the scoped tf_op/named_scope path there) as a 4th element."""
    with open(path, 'rb') as f:
        buf = f.read()
    out: Dict[str, list] = {}
    for f1, wt, plane in _fields(buf):
        if f1 != 1 or wt != 2:
            continue
        pname = ''
        lines = []
        meta: Dict[int, Tuple[str, str]] = {}
        for f2, wt2, v in _fields(plane):
            if f2 == 2 and wt2 == 2:
                pname = v.decode('utf-8', 'replace')
            elif f2 == 3 and wt2 == 2:
                lines.append(_parse_line(v))
            elif f2 == 4 and wt2 == 2:
                k, n, d = _parse_meta_entry(v)
                meta[k] = (n, d)
        events = []
        for lname, evs in lines:
            for mid, dur in evs:
                n, d = meta.get(mid, (str(mid), ''))
                events.append((lname, n, dur, d) if with_display
                              else (lname, n, dur))
        out.setdefault(pname, []).extend(events)
    return out


def device_module_times(logdir: str) -> Dict[str, float]:
    """Total device time (ms) per top-level XLA module/event across all
    device planes under a profiler logdir."""
    import glob
    import os
    agg: Dict[str, float] = {}
    for path in glob.glob(os.path.join(logdir, '**', '*.xplane.pb'),
                          recursive=True):
        for pname, events in parse_xplane(path).items():
            low = pname.lower()
            if 'tpu' not in low and 'device' not in low and 'gpu' not in low:
                continue
            for lname, ename, dur in events:
                agg[ename] = agg.get(ename, 0.0) + dur / 1e9
    return agg
