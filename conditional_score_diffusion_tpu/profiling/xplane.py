"""Dependency-free XSpace (``*.xplane.pb``) parser + HLO-family attribution.

JAX's profiler (``jax.profiler.start_trace``) writes TensorFlow XSpace
protos.  The schema is small and stable
(tensorflow/core/profiler/protobuf/xplane.proto); rather than importing
tensorflow (~1 min import, heavyweight dep) we decode the wire format
directly with a ~100-line varint reader.  Only the fields the attribution
needs are materialized.

Wire schema decoded here::

    XSpace    { repeated XPlane planes = 1; }
    XPlane    { int64 id=1; string name=2; repeated XLine lines=3;
                map<int64,XEventMetadata> event_metadata=4;
                map<int64,XStatMetadata>  stat_metadata=5; }
    XLine     { int64 id=1; string name=2; int64 timestamp_ns=3;
                repeated XEvent events=4; string display_name=11; }
    XEvent    { int64 metadata_id=1; int64 offset_ps=2; int64 duration_ps=3;
                repeated XStat stats=4; int64 num_occurrences=5; }
    XEventMetadata { int64 id=1; string name=2; string display_name=4; }
    XStatMetadata  { int64 id=1; string name=2; }
    XStat     { int64 metadata_id=1; double double_value=2;
                uint64 uint64_value=3; int64 int64_value=4;
                string str_value=5; bytes bytes_value=6; uint64 ref_value=7; }

Attribution output backs the op-family tables in BENCH_NOTES.md (the
"Round-2 per-eval attribution" section).
"""

from __future__ import annotations

import collections
import dataclasses
import glob
import os
import struct
from typing import Dict, Iterator, List, Optional, Tuple

# ---------------------------------------------------------------------------
# Protobuf wire-format primitives
# ---------------------------------------------------------------------------

_WIRE_VARINT = 0
_WIRE_I64 = 1
_WIRE_LEN = 2
_WIRE_I32 = 5


def _read_varint(buf: bytes, pos: int) -> Tuple[int, int]:
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7


def _fields(buf: bytes) -> Iterator[Tuple[int, int, object]]:
    """Yield (field_number, wire_type, value) for one message's bytes."""
    pos, end = 0, len(buf)
    while pos < end:
        tag, pos = _read_varint(buf, pos)
        field, wire = tag >> 3, tag & 7
        if wire == _WIRE_VARINT:
            val, pos = _read_varint(buf, pos)
        elif wire == _WIRE_LEN:
            length, pos = _read_varint(buf, pos)
            val = buf[pos : pos + length]
            pos += length
        elif wire == _WIRE_I64:
            val = struct.unpack_from("<q", buf, pos)[0]
            pos += 8
        elif wire == _WIRE_I32:
            val = struct.unpack_from("<i", buf, pos)[0]
            pos += 4
        else:  # pragma: no cover - malformed input
            raise ValueError(f"unsupported wire type {wire} at byte {pos}")
        yield field, wire, val


def _zigzag(v: int) -> int:
    # int64 fields in xplane use plain varints (not zigzag); keep helper for
    # completeness of sint decoding if a future field needs it.
    return (v >> 1) ^ -(v & 1)


# ---------------------------------------------------------------------------
# Decoded model (only what attribution needs)
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class XStat:
    name: str
    value: object


@dataclasses.dataclass
class XEvent:
    name: str
    offset_ps: int
    duration_ps: int
    num_occurrences: int
    stats: List[XStat]

    def stat(self, name: str) -> Optional[object]:
        for s in self.stats:
            if s.name == name:
                return s.value
        return None


@dataclasses.dataclass
class XLine:
    name: str
    timestamp_ns: int
    events: List[XEvent]


@dataclasses.dataclass
class XPlane:
    name: str
    lines: List[XLine]


def _parse_stat(buf: bytes, stat_meta: Dict[int, str]) -> XStat:
    name, value = "", None
    for field, _, val in _fields(buf):
        if field == 1:
            name = stat_meta.get(val, str(val))
        elif field == 2:
            # I64 payloads were decoded signed ("<q") in _fields; re-pack
            # signed so negative doubles round-trip instead of raising.
            value = struct.unpack("<d", struct.pack("<q", val))[0] if isinstance(val, int) else val
        elif field in (3, 4, 7):
            value = val
        elif field == 5:
            value = val.decode("utf-8", "replace")
        elif field == 6:
            value = val
    return XStat(name, value)


def _parse_event(buf: bytes, event_meta: Dict[int, str], stat_meta: Dict[int, str]) -> XEvent:
    name, offset_ps, duration_ps, occurrences = "", 0, 0, 1
    stats: List[XStat] = []
    for field, _, val in _fields(buf):
        if field == 1:
            name = event_meta.get(val, str(val))
        elif field == 2:
            offset_ps = val
        elif field == 3:
            duration_ps = val
        elif field == 4:
            stats.append(_parse_stat(val, stat_meta))
        elif field == 5:
            occurrences = val
    return XEvent(name, offset_ps, duration_ps, occurrences, stats)


def _parse_metadata_map_entry(buf: bytes, name_field: int = 2) -> Tuple[int, str]:
    """Decode one map<int64, X*Metadata> entry -> (id, name)."""
    key, name = 0, ""
    for field, _, val in _fields(buf):
        if field == 1:
            key = val
        elif field == 2:
            # value: nested metadata message
            for f2, _, v2 in _fields(val):
                if f2 == 1:
                    key = key or v2
                elif f2 == name_field:
                    name = v2.decode("utf-8", "replace")
    return key, name


def _parse_line(buf: bytes, event_meta: Dict[int, str], stat_meta: Dict[int, str]) -> XLine:
    name, ts, events = "", 0, []
    for field, _, val in _fields(buf):
        if field == 2:
            name = val.decode("utf-8", "replace")
        elif field == 3:
            ts = val
        elif field == 4:
            events.append(_parse_event(val, event_meta, stat_meta))
        elif field == 11 and not name:
            name = val.decode("utf-8", "replace")
    return XLine(name, ts, events)


def _parse_plane(buf: bytes) -> XPlane:
    # Two passes: metadata maps first (they may appear after lines on the
    # wire), then lines resolving names through them.
    event_meta: Dict[int, str] = {}
    stat_meta: Dict[int, str] = {}
    name = ""
    line_bufs: List[bytes] = []
    for field, _, val in _fields(buf):
        if field == 2:
            name = val.decode("utf-8", "replace")
        elif field == 3:
            line_bufs.append(val)
        elif field == 4:
            k, v = _parse_metadata_map_entry(val)
            event_meta[k] = v
        elif field == 5:
            k, v = _parse_metadata_map_entry(val)
            stat_meta[k] = v
    lines = [_parse_line(b, event_meta, stat_meta) for b in line_bufs]
    return XPlane(name, lines)


def parse_xspace(path: str) -> List[XPlane]:
    """Parse one ``.xplane.pb`` file into a list of XPlane objects."""
    with open(path, "rb") as f:
        buf = f.read()
    planes = []
    for field, _, val in _fields(buf):
        if field == 1:
            planes.append(_parse_plane(val))
    return planes


def find_xplane_files(trace_dir: str) -> List[str]:
    """Locate ``*.xplane.pb`` under a jax.profiler trace directory."""
    if os.path.isfile(trace_dir):
        return [trace_dir]
    return sorted(glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"), recursive=True))


# ---------------------------------------------------------------------------
# Attribution
# ---------------------------------------------------------------------------

#: Op-head classifier (matched against the HLO op name before " = ").
#: First match wins.  Families mirror the BENCH_NOTES attribution tables.
_HEAD_RULES: List[Tuple[str, Tuple[str, ...]]] = [
    ("copy/layout", ("copy", "transpose", "bitcast")),
    ("concat/pad", ("pad", "concatenate", "slice", "dynamic-update", "dynamic_update")),
    ("collective", ("all-gather", "all-to-all", "collective", "ppermute", "reduce-scatter")),
    ("reduce/norm", ("reduce", "norm")),
    ("rng", ("rng", "threefry", "bitcast-convert_xor")),
    ("convolution", ("convolution",)),
    ("matmul", ("dot", "einsum", "matmul")),
]


def _classify(name: str, category: Optional[str]) -> str:
    """Classify a TPU XLA-Ops event into an op family.

    The event name is the full HLO signature, e.g.
    ``%fusion.47 = bf16[...] fusion(bf16[...]), kind=kOutput, calls=...`` —
    TPU traces carry no hlo_category stat, so classification uses the op
    head plus the fusion ``kind=`` marker: ``kOutput`` fusions are rooted at
    an MXU op (conv/dot) while ``kLoop``/``kInput`` fusions are VPU
    elementwise/reduce code.
    """
    if category:
        # hlo_category stat when present (GPU traces) is authoritative.
        return category.lower()
    n = name.lower()
    head = n.split(" = ")[0].lstrip("%")
    # kOutput fusions are MXU-rooted regardless of their fused-op head name:
    # e.g. %convert_reduce_fusion with a [3,3,C,K] weight operand is a conv
    # whose output also feeds the next GroupNorm's statistics reduction.
    if "convolution" in n or "kind=koutput" in n:
        return "convolution/mxu"
    for family, keys in _HEAD_RULES:
        if any(k in head for k in keys):
            return family
    if "fusion" in head:
        return "fusion/elementwise"
    return "other"


def _is_device_plane(plane: XPlane) -> bool:
    return "/device:" in plane.name or "TPU" in plane.name or "GPU" in plane.name


def device_op_table(planes: List[XPlane], async_ops: bool = False) -> List[dict]:
    """Aggregate per-op device time over all device planes' "XLA Ops" lines.

    On TPU the device plane carries a sync ``XLA Ops`` line (wall-clock
    compute — the number that matters) and an ``Async XLA Ops`` line
    (DMA/copy traffic *overlapped* behind compute; its durations must NOT be
    added to wall-clock).  ``async_ops`` selects which population to
    aggregate.

    Returns rows sorted by total_ps descending:
    ``{name, family, occurrences, total_ps, avg_ps}``.
    """
    agg: Dict[Tuple[str, str], List[int]] = collections.defaultdict(lambda: [0, 0])
    for plane in planes:
        if not _is_device_plane(plane):
            continue
        for line in plane.lines:
            # XLA op-level lines; skip module/step summary lines.
            lname = line.name.lower()
            if "module" in lname or "step" in lname:
                continue
            if ("async" in lname) != async_ops:
                continue
            for ev in line.events:
                category = ev.stat("hlo_category")
                if isinstance(category, bytes):
                    category = category.decode("utf-8", "replace")
                fam = _classify(ev.name, category if isinstance(category, str) else None)
                key = (ev.name, fam)
                # In aggregated planes duration_ps is already the summed
                # total across occurrences; multiplying by num_occurrences
                # would double-count (raw traces leave it unset -> 1).
                agg[key][0] += ev.duration_ps
                agg[key][1] += max(ev.num_occurrences, 1)
    rows = [
        {
            "name": name,
            "family": fam,
            "occurrences": occ,
            "total_ps": tot,
            "avg_ps": tot // max(occ, 1),
        }
        for (name, fam), (tot, occ) in agg.items()
    ]
    rows.sort(key=lambda r: -r["total_ps"])
    return rows


def attribute(trace: str) -> dict:
    """Full attribution for a trace dir/file.

    Returns ``{"files": [...], "total_ms": float, "families": {family:
    {"ms": float, "share": float}}, "top_ops": [...]}``.
    """
    files = find_xplane_files(trace)
    planes: List[XPlane] = []
    for f in files:
        planes.extend(parse_xspace(f))
    table = device_op_table(planes)
    async_table = device_op_table(planes, async_ops=True)
    total_ps = sum(r["total_ps"] for r in table)
    fams: Dict[str, int] = collections.defaultdict(int)
    for r in table:
        fams[r["family"]] += r["total_ps"]
    return {
        "files": files,
        "planes": [p.name for p in planes],
        "total_ms": total_ps / 1e9,
        "async_overlapped_ms": sum(r["total_ps"] for r in async_table) / 1e9,
        "families": {
            k: {"ms": v / 1e9, "share": (v / total_ps if total_ps else 0.0)}
            for k, v in sorted(fams.items(), key=lambda kv: -kv[1])
        },
        "top_ops": table[:25],
        "top_async_ops": async_table[:10],
    }


def main(argv: Optional[List[str]] = None) -> None:  # pragma: no cover - CLI
    import argparse
    import json

    p = argparse.ArgumentParser(description="Attribute device time in a JAX trace")
    p.add_argument("trace", help="trace directory (jax.profiler output) or .xplane.pb")
    p.add_argument("--top", type=int, default=15, help="top-N ops to print")
    p.add_argument("--json", action="store_true", help="dump full JSON")
    args = p.parse_args(argv)

    result = attribute(args.trace)
    if args.json:
        print(json.dumps(result, indent=2))
        return
    print(f"trace files: {len(result['files'])}  planes: {result['planes']}")
    print(
        f"total device time: {result['total_ms']:.3f} ms"
        f"  (+{result['async_overlapped_ms']:.3f} ms async, overlapped)"
    )
    print(f"{'family':<22}{'ms':>10}{'share':>8}")
    for fam, d in result["families"].items():
        print(f"{fam:<22}{d['ms']:>10.3f}{d['share']:>8.1%}")
    print()
    print(f"{'op':<50}{'n':>6}{'total ms':>10}{'avg us':>9}")
    for r in result["top_ops"][: args.top]:
        print(
            f"{r['name'][:49]:<50}{r['occurrences']:>6}"
            f"{r['total_ps'] / 1e9:>10.3f}{r['avg_ps'] / 1e6:>9.1f}"
        )


if __name__ == "__main__":  # pragma: no cover
    main()
