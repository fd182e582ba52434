"""Tests for the dependency-free XSpace trace parser + attribution.

Covers: (1) exact decoding of a hand-encoded XSpace proto including the
metadata maps and the sync/async line split, (2) the HLO family classifier
on real TPU signature shapes, (3) end-to-end parse of a genuine
jax.profiler CPU trace.
"""

import struct

import jax
import jax.numpy as jnp
import pytest

from conditional_score_diffusion_tpu.profiling import xplane as xp


# ---------------------------------------------------------------------------
# Minimal protobuf ENCODER (test-side inverse of the parser)
# ---------------------------------------------------------------------------


def _varint(v: int) -> bytes:
    out = b""
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out += bytes([b | 0x80])
        else:
            return out + bytes([b])


def _tag(field: int, wire: int) -> bytes:
    return _varint(field << 3 | wire)


def _len_field(field: int, payload: bytes) -> bytes:
    return _tag(field, 2) + _varint(len(payload)) + payload


def _varint_field(field: int, v: int) -> bytes:
    return _tag(field, 0) + _varint(v)


def _stat(metadata_id: int, *, double=None, string=None, i64=None) -> bytes:
    msg = _varint_field(1, metadata_id)
    if double is not None:
        msg += _tag(2, 1) + struct.pack("<d", double)
    if string is not None:
        msg += _len_field(5, string.encode())
    if i64 is not None:
        msg += _varint_field(4, i64)
    return msg


def _event(metadata_id: int, offset_ps: int, duration_ps: int, stats=()) -> bytes:
    msg = _varint_field(1, metadata_id)
    msg += _varint_field(2, offset_ps)
    msg += _varint_field(3, duration_ps)
    for s in stats:
        msg += _len_field(4, s)
    return msg


def _line(name: str, events) -> bytes:
    msg = _len_field(2, name.encode())
    msg += _varint_field(3, 12345)
    for e in events:
        msg += _len_field(4, e)
    return msg


def _meta_entry(key: int, name: str) -> bytes:
    inner = _varint_field(1, key) + _len_field(2, name.encode())
    return _varint_field(1, key) + _len_field(2, inner)


def _plane(name: str, lines, event_meta, stat_meta) -> bytes:
    msg = _len_field(2, name.encode())
    for line in lines:
        msg += _len_field(3, line)
    for k, v in event_meta.items():
        msg += _len_field(4, _meta_entry(k, v))
    for k, v in stat_meta.items():
        msg += _len_field(5, _meta_entry(k, v))
    return msg


CONV_SIG = (
    "%convert_reduce_fusion.69 = (f32[8,288]{1,0}, bf16[8,5,5,288]{3,0,2,1}) "
    "fusion(bf16[3,3,288,288]{3,2,1,0} %custom-call.38), kind=kOutput, "
    "calls=%fused_computation.899"
)
GN_SIG = "%reduce_fusion.3 = f32[8,32]{1,0} fusion(...), kind=kInput, calls=%fc.2"
COPY_SIG = "%copy.5 = bf16[8,160,160,96]{3,0,2,1} copy(bf16[...] %x)"
ASYNC_SIG = "%copy-start.7 = (bf16[8,384]{1,0}, u32[]{:S(2)}) copy-start(...)"


def _toy_xspace_bytes() -> bytes:
    event_meta = {1: CONV_SIG, 2: GN_SIG, 3: COPY_SIG, 4: ASYNC_SIG}
    stat_meta = {7: "device_duration_ps"}
    sync = _line(
        "XLA Ops",
        [
            _event(1, 0, 4_000_000_000, [_stat(7, i64=4_000_000_000)]),
            _event(2, 4_000_000_000, 1_000_000_000),
            _event(3, 5_000_000_000, 500_000_000),
        ],
    )
    async_line = _line("Async XLA Ops", [_event(4, 0, 9_000_000_000)])
    dev = _plane("/device:TPU:0", [sync, async_line], event_meta, stat_meta)
    host = _plane("/host:CPU", [_line("python", [])], {}, {})
    return _len_field(1, dev) + _len_field(1, host)


# ---------------------------------------------------------------------------


class TestParser:
    def test_roundtrip_decoding(self, tmp_path):
        pb = tmp_path / "toy.xplane.pb"
        pb.write_bytes(_toy_xspace_bytes())
        planes = xp.parse_xspace(str(pb))
        assert [p.name for p in planes] == ["/device:TPU:0", "/host:CPU"]
        dev = planes[0]
        assert [l.name for l in dev.lines] == ["XLA Ops", "Async XLA Ops"]
        evs = dev.lines[0].events
        assert [e.name for e in evs] == [CONV_SIG, GN_SIG, COPY_SIG]
        assert [e.duration_ps for e in evs] == [4_000_000_000, 1_000_000_000, 500_000_000]
        # stat metadata resolution
        assert evs[0].stat("device_duration_ps") == 4_000_000_000

    def test_sync_async_split(self, tmp_path):
        pb = tmp_path / "toy.xplane.pb"
        pb.write_bytes(_toy_xspace_bytes())
        result = xp.attribute(str(pb))
        # sync total = 4 + 1 + 0.5 ms; async copy-start excluded from it
        assert result["total_ms"] == pytest.approx(5.5)
        assert result["async_overlapped_ms"] == pytest.approx(9.0)
        fams = result["families"]
        assert fams["convolution/mxu"]["ms"] == pytest.approx(4.0)
        assert fams["reduce/norm"]["ms"] == pytest.approx(1.0)
        assert fams["copy/layout"]["ms"] == pytest.approx(0.5)
        assert fams["convolution/mxu"]["share"] == pytest.approx(4.0 / 5.5)

    def test_find_xplane_files_on_dir(self, tmp_path):
        d = tmp_path / "plugins" / "profile" / "run1"
        d.mkdir(parents=True)
        (d / "host.xplane.pb").write_bytes(_toy_xspace_bytes())
        files = xp.find_xplane_files(str(tmp_path))
        assert len(files) == 1 and files[0].endswith("host.xplane.pb")


class TestClassifier:
    @pytest.mark.parametrize(
        "name,family",
        [
            (CONV_SIG, "convolution/mxu"),
            ("%fusion.47 = bf16[...] fusion(...), kind=kOutput, calls=%fc", "convolution/mxu"),
            ("%convolution.1 = bf16[...] convolution(...)", "convolution/mxu"),
            (GN_SIG, "reduce/norm"),
            (COPY_SIG, "copy/layout"),
            ("%pad_maximum_fusion = bf16[...] fusion(...), kind=kLoop", "concat/pad"),
            ("%transpose.9 = f32[...] transpose(...)", "copy/layout"),
            ("%all-gather.1 = f32[...] all-gather(...)", "collective"),
            ("%fusion.12 = bf16[...] fusion(...), kind=kLoop, calls=%fc", "fusion/elementwise"),
            ("%constant.5 = f32[] constant(1)", "other"),
        ],
    )
    def test_families(self, name, family):
        assert xp._classify(name, None) == family

    def test_category_stat_wins(self):
        assert xp._classify("%x = f32[] whatever()", "Convolution") == "convolution"


class TestRealTrace:
    def test_parse_live_jax_trace(self, tmp_path):
        """Capture a real (CPU) jax.profiler trace and parse it."""

        @jax.jit
        def f(x):
            return jnp.tanh(x @ x.T).sum()

        x = jnp.ones((64, 64))
        f(x).block_until_ready()
        jax.profiler.start_trace(str(tmp_path))
        f(x).block_until_ready()
        jax.profiler.stop_trace()

        files = xp.find_xplane_files(str(tmp_path))
        assert files, "jax.profiler produced no xplane.pb"
        planes = []
        for fpath in files:
            planes.extend(xp.parse_xspace(fpath))
        names = [p.name for p in planes]
        assert any("CPU" in n or "host" in n.lower() for n in names)
        # every decoded event must have sane fields
        for p in planes:
            for line in p.lines:
                for e in line.events:
                    assert e.duration_ps >= 0
                    assert isinstance(e.name, str)
        # attribution must run without error on a host-only trace
        result = xp.attribute(str(tmp_path))
        assert result["total_ms"] >= 0.0
