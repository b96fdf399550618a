"""TensorBoard event-file writer: TFRecord framing + proto round-trip."""
import struct

import numpy as np

from tpu3dwsis.utils.logging import MetricsWriter
from tpu3dwsis.utils.tbevents import crc32c, masked_crc


def test_crc32c_check_value():
    # the standard CRC-32C (Castagnoli) check value
    assert crc32c(b"123456789") == 0xE3069283


def _read_records(path):
    data = open(path, "rb").read()
    pos = 0
    records = []
    while pos < len(data):
        (length,) = struct.unpack_from("<Q", data, pos)
        header = data[pos : pos + 8]
        (hcrc,) = struct.unpack_from("<I", data, pos + 8)
        assert hcrc == masked_crc(header), "header crc mismatch"
        payload = data[pos + 12 : pos + 12 + length]
        (pcrc,) = struct.unpack_from("<I", data, pos + 12 + length)
        assert pcrc == masked_crc(payload), "payload crc mismatch"
        records.append(payload)
        pos += 12 + length + 4
    return records


def _decode_fields(buf):
    """Minimal protobuf wire decoder: {field: [raw values]}."""
    fields = {}
    pos = 0
    while pos < len(buf):
        key = 0
        shift = 0
        while True:
            b = buf[pos]
            pos += 1
            key |= (b & 0x7F) << shift
            shift += 7
            if not b & 0x80:
                break
        field, wire = key >> 3, key & 7
        if wire == 0:  # varint
            v = 0
            shift = 0
            while True:
                b = buf[pos]
                pos += 1
                v |= (b & 0x7F) << shift
                shift += 7
                if not b & 0x80:
                    break
        elif wire == 1:  # fixed64
            (v,) = struct.unpack_from("<d", buf, pos)
            pos += 8
        elif wire == 2:  # length-delimited
            ln = 0
            shift = 0
            while True:
                b = buf[pos]
                pos += 1
                ln |= (b & 0x7F) << shift
                shift += 7
                if not b & 0x80:
                    break
            v = buf[pos : pos + ln]
            pos += ln
        elif wire == 5:  # fixed32
            (v,) = struct.unpack_from("<f", buf, pos)
            pos += 4
        else:
            raise AssertionError(f"unexpected wire type {wire}")
        fields.setdefault(field, []).append(v)
    return fields


def test_metrics_writer_emits_valid_tb_events(tmp_path):
    w = MetricsWriter(str(tmp_path))
    w.update({"loss": 1.5, "lr": 0.001}, step=1)
    w.update({"loss": 1.25}, step=2)
    w.close()

    event_files = list(tmp_path.glob("events.out.tfevents.*"))
    assert len(event_files) == 1
    records = _read_records(event_files[0])
    # record 0: file_version
    head = _decode_fields(records[0])
    assert head[3] == [b"brain.Event:2"]

    scalars = []
    for rec in records[1:]:
        ev = _decode_fields(rec)
        step = ev.get(2, [0])[0]
        for summary in ev[5]:
            for value_msg in _decode_fields(summary)[1]:
                vf = _decode_fields(value_msg)
                scalars.append((vf[1][0].decode(), step, vf[2][0]))
        assert ev[1][0] > 1e9  # wall time is epoch seconds

    assert ("loss", 1, 1.5) in [(t, s, round(v, 6)) for t, s, v in scalars]
    assert ("lr", 1, np.float32(0.001)) in [(t, s, np.float32(v)) for t, s, v in scalars]
    assert ("loss", 2, 1.25) in [(t, s, round(v, 6)) for t, s, v in scalars]

    # jsonl fallback still written
    assert (tmp_path / "metrics.jsonl").read_text().count("\n") == 2
