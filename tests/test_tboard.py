"""TensorBoard writer: re-parse the written event file and verify record
framing, CRCs, and scalar payloads."""

import struct

import numpy as np

from mp_hsir_tpu.utils.tboard import SummaryWriter, _masked_crc


def _read_records(path):
    recs = []
    with open(path, "rb") as f:
        while True:
            header = f.read(8)
            if len(header) < 8:
                break
            (length,) = struct.unpack("<Q", header)
            (hcrc,) = struct.unpack("<I", f.read(4))
            assert hcrc == _masked_crc(header), "header CRC mismatch"
            data = f.read(length)
            (dcrc,) = struct.unpack("<I", f.read(4))
            assert dcrc == _masked_crc(data), "data CRC mismatch"
            recs.append(data)
    return recs


def _parse_scalar(event_bytes):
    """Minimal proto walk: find step (field 2 varint) and the float value."""
    i, step, value = 0, None, None
    data = event_bytes
    while i < len(data):
        key = data[i]
        field, wire = key >> 3, key & 7
        i += 1
        if wire == 0:  # varint
            v = 0
            shift = 0
            while True:
                b = data[i]
                v |= (b & 0x7F) << shift
                i += 1
                shift += 7
                if not b & 0x80:
                    break
            if field == 2:
                step = v
        elif wire == 1:
            i += 8
        elif wire == 5:
            if field == 2:
                (value,) = struct.unpack("<f", data[i : i + 4])
            i += 4
        elif wire == 2:
            ln = 0
            shift = 0
            while True:
                b = data[i]
                ln |= (b & 0x7F) << shift
                i += 1
                shift += 7
                if not b & 0x80:
                    break
            if field in (5, 1):  # descend into summary / value
                s, v = _parse_scalar(data[i : i + ln])
                step = step if s is None else s
                value = value if v is None else v
            i += ln
    return step, value


def test_event_file_roundtrip(tmp_path):
    w = SummaryWriter(str(tmp_path))
    w.add_scalar("train_loss", 0.25, 7)
    w.add_scalar("train_loss", 0.125, 8)
    w.close()
    files = list(tmp_path.glob("events.out.tfevents.*"))
    assert len(files) == 1
    recs = _read_records(files[0])
    assert len(recs) == 3  # file_version + 2 scalars
    s1, v1 = _parse_scalar(recs[1])
    s2, v2 = _parse_scalar(recs[2])
    assert (s1, round(v1, 6)) == (7, 0.25)
    assert (s2, round(v2, 6)) == (8, 0.125)
