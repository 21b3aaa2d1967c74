"""Dependency-free TensorBoard event writer (synergy_tpu/tensorboard.py).

The reference pins tensorboard/tensorboardX but never imports them
(requirements.txt:134,136; SURVEY §5 observability names the optional dump as
the rebuild target). These tests pin the wire format — CRC32C against the RFC
3720 vectors, TFRecord framing, and the Event/Summary protobuf fields — via
an independent decoder, plus the CLI integration.
"""

import os
import struct

import pytest

from synergy_tpu.tensorboard import (
    SummaryWriter, crc32c, masked_crc32c, read_scalars,
)


def test_crc32c_rfc3720_vectors():
    assert crc32c(b"") == 0x00000000
    assert crc32c(b"123456789") == 0xE3069283
    assert crc32c(bytes(32)) == 0x8A9136AA
    assert crc32c(bytes([0xFF] * 32)) == 0x62A8AB43
    assert crc32c(bytes(range(32))) == 0x46DD794E


def test_masked_crc_is_tensorflow_rotation():
    # mask(crc) = rotr(crc, 15) + 0xa282ead8 (mod 2^32)
    crc = crc32c(b"123456789")
    expect = (((crc >> 15) | (crc << 17)) + 0xA282EAD8) & 0xFFFFFFFF
    assert masked_crc32c(b"123456789") == expect


def test_writer_roundtrip(tmp_path):
    w = SummaryWriter(str(tmp_path), flush_every=2)
    w.add_scalar("train/loss", 4.67, 1)
    w.add_scalar("train/loss", 4.05, 2)
    w.add_scalar("val/loss", -1.5, 2, wall_time=123.25)
    w.close()
    rows = read_scalars(w.path)
    assert [r[0] for r in rows] == ["train/loss", "train/loss", "val/loss"]
    assert rows[0][1] == pytest.approx(4.67) and rows[0][2] == 1
    assert rows[2] == ("val/loss", -1.5, 2, 123.25)


def test_file_structure_is_valid_tfrecord(tmp_path):
    """Walk the raw bytes: every record's length/payload CRCs verify and the
    first event is the brain.Event:2 file-version marker (what stock
    TensorBoard requires before it reads anything else)."""
    w = SummaryWriter(str(tmp_path))
    w.add_scalar("a", 1.0, 0)
    w.close()
    data = open(w.path, "rb").read()
    records = []
    pos = 0
    while pos < len(data):
        (length,) = struct.unpack_from("<Q", data, pos)
        assert masked_crc32c(data[pos:pos + 8]) == \
            struct.unpack_from("<I", data, pos + 8)[0]
        payload = data[pos + 12:pos + 12 + length]
        assert masked_crc32c(payload) == \
            struct.unpack_from("<I", data, pos + 12 + length)[0]
        records.append(payload)
        pos += 16 + length
    assert pos == len(data)  # no trailing garbage
    assert b"brain.Event:2" in records[0]
    assert len(records) == 2


def test_corruption_detected(tmp_path):
    w = SummaryWriter(str(tmp_path))
    w.add_scalar("a", 1.0, 0)
    w.close()
    data = bytearray(open(w.path, "rb").read())
    data[-6] ^= 0xFF  # flip a payload byte of the last record
    open(w.path, "wb").write(bytes(data))
    with pytest.raises(ValueError, match="crc"):
        read_scalars(w.path)


@pytest.mark.slow
def test_pretrain_cli_writes_events(tmp_path):
    from synergy_tpu.train.pretrain import main

    main([
        "--tiny", "true", "--synthetic", "true", "--synthetic_size", "16",
        "--epochs", "2", "--steps_per_epoch", "2", "--batch_size", "8",
        "--accum_steps", "1", "--ckpt_dir", str(tmp_path / "ck"),
        "--dtype", "float32", "--tb_dir", str(tmp_path / "tb"),
    ])
    files = [f for f in os.listdir(tmp_path / "tb")
             if f.startswith("events.out.tfevents.")]
    assert len(files) == 1
    rows = read_scalars(str(tmp_path / "tb" / files[0]))
    tags = {r[0] for r in rows}
    assert {"train/loss", "train/IT", "train/TA", "train/AI",
            "perf/triplets_per_sec", "val/loss", "test/loss"} <= tags
    # per-epoch steps recorded for both epochs
    assert {r[2] for r in rows if r[0] == "train/loss"} == {1, 2}
