"""The dependency-free event writer must produce files the REAL tensorboard
reads back bit-exactly (tags, steps, values, file_version record).

Capability parity target: the reference's training callback
(/root/reference/ultralytics/utils/callbacks/tensorboard.py:8-97) writes
per-epoch scalars via SummaryWriter; ours writes the TFRecord/Event wire
format by hand (utils/tb_events.py) and is validated here against the
installed tensorboard's EventFileLoader.
"""

import math

import pytest

from ood_in_object_detection_tpu.utils.tb_events import EventWriter, _crc32c

tb_loader = pytest.importorskip(
    "tensorboard.backend.event_processing.event_file_loader")


def _read_events(log_dir):
    files = sorted(log_dir.glob("events.out.tfevents.*"))
    assert len(files) == 1
    return list(tb_loader.EventFileLoader(str(files[0])).Load())


def test_crc32c_known_vectors():
    # RFC 3720 test vectors for CRC32C (Castagnoli)
    assert _crc32c(b"") == 0x00000000
    assert _crc32c(b"123456789") == 0xE3069283
    assert _crc32c(bytes(32)) == 0x8A9136AA


def test_roundtrip_through_real_tensorboard(tmp_path):
    with EventWriter(tmp_path) as w:
        w.scalars({"train/box_loss": 1.5, "metrics/mAP50(B)": 0.25}, step=0)
        w.scalar("train/box_loss", 0.75, step=1)
        w.scalar("train/nan_skipped", float("nan"), step=1)  # must be dropped
        w.flush()

    events = _read_events(tmp_path)
    # first record is the file_version header tensorboard requires
    assert events[0].file_version == "brain.Event:2"

    def val(v):
        # tb>=2.x loaders migrate simple_value into a rank-0 tensor proto
        if v.WhichOneof("value") == "simple_value":
            return v.simple_value
        return v.tensor.float_val[0]

    scalars = [(v.tag, e.step, val(v))
               for e in events[1:] for v in e.summary.value]
    assert ("train/box_loss", 0, 1.5) in scalars
    assert ("metrics/mAP50(B)", 0, 0.25) in scalars
    assert ("train/box_loss", 1, 0.75) in scalars
    assert all(not math.isnan(v) for _, _, v in scalars)
    assert all(not t.startswith("train/nan") for t, _, _ in scalars)


def test_lazy_file_creation(tmp_path):
    w = EventWriter(tmp_path / "run")
    assert not (tmp_path / "run").exists()  # nothing until first write
    w.scalar("a", 1.0, 0)
    w.close()
    assert len(list((tmp_path / "run").glob("events.out.tfevents.*"))) == 1
