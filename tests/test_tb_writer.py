"""Pure-Python TensorBoard writer: files must parse with stock tensorboard.

The installed `tensorboard` package acts as the oracle (same role torch plays
for the model-parity goldens): its TFRecord reader checks the masked CRC32C
framing and its proto classes decode the Event/Summary messages, so a pass
here means real TensorBoard loads our files.
"""
import glob
import os
import struct

import numpy as np
import pytest


def _read_records(path):
    """Minimal TFRecord reader (validates lengths, returns payloads)."""
    out = []
    with open(path, "rb") as f:
        while True:
            header = f.read(8)
            if not header:
                return out
            (length,) = struct.unpack("<Q", header)
            f.read(4)                       # length crc
            out.append(f.read(length))
            f.read(4)                       # data crc


def test_event_file_parses_with_tensorboard(tmp_path):
    tb_proto = pytest.importorskip("tensorboard.compat.proto.event_pb2")

    from excel_tpu.utils.tb import SummaryWriter, _masked_crc

    w = SummaryWriter(str(tmp_path))
    w.add_scalar("train/loss", 0.125, 7)
    w.add_scalar("train/lr", 1e-4, 7)
    img = np.zeros((4, 6, 3), np.uint8)
    img[:, :3] = (255, 0, 0)
    w.add_image("val/panel", img, 9)
    w.close()

    (path,) = glob.glob(os.path.join(tmp_path, "events.out.tfevents.*"))
    records = _read_records(path)
    assert len(records) == 4                # file_version + 2 scalars + image

    # CRCs must match what tensorboard's reader computes
    try:
        from tensorboard.compat.tensorflow_stub.pywrap_tensorflow import (
            masked_crc32c)
        for r in records:
            assert masked_crc32c(r) == _masked_crc(r)
    except ImportError:
        pass

    events = [tb_proto.Event.FromString(r) for r in records]
    assert events[0].file_version == "brain.Event:2"

    sc = events[1].summary.value[0]
    assert sc.tag == "train/loss"
    assert sc.simple_value == pytest.approx(0.125)
    assert events[1].step == 7

    im = events[3].summary.value[0]
    assert im.tag == "val/panel"
    assert im.image.height == 4 and im.image.width == 6
    assert im.image.colorspace == 3
    # PNG payload round-trips to the original pixels
    import io

    from PIL import Image
    decoded = np.asarray(Image.open(io.BytesIO(
        im.image.encoded_image_string)))
    np.testing.assert_array_equal(decoded, img)


def test_no_torch_in_runtime_package():
    """The production package must not import torch at runtime. The offline
    checkpoint converters (cli/convert_clip.py, tools/convert_assets.py) are
    exempt — their input format IS a torch checkpoint."""
    import subprocess
    import sys

    code = (
        "import sys\n"
        "import excel_tpu\n"
        "import excel_tpu.cli.train\n"
        "import excel_tpu.engine.train, excel_tpu.engine.evaluate\n"
        "import excel_tpu.utils.tb\n"
        "assert 'torch' not in sys.modules, 'torch leaked into runtime'\n"
    )
    proc = subprocess.run([sys.executable, "-c", code],
                         capture_output=True, text=True,
                         env={**os.environ, "JAX_PLATFORMS": "cpu"})
    assert proc.returncode == 0, proc.stderr
