"""Native TensorBoard event writer (utils/tb_native.py): round trip through
our own reader AND cross-validation against the real tensorboard loader."""

import glob
import os

import numpy as np
import pytest

from speechdrivestemplates_tpu.utils.tb_native import (NativeTBWriter,
                                                       _crc32c, read_events)


def test_crc32c_known_vectors():
    # RFC 3720 / kernel test vectors for CRC32C (Castagnoli)
    assert _crc32c(b"") == 0x00000000
    assert _crc32c(b"123456789") == 0xE3069283
    assert _crc32c(bytes(32)) == 0x8A9136AA


def _write_sample(log_dir, with_figure=False):
    w = NativeTBWriter(log_dir)
    w.add_scalar("train/loss", 0.5, global_step=1)
    w.add_scalar("train/loss", 0.25, global_step=2)
    w.add_scalar("train/lr_g", 1e-4, global_step=2)
    img = np.zeros((3, 8, 12), np.float32)
    img[0] = 1.0
    w.add_image("viz/frame", img, global_step=3)
    vid = np.random.rand(1, 16, 3, 8, 8).astype(np.float32)
    w.add_video("viz/clip", vid, global_step=4, fps=15)
    if with_figure:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots()
        ax.plot([0, 1], [1, 0])
        w.add_figure("viz/fig", fig, global_step=5)
    w.flush()
    w.close()
    (path,) = glob.glob(os.path.join(log_dir, "events.out.tfevents.*"))
    return path


def test_round_trip_own_reader(tmp_path):
    path = _write_sample(str(tmp_path))
    events = read_events(path)
    scalars = [e for e in events if "value" in e]
    images = [e for e in events if "png" in e]
    assert [(e["tag"], e["step"]) for e in scalars] == [
        ("train/loss", 1), ("train/loss", 2), ("train/lr_g", 2)]
    np.testing.assert_allclose([e["value"] for e in scalars],
                               [0.5, 0.25, 1e-4], rtol=1e-6)
    assert {(e["tag"], e["step"]) for e in images} == {
        ("viz/frame", 3), ("viz/clip", 4)}
    by_tag = {e["tag"]: e["png"] for e in images}
    assert by_tag["viz/frame"].startswith(b"\x89PNG\r\n\x1a\n")
    # videos are ANIMATED GIF image summaries (torch writer wire format)
    assert by_tag["viz/clip"].startswith(b"GIF89a")


def test_gif_round_trip_and_pil_cross_validation(tmp_path):
    """gif_encode -> own decoder AND PIL both reproduce the quantized frames
    exactly — incl. dictionary-reset (noisy) and flat (skeleton-like) clips."""
    from speechdrivestemplates_tpu.utils.tb_native import (_quantize_676,
                                                           gif_decode,
                                                           gif_encode)

    rng = np.random.RandomState(0)
    # a noisy frame must supply > 4096 LZW table entries to force the
    # mid-stream dictionary reset (each pixel can add at most one entry, so
    # frames need >= 4096 pixels; 72x72 = 5184)
    noisy = rng.randint(0, 256, (3, 72, 72, 3), np.uint8)
    flat = np.full((8, 32, 48, 3), 255, np.uint8)
    for t in range(8):
        flat[t, :, 5 * t: 5 * t + 3] = [255, 0, 0]

    for frames in (noisy, flat):
        idx, pal = _quantize_676(frames)
        want = pal[idx]
        gif = gif_encode(frames, fps=15)
        np.testing.assert_array_equal(gif_decode(gif), want)
        try:
            import io

            from PIL import Image, ImageSequence
        except ImportError:
            continue
        im = Image.open(io.BytesIO(gif))
        got = np.stack([np.asarray(f.convert("RGB"))
                        for f in ImageSequence.Iterator(im)])
        np.testing.assert_array_equal(got, want)
        assert im.info.get("loop", None) == 0  # loops forever


def test_cross_validate_with_real_tensorboard(tmp_path):
    """The real tensorboard package must load our file: this checks the
    TFRecord framing, CRC masking, and proto encoding against the canonical
    implementation, not our own mirror of it."""
    tb = pytest.importorskip("tensorboard")  # noqa: F841
    from tensorboard.backend.event_processing import event_file_loader

    path = _write_sample(str(tmp_path), with_figure=True)
    events = list(event_file_loader.EventFileLoader(path).Load())
    assert events[0].file_version == "brain.Event:2"

    # tensorboard >= 2 auto-migrates legacy simple_value/image summaries into
    # tensor protos with a plugin tag — accept either representation
    scalars = {}
    images = {}
    for ev in events[1:]:
        for v in ev.summary.value:
            kind = v.WhichOneof("value")
            if kind == "simple_value":
                scalars[(v.tag, ev.step)] = v.simple_value
            elif kind == "image":
                images[(v.tag, ev.step)] = (v.image.width, v.image.height,
                                            v.image.encoded_image_string)
            elif kind == "tensor":
                plugin = v.metadata.plugin_data.plugin_name
                if plugin == "scalars":
                    scalars[(v.tag, ev.step)] = v.tensor.float_val[0]
                elif plugin == "images":
                    w_, h_, png = v.tensor.string_val[:3]
                    images[(v.tag, ev.step)] = (int(w_), int(h_), png)
    assert scalars[("train/loss", 1)] == pytest.approx(0.5)
    assert scalars[("train/loss", 2)] == pytest.approx(0.25)
    assert scalars[("train/lr_g", 2)] == pytest.approx(1e-4)
    assert ("viz/frame", 3) in images and ("viz/clip", 4) in images
    assert ("viz/fig", 5) in images
    w_, h_, png = images[("viz/frame", 3)]
    assert (h_, w_) == (8, 12)
    assert png.startswith(b"\x89PNG")

    # and the PNG decodes to the pixels we wrote (red channel full on)
    try:
        import cv2
    except ImportError:
        return
    arr = cv2.imdecode(np.frombuffer(png, np.uint8), cv2.IMREAD_COLOR)  # BGR
    assert arr.shape == (8, 12, 3)
    assert (arr[..., 2] == 255).all() and (arr[..., 0] == 0).all()


def test_trainer_falls_back_to_native_writer(tmp_path, monkeypatch):
    """With torch's SummaryWriter unavailable, the trainer must still produce
    a readable event file instead of disabling TB."""
    import builtins

    real_import = builtins.__import__

    def blocked(name, *a, **k):
        if name.startswith("torch.utils.tensorboard"):
            raise ImportError("blocked for test")
        return real_import(name, *a, **k)

    monkeypatch.setattr(builtins, "__import__", blocked)
    from speechdrivestemplates_tpu.pipelines.trainer import _make_tb_writer

    w = _make_tb_writer(str(tmp_path))
    assert isinstance(w, NativeTBWriter)
    w.add_scalar("t", 1.0, global_step=0)
    w.close()
    (path,) = glob.glob(os.path.join(str(tmp_path), "events.out.tfevents.*"))
    assert read_events(path) == [{"step": 0, "tag": "t", "value": 1.0}]
