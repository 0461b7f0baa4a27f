"""Dependency-free TensorBoard event writer (pure Python, stdlib only).

The trainer prefers ``torch.utils.tensorboard`` when present, but a lean TPU
serving/training image has no reason to carry torch + tensorboard just for
scalar logging — and silently LOSING all TB observability on such an image is
worse (the reference always has torch, so it never faces this;
``core/pipelines/trainer.py:370-374``).  This module writes TensorBoard's
on-disk format directly:

  - TFRecord framing: ``uint64 length | masked crc32c(length) | payload |
    masked crc32c(payload)`` with the Castagnoli CRC and TF's rotate+add mask;
  - hand-encoded ``Event``/``Summary`` protobufs (scalars, PNG image
    summaries; figures render via matplotlib; videos as ANIMATED GIF image
    summaries via an in-module GIF89a/LZW encoder — the same wire format the
    torch writer produces, validated against PIL's decoder);
  - a matching reader (used by the tests, cross-validated against the real
    ``tensorboard`` package's loader).

Everything TensorBoard needs, nothing else.
"""

from __future__ import annotations

import logging
import os
import socket
import struct
import time
import zlib
from typing import Iterator, Optional, Tuple

import numpy as np

# -- crc32c (Castagnoli, reflected 0x82F63B78) + TF masking ---------------------

_CRC_TABLE = []
for _i in range(256):
    _c = _i
    for _ in range(8):
        _c = (_c >> 1) ^ 0x82F63B78 if _c & 1 else _c >> 1
    _CRC_TABLE.append(_c)


try:  # C implementation when present (ships with tensorboard installs);
    # the pure-python table below is the zero-dependency fallback (~120 ms/MB
    # — fine for scalars, noticeable on large image summaries)
    import google_crc32c as _gcrc

    def _crc32c(data: bytes) -> int:
        return _gcrc.value(bytes(data))
except ImportError:  # pragma: no cover - exercised on lean images
    def _crc32c(data: bytes) -> int:
        crc = 0xFFFFFFFF
        for b in data:
            crc = _CRC_TABLE[(crc ^ b) & 0xFF] ^ (crc >> 8)
        return crc ^ 0xFFFFFFFF


def _masked_crc(data: bytes) -> int:
    crc = _crc32c(data)
    return (((crc >> 15) | (crc << 17)) + 0xA282EAD8) & 0xFFFFFFFF


# -- minimal protobuf encoding ---------------------------------------------------

def _varint(n: int) -> bytes:
    out = b""
    n &= 0xFFFFFFFFFFFFFFFF  # int64 two's complement
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out += bytes([b | 0x80])
        else:
            return out + bytes([b])


def _key(field: int, wire: int) -> bytes:
    return _varint((field << 3) | wire)


def _f_varint(field: int, n: int) -> bytes:
    return _key(field, 0) + _varint(n)


def _f_double(field: int, v: float) -> bytes:
    return _key(field, 1) + struct.pack("<d", v)


def _f_float(field: int, v: float) -> bytes:
    return _key(field, 5) + struct.pack("<f", v)


def _f_bytes(field: int, data: bytes) -> bytes:
    return _key(field, 2) + _varint(len(data)) + data


def _png_encode(rgb: np.ndarray) -> bytes:
    """(H, W, 3) uint8 -> PNG bytes (8-bit RGB, no filtering). stdlib only."""
    rgb = np.ascontiguousarray(rgb, dtype=np.uint8)
    h, w, _ = rgb.shape
    raw = b"".join(b"\x00" + rgb[i].tobytes() for i in range(h))

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + typ + data
                + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw, 6)) + chunk(b"IEND", b""))


def _quantize_676(frames: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """(..., 3) uint8 -> (palette-index array, (256,3) palette).

    Fixed 6x7x6 RGB color cube (252 entries): deterministic, no per-video
    palette fitting, plenty for skeleton renders (white canvas + a few dozen
    edge colors)."""
    levels_r = np.round(np.linspace(0, 255, 6)).astype(np.uint8)
    levels_g = np.round(np.linspace(0, 255, 7)).astype(np.uint8)
    levels_b = np.round(np.linspace(0, 255, 6)).astype(np.uint8)
    palette = np.zeros((256, 3), np.uint8)
    palette[:252] = np.stack(
        np.meshgrid(levels_r, levels_g, levels_b, indexing="ij"),
        axis=-1).reshape(-1, 3)
    qr = np.round(frames[..., 0].astype(np.float32) * (5 / 255)).astype(np.int32)
    qg = np.round(frames[..., 1].astype(np.float32) * (6 / 255)).astype(np.int32)
    qb = np.round(frames[..., 2].astype(np.float32) * (5 / 255)).astype(np.int32)
    return (qr * 42 + qg * 6 + qb).astype(np.uint8), palette


def _gif_lzw(indices: np.ndarray, min_code_size: int = 8) -> bytes:
    """GIF-flavor LZW over a uint8 index array (row-major), sub-blocked."""
    clear = 1 << min_code_size
    end = clear + 1
    data = indices.tobytes()

    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table = {bytes([i]): i for i in range(clear)}
    next_code = end + 1
    width = min_code_size + 1
    emit(clear, width)
    s = b""
    for ch in data:
        sc = s + bytes([ch])
        if sc in table:
            s = sc
            continue
        emit(table[s], width)
        table[sc] = next_code
        next_code += 1
        if next_code > (1 << width) and width < 12:
            width += 1
        elif next_code >= 4096:
            emit(clear, width)
            table = {bytes([i]): i for i in range(clear)}
            next_code = end + 1
            width = min_code_size + 1
        s = bytes([ch])
    if s:
        emit(table[s], width)
    emit(end, width)
    if nbits:
        out.append(acc & 0xFF)

    blocks = bytearray([min_code_size])
    for i in range(0, len(out), 255):
        chunk = out[i: i + 255]
        blocks.append(len(chunk))
        blocks += chunk
    blocks.append(0)
    return bytes(blocks)


def gif_encode(frames: np.ndarray, fps: int = 4) -> bytes:
    """(T, H, W, 3) uint8 -> animated GIF89a bytes (looping).

    Pure stdlib: fixed-cube quantization + GIF LZW.  This is what keeps
    add_video a real animation on torch-free images (the torch writer encodes
    GIF via moviepy; the reference's add_video is
    ``core/utils/video_processing.py:72-98``)."""
    frames = np.ascontiguousarray(frames, dtype=np.uint8)
    t, h, w, _ = frames.shape
    indexed, palette = _quantize_676(frames)
    delay_cs = max(2, round(100 / max(1, fps)))  # GIF delay in 10ms units

    out = bytearray(b"GIF89a")
    # logical screen descriptor: global color table, 8-bit, 256 entries
    out += struct.pack("<HHBBB", w, h, 0xF7, 0, 0)
    out += palette.tobytes()
    # NETSCAPE2.0 loop-forever extension
    out += b"\x21\xFF\x0BNETSCAPE2.0\x03\x01\x00\x00\x00"
    for i in range(t):
        # graphic control: delay, no transparency, no disposal
        out += b"\x21\xF9\x04" + struct.pack("<BHB", 0, delay_cs, 0) + b"\x00"
        # image descriptor: full frame, no local color table
        out += b"\x2C" + struct.pack("<HHHHB", 0, 0, w, h, 0)
        out += _gif_lzw(indexed[i])
    out += b"\x3B"
    return bytes(out)


def gif_decode(data: bytes) -> np.ndarray:
    """Minimal GIF89a reader for round-trip tests: returns (T, H, W, 3) uint8.
    Assumes the layout gif_encode emits (global palette, full-size frames)."""
    assert data[:6] in (b"GIF89a", b"GIF87a"), "not a GIF"
    w, h, packed, _, _ = struct.unpack("<HHBBB", data[6:13])
    assert packed & 0x80, "no global color table"
    gct_size = 2 << (packed & 0x07)
    pos = 13
    palette = np.frombuffer(data[pos: pos + gct_size * 3],
                            np.uint8).reshape(-1, 3)
    pos += gct_size * 3

    frames = []
    while pos < len(data):
        b0 = data[pos]
        if b0 == 0x3B:  # trailer
            break
        if b0 == 0x21:  # extension: skip sub-blocks
            pos += 2
            while data[pos]:
                pos += 1 + data[pos]
            pos += 1
            continue
        assert b0 == 0x2C, f"unexpected block 0x{b0:02x}"
        fx, fy, fw, fh, fpacked = struct.unpack("<HHHHB", data[pos + 1: pos + 10])
        assert not fpacked & 0x80, "local color tables not supported"
        pos += 10
        min_code_size = data[pos]
        pos += 1
        lzw = bytearray()
        while data[pos]:
            n = data[pos]
            lzw += data[pos + 1: pos + 1 + n]
            pos += 1 + n
        pos += 1

        # LZW decode
        clear = 1 << min_code_size
        end = clear + 1
        width = min_code_size + 1
        dictionary = [bytes([i]) for i in range(clear)] + [b"", b""]
        acc = nbits = 0
        out = bytearray()
        prev: Optional[bytes] = None
        for byte in lzw:
            acc |= byte << nbits
            nbits += 8
            while nbits >= width:
                code = acc & ((1 << width) - 1)
                acc >>= width
                nbits -= width
                if code == clear:
                    dictionary = ([bytes([i]) for i in range(clear)]
                                  + [b"", b""])
                    width = min_code_size + 1
                    prev = None
                    continue
                if code == end:
                    nbits = 0
                    acc = 0
                    break
                if code < len(dictionary):
                    entry = dictionary[code]
                    if prev is not None:
                        dictionary.append(prev + entry[:1])
                else:
                    entry = prev + prev[:1]
                    dictionary.append(entry)
                out += entry
                prev = entry
                # encoder emits with width+1 from the emission after it
                # assigned entry 2^width; this table (with its two dummy
                # clear/end slots) reaches len 2^width exactly then
                if len(dictionary) >= (1 << width) and width < 12:
                    width += 1
        arr = np.frombuffer(bytes(out[: fw * fh]), np.uint8).reshape(fh, fw)
        frames.append(palette[arr])
    return np.stack(frames)


def _event(step: Optional[int] = None, summary: Optional[bytes] = None,
           file_version: Optional[str] = None,
           wall_time: Optional[float] = None) -> bytes:
    out = _f_double(1, time.time() if wall_time is None else wall_time)
    if step is not None:
        out += _f_varint(2, int(step))
    if file_version is not None:
        out += _f_bytes(3, file_version.encode())
    if summary is not None:
        out += _f_bytes(5, summary)
    return out


def _scalar_summary(tag: str, value: float) -> bytes:
    val = _f_bytes(1, tag.encode()) + _f_float(2, float(value))
    return _f_bytes(1, val)  # Summary.value (repeated field 1)


def _image_summary(tag: str, rgb: np.ndarray) -> bytes:
    h, w, _ = rgb.shape
    img = (_f_varint(1, h) + _f_varint(2, w) + _f_varint(3, 3)
           + _f_bytes(4, _png_encode(rgb)))
    val = _f_bytes(1, tag.encode()) + _f_bytes(4, img)
    return _f_bytes(1, val)


class NativeTBWriter:
    """Drop-in for the subset of ``SummaryWriter`` this framework uses:
    ``add_scalar``, ``add_figure``, ``add_image``, ``add_video``, ``flush``,
    ``close``."""

    def __init__(self, log_dir: str):
        os.makedirs(log_dir, exist_ok=True)
        fname = (f"events.out.tfevents.{int(time.time())}."
                 f"{socket.gethostname()}.{os.getpid()}.0")
        self._path = os.path.join(log_dir, fname)
        self._f = open(self._path, "ab")
        self._write(_event(file_version="brain.Event:2"))
        self.flush()

    # -- framing ---------------------------------------------------------------

    def _write(self, payload: bytes) -> None:
        header = struct.pack("<Q", len(payload))
        self._f.write(header + struct.pack("<I", _masked_crc(header))
                      + payload + struct.pack("<I", _masked_crc(payload)))

    # -- public API ------------------------------------------------------------

    def add_scalar(self, tag: str, value, global_step: Optional[int] = None):
        self._write(_event(step=global_step,
                           summary=_scalar_summary(tag, float(value))))

    def add_image(self, tag: str, img, global_step: Optional[int] = None,
                  dataformats: str = "CHW"):
        img = np.asarray(img)
        if dataformats == "CHW" or (img.ndim == 3 and img.shape[0] in (1, 3)
                                    and dataformats != "HWC"):
            img = np.transpose(img, (1, 2, 0))
        if img.shape[-1] == 1:
            img = np.repeat(img, 3, axis=-1)
        if img.dtype != np.uint8:
            img = (np.clip(img, 0.0, 1.0) * 255).astype(np.uint8)
        self._write(_event(step=global_step, summary=_image_summary(tag, img)))

    def add_figure(self, tag: str, figure, global_step: Optional[int] = None):
        try:
            figure.canvas.draw()
            buf = np.asarray(figure.canvas.buffer_rgba())[..., :3]
        except Exception as e:  # pragma: no cover - matplotlib-version quirks
            logging.warning("NativeTBWriter: cannot rasterize figure (%s)", e)
            return
        self._write(_event(step=global_step, summary=_image_summary(tag, buf)))
        try:
            import matplotlib.pyplot as plt

            plt.close(figure)  # SummaryWriter.add_figure closes by default too
        except Exception:
            pass

    def add_video(self, tag: str, vid_tensor, global_step: Optional[int] = None,
                  fps: int = 4):
        """(B, T, C, H, W) float in [0,1] -> an ANIMATED GIF image summary —
        the same wire format the torch writer emits for videos (TensorBoard's
        image plugin plays GIFs), so torch-free images keep real video
        summaries (reference add_video: video_processing.py:72-98)."""
        v = np.asarray(vid_tensor)
        if v.ndim != 5:
            logging.warning("NativeTBWriter.add_video: expected 5-D, got %s",
                            v.shape)
            return
        frames = np.transpose(v[0], (0, 2, 3, 1))  # (T, H, W, C)
        if frames.shape[-1] == 1:
            frames = np.repeat(frames, 3, axis=-1)
        if frames.dtype != np.uint8:
            frames = (np.clip(frames, 0.0, 1.0) * 255).astype(np.uint8)
        h, w = frames.shape[1:3]
        img = (_f_varint(1, h) + _f_varint(2, w) + _f_varint(3, 3)
               + _f_bytes(4, gif_encode(frames, fps=fps)))
        val = _f_bytes(1, tag.encode()) + _f_bytes(4, img)
        self._write(_event(step=global_step, summary=_f_bytes(1, val)))

    def flush(self):
        self._f.flush()

    def close(self):
        self._f.close()


# -- reader (tests / debugging) --------------------------------------------------

def _read_varint(data: bytes, pos: int) -> Tuple[int, int]:
    out = shift = 0
    while True:
        b = data[pos]
        pos += 1
        out |= (b & 0x7F) << shift
        if not b & 0x80:
            return out, pos
        shift += 7


def _parse_fields(data: bytes) -> Iterator[Tuple[int, int, bytes]]:
    pos = 0
    while pos < len(data):
        k, pos = _read_varint(data, pos)
        field, wire = k >> 3, k & 7
        if wire == 0:
            v, pos = _read_varint(data, pos)
            yield field, wire, v
        elif wire == 1:
            yield field, wire, data[pos: pos + 8]
            pos += 8
        elif wire == 2:
            n, pos = _read_varint(data, pos)
            yield field, wire, data[pos: pos + n]
            pos += n
        elif wire == 5:
            yield field, wire, data[pos: pos + 4]
            pos += 4
        else:  # pragma: no cover
            raise ValueError(f"unsupported wire type {wire}")


def read_events(path: str) -> list:
    """Parse an event file back into dicts (CRC-checked):
    ``{step, tag, value}`` for scalars, ``{step, tag, png}`` for images."""
    out = []
    with open(path, "rb") as f:
        data = f.read()
    pos = 0
    while pos < len(data):
        header = data[pos: pos + 8]
        (length,) = struct.unpack("<Q", header)
        (hcrc,) = struct.unpack("<I", data[pos + 8: pos + 12])
        assert hcrc == _masked_crc(header), "corrupt record header"
        payload = data[pos + 12: pos + 12 + length]
        (pcrc,) = struct.unpack("<I", data[pos + 12 + length: pos + 16 + length])
        assert pcrc == _masked_crc(payload), "corrupt record payload"
        pos += 16 + length

        step, summary = 0, None
        for field, wire, v in _parse_fields(payload):
            if field == 2 and wire == 0:
                step = v
            elif field == 5 and wire == 2:
                summary = v
        if summary is None:
            continue
        for field, wire, val in _parse_fields(summary):
            if field != 1 or wire != 2:
                continue
            tag, scalar, png = None, None, None
            for f2, w2, v2 in _parse_fields(val):
                if f2 == 1 and w2 == 2:
                    tag = v2.decode()
                elif f2 == 2 and w2 == 5:
                    (scalar,) = struct.unpack("<f", v2)
                elif f2 == 4 and w2 == 2:
                    for f3, w3, v3 in _parse_fields(v2):
                        if f3 == 4 and w3 == 2:
                            png = v3
            if scalar is not None:
                out.append({"step": step, "tag": tag, "value": scalar})
            elif png is not None:
                out.append({"step": step, "tag": tag, "png": png})
    return out
