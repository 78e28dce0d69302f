"""Pure-Python image codecs + PSNR for the multimodal payload path.

The container has no image libraries (no Pillow/opencv), so per the build
contract the *codec* layer is deterministic and self-contained while the
Spark-side plumbing (binary columns, Arrow batching, UDF signatures) is real:

- ``png``  : real, spec-compliant PNG (8-bit RGB, zlib) — lossless.
- ``bmp``  : real, uncompressed 24-bit BMP (bottom-up rows) — lossless.
- ``jpeg`` : STAND-IN lossy codec. Real JPEG entropy coding needs an image
  library; instead we use a deterministic quantizing codec (6 bits/channel,
  magic header ``b"JQNT"``) whose reconstruction error is bounded so the
  PSNR >= 40 dB fidelity gate (BASELINE.json:2) is meaningfully exercised.
  Swap ``encode_jpeg_stub``/``decode_jpeg_stub`` for a real libjpeg binding
  in production; every caller goes through ``encode_image``/``decode_image``.

All functions operate on ``numpy.uint8`` arrays of shape (h, w, 3).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

JPEG_STUB_MAGIC = b"JQNT"
_PNG_SIG = b"\x89PNG\r\n\x1a\n"


# ---------------------------------------------------------------- PNG (real)
def _png_chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def encode_png(img: np.ndarray) -> bytes:
    h, w, _ = img.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)  # 8-bit, colortype 2 (RGB)
    # filter byte 0 (None) per scanline
    raw = np.concatenate(
        [np.zeros((h, 1), dtype=np.uint8), img.reshape(h, w * 3)], axis=1
    ).tobytes()
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw, 6))
        + _png_chunk(b"IEND", b"")
    )


def decode_png(data: bytes) -> np.ndarray:
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos, w = 8, 0
    h = 0
    idat = b""
    while pos < len(data):
        (ln,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + ln]
        if tag == b"IHDR":
            w, h, bitdepth, colortype = struct.unpack(">IIBB", payload[:10])
            if bitdepth != 8 or colortype != 2:
                raise ValueError("only 8-bit RGB PNG supported")
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
        pos += 12 + ln
    raw = np.frombuffer(zlib.decompress(idat), dtype=np.uint8).reshape(h, w * 3 + 1)
    filters = raw[:, 0]
    out = raw[:, 1:].astype(np.int32).reshape(h, w, 3)
    # support filter types 0 (None) and 1 (Sub) — our encoder emits 0 only
    for y in range(h):
        if filters[y] == 1:
            for x in range(1, w):
                out[y, x] = (out[y, x] + out[y, x - 1]) % 256
        elif filters[y] != 0:
            raise ValueError(f"unsupported PNG filter {filters[y]}")
    return out.astype(np.uint8)


# ---------------------------------------------------------------- BMP (real)
def encode_bmp(img: np.ndarray) -> bytes:
    h, w, _ = img.shape
    row_size = (w * 3 + 3) & ~3
    img_size = row_size * h
    header = struct.pack("<2sIHHI", b"BM", 54 + img_size, 0, 0, 54)
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size, 2835, 2835, 0, 0)
    rows = np.zeros((h, row_size), dtype=np.uint8)
    rows[:, : w * 3] = img[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up, BGR
    return header + dib + rows.tobytes()


def decode_bmp(data: bytes) -> np.ndarray:
    if data[:2] != b"BM":
        raise ValueError("not a BMP")
    (offset,) = struct.unpack("<I", data[10:14])
    w, h = struct.unpack("<ii", data[18:26])
    row_size = (w * 3 + 3) & ~3
    rows = np.frombuffer(data[offset : offset + row_size * h], dtype=np.uint8)
    rows = rows.reshape(h, row_size)[:, : w * 3].reshape(h, w, 3)
    return rows[::-1, :, ::-1].copy()  # back to top-down RGB


# --------------------------------------------- lossy stand-in ("jpeg" slot)
def encode_jpeg_stub(img: np.ndarray) -> bytes:
    """Deterministic lossy codec: quantize to 6 bits/channel + zlib.

    Max per-sample error is 2 (values snap to multiples of 4 with rounding),
    giving PSNR ≈ 46-48 dB on natural-ish content — above the 40 dB gate but
    measurably lossy, so the fidelity check cannot pass vacuously.
    """
    h, w, _ = img.shape
    q = ((img.astype(np.uint16) + 2) >> 2).clip(0, 63).astype(np.uint8)
    return JPEG_STUB_MAGIC + struct.pack(">HH", w, h) + zlib.compress(q.tobytes(), 6)


def decode_jpeg_stub(data: bytes) -> np.ndarray:
    if data[:4] != JPEG_STUB_MAGIC:
        raise ValueError("not a JQNT stream")
    w, h = struct.unpack(">HH", data[4:8])
    q = np.frombuffer(zlib.decompress(data[8:]), dtype=np.uint8).reshape(h, w, 3)
    return (q.astype(np.uint16) << 2).clip(0, 255).astype(np.uint8)


# ------------------------------------------------------------------ facade
_ENCODERS = {"png": encode_png, "bmp": encode_bmp, "jpeg": encode_jpeg_stub}
_DECODERS = {"png": decode_png, "bmp": decode_bmp, "jpeg": decode_jpeg_stub}
LOSSLESS_FMTS = frozenset({"png", "bmp"})


def encode_image(img: np.ndarray, fmt: str) -> bytes:
    return _ENCODERS[fmt](img)


def decode_image(data: bytes, fmt: str) -> np.ndarray:
    return _DECODERS[fmt](data)


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB; inf for identical images."""
    mse = float(np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2))
    if mse == 0.0:
        return float("inf")
    return 10.0 * np.log10(255.0**2 / mse)


# ------------------------------------------- frame container ("video" stub)
# A seekable multi-frame container standing in for a video file: real
# video decode needs ffmpeg (absent here); the container mechanics that
# matter to the Spark plumbing — an index you can seek by so sampling
# frame k does NOT decode frames 0..k-1 — are real.
CONTAINER_MAGIC = b"FCNT"


def encode_container(frames: list[np.ndarray], fmt: str = "png") -> bytes:
    """Pack frames into [magic][n][fmt4][offsets (n+1)*u32][payloads…]."""
    blobs = [encode_image(f, fmt) for f in frames]
    offs = np.zeros(len(blobs) + 1, dtype=">u4")
    np.cumsum([len(b) for b in blobs], out=offs[1:])
    head = CONTAINER_MAGIC + struct.pack(">I", len(blobs)) + fmt.ljust(4).encode()
    return head + offs.tobytes() + b"".join(blobs)


def container_frame_count(data: bytes) -> int:
    if data[:4] != CONTAINER_MAGIC:
        raise ValueError("not an FCNT container")
    return struct.unpack(">I", data[4:8])[0]


def decode_container_frame(data: bytes, idx: int) -> np.ndarray:
    """Seek + decode ONE frame; O(frame), not O(container)."""
    n = container_frame_count(data)
    if not 0 <= idx < n:
        raise IndexError(f"frame {idx} of {n}")
    fmt = data[8:12].decode().strip()
    table = data[12 : 12 + 4 * (n + 1)]
    offs = np.frombuffer(table, dtype=">u4")
    base = 12 + 4 * (n + 1)
    return decode_image(data[base + int(offs[idx]) : base + int(offs[idx + 1])], fmt)
