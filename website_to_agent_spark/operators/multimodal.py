"""Multimodal columns: image/audio/video as opaque ``binary`` + typed
metadata (task brief).

The Spark-side plumbing is real and tested — schemas, Arrow batch
shapes, ``mapInPandas`` signatures, partition-size control for large
blobs. Codec status:

- IMAGE: **real** for JPEG — baseline sequential (SOF0/1: marker
  walk, canonical Huffman entropy decode, dequantize, vectorized
  numpy IDCT, restart markers, any chroma subsampling — the luma
  plane IS the grayscale image since JPEG's Y uses the same BT.601
  weights as ``_LUMA``) AND progressive (SOF2, T.81 Annex G:
  spectral-selection bands, successive approximation with the
  G.1.2.3 AC-refinement correction-bit algorithm, EOBRUN, per-scan
  DHT redefinition, restarts; chroma AC scans skipped by type) —
  PNG (8-bit, plain or Adam7-interlaced: stdlib ``zlib`` + the 5
  scanline filters in numpy), GIF (87a/89a first frame: pure-python
  LZW, palette, interlace, canvas compositing), PPM (P6),
  uncompressed 24-bit BMP, and baseline TIFF (8-bit gray/RGB
  strips, either byte order, uncompressed/PackBits/LZW+predictor) — decode to grayscale, real dimensions,
  real 8×8 average-hash (aHash) and block-mean embedding, so ANY two
  encodings of the same pixels get the SAME phash (tested
  JPEG==PNG==GIF==PPM==BMP), WebP-LOSSLESS (VP8L: full prefix-
  code machinery, LZ77 + 2D distance map, color cache, meta-prefix
  groups, predictor/color/subtract-green transforms — operators/
  vp8l.py; palette streams included), and WebP-LOSSY (VP8 intra
  keyframe: boolean arithmetic decoder, full intra prediction,
  token/dequant/iDCT/iWHT machinery — operators/vp8.py, r4; loop
  filter documented-skipped). Only arithmetic-coded JPEG and
  AVIF/HEIC remain out of scope → documented deterministic fake,
  or ``NotImplementedError`` in strict mode.
- AUDIO: **real** for WAV (stdlib ``wave`` + numpy): per-window RMS
  over the actual samples, plus a Philips/Haitsma-Kalker-style robust
  fingerprint (log-band spectral double-delta bits — gain-invariant,
  so an amplitude-scaled copy matches frame-for-frame) feeding
  ``near_dup_audio``. Compressed formats (mp3/ogg) need ffmpeg →
  fake/strict as above.
- VIDEO: **real** for Y4M (YUV4MPEG2 — the uncompressed raw-frame
  format; the Y plane is the luma frame, so per-frame aHash matches
  the still-image hash of the same pixels, tested cross-modally) and
  ANIMATED GIF (full animation semantics: GCE transparency, disposal
  0-3 incl. restore-background and restore-previous, local palettes,
  RGB compositing — the web's most common short-video format).
  Compressed containers (mp4/webm) need ffmpeg/pyav → documented
  fake/strict stub; frame SAMPLING is real dataflow either way.

Scale notes: media blobs are orders of magnitude larger than text —
``media_repartition`` targets a bytes-per-partition budget so a task's
Arrow batch never exceeds executor memory; decode kernels stream via
``mapInPandas`` (iterator of batches) rather than materializing a
partition at once.
"""

from __future__ import annotations

import hashlib
import io
import os
import zlib
from typing import Iterator, Optional, Tuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

MEDIA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("mime", T.StringType(), True),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

IMAGE_FEATURES = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("phash", T.LongType(), True),
        T.StructField("embedding", T.ArrayType(T.FloatType()), True),
    ]
)

AUDIO_FRAMES = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("start_ms", T.LongType(), True),
        T.StructField("rms", T.FloatType(), True),
    ]
)

def _decode_ppm(payload: bytes) -> Optional[np.ndarray]:
    """P6 PPM (raw RGB) → float grayscale array, or None if not PPM."""
    if not payload.startswith(b"P6"):
        return None
    # header = magic, width, height, maxval as whitespace-separated
    # tokens, # comments allowed
    tokens: list[bytes] = []
    pos = 2
    while len(tokens) < 3 and pos < len(payload):
        ch = payload[pos:pos + 1]
        if ch == b"#":
            pos = payload.index(b"\n", pos) + 1
        elif ch.isspace():
            pos += 1
        else:
            end = pos
            while end < len(payload) and not payload[end:end + 1].isspace():
                end += 1
            tokens.append(payload[pos:end])
            pos = end
    if len(tokens) < 3:
        return None
    w, h, maxval = (int(t) for t in tokens)
    pos += 1  # single whitespace after maxval
    px = np.frombuffer(payload, dtype=np.uint8, count=w * h * 3, offset=pos)
    rgb = px.reshape(h, w, 3).astype(np.float64) * (255.0 / maxval)
    return rgb @ np.array([0.299, 0.587, 0.114])


def _decode_bmp(payload: bytes) -> Optional[np.ndarray]:
    """Uncompressed 24-bit BMP → float grayscale array, or None."""
    if not payload.startswith(b"BM") or len(payload) < 54:
        return None
    off = int.from_bytes(payload[10:14], "little")
    w = int.from_bytes(payload[18:22], "little", signed=True)
    h = int.from_bytes(payload[22:26], "little", signed=True)
    bpp = int.from_bytes(payload[28:30], "little")
    comp = int.from_bytes(payload[30:34], "little")
    if bpp != 24 or comp != 0 or w <= 0 or h == 0:
        return None
    flip = h > 0          # positive height ⇒ bottom-up row order
    h = abs(h)
    stride = (w * 3 + 3) & ~3
    rows = np.frombuffer(
        payload, dtype=np.uint8, count=stride * h, offset=off
    ).reshape(h, stride)[:, : w * 3].reshape(h, w, 3).astype(np.float64)
    if flip:
        rows = rows[::-1]
    # BMP stores BGR
    return rows @ np.array([0.114, 0.587, 0.299])


_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_LUMA = np.array([0.299, 0.587, 0.114])


def _gif_lzw_decode(data: bytes, min_code_size: int,
                    max_pixels: int) -> Optional[list]:
    """GIF-flavor LZW (GIF89a spec appendix F): variable code width
    from ``min_code_size+1`` up to 12 bits, CLEAR resets the table,
    EOI ends the stream. Returns the pixel-index list or None."""
    clear = 1 << min_code_size
    eoi = clear + 1
    width = min_code_size + 1
    table: list = [bytes([i]) for i in range(clear)] + [b"", b""]
    out = bytearray()
    prev: Optional[bytes] = None
    acc = bits = 0
    for byte in data:
        acc |= byte << bits
        bits += 8
        while bits >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            bits -= width
            if code == clear:
                table = [bytes([i]) for i in range(clear)] + [b"", b""]
                width = min_code_size + 1
                prev = None
                continue
            if code == eoi:
                return list(out)
            if code < len(table):
                entry = table[code]
            elif code == len(table) and prev is not None:
                entry = prev + prev[:1]          # the KwKwK case
            else:
                return None                       # corrupt stream
            out += entry
            if len(out) > max_pixels:
                return list(out[:max_pixels])
            if prev is not None and len(table) < 4096:
                table.append(prev + entry[:1])
                if len(table) == (1 << width) and width < 12:
                    width += 1
            prev = entry
    return list(out)


def _decode_gif(payload: bytes) -> Optional[np.ndarray]:
    """stdlib GIF (87a/89a) first frame → float grayscale array, or
    None. Pure-python LZW + palette lookup; the frame is composited
    onto the logical-screen canvas (background color) at its
    (left, top) offset; interlaced frames are de-interlaced."""
    if payload[:6] not in (b"GIF87a", b"GIF89a") or len(payload) < 13:
        return None
    sw = int.from_bytes(payload[6:8], "little")
    sh = int.from_bytes(payload[8:10], "little")
    flags = payload[10]
    bg_idx = payload[11]
    pos = 13
    gct: Optional[np.ndarray] = None
    if flags & 0x80:
        n = 2 << (flags & 7)
        gct = np.frombuffer(payload[pos:pos + 3 * n],
                            dtype=np.uint8).reshape(-1, 3)
        pos += 3 * n
    if sw == 0 or sh == 0:
        return None
    while pos < len(payload):
        b = payload[pos]
        if b == 0x21:                 # extension: label + sub-blocks
            pos += 2
            while pos < len(payload) and payload[pos] != 0:
                pos += 1 + payload[pos]
            pos += 1
        elif b == 0x2C:               # image descriptor — first frame
            left = int.from_bytes(payload[pos + 1:pos + 3], "little")
            top = int.from_bytes(payload[pos + 3:pos + 5], "little")
            fw = int.from_bytes(payload[pos + 5:pos + 7], "little")
            fh = int.from_bytes(payload[pos + 7:pos + 9], "little")
            f = payload[pos + 9]
            pos += 10
            pal = gct
            if f & 0x80:              # local color table
                n = 2 << (f & 7)
                pal = np.frombuffer(payload[pos:pos + 3 * n],
                                    dtype=np.uint8).reshape(-1, 3)
                pos += 3 * n
            if pal is None or fw == 0 or fh == 0:
                return None
            min_code = payload[pos]
            pos += 1
            lzw = bytearray()
            while pos < len(payload) and payload[pos] != 0:
                ln = payload[pos]
                lzw += payload[pos + 1:pos + 1 + ln]
                pos += 1 + ln
            idx = _gif_lzw_decode(bytes(lzw), min_code, fw * fh)
            if idx is None or len(idx) < fw * fh:
                return None
            frame = np.array(idx[: fw * fh], dtype=np.int64).reshape(fh, fw)
            if f & 0x40:              # de-interlace (4 passes)
                order = ([*range(0, fh, 8)] + [*range(4, fh, 8)]
                         + [*range(2, fh, 4)] + [*range(1, fh, 2)])
                de = np.empty_like(frame)
                de[order] = frame
                frame = de
            frame = np.clip(frame, 0, len(pal) - 1)
            canvas = np.full(
                (sh, sw), int(bg_idx) if gct is not None
                and bg_idx < len(gct) else 0, dtype=np.int64,
            )
            canvas[top:top + fh, left:left + fw] = frame[
                : max(0, sh - top), : max(0, sw - left)
            ]
            return pal[np.clip(canvas, 0, len(pal) - 1)].astype(
                np.float64) @ _LUMA
        else:                         # trailer (0x3B) or junk
            return None
    return None


def _decode_gif_frames(payload: bytes,
                       max_frames: int = 10000) -> Optional[list]:
    """Animated GIF (89a) → list of composited float grayscale frames,
    or None. Full animation semantics: per-frame Graphics Control
    Extension transparency (transparent pixels leave the canvas
    untouched), disposal methods 0/1 (leave), 2 (restore background
    over the frame rect), 3 (restore previous canvas); local color
    tables; interlaced frames. Compositing happens in RGB (palettes
    can differ per frame), output is the BT.601 gray of each
    composited canvas — an animated GIF IS a video source."""
    if payload[:6] not in (b"GIF87a", b"GIF89a") or len(payload) < 13:
        return None
    sw = int.from_bytes(payload[6:8], "little")
    sh = int.from_bytes(payload[8:10], "little")
    flags = payload[10]
    bg_idx = payload[11]
    pos = 13
    gct: Optional[np.ndarray] = None
    if flags & 0x80:
        n = 2 << (flags & 7)
        gct = np.frombuffer(payload[pos:pos + 3 * n],
                            dtype=np.uint8).reshape(-1, 3)
        pos += 3 * n
    if sw == 0 or sh == 0:
        return None
    bg_rgb = (
        gct[bg_idx].astype(np.float64)
        if gct is not None and bg_idx < len(gct)
        else np.zeros(3)
    )
    canvas = np.broadcast_to(bg_rgb, (sh, sw, 3)).copy()
    frames: list = []
    disposal, transp = 0, -1
    while pos < len(payload):
        b = payload[pos]
        if b == 0x21:                 # extension
            label = payload[pos + 1] if pos + 1 < len(payload) else 0
            pos += 2
            if label == 0xF9 and pos < len(payload) and payload[pos] >= 4:
                gflags = payload[pos + 1]
                disposal = (gflags >> 2) & 7
                transp = payload[pos + 4] if gflags & 1 else -1
            while pos < len(payload) and payload[pos] != 0:
                pos += 1 + payload[pos]
            pos += 1
        elif b == 0x2C:               # image descriptor
            left = int.from_bytes(payload[pos + 1:pos + 3], "little")
            top = int.from_bytes(payload[pos + 3:pos + 5], "little")
            fw = int.from_bytes(payload[pos + 5:pos + 7], "little")
            fh = int.from_bytes(payload[pos + 7:pos + 9], "little")
            f = payload[pos + 9]
            pos += 10
            pal = gct
            if f & 0x80:
                n = 2 << (f & 7)
                pal = np.frombuffer(payload[pos:pos + 3 * n],
                                    dtype=np.uint8).reshape(-1, 3)
                pos += 3 * n
            if pal is None or fw == 0 or fh == 0:
                break
            min_code = payload[pos]
            pos += 1
            lzw = bytearray()
            while pos < len(payload) and payload[pos] != 0:
                ln = payload[pos]
                lzw += payload[pos + 1:pos + 1 + ln]
                pos += 1 + ln
            pos += 1                  # sub-block terminator
            idx = _gif_lzw_decode(bytes(lzw), min_code, fw * fh)
            if idx is None or len(idx) < fw * fh:
                break                 # damaged frame → intact prefix
            frame = np.array(idx[:fw * fh], dtype=np.int64).reshape(fh, fw)
            if f & 0x40:
                order = ([*range(0, fh, 8)] + [*range(4, fh, 8)]
                         + [*range(2, fh, 4)] + [*range(1, fh, 2)])
                de = np.empty_like(frame)
                de[order] = frame
                frame = de
            ch = min(fh, max(0, sh - top))
            cw = min(fw, max(0, sw - left))
            if ch > 0 and cw > 0:
                prev = canvas.copy() if disposal == 3 else None
                sub = frame[:ch, :cw]
                rgb = pal[np.clip(sub, 0, len(pal) - 1)].astype(np.float64)
                dst = canvas[top:top + ch, left:left + cw]
                if transp >= 0:
                    mask = (sub != transp)[:, :, None]
                    dst[:] = np.where(mask, rgb, dst)
                else:
                    dst[:] = rgb
                frames.append(canvas @ _LUMA)
                if disposal == 2:
                    canvas[top:top + ch, left:left + cw] = bg_rgb
                elif disposal == 3 and prev is not None:
                    canvas = prev
            disposal, transp = 0, -1   # GCE applies to ONE image
            if len(frames) >= max_frames:
                break
        else:                         # trailer (0x3B) or junk
            break
    return frames if frames else None


def _png_unfilter(arr: np.ndarray, h: int, stride: int, bpp: int
                  ) -> Optional[np.ndarray]:
    """Invert the 5 PNG scanline filters (RFC 2083 §6): each row is
    reconstructed from its filter byte + the previous reconstructed
    row. Up/None vectorize; Sub/Average/Paeth are sequential within a
    row by definition (each byte depends on the reconstructed left
    neighbour)."""
    recon = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        f = int(arr[y, 0])
        line = arr[y, 1:].astype(np.int32)
        if f == 0:        # None
            rec = line
        elif f == 2:      # Up
            rec = (line + prev) & 0xFF
        elif f == 1:      # Sub
            rec = line
            for i in range(bpp, stride):
                rec[i] = (rec[i] + rec[i - bpp]) & 0xFF
        elif f == 3:      # Average
            rec = line
            for i in range(stride):
                left = rec[i - bpp] if i >= bpp else 0
                rec[i] = (rec[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif f == 4:      # Paeth
            rec = line
            for i in range(stride):
                a = int(rec[i - bpp]) if i >= bpp else 0
                b = int(prev[i])
                c = int(prev[i - bpp]) if i >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                rec[i] = (rec[i] + pred) & 0xFF
        else:
            return None   # invalid filter type
        recon[y] = rec
        prev = rec.astype(np.int32)
    return recon


def _decode_png(payload: bytes) -> Optional[np.ndarray]:
    """stdlib PNG (``zlib`` + the 5 scanline filters in numpy) → float
    grayscale array, or None if not PNG / unsupported layout.

    Supports the common web cases: 8- or 16-bit depth (16-bit reads
    the high byte — exact for the 8-bit-visual content 16-bit files
    carry), non-interlaced OR Adam7-interlaced, color types 0 (gray),
    2 (RGB), 3 (palette), 4 (gray+alpha), 6 (RGBA); alpha is ignored
    (features describe the color plane)."""
    if not payload.startswith(_PNG_SIG):
        return None
    pos, n = len(_PNG_SIG), len(payload)
    w = h = None
    bit_depth = color_type = interlace = None
    plte: Optional[np.ndarray] = None
    idat: list[bytes] = []
    while pos + 8 <= n:
        length = int.from_bytes(payload[pos:pos + 4], "big")
        ctype = payload[pos + 4:pos + 8]
        data = payload[pos + 8:pos + 8 + length]
        if len(data) < length:
            return None  # truncated chunk
        pos += 12 + length  # length + type + data + crc
        if ctype == b"IHDR":
            if length < 13:
                return None
            w = int.from_bytes(data[0:4], "big")
            h = int.from_bytes(data[4:8], "big")
            bit_depth, color_type = data[8], data[9]
            interlace = data[12]
        elif ctype == b"PLTE":
            plte = np.frombuffer(data[: (length // 3) * 3],
                                 dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"IEND":
            break
    if not (w and h) or bit_depth not in (8, 16) \
            or interlace not in (0, 1) or not idat:
        return None
    if bit_depth == 16 and color_type == 3:
        return None                  # palette is 8-bit by definition
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(color_type)
    if channels is None or (color_type == 3 and plte is None):
        return None
    bpp = channels * (bit_depth // 8)   # filter unit = bytes per pixel
    try:
        raw = zlib.decompress(b"".join(idat))
    except zlib.error:
        return None
    if interlace == 0:
        stride = w * bpp
        if len(raw) < h * (stride + 1):
            return None
        arr = np.frombuffer(raw, dtype=np.uint8,
                            count=h * (stride + 1)).reshape(h, stride + 1)
        recon = _png_unfilter(arr, h, stride, bpp)
        if recon is None:
            return None
        px = recon.reshape(h, w, channels, bit_depth // 8)[:, :, :, 0]
    else:
        # Adam7 (RFC 2083 §2.6): 7 sub-images, each filtered
        # independently, concatenated in the IDAT stream
        px = np.zeros((h, w, channels), dtype=np.uint8)
        off = 0
        for x0, y0, dx, dy in ((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8),
                               (2, 0, 4, 4), (0, 2, 2, 4), (1, 0, 2, 2),
                               (0, 1, 1, 2)):
            pw = -(-(w - x0) // dx) if w > x0 else 0
            ph = -(-(h - y0) // dy) if h > y0 else 0
            if pw <= 0 or ph <= 0:
                continue
            stride = pw * bpp
            need = ph * (stride + 1)
            if len(raw) < off + need:
                return None
            arr = np.frombuffer(raw, dtype=np.uint8, count=need,
                                offset=off).reshape(ph, stride + 1)
            off += need
            recon = _png_unfilter(arr, ph, stride, bpp)
            if recon is None:
                return None
            px[y0::dy, x0::dx] = recon.reshape(
                ph, pw, channels, bit_depth // 8)[:, :, :, 0]
    if color_type == 0:
        return px[:, :, 0].astype(np.float64)
    if color_type == 2:
        return px.astype(np.float64) @ _LUMA
    if color_type == 3:
        return plte[px[:, :, 0]].astype(np.float64) @ _LUMA
    if color_type == 4:
        return px[:, :, 0].astype(np.float64)
    # color_type == 6: RGBA
    return px[:, :, :3].astype(np.float64) @ _LUMA


def _zigzag() -> np.ndarray:
    """JPEG zigzag order: position i in the scan → flat 8×8 index."""
    out = []
    for s in range(15):
        rng = range(s, -1, -1) if s % 2 == 0 else range(s + 1)
        for i in rng:
            j = s - i
            if i < 8 and j < 8:
                out.append(i * 8 + j)
    return np.array(out)


_ZZ = _zigzag()
# Orthonormal 8-point DCT-II basis: spatial = _DCT_A @ coef @ _DCT_A.T
_DCT_A = np.array(
    [
        [
            (np.sqrt(1 / 8) if u == 0 else np.sqrt(2 / 8))
            * np.cos((2 * x + 1) * u * np.pi / 16)
            for u in range(8)
        ]
        for x in range(8)
    ]
)


class _JpegBits:
    """MSB-first bit reader over a destuffed entropy segment."""

    __slots__ = ("d", "pos")

    def __init__(self, data: bytes):
        self.d = data
        self.pos = 0

    def bit(self) -> int:
        v = (self.d[self.pos >> 3] >> (7 - (self.pos & 7))) & 1
        self.pos += 1
        return v

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v


def _jpeg_huff_table(bits_counts: bytes, vals: bytes) -> dict:
    """Canonical Huffman table (ITU T.81 C.2): {(length, code): symbol}."""
    table: dict = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits_counts[length - 1]):
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _jpeg_huff_decode(bits: _JpegBits, table: dict) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | bits.bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("bad huffman code")


def _jpeg_extend(v: int, s: int) -> int:
    """Sign-extend an s-bit magnitude (T.81 F.2.2.1 EXTEND)."""
    return v - (1 << s) + 1 if s and v < (1 << (s - 1)) else v


def _decode_jpeg(payload: bytes) -> Optional[np.ndarray]:
    """Baseline JPEG (SOF0/SOF1) → float grayscale array, or None.

    Pure stdlib/numpy — no libjpeg/PIL in this container. The marker
    walk, DQT (8/16-bit), DHT, DRI/RSTn restarts, and interleaved-MCU
    entropy decode follow ITU T.81; only the LUMA component is
    inverse-transformed (JPEG's Y is the same BT.601 luma the other
    decoders produce, so gray == Y regardless of chroma subsampling —
    chroma blocks are entropy-decoded to advance the bitstream and
    discarded). Entropy decode is per-bit Python (fine at Arrow batch
    sizes); the IDCT is one vectorized numpy matmul over all blocks.
    Progressive (SOF2) and arithmetic-coded variants return None →
    strict/fake handling upstream."""
    if not payload.startswith(b"\xff\xd8"):
        return None
    try:
        qt: dict[int, np.ndarray] = {}
        huff: dict[tuple, dict] = {}   # (class, id) → table
        restart = 0
        w = h = None
        comps: list[tuple] = []        # (comp_id, hi, vi, tq)
        pos = 2
        n = len(payload)
        scan = None
        while pos + 4 <= n:
            if payload[pos] != 0xFF:
                return None
            marker = payload[pos + 1]
            if marker == 0xD8 or 0xD0 <= marker <= 0xD7:
                pos += 2
                continue
            seglen = int.from_bytes(payload[pos + 2:pos + 4], "big")
            data = payload[pos + 4:pos + 2 + seglen]
            if marker == 0xDB:                 # DQT
                i = 0
                while i < len(data):
                    prec, tid = data[i] >> 4, data[i] & 15
                    i += 1
                    if prec:
                        vals = np.frombuffer(
                            data[i:i + 128], dtype=">u2").astype(np.int64)
                        i += 128
                    else:
                        vals = np.frombuffer(
                            data[i:i + 64], dtype=np.uint8).astype(np.int64)
                        i += 64
                    qt[tid] = vals
            elif marker in (0xC0, 0xC1):       # SOF0/SOF1 baseline
                h = int.from_bytes(data[1:3], "big")
                w = int.from_bytes(data[3:5], "big")
                nc = data[5]
                comps = [
                    (data[6 + 3 * c], data[7 + 3 * c] >> 4,
                     data[7 + 3 * c] & 15, data[8 + 3 * c])
                    for c in range(nc)
                ]
            elif marker == 0xC2:               # SOF2 progressive
                return _decode_jpeg_progressive(payload)
            elif marker in (0xC3, 0xC5, 0xC6, 0xC7,
                            0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
                return None                    # hierarchical/arithmetic
            elif marker == 0xC4:               # DHT
                i = 0
                while i + 17 <= len(data):
                    cls, tid = data[i] >> 4, data[i] & 15
                    counts = data[i + 1:i + 17]
                    nv = sum(counts)
                    huff[(cls, tid)] = _jpeg_huff_table(
                        counts, data[i + 17:i + 17 + nv])
                    i += 17 + nv
            elif marker == 0xDD:               # DRI
                restart = int.from_bytes(data[0:2], "big")
            elif marker == 0xDA:               # SOS
                ns = data[0]
                sel = {data[1 + 2 * c]: (data[2 + 2 * c] >> 4,
                                         data[2 + 2 * c] & 15)
                       for c in range(ns)}
                scan = (sel, pos + 2 + seglen)
                break
            pos += 2 + seglen
        if scan is None or not (w and h) or not comps:
            return None
        sel, dpos = scan
        # split the entropy stream at restart markers, destuffing FF00
        segs: list[bytes] = []
        cur = bytearray()
        i = dpos
        while i < n:
            b = payload[i]
            if b == 0xFF:
                m = payload[i + 1] if i + 1 < n else 0xD9
                if m == 0x00:
                    cur.append(0xFF)
                    i += 2
                    continue
                if 0xD0 <= m <= 0xD7:
                    segs.append(bytes(cur))
                    cur = bytearray()
                    i += 2
                    continue
                break                          # EOI or next marker
            cur.append(b)
            i += 1
        segs.append(bytes(cur))

        hmax = max(c[1] for c in comps)
        vmax = max(c[2] for c in comps)
        if (comps[0][1], comps[0][2]) != (hmax, vmax):
            return None                        # luma must be max-sampled
        mcux = -(-w // (8 * hmax))
        mcuy = -(-h // (8 * vmax))
        bw, bh = mcux * hmax, mcuy * vmax      # luma blocks across/down
        yblocks = np.zeros((bh * bw, 8, 8))
        yq = qt[comps[0][3]]
        preds = [0] * len(comps)
        bits = _JpegBits(segs[0])
        seg_i = 0
        for m in range(mcux * mcuy):
            if restart and m and m % restart == 0:
                seg_i += 1
                if seg_i >= len(segs):
                    break                      # truncated → intact prefix
                bits = _JpegBits(segs[seg_i])
                preds = [0] * len(comps)
            my, mx = divmod(m, mcux)
            for ci, (cid, hi, vi, _tq) in enumerate(comps):
                dc_tab = huff[(0, sel[cid][0])]
                ac_tab = huff[(1, sel[cid][1])]
                for by in range(vi):
                    for bx in range(hi):
                        s = _jpeg_huff_decode(bits, dc_tab)
                        preds[ci] += _jpeg_extend(bits.bits(s), s)
                        if ci == 0:
                            coef = np.zeros(64)
                            coef[0] = preds[ci] * yq[0]
                        k = 1
                        while k < 64:
                            rs = _jpeg_huff_decode(bits, ac_tab)
                            r, s = rs >> 4, rs & 15
                            if s == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break          # EOB
                            k += r
                            if k > 63:
                                raise ValueError("AC overrun")
                            v = _jpeg_extend(bits.bits(s), s)
                            if ci == 0:
                                coef[_ZZ[k]] = v * yq[k]
                            k += 1
                        if ci == 0:
                            yblocks[(my * vmax + by) * bw
                                    + mx * hmax + bx] = coef.reshape(8, 8)
        spatial = _DCT_A @ yblocks @ _DCT_A.T
        plane = (
            spatial.reshape(bh, bw, 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(bh * 8, bw * 8)
        )
        return np.clip(plane[:h, :w] + 128.0, 0.0, 255.0)
    except (IndexError, KeyError, ValueError, ZeroDivisionError):
        return None


def _jpeg_entropy_segments(payload: bytes, dpos: int
                           ) -> Tuple[list, int]:
    """Split one scan's entropy data at restart markers, destuffing
    FF00 → ([segment bytes...], position of the terminating marker)."""
    n = len(payload)
    segs: list = []
    cur = bytearray()
    i = dpos
    while i < n:
        b = payload[i]
        if b == 0xFF:
            m = payload[i + 1] if i + 1 < n else 0xD9
            if m == 0x00:
                cur.append(0xFF)
                i += 2
                continue
            if 0xD0 <= m <= 0xD7:
                segs.append(bytes(cur))
                cur = bytearray()
                i += 2
                continue
            break                              # EOI or next real marker
        cur.append(b)
        i += 1
    segs.append(bytes(cur))
    return segs, i


def _decode_jpeg_progressive(payload: bytes) -> Optional[np.ndarray]:
    """Progressive JPEG (SOF2) → float grayscale array, or None.

    Implements ITU T.81 Annex G (spectral selection + successive
    approximation) from the spec, pure stdlib/numpy: DC first/refine
    scans (interleaved or single-component), AC first scans with
    EOBRUN band runs, and the G.1.2.3 AC refinement algorithm
    (correction bits on history-nonzero coefficients, ±1<<Al
    insertions, EOB-run correction tails). Luma coefficients
    accumulate across scans and are dequantized + IDCT'd once at the
    end; chroma AC scans (always single-component) are skipped
    entirely — their entropy data is bounded by the next marker — and
    chroma DC values in interleaved scans are decoded only to keep
    bit-sync. DQT/DHT segments may be redefined between scans (legal
    and common); restart markers reset DC predictors and the EOB run.
    """
    if not payload.startswith(b"\xff\xd8"):
        return None
    try:
        qt: dict[int, np.ndarray] = {}
        huff: dict[tuple, dict] = {}
        restart = 0
        w = h = None
        comps: list[tuple] = []
        coefs = None            # luma zigzag coefs: (nblocks_pad, 64)
        bw_pad = bh_pad = 0     # padded luma block grid (MCU cover)
        nbx = nby = 0           # real (non-interleaved) luma block grid
        hmax = vmax = 1
        mcux = mcuy = 0
        pos = 2
        n = len(payload)
        while pos + 4 <= n:
            if payload[pos] != 0xFF:
                return None
            marker = payload[pos + 1]
            if marker == 0xD8 or 0xD0 <= marker <= 0xD7:
                pos += 2
                continue
            if marker == 0xD9:
                break
            seglen = int.from_bytes(payload[pos + 2:pos + 4], "big")
            data = payload[pos + 4:pos + 2 + seglen]
            if marker == 0xDB:
                i = 0
                while i < len(data):
                    prec, tid = data[i] >> 4, data[i] & 15
                    i += 1
                    if prec:
                        vals = np.frombuffer(
                            data[i:i + 128], dtype=">u2").astype(np.int64)
                        i += 128
                    else:
                        vals = np.frombuffer(
                            data[i:i + 64], dtype=np.uint8).astype(np.int64)
                        i += 64
                    qt[tid] = vals
            elif marker == 0xC2:
                h = int.from_bytes(data[1:3], "big")
                w = int.from_bytes(data[3:5], "big")
                nc = data[5]
                comps = [
                    (data[6 + 3 * c], data[7 + 3 * c] >> 4,
                     data[7 + 3 * c] & 15, data[8 + 3 * c])
                    for c in range(nc)
                ]
                hmax = max(c[1] for c in comps)
                vmax = max(c[2] for c in comps)
                if (comps[0][1], comps[0][2]) != (hmax, vmax):
                    return None
                mcux = -(-w // (8 * hmax))
                mcuy = -(-h // (8 * vmax))
                bw_pad, bh_pad = mcux * hmax, mcuy * vmax
                nbx, nby = -(-w // 8), -(-h // 8)
                coefs = np.zeros((bh_pad * bw_pad, 64), dtype=np.int64)
            elif marker in (0xC0, 0xC1, 0xC3, 0xC5, 0xC6, 0xC7,
                            0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
                return None
            elif marker == 0xC4:
                i = 0
                while i + 17 <= len(data):
                    cls, tid = data[i] >> 4, data[i] & 15
                    counts = data[i + 1:i + 17]
                    nv = sum(counts)
                    huff[(cls, tid)] = _jpeg_huff_table(
                        counts, data[i + 17:i + 17 + nv])
                    i += 17 + nv
            elif marker == 0xDD:
                restart = int.from_bytes(data[0:2], "big")
            elif marker == 0xDA:
                if coefs is None:
                    return None
                ns = data[0]
                scan_comps = [
                    (data[1 + 2 * c], data[2 + 2 * c] >> 4,
                     data[2 + 2 * c] & 15)
                    for c in range(ns)
                ]
                ss, se = data[1 + 2 * ns], data[2 + 2 * ns]
                ah, al = data[3 + 2 * ns] >> 4, data[3 + 2 * ns] & 15
                if (ss == 0) != (se == 0):
                    return None   # T.81 G.1: DC and AC never share a scan
                if ss > 0 and ns != 1:
                    return None   # AC scans are single-component
                segs, endpos = _jpeg_entropy_segments(payload, pos + 2 + seglen)
                luma_id = comps[0][0]
                in_scan = [c for c in scan_comps if c[0] == luma_id]
                if ss == 0:
                    _jpeg_prog_dc_scan(
                        payload, segs, restart, comps, scan_comps, huff,
                        coefs, mcux, mcuy, nbx, nby, bw_pad, ah, al, ns,
                        luma_id,
                    )
                elif ns == 1 and scan_comps[0][0] == luma_id:
                    _jpeg_prog_ac_scan(
                        segs, restart, huff, coefs, nbx, nby, bw_pad,
                        scan_comps[0][2], ss, se, ah, al,
                    )
                # else: chroma AC scan — skip its entropy data entirely
                pos = endpos
                continue
            pos += 2 + seglen
        if coefs is None or not (w and h):
            return None
        deq = coefs * qt[comps[0][3]][None, :]
        nat = np.zeros_like(deq)      # zigzag position k → natural _ZZ[k]
        nat[:, _ZZ] = deq
        blocks = nat.reshape(-1, 8, 8).astype(float)
        spatial = _DCT_A @ blocks @ _DCT_A.T
        plane = (
            spatial.reshape(bh_pad, bw_pad, 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(bh_pad * 8, bw_pad * 8)
        )
        return np.clip(plane[:h, :w] + 128.0, 0.0, 255.0)
    except (IndexError, KeyError, ValueError, ZeroDivisionError):
        if os.environ.get("SPARK_GRAFT_JPEG_DEBUG"):
            raise
        return None


def _jpeg_prog_dc_scan(payload, segs, restart, comps, scan_comps, huff,
                       coefs, mcux, mcuy, nbx, nby, bw_pad, ah, al, ns,
                       luma_id):
    """DC scan (Ss=0): first pass (Ah=0) DPCM-decodes diffs<<Al;
    refinement (Ah>0) reads one bit per block. Interleaved when ns>1
    (chroma decoded for bit-sync only), non-interleaved block order
    when ns=1."""
    comp_by_id = {c[0]: c for c in comps}
    if ns > 1:
        units = mcux * mcuy
    else:
        if scan_comps[0][0] != luma_id:
            return  # single-component chroma DC scan: nothing to keep
        units = nbx * nby
    bits = _JpegBits(segs[0])
    seg_i = 0
    preds = {c[0]: 0 for c in scan_comps}
    for u in range(units):
        if restart and u and u % restart == 0:
            seg_i += 1
            if seg_i >= len(segs):
                return
            bits = _JpegBits(segs[seg_i])
            preds = {c[0]: 0 for c in scan_comps}
        if ns > 1:
            my, mx = divmod(u, mcux)
            for cid, td, _ta in scan_comps:
                _, hi, vi, _tq = comp_by_id[cid]
                for by in range(vi):
                    for bx in range(hi):
                        if ah == 0:
                            s = _jpeg_huff_decode(bits, huff[(0, td)])
                            preds[cid] += _jpeg_extend(bits.bits(s), s)
                            if cid == luma_id:
                                bi = (my * vi + by) * bw_pad + mx * hi + bx
                                coefs[bi, 0] = preds[cid] << al
                        else:
                            b = bits.bit()
                            if cid == luma_id:
                                bi = (my * vi + by) * bw_pad + mx * hi + bx
                                coefs[bi, 0] |= b << al
        else:
            cid, td, _ta = scan_comps[0]
            by, bx = divmod(u, nbx)
            bi = by * bw_pad + bx
            if ah == 0:
                s = _jpeg_huff_decode(bits, huff[(0, td)])
                preds[cid] += _jpeg_extend(bits.bits(s), s)
                coefs[bi, 0] = preds[cid] << al
            else:
                coefs[bi, 0] |= bits.bit() << al


def _jpeg_prog_ac_scan(segs, restart, huff, coefs, nbx, nby, bw_pad,
                       ta, ss, se, ah, al):
    """Luma AC scan over band [ss..se] in non-interleaved block order.
    Ah=0: first pass — EOBRUN band runs, ZRL, values << Al (point
    transform). Ah>0: G.1.2.3 refinement — correction bits on
    history-nonzero positions, ±1<<Al insertions at newly-significant
    ones, EOB-run correction tails."""
    tab = huff[(1, ta)]
    bits = _JpegBits(segs[0])
    seg_i = 0
    eobrun = 0
    p1 = 1 << al
    for u in range(nbx * nby):
        if restart and u and u % restart == 0:
            seg_i += 1
            if seg_i >= len(segs):
                return
            bits = _JpegBits(segs[seg_i])
            eobrun = 0
        by, bx = divmod(u, nbx)
        row = coefs[by * bw_pad + bx]
        if ah == 0:
            if eobrun:
                eobrun -= 1
                continue
            k = ss
            while k <= se:
                rs = _jpeg_huff_decode(bits, tab)
                r, s = rs >> 4, rs & 15
                if s == 0:
                    if r == 15:
                        k += 16
                        continue
                    eobrun = (1 << r) - 1 + (bits.bits(r) if r else 0)
                    break
                k += r
                if k > se:
                    raise ValueError("AC band overrun")
                row[k] = _jpeg_extend(bits.bits(s), s) << al
                k += 1
        else:
            k = ss
            if eobrun > 0:
                # whole block consumed by a prior EOBn: correction
                # bits only, and THIS block counts against the run
                while k <= se:
                    if row[k] != 0 and bits.bit() and (abs(row[k]) & p1) == 0:
                        row[k] += p1 if row[k] > 0 else -p1
                    k += 1
                eobrun -= 1
                continue
            while k <= se:
                rs = _jpeg_huff_decode(bits, tab)
                r, s = rs >> 4, rs & 15
                newval = 0
                if s == 0:
                    if r < 15:
                        # run counts REMAINING blocks — this block's
                        # tail pass below completes it, no decrement
                        eobrun = (1 << r) - 1 + (bits.bits(r) if r else 0)
                        break
                    # r == 15 (ZRL): pass over 16 zero-history slots
                else:
                    if s != 1:
                        raise ValueError("bad refine magnitude")
                    newval = p1 if bits.bit() else -p1
                while k <= se:
                    if row[k] != 0:
                        if bits.bit() and (abs(row[k]) & p1) == 0:
                            row[k] += p1 if row[k] > 0 else -p1
                    else:
                        if r == 0:
                            break
                        r -= 1
                    k += 1
                if newval and k <= se:
                    row[k] = newval
                k += 1
            # EOBn tail: correction bits for the rest of THIS block
            while k <= se:
                if row[k] != 0 and bits.bit() and (abs(row[k]) & p1) == 0:
                    row[k] += p1 if row[k] > 0 else -p1
                k += 1


def _tiff_packbits(data: bytes) -> bytes:
    """PackBits RLE (TIFF compression 32773 / Apple PackBits)."""
    out = bytearray()
    i = 0
    n = len(data)
    while i < n:
        c = data[i]
        i += 1
        if c < 128:                        # literal run of c+1 bytes
            out += data[i:i + c + 1]
            i += c + 1
        elif c > 128:                      # repeat next byte 257-c times
            if i < n:
                out += bytes([data[i]]) * (257 - c)
                i += 1
        # c == 128: noop
    return bytes(out)


def _tiff_lzw(data: bytes) -> Optional[bytes]:
    """TIFF-flavor LZW (compression 5): MSB-first bit packing, 9-bit
    start, ClearCode 256 / EOI 257, and the spec's "early change"
    (code width grows one entry earlier than the table fills)."""
    CLEAR, EOI = 256, 257
    table: list = [bytes([i]) for i in range(256)] + [b"", b""]
    width = 9
    out = bytearray()
    prev: Optional[bytes] = None
    acc = nbits = 0
    for byte in data:
        acc = (acc << 8) | byte
        nbits += 8
        while nbits >= width:
            code = (acc >> (nbits - width)) & ((1 << width) - 1)
            nbits -= width
            if code == CLEAR:
                table = [bytes([i]) for i in range(256)] + [b"", b""]
                width = 9
                prev = None
                continue
            if code == EOI:
                return bytes(out)
            if code < len(table):
                entry = table[code]
            elif code == len(table) and prev is not None:
                entry = prev + prev[:1]
            else:
                return None
            out += entry
            if prev is not None:
                table.append(prev + entry[:1])
            prev = entry
            # early change, lag-adjusted: the decoder's table trails
            # the encoder by one entry (the entry for the code being
            # read is registered only on the NEXT code), so the width
            # bump fires at len+2 where the encoder fires at
            # next_code+1 — the classic TIFF-LZW off-by-one
            if len(table) + 2 >= (1 << width) and width < 12:
                width += 1
    return bytes(out)


def _decode_tiff(payload: bytes) -> Optional[np.ndarray]:
    """Baseline TIFF 6.0 → float grayscale array, or None. Supports
    the archival-common cases: uncompressed, PackBits (32773), and LZW
    (5, early-change + horizontal-differencing predictor); 8-bit gray
    or RGB, strip-based, either byte order. Palette/tiled variants
    return None → strict/fake handling upstream."""
    if payload[:4] == b"II*\x00":
        bo = "little"
    elif payload[:4] == b"MM\x00*":
        bo = "big"
    else:
        return None

    def u(off: int, n: int) -> int:
        return int.from_bytes(payload[off:off + n], bo)

    ifd = u(4, 4)
    if ifd + 2 > len(payload):
        return None
    n_tags = u(ifd, 2)
    tags: dict[int, tuple] = {}
    for i in range(n_tags):
        e = ifd + 2 + 12 * i
        tid, ttype, cnt = u(e, 2), u(e + 2, 2), u(e + 4, 4)
        size = {1: 1, 3: 2, 4: 4}.get(ttype)
        if size is None:
            continue
        if size * cnt <= 4:
            vals = [u(e + 8 + j * size, size) for j in range(cnt)]
        else:
            off = u(e + 8, 4)
            vals = [u(off + j * size, size) for j in range(cnt)]
        tags[tid] = tuple(vals)
    try:
        w = tags[256][0]
        h = tags[257][0]
        compression = tags.get(259, (1,))[0]
        spp = tags.get(277, (1,))[0]
        bits = tags.get(258, (8,) * spp)
        photometric = tags.get(262, (1,))[0]
        strip_offs = tags[273]
        strip_counts = tags.get(279, (w * h * spp,))
    except KeyError:
        return None
    if compression not in (1, 5, 32773) or any(b != 8 for b in bits) \
            or spp not in (1, 3):
        return None
    if photometric not in (0, 1, 2):
        return None                       # palette/CMYK/etc.
    predictor = tags.get(317, (1,))[0]
    rows_per_strip = tags.get(278, (h,))[0] or h
    strips = [payload[o:o + c] for o, c in zip(strip_offs, strip_counts)]
    if compression == 32773:
        strips = [_tiff_packbits(s) for s in strips]
    elif compression == 5:
        strips = [_tiff_lzw(s) for s in strips]
        if any(s is None for s in strips):
            return None
    data = b"".join(strips)
    if len(data) < w * h * spp:
        return None
    if predictor == 2:                    # horizontal differencing
        arr = np.frombuffer(data, np.uint8, count=w * h * spp).reshape(
            h, w, spp).astype(np.int64)
        data = np.cumsum(arr, axis=1, dtype=np.int64).astype(
            np.uint8).tobytes()
    elif predictor != 1:
        return None
    del rows_per_strip  # strips already concatenated row-contiguous
    px = np.frombuffer(data, np.uint8, count=w * h * spp).reshape(h, w, spp)
    if spp == 3:
        return px.astype(np.float64) @ _LUMA
    gray = px[:, :, 0].astype(np.float64)
    return 255.0 - gray if photometric == 0 else gray   # 0 = white-is-zero


def _ahash_and_embedding(gray: np.ndarray, embed_dim: int
                         ) -> Tuple[int, list[float]]:
    """8×8 block-mean average-hash (perceptual) + block-mean embedding
    — two encodings of the same pixels produce the same values."""
    h, w = gray.shape
    blocks = np.empty((8, 8))
    for i, rs in enumerate(np.array_split(np.arange(h), 8)):
        for j, cs in enumerate(np.array_split(np.arange(w), 8)):
            blocks[i, j] = gray[np.ix_(rs, cs)].mean() if len(rs) and len(cs) else 0.0
    bits = (blocks > blocks.mean()).flatten()
    val = 0
    for i, b in enumerate(bits):
        if b:
            val |= 1 << i
    if val >= 1 << 63:            # to signed int64
        val -= 1 << 64
    emb = [float(round(x / 255.0, 6)) for x in blocks.flatten()[:embed_dim]]
    return val, emb


def _decode_image(payload: bytes, strict: bool = False
                  ) -> Tuple[int, int, Optional[np.ndarray]]:
    """REAL decode for JPEG (baseline + progressive), PNG, GIF
    (87a/89a first frame), PPM(P6), BMP (24-bit uncompressed), TIFF
    (uncompressed 8-bit strips), WebP-lossless (VP8L) and WebP-lossy
    (VP8 keyframe — ``operators.vp8``, r4) → (w, h, gray). The only
    remaining undecodable formats (arithmetic JPEG, AVIF/HEIC):
    strict mode raises; otherwise a clearly-marked deterministic fake
    derives dimensions from the payload digest and returns gray=None."""
    from website_to_agent_spark.operators.vp8 import decode_vp8
    from website_to_agent_spark.operators.vp8l import decode_vp8l

    for dec in (_decode_png, _decode_jpeg, _decode_gif, _decode_ppm,
                _decode_bmp, _decode_tiff, decode_vp8l, decode_vp8):
        try:
            gray = dec(payload or b"")
        except (ValueError, IndexError):
            gray = None
        if gray is not None:
            return gray.shape[1], gray.shape[0], gray
    if strict:
        raise NotImplementedError(
            "only baseline/progressive JPEG, PNG, GIF, PPM, BMP, TIFF "
            "and both WebP flavors (VP8L lossless, VP8 lossy keyframe) "
            "decodable without PIL/opencv (absent in sandbox)"
        )
    h = zlib.crc32(payload or b"")
    return 64 + h % 1024, 64 + (h >> 10) % 1024, None


def _decode_wav(payload: bytes) -> Optional[Tuple[np.ndarray, int]]:
    """stdlib WAV → (mono float samples in [-1,1], framerate)."""
    import wave

    if not (payload.startswith(b"RIFF") and payload[8:12] == b"WAVE"):
        return None
    with wave.open(io.BytesIO(payload), "rb") as wf:
        rate = wf.getframerate()
        n = wf.getnframes()
        width = wf.getsampwidth()
        channels = wf.getnchannels()
        raw = wf.readframes(n)
    if width == 2:
        samples = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
    elif width == 1:
        samples = (np.frombuffer(raw, dtype=np.uint8).astype(np.float64) - 128) / 128.0
    else:
        return None
    if channels > 1:
        samples = samples.reshape(-1, channels).mean(axis=1)
    return samples, rate


def _decode_audio(payload: bytes, strict: bool = False,
                  frame_ms: int = 1000) -> list[float]:
    """REAL per-window RMS for WAV (stdlib ``wave``); other formats
    need ffmpeg/soundfile — strict raises, else the documented
    deterministic fake (pseudo-RMS from rolling digests).

    FINAL boundary (r5): MP3/AAC sample decode stays out for good.
    A conforming MPEG-audio decode needs ISO 11172-3's tabulated
    prototype synthesis window (Table B.3 — 512 coefficients with no
    generating formula) and the Layer III Huffman tables (B.7);
    neither is transcribable-and-verifiable here (no spec text, no
    reference codec), unlike RFC 6386 whose tables ship in the RFC
    itself. A decoder over invented tables would validate against
    nothing and decode nothing real — worse than an honest strict
    raise. Metadata stays REAL (exact frame-header walk + ID3 skip in
    ``audio_metadata``); fingerprint/near-dup run on PCM."""
    try:
        wav = _decode_wav(payload or b"")
    except Exception:  # malformed RIFF → fall through to fake/strict
        wav = None
    if wav is not None:
        samples, rate = wav
        win = max(1, int(rate * frame_ms / 1000))
        out = []
        for i in range(0, max(len(samples), 1), win):
            chunk = samples[i:i + win]
            out.append(
                float(np.sqrt((chunk ** 2).mean())) if len(chunk) else 0.0
            )
        return out
    if strict:
        raise NotImplementedError(
            "only WAV decodable without ffmpeg/soundfile (absent in sandbox)"
        )
    n_frames = max(1, len(payload or b"") // 256)
    return [
        (zlib.crc32((payload or b"")[i * 256:(i + 1) * 256]) % 10_000) / 10_000.0
        for i in range(n_frames)
    ]


AUDIO_FP = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("fp", T.LongType(), True),
    ]
)


def _band_edges(n_bins: int, n_bands: int) -> np.ndarray:
    """Strictly-increasing log-spaced FFT-bin edges (n_bands+1 of them)
    between bin 2 and the top bin."""
    edges = np.round(np.geomspace(2, n_bins - 1, n_bands + 1)).astype(int)
    for i in range(1, len(edges)):
        if edges[i] <= edges[i - 1]:
            edges[i] = edges[i - 1] + 1
    return edges


def _fingerprint_samples(samples: np.ndarray, frame_len: int, hop: int,
                         n_bits: int) -> list[int]:
    """Philips/Haitsma-Kalker-style robust audio hash (public spec):
    per overlapping Hann-windowed frame, log-band energies E(t,b);
    bit(t,b) = sign of the time-delta of the band-delta,
    (E(t,b)−E(t,b+1)) − (E(t−1,b)−E(t−1,b+1)) > 0. The double
    difference cancels any constant gain, so an amplitude-scaled copy
    of the same audio produces the IDENTICAL bit string — the audio
    analogue of the image aHash."""
    if len(samples) < frame_len + hop:
        return []
    n_frames = 1 + (len(samples) - frame_len) // hop
    idx = np.arange(n_frames)[:, None] * hop + np.arange(frame_len)[None, :]
    frames = samples[idx] * np.hanning(frame_len)
    power = np.abs(np.fft.rfft(frames, axis=1)) ** 2
    edges = _band_edges(power.shape[1], n_bits + 1)
    energies = np.stack(
        [power[:, edges[b]:edges[b + 1]].sum(axis=1)
         for b in range(n_bits + 1)], axis=1,
    )
    band_delta = energies[:, :-1] - energies[:, 1:]
    bits = (band_delta[1:] - band_delta[:-1]) > 0
    weights = (1 << np.arange(n_bits)).astype(np.int64)
    return [int(v) for v in bits.astype(np.int64) @ weights]


def audio_fingerprint(media: DataFrame, frame_len: int = 1024,
                      hop: int = 512, n_bits: int = 32,
                      strict: bool = False) -> DataFrame:
    """Per-frame robust audio fingerprints (media_id, frame_idx, fp) —
    the retrieval/near-dup feature for the audio modality. REAL for
    WAV (stdlib decode + numpy rFFT); compressed formats need ffmpeg —
    strict raises, else the documented deterministic fake (one crc
    pseudo-fp per 4 KB, matching only byte-identical payloads)."""

    def _kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("media_id", "frame_idx", "fp")}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                raw = bytes(payload) if payload is not None else b""
                try:
                    wav = _decode_wav(raw)
                except Exception:
                    wav = None
                if wav is not None:
                    fps = _fingerprint_samples(wav[0], frame_len, hop, n_bits)
                elif strict:
                    raise NotImplementedError(
                        "only WAV fingerprintable without ffmpeg "
                        "(absent in sandbox)"
                    )
                else:
                    fps = [
                        int(zlib.crc32(raw[i * 4096:(i + 1) * 4096]))
                        for i in range(max(1, len(raw) // 4096))
                    ]
                for i, fp in enumerate(fps):
                    out["media_id"].append(mid)
                    out["frame_idx"].append(i)
                    out["fp"].append(fp)
            yield pd.DataFrame(out)

    return media.filter(F.col("kind") == "audio").mapInPandas(
        _kernel, schema=AUDIO_FP
    )


def near_dup_audio(fps: DataFrame, min_frames: int = 3) -> DataFrame:
    """Audio near-dup pairs: two clips match when ≥ ``min_frames`` of
    their aligned frames carry the same fingerprint (gain-invariant by
    construction of the fp bits). Candidates come from a groupBy on
    (frame_idx, fp) — the same single-pass bucket shape as
    ``dedupe.banded_candidate_pairs``, with a per-pair vote count
    instead of a dropDuplicates. Returns (a, b, n_matching)."""
    buckets = (
        fps.groupBy("frame_idx", "fp")
        .agg(F.collect_list("media_id").alias("ms"))
        .filter(F.size("ms") > 1)
    )
    votes = buckets.select(
        F.explode(
            F.flatten(
                F.transform(
                    "ms",
                    lambda m, i: F.transform(
                        F.slice(F.col("ms"), i + F.lit(2), F.size("ms")),
                        lambda nn: F.struct(
                            F.least(m, nn).alias("a"),
                            F.greatest(m, nn).alias("b"),
                        ),
                    ),
                )
            )
        ).alias("p")
    ).select("p.a", "p.b")
    return (
        votes.groupBy("a", "b")
        .agg(F.count("*").alias("n_matching"))
        .filter(F.col("n_matching") >= min_frames)
    )


def media_repartition(media: DataFrame, target_mb: int = 64,
                      size_col: str = "payload") -> DataFrame:
    """Partition-size control for blob tables: estimate total bytes,
    hash-repartition on media_id into ceil(total/target) partitions so
    one task's batch stays within memory."""
    total = media.select(
        F.sum(F.length(F.col(size_col))).alias("b")
    ).first().b or 0
    n_parts = max(1, int(total // (target_mb * 1024 * 1024)) + 1)
    return media.repartition(n_parts, "media_id")


def image_features(media: DataFrame, embed_dim: int = 8,
                   strict: bool = False) -> DataFrame:
    """decode → resize → feature-extract as a streaming mapInPandas
    kernel. Embedding here is the deterministic fake (digest-seeded)."""

    def _kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in
                   ("media_id", "width", "height", "n_bytes", "phash", "embedding")}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                raw = bytes(payload) if payload is not None else b""
                w, h, gray = _decode_image(raw, strict)
                out["media_id"].append(mid)
                out["width"].append(w)
                out["height"].append(h)
                out["n_bytes"].append(len(raw))
                if gray is not None:
                    # REAL perceptual hash + block-mean embedding —
                    # encoding-independent (PPM and BMP of the same
                    # pixels collide, as a perceptual hash must)
                    phash, emb = _ahash_and_embedding(gray, embed_dim)
                else:
                    digest = hashlib.blake2b(raw, digest_size=16).digest()
                    phash = int.from_bytes(digest[:8], "little", signed=True)
                    emb = [b / 255.0 for b in digest[:embed_dim]]
                out["phash"].append(phash)
                out["embedding"].append(emb)
            yield pd.DataFrame(out)

    return media.filter(F.col("kind") == "image").mapInPandas(
        _kernel, schema=IMAGE_FEATURES
    )


def audio_frames(media: DataFrame, frame_ms: int = 1000,
                 strict: bool = False) -> DataFrame:
    """decode → frame-sample: one output row per audio frame
    (UDTF-shaped mapInPandas — rows out ≫ rows in)."""

    def _kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("media_id", "frame_idx", "start_ms", "rms")}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                series = _decode_audio(
                    bytes(payload) if payload is not None else b"",
                    strict, frame_ms=frame_ms,
                )
                for i, rms in enumerate(series):
                    out["media_id"].append(mid)
                    out["frame_idx"].append(i)
                    out["start_ms"].append(i * frame_ms)
                    out["rms"].append(rms)
            yield pd.DataFrame(out)

    return media.filter(F.col("kind") == "audio").mapInPandas(
        _kernel, schema=AUDIO_FRAMES
    )


VIDEO_FRAMES = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("ts_ms", T.LongType(), True),
        T.StructField("phash", T.LongType(), True),
    ]
)


VIDEO_META = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("container", T.StringType(), True),
        T.StructField("duration_s", T.DoubleType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("codec", T.StringType(), True),
        T.StructField("n_samples", T.LongType(), True),
    ]
)


def _mp4_boxes(data: bytes, start: int, end: int):
    """Walk ISO-BMFF boxes in data[start:end] → (type, body_lo, body_hi).
    Handles 64-bit largesize (size==1) and to-end boxes (size==0)."""
    pos = start
    while pos + 8 <= end:
        size = int.from_bytes(data[pos:pos + 4], "big")
        btype = data[pos + 4:pos + 8]
        body = pos + 8
        if size == 1:
            if pos + 16 > end:
                return
            size = int.from_bytes(data[pos + 8:pos + 16], "big")
            body = pos + 16
        elif size == 0:
            size = end - pos
        if size < 8 or pos + size > end:
            return                       # damaged tail → stop
        yield btype, body, pos + size
        pos += size


def _parse_mp4_meta(payload: bytes) -> Optional[dict]:
    """ISO-BMFF (mp4/mov/m4a) container metadata WITHOUT any codec:
    movie duration from mvhd, first video track's dimensions from tkhd
    (16.16 fixed point), codec fourcc from stsd, sample count from
    stsz/stz2 — the catalog pass a pipeline runs before spending
    decode compute. Returns None if not an ISO-BMFF stream."""
    if len(payload) < 12 or payload[4:8] != b"ftyp":
        return None
    out: dict = {"container": "mp4", "duration_s": None, "width": None,
                 "height": None, "codec": None, "n_samples": None}
    try:
        for btype, lo, hi in _mp4_boxes(payload, 0, len(payload)):
            if btype != b"moov":
                continue
            for t2, lo2, hi2 in _mp4_boxes(payload, lo, hi):
                if t2 == b"mvhd":
                    ver = payload[lo2]
                    if ver == 1:
                        ts = int.from_bytes(payload[lo2 + 20:lo2 + 24], "big")
                        dur = int.from_bytes(payload[lo2 + 24:lo2 + 32], "big")
                    else:
                        ts = int.from_bytes(payload[lo2 + 12:lo2 + 16], "big")
                        dur = int.from_bytes(payload[lo2 + 16:lo2 + 20], "big")
                    if ts:
                        out["duration_s"] = round(dur / ts, 6)
                elif t2 == b"trak":
                    tw = th = None
                    codec = nsamp = None
                    for t3, lo3, hi3 in _mp4_boxes(payload, lo2, hi2):
                        if t3 == b"tkhd":
                            ver = payload[lo3]
                            off = lo3 + (96 if ver == 1 else 84)
                            tw = int.from_bytes(
                                payload[off - 8:off - 4], "big") >> 16
                            th = int.from_bytes(
                                payload[off - 4:off], "big") >> 16
                        elif t3 == b"mdia":
                            for t4, lo4, hi4 in _mp4_boxes(payload, lo3, hi3):
                                if t4 != b"minf":
                                    continue
                                for t5, lo5, hi5 in _mp4_boxes(
                                        payload, lo4, hi4):
                                    if t5 != b"stbl":
                                        continue
                                    for t6, lo6, hi6 in _mp4_boxes(
                                            payload, lo5, hi5):
                                        if t6 == b"stsd":
                                            n = int.from_bytes(
                                                payload[lo6 + 4:lo6 + 8],
                                                "big")
                                            if n:
                                                codec = payload[
                                                    lo6 + 12:lo6 + 16
                                                ].decode("latin-1")
                                        elif t6 in (b"stsz", b"stz2"):
                                            nsamp = int.from_bytes(
                                                payload[lo6 + 8:lo6 + 12],
                                                "big")
                    # first track with real dimensions = the video track
                    if tw and th and out["width"] is None:
                        out["width"], out["height"] = tw, th
                        out["codec"] = codec
                        out["n_samples"] = nsamp
        return out
    except (IndexError, ValueError):
        return out


def video_metadata(media: DataFrame) -> DataFrame:
    """Container-level metadata for video blobs (mapInPandas): mp4
    (ISO-BMFF box walk — REAL even though frame decode needs ffmpeg),
    Y4M (header + frame count), animated GIF (logical screen + frame
    count). Null row fields where the container is unknown."""

    def _kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("media_id", "container", "duration_s",
                                   "width", "height", "codec", "n_samples")}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                data = bytes(payload) if payload is not None else b""
                meta = _parse_mp4_meta(data)
                if meta is None and data[:9] == b"YUV4MPEG2":
                    frames = _decode_y4m(data)
                    if frames:
                        h, w = frames[0].shape
                        meta = {"container": "y4m", "duration_s": None,
                                "width": w, "height": h, "codec": "raw",
                                "n_samples": len(frames)}
                if meta is None and data[:6] in (b"GIF87a", b"GIF89a"):
                    frames = _decode_gif_frames(data)
                    meta = {
                        "container": "gif", "duration_s": None,
                        "width": int.from_bytes(data[6:8], "little"),
                        "height": int.from_bytes(data[8:10], "little"),
                        "codec": "gif",
                        "n_samples": len(frames) if frames else 0,
                    }
                if meta is None:
                    meta = {"container": None, "duration_s": None,
                            "width": None, "height": None, "codec": None,
                            "n_samples": None}
                out["media_id"].append(mid)
                for k, v in meta.items():
                    out[k].append(v)
            yield pd.DataFrame(out)

    return media.filter(F.col("kind") == "video").mapInPandas(
        _kernel, schema=VIDEO_META
    )


IMAGE_META = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("format", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_bytes", T.LongType(), True),
    ]
)


def _image_dims(data: bytes):
    """(format, w, h) from headers alone — no pixel decode. Covers
    PNG, GIF, BMP, PPM, JPEG (SOFx marker walk, baseline/progressive/
    arithmetic alike), TIFF tags, and all three WebP flavors
    (VP8X canvas, VP8L packed 14-bit, lossy VP8 keyframe dims — dims
    readable even though lossy pixel decode is out of scope)."""
    n = len(data)
    if data[:8] == _PNG_SIG and n >= 24:
        return ("png", int.from_bytes(data[16:20], "big"),
                int.from_bytes(data[20:24], "big"))
    if data[:6] in (b"GIF87a", b"GIF89a") and n >= 10:
        return ("gif", int.from_bytes(data[6:8], "little"),
                int.from_bytes(data[8:10], "little"))
    if data[:2] == b"BM" and n >= 26:
        return ("bmp", int.from_bytes(data[18:22], "little", signed=True),
                abs(int.from_bytes(data[22:26], "little", signed=True)))
    if data[:2] == b"P6":
        hdr = b"\n".join(
            ln for ln in data[2:200].split(b"\n")
            if not ln.lstrip().startswith(b"#")
        )
        toks = hdr.split()
        if len(toks) >= 2:
            try:
                return ("ppm", int(toks[0]), int(toks[1]))
            except ValueError:
                return ("ppm", None, None)
    if data[:2] == b"\xff\xd8":
        pos = 2
        while pos + 4 <= n and data[pos] == 0xFF:
            marker = data[pos + 1]
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                pos += 2
                continue
            seglen = int.from_bytes(data[pos + 2:pos + 4], "big")
            if marker in (0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                          0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
                return ("jpeg",
                        int.from_bytes(data[pos + 7:pos + 9], "big"),
                        int.from_bytes(data[pos + 5:pos + 7], "big"))
            pos += 2 + seglen
        return ("jpeg", None, None)
    if data[:4] == b"RIFF" and data[8:12] == b"WEBP" and n >= 25:
        chunk = data[12:16]
        if chunk == b"VP8X" and n >= 30:
            return ("webp",
                    int.from_bytes(data[24:27], "little") + 1,
                    int.from_bytes(data[27:30], "little") + 1)
        if chunk == b"VP8L":
            bits = int.from_bytes(data[21:25], "little")
            return ("webp", (bits & 0x3FFF) + 1,
                    ((bits >> 14) & 0x3FFF) + 1)
        if chunk == b"VP8 ":
            # lossy keyframe: 3-byte frame tag, 3-byte start code,
            # then 14-bit w/h (little-endian, low 14 bits)
            if data[23:26] == b"\x9d\x01\x2a":
                return ("webp",
                        int.from_bytes(data[26:28], "little") & 0x3FFF,
                        int.from_bytes(data[28:30], "little") & 0x3FFF)
        return ("webp", None, None)
    if data[:4] in (b"II*\x00", b"MM\x00*"):
        bo = "little" if data[:2] == b"II" else "big"

        def u(off, k):
            return int.from_bytes(data[off:off + k], bo)

        try:
            ifd = u(4, 4)
            w = h = None
            for i in range(u(ifd, 2)):
                e = ifd + 2 + 12 * i
                tid, ttype = u(e, 2), u(e + 2, 2)
                size = {1: 1, 3: 2, 4: 4}.get(ttype, 4)
                v = u(e + 8, min(size, 4))
                if tid == 256:
                    w = v
                elif tid == 257:
                    h = v
            return ("tiff", w, h)
        except (IndexError, ValueError):
            return ("tiff", None, None)
    return (None, None, None)


def image_metadata(media: DataFrame) -> DataFrame:
    """Dimensions/format from headers only (mapInPandas) — the
    filter-before-decode pass: a 100 TB pipeline drops tiny icons and
    absurd dimensions BEFORE paying full decode (``image_features``)
    for the survivors."""

    def _kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("media_id", "format", "width",
                                   "height", "n_bytes")}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                data = bytes(payload) if payload is not None else b""
                try:
                    fmt, w, h = _image_dims(data)
                except (IndexError, ValueError):
                    fmt = w = h = None
                out["media_id"].append(mid)
                out["format"].append(fmt)
                out["width"].append(w)
                out["height"].append(h)
                out["n_bytes"].append(len(data))
            yield pd.DataFrame(out)

    return media.filter(F.col("kind") == "image").mapInPandas(
        _kernel, schema=IMAGE_META
    )


AUDIO_META = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("container", T.StringType(), True),
        T.StructField("duration_s", T.DoubleType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("channels", T.IntegerType(), True),
        T.StructField("n_frames", T.LongType(), True),
        T.StructField("bitrate_kbps", T.IntegerType(), True),
    ]
)

# MPEG audio Layer III tables (ISO 11172-3 / 13818-3)
_MP3_BITRATE_V1 = (0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192,
                   224, 256, 320)
_MP3_BITRATE_V2 = (0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128,
                   144, 160)
_MP3_RATES = {3: (44100, 48000, 32000),     # MPEG1
              2: (22050, 24000, 16000),     # MPEG2
              0: (11025, 12000, 8000)}      # MPEG2.5


def _parse_mp3_meta(payload: bytes) -> Optional[dict]:
    """MP3 metadata by walking the actual frame headers (exact for CBR
    and VBR alike, no Xing header needed): skips ID3v2 (syncsafe
    size), finds the first sync, then steps frame to frame summing
    per-frame durations. No audio decoding anywhere."""
    pos = 0
    n = len(payload)
    if payload[:3] == b"ID3" and n >= 10:
        size = 0
        for b in payload[6:10]:
            size = (size << 7) | (b & 0x7F)
        pos = 10 + size
    # find first frame sync
    start = None
    for i in range(pos, min(n - 4, pos + 65536)):
        if payload[i] == 0xFF and (payload[i + 1] & 0xE0) == 0xE0:
            start = i
            break
    if start is None:
        return None
    frames = 0
    dur = 0.0
    rate = chans = None
    kbps_sum = 0
    i = start
    while i + 4 <= n:
        h = payload[i:i + 4]
        if h[0] != 0xFF or (h[1] & 0xE0) != 0xE0:
            break
        ver = (h[1] >> 3) & 3          # 3=MPEG1, 2=MPEG2, 0=MPEG2.5
        layer = (h[1] >> 1) & 3        # 1 = Layer III
        if ver == 1 or layer != 1:
            break
        br_idx = (h[2] >> 4) & 15
        sr_idx = (h[2] >> 2) & 3
        if br_idx in (0, 15) or sr_idx == 3:
            break
        kbps = (_MP3_BITRATE_V1 if ver == 3 else _MP3_BITRATE_V2)[br_idx]
        sr = _MP3_RATES[ver][sr_idx]
        padding = (h[2] >> 1) & 1
        spf = 1152 if ver == 3 else 576
        fsize = spf // 8 * kbps * 1000 // sr + padding
        if fsize <= 4 or i + fsize > n:
            break
        frames += 1
        dur += spf / sr
        kbps_sum += kbps
        rate = sr
        chans = 1 if ((h[3] >> 6) & 3) == 3 else 2
        i += fsize
    if frames == 0:
        return None
    return {"container": "mp3", "duration_s": round(dur, 6),
            "sample_rate": rate, "channels": chans, "n_frames": frames,
            "bitrate_kbps": kbps_sum // frames}


def audio_metadata(media: DataFrame) -> DataFrame:
    """Container-level audio metadata (mapInPandas): WAV via stdlib
    ``wave``, MP3 via the frame-header walk — REAL even though MP3
    sample decode stays out of scope. Unknown containers yield null
    fields, never task failures."""
    import wave as _wave

    def _kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("media_id", "container", "duration_s",
                                   "sample_rate", "channels", "n_frames",
                                   "bitrate_kbps")}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                data = bytes(payload) if payload is not None else b""
                meta = None
                if data[:4] == b"RIFF" and data[8:12] == b"WAVE":
                    try:
                        with _wave.open(io.BytesIO(data)) as wf:
                            nfr = wf.getnframes()
                            sr = wf.getframerate()
                            meta = {
                                "container": "wav",
                                "duration_s": round(nfr / sr, 6) if sr else None,
                                "sample_rate": sr,
                                "channels": wf.getnchannels(),
                                "n_frames": nfr,
                                "bitrate_kbps": (
                                    sr * wf.getnchannels()
                                    * wf.getsampwidth() * 8 // 1000
                                ),
                            }
                    except Exception:
                        meta = None
                if meta is None:
                    meta = _parse_mp3_meta(data)
                if meta is None:
                    meta = {"container": None, "duration_s": None,
                            "sample_rate": None, "channels": None,
                            "n_frames": None, "bitrate_kbps": None}
                out["media_id"].append(mid)
                for k, v in meta.items():
                    out[k].append(v)
            yield pd.DataFrame(out)

    return media.filter(F.col("kind") == "audio").mapInPandas(
        _kernel, schema=AUDIO_META
    )


def _decode_y4m(payload: bytes) -> Optional[list]:
    """YUV4MPEG2 → list of float grayscale frames. The Y plane IS the
    luma frame, so grayscale video decode is a pure header walk —
    stdlib-only. Supports C420* / C422 / C444 / Cmono chroma layouts;
    a truncated tail keeps the intact frame prefix."""
    if not payload.startswith(b"YUV4MPEG2"):
        return None
    try:
        hdr_end = payload.index(b"\n")
    except ValueError:
        return None
    w = h = None
    chroma = "420"
    for p in payload[9:hdr_end].split():
        if p[:1] == b"W":
            w = int(p[1:])
        elif p[:1] == b"H":
            h = int(p[1:])
        elif p[:1] == b"C":
            chroma = p[1:].decode("latin-1")
    if not w or not h:
        return None
    ysize = w * h
    if chroma.startswith("420"):
        fsize = ysize * 3 // 2
    elif chroma.startswith("422"):
        fsize = ysize * 2
    elif chroma.startswith("444"):
        fsize = ysize * 3
    elif chroma.startswith("mono"):
        fsize = ysize
    else:
        return None
    frames: list = []
    pos = hdr_end + 1
    while pos < len(payload) and payload.startswith(b"FRAME", pos):
        try:
            fe = payload.index(b"\n", pos)
        except ValueError:
            break
        pos = fe + 1
        if pos + fsize > len(payload):
            break  # truncated final frame → keep the intact prefix
        y = np.frombuffer(payload, np.uint8, count=ysize, offset=pos)
        frames.append(y.reshape(h, w).astype(np.float64))
        pos += fsize
    return frames if frames else None


def _decode_video(payload: bytes, strict: bool = False) -> list[int]:
    """Per-frame phashes. REAL decode for Y4M (YUV4MPEG2, uncompressed
    — the raw-frame interchange format every ffmpeg pipeline can emit):
    each frame's Y plane goes through the SAME aHash as still images,
    so a video frame and a PNG of the same pixels collide — frame-level
    near-dup works across modalities. Compressed containers (mp4/webm)
    need ffmpeg/pyav (absent in this container) — strict raises, else
    the documented deterministic fake (one pseudo-frame per 4 KB)."""
    y4m = _decode_y4m(payload or b"")
    if y4m is not None:
        return [_ahash_and_embedding(g, 0)[0] for g in y4m]
    gif = _decode_gif_frames(payload or b"")
    if gif is not None:
        return [_ahash_and_embedding(g, 0)[0] for g in gif]
    if strict:
        raise NotImplementedError(
            "only Y4M/animated-GIF decodable without ffmpeg/pyav "
            "(absent in sandbox)"
        )
    n = max(1, len(payload or b"") // 4096)
    return [
        int.from_bytes(
            hashlib.blake2b((payload or b"")[i * 4096:(i + 1) * 4096],
                            digest_size=8).digest(),
            "little", signed=True,
        )
        for i in range(n)
    ]


def video_frames(media: DataFrame, every_nth: int = 5, fps: int = 30,
                 strict: bool = False) -> DataFrame:
    """decode → sample every Nth frame → per-frame phash (UDTF-shaped
    mapInPandas). Frame phashes feed ``near_dup_images`` unchanged, so
    video near-dup detection = frame-level phash banding."""

    def _kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("media_id", "frame_idx", "ts_ms", "phash")}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                frames = _decode_video(
                    bytes(payload) if payload is not None else b"", strict
                )
                for i in range(0, len(frames), every_nth):
                    out["media_id"].append(mid)
                    out["frame_idx"].append(i)
                    out["ts_ms"].append(int(i * 1000 / fps))
                    out["phash"].append(frames[i])
            yield pd.DataFrame(out)

    return media.filter(F.col("kind") == "video").mapInPandas(
        _kernel, schema=VIDEO_FRAMES
    )


def near_dup_images(features: DataFrame, max_hamming: int = 4,
                    max_bucket: int = 1024) -> DataFrame:
    """Perceptual near-dup pairs by phash banding (same pigeonhole trick
    as text SimHash) — candidate pairs come from ONE bucket-groupBy
    (``dedupe.banded_candidate_pairs``), not a self-join, so the
    upstream decode kernel runs once per image, not once per join side."""
    from website_to_agent_spark.operators.dedupe import banded_candidate_pairs

    bands = 4
    width = 64 // bands
    banded = features.select(
        "media_id",
        "phash",
        F.posexplode(
            F.array(
                *[
                    F.shiftrightunsigned("phash", i * width)
                    .bitwiseAND(F.lit((1 << width) - 1).cast("long"))
                    for i in range(bands)
                ]
            )
        ).alias("band_id", "band_key"),
    )
    return banded_candidate_pairs(
        banded, "media_id", "phash", max_bucket=max_bucket,
        score=lambda a, b: F.bit_count(a.bitwiseXOR(b)),
        score_name="hamming",
        keep=lambda s: s <= max_hamming,
    ).select(F.col("doc_a").alias("a"), F.col("doc_b").alias("b"), "hamming")
