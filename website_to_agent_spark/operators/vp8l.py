"""WebP-lossless (VP8L) still-image decoder — pure stdlib/numpy.

Implements the public VP8L bitstream (RFC 9649 / the WebP lossless
specification): LSB-first bit reading, simple and code-length-coded
canonical prefix codes, the 5-code entropy groups, meta-prefix
sub-images, LZ77 backward references with the 120-entry 2D distance
map, the color cache, and all four transforms — PREDICTOR (all 14
modes), COLOR, SUBTRACT_GREEN, and COLOR_INDEXING (delta-coded
palette incl. ≤16-color pixel bundling at packed width). Lossy VP8
needs a boolean arithmetic decoder and stays out of scope → None →
the caller's strict/fake handling applies (same policy as progressive
JPEG).

Used by ``operators.multimodal._decode_image``; kept in its own module
because the bitstream machinery is self-contained and testable without
Spark.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np

# code-length-code read order (spec §"Decoding the Code Lengths")
_CL_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)

# 2D offset map for distance codes 1..120 (spec §"Decoding Distances"):
# (dx, dy) scan-order neighbors, nearest first.
_DIST_MAP = (
    (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
    (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
    (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
    (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3), (2, 4), (-2, 4),
    (4, 2), (-4, 2), (0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0),
    (1, 5), (-1, 5), (5, 1), (-5, 1), (2, 5), (-2, 5), (5, 2), (-5, 2),
    (4, 4), (-4, 4), (3, 5), (-3, 5), (5, 3), (-5, 3), (0, 6), (6, 0),
    (1, 6), (-1, 6), (6, 1), (-6, 1), (2, 6), (-2, 6), (6, 2), (-6, 2),
    (4, 5), (-4, 5), (5, 4), (-5, 4), (3, 6), (-3, 6), (6, 3), (-6, 3),
    (0, 7), (7, 0), (1, 7), (-1, 7), (5, 5), (-5, 5), (7, 1), (-7, 1),
    (4, 6), (-4, 6), (6, 4), (-6, 4), (2, 7), (-2, 7), (7, 2), (-7, 2),
    (3, 7), (-3, 7), (7, 3), (-7, 3), (5, 6), (-5, 6), (6, 5), (-6, 5),
    (8, 0), (4, 7), (-4, 7), (7, 4), (-7, 4), (8, 1), (8, 2), (6, 6),
    (-6, 6), (8, 3), (5, 7), (-5, 7), (7, 5), (-7, 5), (8, 4), (6, 7),
    (-6, 7), (7, 6), (-7, 6), (8, 5), (7, 7), (-7, 7), (8, 6), (8, 7),
)


class _Bits:
    """LSB-first bit reader (VP8L convention — opposite of JPEG)."""

    __slots__ = ("d", "pos")

    def __init__(self, data: bytes):
        self.d = data
        self.pos = 0

    def bit(self) -> int:
        v = (self.d[self.pos >> 3] >> (self.pos & 7)) & 1
        self.pos += 1
        return v

    def bits(self, n: int) -> int:
        v = 0
        for i in range(n):
            v |= self.bit() << i
        return v


class _Code:
    """Canonical prefix code. lengths[sym] = code length (0 = absent).
    Decoding walks bits MSB-of-code-first (DEFLATE convention)."""

    __slots__ = ("table", "single")

    def __init__(self, lengths: List[int]):
        present = [(l, s) for s, l in enumerate(lengths) if l > 0]
        if not present:
            raise ValueError("empty code")
        if len(present) == 1:
            self.single = present[0][1]
            self.table = None
            return
        self.single = None
        present.sort()
        table = {}
        code = 0
        prev_len = present[0][0]
        for l, s in present:
            code <<= (l - prev_len)
            table[(l, code)] = s
            code += 1
            prev_len = l
        self.table = table

    def read(self, br: _Bits) -> int:
        if self.single is not None:
            return self.single
        code = 0
        for length in range(1, 16):
            code = (code << 1) | br.bit()
            s = self.table.get((length, code))
            if s is not None:
                return s
        raise ValueError("bad prefix code")


def _read_code(br: _Bits, alphabet_size: int) -> _Code:
    """One prefix code: the 'simple' 1-2 symbol form or the
    code-length-coded form with 16/17/18 repeats."""
    if br.bit():                                    # simple
        n_sym = br.bit() + 1
        first_8 = br.bit()
        lengths = [0] * alphabet_size
        s0 = br.bits(8 if first_8 else 1)
        if n_sym == 2:
            s1 = br.bits(8)
            lengths[s0] = lengths[s1] = 1
        else:
            lengths[s0] = 1                         # 0-bit code (single)
        return _Code(lengths)
    num_cl = br.bits(4) + 4
    cl_lengths = [0] * 19
    for i in range(num_cl):
        cl_lengths[_CL_ORDER[i]] = br.bits(3)
    cl_code = _Code(cl_lengths)
    if br.bit():                                    # bounded symbol count
        nbits = 2 + 2 * br.bits(3)
        max_symbol = 2 + br.bits(nbits)
    else:
        max_symbol = alphabet_size
    lengths = [0] * alphabet_size
    prev = 8
    sym = 0
    while sym < alphabet_size and max_symbol > 0:
        max_symbol -= 1
        cl = cl_code.read(br)
        if cl < 16:
            lengths[sym] = cl
            sym += 1
            if cl:
                prev = cl
        elif cl == 16:
            for _ in range(3 + br.bits(2)):
                if sym < alphabet_size:
                    lengths[sym] = prev
                    sym += 1
        elif cl == 17:
            sym += 3 + br.bits(3)
        else:
            sym += 11 + br.bits(7)
    return _Code(lengths)


def _prefix_value(code: int, br: _Bits) -> int:
    """LZ77 length/distance prefix decoding (spec §"LZ77 prefix
    coding"): codes 0-3 literal, above that exponential ranges."""
    if code < 4:
        return code + 1
    extra = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra
    return offset + br.bits(extra) + 1


def _div_round_up(a: int, b: int) -> int:
    return -(-a // b)


def _read_entropy_image(br: _Bits, w: int, h: int) -> np.ndarray:
    """A non-level-0 ARGB sub-image (transform data / meta codes)."""
    return _decode_image_data(br, w, h, is_level0=False)


def _decode_image_data(br: _Bits, w: int, h: int,
                       is_level0: bool) -> np.ndarray:
    """Core entropy-coded ARGB image decode → uint32 array (h, w) of
    packed 0xAARRGGBB. Raises ValueError on malformed input and
    NotImplementedError on the palette transform."""
    transforms = []
    if is_level0:
        while br.bit():
            ttype = br.bits(2)
            if ttype == 3:                          # color indexing
                n_colors = br.bits(8) + 1
                pal_img = _read_entropy_image(br, n_colors, 1)[0]
                # palette entries are component-wise delta-coded
                pal = np.zeros(n_colors, dtype=np.uint32)
                acc = [0, 0, 0, 0]
                for i in range(n_colors):
                    v = int(pal_img[i])
                    for c, shift in enumerate((24, 16, 8, 0)):
                        acc[c] = (acc[c] + ((v >> shift) & 0xFF)) & 0xFF
                    pal[i] = ((acc[0] << 24) | (acc[1] << 16)
                              | (acc[2] << 8) | acc[3])
                width_bits = (3 if n_colors <= 2 else 2 if n_colors <= 4
                              else 1 if n_colors <= 16 else 0)
                transforms.append(("palette", width_bits, pal, w))
                # everything downstream decodes at the packed width
                w = _div_round_up(w, 1 << width_bits)
                continue
            if ttype == 2:                          # subtract green
                transforms.append(("sub_green",))
                continue
            size_bits = br.bits(3) + 2
            bw = _div_round_up(w, 1 << size_bits)
            bh = _div_round_up(h, 1 << size_bits)
            sub = _read_entropy_image(br, bw, bh)
            transforms.append(
                ("predictor" if ttype == 0 else "color", size_bits, sub)
            )

    cache_bits = br.bits(4) if br.bit() else 0
    cache_size = (1 << cache_bits) if cache_bits else 0
    cache = [0] * cache_size

    meta = None
    meta_bits = 0
    n_groups = 1
    if is_level0 and br.bit():                      # meta prefix codes
        meta_bits = br.bits(3) + 2
        mw = _div_round_up(w, 1 << meta_bits)
        mh = _div_round_up(h, 1 << meta_bits)
        meta = _read_entropy_image(br, mw, mh)
        idx = ((meta >> 8) & 0xFFFF).astype(np.int64)
        meta = idx
        n_groups = int(idx.max()) + 1

    groups = []
    for _ in range(n_groups):
        groups.append((
            _read_code(br, 256 + 24 + cache_size),
            _read_code(br, 256),
            _read_code(br, 256),
            _read_code(br, 256),
            _read_code(br, 40),
        ))

    out = np.zeros(w * h, dtype=np.uint32)
    pos = 0
    n = w * h

    def insert(px: int) -> None:
        if cache_size:
            cache[(0x1E35A7BD * px & 0xFFFFFFFF) >> (32 - cache_bits)] = px

    while pos < n:
        if meta is not None:
            y, x = divmod(pos, w)
            g = groups[int(meta[y >> meta_bits, x >> meta_bits])]
        else:
            g = groups[0]
        s = g[0].read(br)
        if s < 256:
            red = g[1].read(br)
            blue = g[2].read(br)
            alpha = g[3].read(br)
            px = (alpha << 24) | (red << 16) | (s << 8) | blue
            out[pos] = px
            insert(px)
            pos += 1
        elif s < 256 + 24:
            length = _prefix_value(s - 256, br)
            dist_code = _prefix_value(g[4].read(br), br)
            if dist_code <= 120:
                dx, dy = _DIST_MAP[dist_code - 1]
                dist = dy * w + dx
                if dist < 1:
                    dist = 1
            else:
                dist = dist_code - 120
            if dist > pos or pos + length > n:
                raise ValueError("bad backward reference")
            for _ in range(length):
                px = int(out[pos - dist])
                out[pos] = px
                insert(px)
                pos += 1
        else:
            if not cache_size:
                raise ValueError("cache symbol without cache")
            px = cache[s - 256 - 24]
            out[pos] = px
            insert(px)
            pos += 1

    argb = out.reshape(h, w)
    for t in reversed(transforms):
        argb = _apply_inverse_transform(argb, t)
    return argb


def _apply_inverse_transform(argb: np.ndarray, t: tuple) -> np.ndarray:
    # widths derive from the CURRENT array: a palette transform packs
    # the width for everything read after it, and inverses run in
    # reverse-read order, so each stage sees its own geometry.
    h, w = argb.shape
    if t[0] == "palette":
        width_bits, pal, orig_w = t[1], t[2], t[3]
        bpp = 8 >> width_bits
        g = ((argb >> 8) & 0xFF).astype(np.int64)
        out = np.zeros((h, orig_w), dtype=np.uint32)
        mask = (1 << width_bits) - 1
        for x in range(orig_w):
            packed = g[:, x >> width_bits]
            idx = (packed >> ((x & mask) * bpp)) & ((1 << bpp) - 1)
            out[:, x] = pal[np.clip(idx, 0, len(pal) - 1)]
        return out
    a = (argb >> 24) & 0xFF
    r = (argb >> 16) & 0xFF
    g = (argb >> 8) & 0xFF
    b = argb & 0xFF
    if t[0] == "sub_green":
        r = (r + g) & 0xFF
        b = (b + g) & 0xFF
        return (a << 24) | (r << 16) | (g << 8) | b
    if t[0] == "color":
        # cx fields (spec): bits 0-7 green_to_red, 8-15 green_to_blue,
        # 16-23 red_to_blue; ColorTransformDelta(t, c) = (int8(t) *
        # int8(c)) >> 5 — BOTH operands signed, shift arithmetic
        # (Python >> on negative ints floors, matching C >> on the
        # sign-extended int).
        bits, sub = t[1], t[2]

        def s8(v: int) -> int:
            return v - 256 if v > 127 else v

        out = np.zeros_like(argb)
        for y in range(h):
            for x in range(w):
                cx = int(sub[y >> bits, x >> bits])
                g2r = s8(cx & 0xFF)
                g2b = s8((cx >> 8) & 0xFF)
                r2b = s8((cx >> 16) & 0xFF)
                gg = int(g[y, x])
                rr = (int(r[y, x]) + ((g2r * s8(gg)) >> 5)) & 0xFF
                bb = (int(b[y, x]) + ((g2b * s8(gg)) >> 5)
                      + ((r2b * s8(rr)) >> 5)) & 0xFF
                out[y, x] = ((int(a[y, x]) << 24) | (rr << 16)
                             | (gg << 8) | bb)
        return out
    # predictor transform
    bits, sub = t[1], t[2]
    modes = ((sub >> 8) & 0xFF).astype(np.int64)
    px = np.zeros((h, w, 4), dtype=np.int64)        # a, r, g, b
    cur = np.stack([a, r, g, b], axis=-1).astype(np.int64)

    def avg2(p, q):
        return (p + q) >> 1

    for y in range(h):
        for x in range(w):
            if x == 0 and y == 0:
                pred = np.array([0xFF, 0, 0, 0])
            elif y == 0:
                pred = px[0, x - 1]
            elif x == 0:
                pred = px[y - 1, 0]
            else:
                L = px[y, x - 1]
                T = px[y - 1, x]
                TL = px[y - 1, x - 1]
                # TR at the right edge: rows are contiguous in the
                # reference decoder, so (y-1, w) aliases (y, 0) — the
                # already-decoded first pixel of the current row.
                TR = px[y - 1, x + 1] if x + 1 < w else px[y, 0]
                m = int(modes[y >> bits, x >> bits])
                if m == 0:
                    pred = np.array([0xFF, 0, 0, 0])
                elif m == 1:
                    pred = L
                elif m == 2:
                    pred = T
                elif m == 3:
                    pred = TR
                elif m == 4:
                    pred = TL
                elif m == 5:
                    pred = avg2(avg2(L, TR), T)
                elif m == 6:
                    pred = avg2(L, TL)
                elif m == 7:
                    pred = avg2(L, T)
                elif m == 8:
                    pred = avg2(TL, T)
                elif m == 9:
                    pred = avg2(T, TR)
                elif m == 10:
                    pred = avg2(avg2(L, TL), avg2(T, TR))
                elif m == 11:
                    # Select: pL = how well T-TL predicts L's channels
                    pL = int(np.abs(T - TL).sum())
                    pT = int(np.abs(L - TL).sum())
                    pred = L if pL < pT else T
                elif m == 12:                       # ClampAddSubtractFull
                    pred = np.clip(L + T - TL, 0, 255)
                else:
                    # ClampAddSubtractHalf: C integer division
                    # truncates toward zero, numpy // floors — match C
                    ave = avg2(L, T)
                    d = ave - TL
                    half = np.where(d >= 0, d // 2, -((-d) // 2))
                    pred = np.clip(ave + half, 0, 255)
            px[y, x] = (cur[y, x] + pred) & 0xFF
    return ((px[:, :, 0] << 24) | (px[:, :, 1] << 16)
            | (px[:, :, 2] << 8) | px[:, :, 3]).astype(np.uint32)


def decode_vp8l(payload: bytes) -> Optional[np.ndarray]:
    """RIFF/WEBP/VP8L container → float grayscale array, or None for
    non-VP8L (lossy VP8 needs a full arithmetic decoder — out of
    scope)."""
    if (len(payload) < 30 or payload[:4] != b"RIFF"
            or payload[8:12] != b"WEBP" or payload[12:16] != b"VP8L"):
        return None
    if payload[20] != 0x2F:
        return None
    try:
        br = _Bits(payload[21:])
        w = br.bits(14) + 1
        h = br.bits(14) + 1
        br.bit()                                    # alpha hint
        if br.bits(3) != 0:
            return None                             # unknown version
        argb = _decode_image_data(br, w, h, is_level0=True)
    except (NotImplementedError, ValueError, IndexError):
        return None
    r = ((argb >> 16) & 0xFF).astype(np.float64)
    g = ((argb >> 8) & 0xFF).astype(np.float64)
    b = (argb & 0xFF).astype(np.float64)
    return 0.299 * r + 0.587 * g + 0.114 * b
