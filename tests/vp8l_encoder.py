"""Minimal VP8L (WebP-lossless) writer used by test_multimodal to
pin the real decoder: literal/simple/LZ77/color-cache token paths
plus single-mode PREDICTOR and COLOR transform streams (constant
sub-images encode as zero-bit single-symbol codes)."""
import numpy as np


class BW:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, v, nbits):
        self.acc |= (v & ((1 << nbits) - 1)) << self.n
        self.n += nbits
        while self.n >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.n -= 8

    def flush(self):
        if self.n:
            self.out.append(self.acc & 0xFF)
            self.acc = self.n = 0


def canonical(lengths):
    """{sym: (code, len)} matching the decoder's canonical build."""
    present = sorted((l, s) for s, l in enumerate(lengths) if l > 0)
    enc = {}
    code = 0
    prev = present[0][0] if present else 0
    for l, s in present:
        code <<= (l - prev)
        enc[s] = (code, l)
        code += 1
        prev = l
    return enc


def fixed_lengths(symbols, alphabet):
    """All used symbols at one length L (2^L > n)."""
    syms = sorted(set(symbols))
    L = max(1, len(syms).bit_length())
    if (1 << L) <= len(syms):
        L += 1
    lengths = [0] * alphabet
    for s in syms:
        lengths[s] = L
    return lengths


def put_code(bw, code, l):
    for i in range(l - 1, -1, -1):
        bw.put((code >> i) & 1, 1)


def write_full_code(bw, lengths):
    """Non-simple prefix code via the code-length code (no repeats,
    emit every symbol's length individually)."""
    bw.put(0, 1)                      # not simple
    used_cls = sorted(set(lengths))   # includes 0 maybe
    cl_lengths = [0] * 19
    if len(used_cls) == 1:
        # single CL symbol — decoder's CL _Code is 0-bit single
        cl_lengths[used_cls[0]] = 1
    else:
        L = max(1, len(used_cls).bit_length())
        if (1 << L) <= len(used_cls):
            L += 1
        for c in used_cls:
            cl_lengths[c] = L
    bw.put(15, 4)                     # num_cl = 19
    CL_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 16,
                6, 7, 8, 9, 10, 11, 12, 13, 14, 15)
    for i in range(19):
        bw.put(cl_lengths[CL_ORDER[i]], 3)
    cl_enc = canonical(cl_lengths)
    bw.put(0, 1)                      # no max_symbol bound
    for l in lengths:
        if len(cl_enc) == 1:
            continue                  # 0-bit CL code: nothing to emit
        code, cl = cl_enc[l]
        put_code(bw, code, cl)


def write_simple_code(bw, syms):
    bw.put(1, 1)
    if len(syms) == 1:
        bw.put(0, 1)                  # num_symbols - 1
        s = syms[0]
        if s < 2:
            bw.put(0, 1)              # 1-bit first symbol
            bw.put(s, 1)
        else:
            bw.put(1, 1)
            bw.put(s, 8)
    else:
        bw.put(1, 1)
        s0, s1 = syms
        if s0 < 2:
            bw.put(0, 1)
            bw.put(s0, 1)
        else:
            bw.put(1, 1)
            bw.put(s0, 8)
        bw.put(s1, 8)


def len_to_prefix(v):
    """value → (code, extra_bits, n_extra) inverting _prefix_value."""
    if v <= 4:
        return v - 1, 0, 0
    v -= 1
    extra = v.bit_length() - 2
    rem = v - (1 << (extra + 1))
    hi = rem >> extra          # 0 or 1
    code = 2 + 2 * extra + hi
    return code, rem - (hi << extra), extra


def encode_vp8l(rgb, mode="full", lz77_rows=False, cache_bits=0,
                sub_green=False):
    """rgb: (h, w, 3) uint8. mode: 'full' | 'simple' (simple requires
    ≤2 distinct values per channel)."""
    h, w, _ = rgb.shape
    a = np.full((h, w), 255, np.int64)
    r = rgb[:, :, 0].astype(np.int64)
    g = rgb[:, :, 1].astype(np.int64)
    b = rgb[:, :, 2].astype(np.int64)
    if sub_green:
        r = (r - g) & 0xFF
        b = (b - g) & 0xFF

    bw = BW()
    bw.put(w - 1, 14)
    bw.put(h - 1, 14)
    bw.put(0, 1)                      # alpha hint
    bw.put(0, 3)                      # version
    if sub_green:
        bw.put(1, 1)
        bw.put(2, 2)                  # SUBTRACT_GREEN
    bw.put(0, 1)                      # end of transforms
    if cache_bits:
        bw.put(1, 1)
        bw.put(cache_bits, 4)
    else:
        bw.put(0, 1)
    bw.put(0, 1)                      # no meta prefix image

    cache_size = (1 << cache_bits) if cache_bits else 0
    cache = [None] * cache_size if cache_size else []

    # token stream: ('lit', g, r, b, a) | ('copy', len, dist) | ('cache', i)
    tokens = []
    pos = 0
    n = w * h
    flat = [(int(a.flat[i]), int(r.flat[i]), int(g.flat[i]), int(b.flat[i]))
            for i in range(n)]

    def argb(i):
        aa, rr, gg, bb = flat[i]
        return (aa << 24) | (rr << 16) | (gg << 8) | bb

    while pos < n:
        y, x = divmod(pos, w)
        if lz77_rows and y > 0 and x == 0 and flat[pos:pos + w] == flat[pos - w:pos]:
            tokens.append(("copy", w, w))
            for i in range(pos, pos + w):
                if cache_size:
                    cache[(0x1E35A7BD * argb(i) & 0xFFFFFFFF)
                          >> (32 - cache_bits)] = argb(i)
            pos += w
            continue
        px = argb(pos)
        if cache_size:
            idx = (0x1E35A7BD * px & 0xFFFFFFFF) >> (32 - cache_bits)
            if cache[idx] == px:
                tokens.append(("cache", idx))
                pos += 1
                continue
            cache[idx] = px
        tokens.append(("lit",) + flat[pos])
        pos += 1

    # gather alphabets
    greens, reds, blues, alphas, dists = [], [], [], [], []
    for t in tokens:
        if t[0] == "lit":
            aa, rr, gg, bb = t[1], t[2], t[3], t[4]
            greens.append(gg)
            reds.append(rr)
            blues.append(bb)
            alphas.append(aa)
        elif t[0] == "copy":
            code, _, _ = len_to_prefix(t[1])
            greens.append(256 + code)
            dcode, _, _ = len_to_prefix(t[2] + 120)
            dists.append(dcode)
        else:
            greens.append(256 + 24 + t[1])

    g_alpha = 256 + 24 + cache_size
    if mode == "simple":
        g_len = fixed_lengths(greens, g_alpha)
        write_simple = True
    codes = {}
    for name, vals, alpha_size in (
        ("g", greens, g_alpha), ("r", reds, 256), ("b", blues, 256),
        ("a", alphas, 256), ("d", dists, 40),
    ):
        if not vals:
            write_simple_code(bw, [0])
            codes[name] = {0: (0, 0)}
            continue
        uniq = sorted(set(vals))
        if mode == "simple" and len(uniq) <= 2:
            write_simple_code(bw, uniq)
            if len(uniq) == 1:
                codes[name] = {uniq[0]: (0, 0)}
            else:
                codes[name] = {uniq[0]: (0, 1), uniq[1]: (1, 1)}
        else:
            lengths = fixed_lengths(vals, alpha_size)
            write_full_code(bw, lengths)
            enc = canonical(lengths)
            if len(enc) == 1:         # single-symbol code reads 0 bits
                enc = {s: (0, 0) for s in enc}
            codes[name] = enc

    def emit(name, sym):
        code, l = codes[name][sym]
        if l:
            put_code(bw, code, l)

    for t in tokens:
        if t[0] == "lit":
            aa, rr, gg, bb = t[1], t[2], t[3], t[4]
            emit("g", gg)
            emit("r", rr)
            emit("b", bb)
            emit("a", aa)
        elif t[0] == "copy":
            code, extra, n_extra = len_to_prefix(t[1])
            emit("g", 256 + code)
            if n_extra:
                bw.put(extra, n_extra)
            dcode, dextra, dn = len_to_prefix(t[2] + 120)
            emit("d", dcode)
            if dn:
                bw.put(dextra, dn)
        else:
            emit("g", 256 + 24 + t[1])
    bw.flush()

    payload = b"\x2f" + bytes(bw.out)
    chunk = b"VP8L" + len(payload).to_bytes(4, "little") + payload
    if len(payload) % 2:
        chunk += b"\x00"
    riff = b"RIFF" + (4 + len(chunk)).to_bytes(4, "little") + b"WEBP" + chunk
    return riff


def write_const_subimage(bw, g, r=0, b=0, a=255):
    """Entropy-coded non-level-0 sub-image whose every pixel is the
    same ARGB — all five codes are single-symbol, so the pixels
    themselves consume ZERO bits regardless of sub-image size."""
    bw.put(0, 1)                      # no color cache
    write_simple_code(bw, [g])
    write_simple_code(bw, [r])
    write_simple_code(bw, [b])
    write_simple_code(bw, [a])
    write_simple_code(bw, [0])        # distance (unused)


def _s8(v):
    return v - 256 if v > 127 else v


def _predict(px, y, x, w, mode):
    """Forward predictor over reconstructed (= original) pixels,
    mirroring the decoder's neighbor rules."""
    if x == 0 and y == 0:
        return np.array([0xFF, 0, 0, 0])
    if y == 0:
        return px[0, x - 1]
    if x == 0:
        return px[y - 1, 0]
    L, T, TL = px[y, x - 1], px[y - 1, x], px[y - 1, x - 1]
    TR = px[y - 1, x + 1] if x + 1 < w else px[y, 0]
    av = lambda p, q: (p + q) >> 1
    if mode == 0:
        return np.array([0xFF, 0, 0, 0])
    if mode == 1:
        return L
    if mode == 2:
        return T
    if mode == 3:
        return TR
    if mode == 4:
        return TL
    if mode == 5:
        return av(av(L, TR), T)
    if mode == 6:
        return av(L, TL)
    if mode == 7:
        return av(L, T)
    if mode == 8:
        return av(TL, T)
    if mode == 9:
        return av(T, TR)
    if mode == 10:
        return av(av(L, TL), av(T, TR))
    if mode == 11:
        pL = int(np.abs(T - TL).sum())
        pT = int(np.abs(L - TL).sum())
        return L if pL < pT else T
    if mode == 12:
        return np.clip(L + T - TL, 0, 255)
    ave = av(L, T)
    d = ave - TL
    half = np.where(d >= 0, d // 2, -((-d) // 2))
    return np.clip(ave + half, 0, 255)


def encode_vp8l_transformed(rgb, predictor_mode=None, color_deltas=None,
                            size_bits=3):
    """Single-transform VP8L: PREDICTOR (one mode everywhere) or COLOR
    (one delta triple everywhere). Residuals literal-coded."""
    h, w, _ = rgb.shape
    a = np.full((h, w), 255, np.int64)
    r = rgb[:, :, 0].astype(np.int64)
    g = rgb[:, :, 1].astype(np.int64)
    b = rgb[:, :, 2].astype(np.int64)

    bw = BW()
    bw.put(w - 1, 14)
    bw.put(h - 1, 14)
    bw.put(0, 1)
    bw.put(0, 3)
    bw.put(1, 1)                      # a transform follows
    sw = -(-w // (1 << size_bits))
    sh = -(-h // (1 << size_bits))
    if predictor_mode is not None:
        bw.put(0, 2)                  # PREDICTOR
        bw.put(size_bits - 2, 3)
        write_const_subimage(bw, g=predictor_mode)
        orig = np.stack([a, r, g, b], axis=-1)
        res = np.zeros_like(orig)
        for y in range(h):
            for x in range(w):
                pred = _predict(orig, y, x, w, predictor_mode)
                res[y, x] = (orig[y, x] - pred) & 0xFF
        a2, r2, g2, b2 = (res[:, :, i] for i in range(4))
    else:
        g2r, g2b, r2b = color_deltas
        bw.put(1, 2)                  # COLOR
        bw.put(size_bits - 2, 3)
        write_const_subimage(bw, g=g2b & 0xFF, r=r2b & 0xFF, b=g2r & 0xFF)
        r2 = (r - ((_s8(g2r & 0xFF) * np.vectorize(_s8)(g)) >> 5)) & 0xFF
        # decoder adds delta(r2b, RECONSTRUCTED red) == original r
        b2 = (b - ((_s8(g2b & 0xFF) * np.vectorize(_s8)(g)) >> 5)
              - ((_s8(r2b & 0xFF) * np.vectorize(_s8)(r)) >> 5)) & 0xFF
        a2, g2 = a, g
    bw.put(0, 1)                      # end of transforms
    bw.put(0, 1)                      # no cache
    bw.put(0, 1)                      # no meta

    flat = [(int(a2.flat[i]), int(r2.flat[i]),
             int(g2.flat[i]), int(b2.flat[i])) for i in range(w * h)]
    greens = [p[2] for p in flat]
    reds = [p[1] for p in flat]
    blues = [p[3] for p in flat]
    alphas = [p[0] for p in flat]
    codes = {}
    for name, vals, alpha_size in (
        ("g", greens, 280), ("r", reds, 256), ("b", blues, 256),
        ("a", alphas, 256), ("d", [], 40),
    ):
        if not vals:
            write_simple_code(bw, [0])
            codes[name] = {0: (0, 0)}
            continue
        lengths = fixed_lengths(vals, alpha_size)
        write_full_code(bw, lengths)
        enc = canonical(lengths)
        if len(enc) == 1:
            enc = {s: (0, 0) for s in enc}
        codes[name] = enc

    def emit(name, sym):
        code, l = codes[name][sym]
        if l:
            put_code(bw, code, l)

    for aa, rr, gg, bb in flat:
        emit("g", gg)
        emit("r", rr)
        emit("b", bb)
        emit("a", aa)
    bw.flush()
    payload = b"\x2f" + bytes(bw.out)
    chunk = b"VP8L" + len(payload).to_bytes(4, "little") + payload
    if len(payload) % 2:
        chunk += b"\x00"
    return b"RIFF" + (4 + len(chunk)).to_bytes(4, "little") + b"WEBP" + chunk


def _write_codes_and_literals(bw, tuples):
    """5 prefix codes + literal emission for (a, r, g, b) tuples."""
    greens = [t[2] for t in tuples]
    reds = [t[1] for t in tuples]
    blues = [t[3] for t in tuples]
    alphas = [t[0] for t in tuples]
    codes = {}
    for name, vals, alpha_size in (
        ("g", greens, 280), ("r", reds, 256), ("b", blues, 256),
        ("a", alphas, 256), ("d", [], 40),
    ):
        if not vals:
            write_simple_code(bw, [0])
            codes[name] = {0: (0, 0)}
            continue
        lengths = fixed_lengths(vals, alpha_size)
        write_full_code(bw, lengths)
        enc = canonical(lengths)
        if len(enc) == 1:
            enc = {s: (0, 0) for s in enc}
        codes[name] = enc
    for aa, rr, gg, bb in tuples:
        for name, v in (("g", gg), ("r", rr), ("b", bb), ("a", aa)):
            code, l = codes[name][v]
            if l:
                put_code(bw, code, l)


def encode_vp8l_palette(rgb):
    """COLOR_INDEXING stream: delta-coded palette sub-image + indices
    packed into the green channel at the spec's reduced width."""
    h, w, _ = rgb.shape
    colors = sorted({tuple(px) for row in rgb for px in row})
    n = len(colors)
    assert n <= 256
    index = {c: i for i, c in enumerate(colors)}
    width_bits = 3 if n <= 2 else 2 if n <= 4 else 1 if n <= 16 else 0
    ppp = 1 << width_bits                 # pixels per packed byte
    bpp = 8 >> width_bits
    pw = -(-w // ppp)

    bw = BW()
    bw.put(w - 1, 14)
    bw.put(h - 1, 14)
    bw.put(0, 1)
    bw.put(0, 3)
    bw.put(1, 1)                          # transform present
    bw.put(3, 2)                          # COLOR_INDEXING
    bw.put(n - 1, 8)
    # palette sub-image: delta-coded (a, r, g, b) literals
    deltas = []
    prev = (0, 0, 0, 0)
    for c in colors:
        cur = (255, int(c[0]), int(c[1]), int(c[2]))
        deltas.append(tuple((cur[i] - prev[i]) & 0xFF for i in range(4)))
        prev = cur
    bw.put(0, 1)                          # sub-image: no color cache
    _write_codes_and_literals(bw, deltas)
    bw.put(0, 1)                          # end of transforms
    bw.put(0, 1)                          # main image: no cache
    bw.put(0, 1)                          # no meta

    packed = []
    for y in range(h):
        for px in range(pw):
            v = 0
            for k in range(ppp):
                x = px * ppp + k
                if x < w:
                    v |= index[tuple(rgb[y, x])] << (k * bpp)
            packed.append((255, 0, v, 0))
    _write_codes_and_literals(bw, packed)
    bw.flush()
    payload = b"\x2f" + bytes(bw.out)
    chunk = b"VP8L" + len(payload).to_bytes(4, "little") + payload
    if len(payload) % 2:
        chunk += b"\x00"
    return b"RIFF" + (4 + len(chunk)).to_bytes(4, "little") + b"WEBP" + chunk
