"""Minimal VP8 keyframe (lossy WebP) writer used by test_multimodal to
pin the real decoder — the same role tests/vp8l_encoder.py plays for
the lossless path. It SHARES the decoder module's constant tables and
reconstruction kernels (predict/iDCT/iWHT/dequant), so a decode of its
output must be BIT-EXACT equal to the encoder's own reconstruction:
that pins the boolean arithmetic coder, the token machinery, contexts,
and the header parse end-to-end. Streams are emitted with
filter_level=0, so the skipped loop filter is spec-correctly a no-op.
"""

import numpy as np

from website_to_agent_spark.operators import vp8


# ------------------------------------------------------- bool encoder
class BoolEnc:
    """Mirror of the §7 decoder (libvpx boolhuff algorithm), with
    C-uint32 semantics made explicit."""

    def __init__(self):
        self.low = 0
        self.range = 255
        self.count = -24
        self.buf = bytearray()

    def put(self, bit, prob):
        split = 1 + (((self.range - 1) * prob) >> 8)
        if bit:
            self.low = (self.low + split) & 0xFFFFFFFF
            self.range -= split
        else:
            self.range = split
        shift = 8 - self.range.bit_length() if self.range < 128 else 0
        self.range <<= shift
        self.count += shift
        if self.count >= 0:
            offset = shift - self.count
            if (self.low << (offset - 1)) & 0x80000000:
                x = len(self.buf) - 1
                while x >= 0 and self.buf[x] == 0xFF:
                    self.buf[x] = 0
                    x -= 1
                assert x >= 0, "carry out of leading byte"
                self.buf[x] += 1
            self.buf.append((self.low >> (24 - offset)) & 0xFF)
            self.low = (self.low << offset) & 0xFFFFFF
            shift = self.count
            self.count -= 8
        self.low = (self.low << shift) & 0xFFFFFFFF

    def literal(self, v, n):
        for i in reversed(range(n)):
            self.put((v >> i) & 1, 128)

    def flagged_signed_zero(self):
        self.put(0, 128)

    def flagged_signed(self, v, n):
        """Mirror of BoolDec.flagged_signed: presence flag, then
        n-bit magnitude, then sign bit."""
        if v == 0:
            self.put(0, 128)
            return
        self.put(1, 128)
        self.literal(abs(v), n)
        self.put(1 if v < 0 else 0, 128)

    def stop(self):
        for _ in range(32):
            self.put(0, 128)
        return bytes(self.buf)


def _tree_paths(tree):
    """leaf value → [(prob_index, bit), ...] mirroring BoolDec.tree."""
    paths = {}

    def walk(i, acc):
        for b in (0, 1):
            j = tree[i + b]
            step = acc + [(i >> 1, b)]
            if j <= 0:
                paths[-j] = step
            else:
                walk(j, step)

    walk(0, [])
    return paths


_COEF_PATHS = _tree_paths(vp8.COEF_TREE)
_YMODE_PATHS = _tree_paths(vp8.KF_YMODE_TREE)
_UV_PATHS = _tree_paths(vp8.UV_MODE_TREE)
_BMODE_PATHS = _tree_paths(vp8.BMODE_TREE)


def _put_tree(enc, paths, probs, leaf, skip_first=False):
    path = paths[leaf]
    if skip_first:
        path = path[1:]
    for pi, bit in path:
        enc.put(bit, int(probs[pi]))


# -------------------------------------- forward transforms (numeric
# inverses of the decoder's integer iDCT/iWHT — any consistent forward
# works: the encoder reconstructs via the SHARED inverse kernels)
def _inverse_matrix(kernel):
    m = np.empty((16, 16))
    for k in range(16):
        e = np.zeros(16)
        e[k] = 4096
        m[:, k] = np.asarray(kernel(e), dtype=np.float64).reshape(16) / 4096
    return np.linalg.inv(m)


_FDCT = _inverse_matrix(vp8.idct4x4)
_FWHT = _inverse_matrix(vp8.iwht4x4)


def _quant(vec, dcq, acq):
    q = np.empty(16, dtype=np.int64)
    q[0] = int(round(vec[0] / dcq))
    q[1:] = np.round(vec[1:] / acq)
    return np.clip(q, -2114, 2114)   # CAT6 ceiling


def _dequant(q, dcq, acq):
    out = q.copy()
    out[0] *= dcq
    out[1:] *= acq
    return out


# ----------------------------------------------------- token emission
def _encode_block_tokens(enc, probs, btype, first, ctx, coeffs):
    """Mirror of vp8.decode_block_tokens. ``coeffs`` natural order."""
    zz = [int(coeffs[vp8.ZIGZAG[i]]) for i in range(16)]
    nz_idx = [i for i in range(first, 16) if zz[i] != 0]
    c = first
    skip_eob = False
    if not nz_idx:
        p = probs[btype][vp8.COEF_BANDS[c]][ctx]
        _put_tree(enc, _COEF_PATHS, p, vp8.EOB_TOKEN)
        return 0
    last = nz_idx[-1]
    while c <= last:
        v = zz[c]
        p = probs[btype][vp8.COEF_BANDS[c]][ctx]
        if v == 0:
            _put_tree(enc, _COEF_PATHS, p, vp8.ZERO_TOKEN,
                      skip_first=skip_eob)
            skip_eob = True
            ctx = 0
        else:
            a = abs(v)
            if a <= 4:
                tok = a            # ONE..FOUR tokens equal magnitude
                _put_tree(enc, _COEF_PATHS, p, tok, skip_first=skip_eob)
            else:
                cat = next(i for i in reversed(range(6))
                           if a >= vp8.CAT_BASE[i])
                _put_tree(enc, _COEF_PATHS, p, vp8.CAT1 + cat,
                          skip_first=skip_eob)
                extra = a - vp8.CAT_BASE[cat]
                bits = vp8.CAT_PROBS[cat]
                for i, pb in enumerate(bits):
                    enc.put((extra >> (len(bits) - 1 - i)) & 1, pb)
            enc.put(1 if v < 0 else 0, 128)
            skip_eob = False
            ctx = 1 if a == 1 else 2
        c += 1
    if c < 16:
        p = probs[btype][vp8.COEF_BANDS[c]][ctx]
        _put_tree(enc, _COEF_PATHS, p, vp8.EOB_TOKEN)
    return 1


# ------------------------------------------------------- the encoder
def encode_vp8(gray, y_ac_qi=4, force_bpred=None, n_parts_log2=0,
               skip_enabled=True, filter_level=0, sharpness=0,
               filter_type=0, lf_ref_delta=0, lf_mode_delta=0):
    """Encode a grayscale image (uint8 HxW) as a lossy-WebP keyframe
    (Y = pixels, U = V = flat 128). Returns (webp_bytes, recon) where
    ``recon`` is the encoder's own reconstruction — the decoder MUST
    reproduce it bit-exactly.

    ``force_bpred(mby, mbx) -> bool`` routes chosen macroblocks through
    B_PRED with per-subblock SSE-chosen sub-modes; other MBs pick the
    best 16×16 mode. Quality: y_ac_qi=4 → quant steps 8/4-ish, near
    lossless for smooth content.

    ``recon`` is always the PRE-loop-filter reconstruction;
    ``filter_level``/``sharpness``/``filter_type``/``lf_*_delta``
    only change the emitted header, so test_vp8_loopfilter can pin
    the decoder's §15 post-pass against an independent scalar
    mirror applied to this same recon."""
    src = np.asarray(gray, dtype=np.int64)
    h, w = src.shape
    mb_w, mb_h = (w + 15) // 16, (h + 15) // 16
    pad = np.full((mb_h * 16, mb_w * 16), 128, dtype=np.int64)
    pad[:h, :w] = src
    # edge-replicate padding (keeps prediction residuals small)
    if h < mb_h * 16:
        pad[h:, :w] = src[-1, :]
    if w < mb_w * 16:
        pad[:h, w:] = src[:, -1].reshape(-1, 1)
    if h < mb_h * 16 and w < mb_w * 16:
        pad[h:, w:] = src[-1, -1]

    quant = {"y_ac_qi": y_ac_qi, "y_dc_delta": 0, "y2_dc_delta": 0,
             "y2_ac_delta": 0, "uv_dc_delta": 0, "uv_ac_delta": 0}
    dq = vp8.dequant_factors(quant)
    probs = vp8.DEFAULT_COEFF_PROBS
    prob_skip_false = 128

    Y = vp8._BorderPlane(mb_h * 16, mb_w * 16)
    U = vp8._BorderPlane(mb_h * 8, mb_w * 8)
    V = vp8._BorderPlane(mb_h * 8, mb_w * 8)

    n_parts = 1 << n_parts_log2
    head = BoolEnc()
    tparts = [BoolEnc() for _ in range(n_parts)]

    # ---------------- frame header (mirrors vp8.decode_frame's reads)
    head.literal(0, 1)                     # color space
    head.literal(0, 1)                     # clamping
    head.literal(0, 1)                     # segmentation disabled
    head.literal(filter_type, 1)
    head.literal(filter_level, 6)
    head.literal(sharpness, 3)
    if lf_ref_delta or lf_mode_delta:
        head.literal(1, 1)                 # lf delta enabled
        head.literal(1, 1)                 # lf delta update
        head.flagged_signed(lf_ref_delta, 6)    # INTRA_FRAME
        for _ in range(3):
            head.flagged_signed_zero()          # LAST/GF/ARF
        head.flagged_signed(lf_mode_delta, 6)   # B_PRED
        for _ in range(3):
            head.flagged_signed_zero()          # ZEROMV/MV/SPLITMV
    else:
        head.literal(0, 1)                 # lf delta disabled
    head.literal(n_parts_log2, 2)
    head.literal(y_ac_qi, 7)
    for _ in range(5):
        head.flagged_signed_zero()         # the five quant deltas
    head.literal(1, 1)                     # refresh entropy probs
    for i in range(4):                     # no coeff prob updates
        for j in range(8):
            for k in range(3):
                for m in range(11):
                    head.put(0, int(vp8.COEFF_UPDATE_PROBS[i][j][k][m]))
    head.literal(1 if skip_enabled else 0, 1)
    if skip_enabled:
        head.literal(prob_skip_false, 8)

    above_nz = np.zeros((mb_w, 9), dtype=np.int64)
    bmode_above = np.full((mb_w, 4), vp8.B_DC_PRED, dtype=np.int64)

    def quantize_block(res, dcq, acq, first):
        coef = _FDCT @ res.reshape(16).astype(np.float64)
        q = _quant(coef, dcq, acq)
        if first == 1:
            q[0] = 0
        return q

    for mby in range(mb_h):
        left_nz = np.zeros(9, dtype=np.int64)
        bmode_left = np.full(4, vp8.B_DC_PRED, dtype=np.int64)
        td = tparts[mby % n_parts]
        for mbx in range(mb_w):
            y0, x0 = mby * 16, mbx * 16
            s16 = pad[y0:y0 + 16, x0:x0 + 16]
            use_b = bool(force_bpred and force_bpred(mby, mbx))

            if not use_b:
                best, ymode = None, vp8.DC_PRED
                for m in (vp8.DC_PRED, vp8.V_PRED, vp8.H_PRED,
                          vp8.TM_PRED):
                    p = vp8.predict_16_or_8(Y.a, y0 + 1, x0 + 1, 16, m)
                    sse = int(((s16 - p) ** 2).sum())
                    if best is None or sse < best:
                        best, ymode = sse, m
                sub = np.full((4, 4), vp8.MODE_TO_BMODE[ymode],
                              dtype=np.int64)
            else:
                ymode = vp8.B_PRED
                sub = np.empty((4, 4), dtype=np.int64)

            # ---------- luma: quantize + reconstruct via shared kernels
            qy = np.zeros((16, 16), dtype=np.int64)
            recon16 = np.empty((16, 16), dtype=np.int64)
            if ymode == vp8.B_PRED:
                for b in range(16):
                    r, c = b // 4, b % 4
                    by, bx = y0 + 4 * r, x0 + 4 * c
                    if c == 3:
                        ar = Y.a[y0, x0 + 17:x0 + 21].copy()
                    else:
                        ar = Y.a[by, bx + 5:bx + 9].copy()
                    s4 = pad[by:by + 4, bx:bx + 4]
                    bestq = None
                    for m in range(10):
                        p = vp8.predict_b(Y.a, by + 1, bx + 1, m, ar)
                        q = quantize_block(s4 - p, dq["y1dc"],
                                           dq["y1ac"], 0)
                        rec = vp8._clip255(
                            p + vp8.idct4x4(_dequant(q, dq["y1dc"],
                                                     dq["y1ac"])))
                        sse = int(((s4 - rec) ** 2).sum())
                        if bestq is None or sse < bestq[0]:
                            bestq = (sse, m, q, rec)
                    _, m, q, rec = bestq
                    sub[r, c] = m
                    qy[b] = q
                    Y.put(by, bx, rec)   # next subblocks predict from it
                    recon16[4 * r:4 * r + 4, 4 * c:4 * c + 4] = rec
                qy2 = np.zeros(16, dtype=np.int64)
            else:
                pred = vp8.predict_16_or_8(Y.a, y0 + 1, x0 + 1, 16, ymode)
                res = s16 - pred
                dcs = np.empty(16, dtype=np.float64)
                coefs = []
                for b in range(16):
                    r, c = b // 4, b % 4
                    v = _FDCT @ res[4 * r:4 * r + 4,
                                    4 * c:4 * c + 4].reshape(16)
                    coefs.append(v)
                    dcs[b] = v[0]
                y2coef = _FWHT @ dcs
                qy2 = _quant(y2coef, dq["y2dc"], dq["y2ac"])
                y2dcs = vp8.iwht4x4(_dequant(qy2, dq["y2dc"], dq["y2ac"]))
                blk = pred.copy()
                for b in range(16):
                    r, c = b // 4, b % 4
                    q = _quant(coefs[b], 1, dq["y1ac"])
                    q[0] = 0
                    qy[b] = q
                    dqv = _dequant(q, dq["y1dc"], dq["y1ac"])
                    dqv[0] = y2dcs[b]
                    blk[4 * r:4 * r + 4, 4 * c:4 * c + 4] += (
                        vp8.idct4x4(dqv))
                recon16 = vp8._clip255(blk)
                Y.put(y0, x0, recon16)

            # ---------- chroma (flat 128 source)
            cy, cx = mby * 8, mbx * 8
            uvmode = vp8.DC_PRED
            qu = np.zeros((4, 16), dtype=np.int64)
            qv = np.zeros((4, 16), dtype=np.int64)
            for plane, qstore in ((U, qu), (V, qv)):
                pred = vp8.predict_16_or_8(plane.a, cy + 1, cx + 1, 8,
                                           uvmode)
                blk = pred.copy()
                for b in range(4):
                    r, c = b // 2, b % 2
                    s4 = np.full((4, 4), 128, dtype=np.int64)
                    q = quantize_block(
                        s4 - pred[4 * r:4 * r + 4, 4 * c:4 * c + 4],
                        dq["uvdc"], dq["uvac"], 0)
                    qstore[b] = q
                    blk[4 * r:4 * r + 4, 4 * c:4 * c + 4] += vp8.idct4x4(
                        _dequant(q, dq["uvdc"], dq["uvac"]))
                plane.put(cy, cx, vp8._clip255(blk))

            has_y2 = ymode != vp8.B_PRED
            all_zero = (not qy.any() and not qu.any() and not qv.any()
                        and (not has_y2 or not qy2.any()))
            skip = 1 if (skip_enabled and all_zero) else 0

            # ---------- mode bits (partition 1)
            if skip_enabled:
                head.put(skip, prob_skip_false)
            _put_tree(head, _YMODE_PATHS, vp8.KF_YMODE_PROB, ymode)
            if ymode == vp8.B_PRED:
                for r in range(4):
                    for c in range(4):
                        a = (bmode_above[mbx, c] if r == 0
                             else sub[r - 1, c])
                        lft = (bmode_left[r] if c == 0 else sub[r, c - 1])
                        _put_tree(head, _BMODE_PATHS,
                                  vp8.KF_BMODE_PROB[a][lft],
                                  int(sub[r, c]))
            bmode_above[mbx] = sub[3]
            bmode_left[:] = sub[:, 3]
            _put_tree(head, _UV_PATHS, vp8.KF_UV_MODE_PROB, uvmode)

            # ---------- tokens (row's partition), mirroring contexts
            if skip:
                above_nz[mbx, :8] = 0
                left_nz[:8] = 0
                if has_y2:
                    above_nz[mbx, 8] = 0
                    left_nz[8] = 0
            else:
                if has_y2:
                    ctx = int(above_nz[mbx, 8] + left_nz[8])
                    nz = _encode_block_tokens(td, probs, 1, 0, ctx, qy2)
                    above_nz[mbx, 8] = nz
                    left_nz[8] = nz
                btype = 0 if has_y2 else 3
                first = 1 if has_y2 else 0
                for b in range(16):
                    r, c = b // 4, b % 4
                    ctx = int(above_nz[mbx, c] + left_nz[r])
                    nz = _encode_block_tokens(td, probs, btype, first,
                                              ctx, qy[b])
                    above_nz[mbx, c] = nz
                    left_nz[r] = nz
                for qstore, base in ((qu, 4), (qv, 6)):
                    for b in range(4):
                        r, c = b // 2, b % 2
                        ctx = int(above_nz[mbx, base + c]
                                  + left_nz[base + r])
                        nz = _encode_block_tokens(td, probs, 2, 0, ctx,
                                                  qstore[b])
                        above_nz[mbx, base + c] = nz
                        left_nz[base + r] = nz

    # ------------------------------------------------------- assemble
    p1 = head.stop()
    parts = [t.stop() for t in tparts]
    tag = (0) | (0 << 1) | (1 << 4) | (len(p1) << 5)
    frame = bytearray()
    frame += bytes((tag & 0xFF, (tag >> 8) & 0xFF, (tag >> 16) & 0xFF))
    frame += b"\x9d\x01\x2a"
    frame += bytes((w & 0xFF, (w >> 8) & 0x3F))
    frame += bytes((h & 0xFF, (h >> 8) & 0x3F))
    frame += p1
    for pt in parts[:-1]:
        frame += bytes((len(pt) & 0xFF, (len(pt) >> 8) & 0xFF,
                        (len(pt) >> 16) & 0xFF))
    for pt in parts:
        frame += pt

    chunk = b"VP8 " + len(frame).to_bytes(4, "little") + bytes(frame)
    if len(frame) & 1:
        chunk += b"\x00"
    riff = b"RIFF" + (4 + len(chunk)).to_bytes(4, "little") + b"WEBP" + chunk
    recon = Y.pixels(h, w).astype(np.uint8)
    return bytes(riff), recon
