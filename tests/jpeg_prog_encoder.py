"""Progressive-JPEG test encoder (T.81 Annex G) — the fixture twin of
``multimodal._decode_jpeg_progressive``, mirroring the spec: spectral
selection bands, successive approximation (DC arithmetic-shift point
transform + 1-bit refinements; AC truncate-toward-zero + G.1.2.3
refinement with EOBRUN accumulation and buffered correction bits).
Quant tables are all-ones so the only loss is FDCT rounding; the
decoder must reproduce the SAME quantized coefficients as the baseline
encoder for the same pixels — a bit-exact cross-check."""

from __future__ import annotations

import numpy as np

from website_to_agent_spark.operators.multimodal import _DCT_A, _ZZ


def _tables(symbols):
    syms = sorted(set(symbols)) or [0]
    L = max(2, len(syms).bit_length())
    counts = [0] * 16
    counts[L - 1] = len(syms)
    enc = {s: (i, L) for i, s in enumerate(syms)}
    return bytes(counts), bytes(syms), enc


class _BW:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code, length):
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)
                self.acc = self.n = 0

    def align(self):
        while self.n:
            self.put(1, 1)


def _mag(v):
    s = abs(int(v)).bit_length()
    return s, (v if v >= 0 else v + (1 << s) - 1)


def _plane_coefs(p, nbx, nby):
    """Edge-padded plane → (nby*nbx, 64) zigzag integer coefficients
    (quant = all ones)."""
    out = np.zeros((nby * nbx, 64), dtype=np.int64)
    for by in range(nby):
        for bx in range(nbx):
            blk = p[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8] - 128.0
            coef = np.rint(_DCT_A.T @ blk @ _DCT_A).astype(np.int64)
            out[by * nbx + bx] = coef.flatten()[_ZZ]
    return out


def _flush_eob(tokens, eobrun, eob_bits):
    if eobrun == 0:
        return 0, []
    rb = eobrun.bit_length() - 1
    extra = (eobrun - 1) - ((1 << rb) - 1)
    tokens.append(("sym", rb << 4))
    if rb:
        tokens.append(("bits", extra, rb))
    for b in eob_bits:
        tokens.append(("bits", b, 1))
    return 0, []


def _segmented(fn, blocks, band, al, restart, max_eobrun=10):
    """Split blocks into restart intervals; each segment's tokens are
    generated with fresh EOBRUN state (RSTn resets it, per spec)."""
    if not restart:
        return [fn(blocks, band, al, max_eobrun)]
    return [
        fn(blocks[i:i + restart], band, al, max_eobrun)
        for i in range(0, len(blocks), restart)
    ]


def _ac_first_tokens(blocks, band, al, max_eobrun=10):
    """AC first-pass tokens for one component: values coef//2^al
    (toward zero), ZRL, accumulated EOBRUN."""
    ss, se = band
    tokens: list = []
    eobrun = 0
    for row in blocks:
        vals = [
            (abs(int(row[k])) >> al) * (1 if row[k] >= 0 else -1)
            for k in range(ss, se + 1)
        ]
        if not any(vals):
            eobrun += 1
            if eobrun == max_eobrun:
                eobrun, _ = _flush_eob(tokens, eobrun, [])
            continue
        eobrun, _ = _flush_eob(tokens, eobrun, [])
        run = 0
        last_nz = max(i for i, v in enumerate(vals) if v)
        for i, v in enumerate(vals):
            if i > last_nz:
                break
            if v == 0:
                run += 1
                continue
            while run > 15:
                tokens.append(("sym", 0xF0))
                run -= 16
            s, bits_v = _mag(v)
            tokens.append(("sym", (run << 4) | s))
            tokens.append(("bits", bits_v, s))
            run = 0
        if last_nz < len(vals) - 1:
            eobrun += 1  # tail of zeros → EOB for this block
    _flush_eob(tokens, eobrun, [])
    return tokens


def _ac_refine_tokens(blocks, band, al, max_eobrun=10):
    """G.1.2.3 AC refinement tokens: correction bits buffered behind
    the next symbol; newly-significant coefs emit (run<<4)|1 + sign."""
    ss, se = band
    p1_hist = al + 1
    tokens: list = []
    eobrun = 0
    eob_bits: list = []
    for row in blocks:
        absv = [abs(int(row[k])) >> al for k in range(ss, se + 1)]
        hist = [(abs(int(row[k])) >> p1_hist) != 0 for k in range(ss, se + 1)]
        newly = [i for i, (a, hh) in enumerate(zip(absv, hist))
                 if a == 1 and not hh]
        if not newly:
            eobrun += 1
            eob_bits.extend(a & 1 for a, hh in zip(absv, hist) if hh)
            if eobrun == max_eobrun:
                eobrun, eob_bits = _flush_eob(tokens, eobrun, eob_bits)
            continue
        eobrun, eob_bits = _flush_eob(tokens, eobrun, eob_bits)
        last_new = newly[-1]
        run = 0
        pending: list = []
        for i, (a, hh) in enumerate(zip(absv, hist)):
            if i > last_new:
                break
            if a == 0:
                run += 1
                continue
            # the ZRL check fires at EVERY nonzero arrival (history or
            # new) — flushing pending bits only here keeps the
            # decoder's positional correction-bit walk in sync
            while run > 15:
                tokens.append(("sym", 0xF0))
                for b in pending:
                    tokens.append(("bits", b, 1))
                pending = []
                run -= 16
            if hh:
                pending.append(a & 1)
                continue
            # newly significant (a == 1, no history)
            tokens.append(("sym", (run << 4) | 1))
            k = ss + i
            tokens.append(("bits", 1 if row[k] >= 0 else 0, 1))
            for b in pending:
                tokens.append(("bits", b, 1))
            pending = []
            run = 0
        tail_bits = [a & 1 for a, hh in
                     zip(absv[last_new + 1:], hist[last_new + 1:]) if hh]
        if last_new < len(absv) - 1:
            eobrun += 1
            eob_bits = tail_bits
        else:
            assert not tail_bits
    _flush_eob(tokens, eobrun, eob_bits)
    return tokens


def jpeg_progressive(w, h, pixel_fn, mode="gray", al_dc=1, al_ac=1,
                     bands=((1, 5), (6, 63)), restart=0):
    """Encode pixels as a progressive JPEG: interleaved DC first scan
    at Al=al_dc, DC refinement bits down to 0, then per component ×
    band: AC first at al_ac and refinements down to 0. ``restart``
    (DC scan only) exercises the decoder's segment reset."""
    rgb = np.array(
        [[pixel_fn(x, y) for x in range(w)] for y in range(h)], dtype=float
    )
    Y = rgb @ np.array([0.299, 0.587, 0.114])
    if mode == "gray":
        planes, samp = [Y], [(1, 1)]
    else:
        Cb = rgb @ np.array([-0.168736, -0.331264, 0.5]) + 128.0
        Cr = rgb @ np.array([0.5, -0.418688, -0.081312]) + 128.0
        if mode == "420":
            ph = (h + 1) // 2 * 2
            pw = (w + 1) // 2 * 2

            def half(p):
                p = np.pad(p, ((0, ph - h), (0, pw - w)), mode="edge")
                return p.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))

            planes, samp = [Y, half(Cb), half(Cr)], [(2, 2), (1, 1), (1, 1)]
        else:
            planes, samp = [Y, Cb, Cr], [(1, 1), (1, 1), (1, 1)]
    hmax, vmax = samp[0]
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    comps = []      # (coefs padded grid, pad_bw, pad_bh, real_bw, real_bh)
    for p, (hi, vi) in zip(planes, samp):
        tb_h, tb_w = mcuy * vi, mcux * hi          # padded block grid
        th, tw = tb_h * 8, tb_w * 8
        pp = np.pad(p, ((0, th - p.shape[0]), (0, tw - p.shape[1])),
                    mode="edge")
        rw = -(-int(np.ceil(w * hi / hmax)) // 8)  # real block grid
        rh = -(-int(np.ceil(h * vi / vmax)) // 8)
        comps.append((_plane_coefs(pp, tb_w, tb_h), tb_w, tb_h, rw, rh))

    out = bytearray(b"\xff\xd8")

    def seg(marker, body):
        out.extend(bytes((0xFF, marker)) + (len(body) + 2).to_bytes(2, "big")
                   + body)

    for tid in range(1 if mode == "gray" else 2):
        seg(0xDB, bytes([tid]) + b"\x01" * 64)
    sof = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big")
    sof += bytes([len(planes)])
    for ci, (hi, vi) in enumerate(samp):
        sof += bytes([ci + 1, (hi << 4) | vi, 0 if ci == 0 else 1])
    seg(0xC2, sof)
    if restart:
        seg(0xDD, restart.to_bytes(2, "big"))

    def emit_scan(scan_comps, ss, se, ah, al, token_segs, dc_scan):
        """DHT (if any symbols) + SOS + entropy segments."""
        syms = [t[1] for toks in token_segs for t in toks if t[0] == "sym"]
        cls = 0 if dc_scan else 1
        enc = None
        if syms and not (dc_scan and ah > 0):
            counts, vals, enc = _tables(syms)
            seg(0xC4, bytes([(cls << 4) | 0]) + counts + vals)
        sos = bytes([len(scan_comps)])
        for cid in scan_comps:
            sos += bytes([cid, 0x00])
        seg(0xDA, sos + bytes([ss, se, (ah << 4) | al]))
        for i, toks in enumerate(token_segs):
            if i:
                out.extend(bytes((0xFF, 0xD0 + (i - 1) % 8)))
            bw = _BW()
            for t in toks:
                if t[0] == "sym":
                    code, length = enc[t[1]]
                    bw.put(code, length)
                else:
                    bw.put(t[1], t[2])
            bw.align()
            out.extend(bw.out)

    # ---- DC first scan (interleaved over all components) ------------
    n_units = mcux * mcuy
    dc_segs = []
    toks: list = []
    preds = [0] * len(comps)
    for u in range(n_units):
        if restart and u and u % restart == 0:
            dc_segs.append(toks)
            toks, preds = [], [0] * len(comps)
        my, mx = divmod(u, mcux)
        for ci, ((coefs, tb_w, _tb_h, _rw, _rh), (hi, vi)) in enumerate(
                zip(comps, samp)):
            for by in range(vi):
                for bx in range(hi):
                    dc = int(coefs[(my * vi + by) * tb_w + mx * hi + bx, 0])
                    v = dc >> al_dc
                    s, bits_v = _mag(v - preds[ci])
                    preds[ci] = v
                    toks.append(("sym", s))
                    if s:
                        toks.append(("bits", bits_v, s))
    dc_segs.append(toks)
    emit_scan([ci + 1 for ci in range(len(comps))], 0, 0, 0, al_dc,
              dc_segs, dc_scan=True)

    # ---- DC refinement scans ---------------------------------------
    for level in range(al_dc - 1, -1, -1):
        ref_segs = []
        toks = []
        for u in range(n_units):
            if restart and u and u % restart == 0:
                ref_segs.append(toks)
                toks = []
            my, mx = divmod(u, mcux)
            for ci, ((coefs, tb_w, _tb_h, _rw, _rh), (hi, vi)) in enumerate(
                    zip(comps, samp)):
                for by in range(vi):
                    for bx in range(hi):
                        dc = int(coefs[(my * vi + by) * tb_w
                                       + mx * hi + bx, 0])
                        toks.append(("bits", (dc >> level) & 1, 1))
        ref_segs.append(toks)
        emit_scan([ci + 1 for ci in range(len(comps))], 0, 0,
                  level + 1, level, ref_segs, dc_scan=True)

    # ---- AC scans: per component × band, first then refinements -----
    for ci, (coefs, tb_w, _tb_h, rw, rh) in enumerate(comps):
        rows = [coefs[by * tb_w + bx] for by in range(rh) for bx in range(rw)]
        for band in bands:
            emit_scan([ci + 1], band[0], band[1], 0, al_ac,
                      _segmented(_ac_first_tokens, rows, band, al_ac,
                                 restart), dc_scan=False)
            for level in range(al_ac - 1, -1, -1):
                emit_scan([ci + 1], band[0], band[1], level + 1, level,
                          _segmented(_ac_refine_tokens, rows, band, level,
                                     restart), dc_scan=False)

    out.extend(b"\xff\xd9")
    return bytes(out)
