"""VP8 loop filter (RFC 6386 §15) — pins operators/vp8.py's vectorized
whole-frame post-pass against an INDEPENDENT scalar mirror transcribed
literally from the spec's pseudo-code (per-pixel Python ints, explicit
clamps), applied to the same pre-filter reconstruction. The encoder
twin only changes the HEADER for these streams (recon stays
pre-filter), so the two filter implementations are compared bit-exactly
on real decoded macroblock metadata: per-segment levels, lf deltas,
sharpness-adjusted limits, high-edge-variance splits, skip-MB interior
suppression, and the simple-vs-normal dispatch all participate.

No Spark needed — pure decode path (fast collection).
"""

import numpy as np
import pytest

from website_to_agent_spark.operators import vp8
from tests.vp8_encoder import encode_vp8


# ------------------------------------------------------ scalar mirror
def _c(v):
    return -128 if v < -128 else (127 if v > 127 else v)


def _u(v):
    return 0 if v < 0 else (255 if v > 255 else v)


def mirror_normal_edge(lane, mb_edge, ilim, elim, hev_t):
    """One 8-pixel lane [p3..q3] (unsigned) through the §15.3 normal
    filter, transcribed from the RFC pseudo-code."""
    p3, p2, p1, p0, q0, q1, q2, q3 = [int(v) - 128 for v in lane]
    ok = (abs(p0 - q0) * 2 + abs(p1 - q1) // 2 <= elim
          and abs(p3 - p2) <= ilim and abs(p2 - p1) <= ilim
          and abs(p1 - p0) <= ilim and abs(q1 - q0) <= ilim
          and abs(q2 - q1) <= ilim and abs(q3 - q2) <= ilim)
    if not ok:
        return list(lane)
    hev = abs(p1 - p0) > hev_t or abs(q1 - q0) > hev_t
    if mb_edge:
        if hev:
            a = _c(_c(p1 - q1) + 3 * (q0 - p0))
            q0 -= _c(a + 4) >> 3
            p0 += _c(a + 3) >> 3
        else:
            w = _c(_c(p1 - q1) + 3 * (q0 - p0))
            a = _c((27 * w + 63) >> 7)
            q0 -= a
            p0 += a
            a = _c((18 * w + 63) >> 7)
            q1 -= a
            p1 += a
            a = _c((9 * w + 63) >> 7)
            q2 -= a
            p2 += a
    else:
        a = _c((_c(p1 - q1) if hev else 0) + 3 * (q0 - p0))
        F = _c(a + 4) >> 3
        q0 -= F
        p0 += _c(a + 3) >> 3
        if not hev:
            a2 = (F + 1) >> 1
            q1 -= a2
            p1 += a2
    return [_u(v + 128) for v in (p3, p2, p1, p0, q0, q1, q2, q3)]


def mirror_simple_edge(lane, elim):
    p1, p0, q0, q1 = [int(v) - 128 for v in lane]
    if abs(p0 - q0) * 2 + abs(p1 - q1) // 2 <= elim:
        a = _c(_c(p1 - q1) + 3 * (q0 - p0))
        q0 -= _c(a + 4) >> 3
        p0 += _c(a + 3) >> 3
    return [_u(v + 128) for v in (p1, p0, q0, q1)]


def mirror_limits(lvl, sharpness):
    interior = lvl
    if sharpness:
        interior >>= 2 if sharpness > 4 else 1
        if interior > 9 - sharpness:
            interior = 9 - sharpness
    interior = max(interior, 1)
    hev_t = 2 if lvl >= 40 else (1 if lvl >= 15 else 0)   # keyframe
    return interior, hev_t, (lvl + 2) * 2 + interior, lvl * 2 + interior


def mirror_mb_level(lf, mby, mbx):
    lvl = lf["filter_level"]
    if lf["seg_enabled"]:
        s = int(lf["mb_seg"][mby, mbx])
        lvl = (lf["seg_lf"][s] if lf["seg_lf_abs"]
               else lvl + lf["seg_lf"][s])
        lvl = min(max(lvl, 0), 63)
    if lf["delta_enabled"]:
        lvl += lf["ref_lf_deltas"][0]
        if lf["mb_bpred"][mby, mbx]:
            lvl += lf["mode_lf_deltas"][0]
        lvl = min(max(lvl, 0), 63)
    return lvl


def _mirror_v(plane, x, y0, n, mb_edge, simple, ilim, elim, hev_t):
    for y in range(y0, y0 + n):
        if simple:
            plane[y, x - 2:x + 2] = mirror_simple_edge(
                plane[y, x - 2:x + 2], elim)
        else:
            plane[y, x - 4:x + 4] = mirror_normal_edge(
                plane[y, x - 4:x + 4], mb_edge, ilim, elim, hev_t)


def _mirror_h(plane, y, x0, n, mb_edge, simple, ilim, elim, hev_t):
    for x in range(x0, x0 + n):
        if simple:
            plane[y - 2:y + 2, x] = mirror_simple_edge(
                plane[y - 2:y + 2, x], elim)
        else:
            plane[y - 4:y + 4, x] = mirror_normal_edge(
                plane[y - 4:y + 4, x], mb_edge, ilim, elim, hev_t)


def mirror_filter_frame(ya, ua, va, lf):
    """§15.1 raster walk, scalar, in place."""
    if lf["filter_level"] == 0:
        return
    simple = lf["filter_type"] == 1
    mb_h, mb_w = lf["mb_seg"].shape
    for mby in range(mb_h):
        for mbx in range(mb_w):
            lvl = mirror_mb_level(lf, mby, mbx)
            if lvl == 0:
                continue
            ilim, hev_t, mbe, sbe = mirror_limits(lvl, lf["sharpness"])
            y0, x0 = mby * 16, mbx * 16
            cy, cx = mby * 8, mbx * 8
            interior = bool(lf["mb_coeffs"][mby, mbx]
                            or lf["mb_bpred"][mby, mbx])
            if mbx > 0:
                _mirror_v(ya, x0, y0, 16, True, simple, ilim, mbe, hev_t)
                if not simple:
                    _mirror_v(ua, cx, cy, 8, True, False, ilim, mbe, hev_t)
                    _mirror_v(va, cx, cy, 8, True, False, ilim, mbe, hev_t)
            if interior:
                for dx in (4, 8, 12):
                    _mirror_v(ya, x0 + dx, y0, 16, False, simple,
                              ilim, sbe, hev_t)
                if not simple:
                    _mirror_v(ua, cx + 4, cy, 8, False, False,
                              ilim, sbe, hev_t)
                    _mirror_v(va, cx + 4, cy, 8, False, False,
                              ilim, sbe, hev_t)
            if mby > 0:
                _mirror_h(ya, y0, x0, 16, True, simple, ilim, mbe, hev_t)
                if not simple:
                    _mirror_h(ua, cy, cx, 8, True, False, ilim, mbe, hev_t)
                    _mirror_h(va, cy, cx, 8, True, False, ilim, mbe, hev_t)
            if interior:
                for dy in (4, 8, 12):
                    _mirror_h(ya, y0 + dy, x0, 16, False, simple,
                              ilim, sbe, hev_t)
                if not simple:
                    _mirror_h(ua, cy + 4, cx, 8, False, False,
                              ilim, sbe, hev_t)
                    _mirror_h(va, cy + 4, cx, 8, False, False,
                              ilim, sbe, hev_t)


# -------------------------------------------------------------- tests
def _frame_body(webp: bytes) -> bytes:
    assert webp[:4] == b"RIFF" and webp[12:16] == b"VP8 "
    n = int.from_bytes(webp[16:20], "little")
    return webp[20:20 + n]


def _test_image(kind, n=48):
    rng = np.random.default_rng(11)
    yy, xx = np.mgrid[0:n, 0:n]
    if kind == "noise":
        return rng.integers(0, 256, (n, n)).astype(np.uint8)
    if kind == "grad":
        # smooth gradient: coarse quantization leaves block edges with
        # smooth interiors — the filter's home case at low levels
        return ((yy * 3 + xx * 2) % 256).astype(np.uint8)
    if kind == "grad_noise":
        g = (yy * 3 + xx * 2) % 256
        return np.clip(g + rng.integers(-25, 25, (n, n)), 0, 255
                       ).astype(np.uint8)
    if kind == "steps":
        # hard 0/255 steps across MB boundaries → hev lanes
        return np.where((xx // 16 + yy // 16) % 2 == 0, 20, 235
                        ).astype(np.uint8)
    if kind == "flat_patch":
        # flat 128 with one busy quadrant → skip MBs with filtered
        # MB edges but suppressed interior edges
        img = np.full((n, n), 128, dtype=np.int64)
        img[:16, :16] = rng.integers(0, 256, (16, 16))
        return img.astype(np.uint8)
    raise ValueError(kind)


CONFIGS = [
    # (image, y_ac_qi, filter_level, sharpness, filter_type,
    #  refd, moded, expect_moves) — expect_moves=False for configs
    # where the interior-smoothness mask legitimately never fires
    # (low level or tight sharpness limits on busy content); they
    # still pin the mask logic bit-exactly against the mirror
    ("grad", 60, 8, 0, 0, 0, 0, True),
    ("noise", 80, 20, 3, 0, 0, 0, False),
    ("steps", 100, 40, 0, 0, 0, 0, True),
    ("grad_noise", 100, 63, 7, 0, 0, 0, True),
    ("flat_patch", 60, 26, 0, 0, 0, 0, True),
    ("grad", 80, 20, 0, 1, 0, 0, True),          # simple filter
    ("steps", 100, 44, 4, 1, 0, 0, True),        # simple + sharpness
    ("grad_noise", 80, 20, 0, 0, 6, -4, True),   # lf deltas (B_PRED mix)
    ("grad", 100, 14, 0, 0, 0, 0, True),         # hev_t = 0 band
]


@pytest.mark.parametrize(
    "kind,qi,lvl,sharp,ftype,refd,moded,expect_moves", CONFIGS,
    ids=[f"{k}-l{l}-s{s}-t{t}-d{r}_{m}"
         for k, q, l, s, t, r, m, _ in CONFIGS])
def test_loop_filter_matches_scalar_spec_mirror(kind, qi, lvl, sharp,
                                                ftype, refd, moded,
                                                expect_moves):
    img = _test_image(kind)
    webp, recon = encode_vp8(
        img, y_ac_qi=qi, filter_level=lvl, sharpness=sharp,
        filter_type=ftype, lf_ref_delta=refd, lf_mode_delta=moded,
        force_bpred=lambda r, c: (r + c) % 3 == 0)
    body = _frame_body(webp)

    fr = vp8.decode_frame_full(body)
    mh, mw = fr["mb_h"] * 16, fr["mb_w"] * 16
    ya = fr["Y"].a[1:1 + mh, 1:1 + mw].copy()
    ua = fr["U"].a[1:1 + mh // 2, 1:1 + mw // 2].copy()
    va = fr["V"].a[1:1 + mh // 2, 1:1 + mw // 2].copy()
    # pre-filter reconstruction is the encoder twin's recon
    h, w = fr["h"], fr["w"]
    assert np.array_equal(ya[:h, :w], recon.astype(np.int64))

    mirror_filter_frame(ya, ua, va, fr["lf"])

    gy, gu, gv = vp8.decode_frame(body)
    assert np.array_equal(gy, ya[:h, :w].astype(np.uint8))
    assert np.array_equal(gu, ua[:(h + 1) // 2, :(w + 1) // 2]
                          .astype(np.uint8))
    assert np.array_equal(gv, va[:(h + 1) // 2, :(w + 1) // 2]
                          .astype(np.uint8))
    # the filter actually moved pixels (guard against a vacuous pass)
    if expect_moves:
        pre = vp8.decode_frame(body, loop_filter=False)[0]
        assert not np.array_equal(gy, pre)


def test_filter_level_zero_is_noop_and_simple_preserves_chroma():
    img = _test_image("grad_noise")
    webp0, _ = encode_vp8(img, y_ac_qi=80, filter_level=0)
    b0 = _frame_body(webp0)
    assert np.array_equal(vp8.decode_frame(b0)[0],
                          vp8.decode_frame(b0, loop_filter=False)[0])

    webps, _ = encode_vp8(img, y_ac_qi=80, filter_level=30,
                          filter_type=1)
    bs = _frame_body(webps)
    _, u_f, v_f = vp8.decode_frame(bs)
    _, u_p, v_p = vp8.decode_frame(bs, loop_filter=False)
    assert np.array_equal(u_f, u_p) and np.array_equal(v_f, v_p)


def test_flat_frame_is_invariant_under_filtering():
    img = np.full((32, 32), 77, dtype=np.uint8)
    webp, _ = encode_vp8(img, y_ac_qi=20, filter_level=63, sharpness=0)
    b = _frame_body(webp)
    assert np.array_equal(vp8.decode_frame(b)[0],
                          vp8.decode_frame(b, loop_filter=False)[0])


def test_mb_filter_levels_delta_dispatch():
    img = _test_image("grad_noise")
    webp, _ = encode_vp8(img, y_ac_qi=80, filter_level=20,
                         lf_ref_delta=10, lf_mode_delta=-5,
                         force_bpred=lambda r, c: c == 0)
    lf = vp8.decode_frame_full(_frame_body(webp))["lf"]
    lv = vp8.mb_filter_levels(lf)
    assert set(lv[:, 0]) == {25}          # B_PRED col: 20+10-5
    assert set(lv[:, 1:].ravel()) == {30}  # others: 20+10


def test_decode_vp8_end_to_end_is_filtered():
    img = _test_image("grad")
    webp, _ = encode_vp8(img, y_ac_qi=100, filter_level=40)
    y = vp8.decode_vp8(webp)
    pre = vp8.decode_frame(_frame_body(webp), loop_filter=False)[0]
    assert y is not None and not np.array_equal(y, pre.astype(np.float64))
