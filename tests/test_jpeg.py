"""From-spec baseline JPEG codec (ITU-T T.81): encoder + decoder.

The reference has no image pipeline at all (beyond-parity capability);
the tests pin the codec's own contracts: marker layout, exactness on
flat even-valued frames, PSNR floors on real content, restart markers,
subsampling, and the Spark decode path."""

import numpy as np
import pytest

from cassandra_fs_pp_spark.jpeg import decode_jpeg, encode_jpeg


def _psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = ((a.astype(np.float64) - b.astype(np.float64)) ** 2).mean()
    return 10 * np.log10(255**2 / max(mse, 1e-12))


def test_marker_layout():
    jpg = encode_jpeg(np.zeros((8, 8), dtype=np.uint8))
    assert jpg[:2] == b"\xff\xd8" and jpg[-2:] == b"\xff\xd9"
    assert b"\xff\xdb" in jpg and b"\xff\xc0" in jpg  # DQT, SOF0
    assert b"\xff\xc4" in jpg and b"\xff\xda" in jpg  # DHT, SOS


def test_flat_even_gray_is_exact():
    # DC = 8*(v-128) is a multiple of the q50 DC quantum 16 when v is even
    for v in (0, 2, 120, 254):
        img = np.full((24, 32), v, dtype=np.uint8)
        assert (decode_jpeg(encode_jpeg(img, quality=50)) == img).all()


def test_gray_gradient_psnr():
    x = np.linspace(0, 255, 64)
    img = np.clip(np.add.outer(x, x) / 2, 0, 255).astype(np.uint8)
    assert _psnr(img, decode_jpeg(encode_jpeg(img, quality=90))) > 45


def test_color_roundtrip_444_and_420():
    rng = np.random.default_rng(7)
    base = rng.integers(0, 255, (8, 8, 3)).astype(np.float64)
    img = np.clip(np.kron(base, np.ones((8, 8, 1))), 0, 255).astype(np.uint8)
    d444 = decode_jpeg(encode_jpeg(img, quality=95, subsample="444"))
    d420 = decode_jpeg(encode_jpeg(img, quality=95, subsample="420"))
    assert d444.shape == img.shape == d420.shape
    assert _psnr(img, d444) > 60
    assert _psnr(img, d420) > 35


def test_non_multiple_of_8_dims_preserved():
    img = np.clip(
        np.add.outer(np.linspace(0, 255, 37), np.linspace(0, 255, 53)) / 2, 0, 255
    ).astype(np.uint8)
    dec = decode_jpeg(encode_jpeg(img, quality=85))
    assert dec.shape == img.shape
    assert _psnr(img, dec) > 40


def test_restart_markers_roundtrip():
    x = np.linspace(0, 255, 48)
    img = np.clip(np.add.outer(x, x) / 2, 0, 255).astype(np.uint8)
    plain = decode_jpeg(encode_jpeg(img, quality=80))
    jpg = encode_jpeg(img, quality=80, restart_interval=2)
    assert b"\xff\xdd" in jpg  # DRI present
    assert any(bytes([0xFF, 0xD0 + i]) in jpg for i in range(8))
    assert (decode_jpeg(jpg) == plain).all()


def test_quality_ladder_monotone_size():
    rng = np.random.default_rng(11)
    img = rng.integers(0, 255, (64, 64), dtype=np.uint8).astype(np.uint8)
    sizes = [len(encode_jpeg(img, quality=q)) for q in (30, 60, 90)]
    assert sizes[0] < sizes[1] < sizes[2]


def test_reject_garbage():
    with pytest.raises(ValueError):
        decode_jpeg(b"\x00\x01\x02")


def test_decode_real_image_dispatches_jpeg():
    from cassandra_fs_pp_spark.functions.multimodal import decode_real_image

    img = np.full((16, 16), 100, dtype=np.uint8)
    out = decode_real_image(encode_jpeg(img, quality=50))
    assert (out == img).all()


def test_spark_jpeg_roundtrip_query(spark):
    import __spark_entry__ as entry

    df = entry.mm_jpeg_roundtrip(spark, "/root/testdata/sf0.001")
    rows = df.limit(50).collect()
    assert rows
    for r in rows:
        v = 2 * (r["doc_id"] % 128)
        assert r["mean_px"] == float(v)
        assert r["min_px"] == v and r["max_px"] == v
        assert r["h"] == 8 * (1 + r["doc_id"] % 3) and r["w"] == 16


def test_rgba_drops_alpha_and_hw1_is_gray():
    rgba = np.full((16, 16, 4), 100, dtype=np.uint8)
    dec = decode_jpeg(encode_jpeg(rgba, quality=50))
    assert dec.shape == (16, 16, 3)
    hw1 = np.full((16, 16, 1), 100, dtype=np.uint8)
    dec = decode_jpeg(encode_jpeg(hw1, quality=50))
    assert dec.shape == (16, 16) and (dec == 100).all()


def test_truncated_and_corrupt_input_raise_value_error_only():
    """Any corrupt/truncated payload fails with ValueError (or decodes to
    wrong-but-valid pixels — that's lossy entropy data), never a leaked
    struct.error/IndexError/KeyError."""
    x = np.linspace(0, 255, 32)
    jpg = encode_jpeg(
        np.clip(np.add.outer(x, x) / 2, 0, 255).astype(np.uint8), quality=80
    )
    rng = np.random.default_rng(3)
    for cut in range(2, len(jpg), 5):
        try:
            decode_jpeg(jpg[:cut])
        except (ValueError, NotImplementedError):
            pass
    for _ in range(200):
        b = bytearray(jpg)
        b[int(rng.integers(2, len(b)))] = int(rng.integers(0, 256))
        try:
            decode_jpeg(bytes(b))
        except (ValueError, NotImplementedError):
            pass


def test_pillow_interop_both_directions():
    """Cross-check the from-spec codec against an independent
    implementation (Pillow/libjpeg) when available: our encoder's output
    must decode in Pillow to ~the same pixels, and a Pillow-encoded
    baseline JPEG must decode in our decoder.  Skipped where Pillow is
    absent (this container) — runs green in any Pillow-equipped env.
    """
    pytest.importorskip("PIL")
    import io

    from PIL import Image

    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(48, 64, 3), dtype=np.uint8)
    # smooth it so quality-90 quantization error stays small
    img = (img.astype(np.float64) * 0.2 + 128).astype(np.uint8)

    # ours -> Pillow
    payload = encode_jpeg(img, quality=90)
    theirs = np.asarray(Image.open(io.BytesIO(payload)).convert("RGB"))
    assert theirs.shape == img.shape
    assert float(np.abs(theirs.astype(int) - img.astype(int)).mean()) < 4.0

    # Pillow -> ours
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="JPEG", quality=90, subsampling=0)
    ours = decode_jpeg(buf.getvalue())
    assert ours.shape == img.shape
    assert float(np.abs(ours.astype(int) - img.astype(int)).mean()) < 4.0


# --------------------------------------------------------------------------- #
# Progressive (SOF2) decode — exercised by a test-local progressive ENCODER
# following jcphuff's scan algorithms, mutually checked against the decoder:
# agreement after the DC/AC first+refine round trips is evidence both follow
# T.81 Annex G.
# --------------------------------------------------------------------------- #

import struct as _struct

# test-local Huffman tables (a progressive stream needs EOBn symbols the
# Annex K sequential tables don't define; any valid prefix code carried in
# the DHT works): 16 DC categories at length 5; all 256 AC symbols at
# lengths 9/10 (Kraft sum 255/512 + 1/1024 < 1).
_DC_BITS = (0, 0, 0, 0, 16) + (0,) * 11
_DC_VALS = tuple(range(16))
_AC_BITS = (0, 0, 0, 0, 0, 0, 0, 0, 255, 1) + (0,) * 6
_AC_VALS = tuple(range(256))


def _prog_headers(h, w, q_zig):
    out = bytearray(b"\xff\xd8")
    body = bytes([0]) + bytes(q_zig.astype(np.uint8))
    out += b"\xff\xdb" + _struct.pack(">H", 2 + len(body)) + body
    sof = _struct.pack(">BHHB", 8, h, w, 1) + _struct.pack(">BBB", 1, 0x11, 0)
    out += b"\xff\xc2" + _struct.pack(">H", 2 + len(sof)) + sof
    for tid, bits, vals in ((0x00, _DC_BITS, _DC_VALS), (0x10, _AC_BITS, _AC_VALS)):
        body = bytes([tid]) + bytes(bits) + bytes(vals)
        out += b"\xff\xc4" + _struct.pack(">H", 2 + len(body)) + body
    return out


def _sos_gray(ss, se, ah, al):
    body = bytes([1, 1, 0x00, ss, se, (ah << 4) | al])
    return b"\xff\xda" + _struct.pack(">H", 2 + len(body)) + body


class _ProgWriter:
    """One scan's entropy writer over the shared Huffman tables."""

    def __init__(self):
        from cassandra_fs_pp_spark.jpeg import _BitWriter, _build_codes

        self.bw = _BitWriter()
        self.dc = _build_codes(_DC_BITS, _DC_VALS)
        self.ac = _build_codes(_AC_BITS, _AC_VALS)

    def sym_dc(self, s):
        code, ln = self.dc[s]
        self.bw.write(code, ln)

    def sym_ac(self, s):
        code, ln = self.ac[s]
        self.bw.write(code, ln)

    def bits(self, v, n):
        if n:
            self.bw.write(v, n)

    def done(self):
        self.bw.flush()
        return bytes(self.bw.out)


def _enc_dc_first(blocks, al):
    from cassandra_fs_pp_spark.jpeg import _magnitude

    wtr = _ProgWriter()
    pred = 0
    for blk in blocks.reshape(-1, 64):
        v = int(blk[0]) >> al
        diff = v - pred
        pred = v
        if diff == 0:
            wtr.sym_dc(0)
        else:
            s, bv = _magnitude(diff)
            wtr.sym_dc(s)
            wtr.bits(bv, s)
    return wtr.done()


def _enc_dc_refine(blocks, al):
    wtr = _ProgWriter()
    for blk in blocks.reshape(-1, 64):
        wtr.bits((int(blk[0]) >> al) & 1, 1)
    return wtr.done()


def _enc_ac_first(blocks, ss, se, al):
    from cassandra_fs_pp_spark.jpeg import _magnitude

    wtr = _ProgWriter()
    eobrun = 0

    def flush_eob():
        nonlocal eobrun
        if eobrun == 0:
            return
        nb = eobrun.bit_length() - 1
        wtr.sym_ac(nb << 4)
        wtr.bits(eobrun - (1 << nb), nb)
        eobrun = 0

    for blk in blocks.reshape(-1, 64):
        sv = [
            (int(blk[k]) >> al) if blk[k] >= 0 else -((-int(blk[k])) >> al)
            for k in range(64)
        ]
        if not any(sv[k] for k in range(ss, se + 1)):
            eobrun += 1
            if eobrun == 32767:
                flush_eob()
            continue
        flush_eob()
        run = 0
        last_nz = max(k for k in range(ss, se + 1) if sv[k])
        for k in range(ss, se + 1):
            v = sv[k]
            if v == 0:
                run += 1
                continue
            while run > 15:
                wtr.sym_ac(0xF0)
                run -= 16
            s, bv = _magnitude(v)
            wtr.sym_ac((run << 4) | s)
            wtr.bits(bv, s)
            run = 0
            if k == last_nz:
                break
        if last_nz < se:
            eobrun += 1
    flush_eob()
    return wtr.done()


def _enc_ac_refine(blocks, ss, se, al):
    wtr = _ProgWriter()
    eobrun = 0
    pending = []  # correction bits riding the cross-block EOB run

    def flush_eob():
        nonlocal eobrun, pending
        if eobrun == 0:
            return
        nb = eobrun.bit_length() - 1
        wtr.sym_ac(nb << 4)
        wtr.bits(eobrun - (1 << nb), nb)
        for b in pending:
            wtr.bits(b, 1)
        eobrun = 0
        pending = []

    for blk in blocks.reshape(-1, 64):
        absv = [(-int(blk[k]) if blk[k] < 0 else int(blk[k])) >> al for k in range(64)]
        eobpos = ss - 1
        for k in range(ss, se + 1):
            if absv[k] == 1:
                eobpos = k
        r = 0
        br = []
        for k in range(ss, se + 1):
            t = absv[k]
            if t == 0:
                r += 1
                continue
            while r > 15 and k <= eobpos:
                flush_eob()
                wtr.sym_ac(0xF0)
                r -= 16
                for b in br:
                    wtr.bits(b, 1)
                br = []
            if t > 1:
                br.append(t & 1)
                continue
            flush_eob()
            wtr.sym_ac((r << 4) | 1)
            wtr.bits(1 if blk[k] >= 0 else 0, 1)
            for b in br:
                wtr.bits(b, 1)
            br = []
            r = 0
        if r > 0 or br:
            eobrun += 1
            pending.extend(br)
            if eobrun == 32767:
                flush_eob()
    flush_eob()
    return wtr.done()


def _prog_stream(coefs, h, w, q_zig, scans):
    out = _prog_headers(h, w, q_zig)
    for ss, se, ah, al in scans:
        out += _sos_gray(ss, se, ah, al)
        if ss == 0 and ah == 0:
            out += _enc_dc_first(coefs, al)
        elif ss == 0:
            out += _enc_dc_refine(coefs, al)
        elif ah == 0:
            out += _enc_ac_first(coefs, ss, se, al)
        else:
            out += _enc_ac_refine(coefs, ss, se, al)
    out += b"\xff\xd9"
    return bytes(out)


def _ref_decode(coefs, h, w, q_zig):
    from cassandra_fs_pp_spark.jpeg import UNZIGZAG, _C

    bh, bw_, _ = coefs.shape
    q = q_zig[UNZIGZAG].reshape(8, 8).astype(np.float64)
    blocks = coefs[:, :, UNZIGZAG].reshape(bh, bw_, 8, 8) * q
    pix = np.einsum("ij,xyjk,kl->xyil", _C.T, blocks, _C)
    plane = pix.transpose(0, 2, 1, 3).reshape(bh * 8, bw_ * 8)
    return np.clip(np.rint(plane[:h, :w] + 128), 0, 255).astype(np.uint8)


def _rand_coefs(bh, bw_, seed, density=0.2, lo=-15, hi=15):
    rng = np.random.RandomState(seed)
    c = rng.randint(lo, hi + 1, (bh, bw_, 64)).astype(np.int32)
    mask = rng.random_sample((bh, bw_, 64)) < density
    c *= mask
    # a couple of all-zero-AC blocks so EOB runs > 1 occur
    c[0, 0, 1:] = 0
    if bh * bw_ > 2:
        c.reshape(-1, 64)[2, 1:] = 0
        c.reshape(-1, 64)[3, 1:] = 0
    return c


SCAN_SCRIPT = [
    (0, 0, 0, 1),   # DC first at Al=1
    (1, 5, 0, 2),   # AC low band first at Al=2
    (6, 63, 0, 2),  # AC high band first at Al=2
    (0, 0, 1, 0),   # DC refine -> full precision
    (1, 5, 1, 1),   # AC low refine Al=2 -> 1
    (6, 63, 1, 1),  # AC high refine
    (1, 5, 1, 0),   # AC low refine Al=1 -> 0
    (6, 63, 1, 0),  # AC high refine -> full precision
]


def test_progressive_decode_full_script():
    """DC first/refine + AC spectral bands with two successive-
    approximation refinement rounds must reconstruct the exact
    coefficients: decoded image == reference IDCT of the inputs."""
    h, w = 37, 45  # non-multiples of 8: MCU padding in play
    bh, bw_ = -(-h // 8), -(-w // 8)
    coefs = _rand_coefs(bh, bw_, seed=3)
    q_zig = np.full(64, 2, dtype=np.int32)
    payload = _prog_stream(coefs, h, w, q_zig, SCAN_SCRIPT)
    out = decode_jpeg(payload)
    np.testing.assert_array_equal(out, _ref_decode(coefs, h, w, q_zig))


def test_progressive_decode_no_refinement():
    """Spectral selection only (Al=0 everywhere) — the EOB-run heavy
    layout."""
    h, w = 16, 80
    bh, bw_ = 2, 10
    coefs = _rand_coefs(bh, bw_, seed=9, density=0.08)
    q_zig = np.full(64, 3, dtype=np.int32)
    scans = [(0, 0, 0, 0), (1, 20, 0, 0), (21, 63, 0, 0)]
    payload = _prog_stream(coefs, h, w, q_zig, scans)
    out = decode_jpeg(payload)
    np.testing.assert_array_equal(out, _ref_decode(coefs, h, w, q_zig))


def test_progressive_through_dispatcher():
    from cassandra_fs_pp_spark.functions.multimodal import decode_real_image

    coefs = _rand_coefs(2, 2, seed=5)
    q_zig = np.full(64, 2, dtype=np.int32)
    payload = _prog_stream(coefs, 16, 16, q_zig, SCAN_SCRIPT)
    assert decode_real_image(payload).shape == (16, 16)


def test_progressive_pillow_crosscheck():
    """Where Pillow exists, its decode of our progressive stream must
    match ours exactly (skips cleanly in this container)."""
    pytest.importorskip("PIL")
    import io

    from PIL import Image

    coefs = _rand_coefs(3, 4, seed=11)
    q_zig = np.full(64, 2, dtype=np.int32)
    payload = _prog_stream(coefs, 24, 32, q_zig, SCAN_SCRIPT)
    ours = decode_jpeg(payload)
    theirs = np.asarray(Image.open(io.BytesIO(payload)).convert("L"))
    np.testing.assert_array_equal(ours, theirs)


def test_12bit_extended_sequential_roundtrip():
    """precision=12: SOF1 extended-sequential stream with 16-bit DQT,
    uint16 in/out, quantization-grade reconstruction; input validation
    and 8-bit behavior unchanged."""
    rng = np.random.RandomState(77)
    flat = np.full((16, 16), 3000, dtype=np.uint16)
    payload = encode_jpeg(flat, quality=90, precision=12)
    assert b"\xff\xc1" in payload and b"\xff\xc0" not in payload  # SOF1
    out = decode_jpeg(payload)
    assert out.dtype == np.uint16
    assert abs(out.astype(int) - 3000).max() <= 4

    grad = np.linspace(0, 4095, 24 * 32).reshape(24, 32).astype(np.uint16)
    out = decode_jpeg(encode_jpeg(grad, quality=95, precision=12))
    assert abs(out.astype(int) - grad.astype(int)).max() <= 16

    rgb = rng.randint(0, 4096, (17, 23, 3)).astype(np.uint16)
    out = decode_jpeg(encode_jpeg(rgb, quality=95, precision=12))
    assert out.shape == (17, 23, 3) and out.dtype == np.uint16

    with pytest.raises(TypeError):
        encode_jpeg(flat.astype(np.uint8), precision=12)
    with pytest.raises(ValueError):
        encode_jpeg(np.full((8, 8), 5000, dtype=np.uint16), precision=12)
    with pytest.raises(NotImplementedError):
        encode_jpeg(flat, precision=10)


def test_cmyk_and_ycck_four_component():
    """Adobe 4-component streams: CMYK (transform 0) round-trips the
    stored planes; YCCK (transform 2) inverts the YCbCr step on decode."""
    rng = np.random.RandomState(5)
    img = rng.randint(0, 256, (16, 24, 4), dtype=np.uint8)
    payload = encode_jpeg(img, quality=95, cmyk=True)
    assert b"Adobe" in payload and b"JFIF" not in payload
    out = decode_jpeg(payload)
    assert out.shape == (16, 24, 4)
    assert np.sqrt(((out.astype(float) - img) ** 2).mean()) < 6

    flat = np.full((8, 8, 4), 120, dtype=np.uint8)
    np.testing.assert_array_equal(
        decode_jpeg(encode_jpeg(flat, quality=90, cmyk=True)), flat
    )

    # YCCK: forward-transform the first three planes, patch APP14
    # transform byte to 2, decode must invert back to the originals
    c = img.astype(np.float64)
    y = 0.299 * c[..., 0] + 0.587 * c[..., 1] + 0.114 * c[..., 2]
    cb = -0.168736 * c[..., 0] - 0.331264 * c[..., 1] + 0.5 * c[..., 2]
    cr = 0.5 * c[..., 0] - 0.418688 * c[..., 1] - 0.081312 * c[..., 2]
    ycck = np.clip(
        np.rint(np.stack([y, cb + 128, cr + 128, c[..., 3]], axis=-1)),
        0, 255,
    ).astype(np.uint8)
    payload = encode_jpeg(ycck, quality=97, cmyk=True)
    i = payload.index(b"Adobe")
    payload = payload[: i + 11] + b"\x02" + payload[i + 12 :]
    out = decode_jpeg(payload)
    assert out.shape == (16, 24, 4)
    # lossy + rounding through the forward transform: generous bound
    assert np.sqrt(((out.astype(float) - img) ** 2).mean()) < 8

    with pytest.raises(ValueError):
        encode_jpeg(img[:, :, :3], cmyk=True)
