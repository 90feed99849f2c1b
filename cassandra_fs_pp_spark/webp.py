"""From-spec WebP-lossless (VP8L) decoder — pure python + numpy.

Implements the VP8L bitstream (the `WEBP`/`VP8L` RIFF chunk): LSB-first
bit reading, simple and normal-form canonical prefix codes (the
DEFLATE-style code-length code), LZ77 backward references with the 2-D
distance mapping, the color cache, optional entropy-image (meta prefix)
partitioning, and all four inverse transforms — predictor (14 modes),
color transform, subtract-green, and color-indexing with sub-byte pixel
bundling, plus ANIMATED lossless containers (VP8X/ANIM/ANMF frame
composition — src-over blending, dispose-to-background). Lossy `VP8 `
chunks raise
``NotImplementedError`` so callers can route to an optional fuller
decoder (the same honest-gate convention as the TIFF and JPEG codecs).
Lossy VP8 stays gated for the same reason arithmetic JPEG does
(``jpeg.py`` module docstring): RFC 6386's decoder is defined by large
default-probability tables (the 4x8x3x11 coefficient table and kin);
with no third-party VP8 artifact in this container to validate a
transcription against, a from-memory encoder+decoder pair would
round-trip green while misreading every real file.

The reference repo has no image pipeline at all; this is beyond-parity
capability for the multimodal column operators
(``functions/multimodal.decode_real_image``).
"""

from __future__ import annotations

import struct

import numpy as np

# 2-D proximity mapping for the first 120 distance codes (VP8L spec §4.2.2):
# (dx, dy) offsets ordered by increasing L2 distance, dy >= 0.
_DIST_MAP = [
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
]

# order in which code-length-code lengths are transmitted (spec §5.2.2)
_CLC_ORDER = [17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15]


class _LsbReader:
    """LSB-first bit reader over the VP8L payload."""

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0  # bit position

    def bits(self, n: int) -> int:
        v = 0
        p = self.pos
        d = self.data
        for i in range(n):
            byte = d[(p + i) >> 3] if ((p + i) >> 3) < len(d) else 0
            v |= ((byte >> ((p + i) & 7)) & 1) << i
        self.pos = p + n
        return v

    def bit(self) -> int:
        return self.bits(1)


class _PrefixCode:
    """Canonical prefix code: decode by walking bits MSB-of-code-first
    (codes are packed into the LSB-first stream code-MSB-first, like
    DEFLATE)."""

    __slots__ = ("table", "single")

    def __init__(self, lengths: list[int]) -> None:
        # canonical code assignment per DEFLATE / VP8L
        used = [(ln, sym) for sym, ln in enumerate(lengths) if ln > 0]
        if not used:
            raise ValueError("empty prefix code")
        if len(used) == 1:
            self.single = used[0][1]
            self.table = None
            return
        self.single = None
        max_len = max(ln for ln, _ in used)
        bl_count = [0] * (max_len + 1)
        for ln, _ in used:
            bl_count[ln] += 1
        code = 0
        next_code = [0] * (max_len + 1)
        for ln in range(1, max_len + 1):
            code = (code + bl_count[ln - 1]) << 1
            next_code[ln] = code
        table: dict[tuple[int, int], int] = {}
        for ln, sym in sorted(used):
            table[(ln, next_code[ln])] = sym
            next_code[ln] += 1
        self.table = table

    def read(self, r: _LsbReader) -> int:
        if self.single is not None:
            return self.single
        code = 0
        for ln in range(1, 16):
            code = (code << 1) | r.bit()
            sym = self.table.get((ln, code))
            if sym is not None:
                return sym
        raise ValueError("invalid VP8L prefix code")


def _read_prefix_code(r: _LsbReader, alphabet_size: int) -> _PrefixCode:
    """Simple (1-2 symbol) or normal (code-length-coded) prefix code."""
    if r.bit():  # simple code
        num_symbols = r.bit() + 1
        if r.bit():  # first symbol is 8 bits
            sym0 = r.bits(8)
        else:
            sym0 = r.bit()
        if num_symbols == 2:
            # VP8L assigns code 0 to the FIRST TRANSMITTED symbol, not the
            # canonically smaller one — build the table in transmission
            # order instead of routing through the canonical constructor
            # (a legal stream may transmit the larger symbol first).
            sym1 = r.bits(8)
            code = _PrefixCode.__new__(_PrefixCode)
            code.single = None
            code.table = {(1, 0): sym0, (1, 1): sym1}
            return code
        lengths = [0] * alphabet_size
        lengths[sym0] = 1
        # a 1-symbol code consumes 0 bits per read (handled by `single`)
        return _PrefixCode(lengths)
    # normal code: code lengths for the code-length code first
    num_codes = r.bits(4) + 4
    clc_lengths = [0] * 19
    for i in range(num_codes):
        clc_lengths[_CLC_ORDER[i]] = r.bits(3)
    clc = _PrefixCode(clc_lengths)
    # optional limit on the number of coded symbols
    if r.bit():
        length_nbits = 2 + 2 * r.bits(3)
        max_symbol = 2 + r.bits(length_nbits)
    else:
        max_symbol = alphabet_size
    lengths = [0] * alphabet_size
    prev_len = 8
    i = 0
    while i < alphabet_size and max_symbol > 0:
        max_symbol -= 1
        sym = clc.read(r)
        if sym < 16:
            lengths[i] = sym
            i += 1
            if sym:
                prev_len = sym
        elif sym == 16:
            for _ in range(3 + r.bits(2)):
                if i < alphabet_size:
                    lengths[i] = prev_len
                    i += 1
        elif sym == 17:
            i += 3 + r.bits(3)
        else:  # 18
            i += 11 + r.bits(7)
    return _PrefixCode(lengths)


def _lz_extra(sym: int, r: _LsbReader) -> int:
    """Length/distance prefix value decode (spec §4.2.1): symbol ->
    value with extra bits."""
    if sym < 4:
        return sym + 1
    extra = (sym - 2) >> 1
    offset = (2 + (sym & 1)) << extra
    return offset + r.bits(extra) + 1


class _CodeGroup:
    __slots__ = ("g", "r", "b", "a", "d")

    def __init__(self, r: _LsbReader, cache_bits: int) -> None:
        self.g = _read_prefix_code(r, 256 + 24 + (1 << cache_bits if cache_bits else 0))
        self.r = _read_prefix_code(r, 256)
        self.b = _read_prefix_code(r, 256)
        self.a = _read_prefix_code(r, 256)
        self.d = _read_prefix_code(r, 40)


def _decode_argb_image(
    r: _LsbReader, w: int, h: int, *, allow_meta: bool
) -> np.ndarray:
    """Decode one spatially-coded ARGB image of w x h pixels into an
    (h*w, 4) uint8 array [A, R, G, B]."""
    cache_bits = 0
    if r.bit():  # color cache present
        cache_bits = r.bits(4)
        if not 1 <= cache_bits <= 11:
            raise ValueError(f"bad color-cache bits {cache_bits}")
    meta_codes = None
    meta_bits = 0
    n_groups = 1
    if allow_meta and r.bit():  # entropy image (meta prefix codes)
        meta_bits = r.bits(3) + 2
        mw = -(-w // (1 << meta_bits))
        mh = -(-h // (1 << meta_bits))
        meta_img = _decode_argb_image(r, mw, mh, allow_meta=False)
        # meta group index = (red << 8) | green
        meta_codes = (
            meta_img[:, 1].astype(np.int32) << 8 | meta_img[:, 2].astype(np.int32)
        ).reshape(mh, mw)
        n_groups = int(meta_codes.max()) + 1
    groups = [_CodeGroup(r, cache_bits) for _ in range(n_groups)]
    cache = [0] * (1 << cache_bits) if cache_bits else None

    out = np.zeros((h * w, 4), dtype=np.uint8)
    n = h * w
    i = 0
    while i < n:
        if meta_codes is not None:
            x, y = i % w, i // w
            grp = groups[meta_codes[y >> meta_bits, x >> meta_bits]]
        else:
            grp = groups[0]
        sym = grp.g.read(r)
        if sym < 256:  # literal: G, then R, B, A
            g = sym
            red = grp.r.read(r)
            b = grp.b.read(r)
            a = grp.a.read(r)
            out[i] = (a, red, g, b)
            if cache is not None:
                argb = (a << 24) | (red << 16) | (g << 8) | b
                cache[((argb * 0x1E35A7BD) & 0xFFFFFFFF) >> (32 - cache_bits)] = argb
            i += 1
        elif sym < 256 + 24:  # LZ77 backward reference
            length = _lz_extra(sym - 256, r)
            dist_sym = grp.d.read(r)
            dist_code = _lz_extra(dist_sym, r)
            if dist_code > 120:
                dist = dist_code - 120
            else:
                dx, dy = _DIST_MAP[dist_code - 1]
                dist = dx + dy * w
                if dist < 1:
                    dist = 1
            if dist > i:
                raise ValueError("VP8L backward reference before start")
            for _ in range(length):
                if i >= n:
                    break
                out[i] = out[i - dist]
                if cache is not None:
                    a, red, g, b = (int(v) for v in out[i])
                    argb = (a << 24) | (red << 16) | (g << 8) | b
                    cache[((argb * 0x1E35A7BD) & 0xFFFFFFFF) >> (32 - cache_bits)] = argb
                i += 1
        else:  # color cache hit
            argb = cache[sym - 256 - 24]
            out[i] = (
                (argb >> 24) & 0xFF,
                (argb >> 16) & 0xFF,
                (argb >> 8) & 0xFF,
                argb & 0xFF,
            )
            i += 1
    return out


# ---------------------------------------------------------------------------
# Inverse transforms
# ---------------------------------------------------------------------------


def _avg2(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return ((a.astype(np.uint16) + b.astype(np.uint16)) // 2).astype(np.uint8)


def _clamp_add_subtract_full(c1, c2, c3):
    v = c1.astype(np.int16) + c2.astype(np.int16) - c3.astype(np.int16)
    return np.clip(v, 0, 255).astype(np.uint8)


def _clamp_add_subtract_half(ave, c3):
    a = ave.astype(np.int16)
    d = a - c3.astype(np.int16)
    half = np.sign(d) * (np.abs(d) // 2)  # C division truncates to zero
    return np.clip(a + half, 0, 255).astype(np.uint8)


def _select(l_, t, tl):  # noqa: E741 - spec naming
    p = l_.astype(np.int16) + t.astype(np.int16) - tl.astype(np.int16)
    pl = np.abs(p - l_.astype(np.int16)).sum(axis=-1)
    pt = np.abs(p - t.astype(np.int16)).sum(axis=-1)
    return np.where((pl < pt)[..., None], l_, t)


def _inv_predictor(argb: np.ndarray, h: int, w: int, tile_bits: int, modes: np.ndarray) -> np.ndarray:
    """Inverse predictor transform (spec §3.2): pixel-sequential — each
    pixel adds its predictor (mod 256)."""
    img = argb.reshape(h, w, 4).astype(np.int32)
    for y in range(h):
        for x in range(w):
            if x == 0 and y == 0:
                pred = np.array([255, 0, 0, 0], dtype=np.int32)  # ARGB black
            elif y == 0:
                pred = img[0, x - 1]
            elif x == 0:
                pred = img[y - 1, 0]
            else:
                mode = modes[y >> tile_bits, x >> tile_bits]
                l_ = img[y, x - 1]
                t = img[y - 1, x]
                tr = img[y - 1, x + 1] if x + 1 < w else img[y, 0]
                tl = img[y - 1, x - 1]
                if mode == 0:
                    pred = np.array([255, 0, 0, 0], dtype=np.int32)
                elif mode == 1:
                    pred = l_
                elif mode == 2:
                    pred = t
                elif mode == 3:
                    pred = tr
                elif mode == 4:
                    pred = tl
                elif mode == 5:
                    pred = _avg2(_avg2(l_.astype(np.uint8), tr.astype(np.uint8)), t.astype(np.uint8)).astype(np.int32)
                elif mode == 6:
                    pred = _avg2(l_.astype(np.uint8), tl.astype(np.uint8)).astype(np.int32)
                elif mode == 7:
                    pred = _avg2(l_.astype(np.uint8), t.astype(np.uint8)).astype(np.int32)
                elif mode == 8:
                    pred = _avg2(tl.astype(np.uint8), t.astype(np.uint8)).astype(np.int32)
                elif mode == 9:
                    pred = _avg2(t.astype(np.uint8), tr.astype(np.uint8)).astype(np.int32)
                elif mode == 10:
                    pred = _avg2(
                        _avg2(l_.astype(np.uint8), tl.astype(np.uint8)),
                        _avg2(t.astype(np.uint8), tr.astype(np.uint8)),
                    ).astype(np.int32)
                elif mode == 11:
                    pred = _select(
                        l_.astype(np.uint8)[None], t.astype(np.uint8)[None], tl.astype(np.uint8)[None]
                    )[0].astype(np.int32)
                elif mode == 12:
                    pred = _clamp_add_subtract_full(
                        l_.astype(np.uint8), t.astype(np.uint8), tl.astype(np.uint8)
                    ).astype(np.int32)
                elif mode == 13:
                    pred = _clamp_add_subtract_half(
                        _avg2(l_.astype(np.uint8), t.astype(np.uint8)), tl.astype(np.uint8)
                    ).astype(np.int32)
                else:
                    raise ValueError(f"bad predictor mode {mode}")
            img[y, x] = (img[y, x] + pred) & 0xFF
    return img.astype(np.uint8).reshape(h * w, 4)


def _to_signed(v: np.ndarray) -> np.ndarray:
    return v.astype(np.int32) - ((v.astype(np.int32) >> 7) << 8)  # int8 view


def _color_delta(t: np.ndarray, c: np.ndarray) -> np.ndarray:
    # (int8(t) * int8-as-uint8 pixel) >> 5, per spec ColorTransformDelta
    return (_to_signed(t) * _to_signed(c)) >> 5


def _inv_color_transform(argb: np.ndarray, h: int, w: int, tile_bits: int, tiles: np.ndarray) -> np.ndarray:
    img = argb.reshape(h, w, 4).astype(np.uint8)
    ys = np.arange(h)[:, None] >> tile_bits
    xs = np.arange(w)[None, :] >> tile_bits
    t = tiles[ys, xs]  # (h, w, 4) transform pixels: [A, R, G, B]
    # ColorTransformElement is packed as a pixel: green_to_red in the
    # BLUE channel, green_to_blue in GREEN, red_to_blue in RED.
    g2r = t[..., 3]
    g2b = t[..., 2]
    r2b = t[..., 1]
    out = img.astype(np.int32)
    g = out[..., 2]
    red = (out[..., 1] + _color_delta(g2r, g)) & 0xFF
    out[..., 1] = red
    b = (out[..., 3] + _color_delta(g2b, g) + _color_delta(r2b, red)) & 0xFF
    out[..., 3] = b
    return out.astype(np.uint8).reshape(h * w, 4)


def _inv_subtract_green(argb: np.ndarray) -> np.ndarray:
    a = argb.astype(np.int32)
    a[:, 1] = (a[:, 1] + a[:, 2]) & 0xFF  # R += G
    a[:, 3] = (a[:, 3] + a[:, 2]) & 0xFF  # B += G
    return a.astype(np.uint8)


def decode_webp(payload: bytes) -> np.ndarray:
    """WebP bytes -> (h, w, 4) uint8 RGBA array. Lossless stills decode
    directly; ANIMATED lossless files return the first composed frame
    (see :func:`decode_webp_frames` for the full sequence). Lossy VP8
    stays gated to the optional Pillow fallback."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WEBP":
        raise ValueError("not a WebP payload")
    pos = 12
    while pos + 8 <= len(payload):
        fourcc = payload[pos : pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        body = payload[pos + 8 : pos + 8 + size]
        if fourcc == b"VP8L":
            return _decode_vp8l(body)
        if fourcc == b"ANMF":
            return decode_webp_frames(payload)[0][1]
        if fourcc == b"VP8 ":
            raise NotImplementedError(
                "WebP chunk b'VP8 ' (lossy) unsupported"
            )
        # VP8X/ANIM/ICCP/EXIF/XMP are metadata: keep scanning
        pos += 8 + size + (size & 1)
    raise ValueError("no image chunk in WebP container")


def decode_webp_frames(payload: bytes) -> list[tuple[dict, np.ndarray]]:
    """Animated WebP (VP8X + ANIM + ANMF, lossless frames) -> the list of
    COMPOSED canvases ``[(meta, (ch, cw, 4) uint8 RGBA), ...]`` per the
    container spec's frame pipeline: each ANMF rect is either alpha-
    blended (src-over) onto or copied over the working canvas at its
    (2x-scaled) offsets, and disposal-to-background clears the rect to
    transparent AFTER the frame is snapshotted. ``meta`` carries
    ``x, y, duration_ms, blend, dispose``. Lossy (VP8) frames raise
    NotImplementedError -> optional Pillow."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WEBP":
        raise ValueError("not a WebP payload")
    cw = ch = None
    pos = 12
    frames: list[tuple[dict, np.ndarray]] = []
    canvas: np.ndarray | None = None
    while pos + 8 <= len(payload):
        fourcc = payload[pos : pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        body = payload[pos + 8 : pos + 8 + size]
        if fourcc == b"VP8X":
            cw = int.from_bytes(body[4:7], "little") + 1
            ch = int.from_bytes(body[7:10], "little") + 1
            canvas = np.zeros((ch, cw, 4), dtype=np.uint8)
        elif fourcc == b"ANMF":
            if canvas is None:
                raise ValueError("ANMF before VP8X canvas")
            fx = int.from_bytes(body[0:3], "little") * 2
            fy = int.from_bytes(body[3:6], "little") * 2
            fw = int.from_bytes(body[6:9], "little") + 1
            fh = int.from_bytes(body[9:12], "little") + 1
            dur = int.from_bytes(body[12:15], "little")
            flags = body[15]
            blend = not (flags & 0x02)  # bit 1: 1 = do NOT blend
            dispose = bool(flags & 0x01)  # bit 0: dispose to background
            sub = body[16:]
            scc = sub[:4]
            (ssz,) = struct.unpack_from("<I", sub, 4)
            if scc == b"ALPH":  # lossy frame prelude
                raise NotImplementedError(
                    "animated WebP with lossy (VP8/ALPH) frames unsupported"
                )
            if scc != b"VP8L":
                raise NotImplementedError(
                    f"animated WebP frame chunk {scc!r} unsupported"
                )
            rgba = _decode_vp8l(sub[8 : 8 + ssz])
            if rgba.shape[:2] != (fh, fw):
                raise ValueError("ANMF frame size mismatch")
            rect = canvas[fy : fy + fh, fx : fx + fw]
            if blend:
                sa = rgba[:, :, 3:4].astype(np.uint32)
                da = rect[:, :, 3:4].astype(np.uint32)
                out_a = sa * 255 + da * (255 - sa)  # alpha * 255^2
                src = rgba[:, :, :3].astype(np.uint32)
                dst = rect[:, :, :3].astype(np.uint32)
                num = src * sa * 255 + dst * da * (255 - sa)
                rgb = np.where(out_a > 0, num // np.maximum(out_a, 1), 0)
                rect[:, :, :3] = rgb.astype(np.uint8)
                rect[:, :, 3] = (out_a[:, :, 0] // 255).astype(np.uint8)
            else:
                rect[:] = rgba
            frames.append(
                (
                    {
                        "x": fx,
                        "y": fy,
                        "duration_ms": dur,
                        "blend": blend,
                        "dispose": dispose,
                    },
                    canvas.copy(),
                )
            )
            if dispose:
                canvas[fy : fy + fh, fx : fx + fw] = 0
        pos += 8 + size + (size & 1)
    if not frames:
        raise ValueError("no ANMF frames in WebP container")
    return frames


def _decode_vp8l(data: bytes) -> np.ndarray:
    if not data or data[0] != 0x2F:
        raise ValueError("bad VP8L signature")
    r = _LsbReader(data[1:])
    w = r.bits(14) + 1
    h = r.bits(14) + 1
    r.bit()  # alpha-is-used hint
    if r.bits(3) != 0:
        raise ValueError("unknown VP8L version")

    # transforms, outermost first in the stream; applied inverse in
    # reverse order after pixel decode
    transforms: list[tuple] = []
    xsize = w
    while r.bit():
        ttype = r.bits(2)
        if ttype == 0:  # predictor
            tile_bits = r.bits(3) + 2
            tw = -(-xsize // (1 << tile_bits))
            th = -(-h // (1 << tile_bits))
            tiles = _decode_argb_image(r, tw, th, allow_meta=False)
            modes = tiles[:, 2].reshape(th, tw)  # green channel = mode
            transforms.append(("pred", tile_bits, modes))
        elif ttype == 1:  # color transform
            tile_bits = r.bits(3) + 2
            tw = -(-xsize // (1 << tile_bits))
            th = -(-h // (1 << tile_bits))
            tiles = _decode_argb_image(r, tw, th, allow_meta=False)
            transforms.append(("color", tile_bits, tiles.reshape(th, tw, 4)))
        elif ttype == 2:  # subtract green
            transforms.append(("subgreen",))
        else:  # color indexing (palette)
            n_colors = r.bits(8) + 1
            palette = _decode_argb_image(r, n_colors, 1, allow_meta=False)
            # palette entries are delta-coded component-wise
            palette = np.cumsum(palette.astype(np.int32), axis=0) & 0xFF
            palette = palette.astype(np.uint8)
            if n_colors <= 2:
                pack_bits = 3  # 8 pixels per byte
            elif n_colors <= 4:
                pack_bits = 2
            elif n_colors <= 16:
                pack_bits = 1
            else:
                pack_bits = 0
            transforms.append(("palette", palette, pack_bits, xsize))
            xsize = -(-xsize // (1 << pack_bits))
    argb = _decode_argb_image(r, xsize, h, allow_meta=True)

    cur_w = xsize
    for t in reversed(transforms):
        if t[0] == "palette":
            _, palette, pack_bits, full_w = t
            if pack_bits:
                # unpack bundled green-channel indices
                per = 1 << pack_bits
                width_bits = 8 >> pack_bits
                g = argb[:, 2].reshape(h, cur_w)
                idx = np.zeros((h, cur_w * per), dtype=np.int32)
                for j in range(per):
                    idx[:, j::per] = (g >> (j * width_bits)) & ((1 << width_bits) - 1)
                idx = idx[:, :full_w]
            else:
                idx = argb[:, 2].reshape(h, cur_w).astype(np.int32)
                idx = idx[:, :full_w]
            if (idx >= len(palette)).any():
                raise ValueError("palette index out of range")
            argb = palette[idx.reshape(-1)]
            cur_w = full_w
        elif t[0] == "subgreen":
            argb = _inv_subtract_green(argb)
        elif t[0] == "color":
            argb = _inv_color_transform(argb, h, cur_w, t[1], t[2])
        else:  # pred
            argb = _inv_predictor(argb, h, cur_w, t[1], t[2])
    # ARGB -> RGBA
    rgba = argb.reshape(h, cur_w, 4)[:, :, [1, 2, 3, 0]]
    return np.ascontiguousarray(rgba)
