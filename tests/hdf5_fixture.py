"""Test-local minimal NetCDF4 (HDF5) writer — produces the byte layout
libhdf5/netCDF4 emit for the reference's ``to_netcdf`` encoding
(``bin/fs_process_l2.py:198-204``: int32 / scale_factor / _FillValue,
unlimited time), so ``cassandra_fs_pp_spark/hdf5.py`` can be
tested against real on-disk structures without the netCDF4 library.
Same convention as the test-local PNG/JPEG encoders: the writer lives in
tests/, the engine ships only the reader.

Subset written: superblock v0 (``fmt="v0"``) or v3 + OHDR v2 object
headers with link-message groups and a header continuation block
(``fmt="v2"``, libver='latest' flavor), dataspace v1 (incl. unlimited
maxdims), datatypes int32/int64/float64/fixed-string/vlen-string/
vlen-of-object-refs, contiguous + chunked (chunk B-tree v1) layouts,
attributes v1 (v0 headers) / v3 (v2 headers) with vlen payloads in a
global heap, netCDF4 dimension scales + DIMENSION_LIST, and with
``compress=True`` the standard netCDF4 filter stack: a v1 filter
pipeline (deflate) on the coordinate, a v2 pipeline
(shuffle+deflate+fletcher32) on the 2-D variable, a defined fill value
message with a deliberately missing chunk, and an independent naive
fletcher32 (straight H5checksum.c translation) cross-validating the
engine's vectorized one.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

UNDEF = 0xFFFFFFFFFFFFFFFF


def _pad8(b: bytes) -> bytes:
    return b + b"\x00" * (-len(b) % 8)


def fletcher32_naive(data: bytes) -> int:
    """Independent reference implementation of HDF5's
    H5_checksum_fletcher32 (big-endian 16-bit words, 360-word blocks,
    deferred one-fold reductions) for cross-validating the engine's
    vectorized version."""
    sum1 = sum2 = 0
    n = len(data)
    i = 0
    remaining = n // 2
    while remaining:
        tlen = min(360, remaining)
        remaining -= tlen
        for _ in range(tlen):
            sum1 += (data[i] << 8) | data[i + 1]
            sum2 += sum1
            i += 2
        sum1 = (sum1 & 0xFFFF) + (sum1 >> 16)
        sum2 = (sum2 & 0xFFFF) + (sum2 >> 16)
    if n % 2:
        sum1 += data[-1] << 8
        sum2 += sum1
        sum1 = (sum1 & 0xFFFF) + (sum1 >> 16)
        sum2 = (sum2 & 0xFFFF) + (sum2 >> 16)
    sum1 = (sum1 & 0xFFFF) + (sum1 >> 16)
    sum2 = (sum2 & 0xFFFF) + (sum2 >> 16)
    return (sum2 << 16) | sum1


def _shuffle_bytes(raw: bytes, elem: int) -> bytes:
    """HDF5 shuffle filter forward pass: gather byte plane j of every
    element contiguously."""
    arr = np.frombuffer(raw, dtype=np.uint8).reshape(len(raw) // elem, elem)
    return arr.T.tobytes()


class _Blob:
    """Byte builder with relative address-patch slots."""

    def __init__(self):
        self.b = bytearray()
        self.rel: list[tuple[int, str]] = []

    def emit(self, data: bytes) -> "_Blob":
        self.b += data
        return self

    def slot(self, key: str) -> "_Blob":
        self.rel.append((len(self.b), key))
        self.b += b"\x00" * 8
        return self

    def splice(self, other: "_Blob") -> "_Blob":
        base = len(self.b)
        self.b += other.b
        self.rel += [(base + o, k) for o, k in other.rel]
        return self

    def pad8(self) -> "_Blob":
        self.b += b"\x00" * (-len(self.b) % 8)
        return self


class _File:
    def __init__(self):
        self.blob = _Blob()
        self.addrs: dict[str, int] = {}

    def place(self, key: str | None, blob: _Blob) -> int:
        pos = len(self.blob.b)
        if key:
            self.addrs[key] = pos
        self.blob.splice(blob)
        return pos

    def finish(self) -> bytes:
        for off, key in self.blob.rel:
            struct.pack_into("<Q", self.blob.b, off, self.addrs[key])
        return bytes(self.blob.b)


# ------------------------------------------------------------- datatypes
def _dt_int(size: int) -> bytes:
    return struct.pack("<BBBBIHH", 0x10, 0x08, 0, 0, size, 0, size * 8)


def _dt_float64() -> bytes:
    return struct.pack(
        "<BBBBIHHBBBBI", 0x11, 0x20, 0x3F, 0, 8, 0, 64, 52, 11, 0, 52, 1023
    )


def _dt_string(n: int) -> bytes:
    return struct.pack("<BBBBI", 0x13, 0, 0, 0, n)


def _dt_ref() -> bytes:
    return struct.pack("<BBBBI", 0x17, 0, 0, 0, 8)


def _dt_vlen(string: bool) -> bytes:
    base = _dt_string(1) if string else _dt_ref()
    return struct.pack("<BBBBI", 0x19, 0x01 if string else 0x00, 0, 0, 16) + base


def _dataspace(dims, maxdims=None) -> bytes:
    flags = 1 if maxdims is not None else 0
    out = struct.pack("<BBB5x", 1, len(dims), flags)
    out += b"".join(struct.pack("<Q", d) for d in dims)
    if maxdims is not None:
        out += b"".join(struct.pack("<Q", d) for d in maxdims)
    return out


# ----------------------------------------------------- v0 message framing
def _msg(mtype: int, body: _Blob | bytes) -> _Blob:
    if isinstance(body, bytes):
        bb = _Blob().emit(body)
    else:
        bb = body
    bb.pad8()
    out = _Blob().emit(struct.pack("<HHB3x", mtype, len(bb.b), 0))
    return out.splice(bb)


def _attr(name: str, dtype: bytes, dataspace: bytes, data: _Blob | bytes) -> _Blob:
    if isinstance(data, bytes):
        data = _Blob().emit(data)
    nameb = name.encode() + b"\x00"
    out = _Blob().emit(
        struct.pack("<BBHHH", 1, 0, len(nameb), len(dtype), len(dataspace))
    )
    out.emit(_pad8(nameb)).emit(_pad8(dtype)).emit(_pad8(dataspace))
    return out.splice(data)


def _object_header(msgs: list[_Blob]) -> _Blob:
    body = _Blob()
    for m in msgs:
        body.splice(m)
    out = _Blob().emit(
        struct.pack("<BBHII4x", 1, 0, len(msgs), 1, len(body.b))
    )
    return out.splice(body)


# ----------------------------------------------------- v2 message framing
def _msg2(mtype: int, body: _Blob | bytes) -> _Blob:
    if isinstance(body, bytes):
        body = _Blob().emit(body)
    out = _Blob().emit(struct.pack("<BHB", mtype, len(body.b), 0))
    return out.splice(body)


def _attr3(name: str, dtype: bytes, dataspace: bytes, data: _Blob | bytes) -> _Blob:
    if isinstance(data, bytes):
        data = _Blob().emit(data)
    nameb = name.encode() + b"\x00"
    out = _Blob().emit(
        struct.pack(
            "<BBHHHB", 3, 0, len(nameb), len(dtype), len(dataspace), 0
        )
    )
    out.emit(nameb).emit(dtype).emit(dataspace)
    return out.splice(data)


def _object_header_v2(msgs: list[_Blob]) -> _Blob:
    """OHDR v2: flags=0x02 (4-byte chunk-0 size, no times/bounds);
    chunk-0 size counts the message region only — the trailing 4-byte
    checksum (unverified by the reader; zeros) is outside it, so the
    last message ends exactly at the chunk-0 boundary."""
    body = _Blob()
    for m in msgs:
        body.splice(m)
    out = _Blob().emit(b"OHDR").emit(struct.pack("<BB", 2, 0x02))
    out.emit(struct.pack("<I", len(body.b)))
    out.splice(body)
    return out.emit(b"\x00\x00\x00\x00")


# ------------------------------------------------------- layout / filters
def _layout_contiguous(data_key: str, size: int) -> _Blob:
    return (
        _Blob()
        .emit(struct.pack("<BB", 3, 1))
        .slot(data_key)
        .emit(struct.pack("<Q", size))
    )


def _layout_chunked(btree_key: str, chunk_dims: tuple[int, ...],
                    elem: int) -> _Blob:
    out = _Blob().emit(struct.pack("<BBB", 3, 2, len(chunk_dims) + 1))
    out.slot(btree_key)
    for d in chunk_dims:
        out.emit(struct.pack("<I", d))
    return out.emit(struct.pack("<I", elem))


def _filter_pipeline_v1(filters: list[tuple[int, tuple[int, ...]]]) -> bytes:
    """[(filter_id, client_data)] -> v1 message body (8-byte preamble,
    zero-length names, odd client-data counts padded)."""
    out = struct.pack("<BB2x4x", 1, len(filters))
    for fid, cd in filters:
        out += struct.pack("<HHHH", fid, 0, 1, len(cd))
        out += b"".join(struct.pack("<I", c) for c in cd)
        if len(cd) % 2:
            out += b"\x00\x00\x00\x00"
    return out


def _filter_pipeline_v2(filters: list[tuple[int, tuple[int, ...]]]) -> bytes:
    out = struct.pack("<BB", 2, len(filters))
    for fid, cd in filters:
        out += struct.pack("<HHH", fid, 1, len(cd))
        out += b"".join(struct.pack("<I", c) for c in cd)
    return out


def _fill_value_v3(raw: bytes) -> bytes:
    # flags: alloc time=2 (late), write time=0, defined (0x20)
    return struct.pack("<BBI", 3, 0x22, len(raw)) + raw


# --------------------------------------- dense storage (fractal heap + v2 B-tree)
def _fractal_heap(
    f: "_File", prefix: str, objects: list["_Blob"], id_len: int
) -> list[bytes]:
    """Managed fractal heap with a single root DIRECT block (cur_rows=0,
    unfiltered, no block checksums — header flags=0): FRHP header +
    FHDB holding ``objects`` packed after the 17-byte block header
    (heap offsets include the header, as libhdf5 lays them out).
    Returns the managed heap IDs (version/type byte 0, 4-byte offset,
    ``id_len - 5``-byte length)."""
    len_bytes = id_len - 1 - 4  # off_bytes=4 (max heap size 32 bits)
    blk = _Blob().emit(b"FHDB").emit(struct.pack("<B", 0))
    blk.slot(f"{prefix}:frhp")
    blk.emit(struct.pack("<I", 0))  # block offset in heap space
    ids = []
    for ob in objects:
        off = len(blk.b)
        ln = len(ob.b)
        blk.splice(ob)
        ids.append(
            b"\x00" + off.to_bytes(4, "little") + ln.to_bytes(len_bytes, "little")
        )
    f.place(f"{prefix}:fhdb", blk)

    hdr = _Blob().emit(b"FRHP").emit(struct.pack("<BHHB", 0, id_len, 0, 0))
    hdr.emit(struct.pack("<I", 4096))  # max managed object size
    hdr.emit(
        struct.pack(
            "<QQQQQQQQQQQQ",
            0, UNDEF,            # next huge id, huge-object B-tree
            0, UNDEF,            # free space, free-space manager
            len(blk.b), len(blk.b), len(blk.b),  # managed/alloc/iterator
            len(objects),        # number of managed objects
            0, 0, 0, 0,          # huge size/count, tiny size/count
        )
    )
    hdr.emit(struct.pack("<HQQHH", 4, 512, 65536, 32, 0))
    hdr.slot(f"{prefix}:fhdb")  # root block address
    hdr.emit(struct.pack("<H", 0))  # current rows: root is direct
    hdr.emit(b"\x00\x00\x00\x00")  # checksum (unverified by reader)
    f.place(f"{prefix}:frhp", hdr)
    return ids


def _fractal_heap_indirect(
    f: "_File", prefix: str, objects: list["_Blob"], id_len: int
) -> list[bytes]:
    """Fractal heap whose root is an INDIRECT block (FHIB): one object
    per 512-byte row-0/1 direct block (width 4, so up to 8 objects in
    the two equal-size starting rows), exercising the reader's
    indirect-block row/column walk. Heap offsets include each block's
    17-byte header."""
    width, start = 4, 512
    assert len(objects) <= 2 * width, "two starting rows only"
    len_bytes = id_len - 1 - 4
    ids = []
    for i, ob in enumerate(objects):
        assert len(ob.b) + 17 <= start
        blk = _Blob().emit(b"FHDB").emit(struct.pack("<B", 0))
        blk.slot(f"{prefix}:frhp")
        blk.emit(struct.pack("<I", i * start))  # block offset
        off = i * start + len(blk.b)
        blk.splice(ob)
        f.place(f"{prefix}:fhdb{i}", blk)
        ids.append(
            b"\x00"
            + off.to_bytes(4, "little")
            + len(ob.b).to_bytes(len_bytes, "little")
        )
    nrows = 1 if len(objects) <= width else 2
    fhib = _Blob().emit(b"FHIB").emit(struct.pack("<B", 0))
    fhib.slot(f"{prefix}:frhp")
    fhib.emit(struct.pack("<I", 0))
    for i in range(nrows * width):
        if i < len(objects):
            fhib.slot(f"{prefix}:fhdb{i}")
        else:
            fhib.emit(struct.pack("<Q", UNDEF))
    fhib.emit(b"\x00" * 4)
    f.place(f"{prefix}:fhib", fhib)

    hdr = _Blob().emit(b"FRHP").emit(struct.pack("<BHHB", 0, id_len, 0, 0))
    hdr.emit(struct.pack("<I", 4096))
    hdr.emit(
        struct.pack(
            "<QQQQQQQQQQQQ",
            0, UNDEF, 0, UNDEF,
            nrows * width * start, nrows * width * start,
            nrows * width * start, len(objects),
            0, 0, 0, 0,
        )
    )
    hdr.emit(struct.pack("<HQQHH", width, start, 65536, 32, 0))
    hdr.slot(f"{prefix}:fhib")
    hdr.emit(struct.pack("<H", nrows))  # current rows: root is indirect
    hdr.emit(b"\x00\x00\x00\x00")
    f.place(f"{prefix}:frhp", hdr)
    return ids


def _btree2(
    f: "_File", prefix: str, rectype: int, records: list[bytes], rec_size: int
) -> None:
    """Depth-0 v2 B-tree: BTHD header + one BTLF leaf holding all
    records."""
    assert all(len(r) == rec_size for r in records)
    leaf = _Blob().emit(b"BTLF").emit(struct.pack("<BB", 0, rectype))
    for r in records:
        leaf.emit(r)
    leaf.emit(b"\x00" * 4)  # checksum (unverified)
    f.place(f"{prefix}:btlf", leaf)

    hd = _Blob().emit(b"BTHD")
    hd.emit(struct.pack("<BBIHHBB", 0, rectype, 2048, rec_size, 0, 100, 40))
    hd.slot(f"{prefix}:btlf")
    hd.emit(struct.pack("<HQ", len(records), len(records)))
    hd.emit(b"\x00" * 4)  # checksum
    f.place(f"{prefix}:bthd", hd)


def _chunk_btree(chunks: list[tuple[tuple[int, ...], str, int]],
                 shape: tuple[int, ...]) -> _Blob:
    """chunks: [(start offsets, data key, stored nbytes)]."""
    out = _Blob().emit(struct.pack("<4sBBH", b"TREE", 1, 0, len(chunks)))
    out.emit(struct.pack("<QQ", UNDEF, UNDEF))
    for start, key, nbytes in chunks:
        out.emit(struct.pack("<II", nbytes, 0))
        for s in start:
            out.emit(struct.pack("<Q", s))
        out.emit(struct.pack("<Q", 0))  # elem-size key component
        out.slot(key)
    out.emit(struct.pack("<II", 0, 0))
    for s in shape:
        out.emit(struct.pack("<Q", s))
    out.emit(struct.pack("<Q", 0))
    return out


def write_netcdf4(
    path: str,
    n_time: int = 48,
    n_sensor: int = 3,
    *,
    compress: bool = False,
    fmt: str = "v0",
    dense_attrs: bool = False,
    dense_indirect: bool = False,
) -> dict:
    """Write the reference-flavor fixture; returns ground-truth arrays.

    ``compress=True``: time gets a v1 deflate pipeline; depth gets a v2
    shuffle+deflate+fletcher32 pipeline, a fill-value message (-1.0),
    and its second chunk is left unwritten (truth reflects the fill).
    ``fmt="v2"``: superblock v3 + OHDR v2 headers + link-message root
    group with a header-continuation block (libver='latest' flavor).
    ``dense_attrs=True`` (requires fmt="v2"): t_air's attributes move
    into REAL dense storage (fractal heap + depth-0 type-8 v2 B-tree,
    the shape h5py 'latest' uses above 8 attributes) and the root
    group's links into dense link storage (type-5 B-tree, id_len=7).
    """
    if fmt not in ("v0", "v2"):
        raise ValueError(fmt)
    if dense_attrs and fmt != "v2":
        raise ValueError("dense_attrs requires fmt='v2'")
    v2 = fmt == "v2"
    msg = _msg2 if v2 else _msg
    attr = _attr3 if v2 else _attr
    header = _object_header_v2 if v2 else _object_header

    rng = np.random.default_rng(5)
    time_vals = np.arange(n_time, dtype=np.int64) * 3600
    t_air = np.round(
        np.round(rng.normal(-5, 8, n_time), 3) * 1000
    ).astype(np.int32)
    t_air[5] = -9999  # fill
    batt = (12000 + rng.integers(0, 500, n_time)).astype(np.int32)
    depth = np.round(rng.normal(2.0, 0.5, (n_time, n_sensor)), 6)
    half = (n_time + 1) // 2  # chunk rows; odd n_time -> ragged edge chunk
    depth_fill = -1.0
    if compress:
        depth[half:] = depth_fill  # second chunk never written -> fill

    f = _File()

    # --- superblock
    sb = _Blob()
    sb.emit(b"\x89HDF\r\n\x1a\n")
    if v2:
        sb.emit(struct.pack("<BBBB", 3, 8, 8, 0))
        sb.emit(struct.pack("<QQ", 0, UNDEF))  # base, ext
        eof_off = len(sb.b)
        sb.emit(struct.pack("<Q", 0))
        sb.slot("oh:root")
        sb.emit(b"\x00\x00\x00\x00")  # checksum (unverified)
    else:
        sb.emit(struct.pack("<BBBBBBBB", 0, 0, 0, 0, 0, 8, 8, 0))
        sb.emit(struct.pack("<HHI", 4, 16, 0))
        sb.emit(struct.pack("<QQ", 0, UNDEF))
        eof_off = len(sb.b)
        sb.emit(struct.pack("<Q", 0))
        sb.emit(struct.pack("<Q", UNDEF))
        sb.emit(struct.pack("<Q", 0))  # root link name offset
        sb.slot("oh:root")
        sb.emit(struct.pack("<II16x", 0, 0))
    f.place(None, sb)

    # --- raw data blocks (time/depth chunks pass the filter stack)
    time_raw = time_vals.astype("<i8").tobytes()
    if compress:
        time_stored = zlib.compress(time_raw, 6)
    else:
        time_stored = time_raw
    f.place("data:time", _Blob().emit(time_stored))
    f.place("data:t_air", _Blob().emit(t_air.astype("<i4").tobytes()))
    f.place("data:batt", _Blob().emit(batt.astype("<i4").tobytes()))

    depth0_raw = depth[:half].astype("<f8").tobytes()
    # edge chunks are stored at FULL nominal chunk size (readers clip to
    # the dataset extent), so pad the ragged tail like libhdf5 does
    tail = np.zeros((half, n_sensor))
    tail[: n_time - half] = depth[half:]
    depth1_raw = tail.astype("<f8").tobytes()
    if compress:
        d0 = zlib.compress(_shuffle_bytes(depth0_raw, 8), 6)
        depth0_stored = d0 + struct.pack("<I", fletcher32_naive(d0))
        depth_chunks = [((0, 0), "data:depth0", len(depth0_stored))]
        f.place("data:depth0", _Blob().emit(depth0_stored))
    else:
        depth_chunks = [
            ((0, 0), "data:depth0", len(depth0_raw)),
            ((half, 0), "data:depth1", len(depth1_raw)),
        ]
        f.place("data:depth0", _Blob().emit(depth0_raw))
        f.place("data:depth1", _Blob().emit(depth1_raw))

    # --- chunk B-trees
    f.place(
        "btree:time",
        _chunk_btree([((0,), "data:time", len(time_stored))], (n_time,)),
    )
    f.place("btree:depth", _chunk_btree(depth_chunks, (n_time, n_sensor)))

    # --- global heap (vlen strings + object refs)
    gobjs: list[tuple[bytes, str | None]] = [
        (b"seconds since 2024-01-01 00:00:00", None),  # 1
        (b"degree_Celsius", None),                      # 2
        (b"\x00" * 8, "oh:time"),                       # 3: ref -> time
        (b"\x00" * 8, "oh:sensor"),                     # 4: ref -> sensor
    ]
    gh = _Blob()
    payload = _Blob()
    for i, (data, patch_key) in enumerate(gobjs, start=1):
        payload.emit(struct.pack("<HHIQ", i, 1, 0, len(data)))
        if patch_key:
            payload.slot(patch_key)
            payload.pad8()
        else:
            payload.emit(_pad8(data))
    total = 16 + len(payload.b) + 16
    gh.emit(b"GCOL" + struct.pack("<B3xQ", 1, total))
    gh.splice(payload)
    gh.emit(struct.pack("<HHIQ", 0, 0, 0, 16))
    f.place("gheap", gh)
    G_UNITS_T, G_UNITS_AIR, G_REF_TIME, G_REF_SENSOR = 1, 2, 3, 4

    def _vlen_payload(length: int, gidx: int) -> _Blob:
        return (
            _Blob()
            .emit(struct.pack("<I", length))
            .slot("gheap")
            .emit(struct.pack("<I", gidx))
        )

    def dim_list_body(gidxs: list[int]) -> _Blob:
        data = _Blob()
        for gi in gidxs:
            data.splice(_vlen_payload(1, gi))
        return attr(
            "DIMENSION_LIST",
            _dt_vlen(string=False),
            _dataspace((len(gidxs),)),
            data,
        )

    def dim_list(gidxs: list[int]) -> _Blob:
        return msg(0x000C, dim_list_body(gidxs))

    def fixed_str_attr(name: str, val: str) -> _Blob:
        raw = val.encode() + b"\x00"
        return msg(
            0x000C, attr(name, _dt_string(len(raw)), _dataspace(()), raw)
        )

    # --- time: int64 coordinate, unlimited, chunked
    time_msgs = [
        msg(0x0001, _dataspace((n_time,), (UNDEF,))),
        msg(0x0003, _dt_int(8)),
        msg(0x0008, _layout_chunked("btree:time", (n_time,), 8)),
    ]
    if compress:
        time_msgs.append(msg(0x000B, _filter_pipeline_v1([(1, (6,))])))
    time_msgs += [
        fixed_str_attr("CLASS", "DIMENSION_SCALE"),
        fixed_str_attr("NAME", "time"),
        msg(
            0x000C,
            attr(
                "units",
                _dt_vlen(string=True),
                _dataspace(()),
                _vlen_payload(len(gobjs[0][0]), G_UNITS_T),
            ),
        ),
    ]
    f.place("oh:time", header(time_msgs))

    # --- sensor: pure dimension (no variable), data never allocated
    sensor_layout = (
        _Blob()
        .emit(struct.pack("<BB", 3, 1))
        .emit(struct.pack("<QQ", UNDEF, n_sensor * 8))
    )
    f.place(
        "oh:sensor",
        header(
            [
                msg(0x0001, _dataspace((n_sensor,))),
                msg(0x0003, _dt_float64()),
                msg(0x0008, sensor_layout),
                fixed_str_attr("CLASS", "DIMENSION_SCALE"),
                fixed_str_attr(
                    "NAME",
                    "This is a netCDF dimension but not a netCDF variable."
                    f" {n_sensor}",
                ),
            ]
        ),
    )

    # --- t_air: packed int32, contiguous
    t_air_msgs = [
        msg(0x0001, _dataspace((n_time,), (UNDEF,))),
        msg(0x0003, _dt_int(4)),
        msg(0x0008, _layout_contiguous("data:t_air", n_time * 4)),
    ]
    t_air_attr_bodies = [
        attr(
            "scale_factor",
            _dt_float64(),
            _dataspace(()),
            struct.pack("<d", 0.001),
        ),
        attr(
            "_FillValue",
            _dt_int(4),
            _dataspace((1,)),
            struct.pack("<i", -9999),
        ),
        attr(
            "units",
            _dt_vlen(string=True),
            _dataspace(()),
            _vlen_payload(len(gobjs[1][0]), G_UNITS_AIR),
        ),
        dim_list_body([G_REF_TIME]),
    ]
    if dense_attrs:
        # real dense storage: attribute messages live in a fractal heap,
        # indexed by a depth-0 type-8 v2 B-tree (libhdf5 id_len=8);
        # dense_indirect routes through an FHIB-rooted heap instead of a
        # root direct block
        mk_heap = _fractal_heap_indirect if dense_indirect else _fractal_heap
        hids = mk_heap(f, "tair_attrs", t_air_attr_bodies, id_len=8)
        recs = [
            hid + b"\x00" + struct.pack("<I", i) + b"\x00" * 4
            for i, hid in enumerate(hids)
        ]
        _btree2(f, "tair_attrs", 8, recs, 17)
        ainfo = _Blob().emit(struct.pack("<BB", 0, 0))
        ainfo.slot("tair_attrs:frhp").slot("tair_attrs:bthd")
        t_air_msgs.append(msg(0x0015, ainfo))
    else:
        t_air_msgs += [msg(0x000C, b) for b in t_air_attr_bodies]
    f.place("oh:t_air", header(t_air_msgs))

    # --- batt: plain int32, contiguous
    f.place(
        "oh:batt",
        header(
            [
                msg(0x0001, _dataspace((n_time,), (UNDEF,))),
                msg(0x0003, _dt_int(4)),
                msg(0x0008, _layout_contiguous("data:batt", n_time * 4)),
                dim_list([G_REF_TIME]),
            ]
        ),
    )

    # --- depth: float64 (time, sensor), chunked
    depth_msgs = [
        msg(
            0x0001,
            _dataspace((n_time, n_sensor), (UNDEF, n_sensor)),
        ),
        msg(0x0003, _dt_float64()),
        msg(
            0x0008,
            _layout_chunked("btree:depth", (half, n_sensor), 8),
        ),
    ]
    if compress:
        depth_msgs.append(
            msg(
                0x000B,
                _filter_pipeline_v2([(2, (8,)), (1, (6,)), (3, ())]),
            )
        )
        depth_msgs.append(
            msg(0x0005, _fill_value_v3(struct.pack("<d", depth_fill)))
        )
    depth_msgs.append(dim_list([G_REF_TIME, G_REF_SENSOR]))
    f.place("oh:depth", header(depth_msgs))

    # --- root group plumbing
    names = sorted(["time", "sensor", "t_air", "batt", "depth"])
    if v2 and dense_attrs:
        # dense link storage: link messages in a fractal heap indexed
        # by a type-5 v2 B-tree (hash(4) + heap ID(7), libhdf5 id_len=7)
        def link_body(n: str) -> _Blob:
            body = _Blob().emit(struct.pack("<BBB", 1, 0, len(n)))
            body.emit(n.encode()).slot(f"oh:{n}")
            return body

        hids = _fractal_heap(
            f, "root_links", [link_body(n) for n in names], id_len=7
        )
        _btree2(
            f, "root_links", 5, [b"\x00" * 4 + h for h in hids], 11
        )
        linfo = _Blob().emit(struct.pack("<BB", 0, 0))
        linfo.slot("root_links:frhp").slot("root_links:bthd")
        f.place("oh:root", _object_header_v2([_msg2(0x0002, linfo)]))
    elif v2:
        # link-message group; last two links spill into an OCHK
        # continuation block to exercise the v2 continuation path
        def link_msg(n: str) -> _Blob:
            body = _Blob().emit(struct.pack("<BBB", 1, 0, len(n)))
            body.emit(n.encode()).slot(f"oh:{n}")
            return _msg2(0x0006, body)

        cont_msgs = _Blob()
        for n in names[3:]:
            cont_msgs.splice(link_msg(n))
        ochk = _Blob().emit(b"OCHK")
        ochk.splice(cont_msgs)
        ochk.emit(b"\x00\x00\x00\x00")  # checksum (unverified)
        f.place("ochk:root", ochk)

        root_msgs = [
            _msg2(0x0002, struct.pack("<BBQQ", 0, 0, UNDEF, UNDEF)),
        ]
        for n in names[:3]:
            root_msgs.append(link_msg(n))
        cont_body = _Blob().slot("ochk:root").emit(
            struct.pack("<Q", len(ochk.b))
        )
        root_msgs.append(_msg2(0x10, cont_body))
        f.place("oh:root", _object_header_v2(root_msgs))
    else:
        heap_data = bytearray(b"\x00" * 8)
        name_off = {}
        for n in names:
            name_off[n] = len(heap_data)
            heap_data += n.encode() + b"\x00"
            heap_data += b"\x00" * (-len(heap_data) % 8)
        f.place("heap:data", _Blob().emit(bytes(heap_data)))

        heap = _Blob().emit(b"HEAP" + struct.pack("<B3x", 0))
        heap.emit(struct.pack("<QQ", len(heap_data), 1))
        heap.slot("heap:data")
        f.place("heap", heap)

        snod = _Blob().emit(b"SNOD" + struct.pack("<BBH", 1, 0, len(names)))
        for n in names:
            snod.emit(struct.pack("<Q", name_off[n]))
            snod.slot(f"oh:{n}")
            snod.emit(struct.pack("<II16x", 0, 0))
        f.place("snod", snod)

        bt = _Blob().emit(struct.pack("<4sBBH", b"TREE", 0, 0, 1))
        bt.emit(struct.pack("<QQ", UNDEF, UNDEF))
        bt.emit(struct.pack("<Q", 0))
        bt.slot("snod")
        bt.emit(struct.pack("<Q", name_off[names[-1]]))
        f.place("btree:root", bt)

        stbody = _Blob().slot("btree:root").slot("heap")
        f.place("oh:root", _object_header([_msg(0x0011, stbody)]))

    out = bytearray(f.finish())
    struct.pack_into("<Q", out, eof_off, len(out))
    with open(path, "wb") as fh:
        fh.write(bytes(out))
    return {
        "time": time_vals,
        "t_air": t_air,
        "batt": batt,
        "depth": depth,
        "n_time": n_time,
        "n_sensor": n_sensor,
    }


# ----------------------------------------------- data layout v4 (latest)
def _layout_v4_chunked(
    chunk: tuple[int, ...],
    elem: int,
    itype: int,
    addr_key: str,
    *,
    fsize: int | None = None,
    fmask: int = 0,
) -> _Blob:
    """Layout message v4 class 2 with a chunk index: 1=single chunk
    (optionally filtered), 2=implicit, 3=fixed array. Dims include the
    trailing element-size dim (like v3), each encoded in 8 bytes."""
    flags = 0x02 if (itype == 1 and fsize is not None) else 0
    out = _Blob().emit(
        struct.pack("<BBBBB", 4, 2, flags, len(chunk) + 1, 8)
    )
    for d in (*chunk, elem):
        out.emit(struct.pack("<Q", d))
    out.emit(struct.pack("<B", itype))
    if itype == 1 and fsize is not None:
        out.emit(struct.pack("<QI", fsize, fmask))
    if itype == 3:
        out.emit(struct.pack("<B", 10))  # page bits
    return out.slot(addr_key)


def _fixed_array(
    f: _File,
    prefix: str,
    entries: list[tuple[str | None, bytes]],
    client: int,
    entry_size: int,
) -> None:
    """FAHD header + unpaged FADB data block. entries: (data key or
    None for never-written, trailing bytes — empty for client 0,
    size+mask for client 1)."""
    db = _Blob().emit(b"FADB").emit(struct.pack("<BB", 0, client))
    db.slot(f"{prefix}:fahd")
    for key, extra in entries:
        if key:
            db.slot(key)
        else:
            db.emit(struct.pack("<Q", UNDEF))
        db.emit(extra)
    db.emit(b"\x00" * 4)  # checksum (unverified)
    f.place(f"{prefix}:fadb", db)

    hd = _Blob().emit(b"FAHD").emit(
        struct.pack("<BBBB", 0, client, entry_size, 10)
    )
    hd.emit(struct.pack("<Q", len(entries)))
    hd.slot(f"{prefix}:fadb")
    hd.emit(b"\x00" * 4)
    f.place(f"{prefix}:fahd", hd)


def _layout_v4_ea(
    chunk: tuple[int, ...],
    elem: int,
    addr_key: str,
    cparams: tuple[int, int, int, int, int],
) -> _Blob:
    """Layout message v4 class 2 with chunk index 4 (extensible array).
    ``cparams`` in LAYOUT-MESSAGE encode order: (max nelmts bits, index
    block elements, super block min data pointers, data block min
    elements, max data block page nelmts bits) — note the header stores
    the middle three in a DIFFERENT order (idx, dblk_min, sblk_min)."""
    out = _Blob().emit(struct.pack("<BBBBB", 4, 2, 0, len(chunk) + 1, 8))
    for d in (*chunk, elem):
        out.emit(struct.pack("<Q", d))
    out.emit(struct.pack("<B", 4))
    out.emit(struct.pack("<5B", *cparams))
    return out.slot(addr_key)


def _ea_entry(db: _Blob, entry, client: int) -> None:
    """One element record: client 0 = chunk address; client 1 =
    (address, stored size (8), filter mask (4)). ``entry`` is a data
    key (str), None (never written), or (key|None, size, mask)."""
    if client == 0:
        if entry is None:
            db.emit(struct.pack("<Q", UNDEF))
        else:
            db.slot(entry)
        return
    key, size, mask = entry if entry is not None else (None, 0, 0)
    if key is None:
        db.emit(struct.pack("<Q", UNDEF))
    else:
        db.slot(key)
    db.emit(size.to_bytes(8, "little") + struct.pack("<I", mask))


def _ea_data_block(
    f: _File, key: str, hdr_key: str, client: int,
    off_bytes: int, block_offset: int, entries: list,
) -> None:
    """EADB: sig, version, client id, header address, block offset
    (``off_bytes`` wide = ceil(max_nelmts_bits / 8)), elements,
    checksum (unverified, same policy as FADB)."""
    db = _Blob().emit(b"EADB").emit(struct.pack("<BB", 0, client))
    db.slot(hdr_key)
    db.emit(block_offset.to_bytes(off_bytes, "little"))
    for e in entries:
        _ea_entry(db, e, client)
    db.emit(b"\x00" * 4)
    f.place(key, db)


def _ea_super_block(
    f: _File, key: str, hdr_key: str,
    off_bytes: int, block_offset: int, dblk_keys: list,
) -> None:
    """EASB: sig, version, client id, header address, block offset,
    data block addresses (no page bitmap — unpaged fixtures only),
    checksum."""
    sb = _Blob().emit(b"EASB").emit(struct.pack("<BB", 0, 0))
    sb.slot(hdr_key)
    sb.emit(block_offset.to_bytes(off_bytes, "little"))
    for k in dblk_keys:
        if k is None:
            sb.emit(struct.pack("<Q", UNDEF))
        else:
            sb.slot(k)
    sb.emit(b"\x00" * 4)
    f.place(key, sb)


def _extensible_array(
    f: _File,
    prefix: str,
    *,
    client: int,
    elem_size: int,
    hdr_cparams: tuple[int, int, int, int, int],
    inline: list,
    direct_dblk_keys: list,
    sblk_keys: list,
) -> None:
    """EAHD + EAIB. ``hdr_cparams`` in HEADER encode order: (max nelmts
    bits, index block elements, data block min elements, super block
    min data pointers, max data block page nelmts bits). The CALLER
    supplies the literal pointer-slot lists (``direct_dblk_keys`` must
    hold every data-block slot of the super blocks below
    2*log2(sup_blk_min_data_ptrs); ``sblk_keys`` one slot per
    remaining super block) — hand-derived at each call site, never
    computed with the reader's schedule formula, so fixture and reader
    cannot share a transcription error."""
    ib = _Blob().emit(b"EAIB").emit(struct.pack("<BB", 0, client))
    ib.slot(f"{prefix}:eahd")
    for e in inline:
        _ea_entry(ib, e, client)
    for k in direct_dblk_keys:
        if k is None:
            ib.emit(struct.pack("<Q", UNDEF))
        else:
            ib.slot(k)
    for k in sblk_keys:
        if k is None:
            ib.emit(struct.pack("<Q", UNDEF))
        else:
            ib.slot(k)
    ib.emit(b"\x00" * 4)
    f.place(f"{prefix}:eaib", ib)

    hd = _Blob().emit(b"EAHD").emit(struct.pack("<BB", 0, client))
    hd.emit(struct.pack("<B", elem_size))
    hd.emit(struct.pack("<5B", *hdr_cparams))
    hd.emit(b"\x00" * 48)  # six length-sized stats (unread)
    hd.slot(f"{prefix}:eaib")
    hd.emit(b"\x00" * 4)
    f.place(f"{prefix}:eahd", hd)


def write_netcdf4_layout_ea(path: str) -> dict:
    """'latest' flavor exercising the EXTENSIBLE-ARRAY chunk index
    (r17, VERDICT r16 item 8) — what libhdf5 emits for chunked
    datasets with an unlimited dimension. Three variables over an
    unlimited time dim (n_time=16) cover the three block classes:

    * ``time`` (int64, chunk 2 -> 8 chunks) uses the libhdf5
      DATASET-CHUNK DEFAULT creation parameters (max bits 32, index
      elements 4, super block min pointers 4, data block min elements
      16, page bits 10). Hand-derived literals: the index block holds
      4 inline elements (chunks 0-3), then SIX direct data-block
      slots — super blocks below 2*log2(4)=4 never materialize and
      their data blocks (1 of 16 elmts, 1 of 32, 2 of 32, 2 of 64)
      hang off the index block — then 25 super-block slots (nsblks =
      1 + (32 - log2(16)) = 29, minus the 4 index-block-resident
      ones). Chunks 4-7 land in the first direct data block (block
      offset 4, 16 element slots, 12 never written); every other
      pointer slot is UNDEF.
    * ``press`` (float64, chunk 5 -> 4 chunks) is CLIENT 1 (deflate
      filter pipeline): all 4 chunks fit the 4 inline elements, each a
      20-byte (address, stored size, filter mask) record; chunk 3 is
      never written and reads as the fill value.
    * ``depth`` (2-D (time, sensor), int64, chunk (1,3) -> 16 chunks)
      uses SMALL custom parameters (max bits 16 -> 2-byte block
      offsets, index elements 1, super block min pointers 2, data
      block min elements 2, page bits 8) so materialized EASB super
      blocks appear within 16 chunks. Hand-derived literals: 1 inline
      element (chunk 0); direct data blocks for super blocks below
      2*log2(2)=2 — s0 = one 2-element block (chunks 1-2, offset 1),
      s1 = one 4-element block (chunks 3-6, offset 3, chunk 5 never
      written -> fill) — then 14 super-block slots (nsblks =
      1 + (16 - log2(2)) = 16, minus 2): s2 materialized (2 data
      blocks x 4 elements, offset 7; first block chunks 7-10, second
      chunks 11-14), s3 materialized (2 data blocks x 8 elements,
      offset 15; first block holds chunk 15 in slot 0, 7 slots
      unwritten, second block UNDEF), s4.. UNDEF.

    All pointer-slot counts and block offsets above are hand-written
    literals derived from the H5EA design on paper — never computed
    with the reader's schedule formula (see hdf5.py's module
    docstring for why that independence matters)."""
    n_time, n_sensor = 16, 3
    rng = np.random.default_rng(17)
    time_vals = np.arange(n_time, dtype=np.int64) * 1800
    press = np.round(rng.normal(101.3, 0.8, n_time), 6)
    press_fill = -9.9
    press[15:] = press_fill  # chunk 3 (rows 15) never written
    depth = rng.integers(-500, 500, (n_time, n_sensor)).astype(np.int64)
    depth_fill = -99
    depth[5] = depth_fill  # chunk 5 never written

    f = _File()
    sb = _Blob().emit(b"\x89HDF\r\n\x1a\n")
    sb.emit(struct.pack("<BBBB", 3, 8, 8, 0))
    sb.emit(struct.pack("<QQ", 0, UNDEF))
    eof_off = len(sb.b)
    sb.emit(struct.pack("<Q", 0))
    sb.slot("oh:root")
    sb.emit(b"\x00\x00\x00\x00")
    f.place(None, sb)

    # ---- time: EA, defaults, client 0, 8 chunks of 2 ----
    for c in range(8):
        f.place(
            f"data:time{c}",
            _Blob().emit(time_vals[c * 2 : c * 2 + 2].astype("<i8").tobytes()),
        )
    _ea_data_block(
        f, "ea:time:d0", "ea:time:eahd", client=0, off_bytes=4,
        block_offset=4,
        entries=[f"data:time{c}" for c in range(4, 8)] + [None] * 12,
    )
    _extensible_array(
        f, "ea:time", client=0, elem_size=8,
        hdr_cparams=(32, 4, 16, 4, 10),  # header order: dblk_min, sblk_min
        inline=[f"data:time{c}" for c in range(4)],
        direct_dblk_keys=["ea:time:d0", None, None, None, None, None],
        sblk_keys=[None] * 25,
    )

    # ---- press: EA, defaults, CLIENT 1 (deflate), 4 chunks of 5 ----
    press_inline = []
    for c in range(3):  # chunk 3 never written
        raw = press[c * 5 : c * 5 + 5].astype("<f8").tobytes()
        comp = zlib.compress(raw, 6)
        f.place(f"data:press{c}", _Blob().emit(comp))
        press_inline.append((f"data:press{c}", len(comp), 0))
    press_inline.append(None)
    _extensible_array(
        f, "ea:press", client=1, elem_size=20,
        hdr_cparams=(32, 4, 16, 4, 10),
        inline=press_inline,
        direct_dblk_keys=[None] * 6,
        sblk_keys=[None] * 25,
    )

    # ---- depth: EA, custom small params, client 0, 16 chunks of (1,3)
    for c in range(16):
        if c == 5:
            continue  # never written
        f.place(
            f"data:depth{c}", _Blob().emit(depth[c].astype("<i8").tobytes())
        )
    _ea_data_block(
        f, "ea:depth:d0", "ea:depth:eahd", client=0, off_bytes=2,
        block_offset=1, entries=["data:depth1", "data:depth2"],
    )
    _ea_data_block(
        f, "ea:depth:d1", "ea:depth:eahd", client=0, off_bytes=2,
        block_offset=3,
        entries=["data:depth3", "data:depth4", None, "data:depth6"],
    )
    _ea_data_block(
        f, "ea:depth:s2d0", "ea:depth:eahd", client=0, off_bytes=2,
        block_offset=7,
        entries=[f"data:depth{c}" for c in range(7, 11)],
    )
    _ea_data_block(
        f, "ea:depth:s2d1", "ea:depth:eahd", client=0, off_bytes=2,
        block_offset=11,
        entries=[f"data:depth{c}" for c in range(11, 15)],
    )
    _ea_super_block(
        f, "ea:depth:s2", "ea:depth:eahd", off_bytes=2, block_offset=7,
        dblk_keys=["ea:depth:s2d0", "ea:depth:s2d1"],
    )
    _ea_data_block(
        f, "ea:depth:s3d0", "ea:depth:eahd", client=0, off_bytes=2,
        block_offset=15, entries=["data:depth15"] + [None] * 7,
    )
    _ea_super_block(
        f, "ea:depth:s3", "ea:depth:eahd", off_bytes=2, block_offset=15,
        dblk_keys=["ea:depth:s3d0", None],
    )
    _extensible_array(
        f, "ea:depth", client=0, elem_size=8,
        hdr_cparams=(16, 1, 2, 2, 8),
        inline=["data:depth0"],
        direct_dblk_keys=["ea:depth:d0", "ea:depth:d1"],
        sblk_keys=["ea:depth:s2", "ea:depth:s3"] + [None] * 12,
    )

    # ---- netCDF4 dressing: dim scales, DIMENSION_LIST, headers ----
    gh = _Blob()
    payload = _Blob()
    for i, key in ((1, "oh:time"), (2, "oh:sensor")):
        payload.emit(struct.pack("<HHIQ", i, 1, 0, 8))
        payload.slot(key)
    total = 16 + len(payload.b) + 16
    gh.emit(b"GCOL" + struct.pack("<B3xQ", 1, total))
    gh.splice(payload)
    gh.emit(struct.pack("<HHIQ", 0, 0, 0, 16))
    f.place("gheap", gh)

    def vref(gidx: int) -> _Blob:
        return (
            _Blob()
            .emit(struct.pack("<I", 1))
            .slot("gheap")
            .emit(struct.pack("<I", gidx))
        )

    def dim_list(gidxs: list[int]) -> _Blob:
        data = _Blob()
        for gi in gidxs:
            data.splice(vref(gi))
        return _msg2(
            0x000C,
            _attr3(
                "DIMENSION_LIST",
                _dt_vlen(string=False),
                _dataspace((len(gidxs),)),
                data,
            ),
        )

    def sattr(name: str, val: str) -> _Blob:
        raw = val.encode() + b"\x00"
        return _msg2(
            0x000C, _attr3(name, _dt_string(len(raw)), _dataspace(()), raw)
        )

    f.place(
        "oh:time",
        _object_header_v2(
            [
                _msg2(0x0001, _dataspace((n_time,), (UNDEF,))),
                _msg2(0x0003, _dt_int(8)),
                _msg2(
                    0x0008,
                    # layout-message cparam order: max bits, idx elmts,
                    # SBLK min ptrs, DBLK min elmts, page bits
                    _layout_v4_ea((2,), 8, "ea:time:eahd", (32, 4, 4, 16, 10)),
                ),
                sattr("CLASS", "DIMENSION_SCALE"),
                sattr("NAME", "time"),
            ]
        ),
    )
    sensor_layout = (
        _Blob()
        .emit(struct.pack("<BB", 4, 1))
        .emit(struct.pack("<QQ", UNDEF, n_sensor * 8))
    )
    f.place(
        "oh:sensor",
        _object_header_v2(
            [
                _msg2(0x0001, _dataspace((n_sensor,))),
                _msg2(0x0003, _dt_float64()),
                _msg2(0x0008, sensor_layout),
                sattr("CLASS", "DIMENSION_SCALE"),
                sattr(
                    "NAME",
                    "This is a netCDF dimension but not a netCDF variable."
                    f" {n_sensor}",
                ),
            ]
        ),
    )
    f.place(
        "oh:press",
        _object_header_v2(
            [
                _msg2(0x0001, _dataspace((n_time,), (UNDEF,))),
                _msg2(0x0003, _dt_float64()),
                _msg2(
                    0x0008,
                    _layout_v4_ea((5,), 8, "ea:press:eahd", (32, 4, 4, 16, 10)),
                ),
                _msg2(0x000B, _filter_pipeline_v2([(1, (6,))])),
                _msg2(0x0005, _fill_value_v3(struct.pack("<d", press_fill))),
                dim_list([1]),
            ]
        ),
    )
    f.place(
        "oh:depth",
        _object_header_v2(
            [
                _msg2(0x0001, _dataspace((n_time, n_sensor), (UNDEF, n_sensor))),
                _msg2(0x0003, _dt_int(8)),
                _msg2(
                    0x0008,
                    _layout_v4_ea(
                        (1, n_sensor), 8, "ea:depth:eahd", (16, 1, 2, 2, 8)
                    ),
                ),
                _msg2(
                    0x0005, _fill_value_v3(struct.pack("<q", depth_fill))
                ),
                dim_list([1, 2]),
            ]
        ),
    )

    names = sorted(["time", "sensor", "press", "depth"])

    def link_msg(n: str) -> _Blob:
        body = _Blob().emit(struct.pack("<BBB", 1, 0, len(n)))
        body.emit(n.encode()).slot(f"oh:{n}")
        return _msg2(0x0006, body)

    f.place(
        "oh:root",
        _object_header_v2(
            [_msg2(0x0002, struct.pack("<BBQQ", 0, 0, UNDEF, UNDEF))]
            + [link_msg(n) for n in names]
        ),
    )

    out = bytearray(f.finish())
    struct.pack_into("<Q", out, eof_off, len(out))
    with open(path, "wb") as fh:
        fh.write(bytes(out))
    return {
        "time": time_vals,
        "press": press,
        "depth": depth,
        "n_time": n_time,
        "n_sensor": n_sensor,
    }


def write_netcdf4_layout_v4(
    path: str, n_time: int = 48, n_sensor: int = 3, *, compress: bool = False
) -> dict:
    """Fixed-dims 'latest' flavor exercising data layout v4: superblock
    v3 + OHDR v2; time = single-chunk index; batt = implicit index
    (dense row-major chunk grid, 4 chunks); depth = fixed-array index
    (2 chunks; with ``compress`` the entries are filtered client-1
    triples through shuffle+deflate+fletcher32, and the second chunk is
    never written so the fill-value message shows through); t_air =
    contiguous v4."""
    rng = np.random.default_rng(7)
    time_vals = np.arange(n_time, dtype=np.int64) * 3600
    t_air = np.round(
        np.round(rng.normal(-5, 8, n_time), 3) * 1000
    ).astype(np.int32)
    batt = (12000 + rng.integers(0, 500, n_time)).astype(np.int32)
    depth = np.round(rng.normal(2.0, 0.5, (n_time, n_sensor)), 6)
    half = n_time // 2
    depth_fill = -2.5
    if compress:
        depth[half:] = depth_fill

    f = _File()
    sb = _Blob().emit(b"\x89HDF\r\n\x1a\n")
    sb.emit(struct.pack("<BBBB", 3, 8, 8, 0))
    sb.emit(struct.pack("<QQ", 0, UNDEF))
    eof_off = len(sb.b)
    sb.emit(struct.pack("<Q", 0))
    sb.slot("oh:root")
    sb.emit(b"\x00\x00\x00\x00")
    f.place(None, sb)

    # data blocks
    f.place("data:time", _Blob().emit(time_vals.astype("<i8").tobytes()))
    f.place("data:t_air", _Blob().emit(t_air.astype("<i4").tobytes()))
    f.place("data:batt", _Blob().emit(batt.astype("<i4").tobytes()))
    d0_raw = depth[:half].astype("<f8").tobytes()
    if compress:
        d0 = zlib.compress(_shuffle_bytes(d0_raw, 8), 6)
        d0_stored = d0 + struct.pack("<I", fletcher32_naive(d0))
        f.place("data:depth0", _Blob().emit(d0_stored))
        entries = [
            ("data:depth0", len(d0_stored).to_bytes(8, "little")
             + struct.pack("<I", 0)),
            (None, (0).to_bytes(8, "little") + struct.pack("<I", 0)),
        ]
        _fixed_array(f, "farr:depth", entries, client=1, entry_size=20)
    else:
        f.place("data:depth0", _Blob().emit(d0_raw))
        f.place(
            "data:depth1",
            _Blob().emit(depth[half:].astype("<f8").tobytes()),
        )
        _fixed_array(
            f,
            "farr:depth",
            [("data:depth0", b""), ("data:depth1", b"")],
            client=0,
            entry_size=8,
        )

    # global heap: dim-scale object refs for DIMENSION_LIST
    gh = _Blob()
    payload = _Blob()
    for i, key in ((1, "oh:time"), (2, "oh:sensor")):
        payload.emit(struct.pack("<HHIQ", i, 1, 0, 8))
        payload.slot(key)
    total = 16 + len(payload.b) + 16
    gh.emit(b"GCOL" + struct.pack("<B3xQ", 1, total))
    gh.splice(payload)
    gh.emit(struct.pack("<HHIQ", 0, 0, 0, 16))
    f.place("gheap", gh)

    def vref(gidx: int) -> _Blob:
        return (
            _Blob()
            .emit(struct.pack("<I", 1))
            .slot("gheap")
            .emit(struct.pack("<I", gidx))
        )

    def dim_list(gidxs: list[int]) -> _Blob:
        data = _Blob()
        for gi in gidxs:
            data.splice(vref(gi))
        return _msg2(
            0x000C,
            _attr3(
                "DIMENSION_LIST",
                _dt_vlen(string=False),
                _dataspace((len(gidxs),)),
                data,
            ),
        )

    def sattr(name: str, val: str) -> _Blob:
        raw = val.encode() + b"\x00"
        return _msg2(
            0x000C, _attr3(name, _dt_string(len(raw)), _dataspace(()), raw)
        )

    # time: single-chunk index (chunk == full extent)
    f.place(
        "oh:time",
        _object_header_v2(
            [
                _msg2(0x0001, _dataspace((n_time,))),
                _msg2(0x0003, _dt_int(8)),
                _msg2(
                    0x0008,
                    _layout_v4_chunked((n_time,), 8, 1, "data:time"),
                ),
                sattr("CLASS", "DIMENSION_SCALE"),
                sattr("NAME", "time"),
            ]
        ),
    )
    # sensor: pure dimension, contiguous unallocated
    sensor_layout = (
        _Blob()
        .emit(struct.pack("<BB", 4, 1))
        .emit(struct.pack("<QQ", UNDEF, n_sensor * 8))
    )
    f.place(
        "oh:sensor",
        _object_header_v2(
            [
                _msg2(0x0001, _dataspace((n_sensor,))),
                _msg2(0x0003, _dt_float64()),
                _msg2(0x0008, sensor_layout),
                sattr("CLASS", "DIMENSION_SCALE"),
                sattr(
                    "NAME",
                    "This is a netCDF dimension but not a netCDF variable."
                    f" {n_sensor}",
                ),
            ]
        ),
    )
    # t_air: contiguous v4 + packing attrs
    f.place(
        "oh:t_air",
        _object_header_v2(
            [
                _msg2(0x0001, _dataspace((n_time,))),
                _msg2(0x0003, _dt_int(4)),
                _msg2(
                    0x0008,
                    _Blob()
                    .emit(struct.pack("<BB", 4, 1))
                    .slot("data:t_air")
                    .emit(struct.pack("<Q", n_time * 4)),
                ),
                _msg2(
                    0x000C,
                    _attr3(
                        "scale_factor",
                        _dt_float64(),
                        _dataspace(()),
                        struct.pack("<d", 0.001),
                    ),
                ),
                dim_list([1]),
            ]
        ),
    )
    # batt: implicit index, 4 dense chunks
    assert n_time % 4 == 0
    f.place(
        "oh:batt",
        _object_header_v2(
            [
                _msg2(0x0001, _dataspace((n_time,))),
                _msg2(0x0003, _dt_int(4)),
                _msg2(
                    0x0008,
                    _layout_v4_chunked(
                        (n_time // 4,), 4, 2, "data:batt"
                    ),
                ),
                dim_list([1]),
            ]
        ),
    )
    # depth: fixed-array index (+ filters and fill when compressed)
    depth_msgs = [
        _msg2(0x0001, _dataspace((n_time, n_sensor))),
        _msg2(0x0003, _dt_float64()),
        _msg2(
            0x0008,
            _layout_v4_chunked(
                (half, n_sensor), 8, 3, "farr:depth:fahd"
            ),
        ),
    ]
    if compress:
        depth_msgs.append(
            _msg2(
                0x000B,
                _filter_pipeline_v2([(2, (8,)), (1, (6,)), (3, ())]),
            )
        )
        depth_msgs.append(
            _msg2(0x0005, _fill_value_v3(struct.pack("<d", depth_fill)))
        )
    depth_msgs.append(dim_list([1, 2]))
    f.place("oh:depth", _object_header_v2(depth_msgs))

    # root group: plain link messages
    names = sorted(["time", "sensor", "t_air", "batt", "depth"])

    def link_msg(n: str) -> _Blob:
        body = _Blob().emit(struct.pack("<BBB", 1, 0, len(n)))
        body.emit(n.encode()).slot(f"oh:{n}")
        return _msg2(0x0006, body)

    f.place(
        "oh:root",
        _object_header_v2(
            [_msg2(0x0002, struct.pack("<BBQQ", 0, 0, UNDEF, UNDEF))]
            + [link_msg(n) for n in names]
        ),
    )

    out = bytearray(f.finish())
    struct.pack_into("<Q", out, eof_off, len(out))
    with open(path, "wb") as fh:
        fh.write(bytes(out))
    return {
        "time": time_vals,
        "t_air": t_air,
        "batt": batt,
        "depth": depth,
        "n_time": n_time,
        "n_sensor": n_sensor,
    }
