"""Minimal from-spec HDF5 reader for the netCDF4 classic-model subset.

The reference's ``to_netcdf`` (``bin/fs_process_l2.py:198-204``) writes
NETCDF4 — an HDF5 container — whenever the netCDF4 library is present;
the engine's own canonical interchange stays classic NetCDF-3
(``netcdf3.py``), but a user handing the engine a real reference ``.nc``
must not hit a wall. This module implements exactly the subset that
encoding produces, from the public HDF5 File Format Specification
(v1.10, https://docs.hdfgroup.org/hdf5/develop/_f_m_t3.html):

* superblock v0 (libhdf5 default) and v2/v3 (``libver='latest'``)
* symbol-table groups (B-tree v1 + local heap + SNOD) and v2 object
  headers with link messages
* object header v1/v2 with continuations
* dataspace v1/v2 (incl. unlimited maxdims — the record dimension),
  datatypes: fixed-point, IEEE float, fixed string, vlen string/sequence,
  object reference
* data layout v3: compact, contiguous, and chunked via the v1 chunk
  B-tree; filter pipelines v1/v2 with deflate (stdlib ``zlib``),
  shuffle, and fletcher32 (verified) — the standard netCDF4
  ``zlib=True`` stack, beyond the reference's own ``zlib=False``
* data layout v4 (``libver='latest'``): single-chunk, implicit,
  fixed-array (FAHD/FADB, unpaged, plain or filtered entries) and
  extensible-array (EAHD/EAIB/EADB/EASB — what libhdf5 picks for
  unlimited dims; r17) chunk indexes; the v2-B-tree index, paged
  EA data blocks, and EA super-block page bitmaps gate honestly
* fill-value messages (0x0004/0x0005) honored for unallocated
  contiguous data and missing chunks (netCDF4's defaults are non-zero)
* attributes v1/v2/v3, vlen payloads via global heap collections (GCOL)
* dense (``libver='latest'``) attribute and link storage: fractal heap
  (FRHP/FHDB/FHIB, managed objects, unfiltered) + v2 B-tree name
  indexes (BTHD/BTLF, depth 0 — thousands of records fit one node)
* the netCDF4 data model on top: dimension-scale datasets define dims
  (``CLASS=DIMENSION_SCALE``), data variables bind dims through
  ``DIMENSION_LIST`` object references

Anything outside the subset (non-deflate filters such as szip,
filtered fractal heaps, multi-level dense-index B-trees, nested
indirect heap blocks, huge/tiny heap object classes, compound/enum
types, paged extensible-array blocks) raises ``NotImplementedError``
naming the feature — the honest-gate convention shared with the image
codecs; the ``sources/netcdf.py`` caller routes those to the optional
netCDF4/h5py libraries when installed.

The extensible-array index was gated through r16 because its
super-block/data-block doubling arithmetic is the most
transcription-fragile structure in the format: with no libhdf5-written
validation artifact in the container, a from-memory writer+reader pair
sharing one misread of the growth rule would round-trip green while
misplacing every chunk of a real file. The r17 implementation
(VERDICT r16 item 8) mitigates exactly that failure mode: the reader
computes the schedule from the H5EA formula
(``super block s = 2^(s//2) data blocks × data_blk_min_elmts *
2^((s+1)//2) elements``; index block carries the first
``idx_blk_elmts`` elements inline plus direct addresses for the data
blocks of the first ``2*log2(sup_blk_min_data_ptrs)`` super blocks),
while the test fixture lays its blocks out from HAND-WRITTEN literal
schedules — derived independently from the design, never from the
reader's formula — at TWO creation-parameter sets (the libhdf5
dataset-chunk defaults 32/4/4/16/10 and a small custom set that
forces a materialized EASB super block within a 9-chunk dataset).
Agreement between formula-driven reading and literal-table writing is
the strongest validation available without a libhdf5 artifact; a
shared conceptual misread remains possible and is documented here
rather than hidden.
"""

from __future__ import annotations

import struct
import zlib
from dataclasses import dataclass, field

import numpy as np

SIGNATURE = b"\x89HDF\r\n\x1a\n"
UNDEF = 0xFFFFFFFFFFFFFFFF


@dataclass
class H5Dataset:
    name: str
    shape: tuple[int, ...]
    maxshape: tuple[int, ...]
    dtype: "_DType"
    attrs: dict[str, object]
    layout: tuple  # ("contiguous", addr, size) | ("chunked", btree, chunk)
                   # | ("compact", bytes)
    header_addr: int = 0
    filters: tuple = ()  # ((filter_id, flags, client_data), ...) write order
    fill: bytes | None = None  # raw fill-value bytes (message 0x0004/0x0005)

    def is_dim_scale(self) -> bool:
        c = self.attrs.get("CLASS")
        return c == "DIMENSION_SCALE"


@dataclass
class _DType:
    cls: int
    size: int
    signed: bool = True
    base: "_DType | None" = None  # vlen base
    vlen_string: bool = False

    def numpy(self) -> np.dtype:
        if self.cls == 0:
            return np.dtype(f"<{'i' if self.signed else 'u'}{self.size}")
        if self.cls == 1:
            return np.dtype(f"<f{self.size}")
        if self.cls == 3:
            return np.dtype(f"S{self.size}")
        raise NotImplementedError(f"HDF5 datatype class {self.cls} as array")


class _Reader:
    def __init__(self, buf: bytes):
        self.buf = buf
        # the spec allows the superblock at byte 0 or any doubling of 512
        base = 0
        while buf[base : base + 8] != SIGNATURE:
            base = 512 if base == 0 else base * 2
            if base + 8 > len(buf):
                raise ValueError("not an HDF5 file")
        if base != 0:
            raise NotImplementedError(
                f"HDF5 superblock at userblock offset {base}"
            )
        ver = buf[8]
        if ver == 0:
            # offsets/lengths sizes at 13/14; root symbol-table entry at 24
            self.offsz = buf[13]
            self.lensz = buf[14]
            if (self.offsz, self.lensz) != (8, 8):
                raise NotImplementedError(
                    f"HDF5 offset/length sizes {self.offsz}/{self.lensz}"
                )
            # 24: base O, freespace O, eof O, driver O, then root entry
            root_entry = 24 + 4 * self.offsz
            self.root = struct.unpack_from("<Q", buf, root_entry + 8)[0]
        elif ver in (2, 3):
            self.offsz, self.lensz = buf[9], buf[10]
            if (self.offsz, self.lensz) != (8, 8):
                raise NotImplementedError(
                    f"HDF5 offset/length sizes {self.offsz}/{self.lensz}"
                )
            self.root = struct.unpack_from("<Q", buf, 12 + 3 * 8)[0]
        else:
            raise NotImplementedError(f"HDF5 superblock version {ver}")

    # ---------------------------------------------------------- low level
    def u(self, fmt: str, pos: int):
        return struct.unpack_from("<" + fmt, self.buf, pos)

    # ------------------------------------------------------ object header
    def object_header(self, addr: int) -> list[tuple[int, bytes]]:
        """-> [(msg_type, body bytes)] with continuations resolved."""
        buf = self.buf
        if buf[addr : addr + 4] == b"OHDR":
            return self._object_header_v2(addr)
        version, _, nmsgs = struct.unpack_from("<BBH", buf, addr)
        if version != 1:
            raise NotImplementedError(f"object header version {version}")
        hdr_size = struct.unpack_from("<I", buf, addr + 8)[0]
        msgs: list[tuple[int, bytes]] = []
        blocks = [(addr + 16, hdr_size)]
        while blocks and len(msgs) < nmsgs:
            pos, remaining = blocks.pop(0)
            while remaining >= 8 and len(msgs) < nmsgs:
                mtype, msize, _flags = struct.unpack_from("<HHB", buf, pos)
                body = bytes(buf[pos + 8 : pos + 8 + msize])
                pos += 8 + msize
                remaining -= 8 + msize
                if mtype == 0x0010:  # continuation
                    o, ln = struct.unpack_from("<QQ", body)
                    blocks.append((o, ln))
                else:
                    msgs.append((mtype, body))
        return msgs

    def _object_header_v2(self, addr: int) -> list[tuple[int, bytes]]:
        buf = self.buf
        pos = addr + 4
        _ver, flags = buf[pos], buf[pos + 1]
        pos += 2
        if flags & 0x20:
            pos += 16  # times
        if flags & 0x10:
            pos += 4  # compact/dense bounds
        csize_bytes = 1 << (flags & 0x3)
        chunk0 = int.from_bytes(buf[pos : pos + csize_bytes], "little")
        pos += csize_bytes
        msgs: list[tuple[int, bytes]] = []
        # "size of chunk 0" counts the message region only — the trailing
        # 4-byte checksum is header overhead outside it (libhdf5
        # H5O_SIZEOF_HDR); continuation lengths DO include the OCHK magic
        # and their checksum, so pre-trim both when queueing the block.
        blocks = [(pos, chunk0)]
        while blocks:
            p, ln = blocks.pop(0)
            end = p + ln
            while p + 4 <= end:
                mtype = buf[p]
                msize = struct.unpack_from("<H", buf, p + 1)[0]
                mflags = buf[p + 3]
                p += 4
                if flags & 0x04:
                    p += 2  # creation order
                body = bytes(buf[p : p + msize])
                p += msize
                if mtype == 0x10:
                    o, ln2 = struct.unpack_from("<QQ", body)
                    blocks.append((o + 4, ln2 - 8))  # strip OCHK + checksum
                elif mtype != 0:
                    msgs.append((mtype, body))
                del mflags
        return msgs

    # ------------------------------------------------- fractal heap (v1.8+)
    def _fheap_header(self, addr: int) -> dict:
        """Fractal Heap header (FRHP) -> the lookup parameters the dense
        attribute/link indexes need. Filtered heaps and huge/tiny object
        classes stay honest gates."""
        buf = self.buf
        if buf[addr : addr + 4] != b"FRHP":
            raise ValueError("bad fractal heap signature")
        id_len, filt_len = struct.unpack_from("<HH", buf, addr + 5)
        flags = buf[addr + 9]
        if filt_len:
            raise NotImplementedError("filtered fractal heap")
        p = addr + 110  # past the 8 huge/tiny/free-space statistics fields
        width, start_sz, max_direct = struct.unpack_from("<HQQ", buf, p)
        max_heap_bits, _start_rows = struct.unpack_from("<HH", buf, p + 18)
        root = struct.unpack_from("<Q", buf, p + 22)[0]
        cur_rows = struct.unpack_from("<H", buf, p + 30)[0]
        off_bytes = (max_heap_bits + 7) // 8
        return {
            "id_len": id_len,
            "off_bytes": off_bytes,
            "len_bytes": id_len - 1 - off_bytes,
            "width": width,
            "start_sz": start_sz,
            "max_direct": max_direct,
            "root": root,
            "cur_rows": cur_rows,  # 0 -> root is a direct block
            "block_chk": bool(flags & 0x02),
        }

    def _fheap_row_size(self, hdr: dict, row: int) -> int:
        return hdr["start_sz"] * (1 << max(0, row - 1))

    def _fheap_direct_base(self, hdr: dict, addr: int) -> int:
        """Start of object space inside a direct block (FHDB): heap
        offsets INCLUDE the block header bytes, so callers add
        ``off - block_off`` to the block's file address directly; this
        only validates the signature."""
        if self.buf[addr : addr + 4] != b"FHDB":
            raise ValueError("bad fractal heap direct block signature")
        return addr

    def _fheap_locate(self, hdr: dict, off: int) -> tuple[int, int]:
        """heap offset -> (direct block file address, block heap offset)."""
        if hdr["cur_rows"] == 0:  # root is one direct block at offset 0
            return self._fheap_direct_base(hdr, hdr["root"]), 0
        buf = self.buf
        addr = hdr["root"]
        if buf[addr : addr + 4] != b"FHIB":
            raise ValueError("bad fractal heap indirect block signature")
        p = addr + 4 + 1 + 8 + hdr["off_bytes"]  # sig, ver, hdr addr, off
        width = hdr["width"]
        import math

        max_direct_rows = (
            int(math.log2(hdr["max_direct"]))
            - int(math.log2(hdr["start_sz"]))
            + 2
        )
        block_start = 0
        for row in range(hdr["cur_rows"]):
            if row >= max_direct_rows:
                raise NotImplementedError(
                    "nested indirect fractal heap blocks"
                )
            rsz = self._fheap_row_size(hdr, row)
            for col in range(width):
                if block_start <= off < block_start + rsz:
                    child = struct.unpack_from(
                        "<Q", buf, p + (row * width + col) * 8
                    )[0]
                    return (
                        self._fheap_direct_base(hdr, child),
                        block_start,
                    )
                block_start += rsz
        raise ValueError(f"fractal heap offset {off} beyond heap extent")

    def _fheap_read_id(self, hdr: dict, heap_id: bytes) -> bytes:
        """Managed heap ID -> object bytes."""
        idtype = (heap_id[0] >> 4) & 0x3
        if idtype != 0:
            raise NotImplementedError(
                "huge/tiny fractal heap object class"
            )
        ob = hdr["off_bytes"]
        off = int.from_bytes(heap_id[1 : 1 + ob], "little")
        ln = int.from_bytes(
            heap_id[1 + ob : 1 + ob + hdr["len_bytes"]], "little"
        )
        addr, block_off = self._fheap_locate(hdr, off)
        start = addr + (off - block_off)
        return bytes(self.buf[start : start + ln])

    # ---------------------------------------------------------- B-tree v2
    def _btree2_records(self, addr: int) -> tuple[int, list[bytes]]:
        """B-tree v2 (BTHD) -> (record type, [raw records]). Depth-0
        trees (a single leaf — thousands of dense attr/link records fit
        one default-size node) decode; deeper trees gate honestly."""
        buf = self.buf
        if buf[addr : addr + 4] != b"BTHD":
            raise ValueError("bad v2 B-tree signature")
        rectype = buf[addr + 5]
        rec_size, depth = struct.unpack_from("<HH", buf, addr + 10)
        root, root_nrec = struct.unpack_from("<QH", buf, addr + 16)
        if depth != 0:
            raise NotImplementedError(
                "multi-level dense-storage v2 B-tree"
            )
        if root == UNDEF or root_nrec == 0:  # empty index
            return rectype, []
        if buf[root : root + 4] != b"BTLF":
            raise ValueError("bad v2 B-tree leaf signature")
        p = root + 6  # sig, version, type
        recs = [
            bytes(buf[p + i * rec_size : p + (i + 1) * rec_size])
            for i in range(root_nrec)
        ]
        return rectype, recs

    def dense_attributes(self, body: bytes) -> dict[str, object] | None:
        """Attribute Info message (0x0015) -> attributes from dense
        (fractal-heap) storage, or None when storage is still compact.
        Record type 8: heap ID (8) + message flags (1) + creation order
        (4) + name hash (4); the heap object is the attribute message."""
        flags = body[1]
        pos = 2 + (2 if flags & 0x01 else 0)
        fheap, name_bt = struct.unpack_from("<QQ", body, pos)
        if fheap == UNDEF:
            return None
        if name_bt == UNDEF:
            raise NotImplementedError(
                "dense attribute storage without a name index"
            )
        hdr = self._fheap_header(fheap)
        rectype, recs = self._btree2_records(name_bt)
        if rectype != 8:
            raise ValueError(
                f"attribute name index has record type {rectype}"
            )
        attrs: dict[str, object] = {}
        for rec in recs:
            msg = self._fheap_read_id(hdr, rec[: hdr["id_len"]])
            k, v = self.parse_attribute(msg)
            attrs[k] = v
        return attrs

    def _dense_links(self, body: bytes, out: dict[str, int]) -> None:
        """Link Info message (0x0002) with a defined fractal heap ->
        walk the name index (record type 5: hash (4) + heap ID (7)) and
        parse each heap object as a link message."""
        flags = body[1]
        pos = 2 + (8 if flags & 0x01 else 0)
        fheap, name_bt = struct.unpack_from("<QQ", body, pos)
        if fheap == UNDEF:
            return
        if name_bt == UNDEF:
            raise NotImplementedError(
                "dense link storage without a name index"
            )
        hdr = self._fheap_header(fheap)
        rectype, recs = self._btree2_records(name_bt)
        if rectype != 5:
            raise ValueError(f"link name index has record type {rectype}")
        for rec in recs:
            msg = self._fheap_read_id(hdr, rec[4 : 4 + hdr["id_len"]])
            name, target = self._parse_link_msg(msg)
            if target is not None:
                out[name] = target

    # ------------------------------------------------------------- groups
    def group_links(self, addr: int) -> dict[str, int]:
        """group object header -> {link name: child object header addr}."""
        links: dict[str, int] = {}
        for mtype, body in self.object_header(addr):
            if mtype == 0x0011:  # symbol table
                btree, heap = struct.unpack_from("<QQ", body)
                self._walk_group_btree(btree, heap, links)
            elif mtype == 0x0006:  # link message (v2 groups)
                name, target = self._parse_link_msg(body)
                if target is not None:
                    links[name] = target
            elif mtype == 0x0002:  # link info: dense storage walks the
                self._dense_links(body, links)  # fractal heap + B-tree v2
        return links

    def _parse_link_msg(self, body: bytes) -> tuple[str, int | None]:
        ver, flags = body[0], body[1]
        pos = 2
        ltype = 0
        if flags & 0x08:
            ltype = body[pos]
            pos += 1
        if flags & 0x04:
            pos += 8  # creation order
        if flags & 0x10:
            pos += 1  # charset
        lsz = 1 << (flags & 0x3)
        nlen = int.from_bytes(body[pos : pos + lsz], "little")
        pos += lsz
        name = body[pos : pos + nlen].decode("utf-8")
        pos += nlen
        if ltype != 0:
            return name, None  # soft/external links: ignore
        del ver
        return name, struct.unpack_from("<Q", body, pos)[0]

    def _walk_group_btree(self, btree: int, heap: int, out: dict[str, int]):
        buf = self.buf
        if buf[btree : btree + 4] != b"TREE":
            raise ValueError("bad group B-tree signature")
        _ntype, level, nent = struct.unpack_from("<BBH", buf, btree + 4)
        pos = btree + 8 + 2 * self.offsz  # skip siblings
        children = []
        pos += self.lensz  # key 0
        for _ in range(nent):
            children.append(struct.unpack_from("<Q", buf, pos)[0])
            pos += self.offsz + self.lensz  # child + next key
        for child in children:
            if level > 0:
                self._walk_group_btree(child, heap, out)
            else:
                self._read_snod(child, heap, out)

    def _read_snod(self, addr: int, heap: int, out: dict[str, int]):
        buf = self.buf
        if buf[addr : addr + 4] != b"SNOD":
            raise ValueError("bad symbol node signature")
        nsym = struct.unpack_from("<H", buf, addr + 6)[0]
        pos = addr + 8
        heap_data = self._local_heap_data(heap)
        for _ in range(nsym):
            name_off, oh_addr = struct.unpack_from("<QQ", buf, pos)
            end = self.buf.index(b"\x00", heap_data + name_off)
            name = buf[heap_data + name_off : end].decode("utf-8")
            out[name] = oh_addr
            pos += 2 * self.offsz + 4 + 4 + 16
        return out

    def _local_heap_data(self, addr: int) -> int:
        if self.buf[addr : addr + 4] != b"HEAP":
            raise ValueError("bad local heap signature")
        return struct.unpack_from(
            "<Q", self.buf, addr + 8 + 2 * self.lensz
        )[0]

    # ------------------------------------------------------------ messages
    def parse_dataspace(self, body: bytes) -> tuple[tuple[int, ...], tuple[int, ...]]:
        ver = body[0]
        rank = body[1]
        flags = body[2]
        pos = 8 if ver == 1 else 4
        dims = tuple(
            struct.unpack_from("<Q", body, pos + 8 * i)[0] for i in range(rank)
        )
        pos += 8 * rank
        if flags & 1:
            maxdims = tuple(
                struct.unpack_from("<Q", body, pos + 8 * i)[0]
                for i in range(rank)
            )
        else:
            maxdims = dims
        return dims, maxdims

    def parse_datatype(self, body: bytes) -> tuple[_DType, int]:
        cls_ver = body[0]
        cls = cls_ver & 0x0F
        bits0 = body[1]
        size = struct.unpack_from("<I", body, 4)[0]
        pos = 8
        if cls == 0:  # fixed-point
            pos += 4  # bit offset + precision
            return _DType(0, size, signed=bool(bits0 & 0x08)), pos
        if cls == 1:  # float (assume IEEE LE f4/f8)
            pos += 12
            return _DType(1, size), pos
        if cls == 3:  # string
            return _DType(3, size), pos
        if cls == 7:  # reference
            return _DType(7, size), pos
        if cls == 9:  # vlen
            vtype = bits0 & 0x0F
            base, used = self.parse_datatype(body[pos:])
            return (
                _DType(9, size, base=base, vlen_string=(vtype == 1)),
                pos + used,
            )
        raise NotImplementedError(f"HDF5 datatype class {cls}")

    def parse_attribute(self, body: bytes) -> tuple[str, object]:
        ver = body[0]
        if ver == 1:
            name_sz, dt_sz, ds_sz = struct.unpack_from("<HHH", body, 2)
            pos = 8

            def pad(n: int) -> int:
                return (n + 7) & ~7

            name = body[pos : pos + name_sz].split(b"\x00")[0].decode()
            pos += pad(name_sz)
            dtype, _ = self.parse_datatype(body[pos : pos + dt_sz])
            pos += pad(dt_sz)
            dims, _ = self.parse_dataspace(body[pos : pos + ds_sz])
            pos += pad(ds_sz)
        elif ver in (2, 3):
            name_sz, dt_sz, ds_sz = struct.unpack_from("<HHH", body, 2)
            pos = 8 + (1 if ver == 3 else 0)
            name = body[pos : pos + name_sz].split(b"\x00")[0].decode()
            pos += name_sz
            dtype, _ = self.parse_datatype(body[pos : pos + dt_sz])
            pos += dt_sz
            dims, _ = self.parse_dataspace(body[pos : pos + ds_sz])
            pos += ds_sz
        else:
            raise NotImplementedError(f"attribute message version {ver}")
        n = 1
        for d in dims:
            n *= d
        value = self.decode_values(dtype, body[pos:], n)
        if not dims and isinstance(value, list):
            value = value[0]
        elif len(dims) == 1 and dims[0] == 1 and isinstance(value, list):
            value = value[0]
        return name, value

    def decode_values(self, dtype: _DType, raw: bytes, n: int):
        if dtype.cls in (0, 1):
            arr = np.frombuffer(raw, dtype=dtype.numpy(), count=n)
            return [x.item() for x in arr]
        if dtype.cls == 3:
            return [
                raw[i * dtype.size : (i + 1) * dtype.size]
                .split(b"\x00")[0]
                .decode("utf-8", "replace")
                for i in range(n)
            ]
        if dtype.cls == 7:
            return [
                struct.unpack_from("<Q", raw, i * dtype.size)[0]
                for i in range(n)
            ]
        if dtype.cls == 9:
            out = []
            for i in range(n):
                ln, gaddr, gidx = struct.unpack_from("<IQI", raw, i * 16)
                data = self.gheap_object(gaddr, gidx)
                if dtype.vlen_string:
                    out.append(data.decode("utf-8", "replace"))
                else:
                    out.append(self.decode_values(dtype.base, data, ln))
            return out
        raise NotImplementedError(f"attribute datatype class {dtype.cls}")

    def gheap_object(self, addr: int, want_idx: int) -> bytes:
        buf = self.buf
        if buf[addr : addr + 4] != b"GCOL":
            raise ValueError("bad global heap signature")
        total = struct.unpack_from("<Q", buf, addr + 8)[0]
        pos = addr + 16
        end = addr + total
        while pos + 16 <= end:
            idx, _refc = struct.unpack_from("<HH", buf, pos)
            osize = struct.unpack_from("<Q", buf, pos + 8)[0]
            if idx == 0:
                break
            if idx == want_idx:
                return bytes(buf[pos + 16 : pos + 16 + osize])
            pos += 16 + ((osize + 7) & ~7)
        raise ValueError(f"global heap object {want_idx} not found")

    # ------------------------------------------------------------ filters
    _FILTER_NAMES = {1: "deflate", 2: "shuffle", 3: "fletcher32"}

    def parse_filter_pipeline(self, body: bytes) -> tuple:
        """Filter Pipeline message (0x000B) v1/v2 ->
        ((filter_id, flags, client_data), ...) in write (application)
        order. Deflate/shuffle/fletcher32 are decodable from spec with
        the stdlib; anything else is an honest gate."""
        ver = body[0]
        nfilters = body[1]
        if ver == 1:
            pos = 8
        elif ver == 2:
            pos = 2
        else:
            raise NotImplementedError(f"filter pipeline version {ver}")
        filters = []
        for _ in range(nfilters):
            fid = struct.unpack_from("<H", body, pos)[0]
            pos += 2
            if ver == 1 or fid >= 256:
                name_len = struct.unpack_from("<H", body, pos)[0]
                pos += 2
            else:
                name_len = 0
            fflags, ncd = struct.unpack_from("<HH", body, pos)
            pos += 4 + name_len
            cd = struct.unpack_from(f"<{ncd}I", body, pos)
            pos += 4 * ncd
            if ver == 1 and ncd % 2:
                pos += 4  # v1 pads client data to an even count
            if fid not in self._FILTER_NAMES:
                raise NotImplementedError(
                    f"HDF5 filter id {fid} — only deflate/shuffle/"
                    "fletcher32 decode from spec; install netCDF4/h5py "
                    "for other filters"
                )
            filters.append((fid, fflags, cd))
        return tuple(filters)

    def _defilter_chunk(
        self, raw: bytes, filters: tuple, mask: int, elem_size: int
    ) -> bytes:
        """Undo the pipeline in reverse write order; ``mask`` bit i set
        means filter i was skipped for this chunk."""
        for i in range(len(filters) - 1, -1, -1):
            if mask & (1 << i):
                continue
            fid, _flags, cd = filters[i]
            if fid == 3:  # fletcher32: verify + strip trailing checksum
                payload, stored = raw[:-4], struct.unpack("<I", raw[-4:])[0]
                if _fletcher32(payload) != stored:
                    raise ValueError("HDF5 chunk fletcher32 checksum mismatch")
                raw = payload
            elif fid == 1:  # deflate
                raw = zlib.decompress(raw)
            elif fid == 2:  # shuffle: byte planes -> interleaved elements
                esz = int(cd[0]) if cd else elem_size
                if esz > 1 and len(raw) % esz == 0:
                    arr = np.frombuffer(raw, dtype=np.uint8)
                    raw = arr.reshape(esz, len(raw) // esz).T.tobytes()
        return raw

    def parse_fill_value(self, mtype: int, body: bytes) -> bytes | None:
        """Fill Value (0x0005 v1-v3) / Fill Value (old) (0x0004) ->
        raw fill bytes, or None when undefined/zero-size."""
        if mtype == 0x0004:
            sz = struct.unpack_from("<I", body, 0)[0]
            return bytes(body[4 : 4 + sz]) or None
        ver = body[0]
        if ver in (1, 2):
            defined = body[3]
            if ver == 2 and not defined:
                return None
            sz = struct.unpack_from("<I", body, 4)[0]
            return bytes(body[8 : 8 + sz]) or None
        if ver == 3:
            flags = body[1]
            if not flags & 0x20:  # fill value not defined
                return None
            sz = struct.unpack_from("<I", body, 2)[0]
            return bytes(body[6 : 6 + sz]) or None
        raise NotImplementedError(f"fill value message version {ver}")

    # ------------------------------------------------------------ datasets
    def dataset(self, name: str, addr: int) -> H5Dataset:
        shape: tuple[int, ...] = ()
        maxshape: tuple[int, ...] = ()
        dtype: _DType | None = None
        attrs: dict[str, object] = {}
        layout: tuple | None = None
        filters: tuple = ()
        fill: bytes | None = None
        for mtype, body in self.object_header(addr):
            if mtype == 0x0001:
                shape, maxshape = self.parse_dataspace(body)
            elif mtype == 0x0003:
                dtype, _ = self.parse_datatype(body)
            elif mtype == 0x0008:
                layout = self._parse_layout(body)
            elif mtype == 0x000B:
                filters = self.parse_filter_pipeline(body)
            elif mtype in (0x0004, 0x0005):
                fill = self.parse_fill_value(mtype, body) or fill
            elif mtype == 0x000C:
                k, v = self.parse_attribute(body)
                attrs[k] = v
            elif mtype == 0x0015:  # dense (fractal-heap) attributes
                attrs.update(self.dense_attributes(body) or {})
        if dtype is None or layout is None:
            raise ValueError(f"dataset {name!r}: missing datatype/layout")
        return H5Dataset(
            name, shape, maxshape, dtype, attrs, layout, addr,
            filters=filters, fill=fill,
        )

    def _parse_layout(self, body: bytes) -> tuple:
        ver = body[0]
        if ver == 4:
            return self._parse_layout_v4(body)
        if ver != 3:
            raise NotImplementedError(f"data layout version {ver}")
        cls = body[1]
        if cls == 0:  # compact
            sz = struct.unpack_from("<H", body, 2)[0]
            return ("compact", body[4 : 4 + sz])
        if cls == 1:  # contiguous
            a, s = struct.unpack_from("<QQ", body, 2)
            return ("contiguous", a, s)
        if cls == 2:  # chunked
            rank = body[2]
            btree = struct.unpack_from("<Q", body, 3)[0]
            dims = struct.unpack_from(f"<{rank}I", body, 11)
            return ("chunked", btree, dims[:-1])  # last = element size
        raise NotImplementedError(f"data layout class {cls}")

    def _parse_layout_v4(self, body: bytes) -> tuple:
        """Data layout v4 (``libver='latest'``): compact/contiguous match
        v3; chunked carries variable-width dims (incl. the trailing
        element-size dim, like v3) plus a chunk INDEX: 1=single chunk,
        2=implicit, 3=fixed array decode here; 4=extensible array (what
        libhdf5 picks for unlimited dims) and 5=v2 B-tree gate
        honestly."""
        cls = body[1]
        if cls == 0:
            sz = struct.unpack_from("<H", body, 2)[0]
            return ("compact", body[4 : 4 + sz])
        if cls == 1:
            a, s = struct.unpack_from("<QQ", body, 2)
            return ("contiguous", a, s)
        if cls != 2:
            raise NotImplementedError(f"data layout v4 class {cls}")
        flags = body[2]
        ndims = body[3]
        enc = body[4]
        pos = 5
        dims = tuple(
            int.from_bytes(body[pos + i * enc : pos + (i + 1) * enc], "little")
            for i in range(ndims)
        )
        pos += ndims * enc
        chunk, elem = dims[:-1], dims[-1]
        itype = body[pos]
        pos += 1
        if itype == 1:  # single chunk
            if flags & 0x02:  # filtered single chunk
                fsize = struct.unpack_from("<Q", body, pos)[0]
                fmask = struct.unpack_from("<I", body, pos + 8)[0]
                pos += 12
            else:
                fsize, fmask = None, 0
            addr = struct.unpack_from("<Q", body, pos)[0]
            return ("chunked_single", addr, chunk, elem, fsize, fmask)
        if itype == 2:  # implicit: dense row-major chunk grid, no index
            addr = struct.unpack_from("<Q", body, pos)[0]
            return ("chunked_implicit", addr, chunk, elem)
        if itype == 3:  # fixed array
            addr = struct.unpack_from("<Q", body, pos + 1)[0]
            return ("chunked_farr", addr, chunk, elem)
        if itype == 4:  # extensible array (libhdf5's unlimited-dim pick)
            # creation parameters, in H5O layout-message encode order:
            # max nelmts bits, index block elements, super block min
            # data pointers, data block min elements, max data block
            # page nelmts bits — the reader needs all five to replay
            # the element->block schedule (the header repeats them).
            cparams = tuple(body[pos : pos + 5])
            addr = struct.unpack_from("<Q", body, pos + 5)[0]
            return ("chunked_earr", addr, chunk, elem, cparams)
        raise NotImplementedError(
            "chunk index type " + {5: "v2 B-tree"}.get(itype, str(itype))
        )

    def _alloc(self, ds: H5Dataset, npd: np.dtype) -> np.ndarray:
        """Output array pre-filled with the dataset's fill value —
        unallocated contiguous data and never-written chunks must read
        as the stored fill (netCDF4 defaults are non-zero, e.g.
        -2147483647 for int32), not as zeros."""
        if ds.fill is not None and len(ds.fill) == npd.itemsize:
            fv = np.frombuffer(ds.fill, dtype=npd, count=1)[0]
            return np.full(ds.shape, fv, dtype=npd)
        return np.zeros(ds.shape, dtype=npd)

    def read_data(self, ds: H5Dataset) -> np.ndarray:
        npd = ds.dtype.numpy()
        n = 1
        for d in ds.shape:
            n *= d
        if ds.layout[0] == "compact":
            arr = np.frombuffer(ds.layout[1], dtype=npd, count=n)
            return arr.reshape(ds.shape).copy()
        if ds.layout[0] == "contiguous":
            addr, size = ds.layout[1], ds.layout[2]
            if addr == UNDEF:  # never written: all fill
                return self._alloc(ds, npd)
            raw = self.buf[addr : addr + size]
            return (
                np.frombuffer(raw, dtype=npd, count=n).reshape(ds.shape).copy()
            )
        kind = ds.layout[0]
        out = self._alloc(ds, npd)
        if kind == "chunked":
            _, btree, chunk = ds.layout
            if btree != UNDEF:
                self._read_chunk_btree(
                    btree, np.asarray(chunk), out, npd, ds.filters
                )
            return out
        if kind == "chunked_single":
            _, addr, chunk, _elem, fsize, fmask = ds.layout
            if addr != UNDEF:
                size = (
                    fsize
                    if fsize is not None
                    else int(np.prod(chunk)) * npd.itemsize
                )
                raw = bytes(self.buf[addr : addr + size])
                if ds.filters and fsize is not None:
                    raw = self._defilter_chunk(
                        raw, ds.filters, fmask, npd.itemsize
                    )
                self._paste_chunk(out, raw, (0,) * len(chunk), chunk, npd)
            return out
        if kind == "chunked_implicit":
            _, addr, chunk, _elem = ds.layout
            if addr != UNDEF:
                csize = int(np.prod(chunk)) * npd.itemsize
                for i, start in enumerate(self._chunk_grid(ds.shape, chunk)):
                    raw = bytes(self.buf[addr + i * csize :][:csize])
                    self._paste_chunk(out, raw, start, chunk, npd)
            return out
        if kind == "chunked_farr":
            _, addr, chunk, _elem = ds.layout
            if addr != UNDEF:
                self._read_fixed_array(addr, ds, chunk, out, npd)
            return out
        if kind == "chunked_earr":
            _, addr, chunk, _elem, cparams = ds.layout
            if addr != UNDEF:
                self._read_extensible_array(addr, ds, chunk, out, npd)
            return out
        raise NotImplementedError(f"layout kind {kind}")

    @staticmethod
    def _chunk_grid(shape, chunk):
        """Row-major chunk-grid start offsets covering ``shape``."""
        import itertools

        ranges = [
            range(0, max(s, 1), c) if s else [0]
            for s, c in zip(shape, chunk)
        ]
        return itertools.product(*ranges)

    @staticmethod
    def _paste_chunk(out, raw, start, chunk, npd):
        cdata = np.frombuffer(raw, dtype=npd, count=int(np.prod(chunk)))
        cdata = cdata.reshape(tuple(chunk))
        sl = tuple(
            slice(int(s), int(min(s + c, e)))
            for s, c, e in zip(start, chunk, out.shape)
        )
        csl = tuple(
            slice(0, int(min(s + c, e) - s))
            for s, c, e in zip(start, chunk, out.shape)
        )
        out[sl] = cdata[csl]

    def _read_fixed_array(self, addr, ds, chunk, out, npd):
        """Fixed Array chunk index (FAHD header + unpaged FADB data
        block): entries are chunk addresses (client 0, unfiltered) or
        (address, stored size, filter mask) triples (client 1,
        filtered), in row-major chunk-grid order."""
        buf = self.buf
        if buf[addr : addr + 4] != b"FAHD":
            raise ValueError("bad fixed array header signature")
        client = buf[addr + 5]
        entry_size = buf[addr + 6]
        page_bits = buf[addr + 7]
        nentries = struct.unpack_from("<Q", buf, addr + 8)[0]
        dblock = struct.unpack_from("<Q", buf, addr + 16)[0]
        if client not in (0, 1):
            raise NotImplementedError(f"fixed array client id {client}")
        if dblock == UNDEF:
            return
        if nentries > (1 << page_bits):
            raise NotImplementedError("paged fixed-array data block")
        if buf[dblock : dblock + 4] != b"FADB":
            raise ValueError("bad fixed array data block signature")
        p = dblock + 6 + 8  # sig, version, client id, header address
        csize = int(np.prod(chunk)) * npd.itemsize
        starts = list(self._chunk_grid(ds.shape, chunk))
        if nentries < len(starts):
            raise ValueError("fixed array smaller than the chunk grid")
        for i, start in enumerate(starts):
            e = p + i * entry_size
            caddr = struct.unpack_from("<Q", buf, e)[0]
            if caddr == UNDEF:
                continue  # never-written chunk stays fill
            if client == 1:
                szbytes = entry_size - 12
                stored = int.from_bytes(
                    buf[e + 8 : e + 8 + szbytes], "little"
                )
                fmask = struct.unpack_from("<I", buf, e + 8 + szbytes)[0]
                raw = bytes(buf[caddr : caddr + stored])
                raw = self._defilter_chunk(
                    raw, ds.filters, fmask, npd.itemsize
                )
            else:
                raw = bytes(buf[caddr : caddr + csize])
            self._paste_chunk(out, raw, start, chunk, npd)

    def _read_extensible_array(self, addr, ds, chunk, out, npd):
        """Extensible Array chunk index (EAHD header -> EAIB index block
        -> EADB data blocks, directly addressed or via EASB super
        blocks) — what libhdf5 creates for a chunked dataset with an
        unlimited dimension under ``libver='latest'`` (the netCDF4
        record-dimension case; r17, closing the last S11 index gate).

        Element schedule (the public H5EA doubling-super-block design;
        creation parameters from the layout message / header): element
        ``i`` indexes the i-th chunk of the row-major chunk grid —
        netCDF4 keeps the unlimited record dim FIRST, so libhdf5's
        unlimited-first coordinate swizzle is the identity (a
        non-leading unlimited dim is gated honestly below).  The first
        ``idx_blk_elmts`` elements live INLINE in the index block; the
        rest live in data blocks grouped into super blocks
        ``s = 0, 1, ...`` where super block ``s`` spans ``2^(s//2)``
        data blocks of ``data_blk_min_elmts * 2^((s+1)//2)`` elements
        each.  The data blocks of the first
        ``2*log2(sup_blk_min_data_ptrs)`` super blocks are addressed
        DIRECTLY from the index block (those super blocks never
        materialize); later super blocks appear as EASB blocks holding
        their data-block addresses.  Elements are chunk addresses
        (client 0) or (address, stored size, filter mask) records
        (client 1, filtered).  A data block whose element count
        exceeds ``2^max_dblk_page_nelmts_bits`` is stored paged with
        per-page checksums — gated honestly, as are page bitmaps in
        super blocks.  Block checksums are not verified (same policy
        as the fixed-array and B-tree readers)."""
        import math

        buf = self.buf
        if buf[addr : addr + 4] != b"EAHD":
            raise ValueError("bad extensible array header signature")
        client = buf[addr + 5]
        elem_size = buf[addr + 6]
        max_bits = buf[addr + 7]
        idx_elmts = buf[addr + 8]
        dblk_min = buf[addr + 9]
        sblk_min_ptrs = buf[addr + 10]
        page_bits = buf[addr + 11]
        if client not in (0, 1):
            raise NotImplementedError(f"extensible array client id {client}")
        if any(m == UNDEF for m in ds.maxshape[1:]):
            raise NotImplementedError(
                "extensible array with a non-leading unlimited dimension"
                " (non-identity coordinate swizzle)"
            )
        if dblk_min & (dblk_min - 1) or sblk_min_ptrs & (sblk_min_ptrs - 1):
            raise ValueError("extensible array parameters must be 2^k")
        # six length-sized stats fields skipped; index block address next
        iblk = struct.unpack_from("<Q", buf, addr + 12 + 6 * 8)[0]
        if iblk == UNDEF:
            return
        starts = list(self._chunk_grid(ds.shape, chunk))
        csize = int(np.prod(chunk)) * npd.itemsize

        def paste_element(i: int, e: int) -> None:
            if i >= len(starts):
                return  # beyond the current extent: ignore
            caddr = struct.unpack_from("<Q", buf, e)[0]
            if caddr == UNDEF:
                return  # never-written chunk stays fill
            if client == 1:
                szb = elem_size - 12
                stored = int.from_bytes(buf[e + 8 : e + 8 + szb], "little")
                fmask = struct.unpack_from("<I", buf, e + 8 + szb)[0]
                raw = bytes(buf[caddr : caddr + stored])
                raw = self._defilter_chunk(
                    raw, ds.filters, fmask, npd.itemsize
                )
            else:
                raw = bytes(buf[caddr : caddr + csize])
            self._paste_chunk(out, raw, starts[i], chunk, npd)

        off_bytes = (max_bits + 7) // 8  # block-offset field width

        def read_dblock(daddr: int, first: int, nelmts: int) -> None:
            if daddr == UNDEF:
                return
            if nelmts > (1 << page_bits):
                raise NotImplementedError(
                    "paged extensible-array data block"
                )
            if buf[daddr : daddr + 4] != b"EADB":
                raise ValueError(
                    "bad extensible array data block signature"
                )
            # sig, version, client id, header address, block offset
            p = daddr + 6 + 8 + off_bytes
            for j in range(nelmts):
                paste_element(first + j, p + j * elem_size)

        if buf[iblk : iblk + 4] != b"EAIB":
            raise ValueError("bad extensible array index block signature")
        p = iblk + 6 + 8  # sig, version, client id, header address
        for i in range(idx_elmts):
            paste_element(i, p + i * elem_size)
        p += idx_elmts * elem_size
        nsblks = 1 + (max_bits - int(math.log2(dblk_min)))
        first_real = 2 * int(math.log2(sblk_min_ptrs))
        elem_idx = idx_elmts
        # data blocks of super blocks < first_real: direct addresses
        for s in range(min(first_real, nsblks)):
            ndb = 1 << (s // 2)
            nel = dblk_min << ((s + 1) // 2)
            for _ in range(ndb):
                read_dblock(struct.unpack_from("<Q", buf, p)[0],
                            elem_idx, nel)
                p += 8
                elem_idx += nel
        # materialized super blocks
        for s in range(first_real, nsblks):
            saddr = struct.unpack_from("<Q", buf, p)[0]
            p += 8
            ndb = 1 << (s // 2)
            nel = dblk_min << ((s + 1) // 2)
            if saddr != UNDEF:
                if nel > (1 << page_bits):
                    raise NotImplementedError(
                        "paged extensible-array super block (page bitmap)"
                    )
                if buf[saddr : saddr + 4] != b"EASB":
                    raise ValueError(
                        "bad extensible array super block signature"
                    )
                q = saddr + 6 + 8 + off_bytes
                for d in range(ndb):
                    read_dblock(struct.unpack_from("<Q", buf, q + d * 8)[0],
                                elem_idx + d * nel, nel)
            elem_idx += ndb * nel
            if elem_idx >= len(starts):
                break

    def _read_chunk_btree(self, addr, chunk, out, npd, filters=()):
        buf = self.buf
        if buf[addr : addr + 4] != b"TREE":
            raise ValueError("bad chunk B-tree signature")
        ntype, level, nent = struct.unpack_from("<BBH", buf, addr + 4)
        if ntype != 1:
            raise ValueError("expected chunk B-tree node type 1")
        rank = len(chunk)
        key_sz = 8 + 8 * (rank + 1)
        pos = addr + 8 + 2 * self.offsz
        for _ in range(nent):
            size, fmask = struct.unpack_from("<II", buf, pos)
            offs = struct.unpack_from(f"<{rank + 1}Q", buf, pos + 8)
            child = struct.unpack_from("<Q", buf, pos + key_sz)[0]
            pos += key_sz + self.offsz
            if level > 0:
                self._read_chunk_btree(child, chunk, out, npd, filters)
                continue
            raw = bytes(buf[child : child + size])
            if filters:
                raw = self._defilter_chunk(raw, filters, fmask, npd.itemsize)
            start = np.asarray(offs[:rank], dtype=np.int64)
            cdata = np.frombuffer(raw, dtype=npd).reshape(tuple(chunk))
            sl = tuple(
                slice(int(s), int(min(s + c, e)))
                for s, c, e in zip(start, chunk, out.shape)
            )
            csl = tuple(
                slice(0, int(min(s + c, e) - s))
                for s, c, e in zip(start, chunk, out.shape)
            )
            out[sl] = cdata[csl]


def _fletcher32(data: bytes) -> int:
    """HDF5's H5_checksum_fletcher32 (H5checksum.c): big-endian 16-bit
    word sums with deferred mod-65535 reduction; odd trailing byte is
    high-padded."""
    sum1 = sum2 = 0
    n_pairs = len(data) // 2
    words = np.frombuffer(data[: 2 * n_pairs], dtype=">u2").astype(np.uint64)
    # block size 360 keeps the 32-bit sums from overflowing in C; with
    # python/np.uint64 arithmetic one reduction per block is still the
    # exact same result, so mirror the blocking for bit-fidelity.
    for i in range(0, n_pairs, 360):
        blk = words[i : i + 360]
        csum = np.cumsum(blk)
        sum2 = int(sum2) + len(blk) * int(sum1) + int(csum.sum())
        sum1 = int(sum1) + int(csum[-1]) if len(blk) else int(sum1)
        sum1 = (sum1 & 0xFFFF) + (sum1 >> 16)
        sum2 = (sum2 & 0xFFFF) + (sum2 >> 16)
    if len(data) % 2:
        sum1 += data[-1] << 8
        sum2 += sum1
        sum1 = (sum1 & 0xFFFF) + (sum1 >> 16)
        sum2 = (sum2 & 0xFFFF) + (sum2 >> 16)
    sum1 = (sum1 & 0xFFFF) + (sum1 >> 16)
    sum2 = (sum2 & 0xFFFF) + (sum2 >> 16)
    return (sum2 << 16) | sum1


@dataclass
class H5Variable:
    name: str
    dims: tuple[str, ...]
    attrs: dict[str, object]
    data: np.ndarray = field(repr=False, default=None)


def read_netcdf4(path: str):
    """NetCDF4 (HDF5) ``.nc`` -> (dims, gattrs, variables) in the same
    shape ``netcdf3.read_netcdf3`` returns: ``dims`` maps name -> size
    (None for the unlimited/record dim), variables carry (name, dims,
    attrs, numpy data)."""
    with open(path, "rb") as f:
        return read_netcdf4_bytes(f.read())


def read_netcdf4_bytes(buf: bytes):
    """Bytes-level entry point (same contract as :func:`read_netcdf4`)
    — lets executors parse file contents shipped by Spark's binaryFile
    source without touching a local filesystem path."""
    r = _Reader(buf)
    root_msgs = r.object_header(r.root)
    gattrs: dict[str, object] = {}
    for mtype, body in root_msgs:
        if mtype == 0x000C:
            k, v = r.parse_attribute(body)
            gattrs[k] = v
        elif mtype == 0x0015:  # dense (fractal-heap) attributes
            gattrs.update(r.dense_attributes(body) or {})
    links = r.group_links(r.root)

    datasets: dict[str, H5Dataset] = {}
    addr_to_name: dict[int, str] = {}
    for name, addr in links.items():
        ds = r.dataset(name, addr)
        datasets[name] = ds
        addr_to_name[addr] = name

    dims: dict[str, int | None] = {}
    for name, ds in datasets.items():
        if ds.is_dim_scale():
            unlimited = bool(ds.maxshape) and ds.maxshape[0] == UNDEF
            dims[name] = None if unlimited else (ds.shape[0] if ds.shape else 0)

    variables: list[H5Variable] = []
    for name, ds in datasets.items():
        attrs = {
            k: v
            for k, v in ds.attrs.items()
            if k
            not in ("CLASS", "NAME", "DIMENSION_LIST", "REFERENCE_LIST",
                    "_Netcdf4Dimid", "_Netcdf4Coordinates")
        }
        if ds.is_dim_scale():
            nc_name = ds.attrs.get("NAME", "")
            if isinstance(nc_name, str) and nc_name.startswith(
                "This is a netCDF dimension but not a netCDF variable"
            ):
                continue  # pure dimension, no data variable
            vdims: tuple[str, ...] = (name,)
        else:
            dl = ds.attrs.get("DIMENSION_LIST")
            if dl is None:
                vdims = ()
            else:
                vdims = tuple(
                    addr_to_name[refs[0] if isinstance(refs, list) else refs]
                    for refs in dl
                )
        variables.append(H5Variable(name, vdims, attrs, r.read_data(ds)))
    return dims, gattrs, variables
