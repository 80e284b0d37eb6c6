"""Minimal pure-python HDF5 subset — enough to ingest and produce
ann-benchmarks-style files (reference example/example.py:66-102) without
h5py, from the PUBLIC HDF5 File Format Specification v2 (the HDF Group,
"HDF5 File Format Specification Version 2.0").

Supported subset (what libhdf5/h5py write by default for
``f.create_dataset(name, data=2d_array)`` with libver='earliest'):

- superblock version 0, 8-byte offsets/lengths
- root group via symbol table (B-tree v1 + local heap + SNOD nodes),
  single level (ann-benchmarks files hold 2-4 datasets)
- version 1 object headers; dataspace v1, datatype class 0/1 (fixed int /
  IEEE float, little-endian), data layout v3 contiguous, or chunked with
  the deflate filter (B-tree v1 type-1 chunk index + zlib)

The writer emits the same subset (contiguous only), so files round-trip
through this module and open in h5py/libhdf5 unchanged; the reader also
opens default h5py files. Everything else raises NotImplementedError with
the offending feature named — never a silent wrong answer.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

UNDEF = 0xFFFFFFFFFFFFFFFF
_SIG = b"\x89HDF\r\n\x1a\n"

# ---------------------------------------------------------------------------
# reader
# ---------------------------------------------------------------------------


class _Reader:
    def __init__(self, buf: bytes):
        self.b = buf
        if buf[:8] != _SIG:
            raise NotImplementedError("not an HDF5 file (bad signature)")
        ver = buf[8]
        if ver == 0:
            # sizes at fixed offsets (spec III.A superblock v0)
            if buf[13] != 8 or buf[14] != 8:
                raise NotImplementedError("only 8-byte offsets/lengths")
            # root group symbol table entry begins at offset 24
            # (v0: 24 bytes of header fields incl. base/free/eof/driver)
            root_entry = 24 + 8 * 4
            (self.root_oh,) = struct.unpack_from("<Q", buf, root_entry + 8)
        elif ver in (2, 3):
            if buf[9] != 8 or buf[10] != 8:
                raise NotImplementedError("only 8-byte offsets/lengths")
            # v2/v3 layout after the 12 header bytes: base address @12,
            # superblock extension @20, EOF @28, root object header @36
            # (spec III.B; offset 28 is the EOF address, not the root OH)
            (self.root_oh,) = struct.unpack_from("<Q", buf, 36)
        else:
            raise NotImplementedError(f"superblock version {ver}")

    # -- object header ------------------------------------------------------

    def _messages(self, addr: int):
        """Yield (msg_type, body_offset, body_size) from a v1 or v2 object
        header, following continuation blocks."""
        b = self.b
        if b[addr : addr + 4] == b"OHDR":  # v2
            flags = b[addr + 5]
            pos = addr + 6
            if flags & 0x20:
                pos += 16  # access/mod/change/birth times: four 4-byte fields
            if flags & 0x10:
                pos += 4  # max compact/dense attrs
            size_bytes = 1 << (flags & 0x3)
            chunk0 = int.from_bytes(b[pos : pos + size_bytes], "little")
            pos += size_bytes
            blocks = [(pos, pos + chunk0)]
            creation_tracked = bool(flags & 0x04)
            while blocks:
                cur, end = blocks.pop(0)
                while cur + 4 <= end:
                    mtype = b[cur]
                    (msize,) = struct.unpack_from("<H", b, cur + 1)
                    cur += 4 + (2 if creation_tracked else 0)
                    if mtype == 0x10:  # continuation
                        (caddr, csize) = struct.unpack_from("<QQ", b, cur)
                        blocks.append((caddr + 4, caddr + csize - 4))
                    else:
                        yield mtype, cur, msize
                    cur += msize
            return
        # v1: version(1) reserved(1) nmsgs(2) refcount(4) hdrsize(4) pad(4)
        if b[addr] != 1:
            raise NotImplementedError(f"object header version {b[addr]}")
        (nmsgs,) = struct.unpack_from("<H", b, addr + 2)
        (hsize,) = struct.unpack_from("<I", b, addr + 8)
        blocks = [(addr + 16, addr + 16 + hsize)]
        seen = 0
        while blocks and seen < nmsgs:
            cur, end = blocks.pop(0)
            while cur + 8 <= end and seen < nmsgs:
                mtype, msize = struct.unpack_from("<HH", b, cur)
                body = cur + 8
                seen += 1
                if mtype == 0x10:
                    (caddr, csize) = struct.unpack_from("<QQ", b, body)
                    blocks.append((caddr, caddr + csize))
                else:
                    yield mtype, body, msize
                cur = body + msize

    # -- group traversal ----------------------------------------------------

    def links(self, oh_addr: int) -> dict[str, int]:
        """name -> object header address for a group."""
        out: dict[str, int] = {}
        for mtype, body, msize in self._messages(oh_addr):
            if mtype == 0x11:  # symbol table message
                btree, heap = struct.unpack_from("<QQ", self.b, body)
                self._walk_btree_group(btree, heap, out)
            elif mtype == 0x06:  # link message (v2 compact groups)
                name, target = self._parse_link(body)
                out[name] = target
        return out

    def _parse_link(self, body: int):
        b = self.b
        ver, flags = b[body], b[body + 1]
        pos = body + 2
        if flags & 0x08:
            pos += 1  # link type (0 = hard assumed)
        if flags & 0x04:
            pos += 8
        if flags & 0x10:
            pos += 1  # charset
        len_size = 1 << (flags & 0x3)
        nlen = int.from_bytes(b[pos : pos + len_size], "little")
        pos += len_size
        name = b[pos : pos + nlen].decode()
        (target,) = struct.unpack_from("<Q", b, pos + nlen)
        return name, target

    def _walk_btree_group(self, btree: int, heap: int, out: dict[str, int]):
        b = self.b
        if b[btree : btree + 4] != b"TREE":
            raise NotImplementedError("expected v1 B-tree for group")
        level = b[btree + 5]
        (nentries,) = struct.unpack_from("<H", b, btree + 6)
        # children start after sig(4) type(1) level(1) n(2) left(8) right(8),
        # entries alternate key/child, keys are heap offsets (8B)
        pos = btree + 24 + 8  # skip key0
        for _ in range(nentries):
            (child,) = struct.unpack_from("<Q", b, pos)
            pos += 16  # child + next key
            if level > 0:
                self._walk_btree_group(child, heap, out)
            else:
                self._read_snod(child, heap, out)

    def _heap_name(self, heap: int, off: int) -> str:
        b = self.b
        if b[heap : heap + 4] != b"HEAP":
            raise NotImplementedError("bad local heap signature")
        (data,) = struct.unpack_from("<Q", b, heap + 24)
        end = b.index(b"\x00", data + off)
        return b[data + off : end].decode()

    def _read_snod(self, addr: int, heap: int, out: dict[str, int]):
        b = self.b
        if b[addr : addr + 4] != b"SNOD":
            raise NotImplementedError("bad symbol table node signature")
        (nsym,) = struct.unpack_from("<H", b, addr + 6)
        pos = addr + 8
        for _ in range(nsym):
            name_off, oh = struct.unpack_from("<QQ", b, pos)
            out[self._heap_name(heap, name_off)] = oh
            pos += 40  # entry: 8+8+4+4 + 16 scratch

    # -- dataset ------------------------------------------------------------

    def dataset(self, oh_addr: int) -> np.ndarray:
        shape = dtype = None
        layout = None
        filters: list[int] = []
        for mtype, body, msize in self._messages(oh_addr):
            if mtype == 0x01:
                shape = self._parse_dataspace(body)
            elif mtype == 0x03:
                dtype = self._parse_datatype(body)
            elif mtype == 0x08:
                layout = (body, msize)
            elif mtype == 0x0B:
                filters = self._parse_filters(body)
        if shape is None or dtype is None or layout is None:
            raise NotImplementedError("dataset missing required messages")
        return self._read_data(layout[0], shape, dtype, filters)

    def _parse_dataspace(self, body: int):
        b = self.b
        ver, rank = b[body], b[body + 1]
        pos = body + (8 if ver == 1 else 4)
        return tuple(
            struct.unpack_from("<Q", b, pos + 8 * i)[0] for i in range(rank)
        )

    def _parse_datatype(self, body: int):
        b = self.b
        cls = b[body] & 0x0F
        bits0 = b[body + 1]
        (size,) = struct.unpack_from("<I", b, body + 4)
        if bits0 & 1:
            raise NotImplementedError("big-endian datatype")
        if cls == 0:  # fixed-point
            signed = bool(b[body + 1] & 0x08)
            return np.dtype(f"<{'i' if signed else 'u'}{size}")
        if cls == 1:  # float
            return np.dtype(f"<f{size}")
        raise NotImplementedError(f"datatype class {cls}")

    def _parse_filters(self, body: int) -> list[int]:
        b = self.b
        ver = b[body]
        nfilters = b[body + 1]
        pos = body + (8 if ver == 1 else 2)
        out = []
        for _ in range(nfilters):
            (fid,) = struct.unpack_from("<H", b, pos)
            (name_len,) = struct.unpack_from("<H", b, pos + 2)
            (ncli,) = struct.unpack_from("<H", b, pos + 6)
            pos += 8
            if ver == 1 or fid >= 256:
                pos += name_len + ((8 - name_len % 8) % 8 if name_len % 8 else 0) if ver == 1 else name_len
            pos += 4 * ncli
            if ver == 1 and ncli % 2:
                pos += 4
            out.append(fid)
        return out

    def _read_data(self, body: int, shape, dtype, filters):
        b = self.b
        ver = b[body]
        if ver != 3:
            raise NotImplementedError(f"data layout version {ver}")
        cls = b[body + 1]
        n = int(np.prod(shape)) if shape else 1
        if cls == 1:  # contiguous
            addr, size = struct.unpack_from("<QQ", b, body + 2)
            if addr == UNDEF:
                return np.zeros(shape, dtype)
            return (
                np.frombuffer(b, dtype=dtype, count=n, offset=addr)
                .reshape(shape)
                .copy()
            )
        if cls == 0:  # compact
            (size,) = struct.unpack_from("<H", b, body + 2)
            return (
                np.frombuffer(b, dtype=dtype, count=n, offset=body + 4)
                .reshape(shape)
                .copy()
            )
        if cls == 2:  # chunked
            rank = b[body + 2]
            (btree,) = struct.unpack_from("<Q", b, body + 3)
            chunk = tuple(
                struct.unpack_from("<I", b, body + 11 + 4 * i)[0]
                for i in range(rank - 1)
            )
            for f in filters:
                if f != 1:
                    raise NotImplementedError(f"filter id {f} (only deflate)")
            out = np.zeros(shape, dtype)
            if btree != UNDEF:
                self._walk_btree_chunks(
                    btree, rank, chunk, shape, dtype, bool(filters), out
                )
            return out
        raise NotImplementedError(f"data layout class {cls}")

    def _walk_btree_chunks(self, addr, rank, chunk, shape, dtype, deflated, out):
        b = self.b
        if b[addr : addr + 4] != b"TREE":
            raise NotImplementedError("bad chunk B-tree signature")
        level = b[addr + 5]
        (nentries,) = struct.unpack_from("<H", b, addr + 6)
        pos = addr + 24
        key_size = 8 + 8 * rank  # size(4) filter_mask(4) + rank offsets
        for _ in range(nentries):
            csize, _fmask = struct.unpack_from("<II", b, pos)
            offs = struct.unpack_from(f"<{rank}Q", b, pos + 8)
            (child,) = struct.unpack_from("<Q", b, pos + key_size)
            pos += key_size + 8
            if level > 0:
                self._walk_btree_chunks(
                    child, rank, chunk, shape, dtype, deflated, out
                )
                continue
            raw = b[child : child + csize]
            if deflated:
                raw = zlib.decompress(raw)
            block = np.frombuffer(raw, dtype=dtype).reshape(chunk)
            sel = tuple(
                slice(offs[i], min(offs[i] + chunk[i], shape[i]))
                for i in range(len(shape))
            )
            clip = tuple(
                slice(0, sel[i].stop - sel[i].start) for i in range(len(shape))
            )
            out[sel] = block[clip]


def read_hdf5(path: str) -> dict[str, np.ndarray]:
    """Read every dataset in the root group. Subset reader — see module
    docstring; unsupported features raise NotImplementedError."""
    with open(path, "rb") as f:
        buf = f.read()
    r = _Reader(buf)
    return {
        name: r.dataset(addr) for name, addr in r.links(r.root_oh).items()
    }


# ---------------------------------------------------------------------------
# writer (contiguous, v0 superblock + symbol-table root group)
# ---------------------------------------------------------------------------


def _dtype_message(dt: np.dtype) -> bytes:
    if dt.kind == "f":
        # class 1 (float), version 1, little-endian, IEEE layout
        size = dt.itemsize
        if size == 4:
            props = struct.pack("<HHBBBBI", 0, 32, 23, 8, 0, 23, 127)
        elif size == 8:
            props = struct.pack("<HHBBBBI", 0, 64, 52, 11, 0, 52, 1023)
        else:
            raise NotImplementedError(f"float{size * 8}")
        # bit field: byte order LE(0), lo pad 0, hi pad 0, int pad 0,
        # mantissa norm = 2 (implied msb), sign location byte 2
        bits = bytes([0x20, size * 8 - 1, 0])
        return bytes([0x11]) + bits + struct.pack("<I", size) + props
    if dt.kind in "iu":
        size = dt.itemsize
        bits = bytes([0x08 if dt.kind == "i" else 0x00, 0, 0])
        props = struct.pack("<HH", 0, size * 8)
        return bytes([0x10]) + bits + struct.pack("<I", size) + props
    raise NotImplementedError(f"dtype {dt}")


def _msg(mtype: int, body: bytes) -> bytes:
    pad = (8 - len(body) % 8) % 8
    body += b"\x00" * pad
    return struct.pack("<HHB3x", mtype, len(body), 0) + body


def _chunked_block(
    base: int, msgs: bytes, a: np.ndarray, shape, chunk_rows: int
) -> bytes:
    """Object header + deflate filter + chunk B-tree + compressed chunks
    for one dataset, laid out starting at file offset ``base``."""
    rank = len(shape) + 1  # + element-size dimension
    chunk_shape = (min(chunk_rows, shape[0]),) + tuple(shape[1:])
    # deflate filter pipeline (v1): id=1, no name, 1 client value (level)
    filt = _msg(
        0x0B,
        bytes([1, 1]) + b"\x00" * 6
        + struct.pack("<HHHH", 1, 0, 0, 1) + struct.pack("<I", 6) + b"\x00" * 4,
    )
    # compress chunks
    step = chunk_shape[0]
    chunks: list[tuple[tuple[int, ...], bytes]] = []
    for lo in range(0, shape[0], step):
        piece = np.zeros(chunk_shape, a.dtype)  # edge chunks zero-padded
        rows = a[lo : lo + step]
        piece[: len(rows)] = rows
        chunks.append(
            ((lo,) + (0,) * (rank - 1), zlib.compress(piece.tobytes(), 6))
        )
    # layout message (fixed size for a given rank)
    def layout_msg(btree_addr: int) -> bytes:
        body = bytes([3, 2, rank]) + struct.pack("<Q", btree_addr)
        for d in chunk_shape:
            body += struct.pack("<I", d)
        body += struct.pack("<I", a.dtype.itemsize)
        return _msg(0x08, body)

    body_len = len(msgs) + len(filt) + len(layout_msg(0))
    hdr_len = 16 + body_len
    btree_addr = base + hdr_len + ((8 - hdr_len % 8) % 8)
    key_size = 8 + 8 * rank
    btree_size = 24 + len(chunks) * (key_size + 8) + key_size
    btree_size += (8 - btree_size % 8) % 8
    # place chunk data after the btree
    addr = btree_addr + btree_size
    placed = []
    for offs, raw in chunks:
        placed.append((offs, raw, addr))
        addr += len(raw) + ((8 - len(raw) % 8) % 8)

    hdr = (
        struct.pack("<BxHII4x", 1, 4, 1, body_len)
        + msgs + filt + layout_msg(btree_addr)
    )
    block = bytearray(hdr)
    block += b"\x00" * (btree_addr - base - len(block))
    # B-tree v1 type 1, single leaf
    bt = bytearray()
    bt += b"TREE" + bytes([1, 0]) + struct.pack("<H", len(placed))
    bt += struct.pack("<QQ", UNDEF, UNDEF)
    for offs, raw, caddr in placed:
        bt += struct.pack("<II", len(raw), 0)
        bt += struct.pack(f"<{rank}Q", *offs)
        bt += struct.pack("<Q", caddr)
    # final key: one past the last chunk
    end_off = (placed[-1][0][0] + chunk_shape[0],) + (0,) * (rank - 1)
    bt += struct.pack("<II", 0, 0) + struct.pack(f"<{rank}Q", *end_off)
    bt += b"\x00" * (btree_size - len(bt))
    block += bt
    for offs, raw, caddr in placed:
        assert base + len(block) == caddr
        block += raw + b"\x00" * ((8 - len(raw) % 8) % 8)
    return bytes(block)


def write_hdf5(
    path: str,
    datasets: dict[str, np.ndarray],
    compress: bool = False,
    chunk_rows: int = 1024,
) -> None:
    """Write 1-D/2-D arrays as little-endian datasets in the root group —
    the layout libhdf5 writes for ann-benchmarks files, readable by h5py
    and by read_hdf5 above. ``compress=True`` stores each dataset as
    deflate-filtered row chunks (B-tree v1 chunk index) instead of one
    contiguous block."""
    names = sorted(datasets)
    arrays = {
        n: np.ascontiguousarray(
            datasets[n],
            dtype=datasets[n].dtype.newbyteorder("<"),
        )
        for n in names
    }

    # ---- layout bookkeeping (two passes: place, then emit) ----
    # file: superblock(24+72=96) | heap | btree | snod | per-ds [header|data]
    heap_names: dict[str, int] = {}
    heap_data = bytearray(b"\x00" * 8)  # offset 0: empty-string slot
    for n in names:
        heap_names[n] = len(heap_data)
        nb = n.encode() + b"\x00"
        heap_data += nb + b"\x00" * ((8 - len(nb) % 8) % 8)
    # trailing free block: next-offset=1 (end of list), size=16
    free_off = len(heap_data)
    heap_data += struct.pack("<QQ", 1, 16)

    sup_size = 96
    heap_hdr = 32
    heap_addr = sup_size
    heap_data_addr = heap_addr + heap_hdr
    btree_addr = heap_data_addr + len(heap_data)
    btree_size = 24 + 8 * 3  # one key/child/key triple
    snod_addr = btree_addr + btree_size
    snod_size = 8 + 40 * len(names)

    pos = snod_addr + snod_size
    oh_addrs: dict[str, int] = {}
    blocks: dict[str, bytes] = {}  # header + trailing data, 8-aligned
    for n in names:
        a = arrays[n]
        shape = a.shape
        space = bytes([1, len(shape), 0]) + b"\x00" * 5 + b"".join(
            struct.pack("<Q", s) for s in shape
        )
        msgs = _msg(0x01, space) + _msg(0x03, _dtype_message(a.dtype))
        oh_addrs[n] = pos
        if not compress:
            # layout message needs the data address — its size is fixed,
            # so the address is computable before emitting
            probe = _msg(0x08, bytes([3, 1]) + struct.pack("<QQ", 0, a.nbytes))
            body_len = len(msgs) + len(probe)
            data_addr = pos + 16 + body_len
            data_addr += (8 - data_addr % 8) % 8
            layout = _msg(
                0x08, bytes([3, 1]) + struct.pack("<QQ", data_addr, a.nbytes)
            )
            hdr = struct.pack("<BxHII4x", 1, 3, 1, body_len) + msgs + layout
            block = hdr + b"\x00" * (data_addr - pos - len(hdr)) + a.tobytes()
        else:
            block = _chunked_block(pos, msgs, a, shape, chunk_rows)
        block += b"\x00" * ((8 - len(block) % 8) % 8)
        blocks[n] = block
        pos += len(block)
    eof = pos

    out = bytearray()
    # ---- superblock v0 ----
    out += _SIG
    # versions (superblock, free-space, root-symtab, reserved, shared-msg),
    # size of offsets, size of lengths, reserved
    out += bytes([0, 0, 0, 0, 0, 8, 8, 0])
    out += struct.pack("<HH", 4, 16)  # group leaf/internal k
    out += struct.pack("<I", 0)  # consistency flags
    out += struct.pack("<QQQQ", 0, UNDEF, eof, UNDEF)
    # root symbol table entry: name off 0, header addr = we need a root
    # group object header — store it compactly as part of the entry's
    # cached btree/heap (cache type 1), with a minimal group header.
    # Simplest valid form: root object header right after snod area? Use
    # a dedicated tiny header before the first dataset header instead.
    root_oh_addr = eof
    out += struct.pack("<QQII", 0, root_oh_addr, 1, 0)
    out += struct.pack("<QQ", btree_addr, heap_addr)
    assert len(out) == 96, len(out)
    # ---- local heap ----
    out += b"HEAP" + bytes([0, 0, 0, 0])
    out += struct.pack("<QQQ", len(heap_data), free_off, heap_data_addr)
    out += heap_data
    # ---- group B-tree (one leaf pointing at one SNOD) ----
    assert len(out) == btree_addr
    out += b"TREE" + bytes([0, 0]) + struct.pack("<H", 1)
    out += struct.pack("<QQ", UNDEF, UNDEF)
    out += struct.pack("<QQQ", 0, snod_addr, heap_names[names[-1]])
    # ---- SNOD ----
    assert len(out) == snod_addr
    out += b"SNOD" + bytes([1, 0]) + struct.pack("<H", len(names))
    for n in names:
        out += struct.pack("<QQII", heap_names[n], oh_addrs[n], 0, 0)
        out += b"\x00" * 16
    # ---- dataset headers + data ----
    for n in names:
        assert len(out) == oh_addrs[n], (len(out), oh_addrs[n])
        out += blocks[n]
    # ---- root group object header (after data; v1, one symbol table msg) ----
    assert len(out) == root_oh_addr
    st = _msg(0x11, struct.pack("<QQ", btree_addr, heap_addr))
    out += struct.pack("<BxHII4x", 1, 1, 1, len(st)) + st
    # extend eof to include the root header
    struct.pack_into("<Q", out, 40, len(out))

    with open(path, "wb") as f:
        f.write(bytes(out))
