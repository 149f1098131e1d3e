"""Minimal pure-Python HDF5 reader — just enough of the format to read
BIOM v2.1 tables (and similar small scientific files) without h5py.

Implements, per the public HDF5 File Format Specification (v1.8 line):
- superblock version 0, 8-byte offsets/lengths
- version-1 object headers (+ continuation blocks)
- old-style groups: symbol-table message → v1 B-tree → SNOD nodes →
  local heap names
- dataspace (simple), datatype (fixed-point, IEEE float, fixed string,
  variable-length string), data layout v3 (compact, contiguous, and
  chunked via the v1 chunk B-tree — with deflate (gzip) and shuffle
  filters supported on the chunked path; see the filter-pipeline
  handling around the chunk reader)
- variable-length strings through global heap collections (GCOL)

This is not a general HDF5 implementation: no filters beyond
deflate+shuffle, no v2 headers, no fractal-heap groups — the subset
h5py emits for BIOM interchange files (compressed or not).
"""

from __future__ import annotations

import struct


class Hdf5Error(ValueError):
    pass


SIG = b"\x89HDF\r\n\x1a\n"
UNDEF = 0xFFFFFFFFFFFFFFFF


class _Dataset:
    def __init__(self, shape, dtype_info, raw: bytes, file: "Hdf5File"):
        self.shape = shape
        self.dtype_info = dtype_info  # (kind, size, extra)
        self.raw = raw
        self.file = file

    def __len__(self):
        return self.shape[0] if self.shape else 1

    def values_np(self):
        """Numeric dataset as a zero-copy numpy view over the raw buffer —
        the fast path for multi-million-element BIOM matrices, where
        per-element struct.unpack would dominate the scan."""
        import numpy as np

        kind, size, signed = self.dtype_info
        n = 1
        for d in self.shape:
            n *= d
        if kind == "int":
            dt = f"<i{size}" if signed else f"<u{size}"
        elif kind == "float":
            dt = f"<f{size}"
        else:
            raise Hdf5Error(f"values_np supports numeric datasets, not {kind}")
        return np.frombuffer(self.raw, dtype=dt, count=n)

    def values(self) -> list:
        kind, size, signed = self.dtype_info
        n = 1
        for d in self.shape:
            n *= d
        if kind == "int":
            fmt = {1: "b", 2: "h", 4: "i", 8: "q"}[size]
            if not signed:
                fmt = fmt.upper()
            return list(struct.unpack(f"<{n}{fmt}", self.raw[: n * size]))
        if kind == "float":
            fmt = {4: "f", 8: "d"}[size]
            return list(struct.unpack(f"<{n}{fmt}", self.raw[: n * size]))
        if kind == "string":
            out = []
            for i in range(n):
                s = self.raw[i * size : (i + 1) * size]
                out.append(s.split(b"\x00", 1)[0].decode())
            return out
        if kind == "vlen_str":
            out = []
            for i in range(n):
                off = i * 16
                length, gheap_addr, idx = struct.unpack_from("<IQI", self.raw, off)
                out.append(self.file._global_heap_object(gheap_addr, idx)[:length].decode())
            return out
        raise Hdf5Error(f"Unsupported dtype kind: {kind}")


class Hdf5File:
    def __init__(self, path: str):
        import mmap

        self._fh = open(path, "rb")
        try:
            # mmap: validation and metadata walks touch only the pages
            # they read — opening a multi-GB BIOM at bind time costs the
            # superblock, not the file
            self.buf = mmap.mmap(self._fh.fileno(), 0, access=mmap.ACCESS_READ)
        except ValueError:  # zero-length file
            self.buf = b""
        if self.buf[:8] != SIG:
            raise Hdf5Error(f"Not an HDF5 file: {path}")
        if self.buf[8] != 0:
            raise Hdf5Error(f"Unsupported superblock version {self.buf[8]}")
        size_offsets = self.buf[13]
        size_lengths = self.buf[14]
        if size_offsets != 8 or size_lengths != 8:
            raise Hdf5Error("Only 8-byte offsets/lengths supported")
        # root group symbol-table entry at fixed position for v0:
        # 24 bytes fixed + 4*8 addresses = 24 + 32 = byte 56
        root_entry = 24 + 32
        (self.root_addr,) = struct.unpack_from("<Q", self.buf, root_entry + 8)
        self._gheaps: dict[int, dict[int, bytes]] = {}

    # --- object headers ------------------------------------------------------

    def _messages(self, addr: int) -> list[tuple[int, bytes]]:
        buf = self.buf
        version, _r, nmsgs, _refs, hsize = struct.unpack_from("<BBHII", buf, addr)
        if version != 1:
            raise Hdf5Error(f"Unsupported object header version {version}")
        out = []
        blocks = [(addr + 16, hsize)]  # 12-byte prefix + 4 pad → 8-aligned
        count = 0
        while blocks and count < nmsgs:
            pos, remaining = blocks.pop(0)
            while remaining >= 8 and count < nmsgs:
                mtype, msize, _flags = struct.unpack_from("<HHB", buf, pos)
                body = buf[pos + 8 : pos + 8 + msize]
                pos += 8 + msize
                remaining -= 8 + msize
                count += 1
                if mtype == 0x0010:  # continuation
                    coff, clen = struct.unpack_from("<QQ", body, 0)
                    blocks.append((coff, clen))
                else:
                    out.append((mtype, body))
        return out

    # --- groups --------------------------------------------------------------

    def _heap_name(self, heap_addr: int, name_off: int) -> str:
        buf = self.buf
        if buf[heap_addr : heap_addr + 4] != b"HEAP":
            raise Hdf5Error("Bad local heap signature")
        (data_addr,) = struct.unpack_from("<Q", buf, heap_addr + 24)
        end = buf.find(b"\x00", data_addr + name_off)  # mmap has find, not index
        if end < 0:
            raise Hdf5Error("Unterminated heap string")
        return buf[data_addr + name_off : end].decode()

    def _group_entries(self, btree_addr: int, heap_addr: int) -> dict[int, int]:
        """name → object header addr from a v1 group B-tree."""
        buf = self.buf
        out: dict[str, int] = {}

        def walk(addr: int) -> None:
            if buf[addr : addr + 4] != b"TREE":
                raise Hdf5Error("Bad B-tree signature")
            node_type, level, nentries = struct.unpack_from("<BBH", buf, addr + 4)
            pos = addr + 8 + 16  # skip siblings
            children = []
            pos += 8  # key 0
            for _ in range(nentries):
                (child,) = struct.unpack_from("<Q", buf, pos)
                children.append(child)
                pos += 16  # child + next key
            for child in children:
                if level > 0:
                    walk(child)
                else:
                    if buf[child : child + 4] != b"SNOD":
                        raise Hdf5Error("Bad SNOD signature")
                    (nsyms,) = struct.unpack_from("<H", buf, child + 6)
                    epos = child + 8
                    for _ in range(nsyms):
                        name_off, ohdr = struct.unpack_from("<QQ", buf, epos)
                        out[self._heap_name(heap_addr, name_off)] = ohdr
                        epos += 40

        walk(btree_addr)
        return out

    def _children(self, addr: int) -> dict[str, int]:
        for mtype, body in self._messages(addr):
            if mtype == 0x0011:  # symbol table
                btree, heap = struct.unpack_from("<QQ", body, 0)
                return self._group_entries(btree, heap)
        return {}

    # --- datasets ------------------------------------------------------------

    def _parse_datatype(self, body: bytes):
        cls_ver = body[0]
        dclass = cls_ver & 0x0F
        bits = body[1:4]
        (size,) = struct.unpack_from("<I", body, 4)
        if dclass == 0:  # fixed-point
            signed = bool(bits[0] & 0x08)
            return ("int", size, signed)
        if dclass == 1:  # float
            return ("float", size, True)
        if dclass == 3:  # fixed string
            return ("string", size, False)
        if dclass == 9:  # variable-length
            if bits[0] & 0x0F == 1:
                return ("vlen_str", 16, False)
            raise Hdf5Error("Unsupported variable-length sequence type")
        raise Hdf5Error(f"Unsupported datatype class {dclass}")

    def _global_heap_object(self, gheap_addr: int, idx: int) -> bytes:
        buf = self.buf
        if gheap_addr not in self._gheaps:
            if buf[gheap_addr : gheap_addr + 4] != b"GCOL":
                raise Hdf5Error("Bad global heap signature")
            (csize,) = struct.unpack_from("<Q", buf, gheap_addr + 8)
            objs: dict[int, bytes] = {}
            pos = gheap_addr + 16
            end = gheap_addr + csize
            while pos + 16 <= end:
                oidx, _refc = struct.unpack_from("<HH", buf, pos)
                (osize,) = struct.unpack_from("<Q", buf, pos + 8)
                if oidx == 0:
                    break
                objs[oidx] = buf[pos + 16 : pos + 16 + osize]
                pos += 16 + ((osize + 7) & ~7)
            self._gheaps[gheap_addr] = objs
        return self._gheaps[gheap_addr][idx]

    def _parse_filters(self, body: bytes) -> list[int]:
        """Filter-pipeline message (0x000B) → ordered filter ids."""
        version, nfilters = body[0], body[1]
        ids = []
        pos = 8
        for _ in range(nfilters):
            fid, name_len, _flags, ncv = struct.unpack_from("<HHHH", body, pos)
            pos += 8
            pos += (name_len + 7) & ~7 if version == 1 else name_len
            pos += ncv * 4
            if version == 1 and ncv % 2 == 1:
                pos += 4  # v1 pads client values to 8 bytes
            ids.append(fid)
        return ids

    @staticmethod
    def _unshuffle(data: bytes, elem_size: int) -> bytes:
        n = len(data) // elem_size
        out = bytearray(len(data))
        for byte_idx in range(elem_size):
            plane = data[byte_idx * n : (byte_idx + 1) * n]
            out[byte_idx::elem_size] = plane
        return bytes(out)

    def _read_chunked(
        self, btree_addr: int, dims, chunk_dims, elem_size: int, filters: list[int]
    ) -> bytes:
        """Assemble contiguous data from a v1 chunk B-tree; supports the
        deflate (1) and shuffle (2) filters."""
        import zlib

        buf = self.buf
        ndim = len(dims)
        total = 1
        for d in dims:
            total *= d
        out = bytearray(total * elem_size)
        key_size = 8 + 8 * (ndim + 1)

        def walk(addr: int) -> None:
            if buf[addr : addr + 4] != b"TREE":
                raise Hdf5Error("Bad chunk B-tree signature")
            _t, level, nentries = struct.unpack_from("<BBH", buf, addr + 4)
            pos = addr + 24  # past siblings
            for _ in range(nentries):
                chunk_size, filter_mask = struct.unpack_from("<II", buf, pos)
                offsets = struct.unpack_from(f"<{ndim + 1}Q", buf, pos + 8)
                (child,) = struct.unpack_from("<Q", buf, pos + key_size)
                if level > 0:
                    walk(child)
                else:
                    chunk = buf[child : child + chunk_size]
                    # apply filters in reverse pipeline order; filter_mask
                    # bit i set means pipeline entry i was skipped on write
                    for i in range(len(filters) - 1, -1, -1):
                        if filter_mask & (1 << i):
                            continue
                        fid = filters[i]
                        if fid == 1:
                            chunk = zlib.decompress(chunk)
                        elif fid == 2:
                            chunk = self._unshuffle(chunk, elem_size)
                        elif fid == 3:
                            chunk = chunk[:-4]  # fletcher32 checksum suffix
                        else:
                            raise Hdf5Error(f"Unsupported filter id {fid}")
                    _scatter(chunk, offsets[:ndim])
                pos += key_size + 8

        def _scatter(chunk: bytes, origin) -> None:
            # row-major copy of the chunk into the full array
            if ndim == 1:
                start = origin[0]
                n = min(chunk_dims[0], dims[0] - start)
                out[start * elem_size : (start + n) * elem_size] = chunk[: n * elem_size]
                return
            # general N-d: iterate chunk rows of the last dimension
            inner = chunk_dims[-1]
            outer_counts = chunk_dims[:-1]
            idx = [0] * (ndim - 1)
            row = 0
            while True:
                src = row * inner * elem_size
                coord = [origin[d] + idx[d] for d in range(ndim - 1)]
                if all(coord[d] < dims[d] for d in range(ndim - 1)):
                    flat = 0
                    for d in range(ndim - 1):
                        flat = flat * dims[d] + coord[d]
                    flat = flat * dims[-1] + origin[-1]
                    n = min(inner, dims[-1] - origin[-1])
                    out[flat * elem_size : (flat + n) * elem_size] = chunk[src : src + n * elem_size]
                row += 1
                for d in range(ndim - 2, -1, -1):
                    idx[d] += 1
                    if idx[d] < outer_counts[d]:
                        break
                    idx[d] = 0
                else:
                    return

        walk(btree_addr)
        return bytes(out)

    def _dataset(self, addr: int) -> _Dataset:
        dims: tuple = ()
        dtype_info = None
        raw = b""
        messages = self._messages(addr)
        filters: list[int] = []
        for mtype, body in messages:
            if mtype == 0x000B:
                filters = self._parse_filters(body)
        for mtype, body in messages:
            if mtype == 0x0001:  # dataspace
                version, ndims = body[0], body[1]
                if version == 1:
                    dims = struct.unpack_from(f"<{ndims}Q", body, 8)
                else:
                    dims = struct.unpack_from(f"<{ndims}Q", body, 4)
            elif mtype == 0x0003:
                dtype_info = self._parse_datatype(body)
            elif mtype == 0x0008:  # layout
                version = body[0]
                if version != 3:
                    raise Hdf5Error(f"Unsupported layout version {version}")
                lclass = body[1]
                if lclass == 0:  # compact
                    (csize,) = struct.unpack_from("<H", body, 2)
                    raw = body[4 : 4 + csize]
                elif lclass == 1:  # contiguous
                    daddr, dsize = struct.unpack_from("<QQ", body, 2)
                    raw = b"" if daddr == UNDEF else self.buf[daddr : daddr + dsize]
                elif lclass == 2:  # chunked
                    ndim_plus = body[2]
                    (btree,) = struct.unpack_from("<Q", body, 3)
                    cdims = struct.unpack_from(f"<{ndim_plus}I", body, 11)
                    chunk_dims, elem_size = cdims[:-1], cdims[-1]
                    raw = (
                        b""
                        if btree == UNDEF
                        else self._read_chunked(btree, dims, chunk_dims, elem_size, filters)
                    )
                else:
                    raise Hdf5Error(f"Unsupported layout class {lclass}")
        if dtype_info is None:
            raise Hdf5Error("Object is not a dataset")
        return _Dataset(dims, dtype_info, raw, self)

    # --- public API ----------------------------------------------------------

    def read(self, path: str) -> list:
        """Values of the dataset at 'group/sub/dataset'."""
        addr = self.root_addr
        parts = [p for p in path.split("/") if p]
        for part in parts[:-1]:
            children = self._children(addr)
            if part not in children:
                raise Hdf5Error(f"No such group: {part}")
            addr = children[part]
        children = self._children(addr)
        if parts[-1] not in children:
            raise Hdf5Error(f"No such dataset: {parts[-1]}")
        return self._dataset(children[parts[-1]]).values()

    def read_np(self, path: str):
        """Numeric dataset at 'group/sub/dataset' as a numpy array."""
        addr = self.root_addr
        parts = [p for p in path.split("/") if p]
        for part in parts[:-1]:
            children = self._children(addr)
            if part not in children:
                raise Hdf5Error(f"No such group: {part}")
            addr = children[part]
        children = self._children(addr)
        if parts[-1] not in children:
            raise Hdf5Error(f"No such dataset: {parts[-1]}")
        return self._dataset(children[parts[-1]]).values_np()

    def exists(self, path: str) -> bool:
        try:
            addr = self.root_addr
            for part in [p for p in path.split("/") if p]:
                children = self._children(addr)
                if part not in children:
                    return False
                addr = children[part]
            return True
        except Hdf5Error:
            return False


# ============================================================================
# Minimal writer — enough to emit a BIOM v2.1-shaped HDF5 file that this
# module's reader (and standard tools) can open: superblock v0, v1 object
# headers, symbol-table groups, contiguous datasets (int64/float64/fixed
# strings). No filters, no attributes.
# ============================================================================


def _pad8(b: bytes) -> bytes:
    return b + b"\x00" * ((8 - len(b) % 8) % 8)


def _dtype_message(kind: str, size: int) -> bytes:
    if kind == "int":
        # class 0 v1, signed, LE; properties: bit offset 0, precision
        body = bytes([0x10, 0x08, 0x00, 0x00]) + struct.pack("<I", size)
        body += struct.pack("<HH", 0, size * 8)
        return body
    if kind == "float":
        # class 1 v1, IEEE F64LE properties
        body = bytes([0x11, 0x20, 0x3F, 0x00]) + struct.pack("<I", size)
        body += struct.pack("<HHBBBBI", 0, 64, 52, 11, 0, 52, 1023)
        return body
    if kind == "string":
        # class 3 v1, null-terminated ASCII
        body = bytes([0x13, 0x00, 0x00, 0x00]) + struct.pack("<I", size)
        return body
    raise Hdf5Error(f"writer: unsupported kind {kind}")


class Hdf5Writer:
    """Assemble a small HDF5 file: ``add_dataset('grp/sub/name', values,
    kind)`` with kind in {'int','float','string'}, then ``save(path)``."""

    def __init__(self):
        self.datasets: dict[str, tuple[list, str]] = {}

    def add_dataset(self, path: str, values: list, kind: str) -> None:
        self.datasets[path] = (values, kind)

    def save(self, path: str) -> None:
        buf = bytearray(b"\x00" * 96)  # superblock reserved
        UNDEF8 = b"\xff" * 8

        def append(data: bytes) -> int:
            addr = len(buf)
            buf.extend(data)
            return addr

        def object_header(messages: list[tuple[int, bytes]]) -> int:
            bodies = [(t, _pad8(b)) for t, b in messages]
            total = sum(8 + len(b) for _t, b in bodies)
            hdr = struct.pack("<BBHII", 1, 0, len(bodies), 1, total) + b"\x00" * 4
            for t, b in bodies:
                hdr += struct.pack("<HHB3x", t, len(b), 0) + b
            return append(hdr)

        def dataset_header(values, kind: str) -> int:
            import numpy as _np

            if kind == "string":
                width = max((len(v.encode()) for v in values), default=0) + 1
                raw = b"".join(v.encode().ljust(width, b"\x00") for v in values)
                elem = width
            elif kind == "int":
                if isinstance(values, _np.ndarray):  # vectorized fast path
                    raw = values.astype("<i8").tobytes()
                else:
                    raw = struct.pack(f"<{len(values)}q", *[int(v) for v in values])
                elem = 8
            else:
                if isinstance(values, _np.ndarray):
                    raw = values.astype("<f8").tobytes()
                else:
                    raw = struct.pack(f"<{len(values)}d", *[float(v) for v in values])
                elem = 8
            data_addr = append(raw)
            buf.extend(b"\x00" * ((8 - len(buf) % 8) % 8))
            dataspace = struct.pack("<BB6x", 1, 1) + struct.pack("<Q", len(values))
            layout = struct.pack("<BB", 3, 1) + struct.pack("<QQ", data_addr, len(raw))
            return object_header(
                [
                    (0x0001, dataspace),
                    (0x0003, _dtype_message(kind, elem)),
                    (0x0008, layout),
                ]
            )

        def group_header(children: dict[str, int]) -> int:
            # local heap with child names
            names = sorted(children)
            offsets = {}
            heap_data = bytearray()
            for n in names:
                offsets[n] = len(heap_data)
                heap_data.extend(n.encode() + b"\x00")
                heap_data.extend(b"\x00" * ((8 - len(heap_data) % 8) % 8))
            heap_data_addr_pos = None
            heap = bytearray(b"HEAP" + bytes([0, 0, 0, 0]))
            heap += struct.pack("<Q", len(heap_data))
            heap += UNDEF8  # no free list
            heap_addr = len(buf)
            heap += struct.pack("<Q", heap_addr + 32)  # data right after header
            buf.extend(heap)
            buf.extend(heap_data)
            # SNOD with all entries (names sorted)
            snod = bytearray(b"SNOD" + bytes([1, 0]) + struct.pack("<H", len(names)))
            for n in names:
                snod += struct.pack("<QQ", offsets[n], children[n])
                snod += struct.pack("<I4x16x", 0)
            snod_addr = append(bytes(snod))
            # B-tree: single leaf pointing at the SNOD
            btree = bytearray(b"TREE" + bytes([0, 0]) + struct.pack("<H", 1))
            btree += UNDEF8 + UNDEF8  # siblings
            btree += struct.pack("<Q", 0)  # key 0
            btree += struct.pack("<Q", snod_addr)
            btree += struct.pack("<Q", offsets[names[-1]] if names else 0)  # key 1
            btree_addr = append(bytes(btree))
            symtab = struct.pack("<QQ", btree_addr, heap_addr)
            return object_header([(0x0011, symtab)])

        # build the tree bottom-up
        tree: dict = {}
        for dpath, (values, kind) in self.datasets.items():
            parts = dpath.split("/")
            node = tree
            for p in parts[:-1]:
                node = node.setdefault(p, {})
            node[parts[-1]] = (values, kind)

        def emit(node: dict) -> int:
            children = {}
            for name, sub in node.items():
                if isinstance(sub, dict):
                    children[name] = emit(sub)
                else:
                    children[name] = dataset_header(*sub)
            return group_header(children)

        root_addr = emit(tree)
        # superblock v0
        sb = bytearray(SIG)
        sb += bytes([0, 0, 0, 0, 0, 8, 8, 0])
        sb += struct.pack("<HH", 4, 16)  # leaf k, internal k
        sb += struct.pack("<I", 0)  # consistency flags
        sb += struct.pack("<Q", 0)  # base address
        sb += UNDEF8  # free space
        sb += struct.pack("<Q", len(buf))  # EOF
        sb += UNDEF8  # driver info
        # root symbol table entry: name offset 0, header addr, no cache
        sb += struct.pack("<QQ", 0, root_addr) + struct.pack("<I4x16x", 0)
        buf[: len(sb)] = sb
        with open(path, "wb") as f:
            f.write(bytes(buf))
