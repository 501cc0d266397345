#!/usr/bin/env python3
"""Generate MATLAB v7.3-layout HDF5 `.set` fixtures from scratch.

Independent twin of graft.sources.Hdf5Lite: this writer emits the HDF5
byte layout sequentially from the published HDF5 File Format Specification
(superblock v0, version-1 object headers, old-style symbol-table groups =
B-tree v1 + local heap + SNOD, contiguous and chunked+deflate data
layouts, object references) with MATLAB's v7.3 conventions on top (512-byte
userblock carrying the `MATLAB 7.3 MAT-file` header text, arrays stored
TRANSPOSED — HDF5 dims are the reverse of MATLAB dims, char arrays as
uint16, struct arrays as groups of object-reference datasets into #refs#).
No h5py/libhdf5 anywhere — pure struct.pack, so reader and writer share no
code and no assumptions beyond the spec.

Usage: python3 tools/make_v73_fixtures.py <outdir>
Writes: v73_struct.set (EEG group, chunked+deflate data, chanlocs refs),
        v73_toplevel.set (fields as root datasets, contiguous data),
        v73_fdt.set (data = '.fdt' filename char dataset)
"""
import struct
import sys
import zlib

UNDEF = 0xFFFFFFFFFFFFFFFF
USERBLOCK = 512


class W:
    """File image builder; all addresses RELATIVE TO BASE (=userblock)."""

    def __init__(self):
        self.buf = bytearray()

    def alloc(self, size, align=8):
        while len(self.buf) % align:
            self.buf.append(0)
        addr = len(self.buf)
        self.buf.extend(b"\0" * size)
        return addr

    def put(self, addr, data):
        self.buf[addr:addr + len(data)] = data


def msg(mtype, body):
    """V1 object-header message: type, size, flags, 3 reserved, body
    padded to a multiple of 8."""
    pad = (8 - len(body) % 8) % 8
    body = body + b"\0" * pad
    return struct.pack("<HHB3s", mtype, len(body), 0, b"\0\0\0") + body


def dataspace_msg(dims):
    # version 1, rank, flags 0, 5 reserved, dims as 8-byte lengths
    return msg(0x0001, struct.pack("<BBB5s", 1, len(dims), 0, b"\0" * 5) +
               b"".join(struct.pack("<Q", d) for d in dims))


def datatype_msg(cls, size, signed=False):
    # class_and_version byte: version 1 << 4 | class; 24 bit-field bits;
    # properties: enough zero bytes for fixed/float (reader skips by size)
    bits0 = 0x08 if signed else 0x00
    props = b"\0" * 16
    return msg(0x0003, struct.pack("<BBBBI", (1 << 4) | cls, bits0, 0, 0,
                                   size) + props)


def layout_contiguous_msg(addr, size):
    return msg(0x0008, struct.pack("<BBQQ", 3, 1, addr, size))


def layout_chunked_msg(btree_addr, chunk_dims, elem_size):
    dims = list(chunk_dims) + [elem_size]
    return msg(0x0008, struct.pack("<BBB", 3, 2, len(dims)) +
               struct.pack("<Q", btree_addr) +
               b"".join(struct.pack("<I", d) for d in dims))


def deflate_pipeline_msg():
    # version 1, 1 filter, 6 reserved; filter: id=1, namelen=0, flags=0,
    # 1 client value (level), +4 pad for odd count
    return msg(0x000B, struct.pack("<BB6s", 1, 1, b"\0" * 6) +
               struct.pack("<HHHH", 1, 0, 0, 1) +
               struct.pack("<I", 6) + b"\0" * 4)


def object_header(w, messages):
    """Write a v1 object header, return its address."""
    body = b"".join(messages)
    addr = w.alloc(16 + len(body))
    w.put(addr, struct.pack("<BBHII4s", 1, 0, len(messages), 1,
                            len(body), b"\0" * 4) + body)
    return addr


def write_dataset(w, dims, dtype, payload, chunk=None):
    """dtype: ('f64'|'u16'|'ref'); payload: bytes in HDF5 row-major order.
    Returns object header address."""
    cls, size, signed = {"f64": (1, 8, False), "u16": (0, 2, False),
                         "i16": (0, 2, True), "ref": (7, 8, False)}[dtype]
    msgs = [dataspace_msg(dims), datatype_msg(cls, size, signed=signed)]
    if chunk is None:
        daddr = w.alloc(len(payload))
        w.put(daddr, payload)
        msgs.append(layout_contiguous_msg(daddr, len(payload)))
    else:
        msgs.append(deflate_pipeline_msg())
        # split payload (row-major over dims) into chunks, deflate each
        chunks = []
        counts = [(d + c - 1) // c for d, c in zip(dims, chunk)]

        def rec(idx):
            if len(idx) == len(dims):
                chunks.append(tuple(i * c for i, c in zip(idx, chunk)))
                return
            for i in range(counts[len(idx)]):
                rec(idx + [i])
        rec([])
        entries = []
        for origin in chunks:
            raw = bytearray()
            def emit(local, coords):
                if len(coords) == len(dims):
                    inb = all(c < d for c, d in zip(coords, dims))
                    if inb:
                        lin = 0
                        for c, d in zip(coords, dims):
                            lin = lin * d + c
                        raw.extend(payload[lin * size:(lin + 1) * size])
                    else:
                        raw.extend(b"\0" * size)
                    return
                for i in range(chunk[len(coords)]):
                    emit(local, coords + (origin[len(coords)] + i,))
            emit(None, ())
            comp = zlib.compress(bytes(raw), 6)
            caddr = w.alloc(len(comp))
            w.put(caddr, comp)
            entries.append((origin, caddr, len(comp)))
        # single level-0 chunk B-tree node
        rank1 = len(dims) + 1
        keysz = 8 + 8 * rank1
        naddr = w.alloc(24 + len(entries) * (keysz + 8) + keysz)
        node = bytearray()
        node += b"TREE" + struct.pack("<BBH", 1, 0, len(entries))
        node += struct.pack("<QQ", UNDEF, UNDEF)
        for origin, caddr, csize in entries:
            node += struct.pack("<II", csize, 0)
            node += b"".join(struct.pack("<Q", o) for o in origin)
            node += struct.pack("<Q", 0)          # elem-dim offset
            node += struct.pack("<Q", caddr)
        node += struct.pack("<II", 0, 0) + b"\0" * (8 * rank1)  # final key
        w.put(naddr, bytes(node))
        msgs.append(layout_chunked_msg(naddr, chunk, size))
    return object_header(w, msgs)


def write_group(w, children):
    """Old-style group: local heap + SNOD + B-tree; children is a list of
    (name, object_header_addr) — written in sorted-name order. Returns
    group object header address."""
    children = sorted(children)
    # local heap: offset 0 = 8 reserved zero bytes, then names
    names = bytearray(b"\0" * 8)
    offsets = []
    for name, _ in children:
        offsets.append(len(names))
        names += name.encode() + b"\0"
    while len(names) % 8:
        names += b"\0"
    hdata = w.alloc(len(names))
    w.put(hdata, bytes(names))
    heap = w.alloc(32)
    w.put(heap, b"HEAP" + struct.pack("<B3sQQQ", 0, b"\0" * 3,
                                      len(names), UNDEF, hdata))
    snod = w.alloc(8 + 40 * len(children))
    ent = b"".join(
        struct.pack("<QQII16s", off, addr, 0, 0, b"\0" * 16)
        for (name, addr), off in zip(children, offsets))
    w.put(snod, b"SNOD" + struct.pack("<BBH", 1, 0, len(children)) + ent)
    btree = w.alloc(24 + 2 * 8 + 8)
    w.put(btree, b"TREE" + struct.pack("<BBH", 0, 0, 1) +
          struct.pack("<QQ", UNDEF, UNDEF) +
          struct.pack("<QQQ", 0, snod, offsets[-1] if offsets else 0))
    return object_header(w, [msg(0x0011, struct.pack("<QQ", btree, heap))])


def f64s(vals):
    return b"".join(struct.pack("<d", v) for v in vals)


def u16s(s):
    return b"".join(struct.pack("<H", ord(c)) for c in s)


def char_ds(w, s):
    """MATLAB char array [1, len] -> HDF5 uint16 dims (len, 1)."""
    return write_dataset(w, (len(s), 1), "u16", u16s(s))


def chanlocs_group(w, labels):
    """MATLAB 1xN struct array -> group of per-field object-ref datasets."""
    refs = [char_ds(w, lab) for lab in labels]
    thetas = [write_dataset(w, (1, 1), "f64", f64s([0.0])) for _ in labels]
    lab_ds = write_dataset(w, (len(labels), 1), "ref",
                           b"".join(struct.pack("<Q", r) for r in refs))
    th_ds = write_dataset(w, (len(labels), 1), "ref",
                          b"".join(struct.pack("<Q", r) for r in thetas))
    return write_group(w, [("labels", lab_ds), ("theta", th_ds)])


def build_file(build_children, out):
    """Two-pass: image addresses are relative to base (=512), and the
    superblock itself lives at the start of that address space — reserve
    its footprint first so object addresses never collide with it."""
    w = W()
    w.alloc(96, align=8)  # superblock v0 + root STE footprint
    root = write_group(w, build_children(w))
    img = bytearray(w.buf)
    sb = b"\x89HDF\r\n\x1a\n"
    sb += struct.pack("<BBBBBBBB", 0, 0, 0, 0, 0, 8, 8, 0)
    sb += struct.pack("<HHI", 4, 16, 0)
    sb += struct.pack("<QQQQ", USERBLOCK, UNDEF, len(img), UNDEF)
    sb += struct.pack("<QQII16s", 0, root, 0, 0, b"\0" * 16)
    assert len(sb) <= 96
    img[0:len(sb)] = sb
    userblock = bytearray(512)
    txt = b"MATLAB 7.3 MAT-file, graft synthetic fixture (HDF5)"
    userblock[:len(txt)] = txt
    userblock[124:128] = bytes([0, 2, ord('I'), ord('M')])
    with open(out, "wb") as f:
        f.write(bytes(userblock))
        f.write(bytes(img))
    print(f"wrote {out} ({512 + len(img)} bytes)")


def trace_payload():
    """E1 = 1..10, E2 = 10..100 (the shared q75/q101/q102 shape), MATLAB
    [nbchan=2, pnts=10] column-major == HDF5 dims (10, 2) row-major."""
    flat = []
    for s in range(10):
        flat += [float(s + 1), float((s + 1) * 10)]
    return f64s(flat)


def i16s(vals):
    return b"".join(struct.pack("<h", v) for v in vals)


def struct_children(w):
    eeg = write_group(w, [
        ("srate", write_dataset(w, (1, 1), "f64", f64s([4.0]))),
        ("nbchan", write_dataset(w, (1, 1), "f64", f64s([2.0]))),
        ("pnts", write_dataset(w, (1, 1), "f64", f64s([10.0]))),
        ("trials", write_dataset(w, (1, 1), "f64", f64s([1.0]))),
        ("data", write_dataset(w, (10, 2), "f64", trace_payload(),
                               chunk=(4, 2))),
        ("chanlocs", chanlocs_group(w, ["Fz", "Pz"])),
    ])
    return [("EEG", eeg)]


def toplevel_children(w):
    return [
        ("srate", write_dataset(w, (1, 1), "f64", f64s([4.0]))),
        ("nbchan", write_dataset(w, (1, 1), "f64", f64s([2.0]))),
        ("data", write_dataset(w, (10, 2), "f64", trace_payload())),
        ("chanlocs", chanlocs_group(w, ["Fz", "Pz"])),
    ]


def fdt_children(w):
    eeg = write_group(w, [
        ("srate", write_dataset(w, (1, 1), "f64", f64s([4.0]))),
        ("nbchan", write_dataset(w, (1, 1), "f64", f64s([2.0]))),
        ("data", char_ds(w, "rec9.fdt")),
        ("chanlocs", chanlocs_group(w, ["Fz", "Pz"])),
    ])
    return [("EEG", eeg)]


def i16_children(w):
    """EEG.data as SIGNED int16 (MATLAB int16 numeric): must decode as
    numbers (incl. negatives), never as char text."""
    flat = []
    for s in range(10):
        flat += [s + 1 - 5, (s + 1) * 10 - 50]   # negatives included
    eeg = write_group(w, [
        ("srate", write_dataset(w, (1, 1), "f64", f64s([4.0]))),
        ("nbchan", write_dataset(w, (1, 1), "f64", f64s([2.0]))),
        ("data", write_dataset(w, (10, 2), "i16", i16s(flat))),
        ("chanlocs", chanlocs_group(w, ["Fz", "Pz"])),
    ])
    return [("EEG", eeg)]


if __name__ == "__main__":
    outdir = sys.argv[1]
    build_file(struct_children, f"{outdir}/v73_struct.set")
    build_file(toplevel_children, f"{outdir}/v73_toplevel.set")
    build_file(fdt_children, f"{outdir}/v73_fdt.set")
    build_file(i16_children, f"{outdir}/v73_int16.set")
