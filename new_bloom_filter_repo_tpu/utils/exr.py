"""Minimal first-party OpenEXR reader/writer (uncompressed scanline).

The reference advertises HDR support and declares pyexr as a dependency
but never imports it (SURVEY.md §2 dead-code notes: the only HDR
adjacency is the itemsize->float32 decode rule).  This module provides
real EXR ingest/egress without external imaging libraries: version-2
single-part scanline files, compression NONE, FLOAT or HALF channels.
That covers lossless HDR round trips — bit-pattern exact, which is what
the codec's verification requires (bit equality, not numeric closeness).
"""

from __future__ import annotations

import struct
from typing import Dict, List, Tuple

import numpy as np

MAGIC = 0x01312F76
PIXELTYPE_HALF = 1
PIXELTYPE_FLOAT = 2

_DTYPES = {PIXELTYPE_HALF: np.dtype("<f2"), PIXELTYPE_FLOAT: np.dtype("<f4")}


def _write_attr(buf: List[bytes], name: str, type_: str, value: bytes):
    buf.append(name.encode() + b"\x00" + type_.encode() + b"\x00")
    buf.append(struct.pack("<i", len(value)))
    buf.append(value)


def write_exr(path: str, image: np.ndarray,
              channel_names: Tuple[str, ...] = None) -> None:
    """Write HxW or HxWxC float32/float16 image as an uncompressed EXR.

    Default channel naming: ('Y',) for 1, ('B','G','R') for 3 (matching
    the cv2/BGR frame convention used across the codec), ('A','B','G','R')
    for 4.
    """
    image = np.asarray(image)
    if image.ndim == 2:
        image = image[:, :, None]
    h, w, c = image.shape
    if channel_names is None:
        channel_names = {1: ("Y",), 3: ("B", "G", "R"),
                         4: ("A", "B", "G", "R")}[c]
    if image.dtype == np.float16:
        ptype, dt = PIXELTYPE_HALF, np.dtype("<f2")
    else:
        image = image.astype(np.float32)
        ptype, dt = PIXELTYPE_FLOAT, np.dtype("<f4")

    # channel list: sorted by name, each: name\0 i32 type, pLinear+pad,
    # xSampling, ySampling
    order = sorted(range(c), key=lambda i: channel_names[i])
    chlist = b""
    for i in order:
        chlist += (channel_names[i].encode() + b"\x00"
                   + struct.pack("<i", ptype) + b"\x00\x00\x00\x00"
                   + struct.pack("<ii", 1, 1))
    chlist += b"\x00"

    hdr: List[bytes] = [struct.pack("<ii", MAGIC, 2)]
    _write_attr(hdr, "channels", "chlist", chlist)
    _write_attr(hdr, "compression", "compression", b"\x00")  # NONE
    box = struct.pack("<iiii", 0, 0, w - 1, h - 1)
    _write_attr(hdr, "dataWindow", "box2i", box)
    _write_attr(hdr, "displayWindow", "box2i", box)
    _write_attr(hdr, "lineOrder", "lineOrder", b"\x00")
    _write_attr(hdr, "pixelAspectRatio", "float", struct.pack("<f", 1.0))
    _write_attr(hdr, "screenWindowCenter", "v2f",
                struct.pack("<ff", 0.0, 0.0))
    _write_attr(hdr, "screenWindowWidth", "float", struct.pack("<f", 1.0))
    hdr.append(b"\x00")
    header = b"".join(hdr)

    pixel_bytes = dt.itemsize
    line_size = w * c * pixel_bytes
    offsets_pos = len(header)
    data_pos = offsets_pos + 8 * h

    lines = []
    offsets = []
    pos = data_pos
    for y in range(h):
        offsets.append(pos)
        row = np.concatenate(
            [np.ascontiguousarray(image[y, :, i].astype(dt))
             for i in order]).tobytes()
        rec = struct.pack("<ii", y, line_size) + row
        lines.append(rec)
        pos += len(rec)

    with open(path, "wb") as f:
        f.write(header)
        f.write(struct.pack(f"<{h}q", *offsets))
        for rec in lines:
            f.write(rec)


def read_exr(path: str) -> np.ndarray:
    """Read an uncompressed scanline EXR; returns HxW or HxWxC float
    (float32 for FLOAT, float16 for HALF), channels in B,G,R order when
    those names are present (frame convention), else alphabetical."""
    with open(path, "rb") as f:
        data = f.read()
    magic, version = struct.unpack_from("<ii", data, 0)
    if magic != MAGIC:
        raise ValueError(f"not an EXR file: {path}")
    if version & 0x200:
        raise ValueError("multi-part EXR not supported")
    off = 8
    attrs: Dict[str, tuple] = {}
    while data[off] != 0:
        e = data.index(b"\x00", off)
        name = data[off:e].decode()
        off = e + 1
        e = data.index(b"\x00", off)
        type_ = data[off:e].decode()
        off = e + 1
        size = struct.unpack_from("<i", data, off)[0]
        off += 4
        attrs[name] = (type_, data[off:off + size])
        off += size
    off += 1  # header terminator

    comp = attrs["compression"][1][0]
    if comp != 0:
        raise ValueError(f"only uncompressed EXR supported (compression="
                         f"{comp})")
    x0, y0, x1, y1 = struct.unpack("<iiii", attrs["dataWindow"][1])
    w, h = x1 - x0 + 1, y1 - y0 + 1

    chdata = attrs["channels"][1]
    channels = []
    p = 0
    while chdata[p] != 0:
        e = chdata.index(b"\x00", p)
        name = chdata[p:e].decode()
        p = e + 1
        ptype = struct.unpack_from("<i", chdata, p)[0]
        p += 16  # type + pLinear/pad + samplings
        channels.append((name, ptype))
    c = len(channels)
    dts = [_DTYPES[t] for _, t in channels]

    offsets = struct.unpack_from(f"<{h}q", data, off)
    out_dtype = np.result_type(*dts) if len(set(dts)) > 1 else dts[0]
    img = np.empty((h, w, c), out_dtype)
    for oi in offsets:
        y, _size = struct.unpack_from("<ii", data, oi)
        p = oi + 8
        for ci, (name, ptype) in enumerate(channels):
            dt = _DTYPES[ptype]
            row = np.frombuffer(data, dt, w, p)
            img[y - y0, :, ci] = row
            p += w * dt.itemsize

    names = [n for n, _ in channels]
    if set(names) >= {"B", "G", "R"}:
        want = ["B", "G", "R"] + [n for n in names
                                  if n not in ("B", "G", "R")]
        img = img[:, :, [names.index(n) for n in want]]
    if c == 1:
        return img[:, :, 0]
    return img
