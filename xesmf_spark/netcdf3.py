"""Minimal pure-numpy NetCDF-3 "classic" reader/writer for weight files.

The reference stores regridding weights as netCDF triplet files written
by ESMF (dims ``n_s``; vars ``S double, col int, row int`` with
**1-based** indices — xesmf/smm.py:10-41, layout shown in
doc/notebooks/Backend.ipynb cell 21). Interop with those files is a
core reuse workflow (Reuse_regridder.ipynb), and no netCDF library is
available in this environment — but the classic file format (CDF-1) is
a small, public, self-describing binary layout, so the subset needed
for flat 1-D variables is implemented here directly.

Format (NetCDF classic, big-endian throughout):
  magic 'CDF\\x01' | numrecs | dim_list | gatt_list | var_list | data
  lists are [tag int32, count int32, entries...] or ABSENT [0, 0];
  names are [len int32, bytes padded to 4]; each var is
  [name, ndims, dimids..., vatt_list, nc_type, vsize, begin].
Only non-record, 1-D variables of type int (4) and double (6) are
supported — exactly the weight-file shape.
"""

from __future__ import annotations

import struct

import numpy as np

NC_DIMENSION = 0x0A
NC_VARIABLE = 0x0B
NC_ATTRIBUTE = 0x0C

_TYPES = {4: (">i4", 4), 6: (">f8", 8)}  # nc_type -> (numpy dtype, size)
_NC_OF_DTYPE = {"int32": 4, "float64": 6}


def _pad4(n: int) -> int:
    return (4 - n % 4) % 4


def _write_name(out: bytearray, name: str) -> None:
    b = name.encode()
    out += struct.pack(">i", len(b)) + b + b"\x00" * _pad4(len(b))


def _read_name(buf: bytes, pos: int) -> tuple[str, int]:
    (n,) = struct.unpack_from(">i", buf, pos)
    pos += 4
    name = buf[pos : pos + n].decode()
    pos += n + _pad4(n)
    return name, pos


def write_netcdf3(path: str, dims: dict[str, int], variables: dict[str, tuple[tuple[str, ...], np.ndarray]]) -> None:
    """Write 1-D non-record variables to a classic NetCDF-3 file.

    ``variables``: name -> (dim names, array). Arrays must be int32 or
    float64 (cast beforehand)."""
    dim_names = list(dims)
    header = bytearray()
    header += b"CDF\x01" + struct.pack(">i", 0)  # magic + numrecs
    # dim_list
    header += struct.pack(">ii", NC_DIMENSION, len(dim_names))
    for d in dim_names:
        _write_name(header, d)
        header += struct.pack(">i", dims[d])
    # gatt_list: absent
    header += struct.pack(">ii", 0, 0)
    # var_list — first pass with placeholder offsets to size the header
    def var_block(offsets: dict[str, int]) -> bytes:
        out = bytearray()
        out += struct.pack(">ii", NC_VARIABLE, len(variables))
        for name, (vdims, arr) in variables.items():
            _write_name(out, name)
            out += struct.pack(">i", len(vdims))
            for d in vdims:
                out += struct.pack(">i", dim_names.index(d))
            out += struct.pack(">ii", 0, 0)  # vatt_list absent
            nc_type = _NC_OF_DTYPE[str(arr.dtype.newbyteorder("="))]
            size = arr.size * _TYPES[nc_type][1]
            out += struct.pack(">i", nc_type)
            out += struct.pack(">i", size + _pad4(size))
            out += struct.pack(">i", offsets.get(name, 0))
        return bytes(out)

    base = len(header) + len(var_block({}))
    offsets: dict[str, int] = {}
    pos = base
    for name, (_, arr) in variables.items():
        offsets[name] = pos
        size = arr.size * _TYPES[_NC_OF_DTYPE[str(arr.dtype.newbyteorder("="))]][1]
        pos += size + _pad4(size)

    with open(path, "wb") as f:
        f.write(bytes(header))
        f.write(var_block(offsets))
        for name, (_, arr) in variables.items():
            nc_type = _NC_OF_DTYPE[str(arr.dtype.newbyteorder("="))]
            raw = arr.astype(_TYPES[nc_type][0]).tobytes()
            f.write(raw + b"\x00" * _pad4(len(raw)))


def read_netcdf3(path: str) -> tuple[dict[str, int], dict[str, np.ndarray]]:
    """Read a classic NetCDF-3 file (1-D non-record variables only).
    Returns (dims, {var: array})."""
    buf = open(path, "rb").read()
    if buf[:3] != b"CDF" or buf[3] not in (1, 2):
        raise ValueError(f"{path}: not a classic NetCDF file")
    offset_fmt = ">i" if buf[3] == 1 else ">q"
    pos = 8  # magic + numrecs
    tag, count = struct.unpack_from(">ii", buf, pos)
    pos += 8
    dims: list[tuple[str, int]] = []
    if tag == NC_DIMENSION:
        for _ in range(count):
            name, pos = _read_name(buf, pos)
            (size,) = struct.unpack_from(">i", buf, pos)
            pos += 4
            dims.append((name, size))
    # global attributes: skip
    pos = _skip_atts(buf, pos)
    tag, count = struct.unpack_from(">ii", buf, pos)
    pos += 8
    out: dict[str, np.ndarray] = {}
    if tag == NC_VARIABLE:
        for _ in range(count):
            name, pos = _read_name(buf, pos)
            (ndims,) = struct.unpack_from(">i", buf, pos)
            pos += 4
            dimids = struct.unpack_from(f">{ndims}i", buf, pos) if ndims else ()
            pos += 4 * ndims
            pos = _skip_atts(buf, pos)
            (nc_type,) = struct.unpack_from(">i", buf, pos)
            pos += 4
            (_vsize,) = struct.unpack_from(">i", buf, pos)
            pos += 4
            (begin,) = struct.unpack_from(offset_fmt, buf, pos)
            pos += struct.calcsize(offset_fmt)
            if nc_type not in _TYPES:
                raise ValueError(f"{path}: unsupported nc_type {nc_type} for {name}")
            n = 1
            for d in dimids:
                n *= dims[d][1]
            dt, width = _TYPES[nc_type]
            out[name] = np.frombuffer(buf, dtype=dt, count=n, offset=begin).astype(
                dt.lstrip(">")
            )
    return dict(dims), out


def _skip_atts(buf: bytes, pos: int) -> int:
    tag, count = struct.unpack_from(">ii", buf, pos)
    pos += 8
    if tag != NC_ATTRIBUTE:
        return pos
    for _ in range(count):
        _, pos = _read_name(buf, pos)
        (nc_type,) = struct.unpack_from(">i", buf, pos)
        pos += 4
        (n,) = struct.unpack_from(">i", buf, pos)
        pos += 4
        width = {1: 1, 2: 1, 3: 2, 4: 4, 5: 4, 6: 8}[nc_type]
        size = n * width
        pos += size + _pad4(size)
    return pos
