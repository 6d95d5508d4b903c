"""Minimal classic NetCDF-3 codec — pure numpy/struct, no C library.

The reference's only input format is NetCDF (opened via
xarray/netCDF4, mop_utils.py:330-346) and its output is CMOR-written
NetCDF (mopper/mopper.py:174-351).  This container ships neither
library, so this module implements the CLASSIC file format (CDF-1 and
the 64-bit-offset CDF-2 variant) directly from the public spec — the
on-disk layout is a simple big-endian header + contiguous data blocks:

    magic('CDF\\x01'|'CDF\\x02')  numrecs
    dim_list   := NC_DIMENSION  n  (name, length)*      # length 0 = record dim
    gatt_list  := NC_ATTRIBUTE  n  (name, type, vals)*
    var_list   := NC_VARIABLE   n  (name, dimids, vatts, type, vsize, begin)*
    data       := fixed-size vars in `begin` order, then per-record
                  slabs of every record variable, record-major

Types: NC_BYTE=1 NC_CHAR=2 NC_SHORT=3 NC_INT=4 NC_FLOAT=5 NC_DOUBLE=6,
all big-endian; every name/value block pads to a 4-byte boundary; a
variable's ``vsize`` is its (per-record) byte count rounded up to 4 —
except the spec's special case of a SINGLE record variable of
byte/char/short type, which is laid out unpadded.

Scale note: the codec runs inside executor tasks (one file per call,
bytes → numpy via ``frombuffer``); nothing here touches the driver.
"""

from __future__ import annotations

import struct

import numpy as np

NC_BYTE, NC_CHAR, NC_SHORT, NC_INT, NC_FLOAT, NC_DOUBLE = 1, 2, 3, 4, 5, 6
_TAG_DIM, _TAG_VAR, _TAG_ATT = 0x0A, 0x0B, 0x0C
_ABSENT = b"\x00\x00\x00\x00\x00\x00\x00\x00"

_NP_OF = {
    NC_BYTE: np.dtype(">i1"), NC_CHAR: np.dtype("S1"),
    NC_SHORT: np.dtype(">i2"), NC_INT: np.dtype(">i4"),
    NC_FLOAT: np.dtype(">f4"), NC_DOUBLE: np.dtype(">f8"),
}
_SIZE_OF = {NC_BYTE: 1, NC_CHAR: 1, NC_SHORT: 2, NC_INT: 4,
            NC_FLOAT: 4, NC_DOUBLE: 8}
_TYPE_OF_KIND = {("i", 1): NC_BYTE, ("i", 2): NC_SHORT, ("i", 4): NC_INT,
                 ("f", 4): NC_FLOAT, ("f", 8): NC_DOUBLE}


def _pad4(n: int) -> int:
    return (n + 3) & ~3


# ------------------------------------------------------------------ read

class _Reader:
    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 0

    def take(self, n: int) -> bytes:
        b = self.buf[self.pos : self.pos + n]
        self.pos += n
        return b

    def i4(self) -> int:
        return struct.unpack(">i", self.take(4))[0]

    def name(self) -> str:
        n = self.i4()
        s = self.take(_pad4(n))[:n]
        return s.decode("utf-8")

    def values(self, nc_type: int, nelems: int):
        nbytes = nelems * _SIZE_OF[nc_type]
        raw = self.take(_pad4(nbytes))[:nbytes]
        if nc_type == NC_CHAR:
            return raw.decode("utf-8", errors="replace")
        return np.frombuffer(raw, dtype=_NP_OF[nc_type]).copy()

    def att_list(self) -> dict:
        tag, n = self.i4(), self.i4()
        out = {}
        for _ in range(n if tag == _TAG_ATT else 0):
            nm = self.name()
            t = self.i4()
            ne = self.i4()
            out[nm] = self.values(t, ne)
        return out


def read_netcdf3(path: str):
    """Parse a classic NetCDF-3 file.

    Returns ``(dims, gatts, variables)`` where ``dims`` maps name →
    length (record dim reported at its actual record count), and
    ``variables`` maps name → dict(dims=tuple[str], attrs=dict,
    data=np.ndarray in native little-endian).

    The file is memory-mapped, not slurped: header parsing and the
    per-record ``frombuffer`` gathers only page in the bytes they
    touch, so decoding one variable of a multi-GB file costs that
    variable's pages — the executor-side memory story for wide files."""
    import mmap

    with open(path, "rb") as f:
        buf = mmap.mmap(f.fileno(), 0, access=mmap.ACCESS_READ)
    if buf[:3] != b"CDF" or buf[3] not in (1, 2):
        raise ValueError(f"{path!r} is not a classic NetCDF file")
    large = buf[3] == 2
    r = _Reader(buf)
    r.pos = 4
    numrecs = r.i4()

    tag, ndims = r.i4(), r.i4()
    dim_names, dim_lens = [], []
    for _ in range(ndims if tag == _TAG_DIM else 0):
        dim_names.append(r.name())
        dim_lens.append(r.i4())
    rec_dim = dim_lens.index(0) if 0 in dim_lens else -1

    gatts = r.att_list()

    tag, nvars = r.i4(), r.i4()
    headers = []
    for _ in range(nvars if tag == _TAG_VAR else 0):
        nm = r.name()
        nd = r.i4()
        dimids = [r.i4() for _ in range(nd)]
        vatts = r.att_list()
        t = r.i4()
        vsize = r.i4()
        begin = struct.unpack(">q", r.take(8))[0] if large else r.i4()
        headers.append((nm, dimids, vatts, t, vsize, begin))

    rec_vars = [h for h in headers if rec_dim in h[1]]
    # spec special case: one byte/char/short record var is packed unpadded
    packed = (len(rec_vars) == 1
              and rec_vars[0][3] in (NC_BYTE, NC_CHAR, NC_SHORT))

    def slab_bytes(h):
        nm, dimids, _, t, _, _ = h
        n = 1
        for d in dimids:
            if d != rec_dim:
                n *= dim_lens[d]
        raw = n * _SIZE_OF[t]
        return raw if packed else _pad4(raw)

    recsize = sum(slab_bytes(h) for h in rec_vars)

    variables = {}
    for nm, dimids, vatts, t, vsize, begin in headers:
        shape = [numrecs if d == rec_dim else dim_lens[d] for d in dimids]
        dt = _NP_OF[t]
        if rec_dim in dimids:
            n_inner = int(np.prod([dim_lens[d] for d in dimids
                                   if d != rec_dim], dtype=np.int64))
            parts = [np.frombuffer(buf, dtype=dt, count=n_inner,
                                   offset=begin + rec * recsize)
                     for rec in range(numrecs)]
            data = (np.stack(parts).reshape(shape) if parts
                    else np.empty(shape, dtype=dt))
        else:
            n = int(np.prod(shape, dtype=np.int64)) if shape else 1
            data = np.frombuffer(buf, dtype=dt, count=n, offset=begin) \
                     .reshape(shape)
        if t != NC_CHAR:
            data = data.astype(data.dtype.newbyteorder("="))
        variables[nm] = {
            "dims": tuple(dim_names[d] for d in dimids),
            "attrs": vatts,
            "data": data,
        }

    dims = {nm: (numrecs if ln == 0 else ln)
            for nm, ln in zip(dim_names, dim_lens)}
    return dims, gatts, variables


# ----------------------------------------------------------------- write

def _enc_name(s: str) -> bytes:
    b = s.encode("utf-8")
    return struct.pack(">i", len(b)) + b + b"\x00" * (_pad4(len(b)) - len(b))


def _nc_type_of(arr: np.ndarray) -> int:
    if arr.dtype.kind == "S" or arr.dtype.kind == "U":
        return NC_CHAR
    key = (arr.dtype.kind, arr.dtype.itemsize)
    if key == ("i", 8):
        raise ValueError("classic NetCDF has no 64-bit integer type")
    return _TYPE_OF_KIND[key]


def _enc_values(value) -> tuple[int, int, bytes]:
    if isinstance(value, str):
        raw = value.encode("utf-8")
        return NC_CHAR, len(raw), raw + b"\x00" * (_pad4(len(raw)) - len(raw))
    arr = np.atleast_1d(np.asarray(value))
    t = _nc_type_of(arr)
    raw = arr.astype(_NP_OF[t]).tobytes()
    return t, arr.size, raw + b"\x00" * (_pad4(len(raw)) - len(raw))


def _enc_att_list(attrs: dict) -> bytes:
    if not attrs:
        return _ABSENT
    out = [struct.pack(">ii", _TAG_ATT, len(attrs))]
    for nm, v in attrs.items():
        t, ne, raw = _enc_values(v)
        out.append(_enc_name(nm) + struct.pack(">ii", t, ne) + raw)
    return b"".join(out)


def write_netcdf3(path: str, dims: dict, variables: dict,
                  gatts: dict | None = None, record_dim: str | None = None,
                  version: int = 1):
    """Write a classic (CDF-1) or 64-bit-offset (CDF-2) NetCDF file.

    ``dims`` maps name → length; ``record_dim`` names the unlimited
    dimension (its ``dims`` entry is the record COUNT to emit).
    ``variables`` maps name → (dim_names: tuple, data: np.ndarray,
    attrs: dict).  Data is converted to its matching external type
    (i1/i2/i4/f4/f8, big-endian) automatically.

    ``version=2`` writes 64-bit ``begin`` offsets (CDF-2) — required
    once any variable starts beyond 2 GiB, the regime of the
    reference's >4 GB chunked CMOR writes (mopper.py:335-341); chosen
    automatically if the layout demands it."""
    gatts = gatts or {}
    dim_names = list(dims)
    dim_index = {nm: k for k, nm in enumerate(dim_names)}
    numrecs = dims[record_dim] if record_dim else 0

    ordered = list(variables.items())
    rec_vars = [(nm, v) for nm, v in ordered if record_dim in v[0]]
    fix_vars = [(nm, v) for nm, v in ordered if record_dim not in v[0]]
    packed = (len(rec_vars) == 1
              and _nc_type_of(np.asarray(rec_vars[0][1][1]))
              in (NC_BYTE, NC_CHAR, NC_SHORT))

    def vsize_of(dimnames, t):
        n = 1
        for d in dimnames:
            if d != record_dim:
                n *= dims[d]
        raw = n * _SIZE_OF[t]
        return raw if packed and record_dim in dimnames else _pad4(raw)

    # header with placeholder begins to learn its size, then final pass
    def build(begins):
        head = [b"CDF\x02" if version == 2 else b"CDF\x01",
                struct.pack(">i", numrecs)]
        if dims:
            head.append(struct.pack(">ii", _TAG_DIM, len(dim_names)))
            for nm in dim_names:
                ln = 0 if nm == record_dim else dims[nm]
                head.append(_enc_name(nm) + struct.pack(">i", ln))
        else:
            head.append(_ABSENT)
        head.append(_enc_att_list(gatts))
        if ordered:
            head.append(struct.pack(">ii", _TAG_VAR, len(ordered)))
            for nm, (dimnames, data, vatts) in ordered:
                t = _nc_type_of(np.asarray(data))
                head.append(_enc_name(nm))
                head.append(struct.pack(">i", len(dimnames)))
                for d in dimnames:
                    head.append(struct.pack(">i", dim_index[d]))
                head.append(_enc_att_list(vatts or {}))
                head.append(struct.pack(">ii", t, vsize_of(dimnames, t)))
                head.append(struct.pack(">q" if version == 2 else ">i",
                                        begins[nm]))
        else:
            head.append(_ABSENT)
        return b"".join(head)

    def layout():
        header_len = len(build({nm: 0 for nm, _ in ordered}))
        begins, off = {}, header_len
        for nm, (dimnames, data, _) in fix_vars:
            begins[nm] = off
            off += vsize_of(dimnames, _nc_type_of(np.asarray(data)))
        rec_begin = off
        for nm, (dimnames, data, _) in rec_vars:
            begins[nm] = off
            off += vsize_of(dimnames, _nc_type_of(np.asarray(data)))
        return begins, off - rec_begin, rec_begin

    begins, recsize, rec_begin = layout()
    if version == 1 and (rec_begin + max(1, numrecs) * recsize > 2**31 - 1
                         or any(b > 2**31 - 1 for b in begins.values())):
        version = 2          # auto-upgrade: CDF-1 begins are int32
        begins, recsize, rec_begin = layout()

    def ext_bytes(data, dimnames):
        arr = np.asarray(data)
        t = _nc_type_of(arr)
        raw = arr.astype(_NP_OF[t]).tobytes()
        want = vsize_of(dimnames, t)
        if record_dim in dimnames:  # per-record slab padding handled below
            return raw, t
        return raw + b"\x00" * (want - len(raw)), t

    with open(path, "wb") as f:
        f.write(build(begins))
        for nm, (dimnames, data, _) in fix_vars:
            raw, _t = ext_bytes(data, dimnames)
            f.write(raw)
        for rec in range(numrecs):
            for nm, (dimnames, data, _) in rec_vars:
                arr = np.asarray(data)
                t = _nc_type_of(arr)
                # np.asarray: a scalar slab (1-D record var) would
                # otherwise .astype() to NATIVE byte order silently
                slab = np.asarray(arr[rec]).astype(_NP_OF[t]).tobytes()
                want = vsize_of(dimnames, t) if not packed else len(slab)
                f.write(slab + b"\x00" * (want - len(slab)))
