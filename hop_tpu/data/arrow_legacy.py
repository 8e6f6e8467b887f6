"""Legacy ``pyarrow.serialize`` (Arrow <= 0.17) codec on modern pyarrow.

The reference stores every LMDB value with the long-removed
``pyarrow.serialize(obj).to_buffer()`` API (data_preprocessor.py:172,
lmdb_data_loader.py:122) — pyarrow 0.14's Python-object serialization.
Modern pyarrow dropped ``serialize``/``deserialize`` entirely, so real HOP
artifacts are unreadable with today's libraries. This module re-implements
the wire format on top of the still-supported primitives (legacy V4 IPC
record-batch streams + ``ipc.write_tensor``/``read_tensor``):

  int32 num_tensors, [int32 num_sparse_tensors (arrow >= 0.15)],
  int32 num_ndarrays, int32 num_buffers
  <pad to 8>  record-batch stream: one batch, one dense-union column
  per tensor/ndarray: <pad to 64> ipc tensor message
  per buffer: int64 length + bytes

Python objects are encoded as a dense union whose children are created
on demand per value type ("bool", "int", "string", "bytes", "float",
"double", "ndarray" (int32 index into the tensor section), "list",
"tuple", "set" (list<union> each with its own sub-union per nesting
level), "dict" (struct<keys: list<union>, vals: list<union>>)) — the
layout arrow/python/serialize.cc produced. The decoder dispatches on
child *names* and tolerates both the 0.14 (3-count) and 0.15+ (4-count)
headers, sniffed via the header words.
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa
import pyarrow.ipc as ipc

_IPC_ALIGN = 8
_TENSOR_ALIGN = 64


# ---------------------------------------------------------------------------
# encoding
# ---------------------------------------------------------------------------

class _SeqBuilder:
    """Python analog of arrow 0.14's SequenceBuilder: one dense union per
    nesting level, children created lazily in first-appearance order."""

    def __init__(self, ndarrays: list):
        self.ndarrays = ndarrays
        self.type_ids: list[int] = []
        self.offsets: list[int] = []
        self.children: dict[str, object] = {}   # name -> builder/list
        self.order: list[str] = []

    def _tag(self, name: str, make):
        if name not in self.children:
            self.children[name] = make()
            self.order.append(name)
        return self.order.index(name), self.children[name]

    def append(self, obj):
        if obj is None:
            raise TypeError(
                "None is not supported by the legacy-arrow encoder (the "
                "reference's clip dicts contain no None values)")
        if isinstance(obj, bool) or isinstance(obj, np.bool_):
            tid, child = self._tag("bool", list)
            self._emit(tid, child, bool(obj))
        elif isinstance(obj, (int, np.integer)):
            tid, child = self._tag("int", list)
            self._emit(tid, child, int(obj))
        elif isinstance(obj, np.float32):
            tid, child = self._tag("float", list)
            self._emit(tid, child, float(obj))
        elif isinstance(obj, (float, np.floating)):
            tid, child = self._tag("double", list)
            self._emit(tid, child, float(obj))
        elif isinstance(obj, str):
            tid, child = self._tag("string", list)
            self._emit(tid, child, obj)
        elif isinstance(obj, bytes):
            tid, child = self._tag("bytes", list)
            self._emit(tid, child, obj)
        elif isinstance(obj, np.ndarray):
            tid, child = self._tag("ndarray", list)
            idx = len(self.ndarrays)
            self.ndarrays.append(np.ascontiguousarray(obj))
            self._emit(tid, child, idx)
        elif isinstance(obj, (list, tuple, set)):
            name = ("list" if isinstance(obj, list)
                    else "tuple" if isinstance(obj, tuple) else "set")
            tid, child = self._tag(name, lambda: _ListChild(self.ndarrays))
            self.type_ids.append(tid)
            self.offsets.append(child.append(list(obj)))
        elif isinstance(obj, dict):
            tid, child = self._tag("dict", lambda: _DictChild(self.ndarrays))
            self.type_ids.append(tid)
            self.offsets.append(child.append(obj))
        else:
            raise TypeError(f"unsupported type for legacy-arrow: {type(obj)}")

    def _emit(self, tid, child: list, value):
        self.type_ids.append(tid)
        self.offsets.append(len(child))
        child.append(value)

    def finish(self) -> pa.UnionArray:
        arrays, names = [], []
        for name in self.order:
            child = self.children[name]
            if name == "bool":
                arrays.append(pa.array(child, type=pa.bool_()))
            elif name == "int":
                arrays.append(pa.array(child, type=pa.int64()))
            elif name == "float":
                arrays.append(pa.array(child, type=pa.float32()))
            elif name == "double":
                arrays.append(pa.array(child, type=pa.float64()))
            elif name == "string":
                arrays.append(pa.array(child, type=pa.utf8()))
            elif name == "bytes":
                arrays.append(pa.array(child, type=pa.binary()))
            elif name == "ndarray":
                arrays.append(pa.array(child, type=pa.int32()))
            else:
                arrays.append(child.finish())
            names.append(name)
        if not arrays:   # empty sequence: single dummy child keeps it valid
            arrays, names = [pa.array([], type=pa.int64())], ["int"]
        return pa.UnionArray.from_dense(
            pa.array(self.type_ids, type=pa.int8()),
            pa.array(self.offsets, type=pa.int32()),
            arrays, field_names=names)


class _ListChild:
    def __init__(self, ndarrays):
        self.sub = _SeqBuilder(ndarrays)
        self.offsets = [0]

    def append(self, items: list) -> int:
        for it in items:
            self.sub.append(it)
        self.offsets.append(len(self.sub.type_ids))
        return len(self.offsets) - 2

    def finish(self) -> pa.ListArray:
        return pa.ListArray.from_arrays(
            pa.array(self.offsets, type=pa.int32()), self.sub.finish())


class _DictChild:
    def __init__(self, ndarrays):
        self.keys = _ListChild(ndarrays)
        self.vals = _ListChild(ndarrays)
        self.n = 0

    def append(self, d: dict) -> int:
        self.keys.append(list(d.keys()))
        self.vals.append(list(d.values()))
        self.n += 1
        return self.n - 1

    def finish(self) -> pa.StructArray:
        return pa.StructArray.from_arrays(
            [self.keys.finish(), self.vals.finish()], names=["keys", "vals"])


def _pad_to(out, align):
    rem = out.tell() % align
    if rem:
        out.write(b"\0" * (align - rem))


def serialize(obj) -> bytes:
    """Encode ``obj`` in the legacy ``pyarrow.serialize`` wire format
    (0.14 header variant: three int32 counts)."""
    ndarrays: list[np.ndarray] = []
    root = _SeqBuilder(ndarrays)
    root.append(obj)
    union = root.finish()
    batch = pa.record_batch([union], names=["list"])

    sink = pa.BufferOutputStream()
    opts = ipc.IpcWriteOptions(use_legacy_format=True,
                               metadata_version=ipc.MetadataVersion.V4)
    writer = ipc.new_stream(sink, batch.schema, options=opts)
    writer.write_batch(batch)
    writer.close()
    stream = sink.getvalue().to_pybytes()

    import io
    out = io.BytesIO()
    out.write(struct.pack("<iii", 0, len(ndarrays), 0))
    _pad_to(out, _IPC_ALIGN)
    out.write(stream)
    for arr in ndarrays:
        _pad_to(out, _TENSOR_ALIGN)
        tsink = pa.BufferOutputStream()
        ipc.write_tensor(pa.Tensor.from_numpy(arr), tsink)
        out.write(tsink.getvalue().to_pybytes())
    return out.getvalue()


# ---------------------------------------------------------------------------
# decoding
# ---------------------------------------------------------------------------

_SCALAR_TAGS = {
    "bool": bool, "int": int, "py2_int": int, "large_int": int,
    "float": float, "half_float": float, "double": float,
    "string": str, "unicode": str, "py2_string": bytes, "bytes": bytes,
}


def _decode_union(u: pa.UnionArray, i: int, tensors: list):
    code = u.type_codes[i].as_py()
    # map the data type_id to the child index via the union type's codes
    child_idx = list(u.type.type_codes).index(code)
    name = u.type.field(child_idx).name
    off = u.offsets[i].as_py() if u.type.mode == "dense" else i
    child = u.field(child_idx)
    if name in _SCALAR_TAGS:
        v = child[off].as_py()
        return _SCALAR_TAGS[name](v) if v is not None else None
    if name in ("ndarray", "tensor"):
        return tensors[child[off].as_py()]
    if name == "buffer":
        return tensors[child[off].as_py()]
    if name in ("list", "tuple", "set"):
        sub = child.values
        lo = child.offsets[off].as_py()
        hi = child.offsets[off + 1].as_py()
        items = [_decode_union(sub, j, tensors) for j in range(lo, hi)]
        return (items if name == "list"
                else tuple(items) if name == "tuple" else set(items))
    if name == "dict":
        keys_l, vals_l = child.field(0), child.field(1)
        ks = [_decode_union(keys_l.values, j, tensors)
              for j in range(keys_l.offsets[off].as_py(),
                             keys_l.offsets[off + 1].as_py())]
        vs = [_decode_union(vals_l.values, j, tensors)
              for j in range(vals_l.offsets[off].as_py(),
                             vals_l.offsets[off + 1].as_py())]
        return dict(zip(ks, vs))
    if name == "date64":
        return child[off].as_py()
    raise ValueError(f"unknown legacy-arrow union tag {name!r}")


def deserialize(buf: bytes):
    """Decode a legacy ``pyarrow.serialize`` payload.

    The 0.14 header is [n_tensors, n_ndarrays, n_buffers] (+4 bytes pad),
    the 0.15+ header adds a sparse-tensor count after n_tensors; both end
    at byte 16 where the IPC stream begins. The words alone can be
    ambiguous (zero counts), so the plausible interpretation is tried
    first and the other on ANY parse failure."""
    buf = bytes(buf)
    w = struct.unpack_from("<iiii", buf, 0)
    v15 = (w[0], w[2], w[3])     # (n_tensors, n_ndarrays, n_buffers)
    v14 = (w[0], w[1], w[2])
    order = [v15, v14] if (w[1] == 0 and w[2] > 0) else [v14, v15]
    last_err = None
    for counts in order:
        if min(counts) < 0 or max(counts) > 10 ** 6:
            continue
        try:
            return _deserialize_with_counts(buf, *counts)
        except Exception as e:   # wrong layout guess -> try the other
            last_err = e
    raise ValueError(f"cannot decode legacy-arrow payload "
                     f"(header words {w}): {last_err}")


def _deserialize_with_counts(buf: bytes, n_tensors: int, n_ndarrays: int,
                             n_buffers: int):
    pos = 16

    reader = pa.BufferReader(buf)
    reader.seek(pos)
    stream = ipc.open_stream(reader)
    batch = stream.read_next_batch()
    try:
        stream.read_next_batch()
    except StopIteration:
        pass
    pos = reader.tell()

    tensors = []
    for _ in range(n_tensors + n_ndarrays):
        pos += (-pos) % _TENSOR_ALIGN
        reader.seek(pos)
        t = ipc.read_tensor(reader)
        tensors.append(t.to_numpy())
        pos = reader.tell()
    for _ in range(n_buffers):
        pos += (-pos) % _TENSOR_ALIGN
        (blen,) = struct.unpack_from("<q", buf, pos)
        pos += 8
        tensors.append(buf[pos:pos + blen])
        pos += blen

    col = batch.column(0)
    if isinstance(col, pa.ListArray):          # root wrapped as list<union>
        col = col.values
    if not isinstance(col, pa.UnionArray):
        raise ValueError(f"unexpected root column type {col.type}")
    return _decode_union(col, 0, tensors)
