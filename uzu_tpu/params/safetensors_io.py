"""Minimal safetensors reader/writer with bf16 support.

Hand-rolled (like the reference's own header parser,
crates/backend-uzu/src/parameters/safetensors_metadata.rs) because numpy has
no native bfloat16; we view raw bytes through ml_dtypes instead.

The format: u64 little-endian header length, then a JSON header mapping tensor
names to {dtype, shape, data_offsets}, optionally a "__metadata__" string map,
then the raw tensor bytes.
"""

from __future__ import annotations

import json
import struct
from dataclasses import dataclass

import ml_dtypes
import numpy as np

MAX_HEADER_SIZE = 100_000_000

_DTYPES: dict[str, np.dtype] = {
    "BOOL": np.dtype(np.bool_),
    "U8": np.dtype(np.uint8),
    "I8": np.dtype(np.int8),
    "I16": np.dtype(np.int16),
    "U16": np.dtype(np.uint16),
    "F16": np.dtype(np.float16),
    "BF16": np.dtype(ml_dtypes.bfloat16),
    "I32": np.dtype(np.int32),
    "U32": np.dtype(np.uint32),
    "F32": np.dtype(np.float32),
    "F64": np.dtype(np.float64),
    "I64": np.dtype(np.int64),
    "U64": np.dtype(np.uint64),
    "F8_E5M2": np.dtype(ml_dtypes.float8_e5m2),
    "F8_E4M3": np.dtype(ml_dtypes.float8_e4m3fn),
}
_DTYPE_NAMES = {v: k for k, v in _DTYPES.items()}


def dtype_name(dt: np.dtype) -> str:
    dt = np.dtype(dt)
    try:
        return _DTYPE_NAMES[dt]
    except KeyError:
        raise ValueError(f"unsupported safetensors dtype {dt}") from None


@dataclass(frozen=True)
class TensorInfo:
    dtype: np.dtype
    shape: tuple[int, ...]
    offset: int  # absolute byte offset into the file
    nbytes: int


class SafetensorsFile:
    """Lazy reader: header parsed eagerly, tensor bytes read on demand."""

    def __init__(self, path: str):
        self.path = path
        with open(path, "rb") as f:
            (header_len,) = struct.unpack("<Q", f.read(8))
            if header_len > MAX_HEADER_SIZE:
                raise ValueError("safetensors header too large")
            header = json.loads(f.read(header_len).decode("utf-8"))
        self.metadata: dict[str, str] = header.pop("__metadata__", {}) or {}
        base = 8 + header_len
        self.tensors: dict[str, TensorInfo] = {}
        for name, info in header.items():
            begin, end = info["data_offsets"]
            if end < begin:
                raise ValueError(f"invalid data offsets for {name}")
            self.tensors[name] = TensorInfo(
                dtype=_DTYPES[info["dtype"]],
                shape=tuple(info["shape"]),
                offset=base + begin,
                nbytes=end - begin,
            )

    def keys(self):
        return self.tensors.keys()

    def read(self, name: str) -> np.ndarray:
        info = self.tensors[name]
        expected = int(np.prod(info.shape, dtype=np.int64)) * info.dtype.itemsize
        if expected != info.nbytes:
            raise ValueError(
                f"tensor {name}: byte size {info.nbytes} != shape {info.shape} @ {info.dtype}"
            )
        with open(self.path, "rb") as f:
            f.seek(info.offset)
            buf = f.read(info.nbytes)
        return np.frombuffer(buf, dtype=info.dtype).reshape(info.shape)

    def read_many(self, names=None, threads: int = 0) -> dict[str, np.ndarray]:
        """Read many tensors in one pass via the native parallel reader
        (uzu_tpu/native/io_loader.cpp, the analogue of the reference's
        direct-into-allocation reads, parameters/loader.rs:192-213). Falls
        back to sequential reads without a toolchain."""
        names = list(names if names is not None else self.tensors)
        from ..native import io_loader

        lib = io_loader()
        if lib is None:
            return {n: self.read(n) for n in names}

        import ctypes

        arrays: dict[str, np.ndarray] = {}
        offs = (ctypes.c_uint64 * len(names))()
        sizes = (ctypes.c_uint64 * len(names))()
        dests = (ctypes.c_void_p * len(names))()
        for i, n in enumerate(names):
            info = self.tensors[n]
            expected = int(np.prod(info.shape, dtype=np.int64)) * info.dtype.itemsize
            if expected != info.nbytes:
                raise ValueError(f"tensor {n}: byte size mismatch")
            arr = np.empty(info.shape, dtype=info.dtype)
            arrays[n] = arr
            offs[i] = info.offset
            sizes[i] = info.nbytes
            dests[i] = arr.ctypes.data_as(ctypes.c_void_p)
        rc = lib.uz_read_parallel(
            self.path.encode(), len(names), offs, sizes, dests, threads
        )
        if rc != 0:
            raise OSError(-rc, f"native parallel read failed for {self.path}")
        return arrays


def save_file(path: str, tensors: dict[str, np.ndarray], metadata: dict[str, str] | None = None) -> None:
    header: dict = {}
    if metadata:
        header["__metadata__"] = {k: str(v) for k, v in metadata.items()}
    offset = 0
    order = list(tensors.items())
    for name, arr in order:
        n = arr.nbytes
        header[name] = {
            "dtype": dtype_name(arr.dtype),
            "shape": list(arr.shape),
            "data_offsets": [offset, offset + n],
        }
        offset += n
    blob = json.dumps(header).encode("utf-8")
    # pad header to 8-byte alignment (convention)
    pad = (-(8 + len(blob))) % 8
    blob += b" " * pad
    with open(path, "wb") as f:
        f.write(struct.pack("<Q", len(blob)))
        f.write(blob)
        for _, arr in order:
            f.write(np.ascontiguousarray(arr).tobytes())
