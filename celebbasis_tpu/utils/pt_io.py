"""Torch-free reader/writer for PyTorch ``.pt`` checkpoint files.

The reference framework's on-disk contracts are torch pickles:
``embeddings_gs-{step}.pt`` (``/root/reference/ldm/modules/embedding_manager.py:396-426``),
``celeb_basis.pt`` / ``id_embedding_{i}.pt`` (``/root/reference/scripts/extract_pt.py:95-140``)
and the pretrained ``sd-v1-4-full-ema.ckpt`` / ``backbone.pth`` weights.  To interoperate
without taking a torch dependency in the TPU runtime, this module implements the torch
ZIP serialization format directly:

* a ``.pt`` file is an uncompressed zipfile containing ``<name>/data.pkl`` (a pickle
  whose tensor leaves are persistent-id references) plus one raw little-endian buffer
  per storage under ``<name>/data/<key>``;
* the pickle references ``torch._utils._rebuild_tensor_v2(storage, offset, size,
  stride, requires_grad, hooks)`` with persistent ids
  ``('storage', <StorageType>, key, location, numel)``.

``load_pt`` returns the same nested structure with tensors as ``numpy`` arrays.
``save_pt`` emits archives that ``torch.load`` (including ``weights_only=True``)
accepts.  Legacy (non-zip) torch pickles produced by torch<1.6 are also readable.
"""
from __future__ import annotations

import io
import pickle
import struct
import zipfile
from typing import Any, Dict, List, Tuple

import numpy as np

# torch scalar-type name <-> numpy dtype. Storage class names are f"{Name}Storage".
_TORCH_TO_NP = {
    "Float": np.dtype("<f4"),
    "Double": np.dtype("<f8"),
    "Half": np.dtype("<f2"),
    "BFloat16": np.dtype("<u2"),  # no numpy bfloat16; see _BFloat16 wrapper below
    "Long": np.dtype("<i8"),
    "Int": np.dtype("<i4"),
    "Short": np.dtype("<i2"),
    "Char": np.dtype("<i1"),
    "Byte": np.dtype("<u1"),
    "Bool": np.dtype("?"),
}
_NP_TO_TORCH = {
    np.dtype("float32"): "Float",
    np.dtype("float64"): "Double",
    np.dtype("float16"): "Half",
    np.dtype("int64"): "Long",
    np.dtype("int32"): "Int",
    np.dtype("int16"): "Short",
    np.dtype("int8"): "Char",
    np.dtype("uint8"): "Byte",
    np.dtype("bool"): "Bool",
}

try:  # ml_dtypes ships with jax; gives us a real bfloat16 numpy dtype
    import ml_dtypes

    _BF16 = np.dtype(ml_dtypes.bfloat16)
    _NP_TO_TORCH[_BF16] = "BFloat16"
except Exception:  # pragma: no cover
    _BF16 = None


class _StorageRef:
    """Stand-in for a torch storage while unpickling: raw bytes + dtype."""

    __slots__ = ("data", "dtype_name")

    def __init__(self, data: bytes, dtype_name: str):
        self.data = data
        self.dtype_name = dtype_name


def _rebuild_tensor_v2(storage, storage_offset, size, stride, requires_grad=False,
                       backward_hooks=None, metadata=None):
    if not isinstance(storage, _StorageRef):  # raw untyped storage from new torch
        raise ValueError("unexpected storage object")
    dt = _TORCH_TO_NP[storage.dtype_name]
    flat = np.frombuffer(storage.data, dtype=dt)
    if storage.dtype_name == "BFloat16" and _BF16 is not None:
        flat = flat.view(_BF16)
    itemsize = flat.dtype.itemsize
    if size == ():
        return flat[storage_offset].copy()
    arr = np.lib.stride_tricks.as_strided(
        flat[storage_offset:],
        shape=tuple(size),
        strides=tuple(s * itemsize for s in stride),
    )
    return np.ascontiguousarray(arr)


def _rebuild_from_type_v2(func, new_type, args, state):
    return func(*args)


class _FakeClass:
    """Placeholder for torch classes referenced by name only (storage types)."""

    def __init__(self, module, name):
        self.module, self.name = module, name

    def __call__(self, *a, **k):  # pragma: no cover
        raise TypeError(f"cannot instantiate {self.module}.{self.name}")


# Globals a real checkpoint may legitimately reference. Everything else is
# rejected — unlike torch.load without weights_only, this loader never
# imports arbitrary modules from untrusted pickles.
_SAFE_GLOBALS = {
    ("collections", "OrderedDict"),
    ("collections", "defaultdict"),
    ("builtins", "dict"), ("builtins", "list"), ("builtins", "tuple"),
    ("builtins", "set"), ("builtins", "frozenset"), ("builtins", "slice"),
    ("builtins", "complex"), ("builtins", "bytearray"),
    ("numpy", "ndarray"), ("numpy", "dtype"),
    ("numpy.core.multiarray", "_reconstruct"),
    ("numpy.core.multiarray", "scalar"),
    ("_codecs", "encode"),
}


class _Unpickler(pickle.Unpickler):
    def __init__(self, file, loader):
        super().__init__(file, encoding="latin1")
        self._loader = loader

    def find_class(self, module, name):
        if name == "_rebuild_tensor_v2":
            return _rebuild_tensor_v2
        if name == "_rebuild_tensor":
            return lambda storage, offset, size, stride: _rebuild_tensor_v2(
                storage, offset, size, stride)
        if name == "_rebuild_from_type_v2":
            return _rebuild_from_type_v2
        if (module, name) in _SAFE_GLOBALS:
            return super().find_class(module, name)
        if module.startswith("torch") or module.startswith("numpy.core"):
            return _FakeClass(module, name)
        raise pickle.UnpicklingError(
            f"refusing to load global {module}.{name} from checkpoint "
            f"(not in the pt_io whitelist)")

    def persistent_load(self, pid):
        return self._loader(pid)


def _dtype_name_of(storage_type) -> str:
    name = getattr(storage_type, "name", None) or str(storage_type)
    for key in _TORCH_TO_NP:
        if f"{key}Storage" in name:
            return key
    if "Untyped" in name:
        return "Byte"
    raise ValueError(f"unknown storage type {name!r}")


def load_pt(path: str) -> Any:
    """Load a torch ``.pt``/``.pth``/``.ckpt`` file into numpy-leaf pytrees."""
    with open(path, "rb") as f:
        head = f.read(4)
    if head[:2] == b"PK":
        return _load_zip(path)
    return _load_legacy(path)


def _load_zip(path: str) -> Any:
    with zipfile.ZipFile(path) as zf:
        names = zf.namelist()
        pkl_name = next(n for n in names if n.endswith("/data.pkl") or n == "data.pkl")
        prefix = pkl_name[: -len("data.pkl")]
        storage_cache: Dict[str, bytes] = {}

        def loader(pid):
            kind, storage_type, key, _location, _numel = pid
            assert kind == "storage"
            if key not in storage_cache:
                storage_cache[key] = zf.read(f"{prefix}data/{key}")
            return _StorageRef(storage_cache[key], _dtype_name_of(storage_type))

        with zf.open(pkl_name) as pf:
            return _Unpickler(io.BufferedReader(pf), loader).load()


def _restricted_load(f) -> Any:
    """Header pickles (magic/protocol/sys_info) via the whitelisting
    unpickler — never plain pickle.load on untrusted bytes."""
    return _Unpickler(f, lambda pid: None).load()


def _load_legacy(path: str) -> Any:
    """torch<1.6 format: magic pickle, protocol pickle, sys_info, payload, keys."""
    with open(path, "rb") as f:
        magic = _restricted_load(f)
        if magic != 0x1950A86A20F9469CFC6C:
            raise ValueError("not a legacy torch file")
        _restricted_load(f)  # protocol version
        _restricted_load(f)  # sys info
        deserialized: Dict[str, Tuple[str, int]] = {}
        refs: Dict[str, _StorageRef] = {}

        def loader(pid):
            kind = pid[0]
            if kind == "storage":
                _, storage_type, root_key, _loc, numel, *_ = pid
                if root_key not in deserialized:
                    deserialized[root_key] = (_dtype_name_of(storage_type), numel)
                    refs[root_key] = _StorageRef(b"", deserialized[root_key][0])
                return refs[root_key]
            raise ValueError(f"unknown pid {pid!r}")

        result = _Unpickler(f, loader).load()
        keys = _restricted_load(f)
        for key in keys:
            dtype_name, numel = deserialized[key]
            itemsize = _TORCH_TO_NP[dtype_name].itemsize
            (size,) = struct.unpack("<q", f.read(8))
            assert size == numel, (size, numel)
            refs[key].data = f.read(numel * itemsize)
    return result


# ---------------------------------------------------------------------------
# Saving
# ---------------------------------------------------------------------------

class _TensorStub:
    """Marks a numpy array for serialization as a torch tensor."""

    def __init__(self, arr: np.ndarray):
        self.arr = arr


class _Pickler(pickle._Pickler):
    """Pickler that emits torch GLOBAL references without importing torch.

    Subclasses the pure-Python pickler: the C accelerator ignores ``save``
    overrides, which we need to intercept numpy leaves.
    """

    def __init__(self, file, storages: List[np.ndarray]):
        super().__init__(file, protocol=2)
        self._storages = storages

    def persistent_id(self, obj):
        return None

    def reducer_override(self, obj):
        return NotImplemented

    def save(self, obj, save_persistent_id=True):  # noqa: D401
        if isinstance(obj, _TensorStub):
            self._save_tensor(obj.arr)
            return
        if isinstance(obj, np.ndarray):
            self._save_tensor(obj)
            return
        if isinstance(obj, (np.floating,)):
            super().save(float(obj))
            return
        if isinstance(obj, (np.integer,)):
            super().save(int(obj))
            return
        super().save(obj, save_persistent_id)

    def _global(self, module: str, name: str):
        self.write(b"c" + module.encode() + b"\n" + name.encode() + b"\n")

    def _save_tensor(self, arr: np.ndarray):
        arr = np.ascontiguousarray(arr)
        if arr.dtype not in _NP_TO_TORCH:
            raise TypeError(f"cannot save dtype {arr.dtype} as a torch tensor")
        torch_name = _NP_TO_TORCH[arr.dtype]
        key = str(len(self._storages))
        self._storages.append(arr)
        # _rebuild_tensor_v2(storage, 0, size, stride, False, OrderedDict())
        self._global("torch._utils", "_rebuild_tensor_v2")
        self.write(b"(")  # MARK
        # persistent id tuple -> BINPERSID
        pid = ("storage", _FakeStorageGlobal(torch_name), key, "cpu", int(arr.size))
        self._save_pid(pid)
        super().save(0)  # storage offset
        super().save(tuple(int(s) for s in arr.shape))
        itemsize = arr.dtype.itemsize
        super().save(tuple(int(s) // itemsize for s in arr.strides))
        super().save(False)  # requires_grad
        self._global("collections", "OrderedDict")
        self.write(b")R")  # EMPTY_TUPLE REDUCE -> OrderedDict()
        self.write(b"t")  # TUPLE (args)
        self.write(b"R")  # REDUCE -> tensor

    def _save_pid(self, pid):
        self.write(b"(")  # MARK
        super().save(pid[0])
        self._global("torch", pid[1].name + "Storage")
        super().save(pid[2])
        super().save(pid[3])
        super().save(pid[4])
        self.write(b"t")  # TUPLE
        self.write(b"Q")  # BINPERSID


class _FakeStorageGlobal:
    def __init__(self, name):
        self.name = name


def save_pt(obj: Any, path: str) -> None:
    """Save a pytree of numpy arrays / python scalars as a torch-compatible .pt."""
    storages: List[np.ndarray] = []
    buf = io.BytesIO()
    _Pickler(buf, storages).dump(obj)
    with zipfile.ZipFile(path, "w", zipfile.ZIP_STORED) as zf:
        zf.writestr("archive/data.pkl", buf.getvalue())
        zf.writestr("archive/version", "3\n")
        zf.writestr("archive/byteorder", "little")
        for i, arr in enumerate(storages):
            zf.writestr(f"archive/data/{i}", arr.tobytes())
