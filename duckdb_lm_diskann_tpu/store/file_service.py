"""File-system service over graph.lmd: ctypes binding to the native C++
block store, with a pure-Python fallback.

Implements the reference's store::IFileSystemService surface
(store/IFileSystemService.hpp:16-76 — Open/Close/ReadBlock/WriteBlock/
GetFileSize/Truncate/Sync over one data file), for which the reference has
no concrete implementation (SURVEY §2.1). The native implementation lives in
native/blockstore.cpp and is built on demand with g++; if the toolchain is
unavailable the :class:`PyBlockFile` fallback provides identical semantics
(including the header format) in pure Python, so the two are
interchangeable on disk.
"""

from __future__ import annotations

import ctypes
import os
import struct
import subprocess
import zlib
from pathlib import Path

import numpy as np

_NATIVE_DIR = Path(__file__).parent / "native"
_SO_PATH = _NATIVE_DIR / "libblockstore.so"

_HEADER_SIZE = 4096
_MAGIC = 0x4C4D444B414E4E31
_FORMAT_VERSION = 3
_HEADER_FMT = "<QIIQII"  # magic, version, block_size, num_blocks, clean, rsvd


def build_native(force: bool = False) -> Path | None:
    """Compile the native block store (g++ -O2 -shared). Returns the .so
    path, or None if compilation fails (callers fall back to Python)."""
    src = _NATIVE_DIR / "blockstore.cpp"
    if _SO_PATH.exists() and not force:
        if _SO_PATH.stat().st_mtime >= src.stat().st_mtime:
            return _SO_PATH
    try:
        subprocess.run(
            ["g++", "-O2", "-fPIC", "-shared", "-std=c++17",
             str(src), "-o", str(_SO_PATH)],
            check=True, capture_output=True, timeout=120,
        )
        return _SO_PATH
    except (OSError, subprocess.SubprocessError):
        return None


_lib = None


def _load_lib():
    global _lib
    if _lib is not None:
        return _lib
    so = build_native()
    if so is None:
        _lib = False
        return _lib
    lib = ctypes.CDLL(str(so))
    lib.bs_open.restype = ctypes.c_void_p
    lib.bs_open.argtypes = [ctypes.c_char_p, ctypes.c_uint32, ctypes.c_int]
    lib.bs_close.argtypes = [ctypes.c_void_p]
    lib.bs_num_blocks.restype = ctypes.c_uint64
    lib.bs_num_blocks.argtypes = [ctypes.c_void_p]
    lib.bs_block_size.restype = ctypes.c_uint32
    lib.bs_block_size.argtypes = [ctypes.c_void_p]
    lib.bs_format_version.restype = ctypes.c_uint32
    lib.bs_format_version.argtypes = [ctypes.c_void_p]
    lib.bs_truncate.argtypes = [ctypes.c_void_p, ctypes.c_uint64]
    lib.bs_write_blocks.argtypes = [
        ctypes.c_void_p, ctypes.c_uint64, ctypes.c_uint64, ctypes.c_char_p]
    lib.bs_write_blocks_at.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint64), ctypes.c_uint64,
        ctypes.c_char_p]
    lib.bs_read_blocks.argtypes = [
        ctypes.c_void_p, ctypes.c_uint64, ctypes.c_uint64, ctypes.c_char_p]
    lib.bs_read_blocks_at.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint64), ctypes.c_uint64,
        ctypes.c_char_p]
    lib.bs_sync.argtypes = [ctypes.c_void_p]
    lib.bs_file_size.restype = ctypes.c_int64
    lib.bs_file_size.argtypes = [ctypes.c_void_p]
    lib.bs_crc32_rows.argtypes = [
        ctypes.c_char_p, ctypes.c_uint64, ctypes.c_uint64,
        ctypes.POINTER(ctypes.c_uint32)]
    lib.bs_mark_dirty.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.bs_clean_shutdown.restype = ctypes.c_int
    lib.bs_clean_shutdown.argtypes = [ctypes.c_void_p]
    _lib = lib
    return _lib


class NativeBlockFile:
    """ctypes wrapper over the C++ store."""

    def __init__(self, path: str | os.PathLike, block_size: int, create=True):
        lib = _load_lib()
        if lib is False:
            raise RuntimeError("native blockstore unavailable")
        self._lib = lib
        self._h = lib.bs_open(str(path).encode(), block_size, 1 if create else 0)
        if not self._h:
            raise IOError(f"bs_open failed for {path}")
        self.block_size = block_size

    @property
    def num_blocks(self) -> int:
        return self._lib.bs_num_blocks(self._h)

    def write_blocks(self, first_idx: int, blocks: np.ndarray) -> None:
        blocks = np.ascontiguousarray(blocks, np.uint8)
        rc = self._lib.bs_write_blocks(
            self._h, first_idx, blocks.shape[0],
            blocks.ctypes.data_as(ctypes.c_char_p))
        if rc != 0:
            raise IOError(f"bs_write_blocks rc={rc}")

    def write_blocks_at(self, indices: np.ndarray, blocks: np.ndarray) -> None:
        blocks = np.ascontiguousarray(blocks, np.uint8)
        idx = np.ascontiguousarray(indices, np.uint64)
        rc = self._lib.bs_write_blocks_at(
            self._h, idx.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
            len(idx), blocks.ctypes.data_as(ctypes.c_char_p))
        if rc != 0:
            raise IOError(f"bs_write_blocks_at rc={rc}")

    def read_blocks(self, first_idx: int, n: int) -> np.ndarray:
        out = np.empty((n, self.block_size), np.uint8)
        rc = self._lib.bs_read_blocks(
            self._h, first_idx, n, out.ctypes.data_as(ctypes.c_char_p))
        if rc != 0:
            raise IOError(f"bs_read_blocks rc={rc}")
        return out

    def read_blocks_at(self, indices: np.ndarray) -> np.ndarray:
        idx = np.ascontiguousarray(indices, np.uint64)
        out = np.empty((len(idx), self.block_size), np.uint8)
        rc = self._lib.bs_read_blocks_at(
            self._h, idx.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
            len(idx), out.ctypes.data_as(ctypes.c_char_p))
        if rc != 0:
            raise IOError(f"bs_read_blocks_at rc={rc}")
        return out

    def crc32_rows(self, blocks: np.ndarray) -> np.ndarray:
        blocks = np.ascontiguousarray(blocks, np.uint8)
        out = np.empty(blocks.shape[0], np.uint32)
        self._lib.bs_crc32_rows(
            blocks.ctypes.data_as(ctypes.c_char_p), blocks.shape[0],
            blocks.shape[1], out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)))
        return out

    def truncate(self, num_blocks: int) -> None:
        rc = self._lib.bs_truncate(self._h, num_blocks)
        if rc != 0:
            raise IOError(f"bs_truncate rc={rc}")

    def sync(self) -> None:
        rc = self._lib.bs_sync(self._h)
        if rc != 0:
            raise IOError(f"bs_sync rc={rc}")

    def file_size(self) -> int:
        return self._lib.bs_file_size(self._h)

    def mark_dirty(self, dirty: bool) -> None:
        self._lib.bs_mark_dirty(self._h, 1 if dirty else 0)

    @property
    def clean_shutdown(self) -> bool:
        return bool(self._lib.bs_clean_shutdown(self._h))

    def close(self) -> None:
        if self._h:
            self._lib.bs_close(self._h)
            self._h = None


class PyBlockFile:
    """Pure-Python block file, byte-identical on-disk format."""

    def __init__(self, path: str | os.PathLike, block_size: int, create=True):
        self.path = str(path)
        self.block_size = block_size
        mode = "r+b" if os.path.exists(self.path) else ("w+b" if create else None)
        if mode is None:
            raise IOError(f"{path} does not exist")
        self._f = open(self.path, mode)
        self._f.seek(0, 2)
        if self._f.tell() >= _HEADER_SIZE:
            self._read_header()
            if self.magic != _MAGIC or self._block_size_hdr != block_size:
                raise IOError("bad header")
        else:
            self.num_blocks = 0
            self.clean = 1
            self._write_header()

    def _read_header(self):
        self._f.seek(0)
        raw = self._f.read(struct.calcsize(_HEADER_FMT))
        (self.magic, self.version, self._block_size_hdr,
         self.num_blocks, self.clean, _) = struct.unpack(_HEADER_FMT, raw)

    def _write_header(self):
        self.magic = _MAGIC
        self.version = _FORMAT_VERSION
        self._block_size_hdr = self.block_size
        page = bytearray(_HEADER_SIZE)
        page[: struct.calcsize(_HEADER_FMT)] = struct.pack(
            _HEADER_FMT, _MAGIC, _FORMAT_VERSION, self.block_size,
            self.num_blocks, self.clean, 0)
        self._f.seek(0)
        self._f.write(page)

    def _off(self, idx):
        return _HEADER_SIZE + idx * self.block_size

    def write_blocks(self, first_idx: int, blocks: np.ndarray) -> None:
        blocks = np.ascontiguousarray(blocks, np.uint8)
        self._f.seek(self._off(first_idx))
        self._f.write(blocks.tobytes())
        self.num_blocks = max(self.num_blocks, first_idx + blocks.shape[0])
        self._write_header()

    def write_blocks_at(self, indices, blocks: np.ndarray) -> None:
        blocks = np.ascontiguousarray(blocks, np.uint8)
        for i, idx in enumerate(indices):
            self._f.seek(self._off(int(idx)))
            self._f.write(blocks[i].tobytes())
            self.num_blocks = max(self.num_blocks, int(idx) + 1)
        self._write_header()

    def read_blocks(self, first_idx: int, n: int) -> np.ndarray:
        self._f.seek(self._off(first_idx))
        raw = self._f.read(n * self.block_size)
        return np.frombuffer(raw, np.uint8).reshape(n, self.block_size).copy()

    def read_blocks_at(self, indices) -> np.ndarray:
        out = np.empty((len(indices), self.block_size), np.uint8)
        for i, idx in enumerate(indices):
            self._f.seek(self._off(int(idx)))
            out[i] = np.frombuffer(self._f.read(self.block_size), np.uint8)
        return out

    def crc32_rows(self, blocks: np.ndarray) -> np.ndarray:
        blocks = np.ascontiguousarray(blocks, np.uint8)
        return np.asarray(
            [zlib.crc32(blocks[i].tobytes()) for i in range(blocks.shape[0])],
            np.uint32)

    def truncate(self, num_blocks: int) -> None:
        self._f.truncate(self._off(num_blocks))
        self.num_blocks = num_blocks
        self._write_header()

    def sync(self) -> None:
        self._f.flush()
        os.fsync(self._f.fileno())

    def file_size(self) -> int:
        self._f.seek(0, 2)
        return self._f.tell()

    def mark_dirty(self, dirty: bool) -> None:
        self.clean = 0 if dirty else 1
        self._write_header()

    @property
    def clean_shutdown(self) -> bool:
        return bool(self.clean)

    def close(self) -> None:
        # Leaves the clean flag untouched (see blockstore.cpp bs_close):
        # only mark_dirty(False) after a committed checkpoint marks clean.
        if self._f:
            self._f.flush()
            self._f.close()
            self._f = None


def open_block_file(path, block_size: int, create=True, prefer_native=True):
    """Open graph.lmd with the native store, falling back to Python."""
    if prefer_native:
        try:
            return NativeBlockFile(path, block_size, create=create)
        except (RuntimeError, IOError, OSError):
            pass
    return PyBlockFile(path, block_size, create=create)
