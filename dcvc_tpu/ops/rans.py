"""ctypes binding for the native rANS entropy-coding core.

Builds ``librans_tpu.so`` from ``csrc/rans.cpp`` on first import (cached next
to the source), and falls back to a pure-Python reference implementation when
no C++ toolchain is available.

API parity target: the reference coder's Python surface
(DCVC-DC/src/cpp/py_rans/py_rans.cpp:227-243) — ``RansEncoder(ec_thread,
stream_part)`` / ``RansDecoder(stream_part)`` over int16 numpy symbol planes —
re-designed around contiguous arrays and a C ABI instead of pybind11.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from pathlib import Path

import numpy as np

_CSRC = Path(__file__).parent / "csrc"
_LIB_PATH = _CSRC / "librans_tpu.so"
_BUILD_LOCK = threading.Lock()
_LIB = None


def _build_library() -> bool:
    src = _CSRC / "rans.cpp"
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
        "-Wall", "-Wextra", str(src), "-o", str(_LIB_PATH),
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
        return True
    except (OSError, subprocess.CalledProcessError):
        return False


def _load_library():
    global _LIB
    if _LIB is not None:
        return _LIB
    with _BUILD_LOCK:
        if _LIB is not None:
            return _LIB
        if not _LIB_PATH.exists() or (
            _LIB_PATH.stat().st_mtime < (_CSRC / "rans.cpp").stat().st_mtime
        ):
            if not _build_library():
                return None
        try:
            lib = ctypes.CDLL(str(_LIB_PATH))
        except OSError:
            return None

        c_i16p = ctypes.POINTER(ctypes.c_int16)
        c_i32p = ctypes.POINTER(ctypes.c_int32)
        c_u8p = ctypes.POINTER(ctypes.c_uint8)
        c_f32p = ctypes.POINTER(ctypes.c_float)

        lib.rans_encoder_new.restype = ctypes.c_void_p
        lib.rans_encoder_new.argtypes = [ctypes.c_int]
        lib.rans_encoder_delete.argtypes = [ctypes.c_void_p]
        lib.rans_encoder_reset.argtypes = [ctypes.c_void_p]
        lib.rans_encoder_encode.argtypes = [
            ctypes.c_void_p, c_i16p, c_i16p, ctypes.c_int64,
            c_i32p, ctypes.c_int64, ctypes.c_int64, c_i32p, c_i32p,
        ]
        lib.rans_encoder_flush.restype = ctypes.c_int64
        lib.rans_encoder_flush.argtypes = [ctypes.c_void_p]
        lib.rans_encoder_get_stream.argtypes = [ctypes.c_void_p, c_u8p]

        lib.rans_decoder_new.restype = ctypes.c_void_p
        lib.rans_decoder_new.argtypes = [ctypes.c_int]
        lib.rans_decoder_delete.argtypes = [ctypes.c_void_p]
        lib.rans_decoder_set_stream.argtypes = [ctypes.c_void_p, c_u8p, ctypes.c_int64]
        lib.rans_decoder_decode.argtypes = [
            ctypes.c_void_p, c_i16p, ctypes.c_int64,
            c_i32p, ctypes.c_int64, ctypes.c_int64, c_i32p, c_i32p, c_i16p,
        ]

        lib.pmf_to_quantized_cdf.restype = ctypes.c_int
        lib.pmf_to_quantized_cdf.argtypes = [
            c_f32p, ctypes.c_int64, ctypes.c_int, c_i32p,
        ]
        _LIB = lib
        return _LIB


def native_available() -> bool:
    return _load_library() is not None and not bool(
        int(os.environ.get("DCVC_TPU_FORCE_PY_RANS", "0"))
    )


def _as_i16(a) -> np.ndarray:
    return np.ascontiguousarray(np.asarray(a).reshape(-1), dtype=np.int16)


def _as_i32(a) -> np.ndarray:
    return np.ascontiguousarray(np.asarray(a), dtype=np.int32)


class RansEncoder:
    """N-way partitioned rANS encoder.

    ``ec_thread`` keeps API parity with the reference; in this framework
    threading happens inside the native flush (one thread per stream part)
    and, for encode/compute overlap, at the Python level where ctypes calls
    release the GIL (see entropy.coder.AsyncEntropyCoder).
    """

    def __init__(self, ec_thread: bool = False, stream_part: int = 1):
        del ec_thread
        self._stream_part = int(stream_part)
        self._lib = _load_library() if native_available() else None
        if self._lib is not None:
            self._h = self._lib.rans_encoder_new(self._stream_part)
        else:
            self._py = _PyEncoder(self._stream_part)

    def __del__(self):
        if getattr(self, "_lib", None) is not None and getattr(self, "_h", None):
            self._lib.rans_encoder_delete(self._h)
            self._h = None

    def reset(self):
        if self._lib is not None:
            self._lib.rans_encoder_reset(self._h)
        else:
            self._py.reset()

    def encode_with_indexes(self, symbols, indexes, cdfs, cdf_sizes, offsets):
        symbols = _as_i16(symbols)
        indexes = _as_i16(indexes)
        cdfs = _as_i32(cdfs)
        cdf_sizes = _as_i32(cdf_sizes).reshape(-1)
        offsets = _as_i32(offsets).reshape(-1)
        if self._lib is None:
            self._py.encode(symbols, indexes, cdfs, cdf_sizes, offsets)
            return
        self._lib.rans_encoder_encode(
            self._h,
            symbols.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
            indexes.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
            symbols.size,
            cdfs.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            cdfs.shape[0], cdfs.shape[1],
            cdf_sizes.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        )

    def flush(self):
        if self._lib is None:
            self._py.flush()
        else:
            self._nbytes = self._lib.rans_encoder_flush(self._h)

    def get_encoded_stream(self) -> np.ndarray:
        if self._lib is None:
            return self._py.get_stream()
        out = np.empty(self._nbytes, dtype=np.uint8)
        self._lib.rans_encoder_get_stream(
            self._h, out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
        return out


class RansDecoder:
    def __init__(self, stream_part: int = 1):
        self._stream_part = int(stream_part)
        self._lib = _load_library() if native_available() else None
        if self._lib is not None:
            self._h = self._lib.rans_decoder_new(self._stream_part)
        else:
            self._py = _PyDecoder(self._stream_part)

    def __del__(self):
        if getattr(self, "_lib", None) is not None and getattr(self, "_h", None):
            self._lib.rans_decoder_delete(self._h)
            self._h = None

    def set_stream(self, stream):
        stream = np.ascontiguousarray(np.frombuffer(bytes(stream), dtype=np.uint8))
        if self._lib is None:
            self._py.set_stream(stream)
            return
        self._stream_keepalive = stream
        self._lib.rans_decoder_set_stream(
            self._h, stream.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            stream.size)

    def decode_stream(self, indexes, cdfs, cdf_sizes, offsets) -> np.ndarray:
        indexes = _as_i16(indexes)
        cdfs = _as_i32(cdfs)
        cdf_sizes = _as_i32(cdf_sizes).reshape(-1)
        offsets = _as_i32(offsets).reshape(-1)
        if self._lib is None:
            return self._py.decode(indexes, cdfs, cdf_sizes, offsets)
        out = np.empty(indexes.size, dtype=np.int16)
        self._lib.rans_decoder_decode(
            self._h,
            indexes.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
            indexes.size,
            cdfs.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            cdfs.shape[0], cdfs.shape[1],
            cdf_sizes.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
        )
        return out


def pmf_to_quantized_cdf(pmf, precision: int = 16) -> np.ndarray:
    """Quantize a pmf into a strictly-increasing integer CDF (sum = 2^precision)."""
    pmf = np.ascontiguousarray(np.asarray(pmf, dtype=np.float32).reshape(-1))
    lib = _load_library() if native_available() else None
    if lib is not None:
        out = np.empty(pmf.size + 1, dtype=np.int32)
        rc = lib.pmf_to_quantized_cdf(
            pmf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            pmf.size, precision,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
        if rc != 0:
            raise ValueError("pmf_to_quantized_cdf: degenerate pmf")
        return out
    return _py_pmf_to_quantized_cdf(pmf, precision)


# ---------------------------------------------------------------------------
# Pure-Python reference implementation (CI fallback + cross-check oracle).
# ---------------------------------------------------------------------------

_PRECISION = 16
_RANS_L = 1 << 31
_BYPASS_BITS = 4
_MAX_BYPASS = (1 << _BYPASS_BITS) - 1
_MASK64 = (1 << 64) - 1


def _py_pmf_to_quantized_cdf(pmf: np.ndarray, precision: int) -> np.ndarray:
    n = pmf.size
    cdf = np.zeros(n + 1, dtype=np.uint64)
    cdf[1:] = np.round(pmf.astype(np.float64) * (1 << precision)).astype(np.uint64)
    total = int(cdf.sum())
    if total == 0:
        raise ValueError("degenerate pmf")
    cdf = ((1 << precision) * cdf) // total
    cdf = np.cumsum(cdf, dtype=np.uint64)
    cdf[-1] = 1 << precision
    cdf = cdf.astype(np.int64)
    for i in range(n):
        if cdf[i] == cdf[i + 1]:
            freqs = cdf[1:] - cdf[:-1]
            candidates = np.where(freqs > 1)[0]
            if candidates.size == 0:
                raise ValueError("cannot repair cdf")
            best = candidates[np.argmin(freqs[candidates])]
            if best < i:
                cdf[best + 1:i + 1] -= 1
            else:
                cdf[i + 1:best + 1] += 1
    return cdf.astype(np.int32)


class _PyStreamEncoder:
    def __init__(self):
        self.syms = []

    def reset(self):
        self.syms = []

    def encode(self, symbols, indexes, cdfs, cdf_sizes, offsets):
        for sym, idx in zip(symbols.tolist(), indexes.tolist()):
            if idx < 0:
                continue
            cdf = cdfs[idx]
            max_value = int(cdf_sizes[idx]) - 2
            value = sym - int(offsets[idx])
            raw_val = 0
            if value < 0:
                raw_val = -2 * value - 1
                value = max_value
            elif value >= max_value:
                raw_val = 2 * (value - max_value)
                value = max_value
            self.syms.append((int(cdf[value]), int(cdf[value + 1] - cdf[value]), False))
            if value == max_value:
                n_bypass = 0
                while (raw_val >> (n_bypass * _BYPASS_BITS)) != 0:
                    n_bypass += 1
                val = n_bypass
                while val >= _MAX_BYPASS:
                    self.syms.append((_MAX_BYPASS, _MAX_BYPASS + 1, True))
                    val -= _MAX_BYPASS
                self.syms.append((val, val + 1, True))
                for j in range(n_bypass):
                    chunk = (raw_val >> (j * _BYPASS_BITS)) & _MAX_BYPASS
                    self.syms.append((chunk, chunk + 1, True))

    def flush(self) -> bytes:
        x = _RANS_L
        words = []
        for start, rng, bypass in reversed(self.syms):
            if not bypass:
                x_max = ((_RANS_L >> _PRECISION) << 32) * rng
                if x >= x_max:
                    words.append(x & 0xFFFFFFFF)
                    x >>= 32
                x = ((x // rng) << _PRECISION) + (x % rng) + start
            else:
                freq = 1 << (_PRECISION - _BYPASS_BITS)
                x_max = ((_RANS_L >> _PRECISION) << 32) * freq
                if x >= x_max:
                    words.append(x & 0xFFFFFFFF)
                    x >>= 32
                x = ((x << _BYPASS_BITS) | start) & _MASK64
        words.append(x >> 32)
        words.append(x & 0xFFFFFFFF)
        self.syms = []
        return np.array(words[::-1], dtype=np.uint32).tobytes()


class _PyEncoder:
    def __init__(self, stream_part: int):
        self.parts = [_PyStreamEncoder() for _ in range(stream_part)]
        self._streams = None

    def reset(self):
        for p in self.parts:
            p.reset()
        self._streams = None

    def encode(self, symbols, indexes, cdfs, cdf_sizes, offsets):
        n = symbols.size
        np_parts = len(self.parts)
        each = n // np_parts
        for i, p in enumerate(self.parts):
            lo = i * each
            hi = n if i == np_parts - 1 else lo + each
            p.encode(symbols[lo:hi], indexes[lo:hi], cdfs, cdf_sizes, offsets)

    def flush(self):
        self._streams = [p.flush() for p in self.parts]

    def get_stream(self) -> np.ndarray:
        streams = self._streams
        max_size = max([len(s) for s in streams[:-1]], default=0)
        per_header = 4 if max_size > 65535 else 2
        out = bytearray()
        out.append(((len(streams) - 1) << 4) + (1 if per_header == 2 else 0))
        for s in streams[:-1]:
            out += len(s).to_bytes(per_header, "little")
        for s in streams:
            out += s
        return np.frombuffer(bytes(out), dtype=np.uint8)


class _PyStreamDecoder:
    def set_stream(self, data: np.ndarray):
        self.words = np.frombuffer(data.tobytes(), dtype=np.uint32)
        self.pos = 2
        self.x = int(self.words[0]) | (int(self.words[1]) << 32)

    def _renorm(self):
        if self.x < _RANS_L:
            self.x = (self.x << 32) | int(self.words[self.pos])
            self.pos += 1

    def _get_bits(self, nbits):
        val = self.x & ((1 << nbits) - 1)
        self.x >>= nbits
        self._renorm()
        return val

    def decode(self, indexes, cdfs, cdf_sizes, offsets) -> np.ndarray:
        out = np.empty(indexes.size, dtype=np.int16)
        for i, idx in enumerate(indexes.tolist()):
            if idx < 0:
                out[i] = 0
                continue
            cdf = cdfs[idx]
            size = int(cdf_sizes[idx])
            max_value = size - 2
            cum = self.x & ((1 << _PRECISION) - 1)
            s = int(np.searchsorted(cdf[:size], cum, side="right")) - 1
            start, freq = int(cdf[s]), int(cdf[s + 1] - cdf[s])
            self.x = freq * (self.x >> _PRECISION) + cum - start
            self._renorm()
            value = s
            if value == max_value:
                val = self._get_bits(_BYPASS_BITS)
                n_bypass = val
                while val == _MAX_BYPASS:
                    val = self._get_bits(_BYPASS_BITS)
                    n_bypass += val
                raw_val = 0
                for j in range(n_bypass):
                    raw_val |= self._get_bits(_BYPASS_BITS) << (j * _BYPASS_BITS)
                value = raw_val >> 1
                if raw_val & 1:
                    value = -value - 1
                else:
                    value += max_value
            out[i] = value + int(offsets[idx])
        return out


class _PyDecoder:
    def __init__(self, stream_part: int):
        self.parts = [_PyStreamDecoder() for _ in range(stream_part)]

    def set_stream(self, data: np.ndarray):
        flag = int(data[0])
        num = (flag >> 4) + 1
        per_header = 2 if (flag & 0x0F) == 1 else 4
        sizes = []
        off = 1
        for _ in range(num - 1):
            sizes.append(int.from_bytes(data[off:off + per_header].tobytes(), "little"))
            off += per_header
        sizes.append(data.size - off - sum(sizes))
        if num != len(self.parts):
            # the container self-describes its part count — adapt (mirrors
            # the native decoder)
            self.parts = [_PyStreamDecoder() for _ in range(num)]
        for p, sz in zip(self.parts, sizes):
            p.set_stream(data[off:off + sz])
            off += sz

    def decode(self, indexes, cdfs, cdf_sizes, offsets) -> np.ndarray:
        n = indexes.size
        np_parts = len(self.parts)
        each = n // np_parts
        outs = []
        for i, p in enumerate(self.parts):
            lo = i * each
            hi = n if i == np_parts - 1 else lo + each
            outs.append(p.decode(indexes[lo:hi], cdfs, cdf_sizes, offsets))
        return np.concatenate(outs)
