"""Round-trip and invariant tests for the native rANS core (L0).

Mirrors the verification the reference never automated (SURVEY.md §4):
symbols -> stream -> symbols bit-exactness, escape/bypass ranges,
stream_part > 1 container parity, CDF quantizer invariants.
"""

import numpy as np
import pytest

from dcvc_tpu.ops import rans as rans_mod
from dcvc_tpu.ops import RansDecoder, RansEncoder, pmf_to_quantized_cdf


def make_gaussian_cdfs(num_cdfs=8, support=33, precision=16, seed=0):
    rng = np.random.default_rng(seed)
    cdfs = np.zeros((num_cdfs, support + 2), dtype=np.int32)
    sizes = np.zeros(num_cdfs, dtype=np.int32)
    offsets = np.zeros(num_cdfs, dtype=np.int32)
    for i in range(num_cdfs):
        n = int(rng.integers(5, support))
        xs = np.arange(n) - n // 2
        scale = float(rng.uniform(0.5, 8.0))
        pmf = np.exp(-np.abs(xs) / scale)
        pmf = pmf / pmf.sum() * 0.99
        tail = 1.0 - pmf.sum()
        full = np.concatenate([pmf, [tail]]).astype(np.float32)
        cdf = pmf_to_quantized_cdf(full, precision)
        cdfs[i, : cdf.size] = cdf
        sizes[i] = cdf.size
        offsets[i] = -(n // 2)
    return cdfs, sizes, offsets


def roundtrip(symbols, indexes, cdfs, sizes, offsets, stream_part=1):
    enc = RansEncoder(False, stream_part)
    enc.reset()
    enc.encode_with_indexes(symbols, indexes, cdfs, sizes, offsets)
    enc.flush()
    stream = enc.get_encoded_stream().tobytes()
    dec = RansDecoder(stream_part)
    dec.set_stream(stream)
    out = dec.decode_stream(indexes, cdfs, sizes, offsets)
    return stream, out


def test_cdf_quantizer_invariants():
    rng = np.random.default_rng(1)
    for _ in range(20):
        n = int(rng.integers(3, 80))
        pmf = rng.random(n).astype(np.float32)
        pmf /= pmf.sum()
        cdf = pmf_to_quantized_cdf(pmf, 16)
        assert cdf[0] == 0
        assert cdf[-1] == 1 << 16
        assert np.all(np.diff(cdf) >= 1), "every symbol needs freq >= 1"


def test_cdf_quantizer_matches_python_fallback():
    rng = np.random.default_rng(2)
    for _ in range(10):
        n = int(rng.integers(3, 60))
        pmf = (rng.random(n) ** 4).astype(np.float32)
        pmf /= pmf.sum()
        c_native = pmf_to_quantized_cdf(pmf, 16)
        c_py = rans_mod._py_pmf_to_quantized_cdf(pmf, 16)
        np.testing.assert_array_equal(c_native, c_py)


@pytest.mark.parametrize("stream_part", [1, 2, 4])
def test_roundtrip_in_support(stream_part):
    cdfs, sizes, offsets = make_gaussian_cdfs()
    rng = np.random.default_rng(3)
    n = 4096
    indexes = rng.integers(0, cdfs.shape[0], n).astype(np.int16)
    # symbols within each cdf's support
    max_vals = sizes[indexes] - 2
    symbols = (rng.integers(0, 1 << 16, n) % max_vals + offsets[indexes]).astype(np.int16)
    stream, out = roundtrip(symbols, indexes, cdfs, sizes, offsets, stream_part)
    np.testing.assert_array_equal(symbols, out)


def test_roundtrip_escape_values():
    """Out-of-support symbols go through bypass coding and must survive."""
    cdfs, sizes, offsets = make_gaussian_cdfs()
    rng = np.random.default_rng(4)
    n = 1024
    indexes = rng.integers(0, cdfs.shape[0], n).astype(np.int16)
    symbols = rng.integers(-30000, 30000, n).astype(np.int16)
    stream, out = roundtrip(symbols, indexes, cdfs, sizes, offsets)
    np.testing.assert_array_equal(symbols, out)


def test_negative_index_skipped():
    cdfs, sizes, offsets = make_gaussian_cdfs()
    indexes = np.array([0, -1, 1, -1, 2], dtype=np.int16)
    symbols = np.array([1, 99, -2, 99, 0], dtype=np.int16)
    enc = RansEncoder(False, 1)
    enc.reset()
    enc.encode_with_indexes(symbols, indexes, cdfs, sizes, offsets)
    enc.flush()
    dec = RansDecoder(1)
    dec.set_stream(enc.get_encoded_stream().tobytes())
    out = dec.decode_stream(indexes, cdfs, sizes, offsets)
    assert out[0] == 1 and out[2] == -2 and out[4] == 0


@pytest.mark.skipif(not rans_mod.native_available(), reason="no native lib")
def test_native_matches_python_stream():
    """C++ and pure-Python encoders must emit byte-identical streams."""
    cdfs, sizes, offsets = make_gaussian_cdfs()
    rng = np.random.default_rng(5)
    n = 512
    indexes = rng.integers(0, cdfs.shape[0], n).astype(np.int16)
    symbols = rng.integers(-100, 100, n).astype(np.int16)

    enc_c = RansEncoder(False, 2)
    enc_c.encode_with_indexes(symbols, indexes, cdfs, sizes, offsets)
    enc_c.flush()
    stream_c = enc_c.get_encoded_stream().tobytes()

    enc_py = rans_mod._PyEncoder(2)
    enc_py.encode(symbols, indexes.astype(np.int16),
                  cdfs.astype(np.int32), sizes, offsets)
    enc_py.flush()
    stream_py = enc_py.get_stream().tobytes()
    assert stream_c == stream_py

    # cross-decode: python decoder reads native stream
    dec_py = rans_mod._PyDecoder(2)
    dec_py.set_stream(np.frombuffer(stream_c, dtype=np.uint8))
    out = dec_py.decode(indexes, cdfs.astype(np.int32), sizes, offsets)
    np.testing.assert_array_equal(symbols, out)


def test_multiple_encode_calls_one_stream():
    """Several encode calls then one flush — the frame-level usage pattern."""
    cdfs, sizes, offsets = make_gaussian_cdfs()
    rng = np.random.default_rng(6)
    chunks = [rng.integers(-20, 20, 256).astype(np.int16) for _ in range(4)]
    idx_chunks = [rng.integers(0, cdfs.shape[0], 256).astype(np.int16) for _ in range(4)]
    enc = RansEncoder(False, 2)
    enc.reset()
    for s, i in zip(chunks, idx_chunks):
        enc.encode_with_indexes(s, i, cdfs, sizes, offsets)
    enc.flush()
    dec = RansDecoder(2)
    dec.set_stream(enc.get_encoded_stream().tobytes())
    for s, i in zip(chunks, idx_chunks):
        out = dec.decode_stream(i, cdfs, sizes, offsets)
        np.testing.assert_array_equal(s, out)


def test_multi_table_single_flush_matches_python():
    """Two encode calls with DIFFERENT CDF tables feeding one flush: the
    native encoder memoizes per-row EncSym tables in a per-flush arena
    (rans.cpp:StreamEncoder); the arena must key rows per call, not
    globally, or the second table's symbols would reuse stale entries."""
    cdfs_a, sizes_a, offs_a = make_gaussian_cdfs(seed=7)
    cdfs_b, sizes_b, offs_b = make_gaussian_cdfs(num_cdfs=5, support=21, seed=8)
    rng = np.random.default_rng(9)
    idx_a = rng.integers(0, cdfs_a.shape[0], 300).astype(np.int16)
    sym_a = rng.integers(-15, 15, 300).astype(np.int16)
    idx_b = rng.integers(0, cdfs_b.shape[0], 300).astype(np.int16)
    sym_b = rng.integers(-8, 8, 300).astype(np.int16)

    enc = RansEncoder(False, 1)
    enc.reset()
    enc.encode_with_indexes(sym_a, idx_a, cdfs_a, sizes_a, offs_a)
    enc.encode_with_indexes(sym_b, idx_b, cdfs_b, sizes_b, offs_b)
    enc.flush()
    stream_c = enc.get_encoded_stream().tobytes()

    if rans_mod.native_available():
        enc_py = rans_mod._PyEncoder(1)
        enc_py.encode(sym_a, idx_a, cdfs_a.astype(np.int32), sizes_a, offs_a)
        enc_py.encode(sym_b, idx_b, cdfs_b.astype(np.int32), sizes_b, offs_b)
        enc_py.flush()
        assert stream_c == enc_py.get_stream().tobytes()

    dec = RansDecoder(1)
    dec.set_stream(stream_c)
    np.testing.assert_array_equal(sym_a, dec.decode_stream(idx_a, cdfs_a, sizes_a, offs_a))
    np.testing.assert_array_equal(sym_b, dec.decode_stream(idx_b, cdfs_b, sizes_b, offs_b))


@pytest.mark.parametrize("stream_part", [2, 3])
def test_large_roundtrip_with_escapes(stream_part):
    """Large-n decode exercises the LUT-seeded CDF search and (on 1-core
    hosts) the interleaved multi-part decode; escapes exercise bypass
    inside the interleave; a non-divisible n exercises the tail part."""
    cdfs, sizes, offsets = make_gaussian_cdfs(num_cdfs=16, support=40, seed=10)
    rng = np.random.default_rng(11)
    n = 50_001
    indexes = rng.integers(0, cdfs.shape[0], n).astype(np.int16)
    symbols = rng.integers(-18, 18, n).astype(np.int16)
    symbols[::53] = 321       # escape/bypass path
    indexes[::97] = -1        # skip path
    stream, out = roundtrip(symbols, indexes, cdfs, sizes, offsets, stream_part)
    expected = symbols.copy()
    expected[indexes < 0] = 0
    np.testing.assert_array_equal(expected, out)


def test_decoder_adapts_to_stream_part_count():
    """The container flag byte declares the part count; a decoder built
    with a different stream_part must adapt (the reference would index
    out of bounds here — ours resizes)."""
    cdfs, sizes, offsets = make_gaussian_cdfs(seed=20)
    rng = np.random.default_rng(21)
    n = 3000
    indexes = rng.integers(0, cdfs.shape[0], n).astype(np.int16)
    symbols = rng.integers(-12, 12, n).astype(np.int16)
    enc = RansEncoder(False, 3)
    enc.reset()
    enc.encode_with_indexes(symbols, indexes, cdfs, sizes, offsets)
    enc.flush()
    stream = enc.get_encoded_stream().tobytes()
    for built_as in (1, 2, 4):
        dec = RansDecoder(built_as)
        dec.set_stream(stream)
        np.testing.assert_array_equal(
            symbols, dec.decode_stream(indexes, cdfs, sizes, offsets))


def test_tiny_decode_calls_after_large():
    """Per-wavefront-sized decode calls (n << cdf rows) take the zero-LUT
    fallback path and must keep decoding the same stream correctly."""
    cdfs, sizes, offsets = make_gaussian_cdfs(num_cdfs=32, seed=12)
    rng = np.random.default_rng(13)
    big_i = rng.integers(0, 32, 8192).astype(np.int16)
    big_s = rng.integers(-10, 10, 8192).astype(np.int16)
    tiny = [(rng.integers(0, 32, k).astype(np.int16),
             rng.integers(-10, 10, k).astype(np.int16))
            for k in (1, 3, 17, 60)]
    enc = RansEncoder(False, 1)
    enc.reset()
    enc.encode_with_indexes(big_s, big_i, cdfs, sizes, offsets)
    for ti, ts in tiny:
        enc.encode_with_indexes(ts, ti, cdfs, sizes, offsets)
    enc.flush()
    dec = RansDecoder(1)
    dec.set_stream(enc.get_encoded_stream().tobytes())
    np.testing.assert_array_equal(big_s, dec.decode_stream(big_i, cdfs, sizes, offsets))
    for ti, ts in tiny:
        np.testing.assert_array_equal(ts, dec.decode_stream(ti, cdfs, sizes, offsets))


def test_golden_stream_conformance():
    """Byte-format conformance pin: a fixed deterministic workload must
    produce these exact stream bytes forever. Catches format drift that the
    C-vs-Python-oracle parity test cannot (both drifting together) —
    streams written by older builds must stay decodable."""
    import hashlib

    rng = np.random.default_rng(42)
    n_idx = 16
    cdfs = np.zeros((n_idx, 35), np.int32)
    sizes = np.zeros(n_idx, np.int32)
    offs = np.zeros(n_idx, np.int32)
    for i in range(n_idx):
        xs = np.arange(33) - 16
        pmf = np.exp(-np.abs(xs) / (0.5 + i))
        pmf /= pmf.sum()
        cdf = pmf_to_quantized_cdf(pmf.astype(np.float64))
        cdfs[i, :len(cdf)] = cdf
        sizes[i] = len(cdf)
        offs[i] = -16
    n = 4096
    idx = rng.integers(0, n_idx, n).astype(np.int16)
    sym = rng.integers(-20, 20, n).astype(np.int16)
    sym[::37] = 99  # escapes
    golden = {
        1: (4257, "4bc65a04c3391af111205b81789c32e691a065d5"
                  "3744d3320304e62c346e0ee7"),
        3: (4269, "8c5bc5c5f71d997adcecd14663d303dfcb92b516"
                  "0b2614435cd57d022d8b663f"),
    }
    for part, (length, sha) in golden.items():
        enc = RansEncoder(False, part)
        enc.reset()
        enc.encode_with_indexes(sym, idx, cdfs, sizes, offs)
        enc.flush()
        stream = enc.get_encoded_stream().tobytes()
        assert (len(stream), hashlib.sha256(stream).hexdigest()) == \
            (length, sha), f"bitstream format drifted at part={part}"
        dec = RansDecoder(part)
        dec.set_stream(stream)
        np.testing.assert_array_equal(
            sym, dec.decode_stream(idx, cdfs, sizes, offs))


class TestOldGenCompat:
    """CompressAI-style list-based binding surface (ops/rans_compat.py):
    the older repos' BufferedRansEncoder/RansDecoder API incl. TCM's
    set_cdf fast paths round-trips python lists exactly."""

    def _tables(self):
        from dcvc_tpu.ops.rans import pmf_to_quantized_cdf

        rng = np.random.default_rng(0)
        cdfs, lengths, offsets = [], [], []
        maxlen = 0
        raw = []
        for _ in range(4):
            n = int(rng.integers(4, 12))
            pmf = rng.random(n) + 0.05
            cdf = pmf_to_quantized_cdf(pmf / pmf.sum(), 16)
            raw.append(cdf)
            maxlen = max(maxlen, len(cdf))
            lengths.append(len(cdf))
            offsets.append(-(n // 2))
        for cdf in raw:
            cdfs.append(list(cdf) + [0] * (maxlen - len(cdf)))
        return cdfs, lengths, offsets

    def test_buffered_roundtrip_lists(self):
        from dcvc_tpu.ops.rans_compat import BufferedRansEncoder, RansDecoder

        cdfs, lengths, offsets = self._tables()
        rng = np.random.default_rng(1)
        idx = [int(i) for i in rng.integers(0, 4, 257)]
        sym = [int(rng.integers(0, lengths[i] - 2)) + offsets[i] for i in idx]

        enc = BufferedRansEncoder()
        enc.encode_with_indexes(sym, idx, cdfs, lengths, offsets)
        stream = enc.flush()
        assert isinstance(stream, bytes) and len(stream) > 0

        dec = RansDecoder()
        out = dec.decode_with_indexes(stream, idx, cdfs, lengths, offsets)
        assert out == sym

    def test_set_cdf_fast_paths(self):
        from dcvc_tpu.ops.rans_compat import BufferedRansEncoder, RansDecoder

        cdfs, lengths, offsets = self._tables()
        rng = np.random.default_rng(2)
        idx = [int(i) for i in rng.integers(0, 4, 129)]
        sym = [int(rng.integers(0, lengths[i] - 2)) + offsets[i] for i in idx]

        enc = BufferedRansEncoder()
        enc.set_cdf(cdfs, lengths, offsets)
        enc.encode_with_indexes(sym, idx)
        stream = enc.flush()

        dec = RansDecoder()
        dec.set_cdf(cdfs, lengths, offsets)
        dec.set_stream(stream)
        assert dec.decode_stream_only_indexes(idx) == sym

    def test_one_shot_encoder(self):
        from dcvc_tpu.ops.rans_compat import RansDecoder, RansEncoder

        cdfs, lengths, offsets = self._tables()
        idx = [0, 1, 2, 3] * 8
        sym = [offsets[i] for i in idx]
        stream = RansEncoder().encode_with_indexes(sym, idx, cdfs, lengths,
                                                   offsets)
        out = RansDecoder().decode_with_indexes(stream, idx, cdfs, lengths,
                                                offsets)
        assert out == sym
