"""Bitstream file containers + checkpoint loading helpers.

Parity target: DCVC-DC/src/utils/stream_helper.py:94-139 (I/P headers with
q_in_ckpt flag + 6-bit q_index), DCVC-HEM stream_helper (ushort rounded
q_scale), and get_state_dict's flexible checkpoint unwrapping (:40-47).
"""

from __future__ import annotations

import struct
from pathlib import Path

import numpy as np


def filesize(filepath: str) -> int:
    return Path(filepath).stat().st_size


def get_rounded_q(q_scale: float):
    """Quantize q_scale to 1/100 into a ushort (HEM stream_helper.py:41-45)."""
    q_scale = float(np.clip(q_scale, 0.01, 655.0))
    q_index = int(round(q_scale * 100))
    return q_index / 100, q_index


# -- DCVC-DC style: q_in_ckpt flag + 6-bit q_index -------------------------

def pack_i(height, width, q_in_ckpt, q_index, bit_stream) -> bytes:
    """In-memory I-frame container (byte-identical to the encode_i file)."""
    return (struct.pack(">2I", height, width)
            + struct.pack(">B", (int(q_in_ckpt) << 7) + (q_index << 1))
            + struct.pack(">I", len(bit_stream))
            + bytes(bit_stream))


def unpack_i(data: bytes):
    height, width = struct.unpack(">2I", data[:8])
    flag = data[8]
    q_in_ckpt = (flag >> 7) > 0
    q_index = (flag & 0x7F) >> 1
    length = struct.unpack(">I", data[9:13])[0]
    return height, width, q_in_ckpt, q_index, data[13:13 + length]


def pack_p(string, q_in_ckpt, q_index, frame_idx) -> bytes:
    """In-memory P-frame container (byte-identical to the encode_p file)."""
    return (struct.pack(">B", (int(q_in_ckpt) << 7) + (q_index << 1))
            + struct.pack(">B", frame_idx)
            + struct.pack(">I", len(string))
            + bytes(string))


def unpack_p(data: bytes):
    flag = data[0]
    q_in_ckpt = (flag >> 7) > 0
    q_index = (flag & 0x7F) >> 1
    frame_idx = data[1]
    length = struct.unpack(">I", data[2:6])[0]
    return q_in_ckpt, q_index, frame_idx, data[6:6 + length]


def encode_i(height, width, q_in_ckpt, q_index, bit_stream, output):
    Path(output).write_bytes(pack_i(height, width, q_in_ckpt, q_index,
                                    bit_stream))


def decode_i(inputpath):
    return unpack_i(Path(inputpath).read_bytes())


def encode_p(string, q_in_ckpt, q_index, frame_idx, output):
    Path(output).write_bytes(pack_p(string, q_in_ckpt, q_index, frame_idx))


def decode_p(inputpath):
    return unpack_p(Path(inputpath).read_bytes())


# -- HEM/EVC style: rounded-q ushort in the header --------------------------

def encode_i_ushort_q(height, width, q_index, bit_stream, output):
    with Path(output).open("wb") as f:
        f.write(struct.pack(">2I", height, width))
        f.write(struct.pack(">H", q_index))
        f.write(struct.pack(">I", len(bit_stream)))
        f.write(bit_stream)


def decode_i_ushort_q(inputpath):
    with Path(inputpath).open("rb") as f:
        height, width = struct.unpack(">2I", f.read(8))
        q_index = struct.unpack(">H", f.read(2))[0]
        length = struct.unpack(">I", f.read(4))[0]
        bit_stream = f.read(length)
    return height, width, q_index, bit_stream


def pack_strings(strings) -> bytes:
    """Length-prefix N substreams into one payload (gen-1 P-frames carry
    mv_z/mv_y/z/y separately, DCVC/src/utils/stream_helper.py:127-146)."""
    out = [struct.pack(">B", len(strings))]
    for s in strings:
        out.append(struct.pack(">I", len(s)))
        out.append(s)
    return b"".join(out)


def unpack_strings(payload: bytes) -> list:
    if len(payload) < 1:
        raise ValueError("empty substream container")
    n = struct.unpack(">B", payload[:1])[0]
    strings, off = [], 1
    for i in range(n):
        if off + 4 > len(payload):
            raise ValueError(f"corrupt substream container: truncated length "
                             f"field for part {i}")
        length = struct.unpack(">I", payload[off:off + 4])[0]
        off += 4
        if off + length > len(payload):
            raise ValueError(f"corrupt substream container: part {i} wants "
                             f"{length} bytes, {len(payload) - off} left")
        strings.append(payload[off:off + length])
        off += length
    return strings


# -- gen-1 style: h,w + N length-prefixed substreams ------------------------
# (DCVC/src/utils/stream_helper.py:108-163 writes each latent's string with
# its own length; used for the per-rate CompressAI zoo intra models)

def encode_i_strings(height, width, strings, output):
    with Path(output).open("wb") as f:
        f.write(struct.pack(">2I", height, width))
        f.write(struct.pack(">B", len(strings)))
        for s in strings:
            f.write(struct.pack(">I", len(s)))
            f.write(s)


def decode_i_strings(inputpath):
    with Path(inputpath).open("rb") as f:
        height, width = struct.unpack(">2I", f.read(8))
        n = struct.unpack(">B", f.read(1))[0]
        strings = []
        for _ in range(n):
            length = struct.unpack(">I", f.read(4))[0]
            strings.append(f.read(length))
    return height, width, strings


def encode_p_ushort_q(string, y_q_index, mv_y_q_index, output):
    with Path(output).open("wb") as f:
        f.write(struct.pack(">2H", y_q_index, mv_y_q_index))
        f.write(struct.pack(">I", len(string)))
        f.write(string)


def decode_p_ushort_q(inputpath):
    with Path(inputpath).open("rb") as f:
        y_q_index, mv_y_q_index = struct.unpack(">2H", f.read(4))
        length = struct.unpack(">I", f.read(4))[0]
        string = f.read(length)
    return y_q_index, mv_y_q_index, string


def get_state_dict(ckpt_path: str) -> dict:
    """Load a (torch) checkpoint into a flat numpy state dict."""
    import torch

    ckpt = torch.load(ckpt_path, map_location="cpu", weights_only=True)
    if "state_dict" in ckpt:
        ckpt = ckpt["state_dict"]
    if "net" in ckpt:
        ckpt = ckpt["net"]
    return {k.removeprefix("module."): v.numpy() if hasattr(v, "numpy") else v
            for k, v in ckpt.items()}
