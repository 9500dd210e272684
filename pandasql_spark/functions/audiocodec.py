"""Native WAV (RIFF/PCM) codec — real audio decode with zero external
dependencies, the audio analog of functions/imagecodec.py.

The container has no audio libraries, but WAV/PCM needs none: the RIFF
container is length-prefixed chunks and PCM16 payloads are raw
little-endian int16 — `struct` + numpy decode it exactly. That makes
the audio column path (schema → decode → per-frame features) REAL and
oracle-checkable end-to-end (q80), unlike the video stub whose codecs
genuinely don't exist here.

Scope: PCM (format tag 1), 16-bit, any channel count/rate. Compressed
formats (MP3/AAC/FLAC) raise AudioDecodeError — at 100 TB those decode
inside the same mapInPandas kernels once a codec library is present;
the Spark-side plumbing is identical.

Reference scope note: the reference engine (pandasql) has no binary /
media surface at all; this is part of the beyond-reference multimodal
inventory (SURVEY.md §2 'multimodal columns').
"""

from __future__ import annotations

import struct

import numpy as np


class AudioDecodeError(ValueError):
    """Any malformed / unsupported audio payload normalizes to this, so
    one corrupt file can't kill a distributed kernel."""


def encode_wav(samples: np.ndarray, rate: int) -> bytes:
    """int16 array (n,) or (n, channels) → canonical RIFF/WAVE bytes
    (fmt + data chunks). Used by tests and the q80 render stage; the
    decoder never sees the inputs, only these bytes."""
    a = np.asarray(samples, dtype=np.int16)
    if a.ndim == 1:
        a = a[:, None]
    if a.ndim != 2 or not len(a):
        raise ValueError("samples must be a non-empty 1-D or 2-D array")
    if rate <= 0:
        raise ValueError(f"rate must be positive, got {rate}")
    n, ch = a.shape
    payload = a.astype("<i2").tobytes()
    block_align = ch * 2
    fmt = struct.pack("<HHIIHH", 1, ch, rate, rate * block_align, block_align, 16)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(payload)) + payload
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def wav_meta(b: bytes) -> tuple[int, int, int, int]:
    """Header-only parse → (sample_rate, channels, bits, n_samples).
    Walks the chunk list, so extra chunks (LIST/INFO/fact) before or
    between fmt/data are fine."""
    rate = ch = bits = None
    n_samples = None
    for cid, payload_off, size in _chunks(b):
        if cid == b"fmt ":
            if size < 16:
                raise AudioDecodeError("fmt chunk too short")
            tag, ch, rate, _, _, bits = struct.unpack(
                "<HHIIHH", b[payload_off : payload_off + 16]
            )
            if tag != 1:
                raise AudioDecodeError(f"unsupported WAV format tag {tag} (PCM only)")
        elif cid == b"data":
            if rate is None:
                raise AudioDecodeError("data chunk before fmt")
            block = ch * (bits // 8)
            if block == 0:
                raise AudioDecodeError("zero block align")
            n_samples = size // block
    if rate is None or n_samples is None:
        raise AudioDecodeError("missing fmt or data chunk")
    return rate, ch, bits, n_samples


def decode_wav(b: bytes) -> tuple[int, np.ndarray]:
    """Full decode → (sample_rate, int16 array (n_samples, channels)).
    PCM16 only; everything else raises AudioDecodeError."""
    rate = ch = bits = None
    data = None
    for cid, payload_off, size in _chunks(b):
        if cid == b"fmt ":
            if size < 16:
                raise AudioDecodeError("fmt chunk too short")
            tag, ch, rate, _, _, bits = struct.unpack(
                "<HHIIHH", b[payload_off : payload_off + 16]
            )
            if tag != 1:
                raise AudioDecodeError(f"unsupported WAV format tag {tag} (PCM only)")
        elif cid == b"data":
            data = b[payload_off : payload_off + size]
    if rate is None or data is None:
        raise AudioDecodeError("missing fmt or data chunk")
    if bits != 16:
        raise AudioDecodeError(f"PCM{bits} unsupported (16-bit only)")
    if len(data) % (ch * 2):
        raise AudioDecodeError("data chunk not a whole number of frames")
    arr = np.frombuffer(data, dtype="<i2").reshape(-1, ch)
    return rate, arr


def _chunks(b: bytes):
    """Yield (chunk_id, payload_offset, payload_size) for each RIFF
    chunk; validates the outer RIFF/WAVE container."""
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise AudioDecodeError("not a RIFF/WAVE stream")
    i = 12
    n = len(b)
    while i + 8 <= n:
        cid = b[i : i + 4]
        (size,) = struct.unpack("<I", b[i + 4 : i + 8])
        if i + 8 + size > n:
            raise AudioDecodeError(f"truncated chunk {cid!r}")
        yield cid, i + 8, size
        i += 8 + size + (size & 1)  # chunks are word-aligned
