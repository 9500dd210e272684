"""Native uncompressed-AVI video codec — the video analog of the WAV
codec (audiocodec.py): AVI is RIFF, exactly like WAVE, so the same
chunk-walk discipline yields a real, dependency-free video path.

``encode_avi`` writes spec-valid single-stream 'DIB ' (BI_RGB,
24-bit, bottom-up, row-padded) AVI files; ``decode_avi`` reads them
back frame-exact. COMPRESSED codecs (MJPEG, H.264, …) are rejected
with VideoDecodeError — explicitly unsupported, never silently wrong:
no codec library exists in this container, and an uncompressed
contract is what makes frame bytes bit-checkable by an oracle. The
Spark-side plumbing (operators/multimodal.sample_frames) treats this
codec as the decodable case and any other payload as the corrupt-media
branch.

Everything here is the public AVI/RIFF layout: AVIMAINHEADER (56
bytes), AVISTREAMHEADER ('vids'/'DIB '), BITMAPINFOHEADER (40 bytes,
biCompression=0), LIST movi with '00db' frames.
"""

from __future__ import annotations

import struct

import numpy as np


class VideoDecodeError(ValueError):
    """Payload is not a decodable (uncompressed-AVI) video."""


def _row_stride(w: int) -> int:
    return (w * 3 + 3) & ~3  # BGR rows padded to 4 bytes


def encode_avi(frames: np.ndarray, fps: int = 10) -> bytes:
    """uint8 RGB frames (n, h, w, 3) → single-stream uncompressed AVI."""
    f = np.asarray(frames)
    if f.dtype != np.uint8 or f.ndim != 4 or f.shape[3] != 3:
        raise ValueError(f"need uint8 (n, h, w, 3), got {f.dtype} {f.shape}")
    if fps < 1:
        raise ValueError(f"fps must be >= 1, got {fps}")
    n, h, w, _ = f.shape
    if n < 1 or h < 1 or w < 1:
        raise ValueError(f"empty video: {f.shape}")
    stride = _row_stride(w)
    frame_size = stride * h

    def chunk(fourcc: bytes, payload: bytes) -> bytes:
        pad = b"\x00" if len(payload) % 2 else b""
        return fourcc + struct.pack("<I", len(payload)) + payload + pad

    def list_chunk(kind: bytes, payload: bytes) -> bytes:
        return chunk(b"LIST", kind + payload)

    avih = struct.pack(
        "<14I",
        1_000_000 // fps, frame_size * fps, 0, 0x10,  # HASINDEX-free, 0x10=HAS... keep simple flags
        n, 0, 1, frame_size, w, h, 0, 0, 0, 0,
    )
    strh = (
        b"vidsDIB " + struct.pack(
            "<IHHIIIIIIII", 0, 0, 0, 0, 1, fps, 0, n, frame_size, 0xFFFFFFFF, 0
        ) + struct.pack("<4H", 0, 0, w, h)
    )
    strf = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, frame_size, 0, 0, 0, 0
    )
    hdrl = list_chunk(
        b"hdrl",
        chunk(b"avih", avih)
        + list_chunk(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi_frames = []
    for i in range(n):
        # RGB → BGR, bottom-up, padded rows
        bgr = f[i, ::-1, :, ::-1]
        rows = np.zeros((h, stride), np.uint8)
        rows[:, : w * 3] = bgr.reshape(h, w * 3)
        movi_frames.append(chunk(b"00db", rows.tobytes()))
    movi = list_chunk(b"movi", b"".join(movi_frames))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _walk(b: bytes, start: int, end: int):
    pos = start
    while pos + 8 <= end:
        fourcc = b[pos:pos + 4]
        (size,) = struct.unpack_from("<I", b, pos + 4)
        payload_start = pos + 8
        yield fourcc, payload_start, min(payload_start + size, end)
        pos = payload_start + size + (size & 1)


def decode_avi(b: bytes) -> tuple[float, np.ndarray]:
    """Uncompressed AVI bytes → (fps, frames (n, h, w, 3) uint8 RGB)."""
    if b[:4] != b"RIFF" or b[8:12] != b"AVI ":
        raise VideoDecodeError("not an AVI")
    try:
        w = h = None
        fps = 0.0
        top_down = False
        frames: list[bytes] = []

        def walk_list(start: int, end: int) -> None:
            nonlocal w, h, fps, top_down
            for fourcc, ps, pe in _walk(b, start, end):
                if fourcc == b"LIST":
                    walk_list(ps + 4, pe)
                elif fourcc == b"strh":
                    if b[ps:ps + 4] == b"vids":
                        scale, rate = struct.unpack_from("<II", b, ps + 20)
                        if scale:
                            fps = rate / scale
                elif fourcc == b"strf":
                    (bw, bh) = struct.unpack_from("<ii", b, ps + 4)
                    (bits,) = struct.unpack_from("<H", b, ps + 14)
                    (comp,) = struct.unpack_from("<I", b, ps + 16)
                    if comp != 0:
                        raise VideoDecodeError(
                            f"compressed AVI (biCompression={comp}) unsupported"
                        )
                    if bits != 24:
                        raise VideoDecodeError(f"{bits}-bit DIB unsupported")
                    # negative biHeight = spec-valid TOP-DOWN row order:
                    # decode it correctly (no flip), don't mirror it
                    w, h, top_down = bw, abs(bh), bh < 0
                elif fourcc in (b"00db", b"00dc"):
                    frames.append(b[ps:pe])

        walk_list(12, len(b))
        if w is None or h is None or not frames:
            raise VideoDecodeError("missing stream format or frames")
        stride = _row_stride(w)
        out = np.empty((len(frames), h, w, 3), np.uint8)
        for i, fr in enumerate(frames):
            if len(fr) < stride * h:
                raise VideoDecodeError(f"frame {i} truncated")
            rows = np.frombuffer(fr, np.uint8, stride * h).reshape(h, stride)
            bgr = rows[:, : w * 3].reshape(h, w, 3)
            rgb = bgr[:, :, ::-1] if top_down else bgr[::-1, :, ::-1]
            out[i] = rgb
        return fps, out
    except VideoDecodeError:
        raise
    except (struct.error, IndexError, ValueError) as exc:
        raise VideoDecodeError(f"truncated/invalid AVI: {exc}") from exc


def avi_meta(b: bytes) -> tuple[int, int, int, float]:
    """(width, height, n_frames, fps) — full parse (the file IS the
    index for the uncompressed layout)."""
    fps, frames = decode_avi(b)
    n, h, w, _ = frames.shape
    return w, h, n, fps
