"""Image codecs for the multimodal pipeline — real decode, no stubs.

Two layers:

- ``decode_image_meta``: header-only parse (PNG IHDR, JPEG SOF scan,
  GIF logical screen descriptor) → (format, width, height, mode).
  Pure stdlib, O(header) per image.
- ``decode_image`` / ``encode_png`` / ``encode_gif``: full pixel
  decode/encode. PNG is implemented natively (zlib inflate +
  per-scanline unfilter in numpy, all five filter types, 8-bit
  gray/gray+alpha/RGB/RGBA, non-interlaced), GIF87a/89a natively
  (variable-width LSB-first LZW, global/local color tables, interlace,
  first-frame contract), and baseline JPEG natively too
  (jpegcodec.py: Huffman + dequant + IDCT, 4:4:4…4:2:0, restart
  markers) — the container needs no image libraries; if PIL is
  importable it is preferred as the fast path and adds progressive
  JPEG.

These run inside Arrow-batched ``mapInPandas`` kernels on executors
(see operators/multimodal.py) — plain ``bytes -> numpy`` functions with
no Spark dependency, so they are unit-testable in isolation.

Reference parity note: the reference engine (pandasql) has no media
handling at all; this module is part of the beyond-reference
training-data-pipeline surface.
"""

from __future__ import annotations

import io as _io
import struct
import zlib

import numpy as np

try:  # optional fast path + JPEG/GIF pixel support
    from PIL import Image as _PILImage  # type: ignore

    HAVE_PIL = True
except Exception:  # pragma: no cover - PIL absent in this container
    _PILImage = None
    HAVE_PIL = False

_PNG_SIG = b"\x89PNG\r\n\x1a\n"

#: PNG color type -> (channels, mode name)
_PNG_COLOR = {0: (1, "L"), 2: (3, "RGB"), 3: (1, "P"), 4: (2, "LA"), 6: (4, "RGBA")}
_MODE_COLOR = {"L": 0, "LA": 4, "RGB": 2, "RGBA": 6}


class ImageDecodeError(ValueError):
    """Payload is not a decodable image (bad magic, truncated, or an
    unsupported encoding variant)."""


# ---------------------------------------------------------------------------
# header-only metadata
# ---------------------------------------------------------------------------


def sniff_format(b: bytes) -> str | None:
    """Magic-byte sniff: 'png' | 'jpeg' | 'gif' | None."""
    if b[:8] == _PNG_SIG:
        return "png"
    if b[:2] == b"\xff\xd8":
        return "jpeg"
    if b[:6] in (b"GIF87a", b"GIF89a"):
        return "gif"
    return None


def decode_image_meta(b: bytes) -> tuple[str, int, int, str]:
    """(format, width, height, mode) from the image header alone.

    Raises ImageDecodeError on non-image bytes — including truncated
    headers whose parse would otherwise surface struct.error (the
    kernels catch only ImageDecodeError, so every failure mode of
    arbitrary crawl bytes must normalize to it). Never inflates pixel
    data."""
    try:
        return _decode_image_meta(b)
    except ImageDecodeError:
        raise
    except Exception as exc:  # struct.error, IndexError on truncation
        raise ImageDecodeError(f"corrupt image header: {exc}") from exc


def _decode_image_meta(b: bytes) -> tuple[str, int, int, str]:
    fmt = sniff_format(b)
    if fmt == "png":
        if len(b) < 33 or b[12:16] != b"IHDR":
            raise ImageDecodeError("truncated PNG (no IHDR)")
        w, h = struct.unpack(">II", b[16:24])
        depth, color = b[24], b[25]
        ch_mode = _PNG_COLOR.get(color)
        if ch_mode is None:
            raise ImageDecodeError(f"unknown PNG color type {color}")
        mode = ch_mode[1] if depth == 8 else f"{ch_mode[1]};{depth}"
        return "png", w, h, mode
    if fmt == "jpeg":
        return ("jpeg", *_jpeg_dims(b))
    if fmt == "gif":
        w, h = struct.unpack("<HH", b[6:10])
        return "gif", w, h, "P"
    raise ImageDecodeError("unrecognized image magic")


def _jpeg_dims(b: bytes) -> tuple[int, int, str]:
    """Scan JFIF markers for the frame header (SOF0..SOF15, minus the
    DHT/DAC/RST family) → (width, height, mode)."""
    i = 2
    n = len(b)
    while i + 4 <= n:
        if b[i] != 0xFF:
            i += 1
            continue
        # a marker may be preceded by any number of 0xFF fill bytes
        # (spec-legal padding) — the marker code is the first non-FF
        while i + 1 < n and b[i + 1] == 0xFF:
            i += 1
        if i + 4 > n:
            break
        marker = b[i + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:  # no payload
            i += 2
            continue
        seglen = struct.unpack(">H", b[i + 2 : i + 4])[0]
        if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            h, w = struct.unpack(">HH", b[i + 5 : i + 9])
            ncomp = b[i + 9]
            return w, h, {1: "L", 3: "RGB", 4: "CMYK"}.get(ncomp, f"C{ncomp}")
        i += 2 + seglen
    raise ImageDecodeError("no SOF marker in JPEG")


# ---------------------------------------------------------------------------
# full PNG decode (native)
# ---------------------------------------------------------------------------


def decode_png(b: bytes) -> np.ndarray:
    """PNG bytes → uint8 array (h, w, channels). Native implementation:
    chunk walk, zlib inflate, scanline unfilter (all 5 filter types).
    Supports 8-bit gray / gray+alpha / RGB / RGBA, non-interlaced — the
    shapes ``encode_png`` writes and the overwhelming web majority.
    Palette, 16-bit, and Adam7 raise ImageDecodeError (PIL path handles
    them when available). Like decode_image_meta, every parse failure
    on truncated/corrupt bytes normalizes to ImageDecodeError."""
    try:
        return _decode_png(b)
    except ImageDecodeError:
        raise
    except Exception as exc:  # struct.error / ValueError on truncation
        raise ImageDecodeError(f"corrupt PNG: {exc}") from exc


def _decode_png(b: bytes) -> np.ndarray:
    if b[:8] != _PNG_SIG:
        raise ImageDecodeError("not a PNG")
    w = h = None
    depth = color = interlace = None
    idat = []
    i = 8
    while i + 8 <= len(b):
        (clen,) = struct.unpack(">I", b[i : i + 4])
        ctype = b[i + 4 : i + 8]
        data = b[i + 8 : i + 8 + clen]
        if ctype == b"IHDR":
            w, h = struct.unpack(">II", data[:8])
            depth, color, _, _, interlace = data[8:13]
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"IEND":
            break
        i += 12 + clen
    if w is None or not idat:
        raise ImageDecodeError("truncated PNG")
    if depth != 8 or color not in (0, 2, 4, 6) or interlace != 0:
        raise ImageDecodeError(
            f"unsupported PNG variant (depth={depth} color={color} "
            f"interlace={interlace}); install PIL for full coverage"
        )
    ch = _PNG_COLOR[color][0]
    try:
        raw = zlib.decompress(b"".join(idat))
    except zlib.error as exc:  # corrupt deflate stream in a crawl payload
        raise ImageDecodeError(f"corrupt PNG pixel stream: {exc}") from exc
    stride = w * ch
    if len(raw) != h * (stride + 1):
        raise ImageDecodeError("PNG pixel payload has wrong length")
    raw = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride + 1)
    filters = raw[:, 0]
    if not filters.any():
        # all scanlines filter 0 (None): the unfilter is the identity,
        # so skip the per-row loop entirely — the common case for
        # machine-written PNGs (encode_png's default, and therefore
        # every sample_frames/resize_images round-trip). Bit-exact:
        # filter 0 never reads the previous row. copy() detaches from
        # the zlib buffer so the result stays writable like the loop's.
        return raw[:, 1:].reshape(h, w, ch).copy()
    rows = raw[:, 1:].astype(np.int32)  # int32: unfilter sums exceed uint8
    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        f = filters[y]
        cur = rows[y]
        if f == 0:
            rec = cur
        elif f == 2:  # Up
            rec = (cur + prev) & 0xFF
        else:
            rec = cur.copy()
            if f == 1:  # Sub — sequential in x, vector over channels
                for x in range(ch, stride, ch):
                    rec[x : x + ch] = (rec[x : x + ch] + rec[x - ch : x]) & 0xFF
            elif f == 3:  # Average
                rec[:ch] = (rec[:ch] + prev[:ch] // 2) & 0xFF
                for x in range(ch, stride, ch):
                    rec[x : x + ch] = (
                        rec[x : x + ch]
                        + (rec[x - ch : x] + prev[x : x + ch]) // 2
                    ) & 0xFF
            elif f == 4:  # Paeth
                rec[:ch] = (rec[:ch] + _paeth(0, prev[:ch], 0)) & 0xFF
                for x in range(ch, stride, ch):
                    rec[x : x + ch] = (
                        rec[x : x + ch]
                        + _paeth(
                            rec[x - ch : x], prev[x : x + ch], prev[x - ch : x]
                        )
                    ) & 0xFF
            else:
                raise ImageDecodeError(f"bad PNG filter type {f}")
        out[y] = rec
        prev = rec.astype(np.int32)
    return out.reshape(h, w, ch)


def _paeth(a, b, c):
    """Paeth predictor (RFC 2083 §6.6), elementwise over channel slices."""
    p = a + b - c
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    return np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))


def encode_png(arr: np.ndarray, filter_type: int = 0, level: int = 6) -> bytes:
    """uint8 array (h, w[, channels]) → real PNG bytes. ``filter_type``
    applies one PNG filter (0–4) to every scanline — used by the tests
    to exercise each unfilter path with true round-trips."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, ch = a.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}.get(ch)
    if color is None:
        raise ValueError(f"unsupported channel count {ch}")
    stride = w * ch
    flat = a.reshape(h, stride).astype(np.int32)
    lines = []
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        cur = flat[y]
        left = np.zeros(stride, dtype=np.int32)
        left[ch:] = cur[:-ch]
        upleft = np.zeros(stride, dtype=np.int32)
        upleft[ch:] = prev[:-ch]
        if filter_type == 0:
            filt = cur
        elif filter_type == 1:
            filt = cur - left
        elif filter_type == 2:
            filt = cur - prev
        elif filter_type == 3:
            filt = cur - (left + prev) // 2
        elif filter_type == 4:
            filt = cur - _paeth(left, prev, upleft)
        else:
            raise ValueError(f"bad filter type {filter_type}")
        lines.append(bytes([filter_type]) + (filt & 0xFF).astype(np.uint8).tobytes())
        prev = cur
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    idat = zlib.compress(b"".join(lines), level)

    def chunk(ctype: bytes, data: bytes) -> bytes:
        crc = zlib.crc32(ctype + data) & 0xFFFFFFFF
        return struct.pack(">I", len(data)) + ctype + data + struct.pack(">I", crc)

    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", idat)
        + chunk(b"IEND", b"")
    )


def jfif_header_bytes(width: int, height: int, ncomp: int = 3) -> bytes:
    """A minimal, spec-valid JFIF marker stream (SOI + APP0 + SOF0 +
    EOI) with NO entropy-coded scan: every header parser — this
    module's ``_jpeg_dims`` and PIL's lazy ``open()`` alike — reads the
    true dimensions and component count, while any pixel decode fails
    deterministically (there is no image data), with or without PIL.
    That makes it the gate corpus for the header-only fallback branch
    of ``image_meta``/``decode_image`` (q41): no baseline-JPEG encoder
    exists in this container, but the metadata path is fully real."""
    if not (0 < width <= 0xFFFF and 0 < height <= 0xFFFF):
        raise ValueError(f"dims out of JFIF range: {width}x{height}")
    app0 = b"JFIF\x00\x01\x01\x00" + struct.pack(">HH", 1, 1) + b"\x00\x00"
    sof_comps = b"".join(
        struct.pack("BBB", cid + 1, 0x11, 0) for cid in range(ncomp)
    )
    sof = struct.pack(">BHHB", 8, height, width, ncomp) + sof_comps
    return (
        b"\xff\xd8"  # SOI
        + b"\xff\xe0" + struct.pack(">H", len(app0) + 2) + app0
        + b"\xff\xc0" + struct.pack(">H", len(sof) + 2) + sof
        + b"\xff\xd9"  # EOI
    )


def decode_image(b: bytes) -> np.ndarray:
    """Any supported image bytes → uint8 pixel array (h, w, channels) —
    ALWAYS 3-D, grayscale included. PIL when available (all formats),
    else the native PNG decoder; every failure mode normalizes to
    ImageDecodeError so one corrupt payload can't kill a kernel."""
    if HAVE_PIL:  # pragma: no cover - PIL absent in this container
        try:
            img = _PILImage.open(_io.BytesIO(b))
            arr = np.asarray(
                img.convert(img.mode if img.mode in _MODE_COLOR else "RGB")
            )
        except Exception as exc:  # UnidentifiedImageError, OSError, ...
            raise ImageDecodeError(f"undecodable image: {exc}") from exc
        if arr.ndim == 2:  # PIL mode 'L'/'P' → (h, w); contract is 3-D
            arr = arr[:, :, None]
        return arr
    fmt = sniff_format(b)
    if fmt == "gif":
        return decode_gif(b)
    if fmt == "jpeg":
        from .jpegcodec import decode_jpeg

        return decode_jpeg(b)
    return decode_png(b)


# ---------------------------------------------------------------------------
# GIF: native LZW decode + encode (no image libraries)
# ---------------------------------------------------------------------------


def _gif_lzw_decode(data: bytes, min_code_size: int) -> list[int]:
    """GIF-flavor LZW (LSB-first variable-width codes, CLEAR/EOI,
    12-bit cap) → palette-index list."""
    if not (2 <= min_code_size <= 11):
        raise ImageDecodeError(f"bad LZW min code size {min_code_size}")
    clear, eoi = 1 << min_code_size, (1 << min_code_size) + 1
    base = {i: (i,) for i in range(clear)}
    table = dict(base)
    next_code = eoi + 1
    code_size = min_code_size + 1
    out: list[int] = []
    prev: tuple[int, ...] | None = None
    bitpos, n_bits = 0, len(data) * 8
    while True:
        if bitpos + code_size > n_bits:
            break  # ran out of bits before EOI — tolerate (common)
        byte_i = bitpos >> 3
        window = int.from_bytes(data[byte_i:byte_i + 3], "little")
        code = (window >> (bitpos & 7)) & ((1 << code_size) - 1)
        bitpos += code_size
        if code == clear:
            table = dict(base)
            next_code = eoi + 1
            code_size = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            entry = table.get(code)
            if entry is None:
                raise ImageDecodeError(f"LZW first code {code} undefined")
        elif code in table:
            entry = table[code]
        elif code == next_code:  # the KwKwK case
            entry = prev + (prev[0],)
        else:
            raise ImageDecodeError(f"LZW code {code} out of range")
        out.extend(entry)
        if prev is not None and next_code < 4096:
            table[next_code] = prev + (entry[0],)
            next_code += 1
            if next_code == (1 << code_size) and code_size < 12:
                code_size += 1
        prev = entry
    return out


def _gif_lzw_encode(indices: "np.ndarray | list[int]", min_code_size: int) -> bytes:
    """Inverse of :func:`_gif_lzw_decode`; emits CLEAR up front and on
    table overflow (the always-safe variant), EOI at the end."""
    clear, eoi = 1 << min_code_size, (1 << min_code_size) + 1
    out = bytearray()
    cur, nbits = 0, 0
    code_size = min_code_size + 1

    def emit(code: int) -> None:
        nonlocal cur, nbits
        cur |= code << nbits
        nbits += code_size
        while nbits >= 8:
            out.append(cur & 0xFF)
            cur >>= 8
            nbits -= 8

    table: dict[tuple[int, ...], int] = {(i,): i for i in range(clear)}
    next_code = eoi + 1
    emit(clear)
    w: tuple[int, ...] = ()
    for k in indices:
        k = int(k)
        if not 0 <= k < clear:
            raise ValueError(f"index {k} exceeds palette ({clear})")
        wk = w + (k,)
        if wk in table:
            w = wk
            continue
        emit(table[w])
        if next_code < 4096:
            table[wk] = next_code
            next_code += 1
            # decoder widens after ITS mirrored insert (one behind us)
            if next_code == (1 << code_size) + 1 and code_size < 12:
                code_size += 1
        else:  # table full: reset rather than rely on deferred-clear
            emit(clear)
            table = {(i,): i for i in range(clear)}
            next_code = eoi + 1
            code_size = min_code_size + 1
        w = (k,)
    if w:
        emit(table[w])
    emit(eoi)
    if nbits:
        out.append(cur & 0xFF)
    return bytes(out)


_GIF_INTERLACE = ((0, 8), (4, 8), (2, 4), (1, 2))


def decode_gif(b: bytes) -> np.ndarray:
    """First frame of a GIF87a/89a → uint8 RGB array (h, w, 3), fully
    native: screen/image descriptors, global+local color tables, LZW,
    interlace. Animation frames past the first and transparency are
    ignored (first-frame contract, like PIL's default seek(0))."""
    if b[:6] not in (b"GIF87a", b"GIF89a"):
        raise ImageDecodeError("not a GIF")
    try:
        sw, sh, packed, _bg, _ar = struct.unpack_from("<HHBBB", b, 6)
        pos = 13
        gct = None
        if packed & 0x80:
            n = 2 << (packed & 0x07)
            gct = np.frombuffer(b, np.uint8, 3 * n, pos).reshape(n, 3)
            pos += 3 * n
        while pos < len(b):
            block = b[pos]
            pos += 1
            if block == 0x21:  # extension: label + sub-blocks
                pos += 1
                while b[pos]:
                    pos += 1 + b[pos]
                pos += 1
            elif block == 0x2C:  # image descriptor
                _lx, _ty, w, h, ip = struct.unpack_from("<HHHHB", b, pos)
                pos += 9
                ct = gct
                if ip & 0x80:
                    n = 2 << (ip & 0x07)
                    ct = np.frombuffer(b, np.uint8, 3 * n, pos).reshape(n, 3)
                    pos += 3 * n
                if ct is None:
                    raise ImageDecodeError("no color table")
                mcs = b[pos]
                pos += 1
                chunks = []
                while b[pos]:
                    ln = b[pos]
                    chunks.append(b[pos + 1:pos + 1 + ln])
                    pos += 1 + ln
                pos += 1
                idx = _gif_lzw_decode(b"".join(chunks), mcs)
                if len(idx) < w * h:
                    raise ImageDecodeError(
                        f"LZW stream short: {len(idx)} < {w * h}"
                    )
                arr = np.asarray(idx[: w * h], np.uint16).reshape(h, w)
                if int(arr.max(initial=0)) >= len(ct):
                    raise ImageDecodeError("palette index out of range")
                if ip & 0x40:  # interlaced: reorder rows
                    rows = np.empty(h, np.int64)
                    src = 0
                    for start, step in _GIF_INTERLACE:
                        for r in range(start, h, step):
                            rows[r] = src
                            src += 1
                    arr = arr[rows]
                return ct[arr]
            elif block == 0x3B:
                break
            else:
                raise ImageDecodeError(f"bad GIF block 0x{block:02x}")
    except ImageDecodeError:
        raise
    except (struct.error, IndexError, ValueError) as exc:
        raise ImageDecodeError(f"truncated GIF: {exc}") from exc
    raise ImageDecodeError("GIF has no image data")


def encode_gif(arr: np.ndarray) -> bytes:
    """uint8 RGB (h, w, 3) or palette-index (h, w) with ≤256 distinct
    colors → single-frame GIF89a with a global color table. Palette
    order is the sorted unique colors, so encoding is deterministic."""
    a = np.asarray(arr)
    if a.dtype != np.uint8:
        raise ValueError(f"need uint8 pixels, got {a.dtype}")
    if a.ndim == 2:
        rgb = np.repeat(a[:, :, None], 3, axis=2)
    elif a.ndim == 3 and a.shape[2] == 3:
        rgb = a
    else:
        raise ValueError(f"need (h, w) or (h, w, 3), got {a.shape}")
    h, w = rgb.shape[:2]
    if not (0 < w <= 0xFFFF and 0 < h <= 0xFFFF):
        raise ValueError(f"dims out of GIF range: {w}x{h}")
    flat = rgb.reshape(-1, 3)
    palette, inverse = np.unique(flat, axis=0, return_inverse=True)
    if len(palette) > 256:
        raise ValueError(f"{len(palette)} colors exceed GIF's 256")
    depth = max(1, int(np.ceil(np.log2(max(2, len(palette))))))
    n_slots = 1 << depth
    ct = np.zeros((n_slots, 3), np.uint8)
    ct[: len(palette)] = palette
    mcs = max(2, depth)
    data = _gif_lzw_encode(inverse.ravel(), mcs)
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | (depth - 1), 0, 0)
    out += ct.tobytes()
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
    out.append(mcs)
    for i in range(0, len(data), 255):
        chunk = data[i:i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"
    return bytes(out)
