"""Pure-stdlib media codecs (zlib + struct) for the multimodal decode path:
baseline PNG (images) and RIFF PCM16 WAV (audio).

The container has no imaging libraries, but PNG's baseline profile needs
none: chunks are length/type/crc framing (zlib.crc32), pixel data is
zlib-compressed scanlines with 5 per-row predictor filters. Supporting
8-bit greyscale / RGB / RGBA, non-interlaced — the profile every PNG
writer can emit — makes the multimodal image path REAL end-to-end
(decode + re-encode), not a stub; exotic profiles (16-bit, palette,
Adam7) still raise and fall back to the documented stub path.

Used executor-side inside Arrow ``mapInPandas`` kernels
(operators/multimodal.py): payload bytes in, numpy (H, W, C) out, never
on the driver.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 6: 4}  # grey, RGB, RGBA (8-bit)


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    p = a.astype(np.int16) + b.astype(np.int16) - c.astype(np.int16)
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    out = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))
    return out.astype(np.uint8)


def png_decode(payload: bytes) -> np.ndarray:
    """Decode a baseline PNG to a (H, W, C) uint8 array.

    Raises ValueError on non-PNG bytes and NotImplementedError on
    profiles outside 8-bit grey/RGB/RGBA non-interlaced.
    """
    if payload is None or payload[: len(_SIG)] != _SIG:
        raise ValueError("not a PNG payload")
    pos = len(_SIG)
    width = height = None
    colortype = None
    idat = bytearray()
    while pos < len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        pos += 12 + length  # len + type + data + crc
        if ctype == b"IHDR":
            width, height, depth, colortype, comp, filt, interlace = (
                struct.unpack(">IIBBBBB", data)
            )
            if depth != 8 or colortype not in _CHANNELS or interlace != 0:
                raise NotImplementedError(
                    f"unsupported PNG profile: depth={depth} "
                    f"colortype={colortype} interlace={interlace}"
                )
        elif ctype == b"IDAT":
            idat.extend(data)
        elif ctype == b"IEND":
            break
    if width is None:
        raise ValueError("PNG missing IHDR")
    ch = _CHANNELS[colortype]
    raw = zlib.decompress(bytes(idat))
    stride = width * ch
    if len(raw) != height * (stride + 1):
        raise ValueError("PNG scanline length mismatch")
    out = np.zeros((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(height):
        off = y * (stride + 1)
        ftype = raw[off]
        row = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=off + 1)
        if ftype == 0:  # None
            cur = row.copy()
        elif ftype == 1:  # Sub: per-lane prefix sum; uint8 cast == mod 256
            cur = (
                np.cumsum(row.reshape(-1, ch).astype(np.int64), axis=0)
                .astype(np.uint8)
                .reshape(-1)
            )
        elif ftype == 2:  # Up: vector add with uint8 wraparound
            cur = row + prev
        elif ftype == 3:  # Average — left-dependency: pure-int loop
            # (bytearray + python ints; numpy scalar indexing in this
            # loop costs ~20x in boxing overhead)
            rb = raw[off + 1 : off + 1 + stride]
            pl = prev.tolist()
            cb = bytearray(stride)
            for x in range(stride):
                left = cb[x - ch] if x >= ch else 0
                cb[x] = (rb[x] + ((left + pl[x]) >> 1)) & 0xFF
            cur = np.frombuffer(bytes(cb), dtype=np.uint8)
        elif ftype == 4:  # Paeth — left-dependency: pure-int loop
            rb = raw[off + 1 : off + 1 + stride]
            pl = prev.tolist()
            cb = bytearray(stride)
            for x in range(stride):
                a = cb[x - ch] if x >= ch else 0
                b = pl[x]
                c = pl[x - ch] if x >= ch else 0
                pa, pb, pc = abs(b - c), abs(a - c), abs(a + b - 2 * c)
                pred = (
                    a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                )
                cb[x] = (rb[x] + pred) & 0xFF
            cur = np.frombuffer(bytes(cb), dtype=np.uint8)
        else:
            raise ValueError(f"bad PNG filter type {ftype}")
        out[y] = cur
        prev = out[y]
    return out.reshape(height, width, ch)


def _chunk(ctype: bytes, data: bytes) -> bytes:
    crc = zlib.crc32(ctype + data) & 0xFFFFFFFF
    return struct.pack(">I", len(data)) + ctype + data + struct.pack(">I", crc)


def png_encode(arr: np.ndarray, filter_type: int = 0) -> bytes:
    """Encode a (H, W, C) uint8 array (C in {1, 3, 4}) as a baseline PNG.

    ``filter_type`` selects the per-row predictor (0-4) — mainly so
    tests can exercise every decoder filter path; 0 is the plain
    encoding.
    """
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, ch = arr.shape
    colortype = {1: 0, 3: 2, 4: 6}[ch]
    arr = arr.astype(np.uint8)
    stride = w * ch
    flat = arr.reshape(h, stride)
    lines = bytearray()
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        cur = flat[y]
        if filter_type == 0:
            enc = cur
        elif filter_type == 1:
            left = np.concatenate([np.zeros(ch, np.uint8), cur[:-ch]])
            enc = (cur.astype(np.int16) - left).astype(np.uint8)
        elif filter_type == 2:
            enc = (cur.astype(np.int16) - prev).astype(np.uint8)
        elif filter_type == 3:
            left = np.concatenate([np.zeros(ch, np.uint8), cur[:-ch]])
            enc = (
                cur.astype(np.int16)
                - (left.astype(np.int16) + prev.astype(np.int16)) // 2
            ).astype(np.uint8)
        elif filter_type == 4:
            left = np.concatenate([np.zeros(ch, np.uint8), cur[:-ch]])
            ul = np.concatenate([np.zeros(ch, np.uint8), prev[:-ch]])
            enc = (
                cur.astype(np.int16) - _paeth(left, prev, ul).astype(np.int16)
            ).astype(np.uint8)
        else:
            raise ValueError(f"bad PNG filter type {filter_type}")
        lines.append(filter_type)
        lines.extend(enc.tobytes())
        prev = cur
    ihdr = struct.pack(">IIBBBBB", w, h, 8, colortype, 0, 0, 0)
    return (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(lines)))
        + _chunk(b"IEND", b"")
    )


# --- WAV (RIFF PCM) — the audio twin of the PNG path ----------------------


def wav_decode(payload: bytes) -> tuple[int, np.ndarray]:
    """Decode a PCM16 mono/stereo WAV to (sample_rate, (N, C) int16).

    RIFF framing is pure struct work; only uncompressed PCM16 is
    supported (format tag 1) — the profile every WAV writer can emit.
    """
    if payload is None or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    pos = 12
    rate = channels = None
    data = None
    while pos + 8 <= len(payload):
        ctype = payload[pos : pos + 4]
        (length,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        body = payload[pos + 8 : pos + 8 + length]
        pos += 8 + length + (length & 1)  # chunks are word-aligned
        if ctype == b"fmt ":
            if len(body) < 16:
                raise ValueError("WAV fmt chunk truncated")
            tag, channels, rate = struct.unpack("<HHI", body[:8])
            (bits,) = struct.unpack("<H", body[14:16])
            if tag != 1 or bits != 16:
                raise NotImplementedError(
                    f"unsupported WAV profile: format={tag} bits={bits}"
                )
        elif ctype == b"data":
            data = body
    # chunk order is not guaranteed by RIFF — both orders land here, and
    # every malformed-payload shape (missing/truncated fmt, zero
    # channels, ragged sample count) must surface as the documented
    # ValueError, not TypeError/struct.error from the reshape below
    if rate is None or channels is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    if channels < 1:
        raise ValueError("WAV fmt declares zero channels")
    if len(data) % (2 * channels):
        raise ValueError("WAV data length not a whole number of frames")
    samples = np.frombuffer(data, dtype="<i2")
    return rate, samples.reshape(-1, channels)


def wav_encode(samples: np.ndarray, sample_rate: int = 16_000) -> bytes:
    """Encode an (N, C) or (N,) int16 array as a PCM16 WAV."""
    if samples.ndim == 1:
        samples = samples[:, None]
    n, ch = samples.shape
    data = samples.astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, ch, sample_rate,
                      sample_rate * ch * 2, ch * 2, 16)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body
