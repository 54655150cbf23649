"""Pure-stdlib/numpy media codec cores for the multimodal stages.

These are the REAL math behind ``resize_images`` / ``embed_media`` /
``sample_frames`` in environments without imaging libraries: PNG is
decoded/encoded with ``zlib`` + the spec's scanline filters, WAV PCM
with struct reads, Y4M (YUV4MPEG2) and animated GIF by walking their
public container layouts. Optional libraries (Pillow, PyAV) extend
FORMAT coverage in :mod:`multimodal` but are never required for these
paths — the functions here run anywhere Python + numpy run.

Scope (documented, asserted by unit tests):

- PNG: bit depth 8, colour types 0 (gray), 2 (RGB), 4 (gray+alpha),
  6 (RGBA); all five scanline filters; no Adam7 interlace (-> None).
- WAV: PCM integer 8/16/32-bit via the ``fmt ``/``data`` chunk walk.
- Y4M: YUV4MPEG2 headers with W/H/F tags, 4:2:0 / 4:2:2 / 4:4:4 frame
  sizes, per-frame FRAME markers.
- GIF: 87a/89a block walk — frame count + per-frame delays come from
  the Graphic Control Extensions WITHOUT LZW-decoding pixel data
  (sub-block lengths let us skip image payloads), so frame timing is
  real even though pixels are never materialized.

Everything is deterministic: fixed zlib level, integer arithmetic for
timestamps, a single documented nearest-neighbour convention.

No counterpart in the reference repo (its ETL surface has no media
columns); included per the brief's training-data-pipeline extension.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

# ---------------------------------------------------------------------------
# PNG
# ---------------------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# colour type -> samples per pixel
_PNG_SAMPLES = {0: 1, 2: 3, 4: 2, 6: 4}


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def png_encode(arr: np.ndarray) -> bytes:
    """Encode an ``(H, W)`` grayscale or ``(H, W, C)`` (C in 1/2/3/4)
    uint8 array as a PNG: filter 0 scanlines, one zlib stream at a fixed
    compression level so the output is byte-deterministic."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    if a.ndim != 3 or a.shape[2] not in (1, 2, 3, 4):
        raise ValueError(f"png_encode expects HxW[xC<=4] uint8, got {a.shape}")
    h, w, c = a.shape
    colour = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, colour, 0, 0, 0)
    raw = b"".join(b"\x00" + a[y].tobytes() for y in range(h))
    idat = zlib.compress(raw, 6)
    return _PNG_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


def _unfilter(raw: bytes, h: int, w: int, spp: int) -> np.ndarray | None:
    """Reverse the PNG scanline filters (types 0-4) into an (h, w*spp)
    uint8 array. Vectorized across each row; the Paeth/up/avg recurrences
    run per-row with numpy ops on the previous reconstructed row."""
    stride = w * spp
    if len(raw) < h * (stride + 1):
        return None
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    pos = 0
    for y in range(h):
        ftype = raw[pos]
        line = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=pos + 1).copy()
        pos += stride + 1
        if ftype == 0:
            cur = line
        elif ftype == 2:  # Up
            cur = line + prev
        elif ftype == 1:  # Sub — sequential in pixel units, vector over samples
            cur = line
            for x in range(spp, stride):
                cur[x] = (int(cur[x]) + int(cur[x - spp])) & 0xFF
        elif ftype == 3:  # Average
            cur = line
            for x in range(stride):
                left = int(cur[x - spp]) if x >= spp else 0
                cur[x] = (int(cur[x]) + ((left + int(prev[x])) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            cur = line
            for x in range(stride):
                left = int(cur[x - spp]) if x >= spp else 0
                up = int(prev[x])
                ul = int(prev[x - spp]) if x >= spp else 0
                p = left + up - ul
                pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                pred = left if (pa <= pb and pa <= pc) else (up if pb <= pc else ul)
                cur[x] = (int(cur[x]) + pred) & 0xFF
        else:
            return None
        out[y] = cur
        prev = out[y]
    return out


def png_decode(payload: bytes | None) -> np.ndarray | None:
    """Decode a PNG payload to an ``(H, W, C)`` uint8 array, or None
    when it isn't a PNG this decoder covers (see module scope)."""
    if not payload or payload[:8] != _PNG_SIG:
        return None
    pos, w = 8, None
    idat = bytearray()
    h = spp = None
    try:
        while pos + 8 <= len(payload):
            (clen,) = struct.unpack_from(">I", payload, pos)
            tag = payload[pos + 4 : pos + 8]
            body = payload[pos + 8 : pos + 8 + clen]
            pos += 12 + clen
            if tag == b"IHDR":
                w, h, depth, colour, _comp, _filt, interlace = struct.unpack(
                    ">IIBBBBB", body
                )
                if depth != 8 or interlace != 0 or colour not in _PNG_SAMPLES:
                    return None
                spp = _PNG_SAMPLES[colour]
            elif tag == b"IDAT":
                idat += body
            elif tag == b"IEND":
                break
        if w is None or not idat:
            return None
        raw = zlib.decompress(bytes(idat))
        flat = _unfilter(raw, h, w, spp)
        if flat is None:
            return None
        return flat.reshape(h, w, spp)
    except Exception:
        return None


def resize_nearest(arr: np.ndarray, target_width: int, target_height: int) -> np.ndarray:
    """Nearest-neighbour resize with the pixel-center convention
    ``src = floor((dst + 0.5) * src_size / dst_size)`` (what PIL's
    NEAREST and OpenCV INTER_NEAREST_EXACT use) — pure numpy fancy
    indexing, deterministic."""
    h, w = arr.shape[:2]
    ys = np.minimum(((np.arange(target_height) + 0.5) * h / target_height).astype(np.int64), h - 1)
    xs = np.minimum(((np.arange(target_width) + 0.5) * w / target_width).astype(np.int64), w - 1)
    return arr[ys][:, xs]


def to_rgb(arr: np.ndarray) -> np.ndarray:
    """Normalize any decoded (H, W, C) array to 3-channel RGB: gray is
    broadcast, alpha is dropped (training pipelines consume tensors, not
    compositing stacks)."""
    c = arr.shape[2]
    if c == 1:
        return np.repeat(arr, 3, axis=2)
    if c == 2:  # gray + alpha
        return np.repeat(arr[:, :, :1], 3, axis=2)
    return arr[:, :, :3]


# ---------------------------------------------------------------------------
# WAV (PCM)
# ---------------------------------------------------------------------------


def wav_decode(payload: bytes | None) -> tuple[int, int, np.ndarray] | None:
    """Decode integer-PCM WAV to ``(sample_rate, channels, samples)``
    where ``samples`` is float64 in [-1, 1], shape (frames, channels).
    Returns None for non-WAV / non-integer-PCM payloads."""
    if not payload or len(payload) < 44:
        return None
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        return None
    fmt = data = None
    i = 12
    while i + 8 <= len(payload):
        cid = payload[i : i + 4]
        (clen,) = struct.unpack_from("<I", payload, i + 4)
        body = payload[i + 8 : i + 8 + clen]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        i += 8 + clen + (clen & 1)
    if fmt is None or data is None or len(fmt) < 16:
        return None
    audio_fmt, channels, rate, _brate, _align, bits = struct.unpack_from("<HHIIHH", fmt)
    if audio_fmt != 1 or channels < 1 or bits not in (8, 16, 32):
        return None
    if bits == 8:  # unsigned
        x = np.frombuffer(data, dtype=np.uint8).astype(np.float64)
        x = (x - 128.0) / 128.0
    else:
        dt = np.int16 if bits == 16 else np.int32
        x = np.frombuffer(data[: len(data) - len(data) % (bits // 8)], dtype=dt)
        x = x.astype(np.float64) / float(2 ** (bits - 1))
    frames = len(x) // channels
    return rate, channels, x[: frames * channels].reshape(frames, channels)


def wav_encode(samples: np.ndarray, sample_rate: int) -> bytes:
    """Encode float samples in [-1, 1] (frames[, channels]) as PCM16 WAV."""
    s = np.asarray(samples, dtype=np.float64)
    if s.ndim == 1:
        s = s[:, None]
    pcm = np.clip(np.round(s * 32767.0), -32768, 32767).astype("<i2").tobytes()
    channels = s.shape[1]
    byte_rate = sample_rate * channels * 2
    fmt = struct.pack("<HHIIHH", 1, channels, sample_rate, byte_rate, channels * 2, 16)
    return (
        b"RIFF"
        + struct.pack("<I", 36 + len(pcm))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<I", 16)
        + fmt
        + b"data"
        + struct.pack("<I", len(pcm))
        + pcm
    )


# ---------------------------------------------------------------------------
# Y4M (YUV4MPEG2)
# ---------------------------------------------------------------------------


def y4m_parse(payload: bytes | None) -> dict | None:
    """Parse a YUV4MPEG2 stream header + frame markers. Returns
    ``{width, height, fps_num, fps_den, n_frames, frame_offsets}`` or
    None. Frame payload size follows the colourspace tag (C420* ->
    w*h*3/2, C422 -> w*h*2, C444 -> w*h*3; default 420 per spec)."""
    if not payload or not payload.startswith(b"YUV4MPEG2"):
        return None
    nl = payload.find(b"\n")
    if nl < 0:
        return None
    width = height = None
    fps_num, fps_den = 30, 1
    subsample = "420"
    for tag in payload[9:nl].split(b" "):
        if not tag:
            continue
        k, v = tag[:1], tag[1:]
        try:
            if k == b"W":
                width = int(v)
            elif k == b"H":
                height = int(v)
            elif k == b"F":
                num, den = v.split(b":")
                fps_num, fps_den = int(num), int(den)
            elif k == b"C":
                subsample = v.decode("ascii", "replace")[:3]
        except ValueError:
            return None
    if not width or not height or fps_num <= 0 or fps_den <= 0:
        return None
    if subsample.startswith("420"):
        fsize = width * height * 3 // 2
    elif subsample.startswith("422"):
        fsize = width * height * 2
    elif subsample.startswith("444"):
        fsize = width * height * 3
    else:
        return None
    offsets = []
    pos = nl + 1
    while pos < len(payload):
        if payload[pos : pos + 5] != b"FRAME":
            return None
        fnl = payload.find(b"\n", pos)
        if fnl < 0:
            return None
        offsets.append(fnl + 1)
        pos = fnl + 1 + fsize
    return {
        "width": width,
        "height": height,
        "fps_num": fps_num,
        "fps_den": fps_den,
        "n_frames": len(offsets),
        "frame_offsets": offsets,
        "frame_size": fsize,
    }


def y4m_encode(
    width: int,
    height: int,
    n_frames: int,
    fps_num: int = 30,
    fps_den: int = 1,
    fill: int = 0,
) -> bytes:
    """Build a valid 4:2:0 YUV4MPEG2 stream with constant-fill frames
    (for tests and oracle-predictable query payloads)."""
    header = f"YUV4MPEG2 W{width} H{height} F{fps_num}:{fps_den} Ip A1:1 C420\n"
    frame = b"FRAME\n" + bytes([fill & 0xFF]) * (width * height * 3 // 2)
    return header.encode("ascii") + frame * n_frames


# ---------------------------------------------------------------------------
# GIF (frame timing without LZW decode)
# ---------------------------------------------------------------------------


def gif_frame_delays(payload: bytes | None) -> list[int] | None:
    """Walk a GIF87a/89a block structure and return per-frame delays in
    MILLISECONDS (GIF stores centiseconds). Pixel data is skipped via
    the length-prefixed sub-block chain — no LZW decode needed, so this
    is a real container parse that works on any spec-conforming GIF."""
    if not payload or payload[:6] not in (b"GIF87a", b"GIF89a") or len(payload) < 13:
        return None
    flags = payload[10]
    pos = 13
    if flags & 0x80:  # global colour table
        pos += 3 * (2 << (flags & 0x07))
    delays: list[int] = []
    pending_delay = 0

    def _skip_subblocks(p: int) -> int:
        while p < len(payload):
            n = payload[p]
            p += 1
            if n == 0:
                return p
            p += n
        return p

    try:
        while pos < len(payload):
            b = payload[pos]
            if b == 0x3B:  # trailer
                break
            if b == 0x21:  # extension
                label = payload[pos + 1]
                if label == 0xF9 and payload[pos + 2] >= 4:  # GCE
                    pending_delay = (
                        int.from_bytes(payload[pos + 4 : pos + 6], "little") * 10
                    )
                pos = _skip_subblocks(pos + 2)
            elif b == 0x2C:  # image descriptor
                lflags = payload[pos + 9]
                pos += 10
                if lflags & 0x80:
                    pos += 3 * (2 << (lflags & 0x07))
                pos += 1  # LZW minimum code size
                pos = _skip_subblocks(pos)
                delays.append(pending_delay)
                pending_delay = 0
            else:
                return None
    except IndexError:
        return None
    return delays if delays else None


def gif_encode_frames(width: int, height: int, delays_ms: list[int]) -> bytes:
    """Build a minimal animated GIF89a with the given per-frame delays
    (1x1-codebook LZW: each frame is a valid clear+EOI stream, pixels
    all index 0 — enough for real container/timing parses in tests)."""
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", width, height)
    out += bytes([0x80, 0, 0])  # GCT flag, 2-entry table
    out += bytes([0, 0, 0, 255, 255, 255])  # colours
    npix = width * height
    for d in delays_ms:
        out += b"\x21\xf9\x04\x00" + struct.pack("<H", max(0, d) // 10) + b"\x00\x00"
        out += b"\x2c" + struct.pack("<HHHH", 0, 0, width, height) + b"\x00"
        # LZW min code size 2 (3-bit codes, clear=4, eoi=5). A clear
        # code precedes EVERY literal so the decoder's table never grows
        # and the code width stays 3 bits — valid for any frame size.
        bits = [c for _ in range(npix) for c in (4, 0)] + [5]
        acc = n = 0
        data = bytearray()
        for code in bits:
            acc |= code << n
            n += 3
            while n >= 8:
                data.append(acc & 0xFF)
                acc >>= 8
                n -= 8
        if n:
            data.append(acc & 0xFF)
        out += bytes([2])
        for i in range(0, len(data), 255):
            blk = data[i : i + 255]
            out += bytes([len(blk)]) + blk
        out += b"\x00"
    out += b"\x3b"
    return bytes(out)
