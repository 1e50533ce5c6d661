"""Pure-stdlib media codecs — the REAL decode path (round 7, PNG r8).

The sandbox ships no PIL/librosa/av, but three production formats are
decodable with nothing beyond ``struct``/``zlib`` + numpy: uncompressed
24-bit BMP (BITMAPINFOHEADER, the baseline Windows DIB every image tool
can emit), PCM WAV (RIFF, 8/16-bit), and — round 8 — non-interlaced
8-bit RGB/RGBA PNG (zlib inflate + full scanline unfiltering: None/
Sub/Up/Average/Paeth), by far the most common image container in real
web corpora. These are complete, real decoders — not stubs — so the
multimodal pipeline computes genuine pixel/sample statistics
in-sandbox, and richer codecs (PIL/av) slot in behind the same
``sniff``/decode interface via try-import gating
(operators/multimodal.py) exactly like the protobuf-gated streaming
twin.

Encoders are included so tests and fixtures can round-trip: a decoder
proven against its own encoder plus hand-checked golden bytes is
verifiable without binary fixtures in the repo.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

BMP_MAGIC = b"BM"
WAV_MAGIC = b"RIFF"
PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def sniff(content: bytes | None) -> str | None:
    """Identify a blob by magic bytes: 'bmp' | 'png' | 'wav' | None."""
    b = content or b""
    if b[:2] == BMP_MAGIC and len(b) >= 54:
        return "bmp"
    if b[:8] == PNG_MAGIC:
        return "png"
    if b[:4] == WAV_MAGIC and b[8:12] == b"WAVE":
        return "wav"
    return None


# ---------------------------------------------------------------------------
# BMP — uncompressed 24-bit BI_RGB, bottom-up or top-down
# ---------------------------------------------------------------------------

def decode_bmp(content: bytes) -> np.ndarray:
    """Decode an uncompressed 24-bit BMP to an (h, w, 3) uint8 RGB array.

    Layout (Microsoft DIB): 14-byte file header ('BM', file size,
    reserved, pixel-data offset), 40-byte BITMAPINFOHEADER (width,
    height signed — negative height = top-down row order), rows padded
    to 4-byte boundaries, pixels stored BGR.
    """
    if content[:2] != BMP_MAGIC:
        raise ValueError("not a BMP: missing 'BM' magic")
    (data_offset,) = struct.unpack_from("<I", content, 10)
    (header_size,) = struct.unpack_from("<I", content, 14)
    width, height = struct.unpack_from("<ii", content, 18)
    _planes, bitcount = struct.unpack_from("<HH", content, 26)
    (compression,) = struct.unpack_from("<I", content, 30)
    if header_size < 40:
        raise ValueError(f"unsupported DIB header size {header_size}")
    if bitcount != 24 or compression != 0:
        raise NotImplementedError(
            f"only uncompressed 24-bit BMP supported (got {bitcount}-bit, "
            f"compression {compression})"
        )
    top_down = height < 0
    h, w = abs(height), width
    if w <= 0 or h <= 0:
        raise ValueError(f"degenerate BMP dimensions {w}x{h}")
    stride = (w * 3 + 3) & ~3  # rows pad to 4 bytes
    need = data_offset + stride * h
    if len(content) < need:
        raise ValueError(f"truncated BMP: {len(content)} < {need} bytes")
    rows = np.frombuffer(
        content, dtype=np.uint8, count=stride * h, offset=data_offset
    ).reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    if not top_down:
        rows = rows[::-1]  # bottom-up storage → natural top-down order
    return rows[:, :, ::-1].copy()  # BGR → RGB


def encode_bmp(pixels: np.ndarray) -> bytes:
    """Encode an (h, w, 3) uint8 RGB array as an uncompressed 24-bit
    bottom-up BMP — the exact layout :func:`decode_bmp` parses."""
    arr = np.asarray(pixels, dtype=np.uint8)
    h, w, _ = arr.shape
    stride = (w * 3 + 3) & ~3
    body = np.zeros((h, stride), dtype=np.uint8)
    body[:, : w * 3] = arr[::-1, :, ::-1].reshape(h, w * 3)  # flip + RGB→BGR
    data = body.tobytes()
    file_header = struct.pack("<2sIHHI", BMP_MAGIC, 54 + len(data), 0, 0, 54)
    info_header = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data), 2835, 2835, 0, 0
    )
    return file_header + info_header + data


def image_features(pixels: np.ndarray) -> list[float]:
    """8-dim real image descriptor: (w, h, mean R, mean G, mean B,
    grayscale std, mean |vertical gradient|, mean |horizontal
    gradient|), each fixed to 6 decimals (floor(x*1e6+0.5) — the
    engine-portable rounding used across the repo). RGBA input uses the
    RGB planes (alpha is coverage, not color). Gray is the explicit
    0.299*R + 0.587*G + 0.114*B left-to-right expression — not a BLAS
    dot whose accumulation order (or FMA use) the SQL oracle could not
    reproduce — and std is the two-pass sqrt(mean((x-mean)^2)), the
    same formula an oracle writes."""
    h, w, _ = pixels.shape
    px = pixels[:, :, :3].astype(np.float64)
    gray = 0.299 * px[:, :, 0] + 0.587 * px[:, :, 1] + 0.114 * px[:, :, 2]
    gv = float(np.mean(np.abs(np.diff(gray, axis=0)))) if h > 1 else 0.0
    gh = float(np.mean(np.abs(np.diff(gray, axis=1)))) if w > 1 else 0.0
    vals = [
        float(w), float(h),
        float(px[:, :, 0].mean()), float(px[:, :, 1].mean()),
        float(px[:, :, 2].mean()),
        float(np.sqrt(np.mean((gray - gray.mean()) ** 2))), gv, gh,
    ]
    return [np.floor(v * 1e6 + 0.5) / 1e6 for v in vals]


# ---------------------------------------------------------------------------
# PNG — 8-bit RGB / RGBA, non-interlaced (round 8)
# ---------------------------------------------------------------------------

def decode_png(content: bytes) -> np.ndarray:
    """Decode a non-interlaced 8-bit RGB/RGBA PNG to an (h, w, 3|4)
    uint8 array.

    Full spec-path decode: walk chunks (IHDR → IDAT* → IEND), inflate
    the concatenated IDAT stream with stdlib zlib, then reverse the
    per-scanline filter — each row starts with a filter byte and
    filters 1 (Sub), 3 (Average), 4 (Paeth) have an in-row left
    dependency, so those rows reconstruct left-to-right; 0 (None) and
    2 (Up) vectorize whole-row. Palette/grayscale/16-bit/interlaced
    variants raise ``NotImplementedError`` (the honest format boundary,
    same stance as decode_bmp's non-24-bit branch).
    """
    if content[:8] != PNG_MAGIC:
        raise ValueError("not a PNG: missing signature")
    pos, ihdr, idat = 8, None, bytearray()
    while pos + 8 <= len(content):
        (length,) = struct.unpack_from(">I", content, pos)
        ctype = content[pos + 4: pos + 8]
        body = content[pos + 8: pos + 8 + length]
        if len(body) < length:
            raise ValueError(f"truncated PNG chunk {ctype!r}")
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            break
        pos += 12 + length  # length + type + data + crc
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT chunk")
    w, h, depth, color, comp, filt, interlace = ihdr
    if depth != 8 or color not in (2, 6):
        raise NotImplementedError(
            f"only 8-bit RGB/RGBA PNG supported (depth {depth}, color type "
            f"{color})"
        )
    if comp != 0 or filt != 0 or interlace != 0:
        raise NotImplementedError(
            f"unsupported PNG compression/filter/interlace method "
            f"({comp}/{filt}/{interlace})"
        )
    if w <= 0 or h <= 0:
        raise ValueError(f"degenerate PNG dimensions {w}x{h}")
    bpp = 3 if color == 2 else 4
    stride = w * bpp
    raw = zlib.decompress(bytes(idat))
    if len(raw) != h * (1 + stride):
        raise ValueError(
            f"PNG pixel stream is {len(raw)} bytes, expected {h * (1 + stride)}"
        )
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    for r in range(h):
        f = raw[r * (1 + stride)]
        cur = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=r * (1 + stride) + 1
        ).astype(np.int32)
        if f == 0:
            pass
        elif f == 2:  # Up
            cur = (cur + prev) & 0xFF
        elif f == 1:  # Sub: left-neighbor prefix dependency
            for x in range(bpp, stride):
                cur[x] = (cur[x] + cur[x - bpp]) & 0xFF
        elif f == 3:  # Average
            for x in range(stride):
                left = cur[x - bpp] if x >= bpp else 0
                cur[x] = (cur[x] + ((left + prev[x]) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            for x in range(stride):
                a = cur[x - bpp] if x >= bpp else 0
                b = prev[x]
                c = prev[x - bpp] if x >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                cur[x] = (cur[x] + pred) & 0xFF
        else:
            raise ValueError(f"invalid PNG filter type {f}")
        out[r] = cur
        prev = cur
    return out.reshape(h, w, bpp)


def encode_png(pixels: np.ndarray, level: int = 9) -> bytes:
    """Encode an (h, w, 3|4) uint8 array as a non-interlaced 8-bit
    RGB/RGBA PNG (filter 0 scanlines, single IDAT) — the exact layout
    :func:`decode_png` parses. Fixed zlib level so the bytes are
    deterministic for a given input."""
    arr = np.asarray(pixels, dtype=np.uint8)
    h, w, ch = arr.shape
    if ch not in (3, 4):
        raise ValueError(f"expected 3 or 4 channels, got {ch}")
    scanlines = bytearray()
    for r in range(h):
        scanlines.append(0)  # filter: None
        scanlines += arr[r].tobytes()
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2 if ch == 3 else 6, 0, 0, 0)

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body)) + ctype + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    return (
        PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(scanlines), level))
        + chunk(b"IEND", b"")
    )


# ---------------------------------------------------------------------------
# WAV — RIFF PCM, 8-bit unsigned / 16-bit signed, any channel count
# ---------------------------------------------------------------------------

def decode_wav(content: bytes) -> tuple[int, np.ndarray]:
    """Decode a PCM WAV to (sample_rate, (n_frames, n_channels) float64
    array normalized to [-1, 1]). Walks RIFF chunks directly (stdlib
    ``wave`` refuses some well-formed files with extra chunks)."""
    if content[:4] != WAV_MAGIC or content[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(content):
        cid, size = struct.unpack_from("<4sI", content, pos)
        body = content[pos + 8: pos + 8 + size]
        if cid == b"fmt ":
            if len(body) < 16:
                raise ValueError(f"malformed fmt chunk ({len(body)} bytes)")
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks pad to even offsets
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_format, n_channels, sample_rate, _, _, bits = fmt
    if audio_format != 1:
        raise NotImplementedError(f"only PCM WAV supported (format {audio_format})")
    if n_channels == 0:
        raise ValueError("malformed WAV: fmt chunk declares 0 channels")
    if bits == 16:
        samples = np.frombuffer(data, dtype="<i2").astype(np.float64) / 32768.0
    elif bits == 8:
        samples = (np.frombuffer(data, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    else:
        raise NotImplementedError(f"unsupported PCM width {bits}")
    n_frames = len(samples) // n_channels
    return sample_rate, samples[: n_frames * n_channels].reshape(n_frames, n_channels)


def encode_wav(sample_rate: int, samples: np.ndarray) -> bytes:
    """Encode an (n_frames, n_channels) float array in [-1, 1] as
    16-bit PCM WAV — the exact layout :func:`decode_wav` parses."""
    arr = np.asarray(samples, dtype=np.float64)
    if arr.ndim == 1:
        arr = arr[:, None]  # 1-D input → mono column
    n_frames, n_channels = arr.shape
    pcm = np.clip(np.round(arr * 32767.0), -32768, 32767).astype("<i2").tobytes()
    fmt = struct.pack(
        "<HHIIHH", 1, n_channels, sample_rate,
        sample_rate * n_channels * 2, n_channels * 2, 16,
    )
    chunks = (
        b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(pcm)) + pcm
    )
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def audio_features(sample_rate: int, frames: np.ndarray) -> list[float]:
    """8-dim real audio descriptor: (sample rate, n_frames, duration s,
    RMS, peak |amplitude|, zero-crossing rate, mean, std) over the
    channel-mean signal, fixed to 6 decimals."""
    mono = frames.mean(axis=1) if frames.ndim == 2 else frames
    n = len(mono)
    zcr = float(np.mean(np.signbit(mono[1:]) != np.signbit(mono[:-1]))) if n > 1 else 0.0
    vals = [
        float(sample_rate), float(n),
        n / sample_rate if sample_rate else 0.0,
        float(np.sqrt(np.mean(mono**2))) if n else 0.0,
        float(np.max(np.abs(mono))) if n else 0.0,
        zcr,
        float(mono.mean()) if n else 0.0,
        float(mono.std()) if n else 0.0,
    ]
    return [np.floor(v * 1e6 + 0.5) / 1e6 for v in vals]


def average_hash(pixels: np.ndarray, hash_size: int = 8) -> int:
    """Perceptual aHash of an (h, w, c) uint8 image: grayscale
    (ITU-R 601 integer weights — no float luminance, so the hash is
    bit-stable everywhere), average-pool to hash_size², threshold at
    the mean, pack row-major into a hash_size²-bit int. Visually
    identical images (re-encodes, codec changes) hash equal; small
    edits flip few bits, so near-dup = small Hamming distance over the
    64-bit space — the image-side analogue of SimHash.
    """
    gray = (
        299 * pixels[:, :, 0].astype(np.int64)
        + 587 * pixels[:, :, 1].astype(np.int64)
        + 114 * pixels[:, :, 2].astype(np.int64)
    ) if pixels.ndim == 3 and pixels.shape[2] >= 3 else (
        1000 * pixels.reshape(pixels.shape[0], pixels.shape[1], -1)[:, :, 0]
        .astype(np.int64)
    )
    h, w = gray.shape
    # integer box-pool: split rows/cols into hash_size nearly-equal bins
    re = np.linspace(0, h, hash_size + 1).astype(np.int64)
    ce = np.linspace(0, w, hash_size + 1).astype(np.int64)
    cells = np.empty((hash_size, hash_size), dtype=np.float64)
    for i in range(hash_size):
        for j in range(hash_size):
            block = gray[re[i]:max(re[i + 1], re[i] + 1),
                         ce[j]:max(ce[j + 1], ce[j] + 1)]
            cells[i, j] = block.mean()
    bits = (cells > cells.mean()).ravel()
    out = 0
    for b in bits:
        out = (out << 1) | int(b)
    return out
