"""Multimodal column conventions: image/audio/video as opaque binary.

Convention: a multimodal table carries
- ``content``: BINARY (the raw bytes — never interpreted JVM-side),
- ``meta``: STRUCT<mime STRING, size_bytes BIGINT, ...> (typed,
  prunable — queries that only need metadata never touch the bytes).

What is REAL here and tested: the Spark-side plumbing — schema,
column pruning, magic-number sniffing (JVM expressions over the binary
prefix), Arrow batch shape through ``mapInPandas``, a deterministic
byte-histogram featurizer, and pure-NumPy decoders for the
container formats that need no codec library: BMP (24/32-bit
uncompressed) for images, RIFF/WAV PCM for audio, YUV4MPEG2 for video
frame sampling.

PNG (8-bit gray/RGB(A), non-interlaced) also decodes natively: its
only 'codec' is stdlib zlib + the five scanline filters. Formats that
genuinely need codec libraries (JPEG/MP3/H.264 …) are not in this
container: ``decode_image`` falls back to PIL when importable,
otherwise an unsupported blob raises NotImplementedError at execution
time with the schema contract in the message. The mapInPandas
batching, schemas, and partition behavior are identical either way —
a codec is a per-blob drop-in.
"""

from __future__ import annotations

import struct

from pyspark.sql import DataFrame, functions as F

#: magic-number prefixes (hex) → mime
_MAGIC = {
    "89504E47": "image/png",
    "FFD8FF": "image/jpeg",
    "47494638": "image/gif",
    "52494646": "audio/wav",   # RIFF (also webp/avi — refined by sub-header)
    "494433": "audio/mpeg",
    "664C6143": "audio/flac",
    "1A45DFA3": "video/webm",
}

N_HISTOGRAM_BINS = 16


def sniff_metadata(df: DataFrame, content_col: str = "content") -> DataFrame:
    """Append ``meta`` struct from the binary prefix — pure JVM
    expressions (hex of the first 4 bytes), no Python, no full read of
    the blob when the source supports lazy binary columns."""
    prefix = F.upper(F.hex(F.substring(F.col(content_col), 1, 4)))
    mime = F.lit("application/octet-stream")
    for magic, m in reversed(_MAGIC.items()):
        mime = F.when(prefix.startswith(magic), F.lit(m)).otherwise(mime)
    return df.withColumn(
        "meta",
        F.struct(mime.alias("mime"),
                 F.length(F.col(content_col)).alias("size_bytes")))


def byte_histogram_features(df: DataFrame, content_col: str = "content",
                            id_col: str = "item_id",
                            bins: int = N_HISTOGRAM_BINS) -> DataFrame:
    """Deterministic content featurizer: normalized byte-value histogram
    via ``mapInPandas`` (Arrow batches, NumPy bincount) — the real
    decode-and-featurize plumbing with a codec-free feature."""
    import numpy as np
    import pandas as pd

    def featurize(batches):
        for pdf in batches:
            feats = []
            for blob in pdf[content_col]:
                arr = np.frombuffer(bytes(blob), dtype=np.uint8)
                hist = np.bincount(arr >> int(np.log2(256 // bins)),
                                   minlength=bins).astype(np.float64)
                total = hist.sum()
                feats.append((hist / total if total else hist).tolist())
            yield pd.DataFrame({id_col: pdf[id_col], "features": feats})

    return df.select(id_col, content_col).mapInPandas(
        featurize, schema=f"{id_col} long, features array<double>")


# ---------------------------------------------------------------------------
# pure-NumPy container parsers (no codec libraries)
# ---------------------------------------------------------------------------

def decode_bmp(data: bytes):
    """Decode an uncompressed 24/32-bit BMP (BITMAPINFOHEADER, BI_RGB).

    Returns ``(height, width, channels, pixels)`` with pixels row-major
    top-down RGB(A) bytes. Pure NumPy — the 54-byte header layout is a
    public spec; no codec needed for uncompressed DIBs.
    """
    import numpy as np

    if data[:2] != b"BM" or len(data) < 54:
        raise NotImplementedError("not an uncompressed BMP")
    pixel_off = struct.unpack_from("<I", data, 10)[0]
    width, height = struct.unpack_from("<ii", data, 18)
    bpp = struct.unpack_from("<H", data, 28)[0]
    compression = struct.unpack_from("<I", data, 30)[0]
    if compression != 0 or bpp not in (24, 32):
        raise NotImplementedError(
            f"only uncompressed 24/32-bit BMP supported (bpp={bpp}, "
            f"compression={compression})")
    channels = bpp // 8
    bottom_up = height > 0
    height = abs(height)
    stride = (width * channels + 3) & ~3
    rows = np.frombuffer(data, dtype=np.uint8,
                         count=stride * height, offset=pixel_off)
    arr = rows.reshape(height, stride)[:, :width * channels] \
              .reshape(height, width, channels)
    if bottom_up:
        arr = arr[::-1]
    # BGR(A) storage order -> RGB(A)
    arr = arr[:, :, [2, 1, 0, 3][:channels]]
    return height, width, channels, np.ascontiguousarray(arr).tobytes()


#: PNG color type -> channels (bit depth 8 only)
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def decode_png(data: bytes):
    """Decode a non-interlaced 8-bit PNG (grayscale/RGB/GA/RGBA) with
    stdlib ``zlib`` + NumPy filter reconstruction.

    Returns ``(height, width, channels, pixels)`` row-major top-down.
    The five scanline filters (None/Sub/Up/Average/Paeth) are the whole
    PNG 'codec' for these color types — public spec, no library needed.
    Palette, 16-bit, and interlaced PNGs raise NotImplementedError.
    """
    import zlib

    import numpy as np

    if data[:8] != b"\x89PNG\r\n\x1a\n":
        raise NotImplementedError("not a PNG")
    pos, ihdr, idat = 8, None, []
    while pos + 8 <= len(data):
        length, ctype = struct.unpack_from(">I4s", data, pos)
        body = data[pos + 8:pos + 8 + length]
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif ctype == b"IDAT":
            idat.append(body)
        elif ctype == b"IEND":
            break
        pos += 12 + length  # length + type + crc
    if ihdr is None or not idat:
        raise NotImplementedError("missing IHDR/IDAT chunk")
    width, height, bit_depth, color_type, _comp, _filt, interlace = ihdr
    if bit_depth != 8 or interlace != 0 or color_type not in _PNG_CHANNELS:
        raise NotImplementedError(
            f"only 8-bit non-interlaced gray/RGB(A) PNG supported "
            f"(depth={bit_depth}, color={color_type}, interlace={interlace})")
    ch = _PNG_CHANNELS[color_type]
    raw = zlib.decompress(b"".join(idat))
    stride = width * ch
    if len(raw) < height * (stride + 1):
        raise NotImplementedError("truncated IDAT stream")
    lines = np.frombuffer(raw, np.uint8,
                          count=height * (stride + 1)).reshape(height, stride + 1)
    filters, scan = lines[:, 0], lines[:, 1:]
    out = np.zeros((height, stride), np.uint8)
    prev = np.zeros(stride, np.uint8)
    zero_px = np.zeros(ch, np.int32)
    for y in range(height):
        f, row = filters[y], scan[y].astype(np.int32)
        if f == 0:
            cur = row
        elif f == 1:                      # Sub: per-channel cumsum mod 256
            cur = row.reshape(width, ch).cumsum(axis=0) & 0xFF
            cur = cur.reshape(stride)
        elif f == 2:                      # Up: whole-row vectorized
            cur = (row + prev) & 0xFF
        elif f in (3, 4):                 # Average/Paeth: left-pixel chain —
            cur = np.zeros(stride, np.int32)  # loop over PIXELS, channels
            up = prev.astype(np.int32)        # vectorized per step
            for x0 in range(0, stride, ch):
                a = cur[x0 - ch:x0] if x0 else zero_px
                b = up[x0:x0 + ch]
                if f == 3:
                    pred = (a + b) >> 1
                else:
                    c = up[x0 - ch:x0] if x0 else zero_px
                    p = a + b - c
                    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
                    pred = np.where((pa <= pb) & (pa <= pc), a,
                                    np.where(pb <= pc, b, c))
                cur[x0:x0 + ch] = (row[x0:x0 + ch] + pred) & 0xFF
        else:
            raise NotImplementedError(f"unknown PNG filter {f}")
        out[y] = cur.astype(np.uint8)
        prev = out[y]
    return height, width, ch, out.tobytes()


def decode_wav_full(data: bytes):
    """Parse a RIFF/WAVE PCM file: ``(sample_rate, n_channels,
    n_samples, pcm_bytes, audio_format, bits_per_sample)``. Supports
    integer PCM (format 1) and float32 (format 3); chunk walk per the
    public RIFF layout."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise NotImplementedError("not a RIFF/WAVE container")
    pos, fmt, pcm = 12, None, None
    while pos + 8 <= len(data):
        cid, size = data[pos:pos + 4], struct.unpack_from("<I", data, pos + 4)[0]
        body = data[pos + 8:pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            pcm = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or pcm is None:
        raise NotImplementedError("missing fmt/data chunk")
    audio_format, n_channels, sample_rate, _, block_align, bits = fmt
    if audio_format not in (1, 3):
        raise NotImplementedError(f"non-PCM wav (format={audio_format})")
    n_samples = len(pcm) // block_align if block_align else 0
    return sample_rate, n_channels, n_samples, pcm, audio_format, bits


def decode_wav(data: bytes):
    """``decode_wav_full`` minus the format fields — the original
    4-tuple contract ``(sample_rate, n_channels, n_samples, pcm)``."""
    return decode_wav_full(data)[:4]


#: sample dtype by (audio_format, bits_per_sample) — the only layouts a
#: PCM/float WAV can carry; anything else is refused, not reinterpreted.
_WAV_DTYPES = {(1, 8): "uint8", (1, 16): "int16", (1, 32): "int32",
               (3, 32): "float32", (3, 64): "float64"}


def parse_y4m(data: bytes):
    """Parse a YUV4MPEG2 stream: ``(width, height, fps_num, fps_den,
    frames)`` where frames are raw 4:2:0 planes (text header + raw
    bytes — a codec-free public container)."""
    if not data.startswith(b"YUV4MPEG2"):
        raise NotImplementedError("not a YUV4MPEG2 stream")
    nl = data.index(b"\n")
    width = height = 0
    fps_num, fps_den = 25, 1
    for tok in data[9:nl].split():
        t = tok.decode("ascii", "replace")
        if t.startswith("W"):
            width = int(t[1:])
        elif t.startswith("H"):
            height = int(t[1:])
        elif t.startswith("F"):
            num, den = t[1:].split(":")
            fps_num, fps_den = int(num), int(den)
    frame_bytes = width * height * 3 // 2  # C420
    frames, pos = [], nl + 1
    while pos < len(data):
        fnl = data.index(b"\n", pos)  # FRAME [params]\n
        if not data[pos:fnl].startswith(b"FRAME"):
            raise NotImplementedError("malformed FRAME header")
        frames.append(data[fnl + 1:fnl + 1 + frame_bytes])
        pos = fnl + 1 + frame_bytes
    return width, height, fps_num, fps_den, frames


# ---------------------------------------------------------------------------
# mapInPandas decode operators
# ---------------------------------------------------------------------------

def decode_image(df: DataFrame, content_col: str = "content",
                 id_col: str = "item_id",
                 resize: tuple[int, int] | None = None) -> DataFrame:
    """Decode images to (height, width, channels, pixels) via mapInPandas.

    BMP and 8-bit PNG decode with the built-in pure-NumPy parsers;
    other formats fall back to PIL when importable, else raise
    NotImplementedError
    (schema contract: item_id long, height int, width int, channels
    int, pixels binary). ``resize`` uses nearest-neighbor sampling for
    the built-in path (PIL's default resampling otherwise).
    """
    import numpy as np
    import pandas as pd

    def decode_one(blob: bytes):
        native = None
        if blob[:2] == b"BM":
            native = decode_bmp
        elif blob[:8] == b"\x89PNG\r\n\x1a\n":
            native = decode_png
        if native is not None:
            try:
                h, w, c, px = native(blob)
            except NotImplementedError:
                # variant the native parser rejects (palette/16-bit/
                # interlaced PNG, compressed BMP): fall through to PIL
                # like any other codec format
                native = None
        if native is None:
            try:
                from PIL import Image
            except ImportError as exc:
                raise NotImplementedError(
                    "non-BMP image needs PIL (not in this container); "
                    "schema contract: item_id long, height int, width int, "
                    "channels int, pixels binary") from exc
            import io
            arr = np.asarray(Image.open(io.BytesIO(blob)))
            h, w = arr.shape[:2]
            c = arr.shape[2] if arr.ndim == 3 else 1
            px = arr.tobytes()
        if resize:
            tw, th = resize
            arr = np.frombuffer(px, np.uint8).reshape(h, w, c)
            yi = (np.arange(th) * h // th)[:, None]
            xi = np.arange(tw) * w // tw
            arr = arr[yi, xi]
            h, w, px = th, tw, np.ascontiguousarray(arr).tobytes()
        return h, w, c, px

    def decode(batches):
        for pdf in batches:
            rows = []
            for item_id, blob in zip(pdf[id_col], pdf[content_col]):
                h, w, c, px = decode_one(bytes(blob))
                rows.append((item_id, h, w, c, px))
            yield pd.DataFrame(rows, columns=[id_col, "height", "width",
                                              "channels", "pixels"])

    return df.select(id_col, content_col).mapInPandas(
        decode, schema=f"{id_col} long, height int, width int, "
                       "channels int, pixels binary")


def decode_audio(df: DataFrame, content_col: str = "content",
                 id_col: str = "item_id",
                 target_sample_rate: int | None = None) -> DataFrame:
    """Decode RIFF/WAV PCM audio via mapInPandas: one row per clip,
    ``(item_id, sample_rate, n_channels, n_samples, pcm)``.

    ``target_sample_rate`` linearly resamples PCM (np.interp per
    channel) — the cheap-and-deterministic path; a real pipeline would
    swap in a polyphase filter, same plan shape. The sample dtype comes
    from the fmt chunk (int8/16/32 PCM or float32/64), so float WAVs
    are never reinterpreted as int16; unknown layouts raise
    NotImplementedError, as do non-WAV blobs (codec libraries not in
    this container).
    """
    import numpy as np
    import pandas as pd

    def decode(batches):
        for pdf in batches:
            rows = []
            for item_id, blob in zip(pdf[id_col], pdf[content_col]):
                rate, nch, n, pcm, afmt, bits = decode_wav_full(bytes(blob))
                if target_sample_rate and target_sample_rate != rate and n:
                    dt = _WAV_DTYPES.get((afmt, bits))
                    if dt is None:
                        raise NotImplementedError(
                            f"cannot resample wav format={afmt} bits={bits}")
                    dt = np.dtype(dt)
                    arr = np.frombuffer(pcm, dt)[:n * nch].reshape(n, nch)
                    m = int(round(n * target_sample_rate / rate))
                    t_new = np.arange(m) * (rate / target_sample_rate)
                    res = np.stack([np.interp(t_new, np.arange(n), arr[:, c])
                                    for c in range(nch)], axis=1)
                    if np.issubdtype(dt, np.integer):
                        # round-to-nearest: plain astype truncates toward
                        # zero, biasing integer PCM by up to 1 LSB
                        res = np.rint(res)
                    pcm = res.astype(dt).tobytes()
                    rate, n = target_sample_rate, m
                rows.append((item_id, rate, nch, n, pcm))
            yield pd.DataFrame(rows, columns=[id_col, "sample_rate",
                                              "n_channels", "n_samples", "pcm"])

    return df.select(id_col, content_col).mapInPandas(
        decode, schema=f"{id_col} long, sample_rate int, n_channels int, "
                       "n_samples long, pcm binary")


def sample_frames(df: DataFrame, content_col: str = "content",
                  id_col: str = "item_id", every_ms: int = 1000) -> DataFrame:
    """Sample frames every ``every_ms`` from YUV4MPEG2 video blobs via
    mapInPandas: one output row per sampled frame,
    ``(item_id, frame_idx, ts_ms, frame)`` — frame is the raw 4:2:0
    planes. Compressed containers raise NotImplementedError (no codec
    libraries in this container); the fan-out shape (one input row ->
    many frame rows) is the real pipeline contract either way.
    """
    import pandas as pd

    def sample(batches):
        for pdf in batches:
            rows = []
            for item_id, blob in zip(pdf[id_col], pdf[content_col]):
                w, h, num, den, frames = parse_y4m(bytes(blob))
                seen: set[int] = set()
                k = 0
                while True:
                    idx = (k * every_ms * num) // (1000 * den)
                    if idx >= len(frames):
                        break
                    if idx not in seen:
                        seen.add(idx)
                        ts_ms = idx * 1000 * den // num
                        rows.append((item_id, idx, ts_ms, frames[idx]))
                    k += 1
            yield pd.DataFrame(rows, columns=[id_col, "frame_idx",
                                              "ts_ms", "frame"])

    return df.select(id_col, content_col).mapInPandas(
        sample, schema=f"{id_col} long, frame_idx int, ts_ms long, frame binary")
