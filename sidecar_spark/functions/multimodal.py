"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched pandas
functions over ``mapInPandas``.

Decoder seam (three tiers, resolved per call):
1. optional libraries — PIL for images, soundfile for audio — used
   automatically when importable;
2. stdlib fallbacks that really decode the common container formats:
   PNG (zlib inflate + scanline unfiltering, 8-bit gray/RGB/RGBA,
   non-interlaced) and WAV (``wave`` module, PCM 8/16-bit);
3. ``fake=True`` — a deterministic pseudo-decoder derived from the
   payload hash, for plumbing tests with arbitrary byte payloads.

So the non-fake path works out of the box on PNG/WAV even in minimal
containers, upgrades itself when PIL/soundfile exist, and raises
``NotImplementedError`` only for formats none of the available tiers
can handle. Everything Spark-side — schema handling, partition
sizing, UDF signatures, Arrow batch shapes — is identical across
tiers.
"""

from __future__ import annotations

import hashlib
import io
import struct
import zlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

try:  # tier-1 image decoder (optional)
    from PIL import Image as _PILImage  # type: ignore
except ImportError:  # pragma: no cover - env-dependent
    _PILImage = None

try:  # tier-1 audio decoder (optional)
    import soundfile as _soundfile  # type: ignore
except ImportError:  # pragma: no cover - env-dependent
    _soundfile = None

# Typed metadata struct carried alongside every media column
MEDIA_META_SCHEMA = T.StructType([
    T.StructField("media_type", T.StringType()),   # image | audio | video
    T.StructField("format", T.StringType()),       # png, wav, ...
    T.StructField("n_bytes", T.LongType()),
    T.StructField("checksum", T.StringType()),     # md5 hex of payload
])

IMAGE_FEATURES_SCHEMA = (
    "doc_id long, n_bytes long, checksum string, "
    "width int, height int, mean_luma double"
)

AUDIO_FEATURES_SCHEMA = (
    "doc_id long, n_bytes long, checksum string, "
    "sample_rate int, n_samples long, rms double"
)


_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
# PNG color type → samples per pixel (8-bit, non-interlaced support)
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def _png_decode_array(payload: bytes):
    """Pure-stdlib PNG decode → (HxWxch uint8 array, color type).

    Handles the mainstream subset: 8-bit depth, grayscale / RGB /
    gray+alpha / RGBA, non-interlaced — zlib-inflates the IDAT stream
    and undoes the per-scanline filters (None/Sub/Up/Average/Paeth,
    RFC 2083 §6) with numpy. Luma is Rec.601 over the color channels,
    alpha ignored, normalized to [0, 1]."""
    import numpy as np

    if payload[:8] != _PNG_MAGIC:
        raise ValueError("not a PNG payload")
    pos, idat, ihdr = 8, [], None
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos:pos + 4])
        ctype = payload[pos + 4:pos + 8]
        data = payload[pos + 8:pos + 8 + length]
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"IEND":
            break
        pos += 12 + length  # length + type + data + crc
    if ihdr is None or not idat:
        raise ValueError("truncated PNG")
    width, height, depth, color, _comp, _filt, interlace = ihdr
    if depth != 8 or interlace != 0 or color not in _PNG_CHANNELS:
        raise NotImplementedError(
            f"PNG subset decoder handles 8-bit non-interlaced "
            f"gray/RGB(A); got depth={depth} color={color} "
            f"interlace={interlace}")
    ch = _PNG_CHANNELS[color]
    stride = width * ch
    raw = zlib.decompress(b"".join(idat))
    if len(raw) != (stride + 1) * height:
        raise ValueError("PNG scanline payload size mismatch")
    out = np.empty((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(height):
        row = np.frombuffer(
            raw, dtype=np.uint8, count=stride,
            offset=y * (stride + 1) + 1).copy()
        f = raw[y * (stride + 1)]
        if f == 1:      # Sub
            for x in range(ch, stride):
                row[x] = (int(row[x]) + int(row[x - ch])) & 0xFF
        elif f == 2:    # Up
            row = (row.astype(np.int16) + prev) % 256
            row = row.astype(np.uint8)
        elif f == 3:    # Average
            for x in range(stride):
                left = int(row[x - ch]) if x >= ch else 0
                row[x] = (int(row[x])
                          + ((left + int(prev[x])) >> 1)) & 0xFF
        elif f == 4:    # Paeth
            for x in range(stride):
                a = int(row[x - ch]) if x >= ch else 0
                b, c = int(prev[x]), (int(prev[x - ch]) if x >= ch else 0)
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                row[x] = (int(row[x]) + pred) & 0xFF
        elif f != 0:
            raise ValueError(f"unknown PNG filter {f}")
        out[y] = row
        prev = out[y]
    px = out.reshape(height, width, ch)
    return px, color


def _png_decode(payload: bytes):
    """Summary decode → (width, height, mean_luma in [0,1]) — the
    original feature-level API, now over the array decoder."""
    px, color = _png_decode_array(payload)
    h, w = px.shape[0], px.shape[1]
    return int(w), int(h), float(_png_luma(px, color).mean() / 255.0)


def _png_luma(px, color):
    import numpy as np  # noqa: F811

    fpx = px.astype("float64")
    if color in (0, 4):          # gray / gray+alpha
        return fpx[:, :, 0]
    return (0.299 * fpx[:, :, 0] + 0.587 * fpx[:, :, 1]
            + 0.114 * fpx[:, :, 2])


def decode_image_array(payload: bytes):
    """Pure-stdlib PNG decode to PIXELS → HxW uint8 luma array (the
    array-level twin of the (w, h, mean) summary decoder) — feeds the
    real resize path."""
    px, color = _png_decode_array(payload)
    return _png_luma(px, color).round().astype("uint8")


def encode_png_gray(arr) -> bytes:
    """Encode an HxW uint8 array as an 8-bit grayscale PNG (filter 0
    rows, one zlib stream) — the encoder twin that lets the real
    resize path emit spec-valid output payloads."""
    import numpy as np

    a = np.ascontiguousarray(arr, dtype=np.uint8)
    h, w = a.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    raw = b"".join(b"\x00" + a[y].tobytes() for y in range(h))

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + ctype + data
                + struct.pack(">I", zlib.crc32(ctype + data)))

    return (_PNG_MAGIC + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw))
            + chunk(b"IEND", b""))


def _wav_decode(payload: bytes):
    """Pure-stdlib WAV decode → (sample_rate, n_samples, rms) via the
    ``wave`` module; RMS over all channels, normalized to [0, 1] of
    full scale (PCM 8-bit unsigned / 16-bit signed)."""
    import numpy as np

    with wave_open(io.BytesIO(payload)) as w:
        rate, nframes = w.getframerate(), w.getnframes()
        sampwidth, nch = w.getsampwidth(), w.getnchannels()
        frames = w.readframes(nframes)
    if sampwidth == 2:
        x = np.frombuffer(frames, dtype="<i2").astype(np.float64) / 32768.0
    elif sampwidth == 1:
        x = (np.frombuffer(frames, dtype=np.uint8)
             .astype(np.float64) - 128.0) / 128.0
    else:
        raise NotImplementedError(
            f"WAV subset decoder handles PCM 8/16-bit; got "
            f"sampwidth={sampwidth}")
    rms = float(np.sqrt((x * x).mean())) if len(x) else 0.0
    del nch  # rms is over the interleaved stream; channels fold in
    return int(rate), int(nframes), rms


def wave_open(fh):
    import wave

    return wave.open(fh, "rb")


def decode_image(payload: bytes, fake: bool = False):
    """Decode an image payload → (width, height, mean_luma).

    Non-fake path: PIL when importable (any format PIL knows), else
    the stdlib PNG subset decoder; other formats raise
    ``NotImplementedError``. ``fake=True`` derives deterministic
    pseudo-dimensions from the payload hash so plumbing is testable
    with arbitrary bytes."""
    if not fake:
        if _PILImage is not None:
            img = _PILImage.open(io.BytesIO(payload))
            gray = img.convert("L")
            import numpy as np
            arr = np.asarray(gray, dtype=np.float64)
            return img.width, img.height, float(arr.mean() / 255.0)
        if payload[:8] == _PNG_MAGIC:
            return _png_decode(payload)
        raise NotImplementedError(
            "no image library importable and payload is not PNG "
            "(stdlib tier handles PNG only) — install PIL or pass "
            "fake=True for plumbing tests")
    h = hashlib.md5(payload).digest()
    width = 64 + h[0] % 192
    height = 64 + h[1] % 192
    mean_luma = (h[2] * 256 + h[3]) / 65535.0
    return width, height, mean_luma


def decode_audio(payload: bytes, fake: bool = False):
    """Decode an audio payload → (sample_rate, n_samples, rms).

    Non-fake path: soundfile when importable, else the stdlib WAV
    decoder for RIFF/WAVE payloads; other formats raise
    ``NotImplementedError``. ``fake=True`` is the hash-derived
    pseudo-decoder."""
    if not fake:
        if _soundfile is not None:
            import numpy as np
            data, rate = _soundfile.read(io.BytesIO(payload),
                                         dtype="float64")
            n = data.shape[0]
            rms = float(np.sqrt((data * data).mean())) if n else 0.0
            return int(rate), int(n), rms
        if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
            return _wav_decode(payload)
        raise NotImplementedError(
            "no audio library importable and payload is not WAV "
            "(stdlib tier handles WAV only) — install soundfile or "
            "pass fake=True for plumbing tests")
    h = hashlib.md5(payload).digest()
    sample_rate = (8000, 16000, 22050, 44100)[h[0] % 4]
    n_samples = 1000 + int.from_bytes(h[1:3], "big")
    rms = h[3] / 255.0
    return sample_rate, n_samples, rms


def synthesize_png(width: int, height: int, value: int) -> bytes:
    """Deterministic PNG synthesis (8-bit grayscale, constant fill,
    filter 0): a real, spec-valid container the stdlib decoder (or
    PIL) decodes bit-exactly — lets pipelines exercise the NON-fake
    decode path with payloads whose features are computable in plain
    SQL (mean_luma == value/255)."""
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    row = b"\x00" + bytes([value & 0xFF]) * width

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + ctype + data
                + struct.pack(">I", zlib.crc32(ctype + data)))

    return (_PNG_MAGIC + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(row * height))
            + chunk(b"IEND", b""))


def synthesize_wav(n_samples: int, rate: int, amp_int: int) -> bytes:
    """Deterministic WAV synthesis (mono PCM16, constant amplitude
    ``amp_int`` counts): rms == amp_int/32768 exactly, so real-decode
    outputs are SQL-checkable."""
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(struct.pack("<h", amp_int) * n_samples)
    return buf.getvalue()


def attach_media_meta(df: DataFrame, binary_col: str, media_type: str,
                      fmt: str) -> DataFrame:
    """Add the typed metadata struct for a binary media column —
    pure column expressions (codegen'd, no Python)."""
    payload = F.col(binary_col)
    return df.withColumn(
        "media_meta",
        F.struct(
            F.lit(media_type).alias("media_type"),
            F.lit(fmt).alias("format"),
            F.octet_length(payload).cast("long").alias("n_bytes"),
            F.md5(payload).alias("checksum"),
        ),
    )


def extract_image_features(df: DataFrame, binary_col: str = "payload",
                           id_col: str = "doc_id",
                           fake: bool = True) -> DataFrame:
    """Image feature extraction over mapInPandas: Arrow-batched, one
    pandas DataFrame per partition batch. Partitioning: inherits the
    scan's partitions; for 100 TB media, repartition upstream so a
    batch of payloads fits executor memory (maxPartitionBytes tuning),
    not here."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf[binary_col]
            decoded = [decode_image(bytes(p), fake=fake) for p in payloads]
            yield pd.DataFrame({
                "doc_id": pdf[id_col].values,
                "n_bytes": payloads.map(len).astype("int64"),
                "checksum": payloads.map(
                    lambda b: hashlib.md5(bytes(b)).hexdigest()),
                "width": [d[0] for d in decoded],
                "height": [d[1] for d in decoded],
                "mean_luma": [d[2] for d in decoded],
            })

    return df.select(id_col, binary_col).mapInPandas(
        batches, schema=IMAGE_FEATURES_SCHEMA)


def extract_audio_features(df: DataFrame, binary_col: str = "payload",
                           id_col: str = "doc_id",
                           fake: bool = True) -> DataFrame:
    """Audio feature extraction over mapInPandas — same Arrow-batched
    shape as extract_image_features with the audio stub decoder."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf[binary_col]
            decoded = [decode_audio(bytes(p), fake=fake) for p in payloads]
            yield pd.DataFrame({
                "doc_id": pdf[id_col].values,
                "n_bytes": payloads.map(len).astype("int64"),
                "checksum": payloads.map(
                    lambda b: hashlib.md5(bytes(b)).hexdigest()),
                "sample_rate": [d[0] for d in decoded],
                "n_samples": [d[1] for d in decoded],
                "rms": [d[2] for d in decoded],
            })

    return df.select(id_col, binary_col).mapInPandas(
        batches, schema=AUDIO_FEATURES_SCHEMA)


def resize_images(df: DataFrame, binary_col: str = "payload",
                  target: int = 224, fake: bool = True) -> DataFrame:
    """Resize: output schema mirrors input with a resized payload
    column.  The REAL path decodes PNG payloads to luma pixels,
    nearest-neighbor resamples to target x target (src index =
    floor(i * src / target)), and re-encodes grayscale PNG — fully
    stdlib.  The fake path passes bytes through (plumbing tests with
    arbitrary payloads)."""

    def _resize_one(payload: bytes) -> bytes:
        import numpy as np

        a = decode_image_array(bytes(payload))
        h, w = a.shape
        ys = (np.arange(target) * h) // target
        xs = (np.arange(target) * w) // target
        return encode_png_gray(a[np.ix_(ys, xs)])

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            pdf = pdf.copy()
            if fake:
                pdf["resized"] = pdf[binary_col]
            else:
                pdf["resized"] = [_resize_one(p) for p in pdf[binary_col]]
            pdf["target_size"] = target
            yield pdf

    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    ) + ", resized binary, target_size int"
    return df.mapInPandas(batches, schema=out_schema)


def sample_video_frames(df: DataFrame, binary_col: str = "payload",
                        every_n: int = 30, fake: bool = True) -> DataFrame:
    """Frame sampling: one row in → N frame rows out (flat-map
    shape).  The REAL path decodes animated GIFs (decode_gif_frames)
    and keeps every n-th decoded frame; the fake path derives a
    deterministic frame count from the payload hash for arbitrary
    bytes."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for _, row in pdf.iterrows():
                payload = bytes(row[binary_col])
                if fake:
                    digest = hashlib.md5(payload).hexdigest()
                    n_frames = 1 + int(digest[:2], 16) % 8
                    for i in range(n_frames):
                        rows.append({
                            "doc_id": row["doc_id"],
                            "frame_idx": i * every_n,
                            "frame_checksum": hashlib.md5(
                                f"{digest}:{i}".encode()).hexdigest(),
                        })
                else:
                    # REAL path: decode the animated GIF and keep every
                    # n-th actual frame, checksummed over decoded pixels
                    frames = decode_gif_frames(payload)
                    for i in range(0, len(frames), every_n):
                        rows.append({
                            "doc_id": row["doc_id"],
                            "frame_idx": i,
                            "frame_checksum": hashlib.md5(
                                frames[i].tobytes()).hexdigest(),
                        })
            yield pd.DataFrame(rows, columns=["doc_id", "frame_idx", "frame_checksum"])

    return df.mapInPandas(
        batches, schema="doc_id long, frame_idx int, frame_checksum string")


# ---------------------------------------------------------------------------
# GIF: real multi-frame decode (LZW) + deterministic synthesis — gives
# the frame-sampling path an actual animated container to decode
# ---------------------------------------------------------------------------

_GIF_MAGIC = (b"GIF87a", b"GIF89a")


def _gif_lzw_decode(min_code_size: int, data: bytes):
    """GIF-flavor LZW: variable-width codes LSB-first, CLEAR resets the
    table, EOI terminates. Returns the index stream."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    table = [bytes([i]) for i in range(clear)] + [b"", b""]
    width = min_code_size + 1
    prev = None
    acc = nbits = 0
    for byte in data:
        acc |= byte << nbits
        nbits += 8
        while nbits >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            nbits -= width
            if code == clear:
                table = [bytes([i]) for i in range(clear)] + [b"", b""]
                width = min_code_size + 1
                prev = None
                continue
            if code == eoi:
                return bytes(out)
            if prev is None:
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                table.append(prev + entry[:1])
            else:  # the KwKwK case
                entry = prev + prev[:1]
                table.append(entry)
            out += entry
            prev = entry
            if len(table) == (1 << width) and width < 12:
                width += 1
    return bytes(out)


def decode_gif_frames(payload: bytes):
    """Decode a (non-interlaced, full-frame, global-palette) GIF into a
    list of HxW uint8 grayscale frames (palette luma via Rec.601).
    Pure stdlib — the real-decode tier for animated/frame media when
    PIL is absent; raises ValueError on malformed input."""
    import numpy as np

    if payload[:6] not in _GIF_MAGIC:
        raise ValueError("not a GIF payload")
    w, h, flags = struct.unpack("<HHB", payload[6:11])
    pos = 13
    palette = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        raw = payload[pos:pos + 3 * n]
        pos += 3 * n
        rgb = np.frombuffer(raw, dtype=np.uint8).reshape(n, 3)
        palette = (0.299 * rgb[:, 0] + 0.587 * rgb[:, 1]
                   + 0.114 * rgb[:, 2]).round().astype(np.uint8)
    frames = []
    while pos < len(payload):
        b0 = payload[pos]
        pos += 1
        if b0 == 0x3B:  # trailer
            break
        if b0 == 0x21:  # extension: label + sub-blocks
            pos += 1
            while payload[pos]:
                pos += 1 + payload[pos]
            pos += 1
            continue
        if b0 != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{b0:02x}")
        fx, fy, fw, fh, iflags = struct.unpack("<HHHHB",
                                               payload[pos:pos + 9])
        pos += 9
        if iflags & 0x80:  # local palette
            n = 2 << (iflags & 0x07)
            raw = payload[pos:pos + 3 * n]
            pos += 3 * n
            import numpy as _np
            rgb = _np.frombuffer(raw, dtype=_np.uint8).reshape(n, 3)
            pal = (0.299 * rgb[:, 0] + 0.587 * rgb[:, 1]
                   + 0.114 * rgb[:, 2]).round().astype(_np.uint8)
        else:
            pal = palette
        if iflags & 0x40:
            raise ValueError("interlaced GIF unsupported")
        min_code = payload[pos]
        pos += 1
        lzw = bytearray()
        while payload[pos]:
            ln = payload[pos]
            lzw += payload[pos + 1:pos + 1 + ln]
            pos += 1 + ln
        pos += 1
        idx = _gif_lzw_decode(min_code, bytes(lzw))
        if len(idx) < fw * fh:
            raise ValueError("short GIF index stream")
        arr = np.frombuffer(idx[:fw * fh], dtype=np.uint8).reshape(fh, fw)
        frames.append(pal[arr])
    if not frames:
        raise ValueError("GIF contained no image blocks")
    return frames


def synthesize_gif(width: int, height: int, frame_values) -> bytes:
    """Deterministic multi-frame GIF synthesis: grayscale global
    palette (entry i = (i,i,i)), each frame a constant fill of
    ``frame_values[f]`` — so frame f's mean luma is exactly that
    value.  LZW stream written in the 'uncompressed GIF' style
    (literal 8-bit codes with a CLEAR every 125 symbols keeps the
    table from outgrowing 9-bit width), which every conformant
    decoder accepts."""
    out = bytearray()
    out += b"GIF89a"
    out += struct.pack("<HHB", width, height, 0x80 | 0x07)  # 256-color GCT
    out += b"\x00\x00"
    for i in range(256):
        out += bytes((i, i, i))
    for v in frame_values:
        out += b"\x21\xf9\x04\x00\x02\x00\x00\x00"  # GCE: 2cs delay
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, width, height, 0)
        out += bytes([8])  # LZW min code size
        npix = width * height
        codes = []
        for i in range(npix):
            if i % 125 == 0:
                codes.append(256)  # CLEAR
            codes.append(v & 0xFF)
        codes.append(257)  # EOI
        # pack 9-bit codes LSB-first
        acc = nbits = 0
        stream = bytearray()
        for c in codes:
            acc |= c << nbits
            nbits += 9
            while nbits >= 8:
                stream.append(acc & 0xFF)
                acc >>= 8
                nbits -= 8
        if nbits:
            stream.append(acc & 0xFF)
        for i in range(0, len(stream), 255):
            block = stream[i:i + 255]
            out += bytes([len(block)]) + block
        out += b"\x00"
    out += b"\x3b"
    return bytes(out)


def _gif_lzw_encode(min_code_size: int, indices: bytes) -> bytes:
    """Real GIF LZW compression (greedy longest-match, table capped at
    4096 with CLEAR) — the encoder twin that makes the decoder's
    table-growth and width-bump paths honestly testable."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = nbits = 0
    width = min_code_size + 1

    def put(code):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    put(clear)
    w = b""
    for b in indices:
        wk = w + bytes([b])
        if wk in table:
            w = wk
            continue
        put(table[w])
        table[wk] = next_code
        next_code += 1
        # width bumps AFTER the code that fills the current width
        if next_code - 1 == (1 << width) and width < 12:
            width += 1
        if next_code >= 4096:
            put(clear)
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
            width = min_code_size + 1
        w = bytes([b])
    if w:
        put(table[w])
    put(eoi)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def synthesize_gif_gradient(width: int, height: int, bases) -> bytes:
    """Multi-frame GIF with REAL LZW compression and non-constant
    content: frame f's pixel (x, y) = bases[f] + x + y (callers keep
    bases[f] + width + height - 2 <= 255), so mean luma is exactly
    bases[f] + (width - 1 + height - 1) / 2."""
    out = bytearray()
    out += b"GIF89a"
    out += struct.pack("<HHB", width, height, 0x80 | 0x07)
    out += b"\x00\x00"
    for i in range(256):
        out += bytes((i, i, i))
    for base in bases:
        pixels = bytes((base + x + y) & 0xFF
                       for y in range(height) for x in range(width))
        out += b"\x21\xf9\x04\x00\x02\x00\x00\x00"
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, width, height, 0)
        out += bytes([8])
        stream = _gif_lzw_encode(8, pixels)
        for i in range(0, len(stream), 255):
            block = stream[i:i + 255]
            out += bytes([len(block)]) + block
        out += b"\x00"
    out += b"\x3b"
    return bytes(out)


def synthesize_sine_wav(rate: int, n_samples: int, freq: float,
                        amp_int: int = 16384) -> bytes:
    """Mono PCM16 WAV carrying a pure sine at ``freq`` Hz.  When freq
    sits exactly on an FFT bin (freq = k*rate/n_samples), the decoded
    spectrum concentrates on bin k — int16 quantization spreads less
    than 1e-4 relative energy — so spectral features are arithmetic-
    checkable."""
    import wave as _wave

    import numpy as np

    t = np.arange(n_samples)
    x = np.round(amp_int * np.sin(2 * np.pi * freq * t / rate)
                 ).astype(np.int16)
    buf = io.BytesIO()
    with _wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(x.tobytes())
    return buf.getvalue()


def spectral_features(samples, rate: int):
    """Power-spectrum features of a 1-D sample array: spectral
    centroid (energy-weighted mean frequency) and peak-bin frequency.
    numpy.fft on the executor — the real-DSP tier of the audio path."""
    import numpy as np

    x = np.asarray(samples, dtype=np.float64)
    spec = np.abs(np.fft.rfft(x)) ** 2
    freqs = np.fft.rfftfreq(len(x), 1.0 / rate)
    total = spec.sum()
    centroid = float((spec * freqs).sum() / total) if total > 0 else 0.0
    peak = float(freqs[int(np.argmax(spec))])
    return centroid, peak


def decode_audio_samples(payload: bytes):
    """Decode an audio payload to raw samples → (sample_rate,
    float64 ndarray in [-1, 1]).  soundfile when importable, else the
    stdlib ``wave`` module for PCM16/8 WAV — the sample-level twin of
    ``decode_audio`` (which returns summary features only)."""
    import numpy as np

    if _soundfile is not None:
        data, rate = _soundfile.read(io.BytesIO(payload), dtype="float64")
        if data.ndim > 1:
            data = data.mean(axis=1)
        return int(rate), data
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        import wave as _wave

        with _wave.open(io.BytesIO(payload), "rb") as w:
            rate = w.getframerate()
            n = w.getnframes()
            width = w.getsampwidth()
            raw = w.readframes(n)
        if width == 2:
            x = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
        elif width == 1:
            x = (np.frombuffer(raw, dtype=np.uint8)
                 .astype(np.float64) - 128.0) / 128.0
        else:
            raise NotImplementedError(f"PCM width {width} unsupported")
        return int(rate), x
    raise NotImplementedError("payload is not WAV and soundfile absent")
