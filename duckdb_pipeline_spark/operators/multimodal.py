"""Multimodal-column plumbing (north-star op).

Images/audio/video are opaque ``binary`` columns + typed metadata
structs. The Spark-side dataflow — schema, partition-friendly batch
shapes, Arrow-batched ``mapInPandas`` UDF signatures — is real and
tested, and so is the decode for the container-supported formats:

- **BMP images**: pure numpy+struct encode/decode (24-bit uncompressed,
  bottom-up rows, 4-byte row padding) plus stride-sampled resize.
- **WAV audio**: stdlib ``wave`` encode/decode (16-bit PCM) plus
  fixed-hop frame sampling.

Formats that need codec libraries not present in this container (JPEG,
PNG, MP4, FLAC, ...) raise ``NotImplementedError`` at the clearly
marked dispatch point in :func:`decode_payload`; a real deployment
drops ``PIL.Image.open`` / ``soundfile.read`` / ``av.open`` into that
dispatch table and nothing else changes — the Spark-side plan, batch
shape, and feature schema are identical.

Scale notes: mapInPandas streams Arrow record batches; binary payloads
never round-trip through Python row objects. Media work parallelizes
per input partition — repartition by a size-balanced key before heavy
decode so one task doesn't get all the 4K videos.
"""

from __future__ import annotations

import io
import struct
import wave
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media_type", StringType()),  # image|audio|video
        StructField("payload", BinaryType()),
        StructField(
            "meta",
            StructType(
                [
                    StructField("mime", StringType()),
                    StructField("n_bytes", LongType()),
                    StructField("checksum", StringType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media_type", StringType()),
        StructField("n_bytes", LongType()),
        StructField("feat_mean", DoubleType()),
        StructField("feat_dim", LongType()),
    ]
)


# --------------------------------------------------------------------------
# codecs (pure numpy / stdlib — real decode for the supported formats)
# --------------------------------------------------------------------------

def encode_bmp(pixels: np.ndarray, ppm: int = 2835) -> bytes:
    """Encode an (h, w, 3) uint8 RGB array as a 24-bit uncompressed BMP
    (BITMAPFILEHEADER + BITMAPINFOHEADER, bottom-up rows, rows padded
    to 4 bytes — the on-disk format, not a container-specific fake).
    ``ppm`` is the pixels-per-meter resolution metadata — different
    encoders stamp different values onto identical pixels, which is
    exactly why byte-level dedup misses re-saved images."""
    h, w, _ = pixels.shape
    row_bytes = (w * 3 + 3) & ~3
    img_size = row_bytes * h
    header = struct.pack("<2sIHHI", b"BM", 54 + img_size, 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size, ppm, ppm, 0, 0)
    rows = np.zeros((h, row_bytes), dtype=np.uint8)
    rows[:, : w * 3] = pixels[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up, BGR
    return header + info + rows.tobytes()


def decode_bmp(payload: bytes) -> np.ndarray:
    """Decode a 24-bit uncompressed BMP to (h, w, 3) uint8 RGB."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    (data_off,) = struct.unpack_from("<I", payload, 10)
    w, h = struct.unpack_from("<ii", payload, 18)
    (bpp,) = struct.unpack_from("<H", payload, 28)
    (compression,) = struct.unpack_from("<I", payload, 30)
    if bpp != 24 or compression != 0:
        raise NotImplementedError(f"BMP bpp={bpp} compression={compression}")
    row_bytes = (w * 3 + 3) & ~3
    rows = np.frombuffer(payload, dtype=np.uint8, count=row_bytes * abs(h),
                         offset=data_off).reshape(abs(h), row_bytes)
    img = rows[:, : w * 3].reshape(abs(h), w, 3)[:, :, ::-1]  # BGR -> RGB
    return img[::-1] if h > 0 else img  # bottom-up -> top-down


_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def _png_chunk(tag: bytes, body: bytes) -> bytes:
    import zlib

    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def encode_png(pixels: np.ndarray, filter_type: int = 0) -> bytes:
    """Encode an (h, w, 3) uint8 RGB array as an 8-bit truecolor PNG
    (color type 2, non-interlaced) — stdlib zlib only; the format is
    public knowledge (RFC 2083). ``filter_type`` applies one of the
    five PNG scanline filters (0 None, 1 Sub, 2 Up, 3 Average,
    4 Paeth) to every row — real encoders pick per-row; a fixed type
    still produces a fully standard file and lets the decoder's
    unfilter paths be pinned one by one in tests."""
    import zlib

    h, w, _ = pixels.shape
    px = pixels.astype(np.int64)
    left = np.zeros_like(px)
    left[:, 1:] = px[:, :-1]
    up = np.zeros_like(px)
    up[1:] = px[:-1]
    ul = np.zeros_like(px)
    ul[1:, 1:] = px[:-1, :-1]
    if filter_type == 0:
        filt = px
    elif filter_type == 1:
        filt = px - left
    elif filter_type == 2:
        filt = px - up
    elif filter_type == 3:
        filt = px - (left + up) // 2
    elif filter_type == 4:
        p = left + up - ul
        pa, pb, pc = np.abs(p - left), np.abs(p - up), np.abs(p - ul)
        pred = np.where((pa <= pb) & (pa <= pc), left, np.where(pb <= pc, up, ul))
        filt = px - pred
    else:
        raise ValueError(f"filter_type {filter_type}")
    rows = (filt % 256).astype(np.uint8).reshape(h, w * 3)
    raw = b"".join(bytes([filter_type]) + r.tobytes() for r in rows)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        _PNG_MAGIC
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw, 6))
        + _png_chunk(b"IEND", b"")
    )


def decode_png(payload: bytes) -> np.ndarray:
    """Decode an 8-bit truecolor non-interlaced PNG to (h, w, 3) uint8
    RGB — stdlib zlib inflate + all five scanline unfilters (None/Sub/
    Up/Average/Paeth, per-row as the spec allows). Other bit depths,
    palettes, alpha, and interlacing remain at the marked extension
    point (a real deployment drops PIL into `decode_payload`)."""
    import zlib

    if payload[:8] != _PNG_MAGIC:
        raise ValueError("not a PNG payload")
    off = 8
    w = h = None
    idat = b""
    while off < len(payload):
        (ln,) = struct.unpack_from(">I", payload, off)
        tag = payload[off + 4 : off + 8]
        body = payload[off + 8 : off + 8 + ln]
        off += 12 + ln
        if tag == b"IHDR":
            w, h, depth, ctype, comp, filt, inter = struct.unpack(">IIBBBBB", body)
            if (depth, ctype, comp, filt, inter) != (8, 2, 0, 0, 0):
                raise NotImplementedError(
                    f"PNG depth={depth} colortype={ctype} interlace={inter} "
                    "requires PIL — not in this container"
                )
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
    raw = zlib.decompress(idat)
    stride = w * 3
    out = np.zeros((h, stride), dtype=np.int64)
    for y in range(h):
        ft = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=y * (stride + 1) + 1
        ).astype(np.int64)
        up = out[y - 1] if y else np.zeros(stride, dtype=np.int64)
        if ft == 0:
            out[y] = line
        elif ft == 2:
            out[y] = (line + up) % 256
        elif ft in (1, 3, 4):
            # left-dependent filters recur along x; walk pixel-wise
            # (bpp=3) — scanline-bounded, not corpus-bounded
            row = out[y]
            for x in range(stride):
                a = row[x - 3] if x >= 3 else 0
                b = up[x]
                c = up[x - 3] if x >= 3 else 0
                if ft == 1:
                    pred = a
                elif ft == 3:
                    pred = (a + b) // 2
                else:
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                row[x] = (int(line[x]) + pred) % 256
        else:
            raise NotImplementedError(f"PNG filter {ft}")
    return out.astype(np.uint8).reshape(h, w, 3)


_GIF_MAGIC = b"GIF8"


def _lzw_encode(indices: bytes, min_code_size: int) -> bytes:
    """GIF-flavor LZW (variable 3..12-bit codes, LSB-first packing,
    clear/EOI codes, width growth, clear-and-reset at the 4096-entry
    cap) — public knowledge (GIF87a spec appendix; Welch 1984).

    Width is driven by an explicit DECODER MODEL (`dec_next`), not by
    the encoder's own dictionary counter: the decoder assigns one new
    entry per RECEIVED data code after the first, which includes the
    encoder's final flush emission (an emission with no encoder-side
    miss/add). Bumping off the encoder's add counter desyncs exactly
    when the table size crosses a power of two on that flush — the
    decoder widens for the next code (possibly EOI) while the encoder
    does not (found by fixture corpus doc 161: 325-pixel 16-color
    image whose last add landed on 256). The giflib approach —
    mirror the decoder's counter — is correct by construction."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0
    width = min_code_size + 1
    dec_next = clear + 2  # decoder's next free code (its table length)
    n_data = 0  # data codes emitted since the last clear

    def put(code: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    def put_data(code: int) -> None:
        # after the decoder processes this code it adds one entry
        # (except for the first code after a clear) and may widen —
        # mirror that so the NEXT emission uses the decoder's width
        nonlocal dec_next, width, n_data
        put(code)
        n_data += 1
        if n_data >= 2 and dec_next < 4096:
            dec_next += 1
            if dec_next == (1 << width) and width < 12:
                width += 1

    table = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    put(clear)
    w = b""
    for b in indices:
        wc = w + bytes([b])
        if wc in table:
            w = wc
            continue
        put_data(table[w])
        if next_code < 4096:
            table[wc] = next_code
            next_code += 1
        else:
            put(clear)
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
            width = min_code_size + 1
            dec_next = clear + 2
            n_data = 0
        w = bytes([b])
    if w:
        put_data(table[w])
    put(eoi)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _lzw_decode(data: bytes, min_code_size: int) -> bytes:
    """Inverse of :func:`_lzw_encode` (standard GIF decoder loop with
    the KwKwK `code == next_code` case)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    width = min_code_size + 1
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    out = bytearray()
    acc = 0
    nbits = 0
    pos = 0
    prev: bytes | None = None
    while True:
        while nbits < width:
            if pos >= len(data):
                raise ValueError("LZW stream truncated (no EOI)")
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
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
        elif code == len(table):
            entry = prev + prev[:1]
        else:
            raise ValueError(f"LZW code {code} beyond table")
        out += entry
        if prev is not None and len(table) < 4096:
            table.append(prev + entry[:1])
            if len(table) == (1 << width) and width < 12:
                width += 1
        prev = entry


def encode_gif(indices: np.ndarray, palette: np.ndarray) -> bytes:
    """Encode an (h, w) uint8 index array + (n, 3) uint8 palette as a
    GIF87a (global color table, single image, no interlace) — stdlib
    only; the format is public knowledge (GIF87a specification).
    Palette size is padded to the next power of two (min 4)."""
    h, w = indices.shape
    n = max(4, 1 << int(np.ceil(np.log2(len(palette)))))
    if np.any(indices >= len(palette)):
        raise ValueError("index beyond palette")
    pal = np.zeros((n, 3), dtype=np.uint8)
    pal[: len(palette)] = palette
    size_bits = int(np.log2(n)) - 1
    min_code_size = max(2, int(np.log2(n)))
    lzw = _lzw_encode(indices.astype(np.uint8).tobytes(), min_code_size)
    blocks = b"".join(
        bytes([min(255, len(lzw) - i)]) + lzw[i : i + 255]
        for i in range(0, len(lzw), 255)
    )
    return (
        b"GIF87a"
        + struct.pack("<HHBBB", w, h, 0x80 | (size_bits << 4) | size_bits, 0, 0)
        + pal.tobytes()
        + b"\x2c"
        + struct.pack("<HHHHB", 0, 0, w, h, 0)
        + bytes([min_code_size])
        + blocks
        + b"\x00\x3b"
    )


def decode_gif(payload: bytes) -> np.ndarray:
    """Decode a GIF87a/89a (global color table, first image, no
    interlace, no local table) to (h, w, 3) uint8 RGB. Extension
    blocks are skipped; interlace/local-table images raise at the
    marked extension point."""
    if payload[:4] != _GIF_MAGIC:
        raise ValueError("not a GIF payload")
    _, _, packed, _, _ = struct.unpack("<HHBBB", payload[6:13])
    pos = 13
    if not packed & 0x80:
        raise NotImplementedError("GIF without a global color table")
    n = 2 << (packed & 0x07)
    pal = np.frombuffer(payload[pos : pos + 3 * n], dtype=np.uint8).reshape(n, 3)
    pos += 3 * n
    while pos < len(payload):
        b = payload[pos]
        if b == 0x21:  # extension: label + sub-blocks
            pos += 2
            while payload[pos] != 0:
                pos += 1 + payload[pos]
            pos += 1
        elif b == 0x2C:
            _, _, w, h, ipacked = struct.unpack("<HHHHB", payload[pos + 1 : pos + 10])
            pos += 10
            if ipacked & 0xC0:
                raise NotImplementedError("GIF local color table / interlace")
            min_code_size = payload[pos]
            pos += 1
            lzw = bytearray()
            while payload[pos] != 0:
                ln = payload[pos]
                lzw += payload[pos + 1 : pos + 1 + ln]
                pos += 1 + ln
            idx = np.frombuffer(
                _lzw_decode(bytes(lzw), min_code_size), dtype=np.uint8
            )
            if len(idx) != h * w:
                raise ValueError(f"GIF pixel count {len(idx)} != {h}x{w}")
            return pal[idx.reshape(h, w)]
        elif b == 0x3B:
            break
        else:
            raise ValueError(f"unexpected GIF block 0x{b:02x}")
    raise ValueError("GIF contains no image block")


def encode_gif_animated(
    frames: list, palette: np.ndarray, delay_cs: int = 4
) -> bytes:
    """Encode a list of same-shape (h, w) uint8 index arrays as a
    GIF89a ANIMATION (global color table, one graphic control
    extension + full-frame image block per frame, no interlace) —
    stdlib only; the container is public knowledge (GIF89a
    specification). This is the repo's VIDEO container: a real
    multi-frame format the frame-sampling path can decode."""
    h, w = frames[0].shape
    n = max(4, 1 << int(np.ceil(np.log2(len(palette)))))
    pal = np.zeros((n, 3), dtype=np.uint8)
    pal[: len(palette)] = palette
    size_bits = int(np.log2(n)) - 1
    min_code_size = max(2, int(np.log2(n)))
    out = bytearray(
        b"GIF89a"
        + struct.pack("<HHBBB", w, h, 0x80 | (size_bits << 4) | size_bits, 0, 0)
        + pal.tobytes()
    )
    for fr in frames:
        if fr.shape != (h, w):
            raise ValueError("animation frames must share one shape")
        if np.any(fr >= len(palette)):
            raise ValueError("index beyond palette")
        out += (
            b"\x21\xf9\x04"
            + bytes([0, delay_cs & 0xFF, (delay_cs >> 8) & 0xFF, 0])
            + b"\x00"
        )
        lzw = _lzw_encode(fr.astype(np.uint8).tobytes(), min_code_size)
        blocks = b"".join(
            bytes([min(255, len(lzw) - i)]) + lzw[i : i + 255]
            for i in range(0, len(lzw), 255)
        )
        out += (
            b"\x2c"
            + struct.pack("<HHHHB", 0, 0, w, h, 0)
            + bytes([min_code_size])
            + blocks
            + b"\x00"
        )
    out += b"\x3b"
    return bytes(out)


def decode_gif_frames(payload: bytes) -> np.ndarray:
    """Decode EVERY frame of a GIF87a/89a animation (global color
    table, full-frame images, no interlace/local tables) to an
    (n_frames, h, w, 3) uint8 array. Partial-frame/disposal composites
    raise at the marked extension point — the synthesized corpus
    writes full frames only."""
    if payload[:4] != _GIF_MAGIC:
        raise ValueError("not a GIF payload")
    sw, sh, packed, _, _ = struct.unpack("<HHBBB", payload[6:13])
    pos = 13
    if not packed & 0x80:
        raise NotImplementedError("GIF without a global color table")
    n = 2 << (packed & 0x07)
    pal = np.frombuffer(payload[pos : pos + 3 * n], dtype=np.uint8).reshape(n, 3)
    pos += 3 * n
    frames = []
    while pos < len(payload):
        b = payload[pos]
        if b == 0x21:
            pos += 2
            while payload[pos] != 0:
                pos += 1 + payload[pos]
            pos += 1
        elif b == 0x2C:
            left, top, w, h, ipacked = struct.unpack(
                "<HHHHB", payload[pos + 1 : pos + 10]
            )
            pos += 10
            if ipacked & 0xC0 or (left, top, w, h) != (0, 0, sw, sh):
                raise NotImplementedError(
                    "GIF local color table / interlace / partial frame"
                )
            min_code_size = payload[pos]
            pos += 1
            lzw = bytearray()
            while payload[pos] != 0:
                ln = payload[pos]
                lzw += payload[pos + 1 : pos + 1 + ln]
                pos += 1 + ln
            pos += 1
            idx = np.frombuffer(
                _lzw_decode(bytes(lzw), min_code_size), dtype=np.uint8
            )
            if len(idx) != h * w:
                raise ValueError(f"GIF pixel count {len(idx)} != {h}x{w}")
            frames.append(pal[idx.reshape(h, w)])
        elif b == 0x3B:
            break
        else:
            raise ValueError(f"unexpected GIF block 0x{b:02x}")
    if not frames:
        raise ValueError("GIF contains no image block")
    return np.stack(frames)


def synth_video_payload(did: int, nchars: int) -> tuple[str, bytes]:
    """Deterministic animated-GIF payload for one document: a
    content-seeded base frame rolled horizontally per frame (motion
    that stays inside the palette), 2-6 frames per doc, palette size
    cycling 4/8/16. Shared by the Spark kernel AND the pure-pandas
    fixture generator (the synth_payload contract)."""
    did, nchars = int(did), int(nchars)
    rng = np.random.default_rng(did + 23)
    npal = (4, 8, 16)[did % 3]
    w = 9 + nchars % 17
    pal = rng.integers(0, 256, size=(npal, 3), dtype=np.uint8)
    base = rng.integers(0, npal, size=(11, w), dtype=np.uint8)
    n_frames = 2 + did % 5
    frames = [np.roll(base, f, axis=1) for f in range(n_frames)]
    return "video", encode_gif_animated(frames, pal)


def video_frame_hashes(
    df: DataFrame, stride: int = 2, payload_col: str = "payload"
) -> DataFrame:
    """Frame-sample every video payload (decode the animation, keep
    every ``stride``-th frame) and emit one perceptual-hash row per
    sampled frame — the video analog of audio's sample_frames ->
    feature pipeline, one Arrow-batched map pass, non-video rows
    dropped. Output: (media_id, frame_no, n_frames, ahash)."""

    def _hash(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, fnos, nfs, hs = [], [], [], []
            for mid, mtype, payload in zip(
                pdf["media_id"], pdf["media_type"], pdf[payload_col]
            ):
                if mtype != "video":
                    continue
                frames = decode_gif_frames(bytes(payload))
                for fno in range(0, len(frames), stride):
                    ids.append(int(mid))
                    fnos.append(fno)
                    nfs.append(len(frames))
                    hs.append(
                        np.uint64(ahash_pixels(frames[fno])).astype(np.int64)
                    )
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "frame_no": pd.Series(fnos, dtype="int32"),
                    "n_frames": pd.Series(nfs, dtype="int32"),
                    "ahash": pd.Series(hs, dtype="int64"),
                }
            )

    return df.mapInPandas(
        _hash, "media_id long, frame_no int, n_frames int, ahash long"
    )


def resize_image(pixels: np.ndarray, factor: int) -> np.ndarray:
    """Stride-sampled downscale by an integer factor (nearest-neighbor;
    the point is real pixel-domain work without an image library)."""
    return pixels[::factor, ::factor, :]


def encode_wav(samples: np.ndarray, rate: int = 16000) -> bytes:
    """Encode a float array in [-1, 1] as 16-bit PCM mono WAV (stdlib)."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(rate)
        f.writeframes((np.clip(samples, -1, 1) * 32767).astype("<i2").tobytes())
    return buf.getvalue()


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """Decode 16-bit PCM mono WAV to (float64 array in [-1, 1], rate)."""
    with wave.open(io.BytesIO(payload), "rb") as f:
        if f.getsampwidth() != 2 or f.getnchannels() != 1:
            raise NotImplementedError("only 16-bit mono PCM WAV")
        data = np.frombuffer(f.readframes(f.getnframes()), dtype="<i2")
        return data.astype("float64") / 32767.0, f.getframerate()


def sample_frames(samples: np.ndarray, frame: int = 400, hop: int = 160) -> np.ndarray:
    """Fixed-hop frame sampling -> (n_frames, frame) array (the shape a
    feature extractor consumes). Inputs shorter than one frame yield an
    empty (0, frame) array. Fancy indexing copies; for a zero-copy view
    use `np.lib.stride_tricks.sliding_window_view(samples, frame)[::hop]`
    — kept as a copy here because downstream kernels mutate frames."""
    if len(samples) < frame:
        return np.empty((0, frame), dtype=samples.dtype)
    n = 1 + (len(samples) - frame) // hop
    idx = np.arange(frame)[None, :] + hop * np.arange(n)[:, None]
    return samples[idx]


def decode_payload(media_type: str, payload: bytes) -> tuple[float, int]:
    """Dispatch: decode one payload -> (feat_mean, feat_dim).

    image/BMP -> mean pixel value over all channels, dim = h*w*3.
    audio/WAV -> mean absolute amplitude scaled to [0, 255], dim = n_samples.
    Anything else is a format whose codec library (PIL / soundfile / av)
    is not in this container — the marked extension point.
    """
    if media_type == "image" and payload[:2] == b"BM":
        img = decode_bmp(payload)
        return float(img.mean()), int(img.size)
    if media_type == "image" and payload[:8] == _PNG_MAGIC:
        img = decode_png(payload)
        return float(img.mean()), int(img.size)
    if media_type == "image" and payload[:4] == _GIF_MAGIC:
        img = decode_gif(payload)
        return float(img.mean()), int(img.size)
    if media_type == "image" and payload[:3] == b"\xff\xd8\xff":
        img = decode_jpeg_gray(payload)
        return float(img.mean()), int(img.size)
    if media_type == "audio" and payload[:4] == b"RIFF":
        samples, _ = decode_wav(payload)
        return float(np.abs(samples).mean() * 255.0), int(len(samples))
    if media_type == "audio" and payload[:4] == _FLAC_MAGIC:
        samples, _ = decode_flac(payload)
        return (
            float(np.abs(samples.astype(np.float64) / 32767.0).mean() * 255.0),
            int(len(samples)),
        )
    raise NotImplementedError(
        f"decode for media_type={media_type!r} with magic {payload[:4]!r} "
        "requires PIL/soundfile/av — not in this container"
    )


# --------------------------------------------------------------------------
# Spark-side operators
# --------------------------------------------------------------------------

def attach_media_meta(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Compute the typed metadata struct from the raw payload (JVM-side
    — no Python in this path)."""
    return df.withColumn(
        "meta",
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.length(F.col(payload_col)).cast("long").alias("n_bytes"),
            F.sha2(F.col(payload_col), 256).alias("checksum"),
        ),
    )


def extract_features(df: DataFrame, decode_stub: bool = True) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    ``decode_stub=True`` computes a payload-level fake (mean byte value)
    without decoding — the fast smoke path. ``decode_stub=False`` runs
    the REAL per-format decode via :func:`decode_payload` (BMP/WAV in
    this container; other formats raise at the marked dispatch point).
    """

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            if decode_stub:
                feat = payloads.map(lambda b: (sum(b) / len(b)) if len(b) else 0.0)
                dim = pd.Series([1] * len(pdf), dtype="int64")
            else:
                decoded = [
                    decode_payload(t, bytes(b))
                    for t, b in zip(pdf["media_type"], payloads)
                ]
                feat = pd.Series([d[0] for d in decoded], dtype="float64",
                                 index=pdf.index)
                dim = pd.Series([d[1] for d in decoded], dtype="int64",
                                index=pdf.index)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": payloads.map(len).astype("int64"),
                    "feat_mean": feat.astype("float64"),
                    "feat_dim": dim,
                }
            )

    return df.mapInPandas(_extract, schema=FEATURE_SCHEMA)


def documents_as_media(docs: DataFrame) -> DataFrame:
    """Build a MEDIA_SCHEMA-shaped frame from the documents table
    (text bytes as a stand-in payload — exercises the full plumbing
    with the data available in this environment)."""
    return attach_media_meta(
        docs.select(
            F.col("doc_id").alias("media_id"),
            F.lit("image").alias("media_type"),
            F.encode(F.col("text"), "UTF-8").alias("payload"),
        )
    )


def synth_payload(did: int, nchars: int) -> tuple[str, bytes]:
    """Deterministic (media_type, payload) for one document: even
    doc_ids become 24-bit BMPs (content-seeded pixels), odd doc_ids
    16-bit PCM WAVs. Shared by the Spark synthesis kernel AND the
    pure-pandas oracle-fixture generator (fixtures_mm.py) so both sides
    hash the same bytes by construction."""
    did, nchars = int(did), int(nchars)
    if did % 2 == 0:
        rng = np.random.default_rng(did)
        w = 16 + nchars % 17  # non-multiple-of-4 widths too
        px = rng.integers(0, 256, size=(12, w, 3), dtype=np.uint8)
        return "image", encode_bmp(px)
    n = 800 + nchars % 800
    t = np.arange(n) / 16000.0
    return "audio", encode_wav(0.5 * np.sin(2 * np.pi * (200 + did % 200) * t))


def synth_png_payload(did: int, nchars: int) -> tuple[str, bytes]:
    """Deterministic PNG payload for one document (round-9 third
    codec): content-seeded pixels, filter type cycling through all
    five per doc_id so the corpus exercises every unfilter path.
    Shared by the Spark kernel AND the pure-pandas fixture generator
    (the synth_payload contract)."""
    did, nchars = int(did), int(nchars)
    rng = np.random.default_rng(did + 7)
    w = 9 + nchars % 23
    px = rng.integers(0, 256, size=(11, w, 3), dtype=np.uint8)
    return "image", encode_png(px, filter_type=did % 5)


def synth_gif_payload(did: int, nchars: int) -> tuple[str, bytes]:
    """Deterministic GIF payload for one document (round-9 fourth
    codec): content-seeded indexed pixels over a content-seeded
    palette; palette size cycles 4/8/16 per doc_id so every code width
    (3..5 start) and the width-growth path run distributed. Shared by
    the Spark kernel AND the pure-pandas fixture generator (the
    synth_payload contract)."""
    did, nchars = int(did), int(nchars)
    rng = np.random.default_rng(did + 11)
    npal = (4, 8, 16)[did % 3]
    w = 9 + nchars % 23
    pal = rng.integers(0, 256, size=(npal, 3), dtype=np.uint8)
    idx = rng.integers(0, npal, size=(13, w), dtype=np.uint8)
    return "image", encode_gif(idx, pal)


def synthesize_media(docs: DataFrame, payload_fn=None) -> DataFrame:
    """Build a MEDIA_SCHEMA frame with REAL encoded payloads derived
    deterministically from each document (see :func:`synth_payload`;
    ``payload_fn`` swaps the synthesis — e.g. :func:`synth_png_payload`
    for the PNG corpus). This is how the decode path is exercised
    end-to-end in an environment with no media files: encode -> opaque
    binary column -> distributed decode, all real bytes in the real
    formats."""
    payload_fn = payload_fn or synth_payload

    def _synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_ids, out_types, out_payloads = [], [], []
            for did, nchars in zip(pdf["doc_id"], pdf["n_chars"]):
                mtype, payload = payload_fn(did, nchars)
                out_payloads.append(payload)
                out_types.append(mtype)
                out_ids.append(int(did))
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(out_ids, dtype="int64"),
                    "media_type": out_types,
                    "payload": out_payloads,
                }
            )

    synth = docs.select("doc_id", "n_chars").mapInPandas(
        _synth, schema="media_id long, media_type string, payload binary"
    )
    return attach_media_meta(synth)


def ahash_pixels(img: np.ndarray) -> int:
    """64-bit average-hash (aHash) of an RGB image: grayscale ->
    8x8 block means -> bit b set iff block b >= the mean of blocks.
    Robust to uniform brightness shifts (every block and the threshold
    move together) and to resampling that preserves block structure —
    the perceptual twin of content-hash dedup for image corpora."""
    gray = img.astype(np.float64).mean(axis=2)
    h, w = gray.shape
    ri = (np.arange(8) * h) // 8
    ci = (np.arange(8) * w) // 8
    blocks = np.add.reduceat(np.add.reduceat(gray, ri, axis=0), ci, axis=1)
    counts = np.outer(np.diff(np.append(ri, h)), np.diff(np.append(ci, w)))
    # Images under 8px in a dimension produce empty blocks (counts==0,
    # degenerate for block hashing but present in resize-audit halves).
    # Pin their value to the exact sentinel the historical blocks/0
    # divide produced (+inf for a positive block sum, nan for 0/0)
    # WITHOUT the divide, so the hash-checked fixture families can't
    # shift under a numpy behavior change.
    means = blocks / np.maximum(counts, 1)
    empty = counts == 0
    if empty.any():
        sentinel = np.where(
            blocks > 0, np.inf, np.where(blocks < 0, -np.inf, np.nan)
        )
        means = np.where(empty, sentinel, means)
    bits = (means >= means.mean()).flatten()
    return int(bits.astype(np.uint64) @ (np.uint64(1) << np.arange(64, dtype=np.uint64)))


def wav_frame_stats(
    df: DataFrame, payload_col: str = "payload", frame: int = 400, hop: int = 160
) -> DataFrame:
    """Per-audio-file frame statistics over the opaque binary column:
    decode 16-bit PCM WAV, fixed-hop frame sampling
    (:func:`sample_frames`), and two energy features quantized to
    integers (floor(mean|x| * 1e9)) so the value surface is hash-exact
    cross-engine. Arrow-batched mapInPandas — the same distributed
    shape a real feature extractor (fbank/MFCC) plugs into; those
    kernels are the marked extension point (codec libs absent here).

    Output: (media_id, n_samples, n_frames, energy_q, f0_energy_q)."""
    import pandas as pd

    def _stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, ns, nf, eq, f0 = [], [], [], [], []
            for mid, payload in zip(pdf["media_id"], pdf[payload_col]):
                samples, _ = decode_wav(bytes(payload))
                fr = sample_frames(samples, frame, hop)
                ids.append(int(mid))
                ns.append(int(len(samples)))
                nf.append(int(fr.shape[0]))
                eq.append(int(np.floor(np.abs(samples).mean() * 1e9)))
                f0.append(
                    int(np.floor(np.abs(fr[0]).mean() * 1e9)) if fr.shape[0] else 0
                )
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "n_samples": pd.Series(ns, dtype="int64"),
                    "n_frames": pd.Series(nf, dtype="int64"),
                    "energy_q": pd.Series(eq, dtype="int64"),
                    "f0_energy_q": pd.Series(f0, dtype="int64"),
                }
            )

    return df.select("media_id", payload_col).mapInPandas(
        _stats,
        "media_id long, n_samples long, n_frames long, energy_q long, f0_energy_q long",
    )


def perturb_images(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Deterministically NEAR-duplicate every image payload: halve the
    intensity of the top-left quarter and re-encode — pixels differ,
    block structure mostly survives, so the aHash lands a FEW bits
    away from the original (the crop/brightness-edit near-dup case
    that exact pixel hashing misses and Hamming-banded LSH catches).
    Non-image rows pass through unchanged."""

    def _pt(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mtype, payload in zip(pdf["media_type"], pdf[payload_col]):
                if mtype != "image":
                    out.append(payload)
                    continue
                px = decode_bmp(bytes(payload)).copy()
                h, w = px.shape[:2]
                px[: h // 2, : w // 2] = px[: h // 2, : w // 2] // 2
                out.append(encode_bmp(px))
            pdf = pdf.copy()
            pdf[payload_col] = out
            yield pdf

    return df.mapInPandas(_pt, schema=df.schema)


def image_ahash(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """(media_id, ahash) for every decodable image payload in a media
    frame — one Arrow-batched map pass, non-image rows dropped. The
    dedup step downstream is a plain groupBy(ahash): identical to exact
    dedup's shape, but keyed on perceptual content."""

    def _hash(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, hs = [], []
            for mid, mtype, payload in zip(
                pdf["media_id"], pdf["media_type"], pdf[payload_col]
            ):
                if mtype != "image":
                    continue
                ids.append(int(mid))
                # int64 reinterpret of the u64 bit pattern (Spark LongType)
                hs.append(np.uint64(ahash_pixels(decode_bmp(bytes(payload)))).astype(np.int64))
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "ahash": pd.Series(hs, dtype="int64"),
                }
            )

    return df.mapInPandas(_hash, schema="media_id long, ahash long")


def shift_brightness(df: DataFrame, delta: int, payload_col: str = "payload") -> DataFrame:
    """Re-encode every image payload with a uniform brightness shift
    (clipped at 0/255); non-image rows pass through unchanged. Produces
    byte-DIFFERENT payloads that are perceptually close. Note aHash
    invariance under the shift is exact only while no pixel clips —
    saturated pixels break the uniform shift (the unit test uses
    headroom images; the dedup query uses `reencode_images`, whose
    copies are pixel-exact)."""

    def _shift(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mtype, payload in zip(pdf["media_type"], pdf[payload_col]):
                if mtype != "image":
                    out.append(payload)
                    continue
                px = decode_bmp(bytes(payload)).astype(np.int16) + delta
                out.append(encode_bmp(np.clip(px, 0, 255).astype(np.uint8)))
            pdf = pdf.copy()
            pdf[payload_col] = out
            yield pdf

    return df.mapInPandas(_shift, schema=df.schema)


def reencode_images(df: DataFrame, ppm: int = 5670, payload_col: str = "payload") -> DataFrame:
    """Re-save every image payload through the codec with different
    encoder metadata (resolution stamp): pixel-IDENTICAL, byte-
    DIFFERENT files — the re-saved/duplicate-upload case that byte
    checksums miss and pixel-level hashing catches. Non-image rows pass
    through unchanged."""

    def _re(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mtype, payload in zip(pdf["media_type"], pdf[payload_col]):
                if mtype != "image":
                    out.append(payload)
                    continue
                out.append(encode_bmp(decode_bmp(bytes(payload)), ppm=ppm))
            pdf = pdf.copy()
            pdf[payload_col] = out
            yield pdf

    return df.mapInPandas(_re, schema=df.schema)


# --------------------------------------------------------------------------
# Baseline JPEG (grayscale), stdlib/numpy only — fifth real codec.
# Everything below is public knowledge: ITU-T T.81 (the JPEG spec),
# including the Annex K example quantization and Huffman tables.
# --------------------------------------------------------------------------

_JPEG_MAGIC = b"\xff\xd8\xff"

_JPEG_QTAB = np.array(
    [
        [16, 11, 10, 16, 24, 40, 51, 61],
        [12, 12, 14, 19, 26, 58, 60, 55],
        [14, 13, 16, 24, 40, 57, 69, 56],
        [14, 17, 22, 29, 51, 87, 80, 62],
        [18, 22, 37, 56, 68, 109, 103, 77],
        [24, 35, 55, 64, 81, 104, 113, 92],
        [49, 64, 78, 87, 103, 121, 120, 101],
        [72, 92, 95, 98, 112, 100, 103, 99],
    ],
    dtype=np.int32,
)

_JPEG_DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_JPEG_DC_VALS = list(range(12))
_JPEG_AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_JPEG_AC_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]

_JPEG_ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ]
)

_JPEG_C = np.array(
    [
        [
            (np.sqrt(1 / 8) if u == 0 else np.sqrt(2 / 8))
            * np.cos((2 * x + 1) * u * np.pi / 16)
            for x in range(8)
        ]
        for u in range(8)
    ]
)


def _jpeg_build_codes(bits, vals):
    codes, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def _jpeg_magcat(v: int) -> int:
    a, s = abs(v), 0
    while a:
        s += 1
        a >>= 1
    return s


class _JpegBitWriter:
    def __init__(self):
        self.buf, self.acc, self.n = bytearray(), 0, 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            b = (self.acc >> (self.n - 8)) & 0xFF
            self.buf.append(b)
            if b == 0xFF:  # byte stuffing (T.81 F.1.2.3)
                self.buf.append(0)
            self.n -= 8

    def flush(self) -> bytes:
        if self.n:
            pad = 8 - self.n
            self.write((1 << pad) - 1, pad)
        return bytes(self.buf)


def encode_jpeg_gray(pixels: np.ndarray) -> bytes:
    """Encode an 8-bit grayscale (h, w) array — h, w multiples of 8 —
    as a BASELINE JPEG (SOI/DQT/SOF0/DHT/SOS/EOI, Annex K tables):
    level shift, float64 DCT-II, quantize, zigzag, DC-differential +
    run-length Huffman entropy coding with byte stuffing."""
    h, w = pixels.shape
    if h % 8 or w % 8:
        raise ValueError("encode_jpeg_gray needs multiple-of-8 dims")
    dc_codes = _jpeg_build_codes(_JPEG_DC_BITS, _JPEG_DC_VALS)
    ac_codes = _jpeg_build_codes(_JPEG_AC_BITS, _JPEG_AC_VALS)
    wtr = _JpegBitWriter()
    prev_dc = 0
    for by in range(0, h, 8):
        for bx in range(0, w, 8):
            b = pixels[by : by + 8, bx : bx + 8].astype(np.float64) - 128.0
            q = np.round(_JPEG_C @ b @ _JPEG_C.T / _JPEG_QTAB).astype(np.int32)
            zz = q.flatten()[_JPEG_ZIGZAG]
            diff = int(zz[0]) - prev_dc
            prev_dc = int(zz[0])
            s = _jpeg_magcat(diff)
            c, ln = dc_codes[s]
            wtr.write(c, ln)
            if s:
                wtr.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
            run = 0
            for k in range(1, 64):
                a = int(zz[k])
                if a == 0:
                    run += 1
                    continue
                while run > 15:
                    c, ln = ac_codes[0xF0]
                    wtr.write(c, ln)
                    run -= 16
                s = _jpeg_magcat(a)
                c, ln = ac_codes[(run << 4) | s]
                wtr.write(c, ln)
                wtr.write(a if a >= 0 else a + (1 << s) - 1, s)
                run = 0
            if run:
                c, ln = ac_codes[0x00]
                wtr.write(c, ln)
    data = wtr.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    dqt = seg(0xDB, b"\x00" + bytes(int(v) for v in _JPEG_QTAB.flatten()[_JPEG_ZIGZAG]))
    sof = seg(0xC0, struct.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0]))
    dht = seg(
        0xC4,
        b"\x00" + bytes(_JPEG_DC_BITS) + bytes(_JPEG_DC_VALS)
        + b"\x10" + bytes(_JPEG_AC_BITS) + bytes(_JPEG_AC_VALS),
    )
    sos = seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    return b"\xff\xd8" + dqt + sof + dht + sos + data + b"\xff\xd9"


class _JpegBitReader:
    def __init__(self, data: bytes):
        self.d, self.i, self.acc, self.n = data, 0, 0, 0

    def bit(self) -> int:
        if self.n == 0:
            b = self.d[self.i]
            self.i += 1
            if b == 0xFF:
                if self.d[self.i] != 0:
                    raise ValueError("unexpected marker in entropy data")
                self.i += 1
            self.acc, self.n = b, 8
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.bit()
        return v


def _jpeg_build_decode(bits, vals):
    table, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


def decode_jpeg_gray(payload: bytes) -> np.ndarray:
    """Decode a baseline grayscale JPEG (one component, one quant +
    one DC/AC Huffman table pair, no restart markers) to an (h, w)
    uint8 array. A REAL decoder: quantization and Huffman tables are
    parsed from the stream's own DQT/DHT segments, not assumed.
    Multi-component / progressive streams raise at the marked
    extension point."""
    if payload[:3] != _JPEG_MAGIC:
        raise ValueError("not a JPEG payload")
    i = 2
    qtab = None
    dc_dec = ac_dec = None
    h = w = None
    while i < len(payload):
        if payload[i] != 0xFF:
            raise ValueError("bad marker alignment")
        marker = payload[i + 1]
        if marker == 0xD9:
            break
        ln = struct.unpack(">H", payload[i + 2 : i + 4])[0]
        body = payload[i + 4 : i + 2 + ln]
        if marker == 0xDB:
            if body[0] & 0xF0:
                raise NotImplementedError("16-bit quant table")
            z = np.frombuffer(body[1:65], dtype=np.uint8).astype(np.int32)
            qtab = np.zeros(64, dtype=np.int32)
            qtab[_JPEG_ZIGZAG] = z
            qtab = qtab.reshape(8, 8)
        elif marker == 0xC0:
            prec, h, w, ncomp = struct.unpack(">BHHB", body[:6])
            if prec != 8 or ncomp != 1:
                raise NotImplementedError("only 8-bit single-component baseline")
        elif marker in (0xC1, 0xC2, 0xC3):
            raise NotImplementedError("only baseline sequential JPEG")
        elif marker == 0xC4:
            j = 0
            while j < len(body):
                tc_th = body[j]
                bits = list(body[j + 1 : j + 17])
                nv = sum(bits)
                vals = list(body[j + 17 : j + 17 + nv])
                if tc_th >> 4 == 0:
                    dc_dec = _jpeg_build_decode(bits, vals)
                else:
                    ac_dec = _jpeg_build_decode(bits, vals)
                j += 17 + nv
        elif marker == 0xDA:
            data = payload[i + 2 + ln : -2]
            if qtab is None or dc_dec is None or ac_dec is None or h is None:
                raise ValueError("SOS before tables/frame header")
            r = _JpegBitReader(data)

            def read_huff(table):
                code = 0
                for length in range(1, 17):
                    code = (code << 1) | r.bit()
                    if (length, code) in table:
                        return table[(length, code)]
                raise ValueError("bad huffman code")

            def extend(v, s):
                return v if v >= (1 << (s - 1)) else v - (1 << s) + 1

            out = np.zeros((h, w), dtype=np.uint8)
            prev = 0
            for by in range(0, h, 8):
                for bx in range(0, w, 8):
                    zz = np.zeros(64, dtype=np.int32)
                    s = read_huff(dc_dec)
                    prev += extend(r.bits(s), s) if s else 0
                    zz[0] = prev
                    k = 1
                    while k < 64:
                        rs = read_huff(ac_dec)
                        if rs == 0:
                            break
                        if rs == 0xF0:
                            k += 16
                            continue
                        k += rs >> 4
                        s = rs & 15
                        zz[k] = extend(r.bits(s), s)
                        k += 1
                    q = np.zeros(64, dtype=np.int32)
                    q[_JPEG_ZIGZAG] = zz
                    p = (
                        _JPEG_C.T @ (q.reshape(8, 8).astype(np.float64) * qtab)
                        @ _JPEG_C
                        + 128.0
                    )
                    out[by : by + 8, bx : bx + 8] = np.clip(
                        np.round(p), 0, 255
                    ).astype(np.uint8)
            return out
        i += 2 + ln
    raise ValueError("JPEG contains no scan")


def synth_jpeg_payload(did: int, nchars: int) -> tuple[str, bytes]:
    """Deterministic grayscale baseline-JPEG payload for one document:
    a smooth content-seeded gradient plus seeded low-amplitude noise
    (realistic spectra — mostly-zero high-frequency coefficients, so
    run-length coding and the ZRL path both execute). Shared by the
    Spark kernel AND the pure-pandas fixture generator."""
    did, nchars = int(did), int(nchars)
    rng = np.random.default_rng(did + 31)
    h = 16
    w = 8 * (2 + nchars % 4)
    yy, xx = np.mgrid[0:h, 0:w]
    base = (
        128.0
        + 80.0 * np.sin(xx / (3.0 + did % 5))
        + 40.0 * np.cos(yy / 2.0)
        + rng.normal(0, 6.0, (h, w))
    )
    px = np.clip(np.round(base), 0, 255).astype(np.uint8)
    return "image", encode_jpeg_gray(px)


# --------------------------------------------------------------------------
# FLAC (mono 16-bit, fixed predictors) — sixth real codec, LOSSLESS.
# Public knowledge: the FLAC format specification (xiph.org) — frame
# sync/CRC-8/CRC-16 layout, fixed-predictor subframes, Rice residuals.
# --------------------------------------------------------------------------

_FLAC_MAGIC = b"fLaC"


def _flac_crc8(data: bytes) -> int:
    c = 0
    for b in data:
        c ^= b
        for _ in range(8):
            c = ((c << 1) ^ 0x07) & 0xFF if c & 0x80 else (c << 1) & 0xFF
    return c


def _flac_crc16(data: bytes) -> int:
    c = 0
    for b in data:
        c ^= b << 8
        for _ in range(8):
            c = ((c << 1) ^ 0x8005) & 0xFFFF if c & 0x8000 else (c << 1) & 0xFFFF
    return c


class _FlacBW:
    def __init__(self):
        self.buf, self.acc, self.n = bytearray(), 0, 0

    def w(self, v: int, bits: int) -> None:
        self.acc = (self.acc << bits) | (v & ((1 << bits) - 1))
        self.n += bits
        while self.n >= 8:
            self.buf.append((self.acc >> (self.n - 8)) & 0xFF)
            self.n -= 8

    def pad(self) -> None:
        if self.n:
            self.w(0, 8 - self.n)


class _FlacBR:
    def __init__(self, d: bytes):
        self.d, self.pos = d, 0

    def r(self, bits: int) -> int:
        v = 0
        for _ in range(bits):
            v = (v << 1) | ((self.d[self.pos >> 3] >> (7 - (self.pos & 7))) & 1)
            self.pos += 1
        return v

    def unary(self) -> int:
        q = 0
        while self.r(1) == 0:
            q += 1
        return q


def _flac_fixed_residual(s: np.ndarray, order: int) -> np.ndarray:
    if order == 0:
        return s.copy()
    if order == 1:
        return s[1:] - s[:-1]
    return s[2:] - 2 * s[1:-1] + s[:-2]


def encode_flac(samples: np.ndarray, rate: int = 16000) -> bytes:
    """Encode mono int16 samples as a LOSSLESS single-frame FLAC
    stream: fixed predictor of order 0-2 chosen by residual magnitude,
    one Rice partition, spec CRC-8 (frame header) and CRC-16 (frame)."""
    s = np.asarray(samples, dtype=np.int64)
    n = len(s)
    best = min(
        range(3),
        key=lambda o: int(np.abs(_flac_fixed_residual(s, o)).sum())
        if n > o
        else 1 << 62,
    )
    res = _flac_fixed_residual(s, best)
    mean = max(1, int(np.abs(res).mean()) if len(res) else 1)
    k = max(0, min(14, int(np.log2(mean)) + 1))
    hdr = _FlacBW()
    hdr.w(0b11111111111110, 14)
    hdr.w(0, 1)
    hdr.w(0, 1)          # fixed blocksize strategy
    hdr.w(0b0111, 4)     # blocksize-1 as 16 bits at header end
    hdr.w(0b0000, 4)     # sample rate from STREAMINFO
    hdr.w(0, 4)          # mono
    hdr.w(0b100, 3)      # 16 bps
    hdr.w(0, 1)
    hdr.w(0x00, 8)       # UTF-8 frame number 0
    hdr.w(n - 1, 16)
    hdr.pad()
    hb = bytearray(hdr.buf)
    hb.append(_flac_crc8(bytes(hb)))
    body = _FlacBW()
    body.w(0, 1)
    body.w(0b001000 | best, 6)
    body.w(0, 1)
    for i in range(best):
        body.w(int(s[i]) & 0xFFFF, 16)
    body.w(0, 2)   # Rice method: 4-bit parameters
    body.w(0, 4)   # partition order 0
    body.w(k, 4)
    for r in res:
        u = 2 * int(r) if r >= 0 else -2 * int(r) - 1
        for _ in range(u >> k):
            body.w(0, 1)
        body.w(1, 1)
        body.w(u & ((1 << k) - 1), k)
    body.pad()
    frame = bytes(hb) + bytes(body.buf)
    frame += _flac_crc16(frame).to_bytes(2, "big")
    si = _FlacBW()
    si.w(n, 16)
    si.w(n, 16)
    si.w(0, 24)
    si.w(0, 24)
    si.w(rate, 20)
    si.w(0, 3)    # channels - 1
    si.w(15, 5)   # bps - 1
    si.w(n, 36)
    si.pad()
    meta = b"\x80" + (34).to_bytes(3, "big") + bytes(si.buf) + b"\x00" * 16
    return _FLAC_MAGIC + meta + frame


def decode_flac(payload: bytes) -> tuple[np.ndarray, int]:
    """Decode a mono 16-bit fixed-predictor FLAC stream (the encoder's
    feature set; LPC/stereo/multi-frame raise at the marked extension
    point). Both CRCs are VERIFIED, not skipped. Returns
    (int64 samples, rate)."""
    if payload[:4] != _FLAC_MAGIC:
        raise ValueError("not a FLAC payload")
    i = 4
    rate = None
    while True:
        h = payload[i]
        ln = int.from_bytes(payload[i + 1 : i + 4], "big")
        if h & 0x7F == 0:
            br = _FlacBR(payload[i + 4 : i + 4 + ln])
            br.r(16), br.r(16), br.r(24), br.r(24)
            rate = br.r(20)
            ch, bps = br.r(3) + 1, br.r(5) + 1
            if ch != 1 or bps != 16:
                raise NotImplementedError("only mono 16-bit FLAC")
        i += 4 + ln
        if h & 0x80:
            break
    frame = payload[i:]
    br = _FlacBR(frame)
    if br.r(14) != 0b11111111111110:
        raise ValueError("bad FLAC frame sync")
    br.r(1), br.r(1)
    if br.r(4) != 0b0111:
        raise NotImplementedError("only 16-bit blocksize-at-end frames")
    br.r(4), br.r(4)
    bps_code = br.r(3)
    br.r(1)
    if bps_code != 0b100:
        raise NotImplementedError("only 16-bit sample size")
    br.r(8)  # frame number (single UTF-8 byte)
    n = br.r(16) + 1
    if br.pos % 8:
        raise ValueError("misaligned FLAC header")
    if _flac_crc8(frame[: br.pos // 8]) != frame[br.pos // 8]:
        raise ValueError("FLAC header CRC-8 mismatch")
    br.r(8)
    br.r(1)
    st = br.r(6)
    br.r(1)
    if st & 0b111000 != 0b001000:
        raise NotImplementedError("only fixed-predictor subframes")
    order = st & 7
    out = []
    for _ in range(order):
        v = br.r(16)
        out.append(v - 0x10000 if v & 0x8000 else v)
    if br.r(2) != 0 or br.r(4) != 0:
        raise NotImplementedError("only 4-bit Rice, partition order 0")
    k = br.r(4)
    res = []
    for _ in range(n - order):
        u = (br.unary() << k) | br.r(k)
        res.append(u >> 1 if (u & 1) == 0 else -((u + 1) >> 1))
    if order == 0:
        out = res
    elif order == 1:
        for r in res:
            out.append(out[-1] + r)
    else:
        for r in res:
            out.append(2 * out[-1] - out[-2] + r)
    end = (br.pos + 7) // 8
    if _flac_crc16(frame[:end]) != int.from_bytes(frame[end : end + 2], "big"):
        raise ValueError("FLAC frame CRC-16 mismatch")
    return np.asarray(out, dtype=np.int64), rate


def synth_flac_payload(did: int, nchars: int) -> tuple[str, bytes]:
    """Deterministic FLAC payload for one document: a content-seeded
    chirp plus small integer noise — smooth enough that the order-2
    predictor usually wins, noisy enough that Rice quotients spread.
    Shared by the Spark kernel AND the pure-pandas fixture generator."""
    did, nchars = int(did), int(nchars)
    rng = np.random.default_rng(did + 41)
    n = 600 + nchars % 700
    t = np.arange(n)
    s = np.round(
        9000.0 * np.sin(t * (0.02 + (did % 7) * 0.005))
        + rng.integers(-40, 41, n)
    ).astype(np.int64)
    s = np.clip(s, -32768, 32767)
    return "audio", encode_flac(s)


def synth_mixed_payload(did: int, nchars: int) -> tuple[str, bytes]:
    """Deterministic MIXED-FORMAT payload: doc_id % 6 selects among
    all six real codecs (BMP, WAV, PNG, GIF, JPEG, FLAC) — the
    heterogeneous-corpus case a real media lake presents, where one
    scan must dispatch per row. Shared by the Spark kernel AND the
    pure-pandas fixture generator."""
    did = int(did)
    sel = did % 6
    if sel == 0:
        return synth_payload(did * 2, nchars)            # BMP (even path)
    if sel == 1:
        return synth_payload(did * 2 + 1, nchars)        # WAV (odd path)
    if sel == 2:
        return synth_png_payload(did, nchars)
    if sel == 3:
        return synth_gif_payload(did, nchars)
    if sel == 4:
        return synth_jpeg_payload(did, nchars)
    return synth_flac_payload(did, nchars)
