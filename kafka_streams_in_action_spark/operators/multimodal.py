"""Multimodal column discipline (SURVEY §2C C31).

The reference's pattern: payloads are opaque bytes with typed metadata beside
them (the Confluent wire format's magic/schema-id header — util/index.go:16-36;
the multi-event envelope's (key, value bytes, type) —
multi_event_proto_producer_client.go:10-13). We generalize that to media
columns: `binary` payload + a typed metadata struct + lazy decode behind
mapInPandas.

The codecs are REAL pure-python container parsers over genuinely encoded
bytes (no image/audio libs in this container, so the fixtures are encoded
in-pipeline too):

- BMP: 24bpp bottom-up Windows bitmaps with 4-byte row padding — the decoder
  validates the 'BM' magic, reads the pixel-array offset / dims / bpp from
  the BITMAPINFOHEADER, strips row padding, and un-flips the rows.
- WAV: RIFF/WAVE PCM16 mono — the decoder walks the chunk list to find
  'fmt ' and 'data' and derives sample count, duration, RMS.
- VID0: a minimal multi-frame container (magic + uint16 frame count/dims +
  raw frames) for the 1→N frame-sample fan-out shape.

Pixel/sample values are a deterministic arithmetic function of (doc_id,
byte position), so a DuckDB oracle can recompute every decoded feature
without parsing binaries — while the Spark side genuinely round-trips the
container format (a decoder that ignored padding, row order, or chunk
layout would hash-mismatch).

All kernels are Arrow-batched mapInPandas — one Python roundtrip per batch,
never per row; at 100 TB this is the only tenable decode shape. Swapping in
libjpeg/ffmpeg touches only the per-payload parse function.
"""

from __future__ import annotations

import struct

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def to_media_table(documents: DataFrame) -> DataFrame:
    """Lift documents into the media-column shape: payload bytes + metadata
    struct (format tag, byte size, source). Pure column algebra."""
    payload = F.encode("text", "UTF-8")
    return documents.select(
        "doc_id",
        payload.alias("payload"),
        F.struct(
            F.lit("text/plain").alias("format"),
            F.octet_length(payload).alias("n_bytes"),
            F.col("source").alias("source"),
        ).alias("meta"),
    )


def media_metadata(documents: DataFrame) -> DataFrame:
    """C31 oracle query: metadata projection of the media table — proves the
    binary lift/measure path without any Python."""
    m = to_media_table(documents)
    return m.select(
        "doc_id",
        F.col("meta.format").alias("format"),
        F.col("meta.n_bytes").alias("n_bytes"),
        F.col("meta.source").alias("source"),
    )


# ---------------------------------------------------------------------------
# deterministic fixture pixel/sample functions (shared with the oracles)
# ---------------------------------------------------------------------------

def _bmp_dims(doc_id: int, n_bytes: int) -> tuple[int, int]:
    """Image dims derived from the document: width 4..32, height 3..15 —
    width is deliberately often not a multiple of 4 so the BMP row padding
    path is really exercised."""
    return (n_bytes % 29) + 4, (doc_id % 13) + 3


def _pixel(doc_id: int, i):
    """Pixel byte at linear index i of the logical top-down BGR image."""
    return (doc_id * 31 + i * 7) % 256


def encode_bmp(doc_id: int, n_bytes: int) -> bytes:
    """A real 24bpp BMP: BITMAPFILEHEADER + BITMAPINFOHEADER + bottom-up
    pixel rows padded to 4 bytes (the actual on-disk Windows bitmap layout)."""
    import numpy as np

    w, h = _bmp_dims(doc_id, n_bytes)
    px = ((doc_id * 31 + np.arange(w * h * 3, dtype=np.int64) * 7) % 256) \
        .astype(np.uint8).reshape(h, w * 3)
    stride = (w * 3 + 3) // 4 * 4
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = px
    pixel_data = rows[::-1].tobytes()          # BMP stores rows bottom-up
    offset = 14 + 40
    file_header = struct.pack("<2sIHHI", b"BM", offset + len(pixel_data),
                              0, 0, offset)
    info_header = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0,
                              len(pixel_data), 2835, 2835, 0, 0)
    return file_header + info_header + pixel_data


def parse_bmp(payload: bytes):
    """Real BMP decode: validate magic, read offset/dims/bpp from the
    headers, strip per-row padding, un-flip bottom-up rows. Returns
    (width, height, logical top-down pixel bytes)."""
    import numpy as np

    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    offset = struct.unpack_from("<I", payload, 10)[0]
    hdr_size = struct.unpack_from("<I", payload, 14)[0]
    if hdr_size < 40:
        raise ValueError("unsupported BMP header")
    w = struct.unpack_from("<i", payload, 18)[0]
    h = struct.unpack_from("<i", payload, 22)[0]
    bpp = struct.unpack_from("<H", payload, 28)[0]
    compression = struct.unpack_from("<I", payload, 30)[0]
    if bpp != 24 or compression != 0:
        raise ValueError("only uncompressed 24bpp supported")
    bottom_up = h > 0
    h = abs(h)
    stride = (w * 3 + 3) // 4 * 4
    rows = np.frombuffer(payload, dtype=np.uint8,
                         count=h * stride, offset=offset).reshape(h, stride)
    rows = rows[:, : w * 3]
    if bottom_up:
        rows = rows[::-1]
    return w, h, rows


def to_bmp_media(documents: DataFrame) -> DataFrame:
    """documents → (doc_id, payload=real BMP bytes). The encoder is itself an
    Arrow-batched kernel; dims/pixels derive deterministically from
    (doc_id, octet_length(text)) so oracles can recompute features."""
    def encode(batches):
        import pandas as pd
        for pdf in batches:
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "payload": [
                    encode_bmp(int(d), len(bytes(p)))
                    for d, p in zip(pdf["doc_id"], pdf["payload"])
                ],
            })

    media = to_media_table(documents)
    return media.select("doc_id", "payload").mapInPandas(
        encode, schema="doc_id long, payload binary")


def decode_image(bmp_media: DataFrame) -> DataFrame:
    """C31a: real BMP decode → (width, height, mean_intensity). The mean is
    an exact integer pixel sum divided once — deterministic across engines."""
    def decode(batches):
        import pandas as pd
        for pdf in batches:
            out = {"doc_id": [], "width": [], "height": [],
                   "mean_intensity": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                w, h, rows = parse_bmp(bytes(payload))
                out["doc_id"].append(doc_id)
                out["width"].append(w)
                out["height"].append(h)
                out["mean_intensity"].append(
                    int(rows.astype("int64").sum()) / (w * h * 3))
            yield pd.DataFrame(out)

    return bmp_media.select("doc_id", "payload").mapInPandas(
        decode, schema="doc_id long, width int, height int, "
                       "mean_intensity double")


def resize_image(bmp_media: DataFrame, max_side: int = 16) -> DataFrame:
    """C31b: decode + aspect-preserving nearest-neighbor downscale on the
    REAL pixel matrix. Emits input/output dims, the resized byte budget, and
    the mean of the resized pixels (order-insensitive exact integer sum, so
    a SQL twin reproduces it from the pixel function + index math)."""
    def resize(batches):
        import numpy as np
        import pandas as pd
        for pdf in batches:
            out = {"doc_id": [], "width": [], "height": [],
                   "out_width": [], "out_height": [], "out_bytes": [],
                   "resized_mean": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                w, h, rows = parse_bmp(bytes(payload))
                img = rows.reshape(h, w, 3)
                scale = min(1.0, float(max_side) / max(w, h))
                ow, oh = max(1, int(w * scale)), max(1, int(h * scale))
                rr = (np.arange(oh, dtype=np.int64) * h) // oh
                cc = (np.arange(ow, dtype=np.int64) * w) // ow
                small = img[rr][:, cc]
                out["doc_id"].append(doc_id)
                out["width"].append(w)
                out["height"].append(h)
                out["out_width"].append(ow)
                out["out_height"].append(oh)
                out["out_bytes"].append(ow * oh * 3)
                out["resized_mean"].append(
                    int(small.astype("int64").sum()) / (ow * oh * 3))
            yield pd.DataFrame(out)

    return bmp_media.select("doc_id", "payload").mapInPandas(
        resize, schema="doc_id long, width int, height int, out_width int, "
                       "out_height int, out_bytes int, resized_mean double")


# ---------------------------------------------------------------------------
# multi-frame container (video-shaped): 1→N decode fan-out
# ---------------------------------------------------------------------------

def _vid_shape(doc_id: int, n_bytes: int) -> tuple[int, int, int]:
    """(n_frames 2..20, frame_w 4..8, frame_h 3..6)."""
    return (doc_id % 7) * 3 + 2, (doc_id % 5) + 4, (n_bytes % 4) + 3


def _frame_pixel(doc_id: int, f: int, i):
    return (doc_id * 17 + f * 101 + i * 3) % 256


def encode_video(doc_id: int, n_bytes: int) -> bytes:
    """Minimal real container: b'VID0' magic + LE uint16 (n_frames, w, h) +
    concatenated w*h-byte grayscale frames."""
    import numpy as np

    n_frames, w, h = _vid_shape(doc_id, n_bytes)
    frames = [
        ((doc_id * 17 + f * 101
          + np.arange(w * h, dtype=np.int64) * 3) % 256).astype(np.uint8)
        for f in range(n_frames)
    ]
    return (b"VID0" + struct.pack("<HHH", n_frames, w, h)
            + b"".join(fr.tobytes() for fr in frames))


def to_video_media(documents: DataFrame) -> DataFrame:
    def encode(batches):
        import pandas as pd
        for pdf in batches:
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "payload": [
                    encode_video(int(d), len(bytes(p)))
                    for d, p in zip(pdf["doc_id"], pdf["payload"])
                ],
            })

    media = to_media_table(documents)
    return media.select("doc_id", "payload").mapInPandas(
        encode, schema="doc_id long, payload binary")


def frame_sample(video_media: DataFrame, every_nth: int = 3) -> DataFrame:
    """C31c: parse the container header, sample every-nth frame, emit one row
    per sampled frame with its mean — the 1→N decode fan-out (mapInPandas
    yielding more rows than it receives), now over a real multi-frame
    payload with scalar, oracle-checkable output."""
    def sample(batches):
        import numpy as np
        import pandas as pd
        for pdf in batches:
            out = {"doc_id": [], "frame_no": [], "n_frames": [],
                   "frame_mean": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                if b[:4] != b"VID0":
                    raise ValueError("not a VID0 payload")
                n_frames, w, h = struct.unpack_from("<HHH", b, 4)
                fsize = w * h
                for f in range(0, n_frames, every_nth):
                    fr = np.frombuffer(b, dtype=np.uint8, count=fsize,
                                       offset=10 + f * fsize)
                    out["doc_id"].append(doc_id)
                    out["frame_no"].append(f)
                    out["n_frames"].append(n_frames)
                    out["frame_mean"].append(
                        int(fr.astype("int64").sum()) / fsize)
            yield pd.DataFrame(out)

    return video_media.select("doc_id", "payload").mapInPandas(
        sample, schema="doc_id long, frame_no int, n_frames int, "
                       "frame_mean double")


# ---------------------------------------------------------------------------
# audio (WAV / RIFF PCM16 mono)
# ---------------------------------------------------------------------------

SAMPLE_RATE = 8000


def _wav_n_samples(doc_id: int, n_bytes: int) -> int:
    return (n_bytes % 400) + 50


def _sample(doc_id: int, i):
    """Signed 16-bit sample in [-1024, 1023]."""
    return (doc_id * 13 + i * 29) % 2048 - 1024


def encode_wav(doc_id: int, n_bytes: int) -> bytes:
    """A real RIFF/WAVE file: 'fmt ' chunk (PCM, mono, 8 kHz, 16-bit) +
    'data' chunk of little-endian int16 samples."""
    import numpy as np

    n = _wav_n_samples(doc_id, n_bytes)
    samples = ((doc_id * 13 + np.arange(n, dtype=np.int64) * 29) % 2048
               - 1024).astype("<i2")
    data = samples.tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, SAMPLE_RATE, SAMPLE_RATE * 2, 2, 16)
    body = (b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def to_audio_media(documents: DataFrame) -> DataFrame:
    def encode(batches):
        import pandas as pd
        for pdf in batches:
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "payload": [
                    encode_wav(int(d), len(bytes(p)))
                    for d, p in zip(pdf["doc_id"], pdf["payload"])
                ],
            })

    media = to_media_table(documents)
    return media.select("doc_id", "payload").mapInPandas(
        encode, schema="doc_id long, payload binary")


def audio_stats(audio_media: DataFrame) -> DataFrame:
    """C31d: real RIFF chunk walk — find 'fmt ' and 'data', derive sample
    count, duration, RMS (exact integer sum of squares, one sqrt)."""
    def stats(batches):
        import math

        import numpy as np
        import pandas as pd
        for pdf in batches:
            out = {"doc_id": [], "n_samples": [], "duration_s": [],
                   "rms": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                if b[:4] != b"RIFF" or b[8:12] != b"WAVE":
                    raise ValueError("not a RIFF/WAVE payload")
                pos, rate, data = 12, None, None
                while pos + 8 <= len(b):
                    cid, clen = b[pos:pos + 4], \
                        struct.unpack_from("<I", b, pos + 4)[0]
                    if cid == b"fmt ":
                        fmt_code, channels, rate = struct.unpack_from(
                            "<HHI", b, pos + 8)
                        bits = struct.unpack_from("<H", b, pos + 22)[0]
                        if (fmt_code, channels, bits) != (1, 1, 16):
                            raise ValueError("only PCM16 mono supported")
                    elif cid == b"data":
                        data = b[pos + 8: pos + 8 + clen]
                    pos += 8 + clen + (clen & 1)   # RIFF chunks pad to even
                if rate is None or data is None:
                    raise ValueError("missing fmt/data chunk")
                s = np.frombuffer(data, dtype="<i2").astype("int64")
                n = len(s)
                out["doc_id"].append(doc_id)
                out["n_samples"].append(n)
                out["duration_s"].append(n / rate)
                # math.sqrt is IEEE correctly-rounded (pow(x, 0.5) is not);
                # the integer sum of squares is exact, so both engines see
                # the identical double
                out["rms"].append(math.sqrt(int((s * s).sum()) / n))
            yield pd.DataFrame(out)

    return audio_media.select("doc_id", "payload").mapInPandas(
        stats, schema="doc_id long, n_samples int, duration_s double, "
                      "rms double")


def _encode_bmp_from(w: int, h: int, rows) -> bytes:
    """Encode a logical top-down (h, w*3) uint8 pixel array as a real 24bpp
    BMP (same layout as encode_bmp, which remains the formula-driven
    fixture encoder)."""
    import numpy as np

    stride = (w * 3 + 3) // 4 * 4
    padded = np.zeros((h, stride), dtype=np.uint8)
    padded[:, : w * 3] = rows
    pixel_data = padded[::-1].tobytes()
    offset = 14 + 40
    file_header = struct.pack("<2sIHHI", b"BM", offset + len(pixel_data),
                              0, 0, offset)
    info_header = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0,
                              len(pixel_data), 2835, 2835, 0, 0)
    return file_header + info_header + pixel_data


def reencode_brightened(bmp_media: DataFrame, shift: int = 8,
                        id_offset: int = 10_000_000) -> DataFrame:
    """C31g helper: a REAL re-encode pass — decode each BMP, apply a
    clamped brightness shift (min(p + shift, 255), the lossy edit a
    screenshot/re-export pipeline introduces), encode back to BMP bytes
    under a new id. This is how the near-dup corpus gets genuine
    perturbed twins: byte-level containers all the way, not a formula
    shortcut."""
    def kernel(batches):
        import numpy as np
        import pandas as pd
        for pdf in batches:
            out = {"doc_id": [], "payload": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                w, h, rows = parse_bmp(bytes(payload))
                shifted = np.minimum(rows.astype(np.int64) + shift, 255) \
                    .astype(np.uint8)
                out["doc_id"].append(int(doc_id) + id_offset)
                out["payload"].append(_encode_bmp_from(w, h, shifted))
            yield pd.DataFrame(out)

    return bmp_media.select("doc_id", "payload").mapInPandas(
        kernel, schema="doc_id long, payload binary")


def dhash_images(bmp_media: DataFrame) -> DataFrame:
    """C31g: 64-bit difference hash (dHash) per image — THE standard
    perceptual fingerprint for image near-dup at corpus scale. Sample a
    9×8 grid (nearest-neighbor, gy = r·h//8, gx = c·w//9), cell value =
    exact integer sum of the 3 channel bytes, bit(r,c) = cell[r][c] <
    cell[r][c+1]. The hash is brightness-shift-invariant until clamping
    bites, so re-encoded twins land within a few bits of their source.
    Packed as two non-negative 32-bit halves (h0 = bits 0-31, h1 =
    32-63) so downstream band/XOR arithmetic never touches the BIGINT
    sign bit in either engine.

    After this kernel only 24-byte (img_id, h0, h1) rows ever shuffle —
    pixels stay in the scan stage, the Arrow batch is the only Python
    crossing. That is the 100 TB discipline: hash at the edge, join on
    fingerprints."""
    def kernel(batches):
        import numpy as np
        import pandas as pd
        w0 = (np.uint64(1) << np.arange(32, dtype=np.uint64))
        for pdf in batches:
            out = {"img_id": [], "h0": [], "h1": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                w, h, rows = parse_bmp(bytes(payload))
                gy = (np.arange(8) * h) // 8
                gx = (np.arange(9) * w) // 9
                cells = sum(
                    rows[np.ix_(gy, gx * 3 + ch)].astype(np.int64)
                    for ch in range(3))
                bits = (cells[:, :8] < cells[:, 1:]).astype(np.uint64) \
                    .reshape(64)
                out["img_id"].append(int(doc_id))
                out["h0"].append(int((bits[:32] * w0).sum()))
                out["h1"].append(int((bits[32:] * w0).sum()))
            yield pd.DataFrame(out)

    return bmp_media.select(F.col("doc_id"), "payload").mapInPandas(
        kernel, schema="img_id long, h0 long, h1 long")


def phash_near_dup(documents: DataFrame, max_hamming: int = 6,
                   every: int = 5) -> DataFrame:
    """C31g: perceptual-hash image near-duplicate detection, end to end —
    encode the corpus as real BMPs, add genuinely re-encoded
    brightness-shifted twins for every `every`-th image (the
    screenshot/re-export duplicates an image crawl actually contains),
    dHash everything, then find near pairs by 16-bit LSH banding on the
    hash + Hamming verification (bit_count over XOR, all JVM built-ins).

    Band width is the scale dial: 4×16-bit bands give expected random
    collisions n²/2¹⁷ per band — negligible through sf0.1 and sized for
    corpora to ~10⁸ images; a 100 TB crawl widens to 32-bit bands (2
    bands of the same 64-bit hash) exactly like MinHash-LSH re-bands.
    Candidate verification shuffles only (img_id, h0, h1) triples.

    FULL oracle: pixels are the deterministic fixture formula, the twin
    edit is least(p+8, 255), and grid/hash/band/XOR are integer
    arithmetic — DuckDB replays the entire pipeline including the final
    pair set, so the Spark side's byte-level BMP round-trip is verified
    against formula-derived ground truth."""
    media = to_bmp_media(documents)
    twins = reencode_brightened(
        media.filter(F.col("doc_id") % every == 0))
    corpus = media.select("doc_id", "payload").unionAll(twins)
    hashes = dhash_images(corpus)
    lo = F.lit(65536).cast("long")
    expl = hashes.select(
        "img_id", "h0", "h1",
        F.posexplode(F.array(
            F.col("h0") % lo, F.shiftright("h0", 16),
            F.col("h1") % lo, F.shiftright("h1", 16)))
        .alias("band_idx", "band_val"))
    a, b = expl.alias("a"), expl.alias("b")
    hamming = (F.bit_count(F.col("a.h0").bitwiseXOR(F.col("b.h0")))
               + F.bit_count(F.col("a.h1").bitwiseXOR(F.col("b.h1"))))
    return (
        a.join(b, (F.col("a.band_idx") == F.col("b.band_idx"))
               & (F.col("a.band_val") == F.col("b.band_val"))
               & (F.col("a.img_id") < F.col("b.img_id")))
        .select(F.col("a.img_id").alias("doc_a"),
                F.col("b.img_id").alias("doc_b"),
                hamming.cast("int").alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


def shot_detect(video_media: DataFrame, threshold: float = 122.0
                ) -> DataFrame:
    """C31h: frame-delta scene segmentation — the video twin of C31g's
    image fingerprint: decode every frame ONCE in the Arrow kernel,
    compute the mean-absolute-pixel-difference (MAD) between consecutive
    frames in-kernel (the previous frame stays resident — no per-frame
    shuffle, no frame bytes ever leave the scan stage), and emit one
    skinny (doc_id, frame_no, mad) row per transition. Shot boundaries
    (mad > threshold) and per-video segment counts are then plain
    DataFrame aggregation. At 100 TB: payload bytes are read exactly
    once, the shuffle carries 20-byte transition rows, and the kernel is
    the only Python crossing — swap the VID0 parse for ffmpeg keyframe
    iteration and nothing else changes.

    MAD is an exact integer absolute-difference sum divided once, so the
    DuckDB oracle replays it from the fixture pixel formula (the
    +101-per-frame wraparound makes transition MADs a deterministic mix
    of 101s and 155s straddling the threshold — both classes occur)."""
    def kernel(batches):
        import numpy as np
        import pandas as pd
        for pdf in batches:
            out = {"doc_id": [], "frame_no": [], "mad": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                if b[:4] != b"VID0":
                    raise ValueError("not a VID0 payload")
                n_frames, w, h = struct.unpack_from("<HHH", b, 4)
                fsize = w * h
                prev = None
                for f in range(n_frames):
                    fr = np.frombuffer(b, dtype=np.uint8, count=fsize,
                                       offset=10 + f * fsize) \
                        .astype(np.int64)
                    if prev is not None:
                        out["doc_id"].append(doc_id)
                        out["frame_no"].append(f)
                        out["mad"].append(
                            int(np.abs(fr - prev).sum()) / fsize)
                    prev = fr
            yield pd.DataFrame(out)

    deltas = video_media.select("doc_id", "payload").mapInPandas(
        kernel, schema="doc_id long, frame_no int, mad double")
    return (deltas.groupBy("doc_id")
            .agg((F.max("frame_no") + 1).alias("n_frames"),
                 (F.sum((F.col("mad") > threshold).cast("long")) + 1)
                 .cast("long").alias("n_shots"),
                 F.round(F.max("mad"), 6).alias("max_mad")))


def vad_segments(audio_media: DataFrame, frame_len: int = 64,
                 thresh_msq: int = 350_000) -> DataFrame:
    """C31i: energy-based voice-activity segmentation — split each PCM16
    stream into `frame_len`-sample frames (8 ms at 8 kHz), mark a frame
    active when its mean square energy clears `thresh_msq`, and emit
    maximal runs of active frames as segments. The audio counterpart of
    C31h's video shot detection: the run detection happens INSIDE the
    Arrow decode kernel, so payload bytes never shuffle — only the
    bounded (doc, segment) rows leave the scan.

    Engine-exact: frame energy is an exact integer sum of squares and
    the activity test compares ssq ≥ thresh·len in integers (no mean
    division); the oracle rebuilds the same frames from the sample
    formula and finds the same runs with a gaps-and-islands window."""
    def kernel(batches):
        import numpy as np
        import pandas as pd
        for pdf in batches:
            out = {"doc_id": [], "seg_idx": [], "start_frame": [],
                   "n_frames": [], "ssq": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                if b[:4] != b"RIFF" or b[8:12] != b"WAVE":
                    raise ValueError("not a RIFF/WAVE payload")
                pos, data = 12, None
                while pos + 8 <= len(b):
                    cid = b[pos:pos + 4]
                    clen = struct.unpack_from("<I", b, pos + 4)[0]
                    if cid == b"data":
                        data = b[pos + 8: pos + 8 + clen]
                    pos += 8 + clen + (clen & 1)
                if data is None:
                    raise ValueError("missing data chunk")
                s = np.frombuffer(data, dtype="<i2").astype("int64")
                run_start, run_len, run_ssq, seg_idx = None, 0, 0, 0
                for f in range(0, (len(s) + frame_len - 1) // frame_len):
                    chunk = s[f * frame_len:(f + 1) * frame_len]
                    ssq = int((chunk * chunk).sum())
                    if ssq >= thresh_msq * len(chunk):
                        if run_start is None:
                            run_start, run_len, run_ssq = f, 0, 0
                        run_len += 1
                        run_ssq += ssq
                    elif run_start is not None:
                        seg_idx += 1
                        out["doc_id"].append(doc_id)
                        out["seg_idx"].append(seg_idx)
                        out["start_frame"].append(run_start)
                        out["n_frames"].append(run_len)
                        out["ssq"].append(run_ssq)
                        run_start = None
                if run_start is not None:
                    seg_idx += 1
                    out["doc_id"].append(doc_id)
                    out["seg_idx"].append(seg_idx)
                    out["start_frame"].append(run_start)
                    out["n_frames"].append(run_len)
                    out["ssq"].append(run_ssq)
            yield pd.DataFrame(out)

    return audio_media.select("doc_id", "payload").mapInPandas(
        kernel, schema="doc_id long, seg_idx int, start_frame int, "
                       "n_frames int, ssq long")


def downsample_audio(audio_media: DataFrame, factor: int = 2) -> DataFrame:
    """C31j: audio decimation — keep every `factor`-th PCM sample,
    re-encode a REAL RIFF/WAVE at the reduced rate, then decode the
    re-encoded payload again and verify it round-trips (the write-path
    proof the image side has in resize_image/reencode_brightened, now
    for audio). All three steps happen inside one Arrow kernel, so
    payload bytes never shuffle; the emitted row is the per-doc verdict
    plus the decimated stream's exact integer energy, which the oracle
    recomputes from the synth formula over the even-index samples."""
    def kernel(batches):
        import numpy as np
        import pandas as pd
        for pdf in batches:
            out = {"doc_id": [], "n_in": [], "n_out": [],
                   "rate_out": [], "roundtrip_ok": [], "ssq_out": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                if b[:4] != b"RIFF" or b[8:12] != b"WAVE":
                    raise ValueError("not a RIFF/WAVE payload")
                pos, rate, data = 12, None, None
                while pos + 8 <= len(b):
                    cid = b[pos:pos + 4]
                    clen = struct.unpack_from("<I", b, pos + 4)[0]
                    if cid == b"fmt ":
                        rate = struct.unpack_from("<I", b, pos + 12)[0]
                    elif cid == b"data":
                        data = b[pos + 8: pos + 8 + clen]
                    pos += 8 + clen + (clen & 1)
                s = np.frombuffer(data, dtype="<i2")
                dec = s[::factor]
                new_rate = rate // factor
                fmt = struct.pack("<HHIIHH", 1, 1, new_rate,
                                  new_rate * 2, 2, 16)
                body = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt))
                        + fmt + b"data"
                        + struct.pack("<I", dec.nbytes) + dec.tobytes())
                wav = b"RIFF" + struct.pack("<I", len(body)) + body
                # decode what was just written — the actual bytes prove
                # the writer, not the in-memory array
                back = np.frombuffer(
                    wav[len(wav) - dec.nbytes:], dtype="<i2")
                ok = bool((back == dec).all()) and \
                    wav[:4] == b"RIFF" and len(wav) == 8 + len(body)
                out["doc_id"].append(doc_id)
                out["n_in"].append(len(s))
                out["n_out"].append(len(dec))
                out["rate_out"].append(new_rate)
                out["roundtrip_ok"].append(ok)
                out["ssq_out"].append(
                    int((dec.astype("int64") ** 2).sum()))
            yield pd.DataFrame(out)

    return audio_media.select("doc_id", "payload").mapInPandas(
        kernel, schema="doc_id long, n_in int, n_out int, rate_out int, "
                       "roundtrip_ok boolean, ssq_out long")


def exposure_stats(bmp_media: DataFrame) -> DataFrame:
    """C31k: exposure audit — per-image BT.601 integer luma histogram
    tails (under-exposed y < 64, over-exposed y ≥ 192) computed INSIDE
    the Arrow decode kernel, so payload bytes never shuffle — the
    quality gate a vision-data pipeline runs before spending GPU time
    on unusable frames (same kernel discipline as shot detection and
    VAD). Luma is the pure-integer BT.601 form (77R + 150G + 29B) >> 8
    on the decoded BGR bytes; counts are exact and the two fractions
    spend one correctly-rounded division each, so the DuckDB oracle
    recomputes everything from the fixture pixel formula."""
    def kernel(batches):
        import numpy as np
        import pandas as pd
        for pdf in batches:
            out = {"doc_id": [], "width": [], "height": [],
                   "n_px": [], "n_under": [], "n_over": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                w, h, rows = parse_bmp(bytes(payload))
                px = rows.reshape(-1, 3).astype("int64")  # BGR triplets
                y = (77 * px[:, 2] + 150 * px[:, 1] + 29 * px[:, 0]) // 256
                out["doc_id"].append(doc_id)
                out["width"].append(w)
                out["height"].append(h)
                out["n_px"].append(w * h)
                out["n_under"].append(int((y < 64).sum()))
                out["n_over"].append(int((y >= 192).sum()))
            yield pd.DataFrame(out)

    stats = bmp_media.select("doc_id", "payload").mapInPandas(
        kernel, schema="doc_id long, width int, height int, n_px long, "
                       "n_under long, n_over long")
    return stats.select(
        "doc_id", "width", "height", "n_px", "n_under", "n_over",
        (F.col("n_under").cast("double") / F.col("n_px").cast("double"))
        .alias("under_frac"),
        (F.col("n_over").cast("double") / F.col("n_px").cast("double"))
        .alias("over_frac"))


def parse_wav(payload: bytes):
    """Real RIFF chunk walk shared by the audio kernels: find 'fmt '
    and 'data', validate PCM16 mono, return (rate, int16 samples)."""
    import numpy as np

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, rate, data = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos:pos + 4]
        clen = struct.unpack_from("<I", payload, pos + 4)[0]
        if cid == b"fmt ":
            fmt_code, channels, rate = struct.unpack_from(
                "<HHI", payload, pos + 8)
            bits = struct.unpack_from("<H", payload, pos + 22)[0]
            if (fmt_code, channels, bits) != (1, 1, 16):
                raise ValueError("only PCM16 mono supported")
        elif cid == b"data":
            data = payload[pos + 8: pos + 8 + clen]
        pos += 8 + clen + (clen & 1)       # RIFF chunks pad to even
    if rate is None or data is None:
        raise ValueError("missing fmt/data chunk")
    return rate, np.frombuffer(data, dtype="<i2")


def clipping_stats(audio_media: DataFrame,
                   threshold: int = 900) -> DataFrame:
    """C31l: audio clipping / hot-signal audit — per clip, the fraction
    of samples at or beyond `threshold` of full scale and the absolute
    peak, computed INSIDE the Arrow decode kernel (payload bytes never
    shuffle) — the recording-quality gate that pairs with C31i's VAD
    the way C31k's exposure audit pairs with shot detection: silence
    tells you nothing was said, clipping tells you it was said too
    loud to use. The fixture's full scale is ±1024, so the default
    threshold flags the top ~12% of the dynamic range. All counts
    exact; the fraction is one correctly-rounded division; the oracle
    recomputes everything from the synth sample formula."""
    def kernel(batches):
        import numpy as np
        import pandas as pd
        for pdf in batches:
            out = {"doc_id": [], "n_samples": [], "n_hot": [],
                   "peak_abs": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                _rate, samples = parse_wav(bytes(payload))
                s = samples.astype("int64")
                out["doc_id"].append(doc_id)
                out["n_samples"].append(len(s))
                out["n_hot"].append(int((np.abs(s) >= threshold).sum()))
                out["peak_abs"].append(int(np.abs(s).max()))
            yield pd.DataFrame(out)

    stats = audio_media.select("doc_id", "payload").mapInPandas(
        kernel, schema="doc_id long, n_samples long, n_hot long, "
                       "peak_abs long")
    return stats.select(
        "doc_id", "n_samples", "n_hot", "peak_abs",
        (F.col("n_hot").cast("double") / F.col("n_samples").cast("double"))
        .alias("hot_frac"))


def format_sniff_audit(documents: DataFrame) -> DataFrame:
    """C31m: magic-byte format sniffing vs declared type — the ingestion
    gate every multimodal corpus needs: payloads arrive with a DECLARED
    format column that lies (mislabeled uploads) or points at truncated
    bytes, and downstream decoders must route on what the bytes say,
    not the label. Fixture: doc_id%3 picks the real codec
    (BMP/RIFF-WAVE/VID0), doc_id%11==0 declares the NEXT codec's label
    (a lie), doc_id%7==0 truncates the payload to one byte (no magic
    survives); the sniffer reads leading magic bytes only ('BM', 'RIFF',
    'VID0', else unknown). Output: the (declared, sniffed) confusion
    grid with counts — mismatch rows are the quarantine queue.

    Scale: encode + truncate + sniff all happen inside one Arrow kernel
    — payload bytes NEVER shuffle; only the ≤4×4 label grid aggregates.
    The fixture arithmetic doubles as the oracle's spec (pure doc_id
    modular rules — reference for the byte layouts:
    multimodal.py:encode_bmp/encode_wav/encode_video)."""
    _FMT = ["bmp", "wav", "video"]
    _ENC = {"bmp": encode_bmp, "wav": encode_wav, "video": encode_video}

    def kernel(batches):
        import pandas as pd
        for pdf in batches:
            decl, sniff = [], []
            for did, p in zip(pdf["doc_id"], pdf["payload"]):
                did = int(did)
                n = len(bytes(p))
                real = _FMT[did % 3]
                payload = _ENC[real](did, n)
                if did % 7 == 0:
                    payload = payload[:1]
                declared = _FMT[(did + 1) % 3] if did % 11 == 0 else real
                if payload[:2] == b"BM":
                    s = "bmp"
                elif payload[:4] == b"RIFF":
                    s = "wav"
                elif payload[:4] == b"VID0":
                    s = "video"
                else:
                    s = "unknown"
                decl.append(declared)
                sniff.append(s)
            yield pd.DataFrame({"declared": pd.array(decl, dtype="string"),
                                "sniffed": pd.array(sniff, dtype="string")})

    media = to_media_table(documents)
    tagged = media.select("doc_id", "payload").mapInPandas(
        kernel, schema="declared string, sniffed string")
    return (tagged.groupBy("declared", "sniffed")
            .agg(F.count(F.lit(1)).alias("n"))
            .withColumn("is_mismatch",
                        F.col("declared") != F.col("sniffed")))


def letterbox_media(documents: DataFrame) -> DataFrame:
    """C31n fixture arm: encode each document's BMP and blacken
    top/bottom bars by the modular rule top = doc_id % 2,
    bottom = (doc_id // 2) % 2 (≤1 each, always < the ≥3-row height) —
    encode + mutate in ONE Arrow kernel so payloads never leave it."""
    def encode(batches):
        import numpy as np
        import pandas as pd
        for pdf in batches:
            payloads = []
            for d, p in zip(pdf["doc_id"], pdf["payload"]):
                d = int(d)
                w, h, rows = parse_bmp(encode_bmp(d, len(bytes(p))))
                rows = np.array(rows)
                top, bottom = d % 2, (d // 2) % 2
                if top:
                    rows[:top] = 0
                if bottom:
                    rows[h - bottom:] = 0
                payloads.append(_encode_bmp_from(w, h, rows))
            yield pd.DataFrame({"doc_id": pdf["doc_id"],
                                "payload": payloads})

    media = to_media_table(documents)
    return media.select("doc_id", "payload").mapInPandas(
        encode, schema="doc_id long, payload binary")


def letterbox_detect(bmp_media: DataFrame) -> DataFrame:
    """C31n: letterbox detection — count leading/trailing all-black
    pixel rows INSIDE the Arrow decode kernel (payload bytes never
    shuffle; the exposure/VAD kernel discipline). The crop-before-train
    gate a vision pipeline runs: black bars waste patch budget and
    poison aspect-ratio statistics. The fixture's content rows are
    provably never all-zero (the pixel formula steps by 7 mod 256, so
    ≥12 consecutive zero bytes are impossible), which is what lets the
    DuckDB oracle state the bar counts as the modular rule itself —
    the detector must EARN the same numbers from the pixels."""
    def kernel(batches):
        import numpy as np
        import pandas as pd
        for pdf in batches:
            out = {"doc_id": [], "width": [], "height": [],
                   "top_bars": [], "bottom_bars": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                w, h, rows = parse_bmp(bytes(payload))
                zero = ~np.asarray(rows).any(axis=1)
                top = 0
                while top < h and zero[top]:
                    top += 1
                bottom = 0
                while bottom < h - top and zero[h - 1 - bottom]:
                    bottom += 1
                out["doc_id"].append(doc_id)
                out["width"].append(w)
                out["height"].append(h)
                out["top_bars"].append(top)
                out["bottom_bars"].append(bottom)
            yield pd.DataFrame(out)

    stats = bmp_media.select("doc_id", "payload").mapInPandas(
        kernel, schema="doc_id long, width int, height int, "
                       "top_bars int, bottom_bars int")
    return stats.select(
        "doc_id", "width", "height", "top_bars", "bottom_bars",
        (F.col("height") - F.col("top_bars") - F.col("bottom_bars"))
        .cast("int").alias("content_height"),
        ((F.col("top_bars") + F.col("bottom_bars")) > 0)
        .alias("letterboxed"))


def blur_scores(bmp_media: DataFrame) -> DataFrame:
    """C31p: blur scoring — variance of the 4-neighbor Laplacian of the
    integer gray image (variance-of-Laplacian, the standard focus/blur
    gate a vision-data pipeline runs before spending encoder compute: a
    defocused frame has no high-frequency response, so the Laplacian
    variance collapses). Decode + convolve + reduce happen INSIDE one
    Arrow kernel (payload bytes never shuffle — the exposure/letterbox
    discipline); only (doc_id, dims, three integer sums) leave it.

    Exact: gray = B+G+R per pixel (≤ 765), L = 4g − up − down − left −
    right on interior pixels (|L| ≤ 3060), and the emitted sufficient
    statistics (n, ΣL, ΣL²) are BIGINTs, so blur_var = (n·ΣL² − (ΣL)²)
    / n² is ONE division of exact integers (both ≲ 1.5e12, inside 2^53
    — IEEE-identical everywhere). The fixture pixels are a closed
    modular formula of (doc_id, byte index), which is what lets the
    DuckDB oracle recompute the same Laplacian without touching BMP
    bytes — the kernel must EARN the numbers from a real decode."""
    def kernel(batches):
        import numpy as np
        import pandas as pd
        for pdf in batches:
            out = {"doc_id": [], "width": [], "height": [],
                   "n_interior": [], "lap_sum": [], "lap_sq_sum": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                w, h, rows = parse_bmp(bytes(payload))
                g = (np.asarray(rows, dtype=np.int64)
                     .reshape(h, w, 3).sum(axis=2))
                lap = (4 * g[1:-1, 1:-1]
                       - g[:-2, 1:-1] - g[2:, 1:-1]
                       - g[1:-1, :-2] - g[1:-1, 2:])
                out["doc_id"].append(doc_id)
                out["width"].append(w)
                out["height"].append(h)
                out["n_interior"].append(int(lap.size))
                out["lap_sum"].append(int(lap.sum()))
                out["lap_sq_sum"].append(int((lap * lap).sum()))
            yield pd.DataFrame(out)

    stats = bmp_media.select("doc_id", "payload").mapInPandas(
        kernel, schema="doc_id long, width int, height int, "
                       "n_interior long, lap_sum long, lap_sq_sum long")
    n, s, ss = (F.col("n_interior"), F.col("lap_sum"),
                F.col("lap_sq_sum"))
    # a degenerate frame (width or height < 3) has no interior: NULL
    # score, never an ANSI divide-by-zero (the hits() posture)
    return stats.select(
        "doc_id", "width", "height", "n_interior",
        "lap_sum", "lap_sq_sum",
        F.when(n > 0,
               (n * ss - s * s).cast("double")
               / (n * n).cast("double")).alias("blur_var"))


def snr_estimate(audio_media: DataFrame, frame_len: int = 64,
                 thresh_msq: int = 350_000) -> DataFrame:
    """C31q: signal-to-noise estimate — the audio-QA gate beside C31i's
    VAD and C31l's clipping: mean frame energy of the ACTIVE frames
    (the C31i activity rule, ssq ≥ thresh·len) over mean energy of the
    inactive frames. A recording whose "speech" barely clears its own
    noise floor is transcription poison and gets filtered before ASR
    spend. Decode + frame + classify + reduce inside ONE Arrow kernel
    (payload bytes never shuffle); only the six-integer sufficient
    stats leave it.

    Engine-exact: both powers are exact integer (Σssq, Σsamples)
    pairs, and the SNR is a single cross-multiplied ratio of exact
    integers — snr_ratio = (speech_ssq·noise_n)/(noise_ssq·speech_n) —
    as one string-bridged division (products can pass 2^53). All-
    active or all-quiet streams emit NULL (no meaningful floor). The
    dB form is deliberately NOT emitted: log10 is not cross-engine
    bit-stable, and the ratio carries the same decision."""
    def kernel(batches):
        import numpy as np
        import pandas as pd
        for pdf in batches:
            out = {"doc_id": [], "n_frames": [], "n_active": [],
                   "speech_ssq": [], "speech_n": [],
                   "noise_ssq": [], "noise_n": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                if b[:4] != b"RIFF" or b[8:12] != b"WAVE":
                    raise ValueError("not a RIFF/WAVE payload")
                pos, data = 12, None
                while pos + 8 <= len(b):
                    cid = b[pos:pos + 4]
                    clen = struct.unpack_from("<I", b, pos + 4)[0]
                    if cid == b"data":
                        data = b[pos + 8: pos + 8 + clen]
                    pos += 8 + clen + (clen & 1)
                if data is None:
                    raise ValueError("missing data chunk")
                s = np.frombuffer(data, dtype="<i2").astype("int64")
                nf = (len(s) + frame_len - 1) // frame_len
                sp_ssq = sp_n = nz_ssq = nz_n = n_act = 0
                for f in range(nf):
                    chunk = s[f * frame_len:(f + 1) * frame_len]
                    ssq = int((chunk * chunk).sum())
                    if ssq >= thresh_msq * len(chunk):
                        sp_ssq += ssq
                        sp_n += len(chunk)
                        n_act += 1
                    else:
                        nz_ssq += ssq
                        nz_n += len(chunk)
                out["doc_id"].append(doc_id)
                out["n_frames"].append(nf)
                out["n_active"].append(n_act)
                out["speech_ssq"].append(sp_ssq)
                out["speech_n"].append(sp_n)
                out["noise_ssq"].append(nz_ssq)
                out["noise_n"].append(nz_n)
            yield pd.DataFrame(out)

    stats = audio_media.select("doc_id", "payload").mapInPandas(
        kernel, schema="doc_id long, n_frames int, n_active int, "
                       "speech_ssq long, speech_n long, "
                       "noise_ssq long, noise_n long")
    sb = lambda c: c.cast("string").cast("double")  # noqa: E731
    # DECIMAL(38,0) operands: ssq·n passes 2^63 for hour-scale PCM16
    # (the acf_daily operand discipline)
    dec = "decimal(38,0)"
    num = F.col("speech_ssq").cast(dec) * F.col("noise_n")
    den = F.col("noise_ssq").cast(dec) * F.col("speech_n")
    return stats.select(
        "doc_id", "n_frames", "n_active",
        "speech_ssq", "speech_n", "noise_ssq", "noise_n",
        F.when(den > 0, sb(num) / sb(den)).alias("snr_ratio"))


def dominant_colors(bmp_media: DataFrame) -> DataFrame:
    """C31 addendum (round 13): dominant-color extraction from a REAL
    in-kernel BMP decode — each pixel quantizes to a 64-cell color cube
    (2 bits per BGR channel: code = (B/64)·16 + (G/64)·4 + (R/64)) and
    the modal cell wins, lowest code on ties. The thumbnail/palette
    primer a vision-data pipeline runs before clustering by color or
    filtering flat synthetic frames (a single dominant cell at share
    ~1.0 is a solid-color image — screenshot chrome, letterbox fill,
    test cards).

    Decode + quantize + histogram + argmax happen INSIDE one Arrow
    kernel (payload bytes never shuffle — the blur/exposure
    discipline); only (doc_id, dims, modal code, counts) leave it. The
    share is ONE division of exact integers; the fixture pixels are the
    closed modular formula of (doc_id, byte index), which is what lets
    the DuckDB oracle recompute the same histogram without touching BMP
    bytes — the kernel must EARN the numbers from a real decode."""
    def kernel(batches):
        import numpy as np
        import pandas as pd
        for pdf in batches:
            out = {"doc_id": [], "width": [], "height": [],
                   "dom_code": [], "dom_count": [], "n_pixels": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                w, h, rows = parse_bmp(bytes(payload))
                px = np.asarray(rows, dtype=np.int64).reshape(h, w, 3)
                code = (px[:, :, 0] // 64) * 16 + (px[:, :, 1] // 64) * 4 \
                    + (px[:, :, 2] // 64)
                hist = np.bincount(code.ravel(), minlength=64)
                dom = int(np.argmax(hist))  # first max = lowest code
                out["doc_id"].append(doc_id)
                out["width"].append(w)
                out["height"].append(h)
                out["dom_code"].append(dom)
                out["dom_count"].append(int(hist[dom]))
                out["n_pixels"].append(int(w * h))
            yield pd.DataFrame(out)

    stats = bmp_media.select("doc_id", "payload").mapInPandas(
        kernel, schema="doc_id long, width int, height int, "
                       "dom_code int, dom_count long, n_pixels long")
    return stats.select(
        "doc_id", "width", "height", "dom_code", "dom_count", "n_pixels",
        (F.col("dom_count").cast("double")
         / F.col("n_pixels").cast("double")).alias("dom_share"))


def tile_stats(bmp_media: DataFrame, gx: int = 4, gy: int = 3) -> DataFrame:
    """C31 addendum (round 15): patch/tile grid extraction — the
    ViT-style preprocessing step (image → fixed gx×gy patch grid →
    per-patch statistics) that precedes any visual encoder in a
    multimodal training pipeline. Decodes the REAL BMP pixel matrix
    in the Arrow kernel, assigns each pixel column x to tile
    tx = x·gx div w and row y to ty = y·gy div h (pure integer
    monotone partition — both engines replay it), and emits per tile
    the byte count, the exact BGR byte sum, and the milli-mean as ONE
    integer division.

    Scale: in-kernel fan-out of 1 → gx·gy bounded rows per image, zero
    shuffle (the c31_exposure posture); payload bytes never leave the
    kernel. The oracle recomputes every tile sum from the fixture
    pixel formula with the same tile-index arithmetic."""
    def tiles(batches):
        import numpy as np
        import pandas as pd
        for pdf in batches:
            out = {"doc_id": [], "tile_x": [], "tile_y": [],
                   "n_bytes": [], "sum_val": [], "mean_milli": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                w, h, rows = parse_bmp(bytes(payload))
                px = rows.reshape(h, w, 3).astype(np.int64)
                tx = (np.arange(w) * gx) // w
                ty = (np.arange(h) * gy) // h
                for t_y in range(gy):
                    ys = ty == t_y
                    for t_x in range(gx):
                        xs = tx == t_x
                        tile = px[np.ix_(ys, xs)]
                        n = int(tile.size)
                        s = int(tile.sum())
                        out["doc_id"].append(doc_id)
                        out["tile_x"].append(t_x)
                        out["tile_y"].append(t_y)
                        out["n_bytes"].append(n)
                        out["sum_val"].append(s)
                        out["mean_milli"].append(s * 1000 // n)
            yield pd.DataFrame(out)

    return bmp_media.select("doc_id", "payload").mapInPandas(
        tiles, schema="doc_id long, tile_x int, tile_y int, "
                      "n_bytes long, sum_val long, mean_milli long")


def augment_crops(bmp_media: DataFrame) -> DataFrame:
    """C31t (round 16): deterministic TRAINING AUGMENTATION plumbing —
    seeded random-crop + horizontal-flip over real decoded images, the
    per-sample transform every vision-pretraining loader applies. The
    kernel genuinely decodes the BMP container, slices the crop window
    out of the pixel ndarray, applies the flip, and reports features
    computed FROM THE AUGMENTED ARRAY (crop pixel sum; the post-flip
    top-left corner byte — flip-variant, so a kernel that skipped the
    flip hash-mismatches), so the Spark-side plumbing (Arrow batches,
    binary payloads never shuffling, per-sample param derivation) is
    exactly what a real loader swaps torchvision into.

    Seeding: crop origin and flip bit derive from md5(doc_id) — the
    per-sample seeded-RNG discipline (reproducible augmentation across
    epochs and engines); crop size is half the image (floor, min 1).
    An oracle replays every output from the fixture pixel function +
    the same md5 arithmetic, no binary parsing needed.

    Scale: one Arrow pass, 1→1, no shuffle; the payload column never
    leaves the scan-side task."""
    def kernel(batches):
        import hashlib

        import pandas as pd
        for pdf in batches:
            out = {"doc_id": [], "width": [], "height": [],
                   "crop_x": [], "crop_y": [], "crop_w": [], "crop_h": [],
                   "flipped": [], "crop_sum": [], "corner_px": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                w, h, rows = parse_bmp(bytes(payload))
                img = rows.reshape(h, w, 3)
                hx = hashlib.md5(str(int(doc_id)).encode()).hexdigest()
                h1 = int(hx[:8], 16)
                h2 = int(hx[8:16], 16)
                cw, ch = max(1, w // 2), max(1, h // 2)
                x0 = h1 % (w - cw + 1)
                y0 = h2 % (h - ch + 1)
                flip = h1 % 2 == 1
                crop = img[y0:y0 + ch, x0:x0 + cw]
                if flip:
                    crop = crop[:, ::-1]
                out["doc_id"].append(doc_id)
                out["width"].append(w)
                out["height"].append(h)
                out["crop_x"].append(x0)
                out["crop_y"].append(y0)
                out["crop_w"].append(cw)
                out["crop_h"].append(ch)
                out["flipped"].append(bool(flip))
                out["crop_sum"].append(int(crop.astype("int64").sum()))
                out["corner_px"].append(int(crop[0, 0, 0]))
            yield pd.DataFrame(out)

    return bmp_media.select("doc_id", "payload").mapInPandas(
        kernel, schema="doc_id long, width int, height int, crop_x int, "
                       "crop_y int, crop_w int, crop_h int, "
                       "flipped boolean, crop_sum long, corner_px int")
