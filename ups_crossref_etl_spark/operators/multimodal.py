"""Multimodal column plumbing: image/audio/video as opaque ``binary``
payloads + typed metadata (``schemas.media_schema``).

The Spark side — schema, partition discipline, Arrow batch shapes, UDF
signatures — is real and tested. The actual codecs (PIL/ffmpeg/librosa) are
NOT in this container, so the decode kernels are stubbed: by default they
raise ``NotImplementedError``; with ``fake=True`` they produce deterministic
fake features so the distributed plumbing can be exercised end-to-end.

Scale design: ``mapInPandas`` streams Arrow record batches through the
decoder so one task never materializes more than a batch of blobs;
``spark.sql.files.maxPartitionBytes`` bounds per-task input, and binary
payloads ride Parquet as-is (no base64 inflation).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# feat as double (not float32): the fake kernel's byte arithmetic is part
# of the driver-checkable contract (q_media_decode_features), and float32
# truncation would reintroduce ulp noise the oracle can't reproduce.
IMAGE_FEATURE_SCHEMA = (
    "asset_id bigint, modality string, n_bytes int, feat array<double>, decode_ok boolean"
)

FRAME_SAMPLE_SCHEMA = "asset_id bigint, frame_idx int, frame_feat array<double>"


def _fake_feature(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in for a decoded-image embedding: bytes → stable
    pseudo-features. Replaces the real decode(resize(payload)) kernel."""
    if payload is None:
        return [0.0] * dim
    arr = np.frombuffer(payload[: dim * 4].ljust(dim * 4, b"\0"), dtype=np.uint8)
    chunks = arr.reshape(dim, -1).astype(np.float64).mean(axis=1)
    return [float(round(c / 255.0, 6)) for c in chunks]


def extract_features(df: DataFrame, fake: bool = False, dim: int = 8) -> DataFrame:
    """Decode + feature-extract each asset via mapInPandas (Arrow batches).

    Real deployment: replace the kernel body with PIL/torchvision decode →
    resize → encoder. Not available in this container.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "image/audio decode requires codec libs not present in "
                    "this container; run with fake=True to exercise plumbing"
                )
            out = pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "modality": pdf["modality"],
                    "n_bytes": pdf["payload"].map(lambda p: 0 if p is None else len(p)),
                    "feat": pdf["payload"].map(lambda p: _fake_feature(p, dim)),
                    "decode_ok": pdf["payload"].notna(),
                }
            )
            yield out

    return df.select("asset_id", "modality", "payload").mapInPandas(
        kernel, IMAGE_FEATURE_SCHEMA
    )


def sample_frames(df: DataFrame, every_ms: int = 1000, fake: bool = False) -> DataFrame:
    """Video frame sampling: one output row per sampled frame. Stubbed the
    same way; the real kernel seeks the container format per batch."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError("video decode not available in container")
            rows = []
            for _, r in pdf.iterrows():
                n_frames = max(1, int((r["duration_ms"] or 0) // every_ms))
                for i in range(n_frames):
                    rows.append(
                        {
                            "asset_id": r["asset_id"],
                            "frame_idx": i,
                            "frame_feat": _fake_feature(r["payload"], 4),
                        }
                    )
            yield pd.DataFrame(rows, columns=["asset_id", "frame_idx", "frame_feat"])

    return df.filter(F.col("modality") == "video").mapInPandas(kernel, FRAME_SAMPLE_SCHEMA)


AUDIO_FEATURE_SCHEMA = (
    "asset_id bigint, n_samples bigint, duration_s double, "
    "rms double, peak double, decode_ok boolean"
)


def extract_audio_features(
    df: DataFrame, sample_rate: int = 16_000, fake: bool = False
) -> DataFrame:
    """Audio decode + waveform stats via mapInPandas: sample count,
    duration at ``sample_rate``, RMS and peak amplitude — the triage
    features a speech-data pipeline filters on before transcription.
    Real kernel = soundfile/librosa decode (absent in this container);
    ``fake=True`` treats the payload bytes as int8 PCM — deterministic,
    so the batch plumbing and schema are tested for real.

    Outputs are deliberately UNrounded: for int8 PCM every wave value is
    k/128 (an exact binary fraction), so sums/means/max are bit-exact and
    an SQL oracle recomputing them lands on the identical doubles —
    rounding would only reintroduce engine-dependent tie-breaking (Python
    banker's vs SQL half-away diverge at decimal ties like 157/16000)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "audio decode requires codec libs not present in this "
                    "container; run with fake=True to exercise plumbing"
                )
            rows = []
            for _, r in pdf.iterrows():
                p = r["payload"]
                if p is None or len(p) == 0:
                    rows.append((r["asset_id"], 0, 0.0, 0.0, 0.0, False))
                    continue
                wave = np.frombuffer(bytes(p), dtype=np.int8).astype(np.float64)
                wave = wave / 128.0
                rows.append(
                    (
                        r["asset_id"],
                        len(wave),
                        len(wave) / sample_rate,
                        float(np.sqrt(np.mean(wave * wave))),
                        float(np.max(np.abs(wave))),
                        True,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "asset_id", "n_samples", "duration_s", "rms", "peak", "decode_ok",
                ],
            )

    return df.filter(F.col("modality") == "audio").mapInPandas(
        kernel, AUDIO_FEATURE_SCHEMA
    )


WAV_FEATURE_SCHEMA = (
    "asset_id bigint, n_samples bigint, sample_rate int, duration_s double, "
    "rms double, peak double, decode_ok boolean"
)


def wav_encode_pcm16(samples: list[int], rate: int = 8000) -> bytes:
    """Build a real RIFF/WAVE file (PCM, 16-bit, mono) from int16 sample
    values — pure stdlib (``wave`` + ``struct``), used by tests and the
    gate query's synth stage to manufacture genuine WAV payloads."""
    import io
    import struct
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(struct.pack(f"<{len(samples)}h", *samples))
    return buf.getvalue()


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """REAL audio decode for PCM WAV — pure stdlib, no codec dependency
    (this is why the audio path is not container-gated like image/video:
    RIFF/WAVE PCM needs only ``wave`` + byte reinterpretation).

    Returns ``(wave_float64 in [-1, 1], sample_rate)``; multi-channel
    audio is downmixed by per-frame channel mean. Supports the PCM
    sample widths ``wave`` emits: unsigned 8-bit, signed 16/32-bit.
    Raises ``ValueError`` on non-WAV/compressed payloads (callers map
    that to ``decode_ok=False``)."""
    import io
    import wave as _wave

    try:
        with _wave.open(io.BytesIO(payload), "rb") as w:
            nch, width, rate = w.getnchannels(), w.getsampwidth(), w.getframerate()
            frames = w.readframes(w.getnframes())
    except (_wave.Error, EOFError) as ex:
        raise ValueError(f"not a PCM WAV payload: {ex}") from ex
    if width == 1:  # WAV 8-bit is UNSIGNED
        x = (np.frombuffer(frames, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    elif width == 2:
        x = np.frombuffer(frames, dtype="<i2").astype(np.float64) / 32768.0
    elif width == 4:
        x = np.frombuffer(frames, dtype="<i4").astype(np.float64) / 2147483648.0
    else:
        raise ValueError(f"unsupported PCM sample width {width}")
    if nch > 1:
        x = x.reshape(-1, nch).mean(axis=1)
    return x, rate


def extract_wav_features(df: DataFrame) -> DataFrame:
    """REAL audio feature extraction over PCM WAV payloads (contrast
    ``extract_audio_features``, whose real-codec path is container-gated
    and whose ``fake=True`` path reinterprets raw bytes): sample count,
    header sample rate, duration, RMS and peak of the normalized wave.
    Same mapInPandas/Arrow batch shape as every decode kernel here —
    one task never holds more than a batch of blobs.

    Determinism: PCM values are exact binary fractions (k/2^w), so
    squares and sums accumulate EXACTLY (order-independent) until the
    single rounding at /n and sqrt — an SQL oracle recomputing the same
    math lands on identical doubles."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                p = r["payload"]
                if p is None or len(p) == 0:
                    rows.append((r["asset_id"], 0, 0, 0.0, 0.0, 0.0, False))
                    continue
                try:
                    x, rate = decode_wav(bytes(p))
                except ValueError:
                    rows.append((r["asset_id"], 0, 0, 0.0, 0.0, 0.0, False))
                    continue
                n = len(x)
                rows.append(
                    (
                        r["asset_id"],
                        n,
                        rate,
                        n / rate if rate else 0.0,
                        float(np.sqrt(np.mean(x * x))) if n else 0.0,
                        float(np.max(np.abs(x))) if n else 0.0,
                        True,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "asset_id", "n_samples", "sample_rate", "duration_s",
                    "rms", "peak", "decode_ok",
                ],
            )

    return df.select("asset_id", "payload").mapInPandas(kernel, WAV_FEATURE_SCHEMA)


# --------------------------------------------------------------------------
# REAL image decode: uncompressed 24-bit BMP (pure stdlib, like the WAV
# path — BITMAPFILE/INFO headers + padded BGR rows need only ``struct`` +
# byte reinterpretation, so the image path is no longer container-gated
# for this format; PNG/JPEG stay behind the codec gate above).
# --------------------------------------------------------------------------

BMP_FEATURE_SCHEMA = (
    "asset_id bigint, width int, height int, n_pixels int, "
    "total_gray bigint, dhash bigint, decode_ok boolean"
)


def bmp_encode_rgb24(pixels: np.ndarray) -> bytes:
    """Build a real uncompressed 24-bit BMP from an ``(h, w, 3)`` uint8
    RGB array — BITMAPFILEHEADER + 40-byte BITMAPINFOHEADER, bottom-up
    BGR rows padded to 4 bytes. Pure stdlib; used by tests and the gate
    queries' synth stage to manufacture genuine image payloads."""
    import struct

    h, w, _ = pixels.shape
    row_bytes = w * 3
    pad = (4 - row_bytes % 4) % 4
    body = bytearray()
    for y in range(h - 1, -1, -1):  # bottom-up
        row = pixels[y, :, ::-1]  # RGB -> BGR
        body += row.tobytes() + b"\x00" * pad
    pixel_offset = 14 + 40
    file_size = pixel_offset + len(body)
    header = struct.pack("<2sIHHI", b"BM", file_size, 0, 0, pixel_offset)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0)
    return header + info + bytes(body)


def decode_bmp(payload: bytes) -> np.ndarray:
    """REAL image decode for uncompressed 24-bit BMP: parses the RIFF-era
    headers, un-pads and un-flips the BGR rows, returns an ``(h, w, 3)``
    uint8 RGB array. Handles both bottom-up (positive height, the normal
    case) and top-down (negative height) row order. Raises ``ValueError``
    on non-BMP / compressed / non-24-bit payloads (callers map that to
    ``decode_ok=False``)."""
    import struct

    if payload is None or len(payload) < 54 or payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    (pixel_offset,) = struct.unpack_from("<I", payload, 10)
    header_size, w, h_signed = struct.unpack_from("<Iii", payload, 14)
    if header_size < 40:
        raise ValueError(f"unsupported BMP header size {header_size}")
    planes, bpp, compression = struct.unpack_from("<HHI", payload, 26)
    if bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP (bpp={bpp}, compression={compression})")
    h = abs(h_signed)
    row_bytes = w * 3
    stride = row_bytes + (4 - row_bytes % 4) % 4
    if len(payload) < pixel_offset + stride * h:
        raise ValueError("truncated BMP pixel data")
    rows = []
    for i in range(h):
        off = pixel_offset + i * stride
        row = np.frombuffer(payload, dtype=np.uint8, count=row_bytes, offset=off)
        rows.append(row.reshape(w, 3)[:, ::-1])  # BGR -> RGB
    img = np.stack(rows)
    if h_signed > 0:  # bottom-up: first stored row is the BOTTOM row
        img = img[::-1]
    return img


def _dhash64(img: np.ndarray) -> int:
    """64-bit perceptual difference hash (dHash) with a DETERMINISTIC
    nearest-neighbor 9x8 sample grid (``gy = i*h//8``, ``gx = j*w//9``)
    instead of interpolated resize, and integer luma ``299R+587G+114B``
    (no division) — every step is exact integer arithmetic, so an SQL
    oracle recomputing the same formula lands on the identical value.
    Bit ``p = i*8+j`` is set iff ``gray[i][j] > gray[i][j+1]``; bit 63
    contributes ``-(1<<63)`` so the result is a signed 64-bit BIGINT
    (same two's-complement convention as ``dedup.simhash_table``)."""
    h, w, _ = img.shape
    px = img.astype(np.int64)
    gray = 299 * px[:, :, 0] + 587 * px[:, :, 1] + 114 * px[:, :, 2]
    gy = [(i * h) // 8 for i in range(8)]
    gx = [(j * w) // 9 for j in range(9)]
    g = gray[np.ix_(gy, gx)]
    out = 0
    for i in range(8):
        for j in range(8):
            if g[i, j] > g[i, j + 1]:
                p = i * 8 + j
                out += -(1 << 63) if p == 63 else (1 << p)
    return out


def extract_bmp_features(df: DataFrame) -> DataFrame:
    """REAL image feature extraction over BMP payloads: dimensions, total
    integer luma (exact BIGINT — no rounding seam at all), and the 64-bit
    perceptual dHash used for image near-dup detection. Same
    mapInPandas/Arrow batch discipline as every decode kernel here."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                p = r["payload"]
                try:
                    img = decode_bmp(bytes(p) if p is not None else None)
                except ValueError:
                    rows.append((r["asset_id"], 0, 0, 0, 0, 0, False))
                    continue
                h, w, _ = img.shape
                px = img.astype(np.int64)
                gray = 299 * px[:, :, 0] + 587 * px[:, :, 1] + 114 * px[:, :, 2]
                rows.append(
                    (r["asset_id"], w, h, w * h, int(gray.sum()), _dhash64(img), True)
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "asset_id", "width", "height", "n_pixels",
                    "total_gray", "dhash", "decode_ok",
                ],
            )

    return df.select("asset_id", "payload").mapInPandas(kernel, BMP_FEATURE_SCHEMA)


def dhash_neardup_pairs(feats: DataFrame, max_hamming: int = 3) -> DataFrame:
    """Image near-dup pairs by dHash hamming distance, at scale: the
    64-bit hash is split into ``max_hamming + 1`` contiguous blocks
    (pigeonhole, Manku et al. WWW'07 — same guarantee as
    ``dedup.simhash_candidates``): a pair at hamming ≤ ``max_hamming``
    differs in at most ``max_hamming`` blocks, so at least one block
    matches and the pair surfaces from the banded EQUI-join — never an
    all-pairs comparison. Returns ``(id_a, id_b, hamming)`` verified
    exactly via ``bit_count(xor)`` on the candidates only."""
    from .dedup import _block_spans

    blocks = max_hamming + 1
    blocked = feats.select(
        F.col("asset_id").alias("_id"),
        F.col("dhash").alias("_dh"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("blk"),
                        F.shiftrightunsigned("dhash", start)
                        .bitwiseAND(F.lit((1 << width) - 1))
                        .alias("bval"),
                    )
                    for i, (start, width) in enumerate(_block_spans(64, blocks))
                ]
            )
        ).alias("bb"),
    ).select("_id", "_dh", "bb.blk", "bb.bval")
    a, b = blocked.alias("a"), blocked.alias("b")
    return (
        a.join(
            b,
            (F.col("a.blk") == F.col("b.blk"))
            & (F.col("a.bval") == F.col("b.bval"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .select(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
            F.bit_count(F.col("a._dh").bitwiseXOR(F.col("b._dh"))).alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


def media_stats(df: DataFrame) -> DataFrame:
    """Pure-metadata aggregation (no decode): per modality+mime, count,
    total/avg payload size — the triage query a 100 TB media lake runs
    before any decode pass. Entirely JVM-side."""
    return (
        df.groupBy("modality", "mime_type")
        .agg(
            F.count(F.lit(1)).alias("n_assets"),
            F.sum(F.length("payload")).alias("total_bytes"),
            F.round(F.avg(F.length("payload")), 2).alias("avg_bytes"),
        )
    )


WAV_SPECTRUM_SCHEMA = (
    "asset_id bigint, n_samples int, dominant_bin int, dominant_hz double, "
    "spectral_centroid_hz double, decode_ok boolean"
)


def extract_wav_spectrum(df: DataFrame) -> DataFrame:
    """REAL frequency-domain features over PCM WAV payloads: rFFT
    magnitude spectrum → dominant frequency (argmax bin, DC excluded)
    and spectral centroid — the audio fingerprinting/quality seam a
    media pipeline runs after decode. Same mapInPandas/Arrow kernel
    shape as every decode here; numpy's rfft is the vectorized hot loop
    (O(n log n) per clip, clips bounded by maxPartitionBytes).

    Determinism note for gates: a pure tone BIN-ALIGNED to the FFT grid
    (freq = k·rate/n for integer k) puts the argmax exactly at bin k
    regardless of float noise, so dominant_hz is analytically
    predictable; the centroid is float-accumulated and engine-local —
    contract-check it (range, monotonicity), don't hash it.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                p = r["payload"]
                try:
                    x, rate = decode_wav(bytes(p)) if p else (None, 0)
                except ValueError:
                    x = None
                if x is None or len(x) < 4 or not rate:
                    rows.append((r["asset_id"], 0, 0, 0.0, 0.0, False))
                    continue
                n = len(x)
                mag = np.abs(np.fft.rfft(x))
                mag[0] = 0.0  # exclude DC from the dominant-bin search
                k = int(np.argmax(mag))
                total = float(mag.sum())
                freqs = np.arange(len(mag)) * (rate / n)
                centroid = float((freqs * mag).sum() / total) if total else 0.0
                rows.append(
                    (r["asset_id"], n, k, k * rate / n, centroid, True)
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "asset_id", "n_samples", "dominant_bin", "dominant_hz",
                    "spectral_centroid_hz", "decode_ok",
                ],
            )

    return df.select("asset_id", "payload").mapInPandas(
        kernel, WAV_SPECTRUM_SCHEMA
    )


FP_SCHEMA = "asset_id bigint, fp bigint"


def wav_fingerprints(
    df: DataFrame,
    frame: int = 256,
    hop: int = 128,
    peaks_per_frame: int = 3,
    fanout: int = 3,
) -> DataFrame:
    """Constellation audio fingerprints (Wang 2003, the Shazam scheme)
    over PCM WAV payloads: short-time FFT frames → top-``peaks_per_frame``
    spectral peak bins per frame → landmark hashes packing
    ``(anchor_bin, target_bin, frame_delta)`` for each anchor and its
    next ``fanout`` peaks. Two recordings of the same material share
    many hashes even under amplitude change or added noise; unrelated
    clips share almost none — the match is a HASH-SET join, never a
    waveform comparison.

    Determinism: peaks rank by (magnitude desc, bin asc) — for the
    bin-aligned synthetic tones the tests plant, magnitudes at peak bins
    dominate float noise, so the peak set is stable. Hash packs ints
    (b1 << 24 | b2 << 12 | dt): pure integer — engine/hash-stable.

    Scale shape: one map-only Arrow kernel per clip emits
    O(frames × peaks × fanout) integer rows; matching is a hash-keyed
    equi-join + groupBy (``fingerprint_matches``) — the LSH-bucket
    pattern, never all-pairs audio.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_ids, out_fps = [], []
            for _, r in pdf.iterrows():
                p = r["payload"]
                try:
                    x, rate = decode_wav(bytes(p)) if p else (None, 0)
                except ValueError:
                    x = None
                if x is None or len(x) < frame:
                    continue
                peaks: list[tuple[int, int]] = []  # (frame_idx, bin)
                fi = 0
                for start in range(0, len(x) - frame + 1, hop):
                    seg = x[start : start + frame]
                    mag = np.abs(np.fft.rfft(seg))
                    mag[0] = 0.0
                    order = np.argsort(-mag, kind="stable")[:peaks_per_frame]
                    for b in sorted(int(v) for v in order):
                        peaks.append((fi, b))
                    fi += 1
                for i, (f1, b1) in enumerate(peaks):
                    for f2, b2 in peaks[i + 1 : i + 1 + fanout]:
                        dt = f2 - f1
                        if 0 <= dt < (1 << 12):
                            out_ids.append(int(r["asset_id"]))
                            out_fps.append((b1 << 24) | (b2 << 12) | dt)
            yield pd.DataFrame({"asset_id": out_ids, "fp": out_fps})

    return df.select("asset_id", "payload").mapInPandas(kernel, FP_SCHEMA)


def fingerprint_matches(fp: DataFrame, min_shared: int = 5) -> DataFrame:
    """Clip pairs sharing ≥ ``min_shared`` distinct fingerprints:
    ``(id_a, id_b, n_shared)`` with ``id_a < id_b``. One hash-keyed
    self-equi-join over DISTINCT (asset, fp) rows + one pair count —
    frequent hashes (silence, hum) are the skew risk; cap or drop
    hashes above a df threshold in production, exactly like stopword
    blocks in the text LSH stack."""
    d = fp.distinct()
    a = d.select(F.col("asset_id").alias("id_a"), "fp")
    b = d.select(F.col("asset_id").alias("id_b"), "fp")
    return (
        a.join(b, "fp")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )
