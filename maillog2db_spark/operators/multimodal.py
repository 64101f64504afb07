"""Multimodal-column plumbing: opaque binary payloads + typed metadata.

The decode and resize steps are REAL for PNG and WAV via the
pure-stdlib codecs in operators/codecs.py (``real_codec=True`` —
tested end-to-end on synthesized files through the distributed path);
formats beyond those are what PIL/ffmpeg would add, and undecodable
payloads are quarantined with ok=False rather than poisoning the task.
The driver's testdata has no real media bytes, so a deterministic fake
path remains the default for exercising the plumbing on text blobs.
Everything around the codec — binary columns, schema, Arrow-batched
``mapInPandas`` operator shape, partition-size control — is the
Spark-side design work and is identical on both paths.

``binary_meta`` is the oracle-checked query surface: it treats
documents.text as an opaque UTF-8 blob and derives (byte length,
content hash, fixed-size chunk count) — exactly the metadata pass a
100 TB multimodal pipeline runs before any decode.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import io

CHUNK_BYTES = 1000

MEDIA_SCHEMA = (
    "doc_id bigint, media_type string, n_bytes bigint, "
    "width int, height int, n_frames int, ok boolean"
)


def binary_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Opaque-binary metadata pass: byte length (≠ char length for
    multi-byte text), md5 content hash, chunk count at CHUNK_BYTES."""
    d = io.load(spark, sf_dir, "documents")
    blob = F.encode(F.col("text"), "UTF-8")
    nbytes = F.octet_length(blob)
    return d.select(
        "doc_id",
        nbytes.cast("bigint").alias("n_bytes"),
        F.md5(blob).alias("content_md5"),
        # floor-division — a bare CAST truncates in Spark but ROUNDS in
        # DuckDB; floor() agrees everywhere
        F.floor((nbytes + CHUNK_BYTES - 1) / CHUNK_BYTES).cast("bigint").alias("n_chunks"),
    )


BINARY_META_SQL = f"""
SELECT doc_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       md5(text) AS content_md5,
       CAST(floor((octet_length(encode(text)) + {CHUNK_BYTES - 1}) / {CHUNK_BYTES}.0) AS BIGINT) AS n_chunks
FROM documents
"""


def _fake_decode(payload: bytes) -> dict:
    """Deterministic stand-in for an image/video decoder. Real
    implementation would be PIL/av here; the container lacks those
    libs (NotImplementedError path kept explicit for the real codec).
    """
    n = len(payload)
    return {
        "width": 16 + n % 64,
        "height": 16 + (n // 64) % 64,
        "n_frames": 1 + n % 8,
    }


def _real_decode(payload: bytes) -> dict | None:
    """Actual decode via the pure-stdlib codecs (operators/codecs.py):
    PNG → (width, height), WAV → n_frames. Returns None for formats
    the in-container codecs can't handle (where PIL/av would extend
    coverage — the operator shape is unchanged by that swap)."""
    from . import codecs

    kind = codecs.sniff_media_type(payload)
    try:
        if kind == "image/png":
            w, h, _, _ = codecs.decode_png(payload)
            return {"media_type": kind, "width": w, "height": h, "n_frames": 1}
        if kind == "audio/wav":
            _, _, n_frames, _ = codecs.decode_wav(payload)
            return {"media_type": kind, "width": 0, "height": 0, "n_frames": n_frames}
        if kind == "image/jpeg":
            w, h, _ = codecs.decode_jpeg_gray(payload)
            return {"media_type": kind, "width": w, "height": h, "n_frames": 1}
    except Exception:
        return None
    return None


def decode_media(df: DataFrame, payload_col: str = "payload", real_codec: bool = False) -> DataFrame:
    """Arrow-batched media decode: binary column → typed metadata.

    ``mapInPandas`` so each task decodes a bounded batch (no per-row
    Python), preserving input partitioning — at scale, partition by
    storage locality before calling this, and cap batch memory with
    spark.sql.execution.arrow.maxRecordsPerBatch.

    ``real_codec=True`` runs the ACTUAL pure-stdlib decoders
    (PNG/WAV, operators/codecs.py) and flags undecodable payloads with
    ok=False instead of failing the task — the quarantine-not-poison
    rule the parse path follows (F1). The default fake path exists for
    exercising the plumbing on the driver's text-blob corpus, which
    contains no real media bytes.
    """

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, p in zip(pdf["doc_id"], pdf[payload_col]):
                was_null = p is None
                p = p if p is not None else b""
                if real_codec:
                    m = _real_decode(p)
                    ok = m is not None
                    m = m or {"media_type": "unknown", "width": 0, "height": 0, "n_frames": 0}
                else:
                    # fake path: null payloads quarantined (ok=False),
                    # same contract the real path applies to undecodables
                    m = {"media_type": "image", **_fake_decode(p)}
                    ok = not was_null
                rows.append(
                    (doc_id, m["media_type"], len(p), m["width"], m["height"], m["n_frames"], ok)
                )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "media_type", "n_bytes", "width", "height", "n_frames", "ok"],
            )

    return df.mapInPandas(_decode, schema=MEDIA_SCHEMA)


RESIZED_SCHEMA = "doc_id bigint, payload binary, width int, height int"
FRAMES_SCHEMA = "doc_id bigint, frame_idx int, frame_payload binary"
FEATURE_DIM = 16


def resize_media(
    df: DataFrame, width: int = 32, height: int = 32, real_codec: bool = False
) -> DataFrame:
    """Resize plumbing: binary in → (smaller) binary out, 1:1 rows.

    ``real_codec=True`` decodes PNG payloads, nearest-neighbor
    resamples the actual pixel grid, and re-encodes a valid PNG
    (pure-stdlib, operators/codecs.py); non-PNG payloads pass through
    unchanged with width/height = -1 (quarantine, not poison). The
    default fake keeps a deterministic byte subsample for exercising
    the plumbing on non-media corpora. Either way the Spark-side
    contract — binary-in/binary-out, bounded Arrow batches,
    partitioning preserved — is identical."""

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from . import codecs

        n_out = width * height
        for pdf in batches:
            ids, payloads, ws, hs = [], [], [], []
            for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
                p = p if p is not None else b""
                if real_codec:
                    try:
                        w0, h0, ch, pix = codecs.decode_png(p)
                        small = codecs.resize_nearest(pix, w0, h0, ch, width, height)
                        payloads.append(codecs.encode_png(small, width, height, ch))
                        ws.append(width)
                        hs.append(height)
                    except Exception:
                        payloads.append(p)
                        ws.append(-1)
                        hs.append(-1)
                else:
                    payloads.append(p[:n_out].ljust(n_out, b"\0"))
                    ws.append(width)
                    hs.append(height)
                ids.append(doc_id)
            yield pd.DataFrame(
                {"doc_id": ids, "payload": payloads, "width": ws, "height": hs}
            )

    return df.mapInPandas(_resize, schema=RESIZED_SCHEMA)


def sample_frames(df: DataFrame, every_n: int = 4) -> DataFrame:
    """Frame sampling: one input video row → 0..k frame rows (the
    row-EXPANDING mapInPandas shape — output cardinality differs from
    input, which plain pandas_udf cannot express). Frames here are
    deterministic byte slices standing in for an av demuxer."""

    def _frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, blobs = [], [], []
            for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
                p = p if p is not None else b""
                n_frames = 1 + len(p) % 8  # matches _fake_decode
                for f in range(0, n_frames, every_n):
                    ids.append(doc_id)
                    idxs.append(f)
                    blobs.append(p[f::8][:64])
            yield pd.DataFrame(
                {"doc_id": ids, "frame_idx": idxs, "frame_payload": blobs}
            )

    return df.mapInPandas(_frames, schema=FRAMES_SCHEMA)


def extract_features(df: DataFrame) -> DataFrame:
    """Feature extraction: binary → fixed-dim float vector (the
    embedding-model stand-in), vectorized per Arrow batch. Deterministic
    byte-histogram features so tests can assert exact values; a real
    model inference body drops into the same iterator shape (load model
    once per task, not per batch — the idiomatic mapInPandas pattern)."""

    def _feat(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        # (model would be loaded HERE, once per task)
        for pdf in batches:
            feats = []
            for p in pdf["payload"]:
                p = p if p is not None else b""
                if p:
                    arr = np.frombuffer(p, dtype=np.uint8)
                    h = np.bincount(arr % FEATURE_DIM, minlength=FEATURE_DIM)
                    feats.append((h / len(p)).astype(float).tolist())
                else:
                    feats.append([0.0] * FEATURE_DIM)
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "features": feats})

    return df.mapInPandas(
        _feat, schema=f"doc_id bigint, features array<float>"
    )


PNG_ROUNDTRIP_W = 32


def png_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle-checked REAL-codec round-trip: pack each document's UTF-8
    bytes into a space-padded 32-wide grayscale pixel grid, encode an
    actual PNG (zlib scanlines, CRCs), decode it back, and report the
    recovered dimensions plus the md5 of the recovered pixels. The
    DuckDB oracle predicts every output column arithmetically from the
    text alone — so a hash match proves the encoder and decoder
    faithfully round-trip real image bytes through the distributed
    Arrow path, not that two fakes agree.

    Scale shape: pure mapInPandas over the (repartitioned) scan — no
    shuffle, no state; each task handles a bounded Arrow batch."""
    import hashlib
    import math

    from . import codecs

    p = spark.sparkContext.defaultParallelism
    d = io.load(spark, sf_dir, "documents").repartition(p, "doc_id").select("doc_id", "text")

    def _roundtrip(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        w = PNG_ROUNDTRIP_W
        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                data = (text or "").encode("utf-8")
                h = max(1, math.ceil(len(data) / w))
                pix = data.ljust(w * h, b" ")
                png = codecs.encode_png(pix, w, h, channels=1)
                w2, h2, ch2, pix2 = codecs.decode_png(png)
                assert ch2 == 1
                rows.append(
                    (doc_id, w2, h2, len(data), hashlib.md5(pix2).hexdigest())
                )
            yield pd.DataFrame(
                rows, columns=["doc_id", "width", "height", "n_bytes", "pixel_md5"]
            )

    return d.mapInPandas(
        _roundtrip,
        schema="doc_id bigint, width int, height int, n_bytes bigint, pixel_md5 string",
    )


# coalesce(text, '') mirrors the Spark side's `(text or "")`: a NULL
# document is treated as empty on BOTH engines (one blank 32x1 row),
# not as a NULL-propagating row that would hash-mismatch.
PNG_ROUNDTRIP_SQL = f"""
SELECT doc_id,
       {PNG_ROUNDTRIP_W} AS width,
       CAST(greatest(1, ceil(octet_length(encode(coalesce(text, ''))) / {PNG_ROUNDTRIP_W}.0)) AS INT) AS height,
       CAST(octet_length(encode(coalesce(text, ''))) AS BIGINT) AS n_bytes,
       md5(coalesce(text, '') || repeat(' ',
           CAST(greatest(1, ceil(octet_length(encode(coalesce(text, ''))) / {PNG_ROUNDTRIP_W}.0)) AS INT)
             * {PNG_ROUNDTRIP_W} - octet_length(encode(coalesce(text, ''))))) AS pixel_md5
FROM documents
"""


WAV_SAMPLE_RATE = 16000


def wav_loudness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle-checked REAL-codec audio feature extraction: synthesize a
    16-bit mono WAV from each document (one sample per CODE POINT —
    ``(cp % 256 - 128) * 256`` — deliberately code-point-based, not
    byte-based, so the DuckDB oracle's char-wise arithmetic agrees for
    ANY text, not just ASCII; the textnorm byte-vs-char divergence
    taught that lesson), run it through the actual stdlib WAV
    encode/decode (operators/codecs.py), and compute loudness features
    from the DECODED pcm: frame count, duration, peak amplitude, RMS.
    The oracle predicts every column arithmetically from the text
    alone, so a hash match certifies the codec round-trip AND the
    feature math through the distributed Arrow path.

    Scale shape: pure mapInPandas over the repartitioned scan — no
    shuffle, no state; the decode-then-reduce per row is the exact
    shape a real audio featurizer (loudness/VAD/fingerprint) takes."""
    import math
    import struct

    from . import codecs

    p = spark.sparkContext.defaultParallelism
    d = io.load(spark, sf_dir, "documents").repartition(p, "doc_id").select("doc_id", "text")

    def _loud(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                samples = [((ord(c) % 256) - 128) * 256 for c in (text or "")]
                pcm = struct.pack(f"<{len(samples)}h", *samples)
                wav = codecs.encode_wav(pcm, 1, WAV_SAMPLE_RATE, 2)
                ch, rate, n_frames, pcm2 = codecs.decode_wav(wav)
                assert ch == 1 and rate == WAV_SAMPLE_RATE and pcm2 == pcm
                dec = struct.unpack(f"<{n_frames}h", pcm2)
                peak = max((abs(s) for s in dec), default=0)
                rms = (
                    round(math.sqrt(sum(s * s for s in dec) / n_frames), 6)
                    if n_frames
                    else 0.0
                )
                rows.append(
                    (doc_id, n_frames, n_frames * 1000 // WAV_SAMPLE_RATE, peak, rms)
                )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "n_frames", "duration_ms", "peak", "rms"],
            )

    return d.mapInPandas(
        _loud,
        schema="doc_id bigint, n_frames bigint, duration_ms bigint, peak bigint, rms double",
    )


# char-wise arithmetic twin: one row per code point via string_split,
# LEFT JOIN so empty/NULL documents keep a (0, 0, 0, 0.0) row exactly
# like the Spark side's max(default=0) / guarded rms
WAV_LOUDNESS_SQL = f"""
WITH samples AS (
  -- ch <> '': string_split('', '') yields [''] (one empty element),
  -- which would fabricate a sample for empty documents
  SELECT doc_id, ((ascii(ch) % 256) - 128) * 256 AS s
  FROM (SELECT doc_id, unnest(string_split(coalesce(text, ''), '')) AS ch FROM documents)
  WHERE ch <> ''
), agg AS (
  SELECT doc_id, count(*) AS n_frames, max(abs(s)) AS peak,
         round(sqrt(avg(CAST(s AS DOUBLE) * s)), 6) AS rms
  FROM samples GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(coalesce(a.n_frames, 0) AS BIGINT) AS n_frames,
       CAST(coalesce(a.n_frames, 0) * 1000 // {WAV_SAMPLE_RATE} AS BIGINT) AS duration_ms,
       CAST(coalesce(a.peak, 0) AS BIGINT) AS peak,
       coalesce(a.rms, 0.0) AS rms
FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id
"""


FRAME_CHARS = 8  # chars per synthesized frame
FRAME_EVERY = 4  # sample every 4th frame


def frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle-checked REAL frame sampling: pack each document into a
    multi-frame media container (a minimal demuxable format: ``ANIM``
    magic + frame count + length-prefixed REAL PNG frames, one per
    8-char slice of the text), then DEMUX the container bytes, sample
    every 4th frame, decode each sampled frame with the actual PNG
    codec, and report its index, recovered width, and pixel md5. The
    oracle predicts all of it arithmetically from the text (frames are
    CHAR slices so char-wise SQL agrees beyond ASCII), so a hash match
    certifies mux → demux → per-frame decode end-to-end — the
    video-frame-extraction shape (av demux + keyframe decode) with the
    codec swapped for the in-container stdlib one.

    Scale shape: row-expanding mapInPandas (one doc row → 0..k frame
    rows), no shuffle; real video work drops into the same iterator
    with av/ffmpeg bindings."""
    import hashlib
    import math
    import struct

    from . import codecs

    p = spark.sparkContext.defaultParallelism
    d = io.load(spark, sf_dir, "documents").repartition(p, "doc_id").select("doc_id", "text")

    def _mux(text: str) -> bytes:
        frames = []
        for i in range(0, len(text), FRAME_CHARS):
            chunk = text[i : i + FRAME_CHARS].encode("utf-8")
            frames.append(codecs.encode_png(chunk, len(chunk), 1, channels=1))
        out = [b"ANIM", struct.pack("<I", len(frames))]
        for fr in frames:
            out.append(struct.pack("<I", len(fr)))
            out.append(fr)
        return b"".join(out)

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                blob = _mux(text or "")
                assert blob[:4] == b"ANIM"
                (n_frames,) = struct.unpack("<I", blob[4:8])
                off = 8
                for idx in range(n_frames):
                    (flen,) = struct.unpack("<I", blob[off : off + 4])
                    off += 4
                    payload = blob[off : off + flen]
                    off += flen
                    if idx % FRAME_EVERY:
                        continue
                    w, h, ch, pix = codecs.decode_png(payload)
                    assert h == 1 and ch == 1
                    rows.append(
                        (doc_id, idx, w, hashlib.md5(pix).hexdigest())
                    )
            yield pd.DataFrame(
                rows, columns=["doc_id", "frame_idx", "width", "pixel_md5"]
            )

    return d.mapInPandas(
        _sample,
        schema="doc_id bigint, frame_idx bigint, width int, pixel_md5 string",
    )


FRAME_SAMPLE_SQL = f"""
WITH idx AS (
  SELECT doc_id, text,
         unnest(range(CAST(ceil(length(coalesce(text, '')) / {FRAME_CHARS}.0) AS BIGINT)))
           AS frame_idx
  FROM documents
), f AS (
  SELECT doc_id, frame_idx,
         substr(coalesce(text, ''), CAST(frame_idx * {FRAME_CHARS} + 1 AS INT), {FRAME_CHARS}) AS chunk
  FROM idx
)
SELECT doc_id, frame_idx,
       CAST(octet_length(encode(chunk)) AS INT) AS width,
       md5(chunk) AS pixel_md5
FROM f WHERE frame_idx % {FRAME_EVERY} = 0
"""


def documents_as_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adapter: documents.text as a fake binary media column, for
    exercising the decode plumbing on driver testdata."""
    d = io.load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
        .alias("media_type"),
    )


# --- JPEG round-trip (real lossy codec, exact on the flat-block class) --------

JPEG_BLOCK_W = 8     # one 8x8 block per image row-strip
JPEG_N_BLOCKS = 32   # one block per md5-hex character


def jpeg_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle-checked REAL-JPEG round-trip: derive a flat-block
    grayscale image from each document's md5 (one 8×8 block per hex
    character, pixel value 208 − 2·ascii(c) — every block constant at
    an EVEN offset from 128), push it through the full baseline codec
    — forward DCT, Annex K quantization, Huffman entropy coding with
    byte stuffing, then the real decoder — and report the recovered
    dimensions plus the md5 of the DECODED pixels.

    Why this is hash-verifiable for a LOSSY codec: a constant block's
    AC coefficients are 0 and its DC coefficient 8·(v−128) is an exact
    multiple of the Annex K DC quantization step 16 precisely when
    (v−128) is even — so on this input class quantization is lossless
    and the DuckDB oracle can predict the decoded bytes arithmetically
    from the text alone (the PNG query's contract, extended to a codec
    that is lossy in general; the pytest suite separately bounds the
    lossy path on noise/gradient images). A hash match therefore
    proves the encoder and decoder agree through real DCT/Huffman
    machinery end-to-end, not that two fakes agree.

    Scale shape: pure mapInPandas over the repartitioned scan — no
    shuffle, no state; pixel values stay ≤ 127 so both engines hash
    identical single-byte strings."""
    import hashlib

    from . import codecs

    p = spark.sparkContext.defaultParallelism
    d = io.load(spark, sf_dir, "documents").repartition(p, "doc_id").select(
        "doc_id", "text"
    )
    w, nb = JPEG_BLOCK_W, JPEG_N_BLOCKS
    h = 8 * nb

    def _roundtrip(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                hx = hashlib.md5((text or "").encode("utf-8")).hexdigest()
                pix = b"".join(
                    bytes([208 - 2 * ord(c)]) * 64 for c in hx
                )
                jp = codecs.encode_jpeg_gray(pix, w, h)
                w2, h2, out = codecs.decode_jpeg_gray(jp)
                rows.append(
                    (doc_id, w2, h2, hashlib.md5(out).hexdigest())
                )
            yield pd.DataFrame(
                rows, columns=["doc_id", "width", "height", "pixel_md5"]
            )

    return d.mapInPandas(
        _roundtrip,
        schema="doc_id bigint, width int, height int, pixel_md5 string",
    )


JPEG_ROUNDTRIP_SQL = f"""
SELECT doc_id,
       {JPEG_BLOCK_W} AS width,
       {8 * JPEG_N_BLOCKS} AS height,
       md5(array_to_string(list_transform(
           generate_series(1, {JPEG_N_BLOCKS}),
           i -> repeat(chr(208 - 2 * ascii(substr(md5(coalesce(text, '')), i, 1))), 64)
       ), '')) AS pixel_md5
FROM documents
"""
