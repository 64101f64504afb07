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


# --- perceptual near-duplicate image dedup (pHash + banded Hamming join) ------

PHASH_HD_MAX = 10       # pair admission threshold (measured: same-image
                        # jitter ≤ 4, distinct md5-tile images ≥ 17 at sf0.01)
PHASH_TILE = 16         # tile edge in the derived 128x128 images
PHASH_BANDS_N = 4       # 4 bands x 16 bits: exact recall for hd < 4,
                        # probabilistic (verified) above


def _phash_tile_values(text: str) -> tuple[list[int], list[int]]:
    """Deterministic 8x8 tile matrices for the two image variants of a
    document: 64 hex chars of md5(text)||md5(text+'x') as ascii values
    (the orig), plus a {-1,0,+1} per-tile jitter keyed by a second hash
    pair (the near-duplicate — think 'same photo, re-encoded')."""
    import hashlib

    hh = (
        hashlib.md5(text.encode("utf-8")).hexdigest()
        + hashlib.md5((text + "x").encode("utf-8")).hexdigest()
    )
    hj = (
        hashlib.md5((text + "j").encode("utf-8")).hexdigest()
        + hashlib.md5((text + "jx").encode("utf-8")).hexdigest()
    )
    orig = [ord(c) for c in hh]
    jit = [orig[i] + (ord(hj[i]) % 3) - 1 for i in range(64)]
    return orig, jit


def phash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual image near-duplicate pairs — the multimodal pillar's
    missing member next to text MinHash/SimHash and embedding cosine:
    every document derives TWO deterministic 128x128 grayscale images
    (orig + slightly-jittered copy), each is hashed through the REAL
    pixel path (materialized bytes -> area-mean downsample -> 32-point
    DCT -> sign-vs-AC-mean bits, ``codecs.phash_bands``), and pairs
    within Hamming distance PHASH_HD_MAX surface via a banded
    equi-join — 4x16-bit bands, so candidates meet only inside equal
    (band_id, band_val) buckets, never an all-pairs product.

    Why the oracle can predict a DCT hash arithmetically: the derived
    images are constant on a 16x16 tile grid, so after exact area-mean
    pooling the 32x32 image is constant on 4x4 tiles and the low-
    frequency DCT block is the exact linear sandwich G @ T @ G^T of
    the 8x8 tile matrix (``codecs.PHASH_G``) — DuckDB computes the
    same float64 coefficients (margin to the thresholding mean ≥ 0.05
    on this corpus vs ~1e-12 cross-engine float noise, so the bits —
    and hence bands, candidates, and pairs — are deterministic).

    100 TB shape: hashing is one Arrow-batched pass (no shuffle); the
    join is a plain equi-shuffle on (band_id, band_val) — 16-bit bands
    keep bucket occupancy ~n/65536 per band, and the knob is band
    width/count (k bands of w bits = exact recall for hd < k over a
    k*w-bit hash); the Hamming filter runs before the pair-distinct so
    the dedup shuffle carries only true near-dups."""
    from .dedup import _cached

    def build():
        p = spark.sparkContext.defaultParallelism
        d = io.load(spark, sf_dir, "documents").repartition(p, "doc_id").select(
            "doc_id", "text"
        )
        # session-cached (r10): the Arrow-batched pHash pass feeds both
        # this query and mm_phash_clusters — hash once per session
        sigs = _cached(spark, sf_dir, "phash_sigs", lambda: phash_signatures(d))
        return phash_pairs_between(sigs, sigs)

    # the VERIFIED pair table is itself a session base (the
    # neardup_pairs precedent): clusters consumes it directly
    return _cached(spark, sf_dir, "phash_pairs", build)


def phash_signatures(d: DataFrame) -> DataFrame:
    """(doc_id, text) → (img_id, b0..b3) pHash band words for BOTH
    derived image variants, through the real pixel path — THE shared
    signature core (batch query and streaming store both call it, so
    stream ≡ batch is equality of resolved signature tables)."""
    from . import codecs

    edge, n = PHASH_TILE, 8 * PHASH_TILE

    def _hash(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        ones = np.ones((edge, edge))
        rows = []
        for pdf in batches:
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                for variant, tiles in enumerate(
                    _phash_tile_values(text or "")
                ):
                    tm = np.array(tiles, dtype=np.float64).reshape(8, 8)
                    pix = np.kron(tm, ones).astype(np.uint8).tobytes()
                    b = codecs.phash_bands(pix, n, n)
                    rows.append((2 * int(doc_id) + variant, *b))
            yield pd.DataFrame(
                rows, columns=["img_id", "b0", "b1", "b2", "b3"]
            )
            rows = []

    return d.mapInPandas(
        _hash,
        schema="img_id bigint, b0 bigint, b1 bigint, b2 bigint, b3 bigint",
    )


def _phash_bands_of(sigs: DataFrame) -> DataFrame:
    return sigs.select(
        "img_id", "b0", "b1", "b2", "b3",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(i).alias("band_id"),
                    F.col(f"b{i}").alias("band_val"),
                )
                for i in range(PHASH_BANDS_N)
            ])
        ).alias("band"),
    ).select("img_id", "b0", "b1", "b2", "b3", "band.band_id", "band.band_val")


def phash_pairs_between(
    left_sigs: DataFrame, right_sigs: DataFrame, ordered: bool = True,
    broadcast_left: bool = False,
) -> DataFrame:
    """Banded Hamming pair join between two signature tables. With
    ``ordered=True`` (the batch self-join: pass the same table twice)
    candidates meet once under img_a < img_b; with ``ordered=False``
    (the streaming probe: new batch vs accumulated store, where the
    new id may be on either side) the join takes both orientations and
    canonicalizes via least/greatest. ``broadcast_left=True`` marks the
    left side as bounded (one ingest wave) so the accumulated right
    side streams without a shuffle. Output pairs are img_a < img_b,
    Hamming ≤ PHASH_HD_MAX, distinct, either way."""
    a = _phash_bands_of(left_sigs).select(
        F.col("img_id").alias("img_a"),
        *[F.col(f"b{i}").alias(f"a{i}") for i in range(4)],
        "band_id", "band_val",
    )
    if broadcast_left:
        a = F.broadcast(a)
    b = _phash_bands_of(right_sigs).select(
        F.col("img_id").alias("img_b"),
        *[F.col(f"b{i}").alias(f"bb{i}") for i in range(4)],
        F.col("band_id").alias("band_id_b"),
        F.col("band_val").alias("band_val_b"),
    )
    hd = sum(F.bit_count(F.expr(f"a{i} ^ bb{i}")) for i in range(4))
    pair_cond = (
        (a.img_a < b.img_b) if ordered else (a.img_a != b.img_b)
    )
    out = (
        a.join(
            b,
            (a.band_id == b.band_id_b)
            & (a.band_val == b.band_val_b)
            & pair_cond,
        )
        .filter(hd <= PHASH_HD_MAX)
    )
    if ordered:
        out = out.select(
            "img_a", "img_b", hd.cast("bigint").alias("hamming")
        )
    else:
        out = out.select(
            F.least("img_a", "img_b").alias("img_a"),
            F.greatest("img_a", "img_b").alias("img_b"),
            hd.cast("bigint").alias("hamming"),
        )
    return out.distinct()


def _phash_g_sql_rows() -> str:
    from . import codecs

    return ",".join(
        f"({u},{a},CAST({codecs.PHASH_G[u][a]!r} AS DOUBLE))"
        for u in range(8)
        for a in range(8)
    )


# shared CTE chain (no WITH keyword — the pairs query prefixes WITH,
# the clusters query WITH RECURSIVE): derive tile matrices from md5,
# the exact G @ T @ G^T DCT sandwich, sign bits, band words, banded
# candidates
_PHASH_CTES = f"""g(u, a, gv) AS (VALUES {{G_ROWS}}),
imgs AS (
  SELECT 2*doc_id + v.range AS img_id, v.range AS variant,
         md5(coalesce(text,'')) || md5(coalesce(text,'') || 'x') AS hh,
         md5(coalesce(text,'') || 'j') || md5(coalesce(text,'') || 'jx') AS hj
  FROM documents CROSS JOIN range(2) v
),
tiles AS (
  SELECT img_id, t.range AS idx,
         ascii(substr(hh, CAST(t.range + 1 AS INT), 1))
         + CASE WHEN variant = 1
                THEN (ascii(substr(hj, CAST(t.range + 1 AS INT), 1)) % 3) - 1
                ELSE 0 END AS tv
  FROM imgs CROSS JOIN range(64) t
),
coef AS (
  SELECT img_id, k.range AS k, sum(tv * gu.gv * gv2.gv) AS c
  FROM tiles
  CROSS JOIN range(64) k
  JOIN g gu  ON gu.u  = k.range // 8 AND gu.a  = idx // 8
  JOIN g gv2 ON gv2.u = k.range % 8  AND gv2.a = idx % 8
  GROUP BY img_id, k.range
),
stats AS (
  SELECT img_id, avg(CASE WHEN k > 0 THEN c END) AS m FROM coef GROUP BY img_id
),
bits AS (
  SELECT coef.img_id, k, CASE WHEN c > m THEN 1 ELSE 0 END AS bit
  FROM coef JOIN stats ON coef.img_id = stats.img_id
),
sigs AS (
  SELECT img_id,
         CAST(sum(CASE WHEN k < 16 THEN bit::BIGINT << CAST(15 - k AS INT) ELSE 0 END) AS BIGINT) AS b0,
         CAST(sum(CASE WHEN k >= 16 AND k < 32 THEN bit::BIGINT << CAST(31 - k AS INT) ELSE 0 END) AS BIGINT) AS b1,
         CAST(sum(CASE WHEN k >= 32 AND k < 48 THEN bit::BIGINT << CAST(47 - k AS INT) ELSE 0 END) AS BIGINT) AS b2,
         CAST(sum(CASE WHEN k >= 48 THEN bit::BIGINT << CAST(63 - k AS INT) ELSE 0 END) AS BIGINT) AS b3
  FROM bits GROUP BY img_id
),
bands AS (
  SELECT img_id, b0, b1, b2, b3, r.range AS band_id,
         CASE r.range WHEN 0 THEN b0 WHEN 1 THEN b1 WHEN 2 THEN b2 ELSE b3 END AS band_val
  FROM sigs CROSS JOIN range({PHASH_BANDS_N}) r
),
cands AS (
  SELECT DISTINCT a.img_id AS img_a, b.img_id AS img_b,
         a.b0 AS a0, a.b1 AS a1, a.b2 AS a2, a.b3 AS a3,
         b.b0 AS c0, b.b1 AS c1, b.b2 AS c2, b.b3 AS c3
  FROM bands a JOIN bands b
    ON a.band_id = b.band_id AND a.band_val = b.band_val
   AND a.img_id < b.img_id
)"""

_PHASH_HD_SQL = (
    "bit_count(xor(a0, c0)) + bit_count(xor(a1, c1)) "
    "+ bit_count(xor(a2, c2)) + bit_count(xor(a3, c3))"
)

PHASH_NEARDUP_SQL = (
    f"WITH {_PHASH_CTES}\n"
    f"SELECT img_a, img_b,\n"
    f"       CAST({_PHASH_HD_SQL} AS BIGINT) AS hamming\n"
    f"FROM cands\nWHERE {_PHASH_HD_SQL} <= {PHASH_HD_MAX}\n"
).format(G_ROWS=_phash_g_sql_rows())


def phash_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual duplicate CLUSTERS: connected components over the
    verified pHash near-dup pair graph — the keep-one-per-cluster step
    a multimodal dedup pipeline runs after pair generation (the image
    twin of ``doc_neardup_clusters``). Components ride the shared
    ``graph.star_components`` (O(log² n) rounds, fixpoint-checked);
    the summary is (cluster, size, keep = min img_id, member list).
    The member string_agg is bounded by cluster size — near-dup
    clusters are tiny by construction (members are ≥-threshold-similar
    to each other through pair chains)."""
    from .graph import star_components

    pairs = phash_neardup(spark, sf_dir).select(
        F.col("img_a").alias("src"), F.col("img_b").alias("dst")
    )
    labels = star_components(pairs).withColumnRenamed("node", "img_id")
    return (
        labels.groupBy("comp")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_images"),
            F.min("img_id").alias("keep_img_id"),
            # sort NUMERICALLY before casting — lexicographic string
            # order diverges from the oracle's ORDER BY img_id once a
            # cluster mixes id digit-lengths
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list("img_id")),
                    lambda x: x.cast("string"),
                ),
                ",",
            ).alias("members"),
        )
        .select(
            F.col("comp").alias("cluster_id"),
            "n_images", "keep_img_id", "members",
        )
    )


PHASH_CLUSTERS_SQL = (
    f"""WITH RECURSIVE {_PHASH_CTES},
vpairs AS (
  SELECT img_a, img_b FROM cands WHERE {_PHASH_HD_SQL} <= {PHASH_HD_MAX}
),
edges AS (
  SELECT img_a AS src, img_b AS dst FROM vpairs
  UNION ALL
  SELECT img_b AS src, img_a AS dst FROM vpairs
),
reach(img_id, r) AS (
  SELECT src, src FROM edges
  UNION
  SELECT e.src, w.r FROM edges e JOIN reach w ON w.img_id = e.dst
),
labels AS (SELECT img_id, min(r) AS comp FROM reach GROUP BY img_id)
SELECT comp AS cluster_id,
       CAST(count(*) AS BIGINT) AS n_images,
       min(img_id) AS keep_img_id,
       string_agg(CAST(img_id AS VARCHAR), ',' ORDER BY img_id) AS members
FROM labels GROUP BY comp
"""
).format(G_ROWS=_phash_g_sql_rows())


# --- color JPEG round-trip (YCbCr 4:2:0, exact on the flat-MCU class) ---------

JPEG_COLOR_MCUS = 32  # one 16x16 MCU per md5 hex char, stacked vertically
JPEG_COLOR_W = 16


def jpeg_color_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle-checked color-JPEG round-trip: one 16x16 MCU per md5 hex
    char (16 x 512 image), Y = 208 - 2*ascii(c) (even offset from 128,
    the luma-lossless grid), Cb = 128 + 17*((ascii(c) % 3) - 1) and Cr
    likewise from the REVERSED char order (the chroma DC step is 17,
    and gcd(8,17)=1 makes 128±17k the exact-survival grid) — through
    the full 3-component codec: 4:2:0 mean subsampling (exact on a
    constant MCU), per-component Annex K quantization, FOUR Huffman
    tables interleaved in MCU order, then the real decoder. The oracle
    predicts all three decoded planes arithmetically; planes hash via
    their lowercase hex encoding because chroma values (111/128/145)
    exceed 0x7F and raw-byte strings would not survive both engines'
    UTF-8 handling.

    Scale shape: identical to the grayscale twin — one Arrow-batched
    mapInPandas pass over the repartitioned scan, no shuffle."""
    import hashlib

    from . import codecs

    p = spark.sparkContext.defaultParallelism
    d = io.load(spark, sf_dir, "documents").repartition(p, "doc_id").select(
        "doc_id", "text"
    )
    w, nm = JPEG_COLOR_W, JPEG_COLOR_MCUS
    h = 16 * nm

    def _roundtrip(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                hx = hashlib.md5((text or "").encode("utf-8")).hexdigest()
                y = b"".join(
                    bytes([208 - 2 * ord(c)]) * 256 for c in hx
                )
                cb = b"".join(
                    bytes([128 + 17 * ((ord(c) % 3) - 1)]) * 256 for c in hx
                )
                cr = b"".join(
                    bytes([128 + 17 * ((ord(c) % 3) - 1)]) * 256
                    for c in reversed(hx)
                )
                jp = codecs.encode_jpeg_ycbcr(y, cb, cr, w, h)
                w2, h2, y2, cb2, cr2 = codecs.decode_jpeg_ycbcr(jp)
                rows.append((
                    doc_id, w2, h2,
                    hashlib.md5(y2.hex().encode()).hexdigest(),
                    hashlib.md5(cb2.hex().encode()).hexdigest(),
                    hashlib.md5(cr2.hex().encode()).hexdigest(),
                ))
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "width", "height",
                         "y_md5", "cb_md5", "cr_md5"],
            )

    return d.mapInPandas(
        _roundtrip,
        schema=("doc_id bigint, width int, height int, "
                "y_md5 string, cb_md5 string, cr_md5 string"),
    )


JPEG_COLOR_ROUNDTRIP_SQL = f"""
SELECT doc_id,
       {JPEG_COLOR_W} AS width,
       {16 * JPEG_COLOR_MCUS} AS height,
       md5(array_to_string(list_transform(
           generate_series(1, {JPEG_COLOR_MCUS}),
           i -> repeat(lpad(lower(to_hex(
                    208 - 2 * ascii(substr(md5(coalesce(text, '')), i, 1))
                )), 2, '0'), 256)
       ), '')) AS y_md5,
       md5(array_to_string(list_transform(
           generate_series(1, {JPEG_COLOR_MCUS}),
           i -> repeat(lpad(lower(to_hex(
                    128 + 17 * ((ascii(substr(md5(coalesce(text, '')), i, 1)) % 3) - 1)
                )), 2, '0'), 64)
       ), '')) AS cb_md5,
       md5(array_to_string(list_transform(
           generate_series(1, {JPEG_COLOR_MCUS}),
           i -> repeat(lpad(lower(to_hex(
                    128 + 17 * ((ascii(substr(md5(coalesce(text, '')),
                                       {JPEG_COLOR_MCUS} + 1 - i, 1)) % 3) - 1)
                )), 2, '0'), 64)
       ), '')) AS cr_md5
FROM documents
"""


# --- audio fingerprint (spectral-peak constellation, Wang 2003) ---------------

AUDIO_FFT_N = 1024      # samples per analysis frame (one frame per segment)
AUDIO_SEGS = 4          # segments per derived sound
AUDIO_RATE = 16000
AUDIO_AMPS = (9000.0, 6000.0, 3000.0)   # distinct -> deterministic peak order
AUDIO_BASES = (20, 170, 320)            # disjoint 128-wide bin ranges per slot
AUDIO_MIN_SHARED = 2    # near-dup admission: >= 2 matching segment constellations


def _audio_tone_bins(text: str) -> list[list[int]]:
    """Per-segment tone bins from md5(text): segment s, slot i uses TWO
    hex chars (6s+2i, 6s+2i+1) — bin = BASES[i] + 8*(a1 % 16) + (a2 % 8),
    a 128-value slot; ranges disjoint so a segment's three tones never
    collide, and all bins stay below the rfft's 512-bin ceiling.

    Why two chars per slot: hex chars carry only 16 distinct ascii
    values, so a one-char slot gives 16^3 = 4096 possible segment
    constellations — and constellations ARE the near-dup blocking
    buckets, so bucket occupancy (and probe candidate mass) would grow
    as n/4096: the fingerprint-store rehearsal MEASURED the resulting
    linear per-wave probe drift at only 800k items. Two chars give
    128^3 ≈ 2M combos — occupancy stays sub-1 far past the rehearsal
    scale, and the knob (chars per slot) is explicit."""
    import hashlib

    hx = hashlib.md5((text or "").encode("utf-8")).hexdigest()
    return [
        [
            AUDIO_BASES[i]
            + 8 * (ord(hx[6 * s + 2 * i]) % 16)
            + (ord(hx[6 * s + 2 * i + 1]) % 8)
            for i in range(3)
        ]
        for s in range(AUDIO_SEGS)
    ]


def audio_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio perceptual fingerprint — the audio pillar's twin of pHash:
    each document derives TWO sounds (orig, and a half-gain,
    pi/3-phase-shifted copy — 'same recording, different level'), each
    synthesized as 4 segments x 3 bin-aligned pure tones, pushed
    through the REAL WAV codec (encode_wav -> decode_wav, int16 PCM),
    then fingerprinted by genuine DSP: per segment, an rFFT magnitude
    spectrum and its top-3 peak bins by magnitude (the Shazam
    constellation idea, Wang ISMIR 2003 — peaks survive gain and phase
    changes, which the second variant proves: both variants emit the
    SAME fingerprint).

    Why a SQL oracle can predict an FFT's output: bin-aligned pure
    tones concentrate all their energy in one DFT bin each (no
    leakage), amplitudes are distinct per slot, and int16 quantization
    noise is ~1 LSB spread across the spectrum — the measured
    peak-to-strongest-noise margin is >= 1.7e4, so the top-3 argsort is
    deterministic and equals the tone bins in amplitude order,
    computable from md5(text) arithmetically. A hash match therefore
    proves a real synthesize -> encode -> decode -> FFT -> peak-pick
    pipeline end-to-end.

    Scale shape: one Arrow-batched mapInPandas pass, no shuffle."""
    from .dedup import _cached

    def build():
        p = spark.sparkContext.defaultParallelism
        d = io.load(spark, sf_dir, "documents").repartition(p, "doc_id").select(
            "doc_id", "text"
        )
        return audio_fingerprint_of(d)

    # session-cached (r10): the synthesize→WAV→FFT pass feeds both the
    # fingerprint gate and mm_audio_neardup — run once per session
    return _cached(spark, sf_dir, "audio_fp", build)


def audio_fingerprint_of(d: DataFrame) -> DataFrame:
    """(doc_id, text) → (snd_id, n_samples, fingerprint) — THE shared
    fingerprint core (the batch query and the streaming keyed store
    both call it)."""
    import math

    from . import codecs

    n, segs = AUDIO_FFT_N, AUDIO_SEGS

    def _fp(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        t = np.arange(n)
        rows = []
        for pdf in batches:
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                bins = _audio_tone_bins(text)
                for variant, (gain, phase) in enumerate(
                    [(1.0, 0.0), (0.5, math.pi / 3)]
                ):
                    pcm = np.zeros(segs * n)
                    for s, ks in enumerate(bins):
                        pcm[s * n:(s + 1) * n] = sum(
                            AUDIO_AMPS[i] * gain
                            * np.sin(2 * math.pi * ks[i] * t / n + phase)
                            for i in range(3)
                        )
                    pcm16 = np.clip(
                        np.rint(pcm), -32768, 32767
                    ).astype("<i2")
                    wav = codecs.encode_wav(
                        pcm16.tobytes(), n_channels=1,
                        sample_rate=AUDIO_RATE, sampwidth=2,
                    )
                    _, _, n_frames, out = codecs.decode_wav(wav)
                    x = np.frombuffer(out, dtype="<i2").astype(np.float64)
                    # one batched rFFT over all segments (axis=1) —
                    # identical per-row transforms, one dispatch
                    specs = np.abs(np.fft.rfft(x.reshape(segs, n), axis=1))
                    specs[:, 0] = 0.0
                    order = np.argsort(-specs, axis=1, kind="stable")[:, :3]
                    fp = [int(b) for row in order for b in row]
                    rows.append((
                        2 * int(doc_id) + variant, int(n_frames),
                        "-".join(str(b) for b in fp),
                    ))
            yield pd.DataFrame(
                rows, columns=["snd_id", "n_samples", "fingerprint"]
            )
            rows = []

    return d.mapInPandas(
        _fp, schema="snd_id bigint, n_samples int, fingerprint string"
    )


_AUDIO_FP_DUCK = f"""
  SELECT 2*doc_id + v.range AS snd_id,
         {AUDIO_SEGS * AUDIO_FFT_N} AS n_samples,
         array_to_string(flatten(list_transform(
             generate_series(0, {AUDIO_SEGS - 1}),
             s -> list_transform(generate_series(0, 2), i ->
                 CAST(list_value({AUDIO_BASES[0]}, {AUDIO_BASES[1]}, {AUDIO_BASES[2]})[i + 1]
                      + 8 * (ascii(substr(md5(coalesce(text, '')), 6*s + 2*i + 1, 1)) % 16)
                      + (ascii(substr(md5(coalesce(text, '')), 6*s + 2*i + 2, 1)) % 8)
                  AS VARCHAR))
         )), '-') AS fingerprint
  FROM documents CROSS JOIN range(2) v
"""

AUDIO_FINGERPRINT_SQL = f"SELECT snd_id, n_samples, fingerprint FROM ({_AUDIO_FP_DUCK})"


def audio_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio near-duplicate pairs: sounds sharing >= AUDIO_MIN_SHARED
    time-aligned segment constellations — the Shazam matching rule
    (anchor hashes joined by position), expressed as the engine's
    standard blocking equi-join: explode (seg_idx, seg_constellation)
    sub-fingerprints, equi-join, count shared segments per pair. The
    gain/phase variant pairs share all segments; unrelated sounds need
    two 3-tone constellations to coincide at the same position
    (~64^-6 per segment pair) — blocking, never all-pairs.

    Scale: sub-fingerprint buckets are the shuffle key (bounded
    occupancy, same contract as the SimHash/pHash bands); the shared-
    count aggregate runs on the sparse collision set only."""
    # lazy checkpoint: the pairing self-join reads keys from BOTH
    # sides — materialize the segment-key aggregation once (r10)
    keys = audio_segment_keys(
        audio_fingerprint(spark, sf_dir)
    ).localCheckpoint(eager=False)
    return keyed_fingerprint_pairs(keys, AUDIO_MIN_SHARED).select(
        F.col("item_a").alias("snd_a"),
        F.col("item_b").alias("snd_b"),
        "n_shared",
    )


def audio_segment_keys(fp: DataFrame) -> DataFrame:
    """(snd_id, fingerprint) → (item_id, fkey) sub-fingerprint keys,
    one per segment: 'seg_idx:k1-k2-k3' — time-aligned matching means
    the segment index is PART of the key. Shared by the batch pair
    query and the streaming keyed-fingerprint store (stream ≡ batch is
    equality of resolved key tables + the same threshold)."""
    seg = fp.select(
        "snd_id",
        F.posexplode(F.split("fingerprint", "-", -1)).alias("pos", "bin"),
    ).select(
        "snd_id",
        (F.col("pos") / 3).cast("int").alias("seg_idx"),
        F.col("pos").alias("pos"),
        F.col("bin").alias("bin"),
    ).groupBy("snd_id", "seg_idx").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("pos", "bin"))
                ),
                lambda x: x["bin"],
            ),
            "-",
        ).alias("seg_fp")
    )
    return seg.select(
        F.col("snd_id").alias("item_id"),
        F.concat_ws(":", F.col("seg_idx").cast("string"), "seg_fp")
        .alias("fkey"),
    )


def keyed_fingerprint_pairs(keys: DataFrame, min_shared: int) -> DataFrame:
    """(item_id, fkey) — distinct per item — → pairs of items sharing
    >= min_shared keys: the engine's standard blocking equi-join (the
    fkey IS the bucket), count aggregate on the sparse collision set
    only. Output (item_a < item_b, n_shared)."""
    a = keys.select(F.col("item_id").alias("item_a"), "fkey")
    b = keys.select(
        F.col("item_id").alias("item_b"), F.col("fkey").alias("fkey_b")
    )
    return (
        a.join(b, (a.fkey == b.fkey_b) & (a.item_a < b.item_b))
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )


AUDIO_NEARDUP_SQL = f"""
WITH fp AS ({_AUDIO_FP_DUCK}),
seg AS (
  SELECT snd_id, s.range AS seg_idx,
         array_to_string(list_transform(generate_series(1, 3), i ->
             string_split(fingerprint, '-')[CAST(3*s.range + i AS INT)]
         ), '-') AS seg_fp
  FROM fp CROSS JOIN range({AUDIO_SEGS}) s
)
SELECT a.snd_id AS snd_a, b.snd_id AS snd_b,
       CAST(count(*) AS BIGINT) AS n_shared
FROM seg a JOIN seg b
  ON a.seg_idx = b.seg_idx AND a.seg_fp = b.seg_fp AND a.snd_id < b.snd_id
GROUP BY 1, 2
HAVING count(*) >= {AUDIO_MIN_SHARED}
"""


# --- video perceptual near-dup (per-frame pHash bag matching) ------------------

VIDEO_FRAMES = 6        # frames in the orig cut
VIDEO_SAMPLE_EVERY = 2  # the re-sampled variant keeps every 2nd frame
VIDEO_MIN_SHARED = 2    # near-dup admission: >= 2 shared frame hashes


def _video_frame_tiles(text: str, f: int) -> list[int]:
    import hashlib

    base = f"{text or ''}:{f}"
    hh = (
        hashlib.md5(base.encode("utf-8")).hexdigest()
        + hashlib.md5((base + "x").encode("utf-8")).hexdigest()
    )
    return [ord(c) for c in hh]


def video_phash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-frame perceptual hashes for derived VIDEOS — the video leg
    of the perceptual triad (image pHash, audio constellation, this):
    each document derives an original 6-frame cut and a temporally
    RE-SAMPLED variant (every 2nd frame — 'same footage, lower frame
    rate'); frames are real 32x32 grayscale PNGs muxed into the ANIM
    container, and the pipeline runs the genuine chain per video:
    demux -> PNG-decode each frame -> ``codecs.phash_bands`` -> 16-hex
    frame hash. The oracle predicts every frame hash arithmetically
    (the pHash tile-sandwich argument, per frame).

    Scale shape: row-expanding mapInPandas (doc -> ~9 frame rows), no
    shuffle — real video work (av/ffmpeg demux + keyframe decode)
    drops into the same iterator."""
    from .dedup import _cached

    def build():
        p = spark.sparkContext.defaultParallelism
        d = io.load(spark, sf_dir, "documents").repartition(p, "doc_id").select(
            "doc_id", "text"
        )
        return video_phash_of(d)

    # session-cached (r10): demux + per-frame PNG decode + pHash feeds
    # both the per-frame gate and mm_video_phash_neardup
    return _cached(spark, sf_dir, "video_phash", build)


def video_phash_of(d: DataFrame) -> DataFrame:
    """(doc_id, text) → (vid_id, frame_idx, phash_hex) — THE shared
    per-frame hashing core (batch query and streaming store)."""
    import struct

    from . import codecs

    def _rows(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        rows = []
        for pdf in batches:
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                frame_png = []
                for f in range(VIDEO_FRAMES):
                    t = np.array(
                        _video_frame_tiles(text, f), dtype=np.float64
                    ).reshape(8, 8)
                    pix = np.kron(t, np.ones((4, 4))).astype(np.uint8)
                    frame_png.append(
                        codecs.encode_png(pix.tobytes(), 32, 32, channels=1)
                    )
                cuts = [
                    frame_png,
                    frame_png[::VIDEO_SAMPLE_EVERY],  # re-sampled variant
                ]
                for variant, frames in enumerate(cuts):
                    blob = b"".join(
                        [b"ANIM", struct.pack("<I", len(frames))]
                        + [struct.pack("<I", len(fr)) + fr for fr in frames]
                    )
                    assert blob[:4] == b"ANIM"
                    (nf,) = struct.unpack("<I", blob[4:8])
                    off = 8
                    for idx in range(nf):
                        (flen,) = struct.unpack("<I", blob[off:off + 4])
                        off += 4
                        payload = blob[off:off + flen]
                        off += flen
                        w, h, ch, pix = codecs.decode_png(payload)
                        assert (w, h, ch) == (32, 32, 1)
                        bands = codecs.phash_bands(pix, 32, 32)
                        rows.append((
                            2 * int(doc_id) + variant, idx,
                            "".join(f"{b:04x}" for b in bands),
                        ))
            yield pd.DataFrame(
                rows, columns=["vid_id", "frame_idx", "phash_hex"]
            )
            rows = []

    return d.mapInPandas(
        _rows, schema="vid_id bigint, frame_idx int, phash_hex string"
    )


def video_phash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video near-duplicate pairs: videos sharing >= VIDEO_MIN_SHARED
    frame pHashes as a BAG (position-independent — exactly what makes
    the match robust to temporal re-sampling: the every-2nd-frame
    variant shares 3 of its 3 frames with its original regardless of
    index shifts). The blocking key is the frame hash itself — an
    equi-shuffle on a 64-bit value; for RE-ENCODED (not re-sampled)
    frames, the pHash banded-Hamming join composes here in place of
    exact equality."""
    keys = video_frame_keys(
        video_phash(spark, sf_dir)
    ).localCheckpoint(eager=False)  # both self-join sides read it
    return keyed_fingerprint_pairs(keys, VIDEO_MIN_SHARED).select(
        F.col("item_a").alias("vid_a"),
        F.col("item_b").alias("vid_b"),
        "n_shared",
    )


def video_frame_keys(fp: DataFrame) -> DataFrame:
    """(vid_id, frame_idx, phash_hex) → (item_id, fkey) BAG keys —
    frame index deliberately NOT in the key (position independence is
    what survives temporal re-sampling); distinct per item. Shared by
    the batch pair query and the streaming keyed-fingerprint store."""
    return fp.select(
        F.col("vid_id").alias("item_id"),
        F.col("phash_hex").alias("fkey"),
    ).distinct()


def _video_phash_duck() -> str:
    """Frame-hash CTE chain: same G-sandwich as the image oracle, per
    (doc, source frame); variant 1's frame j maps to source frame 2j."""
    return f"""g(u, a, gv) AS (VALUES {_phash_g_sql_rows()}),
vids AS (
  SELECT doc_id, v.range AS variant, 2*doc_id + v.range AS vid_id,
         f.range AS frame_idx,
         CASE WHEN v.range = 1 THEN f.range * {VIDEO_SAMPLE_EVERY}
              ELSE f.range END AS src_f
  FROM documents
  CROSS JOIN range(2) v
  CROSS JOIN range({VIDEO_FRAMES}) f
  WHERE v.range = 0 OR f.range < {(VIDEO_FRAMES + VIDEO_SAMPLE_EVERY - 1) // VIDEO_SAMPLE_EVERY}
),
vtiles AS (
  SELECT vid_id, frame_idx, t.range AS idx,
         ascii(substr(
             md5(coalesce(text, '') || ':' || CAST(src_f AS VARCHAR))
             || md5(coalesce(text, '') || ':' || CAST(src_f AS VARCHAR) || 'x'),
             CAST(t.range + 1 AS INT), 1)) AS tv
  FROM vids JOIN documents USING (doc_id)
  CROSS JOIN range(64) t
),
vcoef AS (
  SELECT vid_id, frame_idx, k.range AS k, sum(tv * gu.gv * gv2.gv) AS c
  FROM vtiles
  CROSS JOIN range(64) k
  JOIN g gu  ON gu.u  = k.range // 8 AND gu.a  = idx // 8
  JOIN g gv2 ON gv2.u = k.range % 8  AND gv2.a = idx % 8
  GROUP BY 1, 2, 3
),
vstats AS (
  SELECT vid_id, frame_idx, avg(CASE WHEN k > 0 THEN c END) AS m
  FROM vcoef GROUP BY 1, 2
),
vbits AS (
  SELECT vcoef.vid_id, vcoef.frame_idx, k,
         CASE WHEN c > m THEN 1 ELSE 0 END AS bit
  FROM vcoef JOIN vstats
    ON vcoef.vid_id = vstats.vid_id AND vcoef.frame_idx = vstats.frame_idx
),
vhash AS (
  SELECT vid_id, frame_idx,
         lower(concat(
           lpad(to_hex(CAST(sum(CASE WHEN k < 16 THEN bit::BIGINT << CAST(15 - k AS INT) ELSE 0 END) AS BIGINT)), 4, '0'),
           lpad(to_hex(CAST(sum(CASE WHEN k >= 16 AND k < 32 THEN bit::BIGINT << CAST(31 - k AS INT) ELSE 0 END) AS BIGINT)), 4, '0'),
           lpad(to_hex(CAST(sum(CASE WHEN k >= 32 AND k < 48 THEN bit::BIGINT << CAST(47 - k AS INT) ELSE 0 END) AS BIGINT)), 4, '0'),
           lpad(to_hex(CAST(sum(CASE WHEN k >= 48 THEN bit::BIGINT << CAST(63 - k AS INT) ELSE 0 END) AS BIGINT)), 4, '0')
         )) AS phash_hex
  FROM vbits GROUP BY 1, 2
)"""


VIDEO_PHASH_SQL = (
    f"WITH {_video_phash_duck()}\n"
    "SELECT vid_id, CAST(frame_idx AS INT) AS frame_idx, phash_hex FROM vhash"
)

VIDEO_PHASH_NEARDUP_SQL = f"""WITH {_video_phash_duck()},
vd AS (SELECT DISTINCT vid_id, phash_hex FROM vhash)
SELECT a.vid_id AS vid_a, b.vid_id AS vid_b,
       CAST(count(*) AS BIGINT) AS n_shared
FROM vd a JOIN vd b ON a.phash_hex = b.phash_hex AND a.vid_id < b.vid_id
GROUP BY 1, 2
HAVING count(*) >= {VIDEO_MIN_SHARED}
"""
