"""Multimodal plumbing tests: schema, batch shape, row cardinality, and
determinism of the mapInPandas operators (the codec itself is a
deterministic fake — the Spark-side contract is what's under test)."""

from __future__ import annotations

import pytest

from maillog2db_spark.operators import multimodal as mm

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def media(spark):
    return mm.documents_as_media(spark, SF).limit(50).cache()


def test_decode_schema_and_cardinality(spark, media):
    out = mm.decode_media(media)
    assert out.columns == ["doc_id", "media_type", "n_bytes", "width", "height", "n_frames", "ok"]
    rows = out.collect()
    assert len(rows) == media.count()  # 1:1
    assert all(r.ok for r in rows)
    assert all(16 <= r.width < 80 and 1 <= r.n_frames <= 8 for r in rows)


def _png_corpus(spark):
    """Synthesized real media: PNGs of varying size/colortype, WAVs of
    varying frame counts, one corrupt payload."""
    from maillog2db_spark.operators import codecs

    rows = []
    for i, (w, h, ch) in enumerate([(5, 3, 1), (7, 4, 3), (6, 6, 4), (16, 2, 2)]):
        pix = bytes((i + x * 7 + 13) % 256 for x in range(w * h * ch))
        rows.append((i, codecs.encode_png(pix, w, h, ch), w, h, 1))
    for i, n_frames in enumerate([160, 801, 7]):
        pcm = bytes((i + x) % 256 for x in range(n_frames * 2))
        rows.append((10 + i, codecs.encode_wav(pcm), 0, 0, n_frames))
    rows.append((99, b"definitely not media", -1, -1, -1))
    return spark.createDataFrame(
        [(r[0], r[1]) for r in rows], "doc_id long, payload binary"
    ), {r[0]: (r[2], r[3], r[4]) for r in rows}


def test_decode_real_codec_parses_actual_png_and_wav(spark):
    """real_codec=True decodes true dimensions/frame counts out of
    actual bytes through the distributed mapInPandas path; the corrupt
    payload is quarantined (ok=False), not a task failure."""
    df, expected = _png_corpus(spark)
    got = {r.doc_id: r for r in mm.decode_media(df, real_codec=True).collect()}
    assert set(got) == set(expected)
    for doc_id, (w, h, n_frames) in expected.items():
        r = got[doc_id]
        if w == -1:
            assert not r.ok and r.media_type == "unknown"
        elif n_frames == 1:
            assert r.ok and r.media_type == "image/png" and (r.width, r.height) == (w, h)
        else:
            assert r.ok and r.media_type == "audio/wav" and r.n_frames == n_frames


def test_png_roundtrip_all_filter_types():
    """The decoder must handle every scanline filter type (1-4), which
    our filter-0-only encoder never emits: craft the filtered streams
    by hand and check they reconstruct the same pixels."""
    import struct
    import zlib

    from maillog2db_spark.operators import codecs

    w, h, ch = 4, 3, 3
    pix = bytes((x * 31 + 7) % 256 for x in range(w * h * ch))
    stride = w * ch

    def rebuild(filter_rows: bytes) -> bytes:
        ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)

        def chunk(tag, data):
            return (
                struct.pack(">I", len(data))
                + tag
                + data
                + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
            )

        return (
            codecs.PNG_SIGNATURE
            + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(filter_rows))
            + chunk(b"IEND", b"")
        )

    rows = [bytearray(pix[y * stride : (y + 1) * stride]) for y in range(h)]

    # forward-apply each filter type to construct the encoded stream
    def sub(row, prev):
        return bytes((row[i] - (row[i - ch] if i >= ch else 0)) & 0xFF for i in range(stride))

    def up(row, prev):
        return bytes((row[i] - prev[i]) & 0xFF for i in range(stride))

    def avg(row, prev):
        return bytes(
            (row[i] - (((row[i - ch] if i >= ch else 0) + prev[i]) >> 1)) & 0xFF
            for i in range(stride)
        )

    def paeth(row, prev):
        out = []
        for i in range(stride):
            a = row[i - ch] if i >= ch else 0
            c = prev[i - ch] if i >= ch else 0
            out.append((row[i] - codecs._paeth(a, prev[i], c)) & 0xFF)
        return bytes(out)

    for ftype, f in [(1, sub), (2, up), (3, avg), (4, paeth)]:
        stream = bytearray()
        prev = bytearray(stride)
        for y in range(h):
            stream += bytes([ftype]) + f(rows[y], prev)
            prev = rows[y]
        got = codecs.decode_png(rebuild(bytes(stream)))
        assert got == (w, h, ch, pix), f"filter type {ftype} broken"


def test_resize_real_codec_produces_valid_smaller_png(spark):
    from maillog2db_spark.operators import codecs

    df, expected = _png_corpus(spark)
    out = {r.doc_id: r for r in mm.resize_media(df, width=3, height=2, real_codec=True).collect()}
    for doc_id, (w, h, n_frames) in expected.items():
        r = out[doc_id]
        if n_frames == 1 and w > 0:  # the PNG rows
            w2, h2, ch2, pix2 = codecs.decode_png(bytes(r.payload))
            assert (w2, h2) == (3, 2) and len(pix2) == 3 * 2 * ch2
            assert (r.width, r.height) == (3, 2)
        else:  # WAV / corrupt payloads pass through quarantined
            assert r.width == -1 and bytes(r.payload)


def test_resize_bounds_payload(spark, media):
    out = mm.resize_media(media, width=8, height=8).collect()
    assert all(len(r.payload) == 64 and r.width == 8 for r in out)


def test_sample_frames_expands_rows(spark, media):
    decoded = {r.doc_id: r.n_frames for r in mm.decode_media(media).collect()}
    frames = mm.sample_frames(media, every_n=4).collect()
    # expected frames per doc: indices 0, 4 of range(n_frames) stepped by 4
    expected = sum(len(range(0, n, 4)) for n in decoded.values())
    assert len(frames) == expected
    assert all(f.frame_idx % 4 == 0 for f in frames)


def test_extract_features_deterministic_unit_mass(spark, media):
    out = mm.extract_features(media)
    rows = out.collect()
    assert all(len(r.features) == mm.FEATURE_DIM for r in rows)
    # histogram normalized by byte count → sums to ~1 for non-empty payloads
    for r in rows:
        assert abs(sum(r.features) - 1.0) < 1e-5
    # determinism across runs
    again = {r.doc_id: r.features for r in out.collect()}
    assert all(again[r.doc_id] == r.features for r in rows)


def test_wav_loudness_constant_tone_and_multibyte(spark, tmp_path):
    """A constant-character document is a constant tone: peak == rms ==
    |(cp%256 - 128)|*256 exactly. Multi-byte chars count as ONE frame
    each (code-point PCM, the cross-engine contract), and empty text
    yields a silent zero-frame row."""
    rows = [
        (0, "aaaa", "en", "s0", 4),            # cp 97 -> sample -7936
        (1, "éé", "en", "s0", 2),    # é cp 233 -> (233-128)*256 = 26880
        (2, "", "en", "s0", 0),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.write.parquet(f"{tmp_path}/documents.parquet")
    out = {r.doc_id: r for r in mm.wav_loudness(spark, str(tmp_path)).collect()}
    assert out[0].n_frames == 4 and out[0].peak == 7936 and out[0].rms == 7936.0
    assert out[1].n_frames == 2 and out[1].peak == 26880 and out[1].rms == 26880.0
    assert out[2].n_frames == 0 and out[2].peak == 0 and out[2].rms == 0.0


def test_frame_sample_demux_indices_and_widths(spark, tmp_path):
    """The demuxer must recover every 4th frame with the chunk's BYTE
    width (8 chars of 2-byte UTF-8 -> width 16) and the md5 of the
    chunk's bytes; docs shorter than one frame still produce frame 0."""
    import hashlib

    rows = [
        (0, "x" * 37, "en", "s0", 37),          # 5 frames -> idx 0, 4
        (1, "é" * 10, "en", "s0", 10),     # 2 frames -> idx 0; width 16
        (2, "ab", "en", "s0", 2),               # 1 frame -> idx 0, width 2
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.write.parquet(f"{tmp_path}/documents.parquet")
    out = sorted(
        (r.doc_id, r.frame_idx, r.width, r.pixel_md5)
        for r in mm.frame_sample(spark, str(tmp_path)).collect()
    )
    md5 = lambda s: hashlib.md5(s.encode("utf-8")).hexdigest()
    assert out == [
        (0, 0, 8, md5("x" * 8)),
        (0, 4, 5, md5("x" * 5)),
        (1, 0, 16, md5("é" * 8)),
        (2, 0, 2, md5("ab")),
    ]
