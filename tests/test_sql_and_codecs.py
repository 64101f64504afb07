"""SQL-view surface tests + property tests for the pure-stdlib codecs
(no Spark needed for the codec properties — they run on the driver)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from maillog2db_spark import sql as msql
from maillog2db_spark.operators import codecs

SF = "/root/testdata/sf0.001"


def test_register_views_sql_matches_dataframe(spark):
    views = msql.register_views(spark, SF)
    assert set(msql.CANONICAL_TABLES) <= set(views)
    assert "lineitem" in views and "documents" in views

    # pure-SQL user query over a testdata view matches the DataFrame path
    from maillog2db_spark import io

    got = spark.sql(
        "SELECT l_returnflag, count(*) AS n FROM lineitem GROUP BY 1 ORDER BY 1"
    ).collect()
    li = io.load(spark, SF, "lineitem")
    want = sorted(
        (r["l_returnflag"], r["count"])
        for r in li.groupBy("l_returnflag").count().collect()
    )
    assert [(r.l_returnflag, r.n) for r in got] == want

    # canonical maillog view joins work in pure SQL
    joined = spark.sql(
        """
        SELECT d.delivery_status, count(*) AS n
        FROM deliveries d JOIN messages m
          ON d.delivery_queueid = m.message_queueid
        GROUP BY 1
        """
    ).collect()
    assert joined and all(r.n > 0 for r in joined)


@settings(max_examples=25, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    w=st.integers(1, 24),
    h=st.integers(1, 24),
    ch=st.sampled_from([1, 2, 3, 4]),
    data=st.data(),
)
def test_png_roundtrip_property(w, h, ch, data):
    pix = bytes(
        data.draw(
            st.lists(st.integers(0, 255), min_size=w * h * ch, max_size=w * h * ch)
        )
    )
    png = codecs.encode_png(pix, w, h, ch)
    assert codecs.sniff_media_type(png) == "image/png"
    assert codecs.decode_png(png) == (w, h, ch, pix)


@settings(max_examples=25, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    n_frames=st.integers(0, 500),
    n_channels=st.sampled_from([1, 2]),
    rate=st.sampled_from([8000, 16000, 44100]),
)
def test_wav_roundtrip_property(n_frames, n_channels, rate):
    pcm = bytes((i * 37) % 256 for i in range(n_frames * 2 * n_channels))
    wavb = codecs.encode_wav(pcm, n_channels=n_channels, sample_rate=rate)
    assert codecs.sniff_media_type(wavb) == "audio/wav"
    ch, r, nf, pcm2 = codecs.decode_wav(wavb)
    assert (ch, r, nf, pcm2) == (n_channels, rate, n_frames, pcm)


@settings(max_examples=20, deadline=None, suppress_health_check=list(HealthCheck))
@given(w=st.integers(1, 16), h=st.integers(1, 16), nw=st.integers(1, 16), nh=st.integers(1, 16))
def test_resize_nearest_dims_property(w, h, nw, nh):
    ch = 3
    pix = bytes((i * 11) % 256 for i in range(w * h * ch))
    out = codecs.resize_nearest(pix, w, h, ch, nw, nh)
    assert len(out) == nw * nh * ch
    # corner pixel maps to source corner (nearest-neighbor identity)
    assert out[:ch] == pix[:ch]


@settings(max_examples=20, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    blocks=st.lists(st.integers(-62, 63), min_size=1, max_size=12),
)
def test_jpeg_flat_even_blocks_roundtrip_exactly(blocks):
    """The exactness class the hash-verified query rides: constant 8×8
    blocks at EVEN offsets from 128 have zero AC coefficients and a DC
    coefficient that is an exact multiple of the Annex K DC step, so
    the lossy codec is lossless on them."""
    vals = [128 + 2 * b for b in blocks]  # even offsets, 4..254
    w, h = 8, 8 * len(vals)
    pix = bytes(v for v in vals for _ in range(64))
    jp = codecs.encode_jpeg_gray(pix, w, h)
    assert jp[:2] == b"\xff\xd8" and jp[-2:] == b"\xff\xd9"
    assert codecs.decode_jpeg_gray(jp) == (w, h, pix)


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    w=st.integers(1, 21),
    h=st.integers(1, 21),
    seed=st.integers(0, 2**31),
)
def test_jpeg_lossy_roundtrip_is_bounded_and_deterministic(w, h, seed):
    """The general lossy path: arbitrary images (including dimensions
    that are not multiples of 8) round-trip with recovered dimensions,
    bounded reconstruction error, and byte-identical re-encodes.
    Random noise is the worst case for a DCT codec — the Annex K
    tables bound per-pixel error well under half the dynamic range."""
    import random

    rng = random.Random(seed)
    pix = bytes(rng.randrange(256) for _ in range(w * h))
    jp = codecs.encode_jpeg_gray(pix, w, h)
    assert codecs.encode_jpeg_gray(pix, w, h) == jp  # deterministic
    w2, h2, out = codecs.decode_jpeg_gray(jp)
    assert (w2, h2) == (w, h) and len(out) == w * h
    assert max(abs(a - b) for a, b in zip(pix, out)) <= 128


def test_jpeg_smooth_images_reconstruct_closely():
    """DCT codecs are built for smooth content: a gradient reconstructs
    within a few levels per pixel (this is the semantic check that the
    transform/quantization really are JPEG's, not merely mutually
    inverse)."""
    import math

    w, h = 32, 24
    pix = bytes(
        min(255, max(0, 128 + int(60 * math.sin(x / 5) * math.cos(y / 4))))
        for y in range(h) for x in range(w)
    )
    _, _, out = codecs.decode_jpeg_gray(codecs.encode_jpeg_gray(pix, w, h))
    errs = [abs(a - b) for a, b in zip(pix, out)]
    assert max(errs) <= 12 and sum(errs) / len(errs) <= 3
