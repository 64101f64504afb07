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


def _ham64(a: list[int], b: list[int]) -> int:
    return sum(bin(x ^ y).count("1") for x, y in zip(a, b))


def test_phash_jpeg_recompression_invariance():
    """The property the operator exists for: a JPEG-recompressed copy
    of an image pHash-collides with its original (small Hamming
    distance), while perceptually DIFFERENT images stay far apart —
    through the REAL lossy codec, on smooth content (what pHash is
    specified for; pure noise has no perceptual structure to keep)."""
    import math
    import random

    w = h = 64
    far = []
    rng = random.Random(7)
    prev_sig = None
    for trial in range(6):
        fx, fy = rng.uniform(3, 9), rng.uniform(3, 9)
        px, py = rng.uniform(0, 6), rng.uniform(0, 6)
        pix = bytes(
            min(255, max(0, 128 + int(55 * math.sin(x / fx + px)
                                      * math.cos(y / fy + py))))
            for y in range(h) for x in range(w)
        )
        sig = codecs.phash_bands(pix, w, h)
        _, _, out = codecs.decode_jpeg_gray(codecs.encode_jpeg_gray(pix, w, h))
        sig_jpeg = codecs.phash_bands(out, w, h)
        assert _ham64(sig, sig_jpeg) <= 6, "recompressed copy must collide"
        if prev_sig is not None:
            far.append(_ham64(sig, prev_sig))
        prev_sig = sig
    assert min(far) >= 16, f"distinct images must stay far: {far}"


def test_phash_resolution_invariance_on_tile_images():
    """Exact-equality tier: a tile-constant image hashed at 128x128 and
    at 256x256 pools to the SAME 32x32 image, so the hashes are equal
    bit-for-bit (the area-mean path), and the 8x8 tile matrix sandwich
    codecs.PHASH_G @ T @ G^T predicts the bits — the oracle contract."""
    import hashlib

    import numpy as np

    t = hashlib.md5(b"phash-tile").hexdigest() + hashlib.md5(b"x").hexdigest()
    tiles = np.array([ord(c) for c in t], dtype=np.float64).reshape(8, 8)
    sigs = []
    for edge in (16, 32):  # 128x128 and 256x256
        img = np.kron(tiles, np.ones((edge, edge))).astype(np.uint8)
        n = 8 * edge
        sigs.append(codecs.phash_bands(img.tobytes(), n, n))
    assert sigs[0] == sigs[1]

    g = np.array(codecs.PHASH_G)
    d = (g @ tiles @ g.T).ravel()
    m = d[1:].mean()
    bits = (d > m).astype(int)
    want = [int(sum(int(bits[16 * b + j]) << (15 - j) for j in range(16)))
            for b in range(4)]
    assert sigs[0] == want


def test_phash_bands_signed_16bit_range():
    """Band words stay in [0, 65535] — signed-safe for BIGINT xor /
    bit_count on both engines; and the DC bit (bit 0, the 2^15 word-0
    weight) is set for any non-degenerate image (DC dominates the AC
    mean)."""
    import random

    rng = random.Random(3)
    for _ in range(5):
        w = rng.choice([32, 64, 70])
        h = rng.choice([32, 64, 50])
        pix = bytes(rng.randrange(256) for _ in range(w * h))
        bands = codecs.phash_bands(pix, w, h)
        assert all(0 <= b <= 0xFFFF for b in bands)
        assert bands[0] >> 15 == 1


@settings(max_examples=20, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    mcus=st.lists(
        st.tuples(st.integers(-62, 63), st.integers(-1, 1), st.integers(-1, 1)),
        min_size=1, max_size=6,
    )
)
def test_jpeg_color_flat_mcus_roundtrip_exactly(mcus):
    """The color exactness class the hash-verified query rides:
    constant 16x16 MCUs with Y on the even-offset grid (DC step 16)
    and chroma on 128±17k (DC step 17, gcd(8,17)=1) survive the full
    4:2:0 pipeline — subsample, two quant tables, four Huffman tables,
    MCU interleave — bit-exactly in all three planes."""
    w, h = 16, 16 * len(mcus)
    y = b"".join(bytes([128 + 2 * ky]) * 256 for ky, _, _ in mcus)
    cb_full = b"".join(bytes([128 + 17 * kb]) * 256 for _, kb, _ in mcus)
    cr_full = b"".join(bytes([128 + 17 * kr]) * 256 for _, _, kr in mcus)
    jp = codecs.encode_jpeg_ycbcr(y, cb_full, cr_full, w, h)
    assert jp[:2] == b"\xff\xd8" and jp[-2:] == b"\xff\xd9"
    w2, h2, y2, cb2, cr2 = codecs.decode_jpeg_ycbcr(jp)
    assert (w2, h2) == (w, h) and y2 == y
    assert cb2 == b"".join(bytes([128 + 17 * kb]) * 64 for _, kb, _ in mcus)
    assert cr2 == b"".join(bytes([128 + 17 * kr]) * 64 for _, _, kr in mcus)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(w=st.integers(1, 21), h=st.integers(1, 21), seed=st.integers(0, 2**31))
def test_jpeg_color_lossy_roundtrip_is_bounded_and_deterministic(w, h, seed):
    """General color path: arbitrary RGB images (odd dims, partial
    MCUs) round-trip with recovered dimensions, bounded error, and
    byte-identical re-encodes."""
    import random

    rng = random.Random(seed)
    rgb = bytes(rng.randrange(256) for _ in range(w * h * 3))
    jp = codecs.encode_jpeg_color(rgb, w, h)
    assert codecs.encode_jpeg_color(rgb, w, h) == jp
    w2, h2, out = codecs.decode_jpeg_color(jp)
    assert (w2, h2) == (w, h) and len(out) == w * h * 3
    # noise through 2x2 chroma averaging + the flat-99 K.2 table can
    # legitimately swing a CHROMA sample most of the range (4 noise
    # pixels collapse to one stored sample) — the per-channel bound
    # that is meaningful on noise is the unsubsampled LUMA plane,
    # same contract as the grayscale tier
    y_in, _, _ = codecs.rgb_to_ycbcr(rgb, w, h)
    _, _, y_out, _, _ = codecs.decode_jpeg_ycbcr(jp)
    assert max(abs(a - b) for a, b in zip(y_in, y_out)) <= 128


def test_jpeg_color_smooth_images_reconstruct_closely():
    """Smooth color content reconstructs within a few levels per
    channel — the semantic check that the color pipeline (conversion,
    subsample, quant, four Huffman tables) really is JPEG's."""
    import math

    w, h = 32, 32
    rgb = bytes(
        min(255, max(0, 128 + int(50 * math.sin((x + c * 3) / 6)
                                  * math.cos(y / 5))))
        for y in range(h) for x in range(w) for c in range(3)
    )
    _, _, out = codecs.decode_jpeg_color(codecs.encode_jpeg_color(rgb, w, h))
    errs = [abs(a - b) for a, b in zip(rgb, out)]
    assert max(errs) <= 24 and sum(errs) / len(errs) <= 4


@settings(max_examples=20, deadline=None, suppress_health_check=list(HealthCheck))
@given(seed=st.integers(0, 2**31))
def test_ycbcr_conversion_roundtrip_bounded(seed):
    """T.871 full-range conversion round-trips within ±2 per channel
    (each direction rounds once)."""
    import random

    rng = random.Random(seed)
    rgb = bytes(rng.randrange(256) for _ in range(48))
    y, cb, cr = codecs.rgb_to_ycbcr(rgb, 4, 4)
    back = codecs.ycbcr_to_rgb(y, cb, cr)
    assert max(abs(a - b) for a, b in zip(rgb, back)) <= 2


def test_audio_fingerprint_gain_and_phase_invariance():
    """The property the audio operator exists for: the constellation
    fingerprint survives gain changes and phase shifts — including on
    NON-bin-aligned tones (spectral leakage spreads energy, but the
    peak bins don't move under linear scaling), through the real WAV
    round-trip. Distinct content yields distinct prints."""
    import math
    import random

    import numpy as np

    from maillog2db_spark.operators import multimodal as mm

    n = mm.AUDIO_FFT_N
    rng = random.Random(11)

    def fingerprint(freqs, gain, phase):
        t = np.arange(n)
        pcm = sum(
            a * gain * np.sin(2 * math.pi * f * t / n + phase)
            for f, a in freqs
        )
        pcm16 = np.clip(np.rint(pcm), -32768, 32767).astype("<i2")
        wav = codecs.encode_wav(pcm16.tobytes(), 1, mm.AUDIO_RATE, 2)
        _, _, _, out = codecs.decode_wav(wav)
        spec = np.abs(np.fft.rfft(np.frombuffer(out, "<i2").astype(float)))
        spec[0] = 0.0
        return [int(b) for b in np.argsort(-spec, kind="stable")[:3]]

    prints = []
    for _ in range(5):
        freqs = [
            (rng.uniform(25, 80), 9000.0),    # NOT bin-aligned
            (rng.uniform(130, 180), 6000.0),
            (rng.uniform(310, 360), 3000.0),
        ]
        base = fingerprint(freqs, 1.0, 0.0)
        assert fingerprint(freqs, 0.5, math.pi / 3) == base
        assert fingerprint(freqs, 0.25, 1.1) == base
        prints.append(tuple(base))
    assert len(set(prints)) == len(prints), "distinct content must differ"
