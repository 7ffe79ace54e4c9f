"""Baseline JPEG codec (operators/jpeg.py): round-trip tolerance,
decoder-independent goldens, corruption contract, and the seam wiring
through auto_decoder / image_resizer / probe_media / extract_features.

JPEG is LOSSY, so unlike the PNG/BMP/PPM suites the round-trip pins
are tolerance bands, not byte equality — EXCEPT the paths where the
math is exact by construction: flat-color images (DC-only blocks
survive quantization exactly) and the hand-built DC-coefficient
golden, which is derived from the T.81 IDCT definition with no help
from encode_jpeg, so a shared encoder/decoder bug cannot cancel
there.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from exporter_spark.operators import jpeg, multimodal


def _luma(a: np.ndarray) -> np.ndarray:
    a = a.astype(np.float64)
    return 0.299 * a[:, :, 0] + 0.587 * a[:, :, 1] + 0.114 * a[:, :, 2]


def test_flat_color_roundtrip_exact():
    """A uniform image is DC-only in every block; at quality >= 90 the
    quantized DC survives exactly, so decode must be bit-exact."""
    dec = jpeg.jpeg_decoder()
    for val in (0, 1, 127, 128, 254, 255):
        px = np.full((16, 24, 3), val, np.uint8)
        for sub in ("444", "422", "420"):
            back = dec.pixels(jpeg.encode_jpeg(px, quality=95, subsampling=sub))
            assert back.shape == px.shape
            err = int(np.abs(back.astype(int) - px.astype(int)).max())
            assert err <= 1, (val, sub, err)


def test_smooth_gradient_tolerance():
    dec = jpeg.jpeg_decoder()
    x = np.linspace(0, 255, 24)
    grad = np.stack(np.meshgrid(x, x), axis=2)
    img = np.concatenate([grad, grad[:, :, :1]], axis=2).astype(np.uint8)
    back = dec.pixels(jpeg.encode_jpeg(img, quality=95))
    assert int(np.abs(back.astype(int) - img.astype(int)).max()) <= 6


def test_noise_luma_fidelity_and_chroma_subsampling():
    """Random noise is the worst case for the AC tables; at quality 95
    the LUMA channel must still come back within ~2.5/255 mean error
    in every subsampling mode (chroma at 4:2:2/4:2:0 is box-averaged
    by design, so only luma is pinned there). 4:2:2 exercises the
    decoder's horizontal-only (2,1) sampling-grid path, which no
    other fixture reaches."""
    dec = jpeg.jpeg_decoder()
    rng = np.random.RandomState(7)
    img = rng.randint(0, 256, (19, 23, 3), dtype=np.uint8)
    for sub in ("444", "422", "420"):
        back = dec.pixels(jpeg.encode_jpeg(img, quality=95, subsampling=sub))
        assert back.shape == img.shape
        mean_err = float(np.abs(_luma(back) - _luma(img)).mean())
        assert mean_err < 2.5, (sub, mean_err)


def test_grayscale_and_odd_dimensions():
    dec = jpeg.jpeg_decoder()
    rng = np.random.RandomState(11)
    for shape in ((1, 1), (7, 9), (8, 8), (17, 31)):
        gr = rng.randint(0, 256, shape, dtype=np.uint8)
        back = dec.pixels(jpeg.encode_jpeg(gr, quality=95))
        assert back.shape == (*shape, 1)
        # single-component: no chroma, errors are pure DCT quantization
        assert float(np.abs(back[:, :, 0].astype(int) - gr.astype(int)).mean()) < 4


def test_restart_interval_resync():
    """DRI + RSTn markers: decode must resync and reset DC predictors;
    the result must be IDENTICAL to the no-restart encode of the same
    source (restart changes framing, not coefficients)."""
    dec = jpeg.jpeg_decoder()
    rng = np.random.RandomState(3)
    img = rng.randint(0, 256, (24, 40, 3), dtype=np.uint8)
    plain = dec.pixels(jpeg.encode_jpeg(img, quality=90, subsampling="420"))
    for interval in (1, 2, 5):
        rst = dec.pixels(
            jpeg.encode_jpeg(
                img, quality=90, subsampling="420", restart_interval=interval
            )
        )
        assert np.array_equal(rst, plain), interval


def test_chroma_alignment_420():
    """Left-red/right-blue at 4:2:0: the upsampled chroma must land on
    the correct side — a half-MCU misalignment would swap colors at
    sampled pixel centers away from the boundary."""
    dec = jpeg.jpeg_decoder()
    img = np.zeros((16, 32, 3), np.uint8)
    img[:, :16, 0] = 220
    img[:, 16:, 2] = 220
    back = dec.pixels(jpeg.encode_jpeg(img, quality=95, subsampling="420"))
    assert back[8, 4, 0] > 180 and back[8, 4, 2] < 40
    assert back[8, 28, 2] > 180 and back[8, 28, 0] < 40


def _seg(marker: int, body: bytes) -> bytes:
    return bytes([0xFF, marker]) + struct.pack(">H", 2 + len(body)) + body


def _dc_golden_fixture(dqt_16bit: bool = False) -> bytes:
    """Hand-built 8x8 grayscale JPEG, independent of encode_jpeg:
    qt all-16s, custom 1-symbol Huffman tables (DC: code '0' ->
    category 2; AC: code '0' -> EOB), entropy data = DC '0' + amp
    '11' (diff=+3) + EOB '0' + 1-padding.  T.81 math: DC coefficient
    3 dequantizes to 48; the IDCT of a DC-only block is S00/8 = 6;
    level shift +128 -> every pixel exactly 134."""
    if dqt_16bit:
        dqt = _seg(0xDB, bytes([0x10]) + struct.pack(">64H", *([16] * 64)))
    else:
        dqt = _seg(0xDB, bytes([0x00]) + bytes([16] * 64))
    return (
        b"\xff\xd8"
        + dqt
        + _seg(0xC0, struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0]))
        + _seg(0xC4, bytes([0x00]) + bytes([1] + [0] * 15) + bytes([2]))
        + _seg(0xC4, bytes([0x10]) + bytes([1] + [0] * 15) + bytes([0x00]))
        + _seg(0xDA, bytes([1, 1, 0x00, 0x00, 0x3F, 0x00]))
        + bytes([0b01101111])
        + b"\xff\xd9"
    )


def test_hand_built_dc_golden_decoder_independent():
    dec = jpeg.jpeg_decoder()
    for bit16 in (False, True):
        px = dec.pixels(_dc_golden_fixture(dqt_16bit=bit16))
        assert px.shape == (8, 8, 1)
        assert np.unique(px).tolist() == [134], bit16


def test_corruption_contract_named_refusals():
    dec = jpeg.jpeg_decoder()
    good = jpeg.encode_jpeg(np.zeros((8, 8, 3), np.uint8), quality=90)
    cases = {
        "bad magic": b"not a jpeg at all",
        "missing SOI": b"\xff\xd9\xff\xd8",
        "truncated": good[:20],
        "truncated entropy": None,  # built below
    }
    for why, payload in cases.items():
        if payload is None:
            continue
        with pytest.raises(ValueError, match="undecodable JPEG"):
            dec.pixels(payload)
    # non-Huffman/non-DCT frame types refuse by name (progressive is
    # DECODED as of round 14 — see test_progressive_*); a baseline
    # SOS header under an SOF2 frame is itself invalid and refuses
    golden = _dc_golden_fixture()
    sof0 = _seg(0xC0, struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0]))
    for marker, match in (
        (0xC9, "frame type"),
        (0xC3, "frame type"),
        (0xC2, "DC scan with Se"),
    ):
        mutated = golden.replace(
            sof0,
            _seg(marker, struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0])),
        )
        with pytest.raises(ValueError, match=match):
            dec.pixels(mutated)
    # 12-bit precision refuses by name
    deep = golden.replace(
        sof0, _seg(0xC0, struct.pack(">BHHB", 12, 8, 8, 1) + bytes([1, 0x11, 0]))
    )
    with pytest.raises(ValueError, match="12-bit"):
        dec.pixels(deep)


@settings(max_examples=150, deadline=None)
@given(
    pos=st.integers(min_value=2, max_value=5000),
    val=st.integers(min_value=0, max_value=255),
    seed=st.integers(min_value=0, max_value=2**16),
)
def test_corruption_fuzz_no_raw_leaks(pos, val, seed):
    """The corruption contract shared with the other codecs: any
    single-byte mutation of a valid payload either decodes cleanly or
    raises ValueError — never a raw IndexError/struct.error/numpy
    buffer error escaping to the caller."""
    rng = np.random.RandomState(seed % 7)
    img = rng.randint(0, 256, (9, 11, 3), dtype=np.uint8)
    payload = bytearray(jpeg.encode_jpeg(img, quality=85, subsampling="420"))
    payload[pos % len(payload)] = val
    dec = jpeg.jpeg_decoder()
    try:
        px = dec.pixels(bytes(payload))
        assert px.dtype == np.uint8 and px.ndim == 3
    except ValueError:
        pass  # named refusal is the contract


def test_feature_lanes_shared_layout():
    dec = jpeg.jpeg_decoder()
    img = np.full((4, 6, 3), 255, np.uint8)
    f = dict(
        zip(multimodal.PNG_FEATURE_NAMES, dec(jpeg.encode_jpeg(img)).tolist())
    )
    assert f["width"] == 6.0 and f["height"] == 4.0
    assert f["n_channels"] == 3.0 and f["bit_depth"] == 8.0
    assert f["mean_luma"] > 0.99 and f["max_luma"] <= 1.0


def test_auto_decoder_routes_jpeg():
    dec = multimodal.auto_decoder()
    img = np.full((5, 7, 3), 128, np.uint8)
    f = dict(
        zip(
            multimodal.PNG_FEATURE_NAMES,
            dec(jpeg.encode_jpeg(img, quality=95)).tolist(),
        )
    )
    assert f["width"] == 7.0 and f["height"] == 5.0
    assert abs(f["mean_luma"] - 128 / 255) < 0.01


def test_image_resizer_routes_jpeg():
    rz = multimodal.image_resizer()
    dec = jpeg.jpeg_decoder()
    img = np.full((16, 16, 3), 200, np.uint8)
    out = rz(jpeg.encode_jpeg(img, quality=95), 4, 8)
    assert out[:3] == b"\xff\xd8\xff"  # same-family re-encode
    px = dec.pixels(out)
    assert px.shape == (8, 4, 3)
    assert int(np.abs(px.astype(int) - 200).max()) <= 2


def test_probe_media_jpeg_dimensions(spark):
    """probe_media reports JPEG dims from the SOF marker without
    entropy decode — including frame types it never decodes (the
    fabricated SOF2-with-baseline-scan payload below is undecodable
    but still classifiable)."""
    img = np.zeros((12, 34, 3), np.uint8)
    base = jpeg.encode_jpeg(img, quality=90)
    sof0 = struct.pack(">BHHB", 8, 12, 34, 3)
    idx = base.index(b"\xff\xc0")
    progressive = base[:idx] + b"\xff\xc2" + base[idx + 2 :]
    rows = [
        (1, bytearray(base), (None, None, None, None, None)),
        (2, bytearray(progressive), (None, None, None, None, None)),
        (3, bytearray(b"\xff\xd8\xff\xe0junk"), (None, None, None, None, None)),
    ]
    df = spark.createDataFrame(rows, multimodal.media_schema())
    out = {r["media_id"]: r["meta"] for r in multimodal.probe_media(df).collect()}
    for mid in (1, 2):
        m = out[mid]
        assert m["media_type"] == "image" and m["format"] == "jpeg"
        assert (m["width"], m["height"]) == (34, 12), mid
    assert all(v is None for v in out[3].asDict().values())
    assert sof0  # silence linters; sof0 documents the SOF layout


def _has_cv2() -> bool:
    try:
        import cv2  # noqa: F401

        return True
    except ImportError:
        return False


@pytest.mark.skipif(_has_cv2(), reason="cv2 installed: gate inactive")
def test_video_frame_decoder_row_level_gate_without_cv2():
    """Round 15: the factory always succeeds now that MJPEG-in-AVI
    decodes for real with zero deps (tests/test_avi.py); the
    dependency refusal moved to the ROWS that actually need cv2 —
    named NotImplementedError, never digest-derived fake frames (the
    do-not-fake rule). This test self-retires when the sandbox gains
    cv2 and the skipif twin below takes over."""
    dec = multimodal.video_frame_decoder()
    with pytest.raises(NotImplementedError, match="cv2"):
        dec(b"\x00\x00\x00\x18ftypisom" + b"\x00" * 64)  # MP4 magic


@pytest.mark.skipif(not _has_cv2(), reason="cv2 not installed")
def test_video_frame_decoder_real_with_cv2(tmp_path):
    """Exercises the REAL cv2 branch the day the dependency lands:
    write a tiny mp4 with cv2.VideoWriter, sample frames at 100 ms,
    and check the (n, H, W, 3) RGB contract."""
    import cv2
    import numpy as np_

    path = str(tmp_path / "clip.mp4")
    w = cv2.VideoWriter(
        path, cv2.VideoWriter_fourcc(*"mp4v"), 10.0, (32, 24)
    )
    for i in range(10):
        frame = np_.full((24, 32, 3), i * 20, np_.uint8)
        w.write(frame)
    w.release()
    payload = open(path, "rb").read()
    dec = multimodal.video_frame_decoder(every_ms=100, max_frames=5)
    frames = dec(payload)
    assert frames.dtype == np_.uint8
    assert frames.ndim == 4 and frames.shape[1:] == (24, 32, 3)
    assert 1 <= frames.shape[0] <= 5
    with pytest.raises(ValueError, match="undecodable video"):
        dec(b"not a video")


def test_extract_features_jpeg_through_spark(spark):
    """The production seam end-to-end: JPEG payloads through
    Arrow-batched extract_features with auto_decoder on executors."""
    rng = np.random.RandomState(5)
    rows = []
    for i in range(6):
        img = rng.randint(0, 256, (8 + i, 10, 3), dtype=np.uint8)
        rows.append(
            (i, bytearray(jpeg.encode_jpeg(img, quality=90)), (None,) * 5)
        )
    df = spark.createDataFrame(rows, multimodal.media_schema())
    feats = multimodal.extract_features(
        df, decoder=multimodal.auto_decoder()
    ).collect()
    assert len(feats) == 6
    for r in feats:
        f = dict(zip(multimodal.PNG_FEATURE_NAMES, r["features"]))
        assert f["width"] == 10.0 and 8.0 <= f["height"] <= 13.0
        assert 0.0 <= f["mean_luma"] <= 1.0


def test_progressive_equals_baseline_default_script():
    """Progressive transport is a lossless re-encoding of the same
    quantized coefficients, so decode(progressive) must equal
    decode(baseline) EXACTLY — any defect in the EOB-run, refinement,
    or spectral-band logic on either side breaks byte equality."""
    dec = jpeg.jpeg_decoder()
    rng = np.random.RandomState(21)
    for trial in range(10):
        hw = (rng.randint(1, 50), rng.randint(1, 50))
        q = int(rng.choice([10, 40, 75, 95]))
        sub = str(rng.choice(["444", "422", "420"]))
        gray = trial % 3 == 0
        img = rng.randint(0, 256, hw if gray else (*hw, 3), dtype=np.uint8)
        base = dec.pixels(jpeg.encode_jpeg(img, quality=q, subsampling=sub))
        prog = dec.pixels(
            jpeg.encode_jpeg_progressive(img, quality=q, subsampling=sub)
        )
        assert np.array_equal(base, prog), (trial, hw, q, sub)


def test_progressive_equals_baseline_custom_scripts():
    """Custom scan scripts: deeper Al ladders and different spectral
    splits drive the refinement walks through long-run ZRL/correction
    interleavings the default script rarely produces."""
    dec = jpeg.jpeg_decoder()
    rng = np.random.RandomState(5)
    # sparse impulses on flat gray: isolated coefficients, huge zero
    # runs — the adversarial case for positional correction-bit
    # ordering across split ZRLs
    img = np.full((48, 64, 3), 128, np.uint8)
    for _ in range(6):
        img[rng.randint(48), rng.randint(64)] = rng.randint(0, 256)
    cs = [0, 1, 2]
    for al_top, split in ((3, 1), (2, 20), (1, 63)):
        scans = [(cs, 0, 0, 0, al_top)]
        for c in cs:
            if split < 63:
                scans.append(([c], 1, split, 0, al_top))
                scans.append(([c], split + 1, 63, 0, al_top))
            else:
                scans.append(([c], 1, 63, 0, al_top))
        for a in range(al_top, 0, -1):
            for c in cs:
                scans.append(([c], 1, 63, a, a - 1))
            scans.append((cs, 0, 0, a, a - 1))
        base = dec.pixels(jpeg.encode_jpeg(img, quality=12, subsampling="420"))
        prog = dec.pixels(
            jpeg.encode_jpeg_progressive(
                img, quality=12, subsampling="420", scans=scans
            )
        )
        assert np.array_equal(base, prog), (al_top, split)


def test_progressive_hand_built_dc_golden():
    """Decoder-independent progressive golden: 8x8 gray, qt all-16s,
    a DC-first scan at Al=1 coding diff=+1 (coefficient becomes
    1 << 1 = 2) and a DC-refinement scan appending bit 1 (coefficient
    3).  T.81 math: 3 * 16 = 48 dequantized, DC-only IDCT = 48/8 = 6,
    level shift +128 → every pixel exactly 134 — the same value as
    the baseline golden, reached through the successive-approximation
    path with no help from encode_jpeg_progressive."""
    fix = (
        b"\xff\xd8"
        + _seg(0xDB, bytes([0x00]) + bytes([16] * 64))
        + _seg(0xC2, struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0]))
        # DC table: one code '0' -> category 1
        + _seg(0xC4, bytes([0x00]) + bytes([1] + [0] * 15) + bytes([1]))
        # scan 1: DC first, Ah=0 Al=1; bits: '0' (cat 1) + '1' (amp=+1)
        + _seg(0xDA, bytes([1, 1, 0x00, 0x00, 0x00, 0x01]))
        + bytes([0b01111111])
        # scan 2: DC refine, Ah=1 Al=0; bits: '1' (zero-padded — a
        # spec-faithful 1-padded byte would be 0xFF and need
        # stuffing; pad bits are never read, so 0x80 keeps the
        # fixture hand-checkable)
        + _seg(0xDA, bytes([1, 1, 0x00, 0x00, 0x00, 0x10]))
        + bytes([0b10000000])
        + b"\xff\xd9"
    )
    px = jpeg.jpeg_decoder().pixels(fix)
    assert px.shape == (8, 8, 1)
    assert np.unique(px).tolist() == [134]


@settings(max_examples=80, deadline=None)
@given(
    pos=st.integers(min_value=2, max_value=5000),
    val=st.integers(min_value=0, max_value=255),
    seed=st.integers(min_value=0, max_value=2**16),
)
def test_progressive_corruption_fuzz_no_raw_leaks(pos, val, seed):
    """The corruption contract extends to progressive payloads: a
    mutated byte either decodes cleanly or raises ValueError — never
    a raw IndexError/struct.error/numpy error."""
    rng = np.random.RandomState(seed % 5)
    img = rng.randint(0, 256, (9, 11, 3), dtype=np.uint8)
    payload = bytearray(
        jpeg.encode_jpeg_progressive(img, quality=70, subsampling="420")
    )
    payload[pos % len(payload)] = val
    dec = jpeg.jpeg_decoder()
    try:
        px = dec.pixels(bytes(payload))
        assert px.dtype == np.uint8 and px.ndim == 3
    except ValueError:
        pass


def test_progressive_restart_resync():
    """DRI + RSTn inside progressive scans: every scan type (DC
    first/refine, AC first, AC refine) resyncs — EOB runs flushed at
    each boundary per spec — and the result stays EXACTLY equal to
    the no-restart baseline decode of the same source."""
    dec = jpeg.jpeg_decoder()
    rng = np.random.RandomState(13)
    img = rng.randint(0, 256, (24, 40, 3), dtype=np.uint8)
    base = dec.pixels(jpeg.encode_jpeg(img, quality=40, subsampling="420"))
    for interval in (1, 2, 5):
        prog = dec.pixels(
            jpeg.encode_jpeg_progressive(
                img, quality=40, subsampling="420",
                restart_interval=interval,
            )
        )
        assert np.array_equal(prog, base), interval


@settings(max_examples=40, deadline=None)
@given(
    hseed=st.integers(min_value=1, max_value=45),
    wseed=st.integers(min_value=1, max_value=45),
    q=st.sampled_from([8, 30, 60, 90, 100]),
    sub=st.sampled_from(["444", "422", "420"]),
    gray=st.booleans(),
    seed=st.integers(min_value=0, max_value=2**16),
)
def test_progressive_transport_equality_property(hseed, wseed, q, sub, gray, seed):
    """Durable form of the 120-trial offline sweep: for ANY image,
    quality and subsampling, the progressive transport of the same
    quantized coefficients must decode byte-identically to the
    baseline transport."""
    rng = np.random.RandomState(seed)
    shape = (hseed, wseed) if gray else (hseed, wseed, 3)
    img = rng.randint(0, 256, shape, dtype=np.uint8)
    dec = jpeg.jpeg_decoder()
    base = dec.pixels(jpeg.encode_jpeg(img, quality=q, subsampling=sub))
    prog = dec.pixels(
        jpeg.encode_jpeg_progressive(img, quality=q, subsampling=sub)
    )
    assert np.array_equal(base, prog)


def test_review_r14_decompression_bomb_guard():
    """A ~120-byte payload declaring 65535x65535x3 must raise the
    named refusal BEFORE allocating coefficient planes (round-14
    review: MemoryError escaped the ValueError contract and could
    OOM an executor from one malicious row). Both guards fire: the
    absolute pixel cap, and the entropy-bytes structural floor for a
    large-but-under-cap declaration."""
    dec = jpeg.jpeg_decoder()
    def fixture(w, h):
        return (
            b"\xff\xd8"
            + _seg(0xDB, bytes([0]) + bytes([16] * 64))
            + _seg(
                0xC0,
                struct.pack(">BHHB", 8, h, w, 3)
                + bytes([1, 0x22, 0, 2, 0x11, 0, 3, 0x11, 0]),
            )
            + _seg(0xC4, bytes([0x00]) + bytes([1] + [0] * 15) + bytes([0]))
            + _seg(0xC4, bytes([0x10]) + bytes([1] + [0] * 15) + bytes([0x00]))
            + _seg(0xDA, bytes([3, 1, 0, 2, 0, 3, 0, 0, 0x3F, 0]))
            + bytes(20)
            + b"\xff\xd9"
        )
    with pytest.raises(ValueError, match="pixel decode cap"):
        dec.pixels(fixture(65535, 65535))
    with pytest.raises(ValueError, match="entropy bytes"):
        dec.pixels(fixture(7000, 7000))  # under cap, over the bit floor


def test_review_r14_fill_bytes_before_markers():
    """T.81 B.1.1.2 permits 0xFF fill bytes before any marker; the
    header walk must skip them (round-14 review: a single legal fill
    byte made a valid stream refuse as 'truncated segment')."""
    dec = jpeg.jpeg_decoder()
    img = np.full((8, 8, 3), 99, np.uint8)
    good = jpeg.encode_jpeg(img, quality=90)
    filled = good[:2] + b"\xff\xff" + good[2:]
    assert np.array_equal(dec.pixels(filled), dec.pixels(good))


def test_review_r14_single_component_dc_scans():
    """Per-component (Ns=1) DC scans on a subsampled NON-MCU-aligned
    image: the encoder must walk the component's own block raster,
    not the MCU grid (round-14 review: silent corruption / 'missing
    restart segment' on T.81-legal scripts)."""
    dec = jpeg.jpeg_decoder()
    rng = np.random.RandomState(9)
    img = rng.randint(0, 256, (33, 37, 3), dtype=np.uint8)
    cs = [0, 1, 2]
    scans = [([c], 0, 0, 0, 1) for c in cs]
    for c in cs:
        scans += [([c], 1, 63, 0, 1), ([c], 1, 63, 1, 0)]
    scans += [([c], 0, 0, 1, 0) for c in cs]
    base = dec.pixels(jpeg.encode_jpeg(img, quality=40, subsampling="420"))
    for ri in (0, 2):
        prog = dec.pixels(
            jpeg.encode_jpeg_progressive(
                img, quality=40, subsampling="420", scans=scans,
                restart_interval=ri,
            )
        )
        assert np.array_equal(base, prog), ri


def test_review_r14_quant_tables_are_annex_k():
    """quality_tables returns ZIGZAG order (the DQT wire order);
    de-zigzagged at quality 50 it must equal the Annex-K natural
    matrices exactly (round-14 review: the tables were emitted
    natural-order under a zigzag interpretation — self-consistent
    but a scrambled effective quantization costing ~1.7 dB)."""
    luma, chroma = jpeg.quality_tables(50)
    assert np.array_equal(luma[jpeg._UNZIGZAG], jpeg.STD_LUMA_QT)
    assert np.array_equal(chroma[jpeg._UNZIGZAG], jpeg.STD_CHROMA_QT)


def test_auto_decoder_pickles_by_value_without_package():
    """The decoder-seam closures promise 'executors don't need this
    package installed'; capturing the jpeg closures had silently
    broken that for auto_decoder/image_resizer (round-14 review,
    confirmed by a package-less cloudpickle round-trip). The fix
    registers the jpeg module for by-value pickling with Spark's
    vendored cloudpickle — this test repeats the reviewer's
    experiment: serialize here, deserialize and RUN in a subprocess
    whose sys.path cannot see exporter_spark."""
    import os
    import subprocess
    import sys
    import tempfile

    from pyspark import cloudpickle

    from exporter_spark.operators.avi import encode_avi_mjpeg

    dec = multimodal.auto_decoder()
    rz = multimodal.image_resizer()
    vdec = multimodal.video_frame_decoder(every_ms=100)
    payload = jpeg.encode_jpeg(np.full((8, 8, 3), 77, np.uint8), quality=95)
    clip = encode_avi_mjpeg(
        [np.full((8, 8, 3), i * 30, np.uint8) for i in range(3)], fps=10
    )
    with tempfile.TemporaryDirectory() as td:
        blob = os.path.join(td, "blob.pkl")
        with open(blob, "wb") as f:
            cloudpickle.dump((dec, rz, vdec, payload, clip), f)
        script = f"""
import sys
sys.path = [p for p in sys.path if "repo" not in p]
sys.modules.pop("exporter_spark", None)
import pickle
with open({blob!r}, "rb") as f:
    dec, rz, vdec, payload, clip = pickle.load(f)
feats = dec(payload)
assert feats.shape == (8,), feats
out = rz(payload, 4, 4)
assert out[:3] == b"\\xff\\xd8\\xff"
frames = vdec(clip)
assert frames.shape == (3, 8, 8, 3), frames.shape
print("PICKLE_BY_VALUE_OK")
"""
        proc = subprocess.run(
            [sys.executable, "-c", script],
            capture_output=True,
            text=True,
            timeout=120,
            cwd=td,
        )
        assert "PICKLE_BY_VALUE_OK" in proc.stdout, (
            proc.stdout[-500:],
            proc.stderr[-2000:],
        )


def test_probe_media_jpeg_fill_bytes(spark):
    """T.81 fill bytes before markers must not turn a valid JPEG into
    a NULL probe row (round-14 review)."""
    img = np.zeros((6, 13, 3), np.uint8)
    base = jpeg.encode_jpeg(img, quality=90)
    filled = base[:2] + b"\xff\xff" + base[2:]
    df = spark.createDataFrame(
        [(1, bytearray(filled), (None,) * 5)], multimodal.media_schema()
    )
    meta = multimodal.probe_media(df).collect()[0]["meta"]
    assert meta["format"] == "jpeg"
    assert (meta["width"], meta["height"]) == (13, 6)


def test_bomb_guard_floor_counts_first_scan_blocks_only():
    """Round-15 ADVICE regression: a spec-legal progressive file whose
    FIRST scan is a single-component DC scan under a degenerate 1-bit
    DC table over a large flat image must decode — the old floor
    compared the first scan's bytes against the WHOLE FRAME's block
    count (all components) and falsely refused exactly this shape."""
    import numpy as np

    from exporter_spark.operators import jpeg as J

    px = np.full((256, 256, 3), 128, dtype=np.uint8)  # flat mid-gray
    scans = [
        ([0], 0, 0, 0, 1),  # luma-only DC first pass: 1024 blocks
        ([1], 0, 0, 0, 1),
        ([2], 0, 0, 0, 1),
        ([0], 1, 63, 0, 0),
        ([1], 1, 63, 0, 0),
        ([2], 1, 63, 0, 0),
        ([0, 1, 2], 0, 0, 1, 0),  # DC refinement
    ]
    degenerate_dc = ([1] + [0] * 15, [0])  # one 1-bit code: category 0
    orig = J.DC_LUMA_HUFF
    J.DC_LUMA_HUFF = degenerate_dc
    try:
        payload = J.encode_jpeg_progressive(
            px, quality=90, subsampling="420", scans=scans
        )
    finally:
        J.DC_LUMA_HUFF = orig
    dec = J.jpeg_decoder()
    out = dec.pixels(payload)
    assert out.shape == (256, 256, 3)
    # flat image round-trips exactly at any quality
    base = dec.pixels(J.encode_jpeg(px, quality=90, subsampling="420"))
    assert np.array_equal(out, base)
    # the guard itself still fires on an actual bomb: tiny payload,
    # huge declared dims (cap + floor are independent bounds)
    bomb = bytearray(J.encode_jpeg(np.zeros((8, 8), dtype=np.uint8)))
    sof = bomb.find(b"\xff\xc0")
    bomb[sof + 5 : sof + 9] = (4000).to_bytes(2, "big") + (4000).to_bytes(2, "big")
    with pytest.raises(ValueError, match="entropy|pixel"):
        dec(bytes(bomb))


def test_first_scan_blocks_helper():
    from exporter_spark.operators.jpeg import _first_scan_blocks

    # 4:2:0 three-component frame, 32x32 px: mcus 2x2, luma 2x2
    # blocks/MCU, chroma 1 each -> whole frame 2*2*(4+1+1) = 24
    comps = [(1, 2, 2, 0), (2, 1, 1, 1), (3, 1, 1, 1)]
    args = dict(mcus_x=2, mcus_y=2, max_h=2, max_v=2, fw=32, fh=32)
    whole = 24
    # interleaved 3-component scan: all 24
    sos3 = bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 0, 0x01])
    assert _first_scan_blocks(sos3, comps, **args) == whole
    # Ns=1 luma: non-padded grid ceil(32/8)^2 = 16
    sos1 = bytes([1, 1, 0x00, 0, 0, 0x01])
    assert _first_scan_blocks(sos1, comps, **args) == 16
    # Ns=1 chroma: component dims 16x16 -> 4 blocks
    sos_c = bytes([1, 2, 0x00, 0, 0, 0x01])
    assert _first_scan_blocks(sos_c, comps, **args) == 4
    # malformed/truncated SOS falls back to the whole-frame count
    assert _first_scan_blocks(b"", comps, **args) == whole
    assert _first_scan_blocks(bytes([3, 1]), comps, **args) == whole
