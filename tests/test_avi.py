"""MJPEG-in-AVI: the zero-dependency real video frame path (r15).

The RIFF walk + the committed JPEG decoder make video_frame_decoder
REAL for MJPEG AVIs with no external codec; these tests pin the
container walk, the omitted-DHT MJPEG convention, the sampling
contract (shared with the cv2 branch), the corruption contract, and
the Spark/pickle plumbing.
"""

from __future__ import annotations

import numpy as np
import pytest

from exporter_spark.operators import avi, multimodal
from exporter_spark.operators.jpeg import jpeg_decoder


def _frames(n=6, h=24, w=32, gray=False):
    out = []
    for i in range(n):
        r = np.arange(h).reshape(h, 1, 1)
        c = np.arange(w).reshape(1, w, 1)
        k = np.arange(3).reshape(1, 1, 3)
        px = ((i * 41 + 29 * r + 5 * c + 11 * k) % 256).astype(np.uint8)
        out.append(px[:, :, 0] if gray else px)
    return out


def test_mjpeg_avi_roundtrip_exact():
    """Frames decoded from the container are EXACTLY the jpeg
    round-trip of each embedded payload — the container walk adds no
    loss on top of the codec's."""
    frames = _frames(4)
    payload = avi.encode_avi_mjpeg(frames, fps=10, quality=90)
    dec = multimodal.video_frame_decoder(every_ms=100, max_frames=64)
    out = dec(payload)
    assert out.shape == (4, 24, 32, 3) and out.dtype == np.uint8
    jd = jpeg_decoder()
    from exporter_spark.operators.jpeg import encode_jpeg

    for i, f in enumerate(frames):
        expect = jd.pixels(encode_jpeg(f, quality=90, subsampling="420"))
        assert np.array_equal(out[i], expect)


def test_mjpeg_avi_sampling_contract():
    """Sequential tick selection: fps=10 (100 ms/frame), every 250 ms
    -> frames 0, 3, 5, 8 (a frame is kept when its timestamp reaches
    the next tick; the tick then advances past it — no duplicates)."""
    frames = _frames(10)
    payload = avi.encode_avi_mjpeg(frames, fps=10)
    dec = multimodal.video_frame_decoder(every_ms=250, max_frames=64)
    out = dec(payload)
    jd = jpeg_decoder()
    from exporter_spark.operators.jpeg import encode_jpeg

    expect_idx = [0, 3, 5, 8]
    assert out.shape[0] == len(expect_idx)
    for got, i in zip(out, expect_idx):
        expect = jd.pixels(
            encode_jpeg(frames[i], quality=90, subsampling="420")
        )
        assert np.array_equal(got, expect)
    # max_frames caps the output
    capped = multimodal.video_frame_decoder(every_ms=100, max_frames=3)(
        payload
    )
    assert capped.shape[0] == 3


def test_mjpeg_omitted_dht_convention():
    """MJPEG frames may omit DHT (players supply the Annex K tables);
    the stripped container must decode IDENTICALLY to the unstripped
    one."""
    frames = _frames(3)
    full = avi.encode_avi_mjpeg(frames, fps=5)
    bare = avi.encode_avi_mjpeg(frames, fps=5, strip_dht=True)
    assert len(bare) < len(full)  # tables really were dropped
    dec = multimodal.video_frame_decoder(every_ms=200, max_frames=8)
    assert np.array_equal(dec(full), dec(bare))


def test_mjpeg_gray_frames_broadcast_to_rgb():
    frames = _frames(2, gray=True)
    payload = avi.encode_avi_mjpeg(frames, fps=4)
    out = multimodal.video_frame_decoder(every_ms=250)(payload)
    assert out.shape == (2, 24, 32, 3)
    assert np.array_equal(out[0][:, :, 0], out[0][:, :, 1])


def test_avi_corruption_contract():
    frames = _frames(2)
    payload = avi.encode_avi_mjpeg(frames, fps=4)
    dec = multimodal.video_frame_decoder()
    # truncation inside movi -> named refusal, not a numpy error
    with pytest.raises(ValueError, match="undecodable"):
        dec(payload[: len(payload) // 2])
    # a non-MJPEG vids stream: zero-dep path refuses by name; without
    # cv2 the decoder raises NotImplementedError naming the dependency
    h264 = bytearray(payload)
    idx = h264.find(b"vids" + b"MJPG")
    assert idx > 0
    h264[idx + 4 : idx + 8] = b"H264"
    try:
        import cv2  # noqa: F401

        have_cv2 = True
    except ImportError:
        have_cv2 = False
    if not have_cv2:
        with pytest.raises(NotImplementedError, match="cv2"):
            dec(bytes(h264))
        # non-AVI, non-MJPEG payloads also name the missing dependency
        with pytest.raises(NotImplementedError, match="cv2"):
            dec(b"\x00\x00\x00\x18ftypisom" + b"\x00" * 64)
    # AVI with no video stream at all
    with pytest.raises(ValueError, match="no video stream"):
        avi.parse_avi(b"RIFF" + (12).to_bytes(4, "little") + b"AVI " + b"JUNK" + (0).to_bytes(4, "little"))


def test_probe_media_classifies_avi(spark):
    frames = _frames(5)
    payload = avi.encode_avi_mjpeg(frames, fps=10)
    df = spark.createDataFrame(
        [(1, bytearray(payload), None)], multimodal.media_schema()
    )
    row = multimodal.probe_media(df).collect()[0]
    m = row["meta"]
    assert (m["media_type"], m["format"]) == ("video", "avi")
    assert (m["width"], m["height"]) == (32, 24)
    assert m["duration_ms"] == 500  # 5 frames at 100 ms


def test_video_decoder_through_spark(spark):
    """The decoder closure ships to executor workers and samples
    frames from a payload column (Arrow-batched)."""
    import pandas as pd

    frames = _frames(4)
    payload = avi.encode_avi_mjpeg(frames, fps=10)
    df = spark.createDataFrame(
        [(1, bytearray(payload), None), (2, bytearray(payload), None)],
        multimodal.media_schema(),
    )
    dec = multimodal.video_frame_decoder(every_ms=100, max_frames=8)

    def run(batches):
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_frames": [
                        dec(bytes(p)).shape[0] for p in pdf["payload"]
                    ],
                }
            )

    out = df.mapInPandas(run, "media_id long, n_frames int").collect()
    assert sorted((r["media_id"], r["n_frames"]) for r in out) == [
        (1, 4),
        (2, 4),
    ]


def test_rec_grouped_movi_decodes():
    """AVI spec allows movi frames wrapped in 'rec ' grouping LISTs
    (VirtualDub-style interleave); the walk must recurse into them
    (round-15 review, was a confirmed decode failure)."""
    import struct

    frames = _frames(3)
    payload = avi.encode_avi_mjpeg(frames, fps=10)
    w, h, scale, rate, n, fourcc, spans = avi.parse_avi(payload)
    data = bytes(payload)

    def chunk(tag, body):
        return tag + struct.pack("<I", len(body)) + body + (
            b"\x00" if len(body) & 1 else b""
        )

    # rebuild: same headers, movi body with each 00dc inside LIST 'rec '
    movi_body = b"".join(
        chunk(b"LIST", b"rec " + chunk(b"00dc", data[lo:hi]))
        for lo, hi in spans
    )
    movi_start = data.find(b"LIST", 12)
    while data[movi_start + 8 : movi_start + 12] != b"movi":
        movi_start = data.find(b"LIST", movi_start + 1)
    head = data[12:movi_start]
    rebuilt_body = b"AVI " + head + chunk(b"LIST", b"movi" + movi_body)
    rebuilt = b"RIFF" + struct.pack("<I", len(rebuilt_body)) + rebuilt_body
    out = multimodal.video_frame_decoder(every_ms=100)(rebuilt)
    plain = multimodal.video_frame_decoder(every_ms=100)(payload)
    assert np.array_equal(out, plain)


def test_short_strh_named_refusal_not_struct_error():
    """A vids strh shorter than the 36 bytes the parser reads must be
    skipped (not parsed off the end of the chunk); with no other
    video stream the payload refuses by name (round-15 review: was a
    garbage n_frames read, or a raw struct.error at buffer end)."""
    import struct

    def chunk(tag, body):
        return tag + struct.pack("<I", len(body)) + body + (
            b"\x00" if len(body) & 1 else b""
        )

    strh_short = b"vids" + b"MJPG" + b"\x00" * 24  # 32-byte body
    hdrl = chunk(
        b"LIST",
        b"hdrl"
        + chunk(b"avih", b"\x00" * 56)
        + chunk(b"LIST", b"strl" + chunk(b"strh", strh_short)),
    )
    movi = chunk(b"LIST", b"movi" + chunk(b"00dc", b"\xff\xd8\xff\xd9"))
    body = b"AVI " + hdrl + movi
    payload = b"RIFF" + struct.pack("<I", len(body)) + body
    with pytest.raises(ValueError, match="no video stream"):
        avi.parse_avi(payload)


def test_rate_zero_stream_is_untimed():
    """dwRate=0 (sloppy muxers): timestamps are unknowable, so every
    frame returns up to max_frames — never a silent collapse to one
    frame (round-15 review)."""
    import struct

    frames = _frames(5)
    payload = bytearray(avi.encode_avi_mjpeg(frames, fps=10))
    idx = bytes(payload).find(b"vids" + b"MJPG")
    # strh body: fcc(8) + flags/prio/init(12) -> scale at +20, rate at +24
    rate_off = idx + 24
    assert struct.unpack_from("<I", payload, rate_off)[0] == 10
    struct.pack_into("<I", payload, rate_off, 0)
    out = multimodal.video_frame_decoder(every_ms=1000, max_frames=64)(
        bytes(payload)
    )
    assert out.shape[0] == 5
    capped = multimodal.video_frame_decoder(every_ms=1000, max_frames=2)(
        bytes(payload)
    )
    assert capped.shape[0] == 2


def test_audio_first_stream_indexing():
    """'##dc' ids index strl LISTs in hdrl order across ALL stream
    types (ADVICE r16): an MJPEG AVI with an audio stream listed
    first stores its video frames as '01dc' — the walker must look
    there, not at '00dc'."""
    import struct

    frames = _frames(3)
    plain = avi.encode_avi_mjpeg(frames, fps=10)
    _w, _h, _s, _r, _n, _f, spans = avi.parse_avi(plain)
    data = bytes(plain)

    def chunk(tag, body):
        return tag + struct.pack("<I", len(body)) + body + (
            b"\x00" if len(body) & 1 else b""
        )

    def lst(kind, body):
        return chunk(b"LIST", kind + body)

    # audio strl first: 56-byte 'auds' strh (format fields zeroed)
    auds_strh = b"auds" + b"\x00" * 52
    vids_start = data.find(b"LIST", 12)
    while data[vids_start + 8 : vids_start + 12] != b"strl":
        vids_start = data.find(b"LIST", vids_start + 1)
    (vids_size,) = struct.unpack_from("<I", data, vids_start + 4)
    vids_strl = data[vids_start : vids_start + 8 + vids_size]
    avih_start = data.find(b"avih")
    (avih_size,) = struct.unpack_from("<I", data, avih_start + 4)
    avih = data[avih_start : avih_start + 8 + avih_size]
    hdrl = lst(b"hdrl", avih + lst(b"strl", chunk(b"strh", auds_strh)) + vids_strl)
    movi = lst(b"movi", b"".join(chunk(b"01dc", data[lo:hi]) for lo, hi in spans))
    body = b"AVI " + hdrl + movi
    rebuilt = b"RIFF" + struct.pack("<I", len(body)) + body
    out = multimodal.video_frame_decoder(every_ms=100)(rebuilt)
    expect = multimodal.video_frame_decoder(every_ms=100)(plain)
    assert np.array_equal(out, expect)


def test_mjpa_field_interlaced_routes_to_cv2_seam():
    """QuickTime field-interlaced Motion-JPEG (MJPA) carries two
    interleaved FIELDS per chunk; decoding a chunk as one baseline
    JPEG would silently yield half-height images, so the fourcc is
    excluded from the zero-dep set (ADVICE r16) and routes to the cv2
    seam with a named refusal — never fake geometry."""
    payload = avi.encode_avi_mjpeg(_frames(2)).replace(b"MJPG", b"MJPA")
    with pytest.raises(ValueError, match="not MJPEG"):
        avi.sample_mjpeg_frames(payload, every_ms=100)
    try:
        import cv2  # noqa: F401
    except ImportError:
        with pytest.raises(NotImplementedError, match="cv2"):
            multimodal.video_frame_decoder(every_ms=100)(payload)


from hypothesis import example, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402


@settings(max_examples=150, deadline=None)
@given(
    pos=st.integers(min_value=0, max_value=30000),
    val=st.integers(min_value=0, max_value=255),
    cut=st.integers(min_value=0, max_value=30000),
)
@example(
    pos=16835,
    val=1,
    cut=0,
).via('discovered failure')
@example(
    pos=18471,
    val=4,
    cut=0,
).via('discovered failure')
def test_corruption_fuzz_no_raw_leaks(pos, val, cut):
    """Mutate/truncate a valid MJPEG AVI anywhere: the container walk
    + frame decode must either succeed cleanly or raise the named
    contract errors — never struct.error/IndexError/KeyError/numpy
    exceptions (the shared codec corruption contract; the GIF and PNG
    fuzzes are the siblings)."""
    base = bytearray(avi.encode_avi_mjpeg(_frames(3, 16, 16), fps=10))
    mutated = bytearray(base)
    mutated[pos % len(base)] = val
    truncated = bytes(base[: cut % len(base)])
    for payload in (bytes(mutated), truncated):
        try:
            out = multimodal.video_frame_decoder(every_ms=100)(payload)
            assert out.dtype == np.uint8 and out.ndim == 4
        except ValueError as ex:
            msg = str(ex)
            assert (
                "undecodable" in msg  # named AVI/MJPEG/JPEG refusals
                or "not MJPEG" in msg
                or "no decoder for payload magic" in msg
            ), msg
        except NotImplementedError as ex:
            # a mutated fourcc legitimately routes to the cv2 seam
            assert "cv2" in str(ex)
