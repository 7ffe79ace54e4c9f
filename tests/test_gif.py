"""GIF codec (operators/gif.py): lossless round-trips through every
LZW width-growth path, interlace, transparency + disposal compositing,
the corruption contract, and the seam wiring through auto_decoder /
image_resizer / probe_media / video_frame_decoder.

GIF is LOSSLESS for <=256-color frames, so unlike the JPEG suite the
round-trip pins are byte/pixel EXACT equality everywhere.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from exporter_spark.operators import gif, multimodal


def _pal(n=32):
    k = np.arange(n, dtype=np.int64)
    return np.stack([(k * 53) % 256, (k * 101) % 256, (k * 197) % 256], 1).astype(
        np.uint8
    )


def _img(h=23, w=31, n=32, seed=0):
    r = np.arange(h).reshape(h, 1)
    c = np.arange(w).reshape(1, w)
    return _pal(n)[(seed * 13 + r * 5 + c * 3) % n]


def test_single_frame_roundtrip_exact():
    dec = gif.gif_decoder()
    for n_colors in (2, 3, 16, 32, 200, 256):
        img = _img(19, 27, n_colors, seed=n_colors)
        back = dec.pixels(gif.encode_gif(img))
        assert np.array_equal(back, img), n_colors


def test_large_image_exercises_12bit_lzw_and_clears():
    """A 256-color noise image grows the LZW table to the 12-bit cap
    and forces mid-stream clear codes — the width-lockstep paths."""
    rng = np.random.RandomState(3)
    img = _pal(256)[rng.randint(0, 256, (300, 400))]
    back = gif.gif_decoder().pixels(gif.encode_gif(img))
    assert np.array_equal(back, img)


def test_grayscale_input_broadcasts():
    g = (np.arange(12)[:, None] * 9 + np.arange(17)[None, :]) % 256
    back = gif.gif_decoder().pixels(gif.encode_gif(g.astype(np.uint8)))
    assert back.shape == (12, 17, 3)
    assert np.array_equal(back[:, :, 0], g)
    assert np.array_equal(back[:, :, 0], back[:, :, 1])


def test_too_many_colors_refused_by_name():
    rng = np.random.RandomState(1)
    img = rng.randint(0, 256, (40, 40, 3), dtype=np.uint8)  # ~1600 colors
    with pytest.raises(ValueError, match="256 distinct colors"):
        gif.encode_gif(img)


def test_interlaced_decode():
    """The encoder emits non-interlaced; hand-assemble an interlaced
    payload (rows stored in four-pass order, interlace bit set) and
    pin that decode reconstructs the original row order."""
    img = _img(17, 11, 32)
    palette, (idx,) = gif._palette_and_indices([img])
    table, size_field = gif._color_table_bytes(palette)
    mcs = max(2, size_field + 1)
    h, w = idx.shape
    order = np.concatenate(
        [np.arange(s, h, st) for s, st in gif._INTERLACE_PASSES]
    )
    stored = idx[order]  # rows in pass order
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | size_field, 0, 0)
    out += table
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0x40)  # interlace
    out.append(mcs)
    lzw = gif._lzw_encode(stored.reshape(-1), mcs)
    for i in range(0, len(lzw), 255):
        chunk = lzw[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"
    back = gif.gif_decoder().pixels(bytes(out))
    assert np.array_equal(back, img)


def _assemble_animation(blocks, w, h, table, size_field):
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | size_field, 0, 0)
    out += table
    out += b"".join(blocks) + b"\x3b"
    return bytes(out)


def _gce(disposal, transparent, delay_cs):
    p = (disposal << 2) | (0x01 if transparent is not None else 0)
    return b"\x21\xf9\x04" + bytes([p]) + struct.pack("<H", delay_cs) + bytes(
        [transparent or 0]
    ) + b"\x00"


def _img_block(idx, mcs, left=0, top=0):
    fh, fw = idx.shape
    out = bytearray(
        b"\x2c" + struct.pack("<HHHHB", left, top, fw, fh, 0)
    )
    out.append(mcs)
    lzw = gif._lzw_encode(idx.reshape(-1), mcs)
    for i in range(0, len(lzw), 255):
        chunk = lzw[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


def test_transparency_and_disposal_compositing():
    """Browser compositing model: a transparent pixel shows the
    running canvas; disposal 2 restores the background after the
    frame; disposal 3 restores the pre-frame canvas."""
    pal = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255], [9, 9, 9]], np.uint8)
    table, size_field = gif._color_table_bytes(pal)
    mcs = max(2, size_field + 1)
    base = np.zeros((4, 4), np.uint8)  # all red
    # frame 2: 2x2 patch at (1,1), index 1 (green) with index 3
    # transparent in one corner
    patch = np.array([[1, 3], [1, 1]], np.uint8)
    blocks = [
        _gce(1, None, 5) + _img_block(base, mcs),
        _gce(3, 3, 5) + _img_block(patch, mcs, left=1, top=1),
        _gce(1, None, 5) + _img_block(base, mcs),
    ]
    payload = _assemble_animation(blocks, 4, 4, table, size_field)
    frames, delays = gif.gif_decoder().frames(payload)
    assert frames.shape == (3, 4, 4, 3) and delays == [50, 50, 50]
    red, green = pal[0], pal[1]
    assert np.array_equal(frames[0], np.broadcast_to(red, (4, 4, 3)))
    # frame 2: patch green except the transparent corner, which shows
    # the red canvas underneath
    assert np.array_equal(frames[1][1, 1], green)
    assert np.array_equal(frames[1][1, 2], red)  # transparent -> canvas
    assert np.array_equal(frames[1][2, 1], green)
    assert np.array_equal(frames[1][0, 0], red)  # outside the patch
    # disposal 3 on frame 2 -> frame 3 starts from the frame-1 canvas
    assert np.array_equal(frames[2], frames[0])


def test_disposal_restore_to_background():
    pal = np.array([[200, 0, 0], [0, 200, 0]], np.uint8)
    table, size_field = gif._color_table_bytes(pal)
    mcs = max(2, size_field + 1)
    full_green = np.ones((3, 3), np.uint8)
    patch_red = np.zeros((1, 1), np.uint8)
    blocks = [
        _gce(2, None, 5) + _img_block(full_green, mcs),  # then restore bg
        _gce(1, None, 5) + _img_block(patch_red, mcs, left=2, top=2),
    ]
    payload = _assemble_animation(blocks, 3, 3, table, size_field)
    frames, _ = gif.gif_decoder().frames(payload)
    # background index 0 = red (first palette entry): after disposal 2
    # the canvas reverts to red; frame 2 paints one red pixel at (2,2)
    assert np.array_equal(frames[0], np.broadcast_to(pal[1], (3, 3, 3)))
    assert np.array_equal(frames[1], np.broadcast_to(pal[0], (3, 3, 3)))


def test_corruption_contract_named_refusals():
    dec = gif.gif_decoder()
    good = gif.encode_gif(_img())
    cases = [
        (b"notagif" + good[6:], "bad signature"),
        (good[:10], "truncated"),
        (good[:-1], "missing trailer"),  # trailer byte dropped
        (good[:20], "truncated"),
    ]
    for payload, match in cases:
        with pytest.raises(ValueError, match=match):
            dec.pixels(payload)
    # LZW stream cut mid-image
    cut = good[: len(good) - (len(good) - 13) // 2]
    with pytest.raises(ValueError, match="undecodable GIF"):
        dec.pixels(cut)
    # no image blocks at all
    empty = good[:13] + good[13 : 13 + 3 * 32] + b"\x3b"
    with pytest.raises(ValueError, match="no image blocks"):
        dec.pixels(empty)


def test_auto_decoder_and_resizer_route_gif():
    img = _img(23, 31)
    payload = gif.encode_gif(img)
    lanes = multimodal.auto_decoder()(payload)
    assert (lanes[0], lanes[1], lanes[2], lanes[3]) == (31.0, 23.0, 3.0, 8.0)
    # lane math matches the shared PNG-lane formula exactly
    rgb = img.astype(np.float64) / 255.0
    luma = 0.299 * rgb[:, :, 0] + 0.587 * rgb[:, :, 1] + 0.114 * rgb[:, :, 2]
    assert lanes[4] == np.float32(luma.mean())
    out = multimodal.image_resizer()(payload, 8, 6)
    assert out[:6] == b"GIF89a"
    back = multimodal.auto_decoder()(out)
    assert (back[0], back[1]) == (8.0, 6.0)


def test_probe_media_classifies_gif(spark):
    static = gif.encode_gif(_img())
    anim = gif.encode_gif_animation(
        [_img(seed=i) for i in range(4)], delay_ms=150
    )
    df = spark.createDataFrame(
        [(1, bytearray(static), None), (2, bytearray(anim), None)],
        multimodal.media_schema(),
    )
    rows = {r["media_id"]: r["meta"] for r in multimodal.probe_media(df).collect()}
    assert (rows[1]["media_type"], rows[1]["format"]) == ("image", "gif")
    assert (rows[1]["width"], rows[1]["height"]) == (31, 23)
    assert rows[1]["duration_ms"] is None
    assert (rows[2]["media_type"], rows[2]["format"]) == ("video", "gif")
    assert rows[2]["duration_ms"] == 600  # 4 frames x 150 ms


def test_video_frame_decoder_samples_animated_gif():
    frames = [_img(seed=i) for i in range(10)]
    anim = gif.encode_gif_animation(frames, delay_ms=100)
    out = multimodal.video_frame_decoder(every_ms=250)(anim)
    # same tick rule as MJPEG-AVI: frames 0, 3, 5, 8
    assert out.shape[0] == 4
    for got, i in zip(out, [0, 3, 5, 8]):
        assert np.array_equal(got, frames[i])
    # zero-delay animation (browsers clamp; we return every frame)
    flat = gif.encode_gif_animation(frames[:5], delay_ms=0)
    assert multimodal.video_frame_decoder(every_ms=500)(flat).shape[0] == 5
    capped = multimodal.video_frame_decoder(every_ms=100, max_frames=3)(anim)
    assert capped.shape[0] == 3


def test_gif_closures_pickle_by_value_without_package():
    """Same packageless-subprocess experiment as the jpeg/avi seams:
    the GIF routes must run on executors without exporter_spark
    installed."""
    import os
    import subprocess
    import sys
    import tempfile

    from pyspark import cloudpickle

    dec = multimodal.auto_decoder()
    vdec = multimodal.video_frame_decoder(every_ms=100)
    static = gif.encode_gif(_img())
    anim = gif.encode_gif_animation([_img(seed=i) for i in range(3)], delay_ms=100)
    with tempfile.TemporaryDirectory() as td:
        blob = os.path.join(td, "blob.pkl")
        with open(blob, "wb") as f:
            cloudpickle.dump((dec, vdec, static, anim), f)
        script = f"""
import sys
sys.path = [p for p in sys.path if "repo" not in p]
sys.modules.pop("exporter_spark", None)
import pickle
with open({blob!r}, "rb") as f:
    dec, vdec, static, anim = pickle.load(f)
assert dec(static).shape == (8,)
assert vdec(anim).shape[0] == 3
print("GIF_PICKLE_OK")
"""
        proc = subprocess.run(
            [sys.executable, "-c", script],
            capture_output=True, text=True, timeout=120, cwd=td,
        )
        assert "GIF_PICKLE_OK" in proc.stdout, (
            proc.stdout[-300:], proc.stderr[-2000:],
        )


from hypothesis import example, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402


@settings(max_examples=150, deadline=None)
@given(
    pos=st.integers(min_value=0, max_value=3000),
    val=st.integers(min_value=0, max_value=255),
    cut=st.integers(min_value=0, max_value=3000),
)
@example(
    pos=2723,
    val=9,
    cut=0,
).via('discovered failure')
def test_corruption_fuzz_no_raw_leaks(pos, val, cut):
    """Mutate/truncate anywhere: decode must either succeed cleanly
    or raise the named ValueError — never IndexError/struct.error/
    numpy exceptions (the shared codec corruption contract)."""
    base = bytearray(gif.encode_gif(_img(13, 17, 32, seed=7)))
    mutated = bytearray(base)
    mutated[pos % len(base)] = val
    truncated = bytes(base[: cut % len(base)])
    dec = gif.gif_decoder()
    for payload in (bytes(mutated), truncated):
        try:
            px = dec.pixels(payload)
            assert px.dtype == np.uint8 and px.ndim == 3
        except ValueError as ex:
            assert "undecodable GIF" in str(ex) or "GIF encode" in str(ex)


def test_every_ms_guard_and_animated_resize_refusal():
    """Round-15 second review batch: every_ms <= 0 must raise (was an
    infinite loop in the tick advance), and image_resizer must refuse
    ANIMATED GIFs by name instead of silently flattening them to one
    frame under pass-through video metadata."""
    anim = gif.encode_gif_animation([_img(seed=i) for i in range(3)], delay_ms=100)
    with pytest.raises(ValueError, match="every_ms"):
        multimodal.video_frame_decoder(every_ms=0)
    with pytest.raises(ValueError, match="every_ms"):
        gif.sample_gif_frames(anim, every_ms=-5)
    with pytest.raises(ValueError, match="ANIMATED GIF"):
        multimodal.image_resizer()(anim, 8, 6)
    # static GIFs still resize losslessly
    out = multimodal.image_resizer()(gif.encode_gif(_img()), 8, 6)
    assert out[:6] == b"GIF89a"


def test_zero_delay_animation_probes_null_duration(spark):
    """All-zero GCE delays are UNTIMED: duration_ms must be NULL (the
    AVI probe contract), not the misleading 0 of a 'zero-length
    clip'."""
    anim = gif.encode_gif_animation([_img(seed=i) for i in range(3)], delay_ms=0)
    df = spark.createDataFrame(
        [(1, bytearray(anim), None)], multimodal.media_schema()
    )
    m = multimodal.probe_media(df).collect()[0]["meta"]
    assert m["media_type"] == "video" and m["duration_ms"] is None


def test_first_frame_decode_skips_remaining_lzw():
    """_pixels/feature decode must not pay for every animation frame
    (round-15 review): corrupt the SECOND frame's LZW stream — the
    first-frame path must still decode, the full walk must refuse."""
    anim = bytearray(
        gif.encode_gif_animation([_img(seed=i) for i in range(3)], delay_ms=100)
    )
    # find the second image separator and trash bytes shortly after
    first = bytes(anim).find(b"\x2c")
    second = bytes(anim).find(b"\x2c", first + 1)
    assert second > first > 0
    anim[second + 12 : second + 18] = b"\xff\xff\xff\xff\xff\xff"
    dec = gif.gif_decoder()
    px = dec.pixels(bytes(anim))  # first frame only -> fine
    assert px.shape == (23, 31, 3)
    with pytest.raises(ValueError, match="undecodable GIF"):
        dec.frames(bytes(anim))


def test_lane_vector_parity_across_codecs():
    """The 8-lane feature block is intentionally replicated inside
    each self-contained decoder closure (their pickle contract
    predates by-value registration); this parity pin is the
    anti-drift guard the round-15 review asked for: the SAME pixel
    content encoded as PNG, binary PPM, BMP and GIF must produce
    IDENTICAL lanes through auto_decoder."""
    img = _img(14, 18, 32)  # <=256 colors so GIF can hold it
    dec = multimodal.auto_decoder()
    payloads = {
        "png": multimodal.encode_png(img),
        "ppm": multimodal.encode_ppm(img),
        "bmp": multimodal.encode_bmp(img),
        "gif": gif.encode_gif(img),
    }
    lanes = {k: dec(p) for k, p in payloads.items()}
    base = lanes["png"]
    for k, v in lanes.items():
        assert np.array_equal(v, base), (k, v, base)


@settings(max_examples=120, deadline=None)
@given(
    mcs=st.integers(min_value=2, max_value=8),
    seed=st.integers(min_value=0, max_value=2**31),
    n=st.integers(min_value=1, max_value=4000),
)
def test_lzw_roundtrip_property(mcs, seed, n):
    """Encoder/decoder width-lockstep pinned as a property: ANY index
    stream within the alphabet round-trips exactly at any min code
    size, including streams long enough to grow the table through
    several width bumps."""
    rng = np.random.RandomState(seed % 2**32)
    idx = rng.randint(0, 1 << mcs, n).astype(np.uint8)
    data = gif._lzw_encode(idx, mcs)
    back = gif._lzw_decode(data, mcs, n)
    assert np.array_equal(back, idx)


def test_lzw_roundtrip_through_full_table_overflow():
    """A 200k-symbol low-entropy stream drives the table to the
    12-bit cap repeatedly, forcing overflow clears mid-stream."""
    rng = np.random.RandomState(11)
    idx = ((rng.randint(0, 4, 200_000) * rng.randint(1, 3, 200_000)) % 4).astype(
        np.uint8
    )
    data = gif._lzw_encode(idx, mcs := 2)
    assert np.array_equal(gif._lzw_decode(data, mcs, len(idx)), idx)
    # out-of-alphabet indices refuse by name, never a raw KeyError
    with pytest.raises(ValueError, match="out of alphabet"):
        gif._lzw_encode(np.array([0, 5], np.uint8), 2)


def test_decompression_bomb_refused_before_allocation():
    """A ~1 KB well-formed payload declaring a 65535x65535 logical
    screen must refuse by name BEFORE any canvas allocation (ADVICE
    r16: jpeg's MAX_PIXELS guard mirrored) — including through the
    default auto_decoder route, where untrusted payloads arrive. The
    guard lives in the DECODER, not the structural walk: probe_media
    must still CLASSIFY the same payload (round-16 review — the
    probe's GIF branch calls parse_gif, and the JPEG branch likewise
    reports dims for payloads jpeg_decoder refuses)."""
    table = bytes(range(12))
    tiny = np.zeros((1, 1), np.uint8)
    bomb = _assemble_animation(
        [_img_block(tiny, 2)], 65535, 65535, table, 1
    )
    w, h, _bg, _gct, images = gif.parse_gif(bomb)  # probe path: classifies
    assert (w, h, len(images)) == (65535, 65535, 1)
    dec = gif.gif_decoder()
    for fn in (dec, dec.pixels, multimodal.auto_decoder()):
        with pytest.raises(ValueError, match="decode cap"):
            fn(bomb)
    with pytest.raises(ValueError, match="decode cap"):
        gif.sample_gif_frames(bomb, every_ms=100)


def test_animation_total_pixel_cap():
    """Canvas copies are bounded ACROSS frames: n_frames*h*w beyond
    MAX_TOTAL_PIXELS refuses before the compositing loop allocates
    (65 declared frames on a 2048x2048 screen = ~786 MB of uint8 RGB
    from a ~1 KB payload), while the SAME payload's first frame still
    decodes — feature extraction's first_only path pays one canvas."""
    table = bytes(range(12))  # 4-color GCT (size_field 1)
    tiny = np.zeros((1, 1), np.uint8)
    blocks = [_img_block(tiny, 2) for _ in range(65)]
    payload = _assemble_animation(blocks, 2048, 2048, table, 1)
    dec = gif.gif_decoder()
    with pytest.raises(ValueError, match="animation decode cap"):
        dec.frames(payload)
    with pytest.raises(ValueError, match="animation decode cap"):
        gif.sample_gif_frames(payload, every_ms=100)
    px = dec.pixels(payload)  # first_only: 1 frame * 4.2M px, in cap
    assert px.shape == (2048, 2048, 3)
