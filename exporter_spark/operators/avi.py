"""RIFF/AVI container walk + MJPEG frame decode — zero external deps.

Makes :func:`exporter_spark.operators.multimodal.video_frame_decoder`
REAL for the most common raw-capture container (VERDICT r14 #5): an
AVI whose video stream is MJPEG ('MJPG'/'mjpg'/'dmb1') is a sequence
of JPEG payloads in '##dc'/'##db' movi chunks, so the committed
:mod:`exporter_spark.operators.jpeg` decoder handles every frame with
no new dependencies. Non-MJPEG codecs (H.264 etc.) stay on the
cv2-gated seam.

MJPEG quirk handled here: the OpenDML/MJPEG convention allows frames
to OMIT their DHT segments (players supply the ITU T.81 Annex K
tables); :func:`_ensure_dht` splices the four standard tables before
the first SOS when a frame carries none, exactly as libjpeg-based
players do.

Everything is pure ``struct`` + numpy; the reference has no video
support at all (the whole multimodal pillar is the mandated scope
extension beyond go-data-exporter/exporter).
"""

from __future__ import annotations

import struct

import numpy as np

# module-level so closures capturing these functions stay
# package-independent when this module is registered for by-value
# pickling (an import statement inside a function body would execute
# on the executor and require the package there)
from exporter_spark.operators.jpeg import (
    AC_CHROMA_HUFF,
    AC_LUMA_HUFF,
    DC_CHROMA_HUFF,
    DC_LUMA_HUFF,
    encode_jpeg,
    jpeg_decoder,
)

# Zero-dep-decodable Motion-JPEG variants: each movi chunk is one
# complete baseline/progressive JPEG (possibly DHT-less). MJPA
# (QuickTime field-interlaced — two interleaved fields per chunk) and
# AVRn are deliberately EXCLUDED: decoding an MJPA chunk as one JPEG
# silently yields half-height field images; those fourccs route to
# the cv2 seam like any other codec we can't decode honestly.
_MJPEG_FOURCC = {b"MJPG", b"mjpg", b"dmb1"}


def _riff_chunks(data: bytes, lo: int, hi: int):
    """Yield (fourcc, body_lo, body_hi) for each chunk in [lo, hi);
    LIST/RIFF chunks yield their list-type as fourcc with the body
    positioned after the type tag. Chunks are word-aligned (RIFF pads
    odd sizes with one byte)."""
    pos = lo
    while pos + 8 <= hi:
        tag = data[pos : pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        body = pos + 8
        if body + size > hi:
            raise ValueError("undecodable AVI payload: chunk overruns buffer")
        if tag in (b"RIFF", b"LIST"):
            if size < 4:
                raise ValueError("undecodable AVI payload: short LIST")
            yield data[body : body + 4], body + 4, body + size
        else:
            yield tag, body, body + size
        pos = body + size + (size & 1)


def parse_avi(payload: bytes):
    """Walk an AVI payload to ``(width, height, scale, rate, n_frames,
    fourcc, frame_spans)`` where frame_spans is the ordered list of
    (lo, hi) byte ranges of the video stream's movi chunks. Raises a
    named ``ValueError`` on anything that is not a well-formed AVI
    with at least one video stream."""
    data = bytes(payload or b"")
    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("undecodable AVI payload: missing RIFF/AVI magic")
    width = height = None
    scale, rate, n_frames, fourcc = 1, 0, 0, b""
    stream_no = None
    frame_spans: list[tuple[int, int]] = []
    streams_seen = 0

    (riff_size,) = struct.unpack_from("<I", data, 4)
    hi = min(len(data), 8 + riff_size)
    for tag, lo, end in _riff_chunks(data, 12, hi):
        if tag == b"hdrl":
            for t2, l2, e2 in _riff_chunks(data, lo, end):
                if t2 == b"avih" and e2 - l2 >= 40:
                    width, height = struct.unpack_from("<II", data, l2 + 32)
                elif t2 == b"strl":
                    # '##dc'/'##db' movi ids index strl LISTs in hdrl
                    # order regardless of fccType (and regardless of
                    # whether the strh is well-formed), so the stream
                    # number is taken where the strl is ENTERED — an
                    # audio-first file stores video frames as '01dc'
                    this_stream = streams_seen
                    streams_seen += 1
                    is_vids = False
                    for t3, l3, e3 in _riff_chunks(data, l2, e2):
                        # 36: the unpack below reads l3+20..l3+36
                        # (round-15 review: >=32 read 4 bytes of the
                        # next chunk's header into n_frames, or raised
                        # an uncontracted struct.error at buffer end)
                        if t3 == b"strh" and e3 - l3 >= 36:
                            if data[l3 : l3 + 4] == b"vids":
                                is_vids = True
                                if stream_no is None:
                                    stream_no = this_stream
                                    fourcc = data[l3 + 4 : l3 + 8]
                                    scale, rate, _start, n_frames = (
                                        struct.unpack_from(
                                            "<IIII", data, l3 + 20
                                        )
                                    )
                        elif (
                            t3 == b"strf"
                            and is_vids
                            and stream_no == this_stream
                            and e3 - l3 >= 12
                            and (width is None or height is None)
                        ):
                            width, height = struct.unpack_from(
                                "<ii", data, l3 + 4
                            )
                            height = abs(height)
        elif tag == b"movi" and stream_no is not None:
            want = b"%02d" % stream_no

            def walk_movi(lo2: int, hi2: int) -> None:
                for t2, l2, e2 in _riff_chunks(data, lo2, hi2):
                    if t2 == b"rec ":
                        # interleave grouping LIST (AVI spec; emitted
                        # by VirtualDub-style muxers) — frames live
                        # one level down (round-15 review, confirmed
                        # by repro)
                        walk_movi(l2, e2)
                    elif t2[:2] == want and t2[2:4] in (b"dc", b"db"):
                        frame_spans.append((l2, e2))

            walk_movi(lo, end)
    if stream_no is None:
        raise ValueError("undecodable AVI payload: no video stream")
    if not frame_spans:
        raise ValueError("undecodable AVI payload: no video frames in movi")
    return width, height, scale, rate, n_frames, fourcc, frame_spans


def _standard_dht() -> bytes:
    """One DHT segment carrying the four ITU T.81 Annex K tables —
    what MJPEG players splice into DHT-less frames."""
    body = bytearray()
    for tc_th, (bits, vals) in (
        (0x00, DC_LUMA_HUFF),
        (0x01, DC_CHROMA_HUFF),
        (0x10, AC_LUMA_HUFF),
        (0x11, AC_CHROMA_HUFF),
    ):
        body += bytes([tc_th]) + bytes(bits) + bytes(vals)
    return b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + bytes(body)


def _ensure_dht(frame: bytes) -> bytes:
    """Return the frame with DHT present: unchanged if it already
    carries one before its first SOS; otherwise the Annex K tables are
    spliced in right before the SOS marker (the MJPEG omitted-DHT
    convention)."""
    data = bytes(frame)
    if data[:3] != b"\xff\xd8\xff":
        raise ValueError("undecodable MJPEG frame: bad JPEG magic")
    pos = 2
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError("undecodable MJPEG frame: bad marker stream")
        m = data[pos + 1]
        if m == 0xFF:
            pos += 1
            continue
        if m in (0xD8, 0x01) or 0xD0 <= m <= 0xD7:
            pos += 2
            continue
        if m == 0xC4:
            return data  # has its own tables
        if m == 0xDA:
            return data[:pos] + _standard_dht() + data[pos:]
        if m == 0xD9:
            break
        (ln,) = struct.unpack_from(">H", data, pos + 2)
        pos += 2 + ln
    raise ValueError("undecodable MJPEG frame: no SOS marker")


def sample_mjpeg_frames(
    payload: bytes,
    every_ms: int = 1000,
    max_frames: int = 64,
    parsed=None,
) -> np.ndarray:
    """Decode MJPEG-in-AVI to uint8 ``(n_frames, H, W, 3)`` RGB, one
    frame per ``every_ms`` (sequential walk: a frame is kept when its
    timestamp reaches the next tick, then the tick advances past it —
    the same no-duplicate selection the cv2 branch uses), capped at
    ``max_frames``. Grayscale MJPEG frames broadcast to 3 channels so
    the output shape contract is codec-independent. ``parsed`` skips
    the container re-walk when the caller already ran
    :func:`parse_avi` (video_frame_decoder does, for the fourcc
    route). A stream with ``rate == 0`` (sloppy muxers) is UNTIMED:
    tick selection needs timestamps, so every frame is returned up to
    ``max_frames`` rather than silently collapsing to one frame
    (round-15 review)."""
    if every_ms <= 0:
        raise ValueError("every_ms must be positive")
    data = bytes(payload or b"")
    _w, _h, scale, rate, _n, fourcc, spans = (
        parsed if parsed is not None else parse_avi(data)
    )
    if fourcc not in _MJPEG_FOURCC:
        raise ValueError(
            f"AVI video stream is {fourcc!r}, not MJPEG — this payload"
            " needs an external codec (cv2)"
        )
    decode = jpeg_decoder()
    frames = []
    next_t = 0.0
    untimed = not rate or not scale
    ms_per_frame = 1000.0 * scale / rate if not untimed else 0.0
    for i, (lo, hi) in enumerate(spans):
        if len(frames) >= max_frames:
            break
        ts = i * ms_per_frame
        if not untimed and ts + 1e-9 < next_t:
            continue
        px = decode.pixels(_ensure_dht(data[lo:hi]))
        if px.ndim == 2:
            px = np.repeat(px[:, :, None], 3, axis=2)
        elif px.shape[2] == 1:
            px = np.repeat(px, 3, axis=2)
        frames.append(px)
        while next_t <= ts + 1e-9:
            next_t += every_ms
    if not frames:
        raise ValueError("undecodable video payload: no frames decoded")
    if any(f.shape != frames[0].shape for f in frames[1:]):
        # a corrupted SOF can resize one frame mid-stream; refuse by
        # name instead of leaking numpy's raw stack() ValueError
        # (round-17 hypothesis find: one bit flip in frame 2's header)
        raise ValueError(
            "undecodable video payload: sampled frames disagree on "
            f"geometry ({sorted({f.shape for f in frames})})"
        )
    return np.stack(frames).astype(np.uint8)


def encode_avi_mjpeg(
    frames,
    *,
    fps: int = 25,
    quality: int = 90,
    subsampling: str = "420",
    strip_dht: bool = False,
) -> bytes:
    """Fixture-side inverse: pack uint8 frames (each (H, W, 3) or
    (H, W)) into a minimal spec-correct MJPEG AVI (RIFF → hdrl
    {avih, strl{strh 'vids'/'MJPG', strf BITMAPINFOHEADER}} → movi
    '00dc' chunks → idx1). ``strip_dht=True`` drops each frame's DHT
    segments to exercise the omitted-tables MJPEG convention the
    decoder must handle."""
    if not frames:
        raise ValueError("encode_avi_mjpeg needs at least one frame")
    h, w = frames[0].shape[:2]
    payloads = []
    for f in frames:
        if f.shape[:2] != (h, w):
            raise ValueError("all frames must share one geometry")
        p = encode_jpeg(f, quality=quality, subsampling=subsampling)
        payloads.append(_strip_dht(p) if strip_dht else p)

    def chunk(tag: bytes, body: bytes) -> bytes:
        return tag + struct.pack("<I", len(body)) + body + (
            b"\x00" if len(body) & 1 else b""
        )

    def lst(kind: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", kind + body)

    n = len(payloads)
    max_bytes = max(len(p) for p in payloads)
    avih = struct.pack(
        "<14I",
        1_000_000 // fps,  # us per frame
        max_bytes * fps,  # max bytes/sec
        0,  # padding granularity
        0x10,  # AVIF_HASINDEX
        n, 0, 1, max_bytes, w, h, 0, 0, 0, 0,
    )
    strh = (
        b"vids" + b"MJPG"
        + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0, 1, fps, 0, n, max_bytes, 0, 0)
        + struct.pack("<4h", 0, 0, w, h)
    )
    strf = struct.pack("<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG", w * h * 3, 0, 0, 0, 0)
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih)
        + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi_body = b"".join(chunk(b"00dc", p) for p in payloads)
    movi = lst(b"movi", movi_body)
    # idx1: offsets relative to the start of the movi list-type tag
    idx = bytearray()
    off = 4
    for p in payloads:
        idx += b"00dc" + struct.pack("<III", 0x10, off, len(p))
        off += 8 + len(p) + (len(p) & 1)
    riff_body = b"AVI " + hdrl + movi + chunk(b"idx1", bytes(idx))
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


def _strip_dht(jpeg_payload: bytes) -> bytes:
    """Remove every DHT segment from a JPEG payload (fixture helper
    for the MJPEG omitted-tables convention)."""
    data = bytes(jpeg_payload)
    out = bytearray(data[:2])
    pos = 2
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError("bad marker stream")
        m = data[pos + 1]
        if m == 0xFF:
            pos += 1
            continue
        if m in (0xD8, 0x01) or 0xD0 <= m <= 0xD7:
            out += data[pos : pos + 2]
            pos += 2
            continue
        if m == 0xDA:
            out += data[pos:]
            return bytes(out)
        (ln,) = struct.unpack_from(">H", data, pos + 2)
        if m != 0xC4:
            out += data[pos : pos + 2 + ln]
        pos += 2 + ln
    raise ValueError("no SOS marker")
