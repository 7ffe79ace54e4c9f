"""GIF codec — GIF87a/89a decode + GIF89a encode, zero external deps.

The sixth real media format behind the Arrow-batched seams (after
WAV/PNG/PPM/BMP/JPEG), and — for ANIMATED GIFs — the second
zero-dependency video path after MJPEG-in-AVI: the web's most common
looping-clip container decodes to ``(n, H, W, 3)`` frames with pure
``struct`` + numpy.

Scope (GIF89a spec, public): logical screen descriptor, global and
local color tables, variable-code-width LZW (clear/EOI, deferred
clear, 12-bit cap), the four-pass interlace, Graphic Control
Extensions (delay, transparency, disposal methods 0-3 composited the
way browsers do), NETSCAPE2.0 looping, comment/plain-text/application
extension skip. GIF is LOSSLESS for <=256-color frames, so
decode(encode(x)) is exact — which is why the driver gate for this
codec (``gif_decode_stats``) can use the strong formula oracle
instead of pinned literals.

Corruption contract matches the sibling codecs: malformed payloads
raise ``ValueError`` naming the reason, never raw struct/numpy errors
and never fake pixels. The reference (go-data-exporter/exporter) has
no media support; this module is part of the mandated
LLM-pipeline scope extension.
"""

from __future__ import annotations

import struct

import numpy as np

from exporter_spark.operators.jpeg import MAX_PIXELS

_MAX_CODES = 4096  # 12-bit LZW cap (GIF spec)

# Decompression-bomb guard on the TOTAL decoded output of an animated
# stream: .frames() materializes one full-canvas copy per frame, so a
# tiny payload declaring many frames (or a huge logical screen) could
# otherwise allocate gigabytes from a few hundred declared bytes. The
# per-canvas cap is jpeg.MAX_PIXELS (same rationale: the header is
# untrusted); the across-frames cap bounds n_frames*h*w at 4x that
# (~768 MB of uint8 RGB worst-case). Raise consciously for genuinely
# larger media.
MAX_TOTAL_PIXELS = MAX_PIXELS * 4


def _lzw_decode(data: bytes, min_code_size: int, n_expected: int) -> np.ndarray:
    """GIF variable-code-width LZW → index stream of ``n_expected``
    bytes. Handles clear codes (incl. the deferred-clear convention:
    the table stops growing at 4096 until the encoder clears), EOI,
    and streams that omit EOI (some encoders do; output length is the
    authoritative terminator)."""
    # Image-data min code size is the color-table bit depth: 2..8
    # (GIF89a App. F). 9..11 would pass a 12-bit-width check but put
    # roots >= 256 in the table — indices a byte-valued pixel stream
    # can never hold (and bytes([i]) below would crash with a RAW
    # ValueError instead of this named refusal; hypothesis-found,
    # pinned in tests/test_gif.py).
    if not 2 <= min_code_size <= 8:
        raise ValueError(
            f"undecodable GIF payload: LZW min code size {min_code_size}"
        )
    clear = 1 << min_code_size
    eoi = clear + 1
    code_size = min_code_size + 1
    base = [bytes([i]) for i in range(clear)] + [b"", b""]
    table = list(base)
    out = bytearray()
    prev = None
    acc = 0
    nbits = 0
    pos = 0
    while len(out) < n_expected:
        while nbits < code_size:
            if pos >= len(data):
                raise ValueError(
                    "undecodable GIF payload: truncated LZW stream"
                )
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << code_size) - 1)
        acc >>= code_size
        nbits -= code_size
        if code == clear:
            table = list(base)
            code_size = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            if code >= clear:
                raise ValueError(
                    "undecodable GIF payload: first LZW code not a root"
                )
            entry = table[code]
        elif code < len(table):
            entry = table[code]
        elif code == len(table):
            entry = prev + prev[:1]
        else:
            raise ValueError(
                f"undecodable GIF payload: LZW code {code} beyond table"
            )
        if prev is not None and len(table) < _MAX_CODES:
            table.append(prev + entry[:1])
            if len(table) == (1 << code_size) and code_size < 12:
                code_size += 1
        out += entry
        prev = entry
    if len(out) < n_expected:
        raise ValueError(
            "undecodable GIF payload: LZW stream ended at"
            f" {len(out)}/{n_expected} pixels"
        )
    return np.frombuffer(bytes(out[:n_expected]), dtype=np.uint8)


def _lzw_encode(indices: np.ndarray, min_code_size: int) -> bytes:
    """The inverse: index stream → GIF LZW bytes (clear emitted first
    and on table overflow, EOI last, code width growing at table size
    2^code_size — the standard non-early convention)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0
    code_size = min_code_size + 1

    def emit(code: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += code_size
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    if len(indices) and int(indices.max()) >= clear:
        raise ValueError(
            f"LZW index {int(indices.max())} out of alphabet for min"
            f" code size {min_code_size}"
        )
    table = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    emit(clear)
    w = b""
    for raw in bytes(indices.astype(np.uint8).tobytes()):
        c = bytes([raw])
        wc = w + c
        if wc in table:
            w = wc
            continue
        emit(table[w])
        if next_code < _MAX_CODES:
            table[wc] = next_code
            next_code += 1
            if next_code == (1 << code_size) + 1 and code_size < 12:
                # the decoder's table LAGS this one by a single entry
                # (it builds the mirror of add #k only when it reads
                # code #k+1), so it widens after the read that brings
                # its length to 2^cs — which is the moment this side's
                # next_code passes 2^cs. Bump here to stay in
                # lockstep; the symmetric trace is in the r15 tests.
                code_size += 1
        else:
            emit(clear)
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
            code_size = min_code_size + 1
        w = c
    if w:
        emit(table[w])
    emit(eoi)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _deinterlace(rows: np.ndarray) -> np.ndarray:
    h = rows.shape[0]
    order = np.concatenate(
        [np.arange(start, h, step) for start, step in _INTERLACE_PASSES]
    ).astype(np.int64)
    out = np.empty_like(rows)
    out[order] = rows
    return out


def _sub_blocks(data: bytes, pos: int) -> tuple[bytes, int]:
    """Read len-prefixed sub-blocks up to the 0 terminator."""
    out = bytearray()
    while True:
        if pos >= len(data):
            raise ValueError("undecodable GIF payload: truncated sub-blocks")
        ln = data[pos]
        pos += 1
        if ln == 0:
            return bytes(out), pos
        if pos + ln > len(data):
            raise ValueError("undecodable GIF payload: truncated sub-block")
        out += data[pos : pos + ln]
        pos += ln


def parse_gif(payload: bytes):
    """Structural walk: returns ``(width, height, bg_index, gct,
    images)`` where each image is ``(left, top, fw, fh, interlaced,
    lct, min_code_size, lzw_bytes, gce)`` and gce is ``(disposal,
    transparent_index_or_None, delay_cs)`` from the preceding Graphic
    Control Extension (zeros if absent)."""
    data = bytes(payload or b"")
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("undecodable GIF payload: bad signature")
    try:
        w, h, packed, bg, _aspect = struct.unpack_from("<HHBBB", data, 6)
        pos = 13
        gct = None
        if packed & 0x80:
            n = 2 ** ((packed & 0x07) + 1)
            if pos + 3 * n > len(data):
                raise ValueError(
                    "undecodable GIF payload: truncated global color table"
                )
            gct = (
                np.frombuffer(data, np.uint8, 3 * n, pos)
                .reshape(n, 3)
                .copy()
            )
            pos += 3 * n
        images = []
        gce = (0, None, 0)
        while True:
            if pos >= len(data):
                raise ValueError("undecodable GIF payload: missing trailer")
            b0 = data[pos]
            if b0 == 0x3B:  # trailer
                break
            if b0 == 0x21:  # extension
                if pos + 2 > len(data):
                    raise ValueError(
                        "undecodable GIF payload: truncated extension"
                    )
                label = data[pos + 1]
                body, pos = _sub_blocks(data, pos + 2)
                if label == 0xF9 and len(body) >= 4:
                    p, delay = body[0], struct.unpack_from("<H", body, 1)[0]
                    transparent = body[3] if p & 0x01 else None
                    gce = ((p >> 2) & 0x07, transparent, delay)
                continue
            if b0 == 0x2C:  # image descriptor
                left, top, fw, fh, p2 = struct.unpack_from(
                    "<HHHHB", data, pos + 1
                )
                pos += 10
                lct = None
                if p2 & 0x80:
                    n = 2 ** ((p2 & 0x07) + 1)
                    if pos + 3 * n > len(data):
                        raise ValueError(
                            "undecodable GIF payload: truncated local"
                            " color table"
                        )
                    lct = (
                        np.frombuffer(data, np.uint8, 3 * n, pos)
                        .reshape(n, 3)
                        .copy()
                    )
                    pos += 3 * n
                if fw == 0 or fh == 0:
                    raise ValueError(
                        "undecodable GIF payload: zero-size image block"
                    )
                if left + fw > w or top + fh > h:
                    raise ValueError(
                        "undecodable GIF payload: image block outside"
                        " logical screen"
                    )
                if pos >= len(data):
                    raise ValueError(
                        "undecodable GIF payload: missing LZW code size"
                    )
                mcs = data[pos]
                lzw, pos = _sub_blocks(data, pos + 1)
                images.append(
                    (left, top, fw, fh, bool(p2 & 0x40), lct, mcs, lzw, gce)
                )
                gce = (0, None, 0)
                continue
            raise ValueError(
                f"undecodable GIF payload: unknown block 0x{b0:02x}"
            )
    except struct.error as ex:
        raise ValueError(
            "undecodable GIF payload: truncated header structure"
        ) from ex
    if not images:
        raise ValueError("undecodable GIF payload: no image blocks")
    return w, h, bg, gct, images


def gif_decoder():
    """GIF → the shared 8-lane image feature vector
    (``multimodal.PNG_FEATURE_NAMES`` layout, bit_depth reports 8) for
    the FIRST frame. Exposes ``.pixels(payload)`` → uint8 ``(H, W,
    3)`` first frame and ``.frames(payload)`` → ``(uint8 (n, H, W,
    3), delays_ms list)`` for animations, composited per the GCE
    disposal methods (none / keep / restore-to-background /
    restore-to-previous) with transparency honored against the
    running canvas — the browser compositing model."""

    def _frames(payload: bytes, first_only: bool = False):
        w, h, bg, gct, images = parse_gif(payload)
        if w * h > MAX_PIXELS:
            # bomb guard in the DECODER, before any canvas allocation
            # (mirrors jpeg.py, where the MAX_PIXELS refusal lives in
            # the decoder too): 13 declared header bytes must not
            # command a multi-GB numpy buffer. parse_gif stays
            # permissive on purpose — probe_media must still CLASSIFY
            # a large-but-valid GIF (dims, image-vs-video), exactly as
            # the probe's JPEG branch reports dims for payloads
            # jpeg_decoder refuses (round-16 review).
            raise ValueError(
                f"undecodable GIF payload: logical screen {w}x{h}"
                f" exceeds the {MAX_PIXELS}-pixel decode cap"
            )
        if first_only:
            # feature extraction / resize need only frame 0 — skip
            # the other LZW decodes (round-15 review: a 200-frame
            # animation cost 200 decodes for 8 first-frame lanes)
            images = images[:1]
        if len(images) * h * w > MAX_TOTAL_PIXELS:
            # each composited frame is a full-canvas copy; cap the
            # total before the loop starts allocating
            raise ValueError(
                f"undecodable GIF payload: {len(images)} frames of"
                f" {w}x{h} exceed the {MAX_TOTAL_PIXELS}-pixel"
                " animation decode cap"
            )
        if gct is not None and bg < len(gct):
            bg_rgb = gct[bg]
        else:
            bg_rgb = np.zeros(3, np.uint8)
        canvas = np.broadcast_to(bg_rgb, (h, w, 3)).copy()
        out, delays = [], []
        for left, top, fw, fh, inter, lct, mcs, lzw, gce in images:
            disposal, transparent, delay_cs = gce
            palette = lct if lct is not None else gct
            if palette is None:
                raise ValueError(
                    "undecodable GIF payload: image block with no color"
                    " table"
                )
            idx = _lzw_decode(lzw, mcs, fw * fh).reshape(fh, fw)
            if inter:
                idx = _deinterlace(idx)
            if int(idx.max()) >= len(palette):
                raise ValueError(
                    "undecodable GIF payload: pixel index beyond color"
                    " table"
                )
            rgb = palette[idx]
            saved = canvas.copy() if disposal == 3 else None
            region = canvas[top : top + fh, left : left + fw]
            if transparent is not None:
                opaque = idx != transparent
                region[opaque] = rgb[opaque]
            else:
                region[:] = rgb
            out.append(canvas.copy())
            delays.append(delay_cs * 10)
            if disposal == 2:
                canvas[top : top + fh, left : left + fw] = bg_rgb
            elif disposal == 3:
                canvas = saved
        return np.stack(out), delays

    def _pixels(payload: bytes) -> np.ndarray:
        frames, _ = _frames(payload, first_only=True)
        return frames[0]

    def decode(payload: bytes) -> np.ndarray:
        px = _pixels(payload)
        h, w, _ = px.shape
        rgb = px.astype(np.float64) / 255.0
        luma = (
            0.299 * rgb[:, :, 0]
            + 0.587 * rgb[:, :, 1]
            + 0.114 * rgb[:, :, 2]
        )
        return np.array(
            [
                w,
                h,
                3,
                8,
                float(luma.mean()),
                float(luma.std()),
                float(luma.min()),
                float(luma.max()),
            ],
            dtype=np.float32,
        )

    decode.pixels = _pixels
    decode.frames = _frames
    return decode


def _palette_and_indices(frames: list[np.ndarray]):
    """One shared palette over all frames (GIF is <=256 colors; more
    raises — quantization is a modeling decision this codec refuses
    to make silently)."""
    stack = np.concatenate([f.reshape(-1, 3) for f in frames])
    palette, inverse = np.unique(stack, axis=0, return_inverse=True)
    if len(palette) > 256:
        raise ValueError(
            f"GIF encode needs <=256 distinct colors, got {len(palette)};"
            " quantize explicitly first"
        )
    per_frame = []
    off = 0
    for f in frames:
        n = f.shape[0] * f.shape[1]
        per_frame.append(
            inverse[off : off + n].astype(np.uint8).reshape(f.shape[:2])
        )
        off += n
    return palette.astype(np.uint8), per_frame


def _norm_frame(a) -> np.ndarray:
    arr = np.ascontiguousarray(np.asarray(a))
    if arr.dtype != np.uint8:
        raise ValueError("GIF encode expects uint8 pixels")
    if arr.ndim == 2:
        arr = np.repeat(arr[:, :, None], 3, axis=2)
    if arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError("pixels must be (H, W) or (H, W, 3)")
    return arr


def _color_table_bytes(palette: np.ndarray) -> tuple[bytes, int]:
    """Pad the palette to the next power of two (>=2 entries) and
    return (bytes, size_field)."""
    n = max(2, len(palette))
    size_field = max(1, (n - 1).bit_length())
    full = 1 << size_field
    padded = np.zeros((full, 3), np.uint8)
    padded[: len(palette)] = palette
    return padded.tobytes(), size_field - 1


def _image_block(idx: np.ndarray, mcs: int) -> bytes:
    fh, fw = idx.shape
    out = bytearray()
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, fw, fh, 0)
    out.append(mcs)
    lzw = _lzw_encode(idx.reshape(-1), mcs)
    for i in range(0, len(lzw), 255):
        chunk = lzw[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


def encode_gif(pixels) -> bytes:
    """Encode one uint8 frame ((H, W) gray or (H, W, 3) RGB with
    <=256 distinct colors) as a single-image GIF89a with a global
    color table. The fixture-side inverse of :func:`gif_decoder` —
    LOSSLESS, so decode(encode(x)) == x exactly."""
    frame = _norm_frame(pixels)
    palette, (idx,) = _palette_and_indices([frame])
    table, size_field = _color_table_bytes(palette)
    mcs = max(2, size_field + 1)
    h, w = frame.shape[:2]
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | size_field, 0, 0)
    out += table
    out += _image_block(idx, mcs)
    out += b"\x3b"
    return bytes(out)


def encode_gif_animation(
    frames,
    *,
    delay_ms: int = 100,
    loop: int = 0,
    disposal: int = 1,
) -> bytes:
    """Encode uint8 frames (same geometry, <=256 distinct colors
    ACROSS all frames) as an animated GIF89a: NETSCAPE2.0 loop block
    (``loop=0`` = forever), one GCE (delay, disposal) per frame,
    full-canvas image blocks, one shared global color table."""
    norm = [_norm_frame(f) for f in frames]
    if not norm:
        raise ValueError("encode_gif_animation needs at least one frame")
    if any(f.shape != norm[0].shape for f in norm):
        raise ValueError("all frames must share one geometry")
    palette, indices = _palette_and_indices(norm)
    table, size_field = _color_table_bytes(palette)
    mcs = max(2, size_field + 1)
    h, w = norm[0].shape[:2]
    delay_cs = max(0, round(delay_ms / 10))
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | size_field, 0, 0)
    out += table
    out += (
        b"\x21\xff\x0bNETSCAPE2.0\x03\x01"
        + struct.pack("<H", loop)
        + b"\x00"
    )
    for idx in indices:
        out += b"\x21\xf9\x04" + bytes([disposal << 2]) + struct.pack(
            "<H", delay_cs
        ) + b"\x00\x00"
        out += _image_block(idx, mcs)
    out += b"\x3b"
    return bytes(out)


def sample_gif_frames(
    payload: bytes, every_ms: int = 1000, max_frames: int = 64
) -> np.ndarray:
    """Animated-GIF frame sampling with the SAME tick-selection rule
    as the MJPEG-AVI and cv2 paths (a frame is kept when its
    cumulative timestamp reaches the next tick, which then advances
    past it). Zero-delay frames make the stream UNTIMED per-frame
    (browsers clamp 0 to ~100 ms; this sampler returns every frame up
    to ``max_frames`` instead of guessing a clamp)."""
    if every_ms <= 0:
        raise ValueError("every_ms must be positive")
    dec = gif_decoder()
    frames, delays = dec.frames(payload)
    if len(frames) > 1 and all(d == 0 for d in delays):
        return frames[:max_frames]
    out = []
    next_t = 0.0
    ts = 0.0
    for i in range(len(frames)):
        if len(out) >= max_frames:
            break
        if ts + 1e-9 >= next_t:
            out.append(frames[i])
            while next_t <= ts + 1e-9:
                next_t += every_ms
        ts += delays[i]
    return np.stack(out)
