"""Freshness guard for the PARITY.md production-family pins.

The xxhash64 hash families and the JVM kernels can never pass the
driver's DuckDB oracle gate (no XXH64 / no JVM in DuckDB), so their
sf0.1 equivalence pins in PARITY.md are the ONLY at-scale correctness
evidence those paths carry. The pin tool runs manually; nothing
previously failed if family or kernel code changed without re-running
it (VERDICT r06 item 7). This test closes that gap: every pin run
records a content hash of the family/kernel sources, and the round
fails here if the sources drifted from the latest recorded hash.

To refresh:  python tools/pin_production_families.py  (sf0.1 default)
then record its printed PIN lines + source-sha in PARITY.md.
"""

from __future__ import annotations

import pathlib
import re
import sys

REPO = pathlib.Path(__file__).parent.parent


def test_parity_pins_are_fresh_for_family_and_kernel_sources():
    sys.path.insert(0, str(REPO / "tools"))
    from pin_production_families import family_source_files, family_source_sha

    # the guard must actually cover the family operators and kernels
    names = {pathlib.Path(p).name for p in family_source_files()}
    assert {"dedup.py", "text.py", "SimHash32.java", "GopherCounts.java"} <= names

    parity = (REPO / "PARITY.md").read_text()
    shas = re.findall(r"source-sha:\s*`?([0-9a-f]{16})`?", parity)
    assert shas, "PARITY.md carries no source-sha pin line — run" \
        " tools/pin_production_families.py and record its output"
    current = family_source_sha()
    assert current == shas[-1], (
        f"family/kernel sources (sha {current}) changed since the last"
        f" recorded pin (sha {shas[-1]}) — re-run"
        " tools/pin_production_families.py at sf0.1 and add the fresh"
        " PIN lines + source-sha to PARITY.md"
    )


def test_jpeg_pins_match_live_recompute():
    """The jpeg_decode_stats oracle replays pinned decode(encode(x))
    literals (JPEG is lossy, so no formula oracle can recompute them
    independently). This test is the freshness guard: every pin row —
    dims, decoded-pixel sha256, and the 8 Spark-rounded lanes — is
    recomputed live from the committed codec, so any encoder/decoder
    change fails HERE before the driver gate can go stale. Refresh
    with: python tools/gen_jpeg_pins.py"""
    sys.path.insert(0, str(REPO / "tools"))
    from gen_jpeg_pins import compute_pins

    from exporter_spark.queries.multimodal import _JPEG_PINS, _JPEG_VARIANTS

    live = compute_pins()
    assert len(_JPEG_PINS) == len(_JPEG_VARIANTS) == len(live)
    for committed, fresh in zip(_JPEG_PINS, live):
        assert tuple(committed) == tuple(fresh), (
            f"variant {committed[0]}: committed pin != live recompute —"
            " run python tools/gen_jpeg_pins.py"
        )


def test_avi_pins_match_live_recompute():
    """The video_frame_stats oracle replays pinned sampler outputs
    (MJPEG is lossy, so no formula oracle can recompute the decoded
    frames independently). Freshness guard in the jpeg-pins mold:
    every pin row — sampled-frame count, frame-buffer sha256, and the
    Spark-rounded mean luma — is recomputed live from the committed
    container walk + codec, so any avi.py/jpeg.py change fails HERE
    before the driver gate can go stale. Refresh with:
    python tools/gen_avi_pins.py"""
    sys.path.insert(0, str(REPO / "tools"))
    from gen_avi_pins import compute_pins

    from exporter_spark.queries.multimodal import _AVI_PINS, _AVI_VARIANTS

    live = compute_pins()
    assert len(_AVI_PINS) == len(_AVI_VARIANTS) == len(live)
    for committed, fresh in zip(_AVI_PINS, live):
        assert tuple(committed) == tuple(fresh), (
            f"variant {committed[0]}: committed pin != live recompute —"
            " run python tools/gen_avi_pins.py"
        )
