"""Multimodal + IVF (real zero-dependency codecs under the gate).

Split out of the monolithic queries.py in round 15; registration
order within this module is unchanged (see queries/__init__.py for
the cross-module order and the driver-window contract).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from exporter_spark.operators import multimodal, similarity
from exporter_spark.operators.multimodal import extract_features
from exporter_spark.operators.partitioning import spread
from exporter_spark.queries._registry import _dsum, _register
from exporter_spark.sources.files import load_table

# =====================================================================
# Multimodal plumbing (stubbed decode; Spark mechanics are real)
# =====================================================================


@_register("ivf_ann_topk", None)  # KMeans training → rows-only check
def ivf_ann_topk(spark, sf_dir):
    """IVF approximate nearest neighbors: KMeans cells + n_probe
    centroid probing + exact rerank (the production-scale ANN path)."""
    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 5)
    return similarity.ivf_topk(e, q, k=5, n_clusters=16, n_probe=4)


def _ivf_fixed_oracle(n_cent: int = 16, n_probe: int = 4, k: int = 5) -> str:
    """DuckDB replica of similarity.ivf_fixed_topk: centroids are the
    16 lowest vec_ids; assignment/probe/rerank scores all round(6)
    with cell- (resp. neighbor-) ascending tie-breaks, so both engines
    route every vector identically."""

    def cos(a: str, b: str) -> str:
        return (
            f"ROUND(list_inner_product({a}, {b}) / "
            f"(sqrt(list_inner_product({a}, {a})) * sqrt(list_inner_product({b}, {b}))), 6)"
        )

    return f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    cent AS (
      SELECT (row_number() OVER (ORDER BY vec_id) - 1)::INT AS cell, v AS c
      FROM e WHERE vec_id < {n_cent}
    ),
    asg AS (
      SELECT vec_id AS neighbor_id, v, cell FROM (
        SELECT e.vec_id, e.v, cent.cell,
               ROW_NUMBER() OVER (PARTITION BY e.vec_id
                 ORDER BY {cos('e.v', 'cent.c')} DESC, cent.cell ASC) AS rn
        FROM e CROSS JOIN cent) WHERE rn = 1
    ),
    probes AS (
      SELECT query_id, qv, cell FROM (
        SELECT q.vec_id AS query_id, q.v AS qv, cent.cell,
               ROW_NUMBER() OVER (PARTITION BY q.vec_id
                 ORDER BY {cos('q.v', 'cent.c')} DESC, cent.cell ASC) AS rn
        FROM e q CROSS JOIN cent WHERE q.vec_id < 5) WHERE rn <= {n_probe}
    )
    SELECT query_id, neighbor_id, sim, rank FROM (
      SELECT p.query_id, a.neighbor_id, {cos('p.qv', 'a.v')} AS sim,
             ROW_NUMBER() OVER (PARTITION BY p.query_id
               ORDER BY {cos('p.qv', 'a.v')} DESC, a.neighbor_id ASC) AS rank
      FROM probes p JOIN asg a USING (cell)
      WHERE a.neighbor_id != p.query_id)
    WHERE rank <= {k}
    """


@_register("ivf_fixed_topk", _ivf_fixed_oracle())
def ivf_fixed_topk(spark, sf_dir):
    """Deterministic-quantizer IVF tier: same probe/rerank machinery as
    ivf_ann_topk but with sampled (fixed-id) centroids, which makes the
    whole operator value-comparable against the SQL oracle."""
    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 5)
    return similarity.ivf_fixed_topk(
        e, q, k=5, centroid_ids=list(range(16)), n_probe=4
    )


def _multimodal_oracle(n_features: int = 4) -> str:
    """DuckDB replica of multimodal.hex_chain_decoder + the Spark-side
    left-assoc double fold: per feature, 64 bits of chained sha256 over
    the hex digest → float32 → widened to double and summed in order.
    0.0::DOUBLE is load-bearing — a bare 0.0 literal is DECIMAL and
    DuckDB would collapse the whole sum to FLOAT."""
    term = (
        "((('0x' || substr(sha256(hh || '{i}'), 1, 16))::UBIGINT::DOUBLE"
        " / 18446744073709551616.0)::FLOAT::DOUBLE)"
    )
    expr = "0.0::DOUBLE"
    for i in range(n_features):
        expr = f"({expr} + {term.format(i=i)})"
    return f"""
    WITH d AS (SELECT doc_id AS media_id, sha256(text) AS hh FROM documents)
    SELECT media_id, round({expr}, 6) AS feature_sum FROM d
    """


@_register("multimodal_feature_stats", _multimodal_oracle())
def multimodal_feature_stats(spark, sf_dir):
    """Decode runs as an Arrow-batched mapInPandas over binary payloads;
    the hex-chain decoder variant keeps the floats SQL-expressible so
    this path gets a value-level gate (as of r15 the production
    default is the REAL auto_decoder; stub_decoder is the explicit
    plumbing-test opt-in)."""
    d = load_table(spark, sf_dir, "documents")
    media = d.select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "UTF-8").alias("payload"),
    )
    feats = extract_features(
        media, n_features=4, decoder=multimodal.hex_chain_decoder(4)
    )
    return feats.select(
        "media_id",
        F.round(F.expr("aggregate(features, 0D, (a, x) -> a + x)"), 6).alias(
            "feature_sum"
        ),
    )


# Fixture geometry shared by media_decode_stats and its oracle. The
# pixel/sample GENERATORS are simple integer formulas so DuckDB can
# replay the ground truth independently of any codec: if a decoder
# corrupts even one pixel, the per-doc luma stats diverge.
_MEDIA_H, _MEDIA_W, _MEDIA_N_SAMP = 7, 9, 120


def _media_decode_oracle() -> str:
    """DuckDB ground truth for media_decode_stats — NOT a replay of
    the decoders: the expected features are recomputed from the pixel
    formula v(doc,r,c,k) = (doc*11 + r*31 + c*7 + k*13) % 256 and the
    sample formula s(doc,i) = (doc*7919 + i*104729) % 65536 - 32768,
    so the Spark side's encode→decode round trip (encode_png /
    encode_bmp / encode_ppm / encode_wav → auto_decoder) is gated
    against independently derived values. float64 math matches the
    decoders op-for-op (luma weights applied to v/255.0, two-pass
    population variance, signbit zero-crossings); the ::FLOAT::DOUBLE
    casts replicate the decoders' float32 lane quantization before
    the shared round-6. The probed_* columns are format CONSTANTS
    (fixture geometry / 15 ms wav duration) stated here independently
    of probe_media's marker/header walks."""
    h, w, n = _MEDIA_H, _MEDIA_W, _MEDIA_N_SAMP
    v = "((doc_id*11 + r.r*31 + c.c*7 + {k}) % 256)/255.0"
    luma = (
        f"(0.299*({v.format(k=0)}) + 0.587*({v.format(k=13)})"
        f" + 0.114*({v.format(k=26)}))"
    )
    return f"""
    WITH px AS (
      SELECT doc_id, {luma} AS luma
      FROM (SELECT doc_id FROM documents WHERE doc_id % 4 < 3)
      CROSS JOIN generate_series(0, {h - 1}) r(r)
      CROSS JOIN generate_series(0, {w - 1}) c(c)
    ),
    istat AS (
      SELECT doc_id, avg(luma) AS mu, min(luma) AS mn, max(luma) AS mx
      FROM px GROUP BY doc_id
    ),
    ivar AS (
      SELECT p.doc_id, avg((p.luma - s.mu)*(p.luma - s.mu)) AS vr
      FROM px p JOIN istat s USING (doc_id) GROUP BY p.doc_id
    ),
    imrows AS (
      SELECT s.doc_id AS media_id,
             CASE s.doc_id % 4 WHEN 0 THEN 'png' WHEN 1 THEN 'bmp'
                  ELSE 'ppm' END AS format,
             CASE s.doc_id % 4 WHEN 0 THEN 'png' WHEN 1 THEN 'bmp'
                  ELSE 'ppm' END AS probed_format,
             {w}::INTEGER AS probed_w, {h}::INTEGER AS probed_h,
             NULL::BIGINT AS probed_ms,
             {w}.0::DOUBLE AS lane0, {h}.0::DOUBLE AS lane1,
             3.0::DOUBLE AS lane2, 8.0::DOUBLE AS lane3,
             round(s.mu::FLOAT::DOUBLE, 6) AS lane4,
             round(sqrt(v.vr)::FLOAT::DOUBLE, 6) AS lane5,
             round(s.mn::FLOAT::DOUBLE, 6) AS lane6,
             round(s.mx::FLOAT::DOUBLE, 6) AS lane7
      FROM istat s JOIN ivar v USING (doc_id)
    ),
    smp AS (
      SELECT doc_id, t.i,
             (((doc_id*7919 + t.i*104729) % 65536) - 32768)/32768.0 AS s
      FROM (SELECT doc_id FROM documents WHERE doc_id % 4 = 3)
      CROSS JOIN generate_series(0, {n - 1}) t(i)
    ),
    wstat AS (
      SELECT doc_id, sqrt(avg(s*s)) AS rms, max(abs(s)) AS peak,
             avg(s) AS dc
      FROM smp GROUP BY doc_id
    ),
    wzc AS (
      SELECT doc_id,
             sum(CASE WHEN (s < 0) != (prev < 0) THEN 1 ELSE 0 END)::DOUBLE
               / {n - 1} AS zcr
      FROM (SELECT doc_id, s,
                   lag(s) OVER (PARTITION BY doc_id ORDER BY i) AS prev
            FROM smp)
      WHERE prev IS NOT NULL GROUP BY doc_id
    ),
    wavrows AS (
      SELECT w.doc_id AS media_id, 'wav' AS format,
             'wav' AS probed_format,
             NULL::INTEGER AS probed_w, NULL::INTEGER AS probed_h,
             ({n}*1000/8000)::BIGINT AS probed_ms,
             1.0::DOUBLE AS lane0, 8000.0::DOUBLE AS lane1,
             {n}.0::DOUBLE AS lane2,
             ({n}.0*1000.0/8000.0)::FLOAT::DOUBLE AS lane3,
             round(w.rms::FLOAT::DOUBLE, 6) AS lane4,
             round(w.peak::FLOAT::DOUBLE, 6) AS lane5,
             round(z.zcr::FLOAT::DOUBLE, 6) AS lane6,
             round(w.dc::FLOAT::DOUBLE, 6) AS lane7
      FROM wstat w JOIN wzc z USING (doc_id)
    )
    SELECT * FROM imrows UNION ALL SELECT * FROM wavrows
    """


@_register("media_decode_stats", _media_decode_oracle())
def media_decode_stats(spark, sf_dir):
    """The REAL media codecs under the driver gate (VERDICT r13 #1):
    every documents row becomes a deterministic formula-generated
    payload in one of the four zero-dependency formats by doc_id % 4
    (PNG / BMP / binary PPM / 16-bit PCM WAV), encoded executor-side
    in an Arrow-batched mapInPandas, then PROBED (probe_media derives
    format/width/height/duration_ms from the payload bytes — gated
    because the expected values are format constants the oracle
    states independently) and decoded back through the production
    extract_features + auto_decoder seam. The output is the probed
    meta plus the raw 8-lane feature vector per doc (images:
    PNG_FEATURE_NAMES layout, wav: WAV_FEATURE_NAMES layout —
    generic lane names because the driver compares by column). The
    oracle recomputes expected lanes from the generator formulas, so
    encoder, prober AND decoder must all be byte/pixel/sample-exact
    to pass."""
    import numpy as np
    import pandas as pd

    d = load_table(spark, sf_dir, "documents").select("doc_id")
    h, w, n = _MEDIA_H, _MEDIA_W, _MEDIA_N_SAMP

    def encode(batches):
        for pdf in batches:
            payloads = []
            for raw_id in pdf["doc_id"]:
                doc_id = int(raw_id)
                kind = doc_id % 4
                if kind < 3:
                    px = (
                        doc_id * 11
                        + 31 * np.arange(h)[:, None, None]
                        + 7 * np.arange(w)[None, :, None]
                        + 13 * np.arange(3)[None, None, :]
                    ) % 256
                    px = px.astype(np.uint8)
                    enc = (
                        multimodal.encode_png
                        if kind == 0
                        else multimodal.encode_bmp
                        if kind == 1
                        else multimodal.encode_ppm
                    )
                    payloads.append(enc(px))
                else:
                    i = np.arange(n, dtype=np.int64)
                    s = (doc_id * 7919 + i * 104729) % 65536 - 32768
                    payloads.append(
                        multimodal.encode_wav(s.tolist(), framerate=8000)
                    )
            yield pd.DataFrame(
                {
                    "media_id": pdf["doc_id"],
                    "payload": payloads,
                    "meta": [None] * len(payloads),
                }
            )

    media = d.mapInPandas(encode, multimodal.media_schema())
    probed = multimodal.probe_media(media)
    feats = extract_features(media, decoder=multimodal.auto_decoder())
    # meta branch + feature branch both consume the encoded frame
    # (the cheap encode deliberately recomputes per branch — caching
    # corpus-sized binary payloads would cost more than re-encoding);
    # the combine is a plain equi-join with NO broadcast hint: the
    # meta side is per-document cardinality, so a forced broadcast is
    # a driver-memory cliff at scale (round-14 review) — AQE converts
    # it at runtime exactly when it is actually small, per the
    # repo-wide broadcast policy
    meta = probed.select(
        "media_id",
        F.col("meta.format").alias("probed_format"),
        F.col("meta.width").alias("probed_w"),
        F.col("meta.height").alias("probed_h"),
        F.col("meta.duration_ms").alias("probed_ms"),
    )
    feats = feats.join(meta, "media_id")
    lanes = [
        F.round(F.col("features")[i].cast("double"), 6).alias(f"lane{i}")
        for i in range(8)
    ]
    return feats.select(
        "media_id",
        F.expr(
            "CASE CAST(media_id % 4 AS INT) WHEN 0 THEN 'png'"
            " WHEN 1 THEN 'bmp' WHEN 2 THEN 'ppm' ELSE 'wav' END"
        ).alias("format"),
        "probed_format",
        "probed_w",
        "probed_h",
        "probed_ms",
        *lanes,
    )




# =====================================================================
# JPEG under the driver gate (VERDICT r14 #2). JPEG is LOSSY, so the
# formula oracle above cannot replay its decoded values — but
# decode(encode(x)) is DETERMINISTIC (pure integer/float32 pipeline,
# no platform-dependent ops), so the decoded outputs are pinned as
# per-variant LITERALS: fixture images are keyed on doc_id % NV (not
# doc_id), which makes the expected rows a pure per-variant constant
# at EVERY scale factor. tools/gen_jpeg_pins.py regenerates the pin
# block; tests/test_parity_pins.py recomputes every pin live from the
# codec so any encoder/decoder drift fails pytest before it can reach
# the driver gate.
# =====================================================================

# (quality, subsampling, progressive, restart_interval, h, w, gray) —
# covering every decoder path: baseline + progressive (SOF0/SOF2),
# all three chroma grids incl. odd dimensions (partial MCUs at the
# right/bottom edges), restart resync in both entropy modes, and the
# single-component grayscale frame shape.
_JPEG_VARIANTS = (
    (90, "444", False, 0, 16, 16, False),
    (75, "420", False, 0, 17, 19, False),
    (50, "422", False, 2, 13, 21, False),
    (90, "444", True, 0, 16, 16, False),
    (85, "420", True, 0, 11, 9, False),
    (70, "444", False, 0, 12, 10, True),
    (35, "420", False, 3, 24, 24, False),
    (95, "422", True, 2, 8, 32, False),
)


def _jpeg_fixture_pixels(variant: int):
    """Deterministic per-variant source image: the same integer
    formula family as media_decode_stats, keyed on VARIANT so every
    doc in a variant class shares one image (and therefore one pinned
    decode)."""
    import numpy as np

    _, _, _, _, h, w, gray = _JPEG_VARIANTS[variant]
    r = np.arange(h).reshape(h, 1, 1)
    c = np.arange(w).reshape(1, w, 1)
    k = np.arange(3).reshape(1, 1, 3)
    px = ((variant * 37 + 31 * r + 7 * c + 13 * k) % 256).astype(np.uint8)
    return px[:, :, 0] if gray else px


def _jpeg_fixture_payload(variant: int) -> bytes:
    from exporter_spark.operators.jpeg import (
        encode_jpeg,
        encode_jpeg_progressive,
    )

    q, sub, prog, rst, _, _, _ = _JPEG_VARIANTS[variant]
    px = _jpeg_fixture_pixels(variant)
    if prog:
        return encode_jpeg_progressive(
            px, quality=q, subsampling=sub, restart_interval=rst
        )
    return encode_jpeg(px, quality=q, subsampling=sub, restart_interval=rst)


# Pinned decode(encode(variant)) outputs — sha256 of the decoded
# uint8 pixel buffer plus the 8 feature lanes (PNG_FEATURE_NAMES
# layout) rounded like the Spark side rounds (HALF_UP at 6 dp on the
# float32 value widened to double, replicating BigDecimal.valueOf).
# GENERATED by tools/gen_jpeg_pins.py — do not edit by hand.
_JPEG_PINS: tuple = (
    (0, 16, 16,
     "f6ff366b9fc986b88e19361b923304df45420d4117cc49004f6c56e95dc65a65",
     "16.000000", "16.000000", "3.000000", "8.000000", "0.506772", "0.261432", "0.029792", "0.955918"),
    (1, 19, 17,
     "24e20e81d678396576c9f357bc207b4c01a0ff5bef8883bde32ac64853e13c67",
     "19.000000", "17.000000", "3.000000", "8.000000", "0.496851", "0.257087", "0.019933", "0.959522"),
    (2, 21, 13,
     "dc3f64d525a868c5c49586c685a5498494dbcf7dc8b00d731ea976c7a8aa68ab",
     "21.000000", "13.000000", "3.000000", "8.000000", "0.527599", "0.260879", "0.046184", "0.957620"),
    (3, 16, 16,
     "50ab23a0433206bf68c71cbb1a72928ee2238dee26b4a7d0698d6842de3fc3f7",
     "16.000000", "16.000000", "3.000000", "8.000000", "0.499075", "0.268440", "0.029925", "0.947710"),
    (4, 9, 11,
     "ef451284ba08ae4af0e44fc34f0f91f6efaad8f5ae59bc9b73b99f1fbea2a29a",
     "9.000000", "11.000000", "3.000000", "8.000000", "0.559489", "0.265573", "0.049282", "0.937165"),
    (5, 10, 12,
     "9ac93dde2ed73baed1729b2cae28e91648289cad61696c9e3d758c4146418d1b",
     "10.000000", "12.000000", "1.000000", "8.000000", "0.493889", "0.322591", "0.000000", "1.000000"),
    (6, 24, 24,
     "e1f691bdf5d3e160e48db87be7b2a6b0610fda00e82ae4c9a245b6db69484aef",
     "24.000000", "24.000000", "3.000000", "8.000000", "0.501940", "0.258008", "0.000000", "0.987380"),
    (7, 32, 8,
     "2e174ea21905146d6b8e52079b2004b3cc85401fcdc200b45d3a1f24ea9dc08e",
     "32.000000", "8.000000", "3.000000", "8.000000", "0.501775", "0.261748", "0.041616", "0.940890"),
)  # GENERATED; refresh with tools/gen_jpeg_pins.py


def _jpeg_decode_oracle() -> str:
    nv = len(_JPEG_VARIANTS)
    rows = ",\n      ".join(
        "({}, {}, {}, '{}', {})".format(
            v, w, h, sha, ", ".join(lanes)
        )
        for (v, w, h, sha, *lanes) in _JPEG_PINS
    )
    lane_cols = ", ".join(
        f"CAST(p.lane{i} AS DOUBLE) AS lane{i}" for i in range(8)
    )
    return f"""
    SELECT d.doc_id AS media_id,
           CAST(d.doc_id % {nv} AS INT) AS variant,
           'jpeg' AS probed_format,
           p.probed_w, p.probed_h, p.pixel_sha,
           {lane_cols}
    FROM documents d
    JOIN (VALUES
      {rows}
    ) AS p(variant, probed_w, probed_h, pixel_sha,
           lane0, lane1, lane2, lane3, lane4, lane5, lane6, lane7)
      ON CAST(d.doc_id % {nv} AS INT) = p.variant
    """


@_register("jpeg_decode_stats", _jpeg_decode_oracle())
def jpeg_decode_stats(spark, sf_dir):
    """The JPEG codec end-to-end under the driver gate: every
    documents row becomes one of eight deterministic fixture payloads
    by doc_id % 8 (baseline AND progressive, 4:4:4/4:2:2/4:2:0, odd
    dimensions, restart intervals, grayscale), encoded executor-side,
    PROBED (probe_media's SOF marker walk must report the true
    dimensions for both SOF0 and SOF2 frames) and decoded through the
    production auto_decoder magic dispatch — plus an EXACT gate: the
    sha256 of the decoded uint8 pixel buffer. The oracle replays
    pinned per-variant literals (decode(encode(x)) is deterministic;
    fixtures are keyed on the variant class, never the doc id, so the
    pins hold at every SF). Encoder, prober, and decoder must all be
    byte/pixel-exact to pass; tests/test_parity_pins.py recomputes
    the pins live so codec drift fails pytest first."""
    import hashlib

    import pandas as pd

    from exporter_spark.operators.jpeg import jpeg_decoder

    d = load_table(spark, sf_dir, "documents").select("doc_id")
    nv = len(_JPEG_VARIANTS)

    def encode(batches):
        cache: dict = {}
        for pdf in batches:
            payloads = []
            for raw_id in pdf["doc_id"]:
                v = int(raw_id) % nv
                if v not in cache:
                    cache[v] = _jpeg_fixture_payload(v)
                payloads.append(cache[v])
            yield pd.DataFrame(
                {
                    "media_id": pdf["doc_id"],
                    "payload": payloads,
                    "meta": [None] * len(payloads),
                }
            )

    media = d.mapInPandas(encode, multimodal.media_schema())
    probed = multimodal.probe_media(media)
    meta = probed.select(
        "media_id",
        F.col("meta.format").alias("probed_format"),
        F.col("meta.width").alias("probed_w"),
        F.col("meta.height").alias("probed_h"),
    )

    out_schema = (
        "media_id long, features array<float>, pixel_sha string"
    )

    def decode(batches):
        dec = multimodal.auto_decoder()
        jpg = jpeg_decoder()
        cache: dict = {}
        for pdf in batches:
            lanes_col, sha_col = [], []
            for raw_id, p in zip(pdf["media_id"], pdf["payload"]):
                v = int(raw_id) % nv
                if v not in cache:
                    pl = bytes(p)
                    cache[v] = (
                        dec(pl).tolist(),
                        hashlib.sha256(jpg.pixels(pl).tobytes()).hexdigest(),
                    )
                lanes_col.append(cache[v][0])
                sha_col.append(cache[v][1])
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "features": lanes_col,
                    "pixel_sha": sha_col,
                }
            )

    feats = media.mapInPandas(decode, out_schema)
    # plain equi-join, no broadcast hint (AQE decides; see
    # media_decode_stats for the policy note)
    joined = feats.join(meta, "media_id")
    lanes = [
        F.round(F.col("features")[i].cast("double"), 6).alias(f"lane{i}")
        for i in range(8)
    ]
    return joined.select(
        "media_id",
        F.expr(f"CAST(media_id % {nv} AS INT)").alias("variant"),
        "probed_format",
        "probed_w",
        "probed_h",
        "pixel_sha",
        *lanes,
    )


# =====================================================================
# GIF under the driver gate (round 15). GIF is LOSSLESS for palette
# frames, so unlike JPEG this codec takes the STRONG oracle: DuckDB
# recomputes the expected lanes from the pixel formulas, independent
# of any codec code. Payloads are per-doc (not per-variant): even
# doc_ids carry a single-frame GIF, odd ones a 3-frame animation
# (NETSCAPE loop + GCE delays), so the gate covers the LZW round
# trip, the animation walk, probe classification (image vs video +
# summed delays) AND the r15 extract_features default (auto_decoder
# with no decoder= argument).
# =====================================================================

_GIF_H, _GIF_W, _GIF_COLORS, _GIF_FRAMES, _GIF_DELAY_MS = 11, 13, 32, 3, 150


def _gif_fixture_frame(doc_id: int, f: int):
    """Palette frame: color k = ((k*53)%256, (k*101)%256, (k*197)%256),
    index(r,c) = (doc_id*13 + f*7 + r*5 + c*3) % 32. Frame 0 is the
    static fixture, so animated and single-frame docs share one lane
    formula."""
    import numpy as np

    k = np.arange(_GIF_COLORS, dtype=np.int64)
    pal = np.stack(
        [(k * 53) % 256, (k * 101) % 256, (k * 197) % 256], axis=1
    ).astype(np.uint8)
    r = np.arange(_GIF_H).reshape(_GIF_H, 1)
    c = np.arange(_GIF_W).reshape(1, _GIF_W)
    idx = (doc_id * 13 + f * 7 + r * 5 + c * 3) % _GIF_COLORS
    return pal[idx]


def _gif_decode_oracle() -> str:
    h, w, nc = _GIF_H, _GIF_W, _GIF_COLORS
    dur = (_GIF_FRAMES) * _GIF_DELAY_MS
    return f"""
    WITH px AS (
      SELECT doc_id,
             ((doc_id*13 + r.r*5 + c.c*3) % {nc}) AS k
      FROM documents
      CROSS JOIN generate_series(0, {h - 1}) r(r)
      CROSS JOIN generate_series(0, {w - 1}) c(c)
    ),
    lum AS (
      SELECT doc_id,
             (0.299*((k*53)%256) + 0.587*((k*101)%256)
              + 0.114*((k*197)%256))/255.0 AS luma
      FROM px
    ),
    stat AS (
      SELECT doc_id, avg(luma) AS mu, min(luma) AS mn, max(luma) AS mx
      FROM lum GROUP BY doc_id
    ),
    vr AS (
      SELECT l.doc_id, avg((l.luma - s.mu)*(l.luma - s.mu)) AS v
      FROM lum l JOIN stat s USING (doc_id) GROUP BY l.doc_id
    )
    SELECT s.doc_id AS media_id,
           CASE WHEN s.doc_id % 2 = 1 THEN 'video' ELSE 'image' END
             AS probed_type,
           'gif' AS probed_format,
           {w}::INTEGER AS probed_w, {h}::INTEGER AS probed_h,
           (CASE WHEN s.doc_id % 2 = 1 THEN {dur} END)::BIGINT
             AS probed_ms,
           {w}.0::DOUBLE AS lane0, {h}.0::DOUBLE AS lane1,
           3.0::DOUBLE AS lane2, 8.0::DOUBLE AS lane3,
           round(s.mu::FLOAT::DOUBLE, 6) AS lane4,
           round(sqrt(v.v)::FLOAT::DOUBLE, 6) AS lane5,
           round(s.mn::FLOAT::DOUBLE, 6) AS lane6,
           round(s.mx::FLOAT::DOUBLE, 6) AS lane7
    FROM stat s JOIN vr v USING (doc_id)
    """


@_register("gif_decode_stats", _gif_decode_oracle())
def gif_decode_stats(spark, sf_dir):
    """The GIF codec end-to-end under the STRONG driver gate: every
    documents row becomes a formula-generated palette GIF (even
    doc_ids single-frame, odd ones a 3-frame GIF89a animation with
    NETSCAPE loop + 150 ms GCE delays), encoded executor-side, PROBED
    (probe_media must classify image-vs-video and sum the animation
    delays from the container bytes) and decoded through the r15
    PRODUCTION DEFAULT — extract_features with NO decoder argument,
    i.e. auto_decoder's magic dispatch into gif_decoder. The oracle
    recomputes every lane from the pixel formulas (GIF is lossless),
    so encoder, LZW both ways, animation compositing, prober and
    decoder must all be pixel-exact to pass."""
    import pandas as pd

    from exporter_spark.operators.gif import (
        encode_gif,
        encode_gif_animation,
    )

    # one-row-group parquet => a single-partition scan: without the
    # spread the per-doc LZW encode (run by BOTH the probe and the
    # decode branch) serializes on one core. Pass-through at scale.
    # NOT applied to jpeg/video/media_decode_stats: their per-TASK
    # fixture caches (8/4 variants) rebuild once per partition, and
    # the measured rebuild cost exceeds the parallelism gain at sf0.1
    # (A/B pairs in OPTIMIZATION_r17.md).
    d = spread(
        load_table(spark, sf_dir, "documents").select("doc_id"), "doc_id"
    )

    def encode(batches):
        for pdf in batches:
            payloads = []
            for raw_id in pdf["doc_id"]:
                doc_id = int(raw_id)
                if doc_id % 2:
                    payloads.append(
                        encode_gif_animation(
                            [
                                _gif_fixture_frame(doc_id, f)
                                for f in range(_GIF_FRAMES)
                            ],
                            delay_ms=_GIF_DELAY_MS,
                        )
                    )
                else:
                    payloads.append(encode_gif(_gif_fixture_frame(doc_id, 0)))
            yield pd.DataFrame(
                {
                    "media_id": pdf["doc_id"],
                    "payload": payloads,
                    "meta": [None] * len(payloads),
                }
            )

    # the probe branch and the decode branch both consume the encode
    # map; materialized (r17 optimization round) so the per-doc LZW
    # encode — the dominant Python cost of this entry — runs ONCE
    # instead of once per branch. MEMORY_AND_DISK and released by the
    # bench's cache_scope; the production operators downstream are
    # untouched (probe_media and the r15 no-decoder extract_features
    # seam still run as separate operators over the shared frame).
    from exporter_spark.operators.partitioning import materialize

    media = materialize(d.mapInPandas(encode, multimodal.media_schema()))
    probed = multimodal.probe_media(media)
    meta = probed.select(
        "media_id",
        F.col("meta.media_type").alias("probed_type"),
        F.col("meta.format").alias("probed_format"),
        F.col("meta.width").alias("probed_w"),
        F.col("meta.height").alias("probed_h"),
        F.col("meta.duration_ms").alias("probed_ms"),
    )
    # the r15 default seam on purpose: no decoder= argument
    feats = extract_features(media)
    joined = feats.join(meta, "media_id")
    lanes = [
        F.round(F.col("features")[i].cast("double"), 6).alias(f"lane{i}")
        for i in range(8)
    ]
    return joined.select(
        "media_id",
        "probed_type",
        "probed_format",
        "probed_w",
        "probed_h",
        "probed_ms",
        *lanes,
    )


# =====================================================================
# AVI/MJPEG video under the driver gate (round 16, VERDICT r15 #7):
# the zero-dependency video frame path gets the same treatment as the
# image codecs — per-variant fixture payloads, the REAL container
# walk + sampler + JPEG decode, and pinned decode literals (MJPEG is
# lossy, so pins rather than formulas — the jpeg_decode_stats
# pattern; tests/test_parity_pins.py live-recomputes them).
# =====================================================================

# (n_frames, quality, subsampling, gray, strip_dht, h, w) — covers
# color + grayscale frames, all three subsamplings, odd dims, and the
# omitted-DHT MJPEG convention (strip_dht=True forces the Annex-K
# table splice on decode).
_AVI_VARIANTS: tuple = (
    (4, 90, "420", False, False, 24, 32),
    (5, 85, "422", False, True, 21, 27),
    (6, 75, "444", True, False, 22, 26),
    (7, 90, "420", False, True, 25, 33),
)
_AVI_FPS = 10  # 100 ms/frame
_AVI_EVERY_MS = 300  # tick rule keeps frames 0, 3, 6, ...


def _avi_fixture_frame(variant: int, f: int):
    """Deterministic per-(variant, frame) source image, same integer
    formula family as the other media fixtures."""
    import numpy as np

    _, _, _, gray, _, h, w = _AVI_VARIANTS[variant]
    r = np.arange(h).reshape(h, 1, 1)
    c = np.arange(w).reshape(1, w, 1)
    k = np.arange(3).reshape(1, 1, 3)
    px = ((variant * 37 + f * 41 + 29 * r + 5 * c + 11 * k) % 256).astype(
        "uint8"
    )
    return px[:, :, 0] if gray else px


def _avi_fixture_payload(variant: int) -> bytes:
    from exporter_spark.operators.avi import encode_avi_mjpeg

    n, q, sub, _, strip, _, _ = _AVI_VARIANTS[variant]
    return encode_avi_mjpeg(
        [_avi_fixture_frame(variant, f) for f in range(n)],
        fps=_AVI_FPS,
        quality=q,
        subsampling=sub,
        strip_dht=strip,
    )


# Pinned sampler outputs per variant: (variant, n_sampled,
# sha256-of-sampled-frame-buffer, mean_luma as the Spark-side
# ROUND(CAST(float32 AS DOUBLE), 6) string). GENERATED by
# tools/gen_avi_pins.py — do not edit by hand.
_AVI_PINS: tuple = (
    (0, 2,
     "bae33e360f2fa057839f8187b1132f6bbfe7c2ec138d6ba8b1ce7e9febc74668",
     "0.498558"),
    (1, 2,
     "7a57841b698e81f660dfdd87758d7a8cb710ec14055b3f6834343755d8509e6c",
     "0.502160"),
    (2, 2,
     "855c9e5a22b08bc357cca95de4ca577b28f1746c9f184e492516fc0f8e252efc",
     "0.497885"),
    (3, 3,
     "bce5c5ff678571820d7cdfaa9b0e36f44738bed8554bacd7df12281ef20577ec",
     "0.496894"),
)  # GENERATED; refresh with tools/gen_avi_pins.py


def _video_frame_oracle() -> str:
    nv = len(_AVI_VARIANTS)
    dims = ",\n      ".join(
        f"({v}, {spec[6]}, {spec[5]}, {spec[0] * 100})"
        for v, spec in enumerate(_AVI_VARIANTS)
    )
    pins = ",\n      ".join(
        f"({v}, {n}, '{sha}', {luma})" for (v, n, sha, luma) in _AVI_PINS
    )
    return f"""
    SELECT d.doc_id AS media_id,
           CAST(d.doc_id % {nv} AS INT) AS variant,
           'video' AS probed_type, 'avi' AS probed_format,
           g.probed_w, g.probed_h, CAST(g.probed_ms AS BIGINT) AS probed_ms,
           p.n_sampled, p.pixel_sha,
           CAST(p.mean_luma AS DOUBLE) AS mean_luma
    FROM documents d
    JOIN (VALUES
      {dims}
    ) AS g(variant, probed_w, probed_h, probed_ms)
      ON CAST(d.doc_id % {nv} AS INT) = g.variant
    JOIN (VALUES
      {pins}
    ) AS p(variant, n_sampled, pixel_sha, mean_luma)
      ON g.variant = p.variant
    """


@_register("video_frame_stats", _video_frame_oracle())
def video_frame_stats(spark, sf_dir):
    """The zero-dependency video path end-to-end under the driver
    gate: every documents row becomes one of four MJPEG-AVI fixture
    payloads by doc_id % 4 (4-7 frames; 4:4:4/4:2:2/4:2:0; color and
    grayscale; two variants with DHT STRIPPED so the decoder must
    splice the Annex-K tables per the MJPEG convention), built
    executor-side, PROBED (the RIFF walk must report dimensions and
    avih duration), then frame-sampled through the production
    video_frame_decoder at 300 ms ticks (10 fps -> frames 0, 3, 6 by
    the shared tick rule) with the REAL JPEG entropy decode per kept
    frame. Exact gates: sampled-frame count, sha256 of the sampled
    uint8 frame buffer, and the mean sampled-frame luma against
    pinned literals (MJPEG is lossy -> pins, not formulas; the pins
    are live-recomputed by tests/test_parity_pins.py so codec or
    sampler drift fails pytest first)."""
    import hashlib

    import pandas as pd

    d = load_table(spark, sf_dir, "documents").select("doc_id")
    nv = len(_AVI_VARIANTS)

    def encode(batches):
        cache: dict = {}
        for pdf in batches:
            payloads = []
            for raw_id in pdf["doc_id"]:
                v = int(raw_id) % nv
                if v not in cache:
                    cache[v] = _avi_fixture_payload(v)
                payloads.append(cache[v])
            yield pd.DataFrame(
                {
                    "media_id": pdf["doc_id"],
                    "payload": payloads,
                    "meta": [None] * len(payloads),
                }
            )

    media = d.mapInPandas(encode, multimodal.media_schema())
    probed = multimodal.probe_media(media)
    meta = probed.select(
        "media_id",
        F.col("meta.media_type").alias("probed_type"),
        F.col("meta.format").alias("probed_format"),
        F.col("meta.width").alias("probed_w"),
        F.col("meta.height").alias("probed_h"),
        F.col("meta.duration_ms").alias("probed_ms"),
    )

    out_schema = (
        "media_id long, n_sampled int, pixel_sha string, mean_luma float"
    )

    def sample(batches):
        import numpy as np

        dec = multimodal.video_frame_decoder(
            every_ms=_AVI_EVERY_MS, max_frames=64
        )
        cache: dict = {}
        for pdf in batches:
            n_col, sha_col, luma_col = [], [], []
            for raw_id, p in zip(pdf["media_id"], pdf["payload"]):
                v = int(raw_id) % nv
                if v not in cache:
                    frames = dec(bytes(p))
                    rgb = frames.astype(np.float64) / 255.0
                    luma = (
                        0.299 * rgb[:, :, :, 0]
                        + 0.587 * rgb[:, :, :, 1]
                        + 0.114 * rgb[:, :, :, 2]
                    )
                    cache[v] = (
                        int(frames.shape[0]),
                        hashlib.sha256(frames.tobytes()).hexdigest(),
                        np.float32(luma.mean()),
                    )
                n, sha, lu = cache[v]
                n_col.append(n)
                sha_col.append(sha)
                luma_col.append(lu)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_sampled": n_col,
                    "pixel_sha": sha_col,
                    "mean_luma": luma_col,
                }
            )

    sampled = media.mapInPandas(sample, out_schema)
    joined = sampled.join(meta, "media_id")
    return joined.select(
        "media_id",
        F.expr(f"CAST(media_id % {nv} AS INT)").alias("variant"),
        "probed_type",
        "probed_format",
        "probed_w",
        "probed_h",
        "probed_ms",
        "n_sampled",
        "pixel_sha",
        F.round(F.col("mean_luma").cast("double"), 6).alias("mean_luma"),
    )


# =====================================================================
# pHash image near-dup under the driver gate (round 16): the
# multimodal pillar's dedup story. Engine-exactness comes from the
# operator's all-integer pipeline (int luma, round-half-up pool,
# LITERAL int cosine table, median sign bits) — DuckDB replays the
# WHOLE thing from the pixel formula: hash, banding recall set, and
# hamming distances, with no pinned values anywhere.
# =====================================================================

_PHASH_H = _PHASH_W = 16


def _phash_fixture_pixels(doc_id: int):
    """Doc pairs (2m, 2m+1) are a base image (seed m) and its
    one-pixel perturbation — planted near-dups at every table size,
    independent of row count."""
    import numpy as np

    seed, perturb = doc_id // 2, doc_id % 2
    r = np.arange(_PHASH_H).reshape(_PHASH_H, 1, 1)
    c = np.arange(_PHASH_W).reshape(1, _PHASH_W, 1)
    k = np.arange(3).reshape(1, 1, 3)
    px = ((seed * 37 + 29 * r + 5 * c + 11 * k) % 256).astype("uint8")
    if perturb:
        px[0, 0] = 255 - px[0, 0]
    return px


def _phash_near_dup_oracle() -> str:
    from exporter_spark.operators.phash import DCT_TABLE

    t_rows = ",\n      ".join(
        f"({u}, {x}, {DCT_TABLE[u][x]})" for u in range(8) for x in range(8)
    )
    lum = (
        "299*p0 + 587*p1 + 114*p2"
    )
    chan = (
        "CASE WHEN (d.doc_id % 2) = 1 AND r.r = 0 AND c.c = 0"
        " THEN 255 - (((d.doc_id // 2)*37 + 29*r.r + 5*c.c + 11*{k}) % 256)"
        " ELSE ((d.doc_id // 2)*37 + 29*r.r + 5*c.c + 11*{k}) % 256 END"
    )
    return f"""
    WITH t(u, x, v) AS (VALUES {t_rows}),
    px AS (
      SELECT d.doc_id AS doc, r.r, c.c,
             299*({chan.format(k=0)})
             + 587*({chan.format(k=1)})
             + 114*({chan.format(k=2)}) AS luma
      FROM documents d
      CROSS JOIN (SELECT unnest(range({_PHASH_H})) AS r) r
      CROSS JOIN (SELECT unnest(range({_PHASH_W})) AS c) c
    ),
    pooled AS (
      SELECT doc, r // 2 AS i, c // 2 AS j,
             (2*SUM(luma) + COUNT(*)) // (2*COUNT(*)) AS p
      FROM px GROUP BY doc, r // 2, c // 2
    ),
    coef AS (
      SELECT p.doc, tu.u, tv.u AS v,
             SUM(tu.v * p.p * tv.v)::BIGINT AS cf
      FROM pooled p
      JOIN t tu ON tu.x = p.i
      JOIN t tv ON tv.x = p.j
      GROUP BY p.doc, tu.u, tv.u
    ),
    ac AS (
      SELECT doc, u*8 + v - 1 AS k, cf FROM coef
      WHERE NOT (u = 0 AND v = 0)
    ),
    med AS (
      SELECT doc, cf AS m FROM (
        SELECT doc, cf,
               row_number() OVER (PARTITION BY doc ORDER BY cf) AS rn
        FROM ac) WHERE rn = 32
    ),
    hashes AS (
      SELECT ac.doc,
             SUM(CASE WHEN ac.cf > med.m THEN 1::BIGINT << ac.k
                      ELSE 0 END)::BIGINT AS h
      FROM ac JOIN med USING (doc) GROUP BY ac.doc
    ),
    chunks AS (
      SELECT doc, h, tbl,
             (h >> (tbl * 7)) & 127 AS chunk
      FROM hashes CROSS JOIN (SELECT unnest(range(9)) AS tbl) t9
    )
    SELECT DISTINCT a.doc AS a_id, b.doc AS b_id,
           bit_count(xor(a.h, b.h))::INTEGER AS hamming
    FROM chunks a JOIN chunks b
      ON a.tbl = b.tbl AND a.chunk = b.chunk AND a.doc < b.doc
    WHERE bit_count(xor(a.h, b.h)) <= 8
    ORDER BY a_id, b_id
    """


@_register("phash_near_dup_pairs", _phash_near_dup_oracle())
def phash_near_dup_pairs_q(spark, sf_dir):
    """Image near-dup detection end-to-end under the driver gate:
    every documents row becomes a formula-generated 16x16 PNG (doc
    pairs (2m, 2m+1) are a base image and its one-pixel perturbation
    — planted near-dups), decoded and pHashed executor-side
    (operators/phash.py: integer luma -> round-half-up 8x8 pool ->
    literal-int-cosine-table DCT -> median sign bits, 63-bit
    fingerprint), then banded 9x7 bits with the simhash pigeonhole
    join (recall guaranteed to hamming 8). The oracle recomputes the
    ENTIRE pipeline in SQL — hashes, banding candidate set, hamming —
    from the pixel formula and the same literal table: no pins, and
    any engine divergence in any stage hash-mismatches."""
    import pandas as pd

    from exporter_spark.operators import phash as phash_mod

    # single-partition scan guard, same rationale as gif_decode_stats:
    # per-doc PNG encode + decode + integer DCT otherwise serialize on
    # one core. Pass-through at scale.
    d = spread(
        load_table(spark, sf_dir, "documents").select("doc_id"), "doc_id"
    )

    def encode(batches):
        from exporter_spark.operators.multimodal import encode_png

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["doc_id"],
                    "payload": [
                        encode_png(_phash_fixture_pixels(int(i)))
                        for i in pdf["doc_id"]
                    ],
                    "meta": [None] * len(pdf),
                }
            )

    media = d.mapInPandas(encode, multimodal.media_schema())
    return (
        phash_mod.phash_near_dup_pairs(
            media, max_hamming=8, num_tables=9
        )
        .orderBy("a_id", "b_id")
    )
