"""Golden tests for the exact (even-odd rasterized) polygon union —
VERDICT r6 item 4: two OVERLAPPING rings must not double-count their
shared interior, in either the relational union measure
(rasterized_union_cells) or the raster clip kernel's union mask."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

# two axis-aligned squares: [0,2]² and [1,3]² — 4 cells each on the
# unit lattice, 1 shared cell, union 7
SQ_A = [(0.0, 0.0), (2.0, 0.0), (2.0, 2.0), (0.0, 2.0), (0.0, 0.0)]
SQ_B = [(1.0, 1.0), (3.0, 1.0), (3.0, 3.0), (1.0, 3.0), (1.0, 1.0)]


def test_rasterized_union_counts_overlap_once(spark):
    from lake_satellite_image_etl_spark.operators.geometry import (
        rasterized_union_cells,
    )

    body = spark.createDataFrame(
        [(1, [[list(p) for p in SQ_A], [list(p) for p in SQ_B]], 2)],
        "body_id long, rs array<array<array<double>>>, n_polygons long",
    )
    row = rasterized_union_cells(body, grid_n=4).collect()[0]
    assert row.union_cells == 7
    assert row.member_cells == 8
    assert row.overlap_cells == 1


def test_union_bbox_shoelace_double_counts_the_same_overlap(spark):
    """The companion bbox/shoelace aggregate is overlap-naive BY
    DESIGN — pin the divergence the exact form closes: shoelace sums
    4 + 4 = 8 where the true union measure is 7."""
    from lake_satellite_image_etl_spark.operators.geometry import (
        shoelace_area,
    )

    rings = spark.createDataFrame(
        [(1, [list(p) for p in SQ_A]), (1, [list(p) for p in SQ_B])],
        "body_id long, ring array<array<double>>",
    )
    total = rings.select(
        shoelace_area(F.col("ring")).alias("a")
    ).agg(F.sum("a")).collect()[0][0]
    assert total == 8.0


def test_clip_union_mask_two_overlapping_rings(spark):
    """Multi-ring clip: pixels inside EITHER ring survive once;
    pixels in neither become nodata. 4×4 single-band image of 7s."""
    from lake_satellite_image_etl_spark.multimodal.raster import (
        NODATA,
        clip_to_polygon,
    )

    w = h = 4
    img = np.full((1, h, w), 7, dtype=np.uint8)
    stacked = spark.createDataFrame(
        [(1, w, h, 1, bytearray(img.tobytes()))],
        "entity_id long, width int, height int, bands int, data binary",
    )
    clipped = clip_to_polygon(stacked, lambda eid: [SQ_A, SQ_B]).collect()[0]
    out = np.frombuffer(clipped.data, dtype=np.uint8).reshape(
        clipped.bands, clipped.height, clipped.width
    )
    # crop = bbox of the ring SET: [0,3]×[0,3] → 4×4 kept
    assert (clipped.width, clipped.height) == (4, 4)
    kept = (out[0] != NODATA).sum()
    assert kept == 7, f"union mask kept {kept} pixels, want 7"
    # the shared cell (1,1) survives (once) and the far corners don't
    assert out[0, 1, 1] == 7
    assert out[0, 3, 0] == NODATA and out[0, 0, 3] == NODATA


def test_clip_single_ring_backcompat(spark):
    """A bare single ring (the pre-r7 polygon_of contract) still
    works unchanged."""
    from lake_satellite_image_etl_spark.multimodal.raster import (
        NODATA,
        clip_to_polygon,
    )

    w = h = 4
    img = np.full((1, h, w), 9, dtype=np.uint8)
    stacked = spark.createDataFrame(
        [(1, w, h, 1, bytearray(img.tobytes()))],
        "entity_id long, width int, height int, bands int, data binary",
    )
    clipped = clip_to_polygon(stacked, lambda eid: SQ_A).collect()[0]
    out = np.frombuffer(clipped.data, dtype=np.uint8).reshape(
        clipped.bands, clipped.height, clipped.width
    )
    assert (out[0] != NODATA).sum() == 4


def _png_decode(png: bytes):
    """Minimal chunk-walking PNG reader (test-local): returns
    (w, h, color_type, raw pixel array channel-last) and verifies
    signature + every chunk CRC."""
    import struct
    import zlib

    assert png[:8] == b"\x89PNG\r\n\x1a\n"
    pos, idat, ihdr = 8, b"", None
    while pos < len(png):
        (ln,) = struct.unpack(">I", png[pos : pos + 4])
        tag = png[pos + 4 : pos + 8]
        data = png[pos + 8 : pos + 8 + ln]
        (crc,) = struct.unpack(">I", png[pos + 8 + ln : pos + 12 + ln])
        assert crc == zlib.crc32(tag + data), f"bad CRC on {tag}"
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif tag == b"IDAT":
            idat += data
        pos += 12 + ln
    w, h, depth, color_type, comp, filt, interlace = ihdr
    assert (depth, comp, filt, interlace) == (8, 0, 0, 0)
    nch = {0: 1, 4: 2, 2: 3, 6: 4}[color_type]
    raw = zlib.decompress(idat)
    rows = np.frombuffer(raw, dtype=np.uint8).reshape(h, 1 + w * nch)
    assert (rows[:, 0] == 0).all(), "non-None scanline filter"
    return w, h, color_type, rows[:, 1:].reshape(h, w, nch)


def _ref_keys_cubic(x: float, a: float = -0.5) -> float:
    ax = abs(x)
    if ax < 1.0:
        return ((a + 2.0) * ax - (a + 3.0)) * ax * ax + 1.0
    if ax < 2.0:
        return (((ax - 5.0) * ax + 8.0) * ax - 4.0) * a
    return 0.0


def _ref_bicubic(img: np.ndarray, tw: int, th: int) -> np.ndarray:
    """Independent scalar transcription of PIL's antialiased BICUBIC
    convolution resize (Keys a=-0.5, kernel stretched by the scale
    factor when downsampling, taps at pixel centers, rows normalized,
    half-up rounding) — double loops, no shared code with the
    vectorized engine kernel it checks."""

    def axis(in_size: int, out_size: int) -> np.ndarray:
        scale = in_size / out_size
        fs = max(scale, 1.0)
        support = 2.0 * fs
        m = np.zeros((out_size, in_size))
        for i in range(out_size):
            center = (i + 0.5) * scale
            lo = max(int(center - support + 0.5), 0)
            hi = min(int(center + support + 0.5), in_size)
            for j in range(lo, hi):
                m[i, j] = _ref_keys_cubic(((j + 0.5) - center) / fs)
            m[i] /= m[i].sum()
        return m

    nb, h, w = img.shape
    wx, wy = axis(w, tw), axis(h, th)
    out = np.empty((nb, th, tw))
    for b in range(nb):
        out[b] = wy @ (img[b].astype(np.float64) @ wx.T)
    return np.clip(np.floor(out + 0.5), 0, 255).astype(np.uint8)


def test_bicubic_weights_hand_computed():
    """Golden literals for the first row of the 4→2 downsample weight
    matrix (scale 2 ⇒ filterscale 2, taps at x = -0.25, 0.25, 0.75,
    1.25): k(0.25)=0.8671875, k(0.75)=0.2265625, k(1.25)=-0.0703125,
    row sum 1.890625 before normalization — and the same-size resize
    must be the identity (Keys kernel is 1 at 0, 0 at ±1, ±2)."""
    from lake_satellite_image_etl_spark.multimodal.raster import (
        bicubic_weights,
    )

    row0 = bicubic_weights(4, 2)[0]
    s = 1.890625
    expect = np.array(
        [0.8671875 / s, 0.8671875 / s, 0.2265625 / s, -0.0703125 / s]
    )
    assert np.allclose(row0, expect, atol=1e-12)
    assert np.allclose(bicubic_weights(5, 5), np.eye(5), atol=1e-12)


def test_thumbnail_emits_valid_png(spark):
    """U6 golden (VERDICT r6 item 5 + r7 item 7): thumbnail blobs
    parse as valid PNG (signature, CRCs, dims) and the pixels match an
    independent scalar bicubic reference exactly (uint8 after half-up
    rounding)."""
    from lake_satellite_image_etl_spark.multimodal.raster import thumbnail

    w, h, nb = 21, 14, 3
    rng = np.random.RandomState(7)
    img = rng.randint(0, 256, size=(nb, h, w), dtype=np.uint8)
    stacked = spark.createDataFrame(
        [(5, w, h, nb, bytearray(img.tobytes()))],
        "entity_id long, width int, height int, bands int, data binary",
    )
    row = thumbnail(stacked).collect()[0]
    assert (row.thumb_width, row.thumb_height) == (3, 2)
    pw, ph, color_type, px = _png_decode(bytes(row.thumb))
    assert (pw, ph, color_type) == (3, 2, 2)  # RGB
    expect = _ref_bicubic(img, 3, 2).transpose(1, 2, 0)
    assert (px == expect).all()


def test_png_encode_grayscale_roundtrip():
    from lake_satellite_image_etl_spark.multimodal.raster import png_encode

    arr = np.arange(12, dtype=np.uint8).reshape(1, 3, 4)
    w, h, color_type, px = _png_decode(png_encode(arr))
    assert (w, h, color_type) == (4, 3, 0)
    assert (px[:, :, 0] == arr[0]).all()
