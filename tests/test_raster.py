"""Raster core tests: tile round-trip, COG write/read-back, ordered
multipart sink invariants (SURVEY.md §5.2 items 3-4)."""

from __future__ import annotations

import os

import numpy as np
import pytest

from pyspark.sql import functions as F

from ccog_spark.raster import tiff
from ccog_spark.raster.cog import write_cog
from ccog_spark.raster.fixtures import BANDS, BLOCK, H, W, pixels_df
from ccog_spark.raster.pyramid import build_pyramid, decimate, overview_count
from ccog_spark.raster.tiles import pixels_from_tiles, tiles_from_pixels
from ccog_spark.sinks.mpu import MIN_PART_SIZE, PartAssignment, pack_parts

NODATA = -9999.0


def fixture_array(spark, level=0):
    """Collect the fixture (or a pyramid level) into numpy (band,y,x)
    value/valid arrays — the reference model for file comparisons."""
    px = pixels_df(spark)
    if level > 0:
        for _ in range(level):
            px = decimate(px, "average")
    rows = px.collect()
    h = max(r.y for r in rows) + 1
    w = max(r.x for r in rows) + 1
    val = np.full((BANDS, h, w), NODATA)
    ok = np.zeros((BANDS, h, w), dtype=bool)
    for r in rows:
        if r.valid:
            val[r.band - 1, r.y, r.x] = r.value
            ok[r.band - 1, r.y, r.x] = True
    return val, ok


def test_tiles_roundtrip(spark):
    px = pixels_df(spark)
    tiles = tiles_from_pixels(px, BLOCK, NODATA)
    back = pixels_from_tiles(tiles, BLOCK, NODATA)
    orig = {(r.band, r.y, r.x): (r.value, r.valid) for r in px.collect()}
    rt = {(r.band, r.y, r.x): (r.value, r.valid) for r in back.collect()}
    assert set(orig) == set(rt)
    for k, (v, ok) in orig.items():
        v2, ok2 = rt[k]
        assert ok == ok2, k
        if ok:
            assert v == v2, k


def test_overview_count_matches_reference_rule():
    # halve until max dim ≤ blocksize (ccog/ccog.py:56-100)
    assert overview_count(160, 96, 32) == 3
    assert overview_count(512, 512, 512) == 0
    assert overview_count(1024, 512, 512) == 1
    assert overview_count(2**20, 2**20, 512) == 11


def test_pack_parts_invariants():
    sizes = [1000] * 100
    parts = pack_parts(sizes, min_part=2500, max_part=6000)
    # contiguity + full coverage
    assert parts[0].first_seq == 0
    assert parts[-1].last_seq == 99
    for a, b in zip(parts, parts[1:]):
        assert b.first_seq == a.last_seq + 1
    # every part except last within [min, max]
    for p in parts[:-1]:
        assert 2500 <= p.nbytes <= 6000
    assert parts[-1].nbytes <= 6000
    # part numbers are 1-based consecutive (S3 contract)
    assert [p.part_no for p in parts] == list(range(1, len(parts) + 1))


def test_pack_parts_single_small_object():
    parts = pack_parts([100])
    assert len(parts) == 1 and parts[0].nbytes == 100


def test_pack_parts_part_cap():
    with pytest.raises(ValueError):
        pack_parts([MIN_PART_SIZE] * 5, max_parts=2)


def test_pack_parts_overflow_never_strands_small_part():
    """A max_part-forced close used to emit a non-final part below
    min_part (S3 EntityTooSmall); the repair pass must merge it away."""
    # 1000 accumulates, then 5000 would overflow max_part=5500 → the
    # greedy close strands a 1000-byte part; repair merges backward.
    parts = pack_parts([3000, 1000, 5000, 3000], min_part=2500, max_part=5500)
    for p in parts[:-1]:
        assert p.nbytes >= 2500, parts
    assert parts[0].first_seq == 0 and parts[-1].last_seq == 3
    for a, b in zip(parts, parts[1:]):
        assert b.first_seq == a.last_seq + 1
    assert [p.part_no for p in parts] == list(range(1, len(parts) + 1))
    # impossible case: tiny lead segment, two max-size neighbours
    with pytest.raises(ValueError, match="cannot meet min_part"):
        pack_parts([100, 5500, 5500], min_part=2500, max_part=5500)


def test_resolve_store_paths(tmp_path):
    from ccog_spark.sinks.mpu import LocalMpu, S3Mpu, resolve_store

    assert isinstance(resolve_store(str(tmp_path / "x.tif")), LocalMpu)
    s3 = resolve_store("s3://bucket/some/key.tif")
    assert isinstance(s3, S3Mpu)
    assert s3.bucket == "bucket" and s3.key == "some/key.tif"
    with pytest.raises(ValueError, match="malformed"):
        resolve_store("s3://bucketonly")


def test_resolve_store_storage_options(tmp_path):
    """fsspec/s3fs-style storage_options reach the boto3 client:
    endpoint/credentials/region configured without code changes (the
    minio/moto path); local paths ignore them like the reference
    ignores storage_options for mapping stores."""
    from ccog_spark.sinks.mpu import LocalMpu, _boto3_kwargs, resolve_store

    so = {
        "key": "AK",
        "secret": "SK",
        "client_kwargs": {
            "endpoint_url": "http://localhost:9000",
            "region_name": "us-west-2",
        },
    }
    s3 = resolve_store("s3://b/k.tif", so)
    assert s3.client.meta.endpoint_url == "http://localhost:9000"
    assert s3.client.meta.region_name == "us-west-2"
    assert s3.storage_options == so
    kw = _boto3_kwargs({"endpoint_url": "http://m:9", "anon": True})
    assert kw["endpoint_url"] == "http://m:9" and "config" in kw
    assert isinstance(resolve_store(str(tmp_path / "y.tif"), so), LocalMpu)


@pytest.fixture(scope="module")
def written_cog(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("cog") / "fixture.tif")
    res = write_cog(
        spark,
        pixels_df(spark),
        width=W,
        height=H,
        bands=BANDS,
        target_path=out,
        blocksize=BLOCK,
        kernel="average",
        nodata=NODATA,
    )
    with open(res.path, "rb") as f:
        data = f.read()
    return res, data


def test_cog_structure(written_cog):
    res, data = written_cog
    assert len(data) == res.plan.total_size
    ifds = tiff.read_cog(data)
    assert len(ifds) == 4  # level 0 + 3 overviews
    assert ifds[0].width == W and ifds[0].height == H
    assert ifds[0].subfile_type == 0
    assert all(i.subfile_type == 1 for i in ifds[1:])
    assert ifds[1].width == 80 and ifds[1].height == 48
    assert ifds[3].width == 20 and ifds[3].height == 12
    assert all(i.compression == 8 for i in ifds)
    assert all(i.nodata == NODATA for i in ifds)
    # sparse tiles exist (one full block invalid per band at level 0)
    assert res.n_tiles_sparse >= BANDS
    # non-sparse offsets strictly increase in file order; overview data
    # precedes level-0 data (ccog file order, ccog/ccog.py:661-666)
    lvl0 = [o for o in ifds[0].offsets if o > 0]
    assert lvl0 == sorted(lvl0)
    top = [o for o in ifds[3].offsets if o > 0]
    assert max(top) < min(lvl0)
    for ifd in ifds:
        nz = [o for o in ifd.offsets if o > 0]
        assert nz == sorted(nz)
        assert all(o >= res.plan.data_start for o in nz)


def test_cog_pixel_roundtrip_level0(spark, written_cog):
    _, data = written_cog
    ifds = tiff.read_cog(data)
    val, ok = fixture_array(spark, level=0)
    for b in range(BANDS):
        got = tiff.read_band(data, ifds[0], b)
        # valid pixels identical; invalid pixels hold nodata
        assert np.array_equal(got[ok[b]], val[b][ok[b]])
        assert np.all(got[~ok[b]] == NODATA)


def test_cog_pixel_roundtrip_overview(spark, written_cog):
    _, data = written_cog
    ifds = tiff.read_cog(data)
    val, ok = fixture_array(spark, level=2)
    for b in range(BANDS):
        got = tiff.read_band(data, ifds[2], b)
        assert got.shape == (24, 40)
        assert np.allclose(got[ok[b]], val[b][ok[b]], rtol=0, atol=0)
        assert np.all(got[~ok[b]] == NODATA)


@pytest.mark.slow
def test_cog_multipart_write(spark, tmp_path):
    """Force multiple parts with a tiny min_part; byte-identical result."""
    out1 = str(tmp_path / "single.tif")
    out2 = str(tmp_path / "multi.tif")
    px = pixels_df(spark)
    write_cog(spark, px, W, H, BANDS, out1, blocksize=BLOCK, nodata=NODATA)
    res2 = write_cog(
        spark, px, W, H, BANDS, out2, blocksize=BLOCK, nodata=NODATA,
        min_part_size=16 * 1024,
    )
    assert res2.n_parts > 1
    with open(out1, "rb") as f1, open(out2, "rb") as f2:
        assert f1.read() == f2.read()
    assert not os.path.exists(out2 + ".mpu")  # staging cleaned up


def test_bigtiff_roundtrip(spark, tmp_path):
    """BigTIFF (>4 GiB path): same layout, 8-byte offsets; pixel content
    identical to the classic file."""
    out_c = str(tmp_path / "classic.tif")
    out_b = str(tmp_path / "big.tif")
    px = pixels_df(spark)
    write_cog(spark, px, W, H, BANDS, out_c, blocksize=BLOCK, nodata=NODATA,
              fmt="classic")
    write_cog(spark, px, W, H, BANDS, out_b, blocksize=BLOCK, nodata=NODATA,
              fmt="bigtiff")
    with open(out_c, "rb") as f:
        dc = f.read()
    with open(out_b, "rb") as f:
        db = f.read()
    assert dc[2] == 42 and db[2] == 43
    ic, ib = tiff.read_cog(dc), tiff.read_cog(db)
    assert len(ic) == len(ib) == 4
    for lvl in range(4):
        assert (ib[lvl].width, ib[lvl].height) == (ic[lvl].width, ic[lvl].height)
        for b in range(BANDS):
            assert np.array_equal(
                tiff.read_band(db, ib[lvl], b), tiff.read_band(dc, ic[lvl], b)
            )


def test_larger_raster_ingest_write_read(spark, tmp_path):
    """Moderate-scale sanity: 1024x768x2 synthetic raster through
    ingest -> pyramid -> multipart COG -> parse -> sampled pixel check
    (catches grid/packing bugs that the small fixture can't)."""
    from ccog_spark.raster.tiles import pixels_from_tiles
    from ccog_spark.sources.raster_ingest import ingest_numpy

    rng = np.random.default_rng(123)
    arr = np.round(rng.random((2, 768, 1024)) * 100, 2)
    mask = rng.random((768, 1024)) > 0.05
    bs = 256
    tiles = ingest_numpy(spark, arr, mask, blocksize=bs, nodata=NODATA)
    px = pixels_from_tiles(tiles, bs, NODATA).drop("level").withColumn(
        "band", F.col("band") + 1
    )
    out = str(tmp_path / "big_raster.tif")
    res = write_cog(
        spark, px, 1024, 768, 2, out, blocksize=bs, nodata=NODATA,
        min_part_size=1024 * 1024,
    )
    assert res.n_parts > 1
    with open(out, "rb") as f:
        data = f.read()
    ifds = tiff.read_cog(data)
    # overview_count(1024, 768, 256) == 2 → 3 IFDs
    assert len(ifds) == 3
    assert (ifds[0].width, ifds[0].height) == (1024, 768)
    for b in range(2):
        got = tiff.read_band(data, ifds[0], b)
        expect = np.where(mask, arr[b], NODATA)
        assert np.array_equal(got, expect)


def test_mpu_failure_propagates(tmp_path):
    """Unlike the reference's complete_mpu (bare except -> abort result
    returned as success, aws_tools.py:168-175), a bad part set must
    RAISE, clean staging, and leave no target."""
    from ccog_spark.sinks.mpu import LocalMpu

    target = str(tmp_path / "obj.bin")
    store = LocalMpu(target)
    staging = store.create()
    r1 = LocalMpu.upload_part(staging, 1, b"a" * 10)
    r3 = LocalMpu.upload_part(staging, 3, b"c" * 10)  # part 2 missing
    with pytest.raises(RuntimeError, match="missing"):
        store.complete([r1, r3])
    assert not os.path.exists(target)
    assert not os.path.exists(staging)


def test_collect_cog_bytes_matches_file(spark, tmp_path):
    from ccog_spark.raster.cog import collect_cog_bytes

    px = pixels_df(spark)
    data, plan = collect_cog_bytes(spark, px, W, H, BANDS, blocksize=BLOCK,
                                   nodata=NODATA)
    out = str(tmp_path / "f.tif")
    write_cog(spark, px, W, H, BANDS, out, blocksize=BLOCK, nodata=NODATA)
    with open(out, "rb") as f:
        assert f.read() == data


def test_cog_metadata_and_statistics(spark, tmp_path):
    """Band metadata + statistics folded into GDAL_METADATA (R4/R13/R14);
    stats values must equal the qr2-style aggregate."""
    out = str(tmp_path / "meta.tif")
    write_cog(
        spark, pixels_df(spark), W, H, BANDS, out, blocksize=BLOCK,
        nodata=NODATA, statistics=True,
        band_meta={0: {"description": "red", "scale": 2.0, "unit": "K"}},
    )
    with open(out, "rb") as f:
        data = f.read()
    ifds = tiff.read_cog(data)
    md = ifds[0].metadata
    assert md and "<GDALMetadata>" in md
    assert '<Item name="DESCRIPTION" sample="0">red</Item>' in md
    assert '<Item name="UNITTYPE" sample="0">K</Item>' in md
    assert md.count("STATISTICS_MAXIMUM") == BANDS
    # overview IFDs carry no metadata tag
    assert ifds[1].metadata is None
    # cross-check one stat value against a direct aggregate
    from ccog_spark.raster.queries import qr2

    stats = {r.band: r for r in qr2(spark, "").collect()}
    import re

    m = re.search(
        r'name="STATISTICS_MEAN" sample="0">([0-9.eE+-]+)<', md
    )
    assert m and abs(float(m.group(1)) - stats[1].stat_mean) < 1e-3


def test_overview_compress_level_changes_bytes(spark, tmp_path):
    """R9 parity: overview tiles may use different compression settings;
    level-0 bytes stay identical, overview bytecounts change."""
    o1, o2 = str(tmp_path / "a.tif"), str(tmp_path / "b.tif")
    px = pixels_df(spark)
    write_cog(spark, px, W, H, BANDS, o1, blocksize=BLOCK, nodata=NODATA)
    write_cog(spark, px, W, H, BANDS, o2, blocksize=BLOCK, nodata=NODATA,
              overview_compress_level=1)
    i1 = tiff.read_cog(open(o1, "rb").read())
    i2 = tiff.read_cog(open(o2, "rb").read())
    assert i1[0].bytecounts == i2[0].bytecounts
    assert i1[1].bytecounts != i2[1].bytecounts


def test_write_ccog_reference_shaped_api(spark, tmp_path):
    """The reference-signature entry point: numpy + mask in, valid COG
    out; validation errors mirror ccog's client-side checks."""
    from ccog_spark.raster.cog import write_ccog

    rng = np.random.default_rng(5)
    arr = np.round(rng.random((96, 160)) * 10, 3)  # 2-D → promoted
    mask = rng.random((96, 160)) > 0.1
    out = str(tmp_path / "ref_api.tif")
    res = write_ccog(spark, arr, out, mask=mask, blocksize=32)
    data = open(out, "rb").read()
    ifds = tiff.read_cog(data)
    assert ifds[0].bands == 1 and ifds[0].width == 160
    got = tiff.read_band(data, ifds[0], 0)
    assert np.array_equal(got[mask], arr[mask])

    with pytest.raises(ValueError, match="multiple of 16"):
        write_ccog(spark, arr, out, blocksize=30)
    with pytest.raises(ValueError, match="unknown resampling"):
        write_ccog(spark, arr, out, blocksize=32, overview_resampling="nope")
    with pytest.raises(ValueError, match="mask shape"):
        write_ccog(spark, arr, out, mask=mask[:50], blocksize=32)


def test_lzma_codec_roundtrip(spark, tmp_path):
    """LZMA tile codec (TIFF tag 34925): identical pixels, different
    compression tag; reader dispatches on the tag."""
    out = str(tmp_path / "lzma.tif")
    px = pixels_df(spark)
    write_cog(spark, px, W, H, BANDS, out, blocksize=BLOCK, nodata=NODATA,
              codec="lzma")
    data = open(out, "rb").read()
    ifds = tiff.read_cog(data)
    assert all(i.compression == 34925 for i in ifds)
    val, ok = fixture_array(spark, level=0)
    for b in range(BANDS):
        got = tiff.read_band(data, ifds[0], b)
        assert np.array_equal(got[ok[b]], val[b][ok[b]])


def test_packbits_codec_roundtrip(spark, tmp_path):
    """PackBits tile codec (TIFF 6.0 §9, tag 32773, round 8): identical
    pixels through the full write→parse→read path, incl. predictor 2
    (which composes with PackBits per spec)."""
    for pred, name in ((1, "pb1.tif"), (3, "pb3.tif")):
        out = str(tmp_path / name)
        write_cog(
            spark, pixels_df(spark), W, H, BANDS, out, blocksize=BLOCK,
            nodata=NODATA, codec="packbits", predictor=pred,
        )
        data = open(out, "rb").read()
        ifds = tiff.read_cog(data)
        assert all(i.compression == 32773 for i in ifds)
        assert all(i.predictor == pred for i in ifds)
        val, ok = fixture_array(spark, level=0)
        for b in range(BANDS):
            got = tiff.read_band(data, ifds[0], b)
            assert np.array_equal(got[ok[b]], val[b][ok[b]])


def test_geotiff_georeferencing(spark, tmp_path):
    """GeoTIFF tags (ModelPixelScale, ModelTiepoint, GeoKeyDirectory):
    CRS + affine transform survive the write/read round-trip."""
    out = str(tmp_path / "geo.tif")
    geo = {"origin": (149.0, -35.0), "px_size": (0.001, 0.001), "epsg": 4326}
    write_cog(spark, pixels_df(spark), W, H, BANDS, out, blocksize=BLOCK,
              nodata=NODATA, geo=geo)
    data = open(out, "rb").read()
    ifds = tiff.read_cog(data)
    assert ifds[0].pixel_scale == [0.001, 0.001, 0.0]
    assert ifds[0].tiepoint == [0.0, 0.0, 0.0, 149.0, -35.0, 0.0]
    assert ifds[0].epsg == 4326
    assert ifds[1].epsg is None  # overviews inherit (GDAL convention)
    # projected CRS path
    out2 = str(tmp_path / "geo_proj.tif")
    write_cog(spark, pixels_df(spark), W, H, BANDS, out2, blocksize=BLOCK,
              nodata=NODATA, geo={"origin": (0, 0), "px_size": (10, 10),
                                  "epsg": 32755})
    i2 = tiff.read_cog(open(out2, "rb").read())
    assert i2[0].epsg == 32755
    # pixels unaffected by geo tags
    val, ok = fixture_array(spark, level=0)
    got = tiff.read_band(data, ifds[0], 0)
    assert np.array_equal(got[ok[0]], val[0][ok[0]])


class _FakeDataArray:
    """Duck-typed xarray.DataArray stand-in (xarray is not installed in
    the container): .values/.dims/.attrs/.coords, CF-convention attrs,
    1-D cell-center coordinates."""

    def __init__(self, values, attrs=None, coords=None):
        self.values = values
        self.attrs = attrs or {}
        self.coords = coords or {}
        self.dims = ("band", "y", "x")[-values.ndim:]


@pytest.mark.slow
def test_write_ccog_xarray_metadata_inference(spark, tmp_path):
    """xarray-like ingestion infers nodata from _FillValue, EPSG from a
    crs attr, and the transform from x/y center coordinates (origin =
    first center minus half a pixel) — reference precedence semantics
    (ccog/ccog.py:921-927)."""
    from ccog_spark.raster.cog import write_ccog

    rng = np.random.default_rng(11)
    vals = np.round(rng.random((64, 64)) * 10, 3)
    xs = 100.0 + 0.5 * np.arange(64) + 0.25   # px 0.5, origin x 100.0
    ys = 500.0 - 1.0 * np.arange(64) - 0.5    # px -1.0, origin y 500.0
    fake = _FakeDataArray(
        vals,
        attrs={"_FillValue": -5.0, "crs": "EPSG:32633"},
        coords={"x": xs, "y": ys},
    )
    out = str(tmp_path / "xr.tif")
    write_ccog(spark, fake, out, blocksize=32)
    ifd0 = tiff.read_cog(open(out, "rb").read())[0]
    assert ifd0.nodata == -5.0
    assert ifd0.epsg == 32633
    assert ifd0.pixel_scale[:2] == [0.5, -1.0]
    assert ifd0.tiepoint[3:5] == [100.0, 500.0]

    # user-supplied values take precedence over inferred ones
    out2 = str(tmp_path / "xr_override.tif")
    write_ccog(
        spark, fake, out2, blocksize=32, nodata=-7.0,
        geo={"origin": (0.0, 1.0), "px_size": (2.0, -2.0), "epsg": 4326},
    )
    ifd0 = tiff.read_cog(open(out2, "rb").read())[0]
    assert ifd0.nodata == -7.0
    assert ifd0.epsg == 4326
    assert ifd0.pixel_scale[:2] == [2.0, -2.0]

    # nothing inferable + no user value -> -9999.0 fallback (numpy path)
    out3 = str(tmp_path / "xr_plain.tif")
    write_ccog(spark, _FakeDataArray(vals), out3, blocksize=32)
    ifd0 = tiff.read_cog(open(out3, "rb").read())[0]
    assert ifd0.nodata == -9999.0 and ifd0.epsg is None


def test_palette_colormap_roundtrip(spark, tmp_path):
    """Round-10 (R4 gap / r8 task 4): single-band uint8 palette COG —
    write_ccog(colormap=..., band_meta colorinterp) must produce a
    PhotometricInterpretation=3 file whose ColorMap (tag 320, 16-bit
    ×257 scaling, shared across data IFDs) reads back IDENTICAL via
    tiff.read_cog, with pixels intact and the GDAL_METADATA carrying
    GDAL's role="colorinterp" COLORINTERP item (≙ reference
    write_colormap/colorinterp profile keys, ccog/ccog.py:229-235)."""
    from ccog_spark.raster.cog import write_ccog

    rng = np.random.RandomState(3)
    arr = rng.randint(0, 5, (48, 64), dtype=np.uint8)
    cmap = {
        0: (0, 0, 0),
        1: (255, 0, 0),
        2: (0, 255, 0),
        3: (0, 0, 255),
        4: (255, 255, 255),
    }
    out = str(tmp_path / "palette.tif")
    write_ccog(
        spark,
        arr,
        out,
        blocksize=32,
        nodata=255.0,  # outside the palette's used index range
        colormap=cmap,
        band_meta={0: {"colorinterp": "Palette"}},
    )
    data = open(out, "rb").read()
    ifds = tiff.read_cog(data)
    assert all(i.photometric == 3 for i in ifds)
    # identical color table on EVERY page — INCLUDING the explicit
    # black entry at index 0 (r11: the writer's 16-bit red=1 sentinel
    # distinguishes it from the tag's unwritten all-zero fill, so the
    # parser no longer drops legitimately-black entries)
    for ifd in ifds:
        assert ifd.colormap == cmap
    # pixels intact (palette indices are ordinary uint8 samples)
    got = tiff.read_band(data, ifds[0], 0)
    assert np.array_equal(got, arr)
    # reference-matching GDAL_METADATA item
    assert (
        '<Item name="COLORINTERP" sample="0" role="colorinterp">'
        "Palette</Item>" in ifds[0].metadata
    )


def test_colormap_validation(spark, tmp_path):
    """Palette misuse fails BEFORE the distributed jobs: multi-band,
    non-integer dtype, out-of-range entries; and photometric=3 without
    a colormap is rejected at the plan layer."""
    from ccog_spark.raster.cog import write_ccog

    arr3 = np.zeros((3, 32, 32), dtype=np.uint8)
    with pytest.raises(ValueError, match="single band"):
        write_ccog(spark, arr3, str(tmp_path / "x.tif"), blocksize=32,
                   nodata=255.0, colormap={0: (1, 2, 3)})
    arrf = np.zeros((32, 32), dtype=np.float64)
    with pytest.raises(ValueError, match="uint8/uint16"):
        write_ccog(spark, arrf, str(tmp_path / "x.tif"), blocksize=32,
                   colormap={0: (1, 2, 3)})
    with pytest.raises(ValueError, match="out of range"):
        tiff.build_cog_plan(32, 32, 1, 32, 0, {(0, 0, 0, 0): 10},
                            nodata=None, dtype="uint8",
                            colormap={256: (1, 2, 3)})
    with pytest.raises(ValueError, match="requires a colormap"):
        tiff.build_cog_plan(32, 32, 1, 32, 0, {(0, 0, 0, 0): 10},
                            nodata=None, dtype="uint8", photometric=3)
