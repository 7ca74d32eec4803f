"""Tests for polymorphic source resolution (catalog) and the
multimodal binary-column plumbing (schema, Arrow batching, stub
decode)."""

import os

import pytest
from pyspark.sql import functions as F

from duckdb_pipeline_spark.catalog import looks_like_path, register, resolve
from duckdb_pipeline_spark.operators.multimodal import (
    FEATURE_SCHEMA,
    documents_as_media,
    extract_features,
)


def test_looks_like_path_heuristics():
    assert looks_like_path("/lake/silver/x.parquet")
    assert looks_like_path("s3a://bucket/key")
    assert looks_like_path("bronze/2024-10-01/00/*")
    assert looks_like_path("events.csv")
    assert not looks_like_path("gharchive_clean")


def test_resolve_table_name_and_paths(spark, sf_dir, tmp_path):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    register(docs, "docs_view")
    assert resolve(spark, "docs_view").count() == docs.count()
    assert resolve(spark, f"{sf_dir}/documents.parquet").count() == docs.count()

    csv_dir = str(tmp_path / "csv")
    docs.select("doc_id", "lang").write.option("header", "true").csv(csv_dir)
    assert resolve(spark, f"{csv_dir}/*.csv").count() == docs.count()


def test_media_meta_is_jvm_side_and_checksummed(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(20)
    media = documents_as_media(docs)
    rows = media.select("media_id", "meta.n_bytes", "meta.checksum").collect()
    assert len(rows) == 20
    assert all(r.n_bytes > 0 and len(r.checksum) == 64 for r in rows)


def test_extract_features_stub_deterministic(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(50)
    feats = extract_features(documents_as_media(docs))
    assert feats.schema == FEATURE_SCHEMA
    a = {r.media_id: r.feat_mean for r in feats.collect()}
    b = {r.media_id: r.feat_mean for r in feats.collect()}
    assert a == b and len(a) == 50
    assert all(0.0 <= v <= 255.0 for v in a.values())


def test_real_decode_end_to_end(spark, sf_dir):
    """Distributed REAL decode: synthesize genuine BMP/WAV payloads from
    documents, push them through the binary column + mapInPandas decode,
    and verify the features against single-process reference decodes."""
    import numpy as np

    from duckdb_pipeline_spark.operators.multimodal import (
        decode_payload,
        synthesize_media,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(40)
    media = synthesize_media(docs)
    feats = extract_features(media, decode_stub=False)
    assert feats.schema == FEATURE_SCHEMA
    rows = {r.media_id: r for r in feats.collect()}
    assert len(rows) == 40
    # spot-verify against a driver-side reference decode of the same payloads
    for m in media.limit(10).collect():
        ref_mean, ref_dim = decode_payload(m.media_type, bytes(m.payload))
        got = rows[m.media_id]
        assert got.feat_dim == ref_dim
        assert abs(got.feat_mean - ref_mean) < 1e-9
        assert got.media_type == ("image" if m.media_id % 2 == 0 else "audio")
    # image features are pixel means (0..255 over random pixels ~127);
    # audio features are scaled mean |amplitude| of a 0.5-sine (~0.318*0.5*255)
    img_means = [r.feat_mean for r in rows.values() if r.media_type == "image"]
    aud_means = [r.feat_mean for r in rows.values() if r.media_type == "audio"]
    assert img_means and aud_means
    assert all(100 < v < 155 for v in img_means)
    assert all(60 < v < 100 for v in aud_means)


def test_undecodable_format_raises(spark, sf_dir):
    """Formats whose codec lib isn't in the container fail loudly at the
    marked dispatch point, not silently."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(1)
    with pytest.raises(Exception, match="NotImplementedError|requires PIL"):
        # documents_as_media labels text bytes as 'image' but they are
        # not BMP — exactly the unsupported-format path
        extract_features(documents_as_media(docs), decode_stub=False).collect()


def test_orc_and_csv_sources_roundtrip_with_pushdown(spark, sf_dir, tmp_path):
    from duckdb_pipeline_spark.sources import read_csv, read_orc

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    orc_dir = str(tmp_path / "docs_orc")
    docs.write.orc(orc_dir)
    back = read_orc(spark, orc_dir)
    assert back.count() == docs.count()
    assert {f.name for f in back.schema.fields} == {f.name for f in docs.schema.fields}
    # filter pushdown reaches the ORC scan like parquet
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        back.where(F.col("doc_id") < 10).select("doc_id").explain("formatted")
    assert "PushedFilters" in buf.getvalue()

    csv_dir = str(tmp_path / "docs_csv")
    docs.select("doc_id", "lang").write.option("header", "true").csv(csv_dir)
    got = read_csv(spark, f"{csv_dir}/*.csv", schema="doc_id long, lang string")
    assert got.count() == docs.count()


def test_sample_frames_short_input_is_empty():
    import numpy as np

    from duckdb_pipeline_spark.operators.multimodal import sample_frames

    short = np.arange(399, dtype="float64")
    out = sample_frames(short, frame=400, hop=160)
    assert out.shape == (0, 400) and out.dtype == short.dtype
    exact = sample_frames(np.arange(400, dtype="float64"), frame=400, hop=160)
    assert exact.shape == (1, 400)


def test_ahash_brightness_invariant_and_discriminative():
    import numpy as np

    from duckdb_pipeline_spark.operators.multimodal import (
        ahash_pixels,
        decode_bmp,
        encode_bmp,
        shift_brightness,  # noqa: F401 (query-path twin of the local shift)
    )

    rng = np.random.default_rng(7)
    img = rng.integers(0, 200, size=(12, 23, 3), dtype=np.uint8)  # headroom: no clip
    h0 = ahash_pixels(img)
    # brightness shift: same hash
    assert ahash_pixels(np.clip(img.astype(np.int16) + 8, 0, 255).astype(np.uint8)) == h0
    # BMP roundtrip: same hash
    assert ahash_pixels(decode_bmp(encode_bmp(img))) == h0
    # different content: different hash
    other = rng.integers(0, 200, size=(12, 23, 3), dtype=np.uint8)
    assert ahash_pixels(other) != h0


def test_phash_groups_pairs_every_image_with_its_shifted_copy(spark, sf_dir):
    from duckdb_pipeline_spark.queries.llmtext import multimodal_phash_groups

    rows = multimodal_phash_groups(spark, sf_dir).collect()
    n_images = spark.read.parquet(f"{sf_dir}/documents.parquet").where(
        "doc_id < 400 and doc_id % 2 = 0"
    ).count()
    # every original must land in a group with its brightness-shifted
    # copy; distinct contents may also collide into shared groups, so
    # the invariant is coverage, not group count
    assert sum(r.n_copies for r in rows) == 2 * n_images
    assert all(r.n_copies >= 2 for r in rows)


def test_reencoded_copies_differ_in_bytes_not_pixels(spark, sf_dir):
    import numpy as np

    from duckdb_pipeline_spark.operators.multimodal import (
        decode_bmp,
        reencode_images,
        synthesize_media,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").where(
        "doc_id < 20 and doc_id % 2 = 0"
    )
    media = synthesize_media(docs)
    orig = {r.media_id: bytes(r.payload) for r in media.collect()}
    redone = {r.media_id: bytes(r.payload) for r in reencode_images(media).collect()}
    assert orig.keys() == redone.keys() and len(orig) > 0
    for k in orig:
        assert orig[k] != redone[k]  # byte-different files
        assert np.array_equal(decode_bmp(orig[k]), decode_bmp(redone[k]))  # same pixels


def test_mm_fixture_stamp_and_dispatch(sf_dir, tmp_path, monkeypatch):
    """The fixture oracle's two load-bearing properties: (1) rebuild
    happens iff the source documents.parquet changes (the driver
    regenerates testdata between rounds — a stale fixture must be
    impossible); (2) the corpus_key dispatch scalar separates corpora
    with the SAME row count but different content (the driver's sf0.001
    and sf0.01 are exactly that pair)."""
    import pandas as pd

    from duckdb_pipeline_spark import fixtures_mm as fm

    monkeypatch.setattr(fm, "FIXTURE_DIR", str(tmp_path))
    monkeypatch.setattr(fm, "DECODE_FIXTURE", str(tmp_path / "dec.parquet"))
    monkeypatch.setattr(fm, "PHASH_FIXTURE", str(tmp_path / "ph.parquet"))
    monkeypatch.setattr(fm, "STAMP_FILE", str(tmp_path / "stamps.json"))

    fm.ensure_fixtures(sf_dir)
    m1 = os.path.getmtime(fm.DECODE_FIXTURE)
    fm.ensure_fixtures(sf_dir)  # unchanged source -> no rebuild
    assert os.path.getmtime(fm.DECODE_FIXTURE) == m1

    k1 = fm.corpus_key(fm._load_docs(sf_dir))
    other = "/root/testdata/sf0.01" if "0.001" in sf_dir else "/root/testdata/sf0.001"
    if os.path.exists(os.path.join(other, "documents.parquet")):
        k2 = fm.corpus_key(fm._load_docs(other))
        assert k1 != k2  # same row count, different content -> distinct keys
        fm.ensure_fixtures(other)
        fx = pd.read_parquet(fm.DECODE_FIXTURE)
        # both corpora coexist in one fixture file, partitioned by key
        assert set(fx["corpus_key"].unique()) == {k1, k2}


def test_wav_frame_stats_matches_direct_decode(spark, sf_dir):
    """The distributed frame-stats op must agree with a direct local
    decode of the same synthesized payloads (frame count formula and
    quantized energies), and sine payloads of amplitude 0.5 must land
    near mean|x| = 0.5 * 2/pi."""
    import numpy as np
    from pyspark.sql import functions as F

    from duckdb_pipeline_spark.operators.multimodal import (
        decode_wav,
        sample_frames,
        synth_payload,
        synthesize_media,
        wav_frame_stats,
    )
    from duckdb_pipeline_spark.queries.common import load

    docs = load(spark, sf_dir, "documents").where(
        (F.col("doc_id") < 50) & (F.col("doc_id") % 2 == 1)
    )
    got = {r.media_id: r for r in wav_frame_stats(synthesize_media(docs)).collect()}
    src = {int(r.doc_id): int(r.n_chars) for r in docs.select("doc_id", "n_chars").collect()}
    assert got and set(got) == set(src)
    for did, nchars in src.items():
        _, payload = synth_payload(did, nchars)
        samples, _ = decode_wav(payload)
        fr = sample_frames(samples, 400, 160)
        r = got[did]
        assert r.n_samples == len(samples)
        assert r.n_frames == fr.shape[0] == 1 + (len(samples) - 400) // 160
        assert r.energy_q == int(np.floor(np.abs(samples).mean() * 1e9))
        assert abs(r.energy_q / 1e9 - 0.5 * 2 / np.pi) < 0.02


def test_png_decode_hand_built_reference_bytes():
    """Pin the decoder against PNG files BUILT BY HAND here (struct +
    zlib, independent of encode_png): a Sub-filtered and a Paeth-
    filtered scanline with hand-computed expected pixels per the spec's
    filter definitions. A symmetric encoder/decoder bug (shared wrong
    convention) cannot pass this."""
    import struct
    import zlib

    import numpy as np

    from duckdb_pipeline_spark.operators.multimodal import _png_chunk, decode_png

    def build(w, h, raw):
        ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
        return (
            b"\x89PNG\r\n\x1a\n"
            + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(raw))
            + _png_chunk(b"IEND", b"")
        )

    # 2x1-pixel row, Sub filter: filtered bytes are deltas vs the pixel
    # 3 bytes left (0 beyond the edge): [10,20,30] then [+5,+6,+7]
    png = build(2, 1, bytes([1, 10, 20, 30, 5, 6, 7]))
    want = np.array([[[10, 20, 30], [15, 26, 37]]], dtype=np.uint8)
    assert (decode_png(png) == want).all()

    # 2x2, row 0 None = [[1,2,3],[4,5,6]]; row 1 Paeth: a=left, b=up,
    # c=upper-left. Pixel (1,0): a=c=0 -> predictor=b=[1,2,3], bytes
    # [9,9,9] -> [10,11,12]. Pixel (1,1): a=[10,11,12], b=[4,5,6],
    # c=[1,2,3]; p=a+b-c=[13,14,15]; pa=|p-a|=[3,3,3], pb=|p-b|=[9,9,9],
    # pc=[12,12,12] -> predictor=a -> bytes [1,1,1] -> [11,12,13]
    raw = bytes([0, 1, 2, 3, 4, 5, 6]) + bytes([4, 9, 9, 9, 1, 1, 1])
    png2 = build(2, 2, raw)
    want2 = np.array(
        [[[1, 2, 3], [4, 5, 6]], [[10, 11, 12], [11, 12, 13]]], dtype=np.uint8
    )
    assert (decode_png(png2) == want2).all()


def test_png_roundtrip_all_filters_and_dispatch():
    """encode_png -> decode_png is the identity for every filter type,
    and the payload dispatches through decode_payload as an image."""
    import numpy as np

    from duckdb_pipeline_spark.operators.multimodal import (
        decode_payload,
        decode_png,
        encode_png,
    )

    rng = np.random.default_rng(3)
    px = rng.integers(0, 256, size=(7, 13, 3), dtype=np.uint8)
    for ft in range(5):
        assert (decode_png(encode_png(px, filter_type=ft)) == px).all()
    mean, dim = decode_payload("image", encode_png(px, filter_type=4))
    assert dim == px.size
    assert abs(mean - px.mean()) < 1e-9


def test_gif_lzw_hand_built_reference_bytes():
    """Pin the LZW stream for data [0,1,1,0] at min_code_size=2,
    hand-derived from the GIF87a spec: CLEAR(4)@3b, 0@3b, 1@3b, 1@3b,
    then the decoder's table hits 8 on the FLUSH code's add, so the
    flush 0 and EOI(5) are read at 4 bits — the width-at-flush
    boundary that drove the decoder-model encoder design. LSB-first
    packing gives bytes 44 02 05."""
    from duckdb_pipeline_spark.operators.multimodal import (
        _lzw_decode,
        _lzw_encode,
    )

    data = bytes([0, 1, 1, 0])
    enc = _lzw_encode(data, 2)
    assert enc == bytes.fromhex("440205")
    assert _lzw_decode(enc, 2) == data


def test_gif_lzw_flush_on_power_of_two_boundary_regression():
    """Regression: fixture doc 161 (16-color, 325 px) made the
    decoder's final add land exactly on table size 256, widening EOI
    to 9 bits while an encoder-counter-driven width stayed at 8
    ('LZW stream truncated'). The decoder-model encoder must handle
    every such boundary."""
    import numpy as np

    from duckdb_pipeline_spark.operators.multimodal import (
        _lzw_decode,
        _lzw_encode,
    )

    rng = np.random.default_rng(161 + 11)
    rng.integers(0, 256, (16, 3), dtype=np.uint8)  # palette draw (stream position)
    data = rng.integers(0, 16, (13, 25), dtype=np.uint8).tobytes()
    assert _lzw_decode(_lzw_encode(data, 4), 4) == data


def test_gif_roundtrip_palettes_and_dispatch():
    """encode->decode is identity across palette sizes (every starting
    code width), including the >4096-entry reset path; decode_payload
    dispatches on the GIF magic."""
    import numpy as np

    from duckdb_pipeline_spark.operators.multimodal import (
        decode_gif,
        decode_payload,
        encode_gif,
    )

    rng = np.random.default_rng(3)
    for npal in (4, 8, 16, 64):
        pal = rng.integers(0, 256, size=(npal, 3), dtype=np.uint8)
        idx = rng.integers(0, npal, size=(37, 41), dtype=np.uint8)
        out = decode_gif(encode_gif(idx, pal))
        assert np.array_equal(out, pal[idx])
    # low-entropy 90x90 grows the dictionary past 4096 (reset path)
    pal = rng.integers(0, 256, size=(4, 3), dtype=np.uint8)
    idx = (np.arange(90 * 90).reshape(90, 90) % 3).astype(np.uint8)
    assert np.array_equal(decode_gif(encode_gif(idx, pal)), pal[idx])
    mean, dim = decode_payload("image", encode_gif(idx, pal))
    assert dim == 90 * 90 * 3
    assert abs(mean - float(pal[idx].mean())) < 1e-12


def test_gif_decode_skips_extension_blocks():
    """A GIF89a-style extension block (0x21 label + sub-blocks) before
    the image descriptor is skipped — decoders must tolerate metadata
    blocks they don't use."""
    import numpy as np

    from duckdb_pipeline_spark.operators.multimodal import (
        decode_gif,
        encode_gif,
    )

    rng = np.random.default_rng(5)
    pal = rng.integers(0, 256, size=(4, 3), dtype=np.uint8)
    idx = rng.integers(0, 4, size=(6, 7), dtype=np.uint8)
    payload = encode_gif(idx, pal)
    # splice a graphic-control-style extension after the color table
    head = 13 + 4 * 3
    ext = bytes([0x21, 0xF9, 4, 0, 0, 0, 0, 0])
    spliced = payload[:head] + ext + payload[head:]
    assert np.array_equal(decode_gif(spliced), pal[idx])
