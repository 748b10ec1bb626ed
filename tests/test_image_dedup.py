"""q162 image near-dup: the dHash kernel against closed-form facts, and
the banded pipeline against the synthesized dup-group ground truth."""

from __future__ import annotations

import numpy as np

from redix_stream_spark.llm.multimodal import (
    DHASH_GROUP,
    DHASH_HAMMING_MAX,
    _synth_image,
    decode_pixels,
    dhash60,
    png_encode,
)
from redix_stream_spark.registry import all_queries


def _ham(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


def test_dhash_stable_under_reencode():
    px = np.random.RandomState(7).randint(0, 256, (16, 16), dtype=np.uint8)
    h1 = dhash60(decode_pixels(png_encode(px)))
    h2 = dhash60(decode_pixels(png_encode(px.copy())))
    assert h1 == h2


def test_dhash_single_cell_edit_flips_at_most_two_bits():
    base = np.random.RandomState(3).randint(0, 256, (16, 16), dtype=np.uint8)
    h0 = dhash60(decode_pixels(png_encode(base)))
    ys = (np.arange(8) * 16) // 8
    xs = (np.arange(9) * 16) // 9
    for cell in (0, 17, 40, 71):
        edited = base.copy()
        edited[ys[cell // 9], xs[cell % 9]] ^= 128
        h1 = dhash60(decode_pixels(png_encode(edited)))
        assert _ham(h0, h1) <= 2


def test_dhash_distinct_bases_are_far():
    hashes = [
        dhash60(
            decode_pixels(
                png_encode(
                    np.random.RandomState(b).randint(0, 256, (16, 16), dtype=np.uint8)
                )
            )
        )
        for b in range(12)
    ]
    for i in range(len(hashes)):
        for j in range(i + 1, len(hashes)):
            assert _ham(hashes[i], hashes[j]) > DHASH_HAMMING_MAX


def test_synth_group_mates_within_threshold():
    for doc in range(24):
        h_doc = dhash60(decode_pixels(_synth_image(doc)))
        h_base = dhash60(decode_pixels(_synth_image((doc // DHASH_GROUP) * DHASH_GROUP)))
        assert _ham(h_doc, h_base) <= DHASH_HAMMING_MAX


def test_synth_corpus_mixes_real_png_and_jpeg():
    """Odd doc_ids are REAL baseline JPEG (our encoder), even are PNG —
    every dup group exercises both decode paths inside the banded join."""
    assert _synth_image(1)[:2] == b"\xff\xd8"
    assert _synth_image(2)[:8] == b"\x89PNG\r\n\x1a\n"


def test_jpeg_roundtrip_error_within_fixture_margin():
    """The all-ones-quant encoder's decode error must stay far inside the
    64-level comparison margin _synth_image's stability proof relies on."""
    from redix_stream_spark.llm.jpeg import decode_jpeg_pixels, jpeg_encode_gray

    rs = np.random.RandomState(11)
    worst = 0
    for _ in range(10):
        px = rs.randint(0, 256, (16, 16)).astype(np.uint8)
        dec = decode_jpeg_pixels(jpeg_encode_gray(px))
        worst = max(worst, int(np.abs(dec[:, :, 0].astype(int) - px).max()))
    assert worst <= 4


def test_dhash_stable_across_png_jpeg_for_same_texture():
    """The SAME margin-safe texture must hash identically from its PNG
    and JPEG encodings — the cross-format invariant q162 rests on."""
    from redix_stream_spark.llm.jpeg import jpeg_encode_gray

    for base in range(8):
        # even doc of the group = PNG, rebuilt as JPEG by hand
        png_payload = _synth_image(base * DHASH_GROUP)
        px = decode_pixels(png_payload)[:, :, 0]
        h_png = dhash60(decode_pixels(png_payload))
        h_jpg = dhash60(decode_pixels(jpeg_encode_gray(px)))
        assert h_png == h_jpg


def test_q162_recall_and_precision_vs_group_truth(spark, sf_dir):
    """Every intra-group pair is <=2·(per-doc flip bound) = 4 bits apart by
    construction, so the pigeonhole banding must find ALL of them (recall
    1.0); random distinct bases collide within 4 bits with negligible
    probability, so any cross-group pair is a precision bug."""
    import duckdb

    pairs = all_queries()["q162_image_neardup"](spark, sf_dir).collect()
    found = {(r["doc_id_a"], r["doc_id_b"]) for r in pairs}
    n_docs = duckdb.connect().execute(
        f"select count(*) from read_parquet('{sf_dir}/documents.parquet')"
    ).fetchone()[0]
    expected = {
        (a, b)
        for a in range(n_docs)
        for b in range(a + 1, min((a // DHASH_GROUP + 1) * DHASH_GROUP, n_docs))
    }
    assert found == expected
    assert all(r["hamming"] <= DHASH_HAMMING_MAX for r in pairs)


# --- round 11: the DC-only thumbnail path (q162b) ---------------------------


def test_decode_jpeg_dc_matches_block_means():
    """The DC plane IS the 8x8-block mean: on an AC-rich random image the
    DC-only decode must equal the block means of the full decode within
    per-pixel rounding."""
    from redix_stream_spark.llm.jpeg import (
        decode_jpeg_dc,
        decode_jpeg_pixels,
        jpeg_encode_gray,
    )

    rs = np.random.RandomState(5)
    for shape in ((16, 16), (24, 40), (19, 21)):
        img = rs.randint(0, 256, shape).astype(np.uint8)
        payload = jpeg_encode_gray(img)
        dc = decode_jpeg_dc(payload)
        from redix_stream_spark.llm.multimodal import block_mean_thumb

        bm = block_mean_thumb(decode_jpeg_pixels(payload))
        assert dc.shape == bm.shape == (-(-shape[0] // 8), -(-shape[1] // 8))
        assert np.abs(dc.astype(int) - bm.astype(int)).max() <= 2


def test_decode_jpeg_dc_color_subsampled_and_restart():
    """The DC walk must skip interleaved chroma blocks (4:2:0 MCUs) and
    resync at RSTn exactly like the full decoder; gray values combine the
    three DC planes with the same BT.601 inverse."""
    from redix_stream_spark.llm.jpeg import decode_jpeg_dc, decode_jpeg_pixels
    from redix_stream_spark.llm.multimodal import block_mean_thumb

    from .jpeg_fixture import encode_jpeg

    rs = np.random.RandomState(9)
    img = rs.randint(0, 256, (32, 48, 3)).astype(np.uint8)
    for kwargs in ({}, {"subsample": True}, {"subsample": True, "restart_interval": 2}):
        payload = encode_jpeg(img, **kwargs)
        dc = decode_jpeg_dc(payload)
        bm = block_mean_thumb(decode_jpeg_pixels(payload))
        assert dc.shape == bm.shape == (4, 6)
        # chroma DC is one value per 16x16 region under 4:2:0 and the full
        # path clips per-pixel; allow a small mean deviation
        assert np.abs(dc.astype(float) - bm.astype(float)).max() <= 8


def test_jpeg_encode_cells_roundtrips_exactly():
    """Constant 8x8 blocks survive the all-ones-quant DCT exactly — the
    closed-form encoder's bytes must decode to the replicated cell grid
    bit-for-bit, through BOTH decode paths."""
    from redix_stream_spark.llm.jpeg import (
        decode_jpeg_dc,
        decode_jpeg_pixels,
        jpeg_encode_cells,
    )

    rs = np.random.RandomState(2)
    cells = (16 + 64 * rs.randint(0, 4, (8, 9))).astype(np.uint8)
    cells[3, 4] ^= 128  # a perturbed cell stays in the level set
    payload = jpeg_encode_cells(cells)
    px = decode_jpeg_pixels(payload)
    assert np.array_equal(px[:, :, 0], np.repeat(np.repeat(cells, 8, 0), 8, 1))
    assert np.array_equal(decode_jpeg_dc(payload), cells)


def test_synth_big_thumbnail_equals_full_pixel_hash():
    """At 64x72 every dHash cell is one constant block, so the thumbnail
    path and the full-pixel path hash IDENTICAL values — the invariant
    q162b's pair-set parity rests on — and group-mates stay <=4 bits."""
    from redix_stream_spark.llm.multimodal import (
        _synth_image_big,
        decode_image_thumb,
    )

    for doc in range(24):
        payload = _synth_image_big(doc)
        h_thumb = dhash60(decode_image_thumb(payload))
        h_full = dhash60(decode_pixels(payload))
        assert h_thumb == h_full
        base = _synth_image_big((doc // DHASH_GROUP) * DHASH_GROUP)
        assert _ham(h_thumb, dhash60(decode_image_thumb(base))) <= DHASH_HAMMING_MAX
    assert _synth_image_big(1)[:2] == b"\xff\xd8"
    assert _synth_image_big(2)[:8] == b"\x89PNG\r\n\x1a\n"


def test_q162b_pair_parity_with_full_decode_path(spark, sf_dir):
    """q162b (DC thumbnail decode) must find EXACTLY the pair set the
    full-pixel decode path finds over the same blobs, and exactly the
    planted group truth — recall AND precision parity."""
    import duckdb

    from redix_stream_spark.llm.multimodal import (
        _synth_blobs,
        _synth_image_big,
        image_near_dup_pairs,
    )

    fast = all_queries()["q162b_image_neardup_fast"](spark, sf_dir).collect()
    found = {(r["doc_id_a"], r["doc_id_b"]) for r in fast}
    blobs = _synth_blobs(spark, sf_dir, _synth_image_big)
    full = {
        (r["doc_id_a"], r["doc_id_b"])
        for r in image_near_dup_pairs(blobs).collect()
    }
    assert found == full
    n_docs = duckdb.connect().execute(
        f"select count(*) from read_parquet('{sf_dir}/documents.parquet')"
    ).fetchone()[0]
    expected = {
        (a, b)
        for a in range(n_docs)
        for b in range(a + 1, min((a // DHASH_GROUP + 1) * DHASH_GROUP, n_docs))
    }
    assert found == expected
    assert all(r["hamming"] <= DHASH_HAMMING_MAX for r in fast)
