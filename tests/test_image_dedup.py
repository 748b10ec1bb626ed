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
