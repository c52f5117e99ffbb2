"""Payload codec tests — the BASELINE input_hint per-row invariant:
decoded dims match, PSNR>=40dB for lossy / exact for lossless, phash."""

import numpy as np

from colly_spark import imagecodec as ic


def test_lossless_roundtrip_exact():
    px = ic.reference_pixels("img-a", 32, 24)
    out = ic.decode(ic.encode(px, "png"))
    assert np.array_equal(out, px)
    assert ic.psnr_db(out, px) == float("inf")


def test_lossy_roundtrip_psnr_over_40db():
    px = ic.reference_pixels("img-b", 48, 32)
    out = ic.decode(ic.encode(px, "jpeg"))
    p = ic.psnr_db(out, px)
    assert 40.0 <= p < float("inf")


def test_pixels_deterministic():
    a = ic.reference_pixels("img-c", 16, 16)
    b = ic.reference_pixels("img-c", 16, 16)
    assert np.array_equal(a, b)
    assert not np.array_equal(a, ic.reference_pixels("img-d", 16, 16))


def test_phash_stable_and_fits_i64():
    px = ic.reference_pixels("img-e", 24, 16)
    h = ic.average_hash(px)
    assert h == ic.average_hash(px)
    assert -(1 << 63) <= h < (1 << 63)


def test_validate_payload_accepts_good_rejects_corrupt():
    iid, w, h = "img-f", 24, 16
    px = ic.reference_pixels(iid, w, h)
    data = ic.encode(px, "jpeg")
    ph = ic.average_hash(px)
    ok, psnr = ic.validate_payload(data, iid, w, h, "jpeg", ph)
    assert ok and float(psnr) >= 40.0
    bad = bytes(data[:20]) + b"\x00" * 8 + bytes(data[28:])
    ok2, _ = ic.validate_payload(bad, iid, w, h, "jpeg", ph)
    assert not ok2
    ok3, _ = ic.validate_payload(data, iid, w, h, "jpeg", ph + 1)
    assert not ok3


def test_decode_garbage_none():
    assert ic.decode(b"") is None
    assert ic.decode(b"FPNG\x01\x00\x00\x00\x01\x00\x00\x00xx") is None


def test_q_image_validate_gate_vs_independent_golden(spark):
    """The q_image_validate driver-gate row (Arrow-batched validate UDF +
    JVM caption equality over the synthesized input_hint table) must equal
    tools/make_golden.image_validate_row — an independent numpy
    re-implementation of the codec spec that imports no colly_spark code."""
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    import __spark_entry__ as entry
    from make_golden import image_validate_row

    got = entry.q_image_validate(spark, "/root/testdata/sf0.001").collect()
    assert len(got) == 64
    outcomes = set()
    for r in got:
        did = int(r["image_id"].split("-")[1])
        assert tuple(r) == image_validate_row(did)
        outcomes.add((r["img_ok"], r["caption_ok"]))
    # the fixture must exercise failure modes, not just the happy path
    assert (True, True) in outcomes and (True, False) in outcomes
    assert any(not io for io, _ in outcomes)
