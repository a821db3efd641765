"""Segmentation tests (reference: src/segment.rs tests)."""

import numpy as np
import pytest

from alice_codec_tpu import segment

import oracle_segment


def _frame_with_person(w=32, h=32):
    ref = np.full((h, w), 50, np.uint8)
    cur = ref.copy()
    cur[8:24, 10:20] = 200  # "person" block
    return cur, ref


def test_motion_segmentation_basic():
    cur, ref = _frame_with_person()
    res = segment.segment_by_motion(cur, ref, 32, 32)
    assert res.foreground_count > 0
    bx, by, bw, bh = res.bbox
    # bbox covers the moving block (dilated by r=2, eroded by 1)
    assert bx <= 10 and by <= 8
    assert bx + bw >= 20 and by + bh >= 24
    assert 0.0 < res.coverage < 1.0


def test_motion_matches_oracle():
    rng = np.random.default_rng(0)
    cur = rng.integers(0, 256, (24, 16), dtype=np.uint8)
    ref = rng.integers(0, 256, (24, 16), dtype=np.uint8)
    res = segment.segment_by_motion(cur, ref, 16, 24)
    mask_o, bbox_o, fg_o = oracle_segment.segment_by_motion(cur, ref, 25, 2, 1)
    assert np.array_equal(res.mask.reshape(24, 16), mask_o)
    assert list(res.bbox) == bbox_o
    assert res.foreground_count == fg_o


def test_no_motion_empty_mask():
    ref = np.full((16, 16), 99, np.uint8)
    res = segment.segment_by_motion(ref, ref, 16, 16)
    assert res.foreground_count == 0
    assert res.bbox == (0, 0, 0, 0)
    assert res.coverage == 0.0


def test_chroma_segmentation():
    # green screen: high Cg background, low Cg person
    cg = np.full((16, 16), 100, np.int16)
    cg[4:12, 4:12] = -50  # person (low green)... foreground is cg <= threshold
    res = segment.segment_by_chroma(
        np.zeros((16, 16), np.int16), np.zeros((16, 16), np.int16), cg, 16, 16, 30
    )
    assert res.foreground_count > 0
    mask = res.mask.reshape(16, 16)
    assert mask[8, 8] == 1


def test_buffer_validation():
    from alice_codec_tpu.errors import InvalidBufferSize

    with pytest.raises(InvalidBufferSize):
        segment.segment_by_motion(np.zeros(10, np.uint8), np.zeros(300, np.uint8), 16, 16)


def test_crop_paste_roundtrip():
    rng = np.random.default_rng(1)
    frame = rng.integers(0, 256, (16, 16), dtype=np.uint8)
    bbox = (3, 4, 6, 5)
    cropped = segment.crop_bbox_numpy(frame, bbox)
    assert cropped.shape == (5, 6)
    target = np.zeros_like(frame)
    segment.paste_bbox_numpy(target, cropped.ravel(), bbox)
    assert np.array_equal(target[4:9, 3:9], frame[4:9, 3:9])
    assert target[:4].sum() == 0


def test_rle_roundtrip():
    rng = np.random.default_rng(2)
    mask = (rng.random((8, 8)) > 0.6).astype(np.uint8)
    data = segment.rle_encode_numpy(mask)
    assert len(data) % 3 == 0
    back = segment.rle_decode_mask(data)
    assert np.array_equal(back, mask.ravel())


def test_rle_matches_oracle_format():
    mask = np.array([1, 1, 1, 0, 0, 1], np.uint8)
    data = segment.rle_encode_mask(mask)
    # runs: (3,1), (2,0), (1,1)
    assert data == b"\x03\x00\x01\x02\x00\x00\x01\x00\x01"
    assert segment.rle_encode_mask([]) == b""


def test_extract_person_rgb():
    cur, ref = _frame_with_person(8, 8)
    cur2 = np.full((8, 8), 50, np.uint8)
    cur2[2:5, 2:5] = 200
    res = segment.segment_by_motion(cur2, ref[:8, :8], 8, 8,
                                    segment.SegmentConfig(dilate_radius=0, erode_radius=0))
    rgb = np.arange(8 * 8 * 3, dtype=np.int64) % 256
    pixels = res.extract_person_rgb(rgb.astype(np.uint8))
    assert len(pixels) == res.foreground_count * 3


def test_numpy_binding_wrappers():
    cur, ref = _frame_with_person()
    mask, bbox, fg = segment.segment_motion_numpy(cur, ref)
    assert mask.shape == (32, 32)
    assert len(bbox) == 4
    assert fg > 0
    y = np.zeros((8, 8), np.int16)
    cg = np.full((8, 8), -40, np.int16)
    mask2, bbox2, fg2 = segment.segment_chroma_numpy(y, y, cg)
    assert fg2 == 64  # everything foreground


def test_vectorized_helpers_match_loop_oracle():
    """crop/paste/extract vectorized forms vs a transliteration of the
    reference per-pixel loops (src/segment.rs:107-125, 269-298), including
    bboxes whose rows run past the frame buffer."""
    rng = np.random.default_rng(33)
    w, h = 13, 9
    frame = rng.integers(0, 256, w * h, dtype=np.uint8)
    rgbflat = rng.integers(0, 256, w * h * 3 - 5, dtype=np.uint8)  # short buf
    for bbox in [(0, 0, w, h), (3, 2, 6, 4), (9, 6, 7, 7), (0, 0, 0, 0),
                 (12, 8, 1, 1), (5, 5, 20, 20)]:
        bx, by, bw, bh = bbox
        # crop oracle
        out = []
        for row in range(by, by + bh):
            s = row * w + bx
            if s + bw <= frame.size:
                out.append(frame[s : s + bw])
        want = (np.concatenate(out) if out else np.empty(0, np.uint8))
        np.testing.assert_array_equal(
            segment.crop_to_bbox(frame, w, bbox), want)
        # paste oracle
        person = rng.integers(0, 256, max(bw * bh - 3, 0), dtype=np.uint8)
        got = frame.copy()
        segment.paste_from_bbox(got, w, person, bbox)
        want_f = frame.copy()
        src = 0
        for row in range(by, by + bh):
            d = row * w + bx
            if d + bw <= want_f.size and src + bw <= person.size:
                want_f[d : d + bw] = person[src : src + bw]
            src += bw
        np.testing.assert_array_equal(got, want_f)
        # extract oracle (in-bounds bbox only; mask indexing must not trap)
        if bx + bw <= w and by + bh <= h:
            mask = (rng.random((h, w)) > 0.5).astype(np.uint8)
            res = segment.SegmentResult(mask, bbox, int(mask.sum()), w, h)
            out = []
            for row in range(by, by + bh):
                for col in range(bx, bx + bw):
                    idx = row * w + col
                    if mask[row, col] == 1 and idx * 3 + 2 < rgbflat.size:
                        out.extend(rgbflat[idx * 3 : idx * 3 + 3])
            np.testing.assert_array_equal(
                res.extract_person_rgb(rgbflat),
                np.asarray(out, np.uint8))
