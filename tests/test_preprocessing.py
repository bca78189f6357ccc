"""Image preprocessing pipeline: transform semantics and the three
preprocessor_config.json dialects (reference utils.rs:200-377)."""

from __future__ import annotations

import numpy as np
import pytest

from fastembed_rs_spark.operators.preprocessing import (
    center_crop,
    convert_to_rgb,
    load_preprocessor,
    normalize,
    rescale,
    resize_hwc,
    resize_shortest_edge,
    to_chw_float,
)


def _img(h, w, c=3):
    rng = np.random.default_rng(42)
    return rng.integers(0, 256, size=(h, w, c), dtype=np.uint8)


def test_convert_to_rgb():
    assert convert_to_rgb(_img(4, 4, 1)).shape == (4, 4, 3)
    assert convert_to_rgb(_img(4, 4, 4)).shape == (4, 4, 3)
    assert convert_to_rgb(np.zeros((4, 4), dtype=np.uint8)).shape == (4, 4, 3)


def test_resize_shapes_and_determinism():
    img = _img(20, 30)
    out = resize_hwc(img, 8, 8)
    assert out.shape == (8, 8, 3) and out.dtype == np.uint8
    assert np.array_equal(out, resize_hwc(img, 8, 8))
    same = resize_hwc(img, 20, 30)
    assert np.array_equal(same, img)  # identity resize is exact


def test_resize_shortest_edge_preserves_aspect():
    out = resize_shortest_edge(_img(100, 200), 50)
    assert out.shape == (50, 100, 3)
    out = resize_shortest_edge(_img(200, 100), 50)
    assert out.shape == (100, 50, 3)


def test_center_crop_and_pad():
    img = _img(10, 10)
    cropped = center_crop(img, 4, 4)
    assert np.array_equal(cropped, img[3:7, 3:7])
    # smaller image → zero-padded centered (utils.rs:56-99 small branch)
    padded = center_crop(img, 14, 14)
    assert padded.shape == (14, 14, 3)
    assert np.array_equal(padded[2:12, 2:12], img)
    assert padded[0].sum() == 0 and padded[-1].sum() == 0


def test_rescale_normalize_chain():
    img = np.full((2, 2, 3), 255, dtype=np.uint8)
    chw = to_chw_float(img)
    assert chw.shape == (3, 2, 2)
    x = rescale(chw)
    assert x.max() == pytest.approx(1.0)
    y = normalize(x, (0.5, 0.5, 0.5), (0.5, 0.5, 0.5))
    assert y.max() == pytest.approx(1.0) and y.min() == pytest.approx(1.0)


def test_clip_dialect():
    pipe = load_preprocessor({
        "image_processor_type": "CLIPImageProcessor",
        "size": {"shortest_edge": 16},
        "crop_size": {"height": 12, "width": 12},
        "image_mean": [0.5, 0.5, 0.5],
        "image_std": [0.5, 0.5, 0.5],
    })
    out = pipe(_img(40, 60))
    assert out.shape == (3, 12, 12) and out.dtype == np.float32
    assert -1.01 <= out.min() and out.max() <= 1.01


def test_convnext_dialect_small_size_crops():
    pipe = load_preprocessor({
        "image_processor_type": "ConvNextFeatureExtractor",
        "size": 16, "crop_pct": 0.875,
    })
    out = pipe(_img(64, 48))
    assert out.shape == (3, 16, 16)


def test_convnext_dialect_large_size_direct():
    pipe = load_preprocessor({
        "image_processor_type": "ConvNextFeatureExtractor", "size": 384,
    })
    out = pipe(_img(64, 48))
    assert out.shape == (3, 384, 384)


def test_bit_dialect_flags_off():
    pipe = load_preprocessor({
        "image_processor_type": "BitImageProcessor",
        "do_resize": False, "do_center_crop": False,
        "do_rescale": False, "do_normalize": False,
    })
    img = _img(7, 9)
    out = pipe(img)
    assert out.shape == (3, 7, 9)
    assert np.array_equal(out, img.transpose(2, 0, 1).astype(np.float32))


def test_embed_image_with_config(spark):
    from fastembed_rs_spark.operators.embed import embed_image

    df = spark.createDataFrame(
        [(0, bytearray(b"img-bytes-aaaa")), (1, bytearray(b"img-bytes-bbbb"))],
        ["doc_id", "content"],
    )
    out = embed_image(
        df, "content", model="stub-image",
        preprocessor_config={
            "image_processor_type": "CLIPImageProcessor",
            "size": {"shortest_edge": 16},
            "crop_size": {"height": 16, "width": 16},
        },
    )
    rows = out.collect()
    assert len(rows) == 2 and all(len(r["embedding"]) == 32 for r in rows)


# ---------------------------------------------------------------------------
# Qwen3-VL LLM-side plumbing (qwen3.rs:338-467)
# ---------------------------------------------------------------------------


def test_build_vl_prompt_golden():
    from fastembed_rs_spark.operators.preprocessing import build_vl_prompt

    # exact string from build_vl_prompt (qwen3.rs:338-351) with the default
    # instruction (qwen3.rs:1223)
    assert build_vl_prompt(None, True) == (
        "<|im_start|>system\nRepresent the user's input.<|im_end|>\n"
        "<|im_start|>user\n<|vision_start|><|image_pad|><|vision_end|>"
        "<|im_end|>\n<|im_start|>assistant\n"
    )
    assert build_vl_prompt("hello", False, "Embed.") == (
        "<|im_start|>system\nEmbed.<|im_end|>\n"
        "<|im_start|>user\nhello<|im_end|>\n<|im_start|>assistant\n"
    )


def test_expand_image_token_placeholders():
    import pytest

    from fastembed_rs_spark.operators.preprocessing import (
        VL_IMAGE_TOKEN,
        expand_image_token_placeholders,
    )

    p = "a" + VL_IMAGE_TOKEN + "b" + VL_IMAGE_TOKEN
    out = expand_image_token_placeholders(p, 3)
    # only the FIRST placeholder expands (replacen(.., 1))
    assert out == "a" + VL_IMAGE_TOKEN * 3 + "b" + VL_IMAGE_TOKEN
    assert expand_image_token_placeholders("no token", 0) == "no token"
    with pytest.raises(ValueError, match="no <\\|image_pad\\|>"):
        expand_image_token_placeholders("no token", 2)


def test_build_image_position_ids_text_and_image_rows():
    import numpy as np
    import pytest

    from fastembed_rs_spark.operators.preprocessing import build_image_position_ids

    T = 16
    masks = np.zeros((2, T), dtype=np.int64)
    masks[0, :6] = 1          # text-only row, 6 visible
    masks[1, :12] = 1         # image row: prefix 2, image 8, suffix 2
    # grid pre-merge (t=2,h=4,w=2), merge 2 -> llm grid 2x2x1 = 4 tokens?
    # no: 2*(4//2)*(2//2) = 4 -> use span length 4
    masks_spans = [None, (2, 6)]
    grids = [None, (2, 4, 2)]
    out = build_image_position_ids(masks, masks_spans, grids, merge_size=2)
    assert out.shape == (3, 2, T) and out.dtype == np.uint32
    # text-only: sequential on all axes, padding stays 1
    for d in range(3):
        assert list(out[d, 0, :6]) == [0, 1, 2, 3, 4, 5]
        assert set(out[d, 0, 6:].tolist()) == {1}
    # image row prefix
    for d in range(3):
        assert list(out[d, 1, :2]) == [0, 1]
    # image block: t-major (t,h,w) offsets from start=2
    # llm grid t=2,h=2,w=1 -> cells (0,0,0),(0,1,0),(1,0,0),(1,1,0)
    assert list(out[0, 1, 2:6]) == [2, 2, 3, 3]       # start + t
    assert list(out[1, 1, 2:6]) == [2, 3, 2, 3]       # start + h
    assert list(out[2, 1, 2:6]) == [2, 2, 2, 2]       # start + w
    # suffix resumes at max(prefix_max=1, image_max=2+2-1=3)+1 = 4
    for d in range(3):
        assert list(out[d, 1, 6:12]) == [4, 5, 6, 7, 8, 9]
        assert set(out[d, 1, 12:].tolist()) == {1}

    with pytest.raises(ValueError, match="does not match expected"):
        build_image_position_ids(masks, [None, (2, 7)], grids, merge_size=2)
    with pytest.raises(ValueError, match="exceeds visible"):
        bad = masks.copy(); bad[1, :] = 0; bad[1, :5] = 1
        build_image_position_ids(bad, masks_spans, grids, merge_size=2)
    with pytest.raises(ValueError, match="without prepared image"):
        build_image_position_ids(masks, masks_spans, [None, None], merge_size=2)
