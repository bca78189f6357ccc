"""Image preprocessing pipeline: a config-driven ``Compose`` of transforms.

Re-expresses the reference's transform pipeline
(src/image_embedding/utils.rs:29-198) and its ``preprocessor_config.json``
interpreter (``load_preprocessor``, utils.rs:200-377) with the three
processor dialects:

* ``CLIPImageProcessor``        (utils.rs:208-259): resize shortest edge →
  center crop → rescale → normalize
* ``ConvNextFeatureExtractor``  (utils.rs:260-282): size ≥ 384 → direct
  resize; else shortest-edge resize to size/crop_pct then center crop
* ``BitImageProcessor``         (utils.rs:283-337): CLIP-shaped with
  do_resize/do_center_crop/do_rescale/do_normalize flags

All transforms are pure NumPy over HWC uint8 → CHW float32 — they run
inside the ``mapInPandas`` embedding UDF, never as Spark expressions
(columnar Arrow batch in, tensor batch out). PIL (not present in this
container) is only needed for *decoding* and for exact Catmull-Rom resize;
the NumPy bilinear fallback keeps the full pipeline runnable and
deterministic. The swap-in point is ``resize_hwc``.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

import numpy as np

Transform = Callable[[np.ndarray], np.ndarray]


# ---------------------------------------------------------------------------
# transforms (utils.rs:33-167)
# ---------------------------------------------------------------------------

def convert_to_rgb(hwc: np.ndarray) -> np.ndarray:
    """Force 3 channels (ConvertToRGB, utils.rs:33-41): grayscale is
    broadcast, RGBA drops alpha."""
    if hwc.ndim == 2:
        hwc = hwc[:, :, None]
    if hwc.shape[2] == 1:
        return np.repeat(hwc, 3, axis=2)
    if hwc.shape[2] >= 3:
        return hwc[:, :, :3]
    raise ValueError(f"cannot interpret image with {hwc.shape[2]} channels")


def resize_hwc(hwc: np.ndarray, height: int, width: int) -> np.ndarray:
    """Exact resize (Resize, utils.rs:43-54). Real path: PIL Catmull-Rom
    (``Image.BICUBIC``); fallback: separable bilinear in NumPy with
    half-pixel centers (deterministic, dependency-free)."""
    try:
        from PIL import Image  # swap-in point: exact filter parity with the reference

        img = Image.fromarray(hwc.astype(np.uint8))
        return np.asarray(img.resize((width, height), Image.BICUBIC), dtype=np.uint8)
    except ImportError:
        pass
    h, w = hwc.shape[:2]
    if (h, w) == (height, width):
        return hwc.astype(np.uint8)
    ys = (np.arange(height) + 0.5) * h / height - 0.5
    xs = (np.arange(width) + 0.5) * w / width - 0.5
    y0 = np.clip(np.floor(ys).astype(int), 0, h - 1)
    x0 = np.clip(np.floor(xs).astype(int), 0, w - 1)
    y1 = np.clip(y0 + 1, 0, h - 1)
    x1 = np.clip(x0 + 1, 0, w - 1)
    wy = np.clip(ys - y0, 0.0, 1.0)[:, None, None]
    wx = np.clip(xs - x0, 0.0, 1.0)[None, :, None]
    img = hwc.astype(np.float64)
    top = img[y0][:, x0] * (1 - wx) + img[y0][:, x1] * wx
    bot = img[y1][:, x0] * (1 - wx) + img[y1][:, x1] * wx
    out = top * (1 - wy) + bot * wy
    return np.clip(np.rint(out), 0, 255).astype(np.uint8)


def resize_shortest_edge(hwc: np.ndarray, size: int) -> np.ndarray:
    """Resize so the shortest edge equals ``size``, preserving aspect."""
    h, w = hwc.shape[:2]
    if h <= w:
        return resize_hwc(hwc, size, max(1, round(w * size / h)))
    return resize_hwc(hwc, max(1, round(h * size / w)), size)


def center_crop(hwc: np.ndarray, height: int, width: int) -> np.ndarray:
    """Center crop; images smaller than the target are zero-padded centered
    (CenterCrop, utils.rs:56-99)."""
    h, w, c = hwc.shape
    out = np.zeros((height, width, c), dtype=hwc.dtype)
    # source window
    sy = max(0, (h - height) // 2)
    sx = max(0, (w - width) // 2)
    # destination window (for padding branches)
    dy = max(0, (height - h) // 2)
    dx = max(0, (width - w) // 2)
    ch = min(h, height)
    cw = min(w, width)
    out[dy:dy + ch, dx:dx + cw] = hwc[sy:sy + ch, sx:sx + cw]
    return out


def to_chw_float(hwc: np.ndarray) -> np.ndarray:
    """HWC u8 → CHW f32 (PILToNDarray, utils.rs:101-121)."""
    return hwc.transpose(2, 0, 1).astype(np.float32)


def rescale(chw: np.ndarray, scale: float = 1.0 / 255.0) -> np.ndarray:
    """× scale (Rescale, utils.rs:123-133)."""
    return chw * np.float32(scale)


def normalize(chw: np.ndarray, mean, std) -> np.ndarray:
    """(x - mean[c]) / std[c] per channel (Normalize, utils.rs:135-167)."""
    m = np.asarray(mean, dtype=np.float32)[:, None, None]
    s = np.asarray(std, dtype=np.float32)[:, None, None]
    return (chw - m) / s


@dataclass
class Compose:
    """Ordered transform pipeline (Compose, utils.rs:169-198): HWC uint8 in,
    CHW float32 out."""

    steps: list[Callable] = field(default_factory=list)

    def __call__(self, hwc: np.ndarray) -> np.ndarray:
        x = hwc
        for step in self.steps:
            x = step(x)
        return x


# ---------------------------------------------------------------------------
# config interpreter (load_preprocessor, utils.rs:200-377)
# ---------------------------------------------------------------------------

_DEFAULT_MEAN = (0.48145466, 0.4578275, 0.40821073)  # CLIP defaults
_DEFAULT_STD = (0.26862954, 0.26130258, 0.27577711)


def _size_hw(size) -> tuple[int, int]:
    """preprocessor_config 'size' is an int, {'shortest_edge': n} or
    {'height': h, 'width': w}."""
    if isinstance(size, int):
        return size, size
    if "height" in size:
        return int(size["height"]), int(size["width"])
    n = int(size.get("shortest_edge"))
    return n, n


# ---------------------------------------------------------------------------
# Qwen3-VL pipeline: smart_resize + patch extraction
# (src/models/qwen3.rs:193-336 — semantics re-expressed as vectorized NumPy)
# ---------------------------------------------------------------------------

def smart_resize(
    height: int, width: int, factor: int,
    min_pixels: int, max_pixels: int,
) -> tuple[int, int]:
    """Factor-aligned resize target (src/models/qwen3.rs:207-244): round each
    side to a multiple of ``factor`` with Python ties-to-even rounding, then
    scale uniformly if the area falls outside [min_pixels, max_pixels]."""
    if height <= 0 or width <= 0:
        raise ValueError("Image dimensions must be greater than zero")
    if max(height, width) / min(height, width) > 200.0:
        raise ValueError("Absolute aspect ratio must be <= 200")
    # Python round() is ties-to-even, exactly the reference's rounding
    h_bar = max(round(height / factor) * factor, factor)
    w_bar = max(round(width / factor) * factor, factor)
    area = float(height * width)
    if h_bar * w_bar > max_pixels:
        beta = (area / max_pixels) ** 0.5
        h_bar = max(int(height / beta / factor) * factor, factor)
        w_bar = max(int(width / beta / factor) * factor, factor)
    elif h_bar * w_bar < min_pixels:
        import math

        beta = (min_pixels / area) ** 0.5
        h_bar = max(math.ceil(height * beta / factor) * factor, factor)
        w_bar = max(math.ceil(width * beta / factor) * factor, factor)
    return h_bar, w_bar


def qwen_vl_patches(
    hwc: np.ndarray,
    patch_size: int = 16,
    temporal_patch_size: int = 2,
    merge_size: int = 2,
    min_pixels: int = 0,
    max_pixels: int = 2**31,
    rescale_factor: float = 1.0 / 255.0,
    mean=(0.5, 0.5, 0.5),
    std=(0.5, 0.5, 0.5),
) -> tuple[np.ndarray, tuple[int, int, int]]:
    """Qwen3-VL patch extraction (src/models/qwen3.rs:246-336): smart-resize
    → normalize → split into patch tokens in MERGE-BLOCK order (all patches
    of one merge block are contiguous), each row =
    [channel][temporal repeat][ph][pw] of length 3·tps·ps².

    Vectorized: one reshape/transpose instead of the reference's 9-deep pixel
    loop. Returns (patches (grid_h·grid_w, 3·tps·ps²) float32,
    (grid_t, grid_h, grid_w))."""
    factor = patch_size * merge_size
    h, w = hwc.shape[:2]
    rh, rw = smart_resize(h, w, factor, min_pixels, max_pixels)
    resized = resize_hwc(convert_to_rgb(hwc), rh, rw)
    chw = normalize(rescale(to_chw_float(resized), rescale_factor), mean, std)

    grid_h, grid_w = rh // patch_size, rw // patch_size
    bh, bw = grid_h // merge_size, grid_w // merge_size
    x = chw.reshape(3, bh, merge_size, patch_size, bw, merge_size, patch_size)
    # output row order (gh_block, gw_block, mh, mw); row content (c, ph, pw)
    x = x.transpose(1, 4, 2, 5, 0, 3, 6)
    tokens = x.reshape(grid_h * grid_w, 3, patch_size * patch_size)
    # temporal repeat inside each channel block: [c][tp][ph][pw]
    tokens = np.repeat(tokens[:, :, None, :], temporal_patch_size, axis=2)
    patches = tokens.reshape(grid_h * grid_w, 3 * temporal_patch_size * patch_size**2)
    return patches.astype(np.float32), (1, grid_h, grid_w)


def load_preprocessor(config: dict) -> Compose:
    """Build the transform pipeline from a ``preprocessor_config.json`` dict.
    Dialect dispatch on ``image_processor_type`` (falls back to
    ``feature_extractor_type``), mirroring utils.rs:200-377."""
    kind = config.get("image_processor_type") or config.get(
        "feature_extractor_type", "CLIPImageProcessor"
    )
    steps: list[Callable] = [convert_to_rgb]

    if kind == "ConvNextFeatureExtractor":
        # utils.rs:260-282: size >= 384 → direct (size,size) resize; smaller →
        # shortest-edge resize to size/crop_pct then center crop to size
        size, _ = _size_hw(config.get("size", 224))
        crop_pct = float(config.get("crop_pct", 0.875))
        if size >= 384:
            steps.append(lambda x, s=size: resize_hwc(x, s, s))
        else:
            resize_to = int(size / crop_pct)
            steps.append(lambda x, s=resize_to: resize_shortest_edge(x, s))
            steps.append(lambda x, s=size: center_crop(x, s, s))
    else:
        # CLIPImageProcessor (utils.rs:208-259) and BitImageProcessor
        # (utils.rs:283-337): flag-driven resize/crop
        if config.get("do_resize", True):
            h, w = _size_hw(config.get("size", {"shortest_edge": 224}))
            if "height" in (config.get("size") or {}):
                steps.append(lambda x, hh=h, ww=w: resize_hwc(x, hh, ww))
            else:
                steps.append(lambda x, s=h: resize_shortest_edge(x, s))
        if config.get("do_center_crop", kind == "CLIPImageProcessor"):
            ch, cw = _size_hw(config.get("crop_size", config.get("size", 224)))
            steps.append(lambda x, hh=ch, ww=cw: center_crop(x, hh, ww))

    steps.append(to_chw_float)
    if config.get("do_rescale", True):
        steps.append(lambda x: rescale(x, float(config.get("rescale_factor", 1 / 255))))
    if config.get("do_normalize", True):
        mean = tuple(config.get("image_mean", _DEFAULT_MEAN))
        std = tuple(config.get("image_std", _DEFAULT_STD))
        steps.append(lambda x: normalize(x, mean, std))
    return Compose(steps)


# ---------------------------------------------------------------------------
# Qwen3-VL LLM-side plumbing: chat-template prompt, image-token expansion,
# MRoPE position ids (src/models/qwen3.rs:338-467). Pure deterministic
# logic, mirrored exactly so the candle/ONNX swap-in only has to supply the
# tower forward; used by the embed path once a real VL tokenizer/session is
# staged (the offline stub path skips the text side entirely).
# ---------------------------------------------------------------------------

VL_DEFAULT_INSTRUCTION = "Represent the user's input."  # qwen3.rs:1223
VL_IMAGE_TOKEN = "<|image_pad|>"


def build_vl_prompt(
    text: str | None = None,
    include_image: bool = True,
    instruction: str = VL_DEFAULT_INSTRUCTION,
) -> str:
    """Chat-template prompt for Qwen3-VL embedding (qwen3.rs:338-351):
    system instruction, then the user turn holding the vision placeholder
    and/or text, then the assistant header the embedding is read from."""
    prompt = "<|im_start|>system\n" + instruction + "<|im_end|>\n<|im_start|>user\n"
    if include_image:
        prompt += "<|vision_start|>" + VL_IMAGE_TOKEN + "<|vision_end|>"
    if text is not None:
        prompt += text
    return prompt + "<|im_end|>\n<|im_start|>assistant\n"


def expand_image_token_placeholders(prompt: str, num_image_tokens: int) -> str:
    """Replace the FIRST ``<|image_pad|>`` with ``num_image_tokens`` copies
    (qwen3.rs:353-364); 0 tokens is a no-op, a missing placeholder with
    tokens to place is an error."""
    if num_image_tokens == 0:
        return prompt
    if VL_IMAGE_TOKEN not in prompt:
        raise ValueError("Prompt contains no <|image_pad|> placeholder")
    return prompt.replace(VL_IMAGE_TOKEN, VL_IMAGE_TOKEN * num_image_tokens, 1)


def build_image_position_ids(
    attention_masks: "np.ndarray",
    image_spans: list[tuple[int, int] | None],
    grids: list[tuple[int, int, int] | None],
    merge_size: int = 2,
) -> "np.ndarray":
    """MRoPE position ids, shape (3, B, T) uint32 — temporal/height/width
    axes (qwen3.rs:366-467). Text positions advance all three axes
    together; the image span gets (start+t, start+h, start+w) per LLM grid
    cell in t-major order; the suffix resumes at
    ``max(prefix_max, image_max) + 1``; padded positions keep the init
    value 1. ``grids`` are the PRE-merge (t, h, w) from ``qwen_vl_patches``
    — h and w divide by ``merge_size`` here, as in the reference."""
    masks = np.asarray(attention_masks)
    if masks.ndim != 2 or masks.shape[0] == 0:
        raise ValueError("attention_masks must be a non-empty (B, T) array")
    B, T = masks.shape
    if len(image_spans) != B or len(grids) != B:
        raise ValueError("batch size mismatch while building position ids")
    out = np.ones((3, B, T), dtype=np.uint32)
    for b in range(B):
        visible = int((masks[b] != 0).sum())
        span = image_spans[b]
        if span is None:
            seq = np.arange(visible, dtype=np.uint32)
            out[:, b, :visible] = seq
            continue
        start, end = span
        grid = grids[b]
        if grid is None:
            raise ValueError("image token span for a sample without prepared image")
        if end > visible:
            raise ValueError("image token span exceeds visible sequence length")
        llm_t, llm_h, llm_w = grid[0], grid[1] // merge_size, grid[2] // merge_size
        if end - start != llm_t * llm_h * llm_w:
            raise ValueError(
                f"image token span length {end - start} does not match "
                f"expected LLM grid {llm_t}x{llm_h}x{llm_w}"
            )
        prefix = np.arange(start, dtype=np.uint32)
        out[:, b, :start] = prefix
        tt, hh, ww = np.meshgrid(
            np.arange(llm_t), np.arange(llm_h), np.arange(llm_w), indexing="ij"
        )
        out[0, b, start:end] = (start + tt.ravel()).astype(np.uint32)
        out[1, b, start:end] = (start + hh.ravel()).astype(np.uint32)
        out[2, b, start:end] = (start + ww.ravel()).astype(np.uint32)
        prefix_max = max(start - 1, 0)
        image_max = start + max(llm_t, llm_h, llm_w) - 1
        st_idx = max(prefix_max, image_max) + 1
        tail = np.arange(st_idx, st_idx + (visible - end), dtype=np.uint32)
        out[:, b, end:visible] = tail
    return out
