"""ImageResize stage + resize_bilinear kernel (stages/multimodal.py):
identity resize is exact, downscale matches a naive per-pixel bilinear
reference, and the Ray stage round-trips PNG/BMP payloads end-to-end."""

import numpy as np
import pyarrow as pa
import pytest
import ray

from batch_geocode_ray.stages.multimodal import (
    ImageResize,
    decode_bmp,
    decode_png,
    make_bmp,
    make_png,
    resize_bilinear,
)


def _naive_bilinear(img, out_h, out_w):
    h, w = img.shape[:2]
    src = img.astype(np.float64)
    out = np.zeros((out_h, out_w) + img.shape[2:], dtype=np.float64)
    for oy in range(out_h):
        for ox in range(out_w):
            y = (oy + 0.5) * h / out_h - 0.5
            x = (ox + 0.5) * w / out_w - 0.5
            y0, x0 = int(np.floor(y)), int(np.floor(x))
            fy, fx = y - y0, x - x0
            y0c, y1c = np.clip([y0, y0 + 1], 0, h - 1)
            x0c, x1c = np.clip([x0, x0 + 1], 0, w - 1)
            top = src[y0c, x0c] * (1 - fx) + src[y0c, x1c] * fx
            bot = src[y1c, x0c] * (1 - fx) + src[y1c, x1c] * fx
            out[oy, ox] = top * (1 - fy) + bot * fy
    return np.clip(np.rint(out), 0, 255).astype(np.uint8)


def test_identity_resize_is_exact():
    rng = np.random.RandomState(5)
    img = rng.randint(0, 256, (13, 9, 3), dtype=np.uint8)
    assert np.array_equal(resize_bilinear(img, 13, 9), img)
    gray = rng.randint(0, 256, (7, 11), dtype=np.uint8)
    assert np.array_equal(resize_bilinear(gray, 7, 11), gray)


@pytest.mark.parametrize("shape,target", [((16, 12), (8, 6)),
                                          ((9, 9, 3), (17, 5)),
                                          ((5, 7, 4), (3, 3))])
def test_matches_naive_reference(shape, target):
    rng = np.random.RandomState(shape[0])
    img = rng.randint(0, 256, shape, dtype=np.uint8)
    got = resize_bilinear(img, *target)
    want = _naive_bilinear(img, *target)
    assert got.shape[:2] == target
    assert np.array_equal(got, want)


def test_bad_target_raises():
    with pytest.raises(ValueError):
        resize_bilinear(np.zeros((4, 4), np.uint8), 0, 4)


def test_stage_roundtrip(ray_session):
    rng = np.random.RandomState(9)
    imgs = [rng.randint(0, 256, (12, 10, 3), dtype=np.uint8),
            rng.randint(0, 256, (6, 16), dtype=np.uint8)]
    payloads = [make_png(imgs[0]), make_bmp(imgs[1])]
    t = pa.table({
        "img_id": pa.array([1, 2], pa.int64()),
        "image": pa.array(payloads, pa.binary()),
        "width": pa.array([10, 16], pa.int64()),
        "height": pa.array([12, 6], pa.int64()),
    })
    out = (ray.data.from_arrow(t)
           .map_batches(ImageResize(8, 8), batch_size=32,
                        batch_format="pyarrow",
                        concurrency=2, num_cpus=0.5))
    res = pa.concat_tables(
        [b for b in out.iter_batches(batch_format="pyarrow")]
    ).sort_by([("img_id", "ascending")])
    assert res["width"].to_pylist() == [8, 8]
    assert res["height"].to_pylist() == [8, 8]
    for i, src in enumerate(imgs):
        px = decode_png(res["image"][i].as_py(), keep_channels=True)
        assert px.shape[:2] == (8, 8)
        assert np.array_equal(px, resize_bilinear(src, 8, 8))
