import numpy as np

from proj_ray import images as I


def test_bmp_png_lossless_roundtrip():
    px = I.synth_pixels(7, 32, 24)
    assert np.array_equal(I.bmp_decode(I.bmp_encode(px)), px)
    assert np.array_equal(I.png_decode(I.png_encode(px)), px)


def test_fake_jpeg_psnr():
    px = I.synth_pixels(9, 64, 48)
    out = I._fake_jpeg_decode(I._fake_jpeg_encode(px))
    assert I.psnr(px, out) >= 40.0


def test_images_batch_invariants():
    b = I.make_images_batch(0, 200)
    # decoded pixels match the synthesizer (PSNR>=40 for lossy)
    for k in range(0, 200, 17):
        px = I.decode(b["bytes"][k], b["fmt"][k])
        src = k if (k % 97 != 0 or k == 0) else k - 1
        ref = I.synth_pixels(src, int(b["w"][k]), int(b["h"][k]))
        if b["fmt"][k] == "jpeg":
            assert I.psnr(ref, px) >= 40
        else:
            assert np.array_equal(ref, px)
    # dup rows share phash with predecessor
    assert b["phash"][97] == b["phash"][96]
    assert b["image_id"][97] != b["image_id"][96]
    # captions deterministic
    assert b["caption"][3] == f"caption for img3 at " \
        f"{b['lon'][3]:.4f},{b['lat'][3]:.4f}"
    # some invalid latitudes exist over a larger sample
    bb = I.make_images_batch(0, 5000)
    assert (bb["lat"] == 91.0).any()


def test_images_dataset(ray_session):
    ds = I.images_dataset(500, parallelism=4)
    assert ds.count() == 500
    row = ds.take(1)[0]
    assert set(row.keys()) >= {"image_id", "bytes", "w", "h", "fmt",
                               "caption", "phash", "lon", "lat"}
