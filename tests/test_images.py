import numpy as np

from proj_ray import images as I


def test_bmp_png_lossless_roundtrip():
    px = I.synth_pixels(7, 32, 24)
    assert np.array_equal(I.bmp_decode(I.bmp_encode(px)), px)
    assert np.array_equal(I.png_decode(I.png_encode(px)), px)


def test_qjpg_psnr():
    px = I.synth_pixels(9, 64, 48)
    out = I._qjpg_decode(I._qjpg_encode(px))
    assert I.psnr(px, out) >= 40.0


def test_real_jpeg_psnr_via_dispatch():
    px = I.synth_pixels(9, 64, 48)
    blob = I.encode(px, "jpeg")
    assert blob[:2] == b"\xff\xd8"        # actual JPEG, not the stand-in
    assert I.psnr(px, I.decode(blob, "jpeg")) >= 40.0


def test_images_batch_invariants():
    b = I.make_images_batch(0, 200)
    # decoded pixels match the synthesizer (PSNR>=40 for lossy)
    for k in range(0, 200, 17):
        px = I.decode(b["bytes"][k], b["fmt"][k])
        src = k if (k % 97 != 0 or k == 0) else k - 1
        ref = I.synth_pixels(src, int(b["w"][k]), int(b["h"][k]))
        if b["fmt"][k] in ("jpeg", "qjpg"):
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


def test_lance_source_roundtrip(ray_session, tmp_path):
    """Images table through the format-dispatching source/sink: bytes,
    captions, and phash survive a write/read cycle (parquet layout; the
    Lance branch runs when the pylance wheel is present)."""
    import numpy as np

    from proj_ray.images import images_dataset
    from proj_ray.sources.lance import (lance_available, read_table,
                                        write_table)

    ds = images_dataset(200, parallelism=4)
    before = ds.to_pandas().sort_values("image_id").reset_index(drop=True)
    path = str(tmp_path / ("t.lance" if lance_available() else "t_pq"))
    write_table(images_dataset(200, parallelism=4), path)
    after = (read_table(path).to_pandas()
             .sort_values("image_id").reset_index(drop=True))
    assert list(before.columns) == sorted(before.columns.tolist(),
                                          key=list(before.columns).index)
    assert (before["caption"] == after["caption"]).all()
    assert np.array_equal(before["phash"].to_numpy(),
                          after["phash"].to_numpy())
    assert all(a == b for a, b in zip(before["bytes"], after["bytes"]))


def test_lance_partitioned_write(ray_session, tmp_path):
    import os

    import ray.data as rd

    from proj_ray.sources.lance import read_table, write_table

    ds = rd.range(1000).map_batches(
        lambda b: {"id": b["id"], "bucket": b["id"] % 4},
        batch_format="numpy")
    path = str(tmp_path / "parts")
    write_table(ds, path, partition_cols=["bucket"])
    dirs = sorted(d for d in os.listdir(path) if d.startswith("bucket="))
    assert len(dirs) == 4
    # resumable read of a single partition
    one = read_table(os.path.join(path, "bucket=2"))
    assert one.count() == 250


def test_resize_nearest_exact():
    from proj_ray.images import resize_nearest, synth_pixels

    px = synth_pixels(7, 32, 24)
    out = resize_nearest(px, 16, 12)
    assert out.shape == (12, 16, 3)
    for y in (0, 5, 11):
        for x in (0, 9, 15):
            assert (out[y, x] == px[(y * 24) // 12, (x * 32) // 16]).all()
    # upscale works too and is pure repetition
    up = resize_nearest(px, 64, 48)
    assert up.shape == (48, 64, 3)
    assert (up[::2, ::2] == px).all()


def test_resize_bilinear_properties():
    import numpy as np

    from proj_ray.images import resize_bilinear, synth_pixels

    px = synth_pixels(3, 32, 24)
    same = resize_bilinear(px, 32, 24)  # identity at equal size
    assert (same == px).all()
    flat = np.full((24, 32, 3), 113, dtype=np.uint8)
    assert (resize_bilinear(flat, 7, 5) == 113).all()  # constant preserved
    down = resize_bilinear(px, 16, 12)
    assert down.shape == (12, 16, 3)
    # bilinear mean tracks the source mean (no brightness drift)
    assert abs(down.mean() - px.mean()) < 2.0


def test_resizer_stage_bytes(ray_session):
    from proj_ray.images import Resizer, decode, images_dataset

    out = images_dataset(30, parallelism=2).map_batches(
        Resizer,
        fn_constructor_kwargs=dict(out_w=8, out_h=8, method="bilinear",
                                   emit="bytes", out_fmt="png"),
        batch_format="numpy", batch_size=16, concurrency=1).take_all()
    assert len(out) == 30
    for r in out:
        assert r["fmt"] == "png" and r["w"] == 8 and r["h"] == 8
        assert decode(r["bytes"], "png").shape == (8, 8, 3)


def test_jpeg_fidelity_negative_control():
    # the PSNR>=40 gate must be able to FAIL: a deliberately bad
    # quality setting pushes round-trips below the bar, so ok < n
    b = I.make_images_batch(0, 48)
    good = I.jpeg_fidelity_partials(b)
    assert good["ok_part"].sum() == good["n_part"].sum()
    bad = I.jpeg_fidelity_partials(b, quality=3)
    assert bad["ok_part"].sum() < bad["n_part"].sum()
