"""Device augmentation pipeline tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mmvqa_tpu.data.images import (
    FINETUNE_AUG,
    PRETRAIN_AUG,
    AugmentSpec,
    _crop_resize,
    _interp_matrix,
    load_image,
    process_batch,
    random_rotate_host,
)


def test_interp_matrix_identity():
    # full-extent crop: rows are one-hot at the diagonal -> identity resample
    w = np.asarray(_interp_matrix(jnp.asarray(0.0), jnp.asarray(16.0), 16))
    np.testing.assert_allclose(w, np.eye(16), atol=1e-6)


def test_interp_matrix_rows_sum_to_one(rng):
    w = np.asarray(_interp_matrix(jnp.asarray(2.3), jnp.asarray(9.7), 16))
    np.testing.assert_allclose(w.sum(1), 1.0, atol=1e-6)
    assert (w >= 0).all()


def test_crop_resize_full_box_is_identity(rng):
    img = jnp.asarray(rng.random((16, 16, 3)).astype(np.float32))
    spec = AugmentSpec(crop_scale=(1.0, 1.0), crop_ratio=(1.0, 1.0))
    out = _crop_resize(img, jax.random.PRNGKey(0), spec)
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-5)


def test_process_batch_normalize_only(rng):
    x = rng.integers(0, 255, (4, 16, 16, 3), dtype=np.uint8)
    out = process_batch(jnp.asarray(x), jax.random.PRNGKey(0),
                        PRETRAIN_AUG, False)
    want = (x.astype(np.float32) / 255.0 - 0.5) / 0.5
    np.testing.assert_allclose(np.asarray(out), want, atol=1e-6)
    assert np.asarray(out).min() >= -1.0 and np.asarray(out).max() <= 1.0


def test_process_batch_augment_stays_in_range(rng):
    x = rng.integers(0, 255, (4, 16, 16, 3), dtype=np.uint8)
    out = np.asarray(
        process_batch(jnp.asarray(x), jax.random.PRNGKey(1), FINETUNE_AUG, True)
    )
    assert out.shape == (4, 16, 16, 3)
    assert out.min() >= -1.0 - 1e-5 and out.max() <= 1.0 + 1e-5
    # different keys give different augmentations
    out2 = np.asarray(
        process_batch(jnp.asarray(x), jax.random.PRNGKey(2), FINETUNE_AUG, True)
    )
    assert not np.allclose(out, out2)


def test_random_rotate_host(rng):
    img = rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)
    assert (random_rotate_host(img, 0.0, np.random.default_rng(0)) == img).all()
    rot = random_rotate_host(img, 10.0, np.random.default_rng(0))
    assert rot.shape == img.shape and not (rot == img).all()


def test_load_image_resize_center_crop(tmp_path, rng):
    from PIL import Image

    arr = rng.integers(0, 255, (100, 60, 3), dtype=np.uint8)
    p = str(tmp_path / "x.jpg")
    Image.fromarray(arr).save(p)
    out = load_image(p, 32)
    assert out.shape == (32, 32, 3) and out.dtype == np.uint8


class TestDecodedImageCache:
    """Persistent disk-backed decode cache (VERDICT r3 item 3)."""

    @pytest.fixture()
    def tree(self, tmp_path, rng):
        from PIL import Image

        paths = []
        for i in range(5):
            arr = rng.integers(0, 255, (40 + i, 40, 3), dtype=np.uint8)
            p = str(tmp_path / f"img_{i}.jpg")
            Image.fromarray(arr).save(p)
            paths.append(p)
        return paths, str(tmp_path / "cache")

    def test_roundtrip_and_persistence(self, tree):
        from mmvqa_tpu.data.images import DecodedImageCache

        paths, cdir = tree
        c1 = DecodedImageCache(cdir, 32)
        want = [load_image(p, 32) for p in paths]
        got = [c1.load(p, 32) for p in paths]
        for a, b in zip(want, got):
            np.testing.assert_array_equal(a, b)
        assert len(c1) == 5
        c1.flush()

        # fresh instance (new process analog) reads back without decoding
        import mmvqa_tpu.data.images as images_mod

        c2 = DecodedImageCache(cdir, 32)
        assert len(c2) == 5
        orig = images_mod.load_image
        calls = []

        def spy(path, size=224):
            calls.append(path)
            return orig(path, size)

        images_mod.load_image = spy
        try:
            got2 = [c2.load(p, 32) for p in paths]
        finally:
            images_mod.load_image = orig
        assert calls == [], "cache hit must not re-decode"
        for a, b in zip(want, got2):
            np.testing.assert_array_equal(a, b)

    def test_mtime_invalidation(self, tree):
        import os
        import time

        from PIL import Image

        from mmvqa_tpu.data.images import DecodedImageCache

        paths, cdir = tree
        c = DecodedImageCache(cdir, 32)
        a = c.load(paths[0], 32)
        time.sleep(0.01)
        Image.fromarray(np.zeros((40, 40, 3), np.uint8)).save(paths[0])
        os.utime(paths[0])  # ensure a different mtime even on coarse clocks
        b = c.load(paths[0], 32)
        assert not np.array_equal(a, b)
        np.testing.assert_array_equal(b, load_image(paths[0], 32))

    def test_other_size_passthrough(self, tree):
        from mmvqa_tpu.data.images import DecodedImageCache

        paths, cdir = tree
        c = DecodedImageCache(cdir, 32)
        out = c.load(paths[0], 16)  # size mismatch -> plain decode, no cache
        assert out.shape == (16, 16, 3)
        assert len(c) == 0

    def test_threaded_writers(self, tree):
        from concurrent.futures import ThreadPoolExecutor

        from mmvqa_tpu.data.images import DecodedImageCache

        paths, cdir = tree
        c = DecodedImageCache(cdir, 32)
        with ThreadPoolExecutor(4) as pool:
            outs = list(pool.map(lambda p: c.load(p, 32), paths * 4))
        for p, o in zip(paths * 4, outs):
            np.testing.assert_array_equal(o, load_image(p, 32))
        assert len(c) == 5

    def test_corrupt_index_recovers(self, tree):
        from mmvqa_tpu.data.images import DecodedImageCache

        paths, cdir = tree
        c = DecodedImageCache(cdir, 32)
        c.load(paths[0], 32)
        c.flush()
        with open(c._idx_path, "w") as f:
            f.write("{ not json")
        c2 = DecodedImageCache(cdir, 32)
        assert len(c2) == 0
        np.testing.assert_array_equal(
            c2.load(paths[0], 32), load_image(paths[0], 32)
        )

    def test_concurrent_processes_share_one_cache(self, tmp_path, rng):
        """Two PROCESSES appending to the same cache dir concurrently must
        not corrupt each other: flock'd appends with size-derived slots +
        merge-on-flush indexes. A fresh instance afterwards must read every
        image back bit-exactly from the merged cache."""
        import os
        import sys

        from PIL import Image

        from mmvqa_tpu.data.images import DecodedImageCache

        d = str(tmp_path / "imgs")
        cdir = str(tmp_path / "cache")
        os.makedirs(d)
        paths = []
        for i in range(12):
            p = os.path.join(d, f"im{i}.png")
            Image.fromarray(
                rng.integers(0, 255, (16, 16, 3), dtype=np.uint8)
            ).save(p)
            paths.append(p)

        code = (
            "import sys; sys.path.insert(0, {root!r})\n"
            "from mmvqa_tpu.data.images import DecodedImageCache\n"
            "c = DecodedImageCache({cdir!r}, 16)\n"
            "for p in {paths!r}:\n"
            "    c.load(p, 16)\n"
            "c.flush()\n"
        )
        root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        # overlapping halves so both processes race on shared images too;
        # Popen (not os.system-in-mp.Process) so a child python failing
        # actually fails the test via its real returncode
        import subprocess

        procs = [
            subprocess.Popen(
                [sys.executable, "-c",
                 code.format(root=root, cdir=cdir, paths=chunk)],
            )
            for chunk in (paths[:8], paths[4:])
        ]
        for p in procs:
            assert p.wait(timeout=120) == 0

        cache = DecodedImageCache(cdir, 16)
        assert len(cache) == 12
        for p in paths:
            np.testing.assert_array_equal(
                cache.load(p, 16), load_image(p, 16)
            )
