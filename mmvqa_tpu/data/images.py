"""Image decode (host) + batched random augmentation (device, jit).

The reference runs torchvision transforms per-sample in DataLoader workers
(roco_train.py:100-114, vqamed2019/train.py:179-205). TPU-first split:

* HOST (deterministic, cacheable): PIL decode -> RGB -> resize shorter side
  to `size` -> center crop `size` -> uint8 (H, W, 3). This matches the
  reference's eval transform exactly, so eval batches need no device work
  beyond normalize.
* HOST (random, per-sample, in the loader threads): RandomRotation — PIL
  rotate, like torchvision's (rotating 224x224 uint8 on the host costs ~100us
  and keeps the device path gather-free).
* DEVICE (random, batched, jit): RandomResizedCrop expressed as TWO batched
  interpolation MATMULS (separable bilinear resampling rides the MXU — a
  per-pixel gather implementation measured ~1s/batch-128 on v5e; the matmul
  form is ~1ms), then ColorJitter and normalize((0.5,)*3, (0.5,)*3).

Documented deviations from torchvision (stochastic augmentation only, no
effect on eval parity): RandomResizedCrop clamps oversize crops instead of
the 10-try-then-fallback loop, and rotation order is decode->rotate->crop
rather than crop->rotate.
"""

from __future__ import annotations

import json
import os
import threading
from dataclasses import dataclass
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# host side
# ---------------------------------------------------------------------------

def load_image(path: str, size: int = 224) -> np.ndarray:
    """Decode -> resize shorter side -> center crop: uint8 (size, size, 3).

    Matches Resize(size) + CenterCrop(size) (roco_train.py:110-114).
    """
    from PIL import Image

    img = Image.open(path).convert("RGB")
    w, h = img.size
    if w <= h:
        nw, nh = size, max(size, int(round(h * size / w)))
    else:
        nh, nw = size, max(size, int(round(w * size / h)))
    img = img.resize((nw, nh), Image.BILINEAR)
    left = (nw - size) // 2
    top = (nh - size) // 2
    img = img.crop((left, top, left + size, top + size))
    return np.asarray(img, np.uint8)


class RamImageCache:
    """In-RAM decoded-image cache (decode only — random transforms stay
    per-epoch). Decoded ROCO at 224px is ~10 GB; the host has 125 GB.

    ``backing``: optional second-level cache (a DecodedImageCache) that
    misses fall through to — with both --cache_images and
    --image_cache_dir set, epoch 1 fills RAM from the disk memmap
    (~2,370 img/s) and warm epochs serve from RAM (~7,500 img/s)."""

    def __init__(self, backing=None) -> None:
        self._store: dict = {}
        self._lock = threading.Lock()
        self._backing = backing

    def load(self, path: str, size: int) -> np.ndarray:
        key = (path, size)
        img = self._store.get(key)
        if img is None:
            img = (self._backing.load(path, size) if self._backing
                   is not None else load_image(path, size))
            with self._lock:
                self._store[key] = img
        return img


class DecodedImageCache:
    """Persistent disk-backed decoded-image cache (VERDICT r3 item 3).

    The deterministic decode half of the pipeline (PIL decode -> resize ->
    center crop, uint8) runs at ~790 img/s cold on this 1-core host — below
    the ~940 img/s device step — and ``--cache_images`` (RAM) only helps
    epochs >= 2 *within one process*, so epoch 1 of every run was
    host-bound. This cache makes the first epoch of every run after the
    very first host-unbound: decoded images append to one uint8 memmap
    (``decoded_<size>.bin``, one fixed-size slot per image) with a JSON
    index keyed by (absolute path -> slot, mtime). Raw-byte memmap reads
    measure ~10x faster than JPEG decode on this host (tools/loader_bench
    --image_cache_dir).

    Thread-safe within a process (the BatchLoader decodes from a thread
    pool) AND safe under concurrent processes sharing one cache dir:
    appends happen under an ``flock`` on the bin file with the slot number
    derived from the locked file size, and index flushes MERGE with the
    on-disk index instead of overwriting it — worst case two processes
    both decode the same image and one slot is duplicated (space, not
    correctness). Reads are lock-free. A source image whose mtime changes
    is treated as a miss and re-appended (the stale slot leaks
    ~size²·3 bytes).

    No reference equivalent: the reference re-decodes every epoch in
    DataLoader workers (roco_train.py:126-127), which cannot keep up on a
    single-core host.
    """

    INDEX_FLUSH_EVERY = 512

    def __init__(self, cache_dir: str, size: int) -> None:
        self.size = int(size)
        os.makedirs(cache_dir, exist_ok=True)
        self._bin_path = os.path.join(cache_dir, f"decoded_{size}.bin")
        self._idx_path = os.path.join(cache_dir, f"decoded_{size}.idx.json")
        self._slot_bytes = self.size * self.size * 3
        self._lock = threading.Lock()
        self._index: dict = {}
        self._mm: Optional[np.memmap] = None
        self._mm_slots = 0
        self._puts_since_flush = 0

        self._writer = open(self._bin_path, "ab")
        with self._flocked():
            # align the file to whole slots (a previous crash may have left
            # a partial record); size-derived, so a concurrent process's
            # complete slots are never cut off
            n_bytes = os.path.getsize(self._bin_path)
            n_slots = n_bytes // self._slot_bytes
            if n_bytes != n_slots * self._slot_bytes:
                self._writer.truncate(n_slots * self._slot_bytes)
            self._index = self._read_disk_index(n_slots)
        import atexit

        atexit.register(self.flush)

    def _read_disk_index(self, n_slots: int) -> dict:
        if not os.path.exists(self._idx_path):
            return {}
        try:
            with open(self._idx_path) as f:
                idx = json.load(f)
            if idx.get("size") != self.size:
                return {}
            return {
                k: tuple(v) for k, v in idx["entries"].items()
                if v[0] < n_slots  # drop entries past a truncated bin
            }
        except (json.JSONDecodeError, KeyError, OSError):
            return {}  # corrupt index -> rebuild from scratch

    def _flocked(self):
        """Exclusive cross-process lock on the bin file (intra-process
        exclusion is self._lock — flock is per open-file, not per-thread)."""
        import contextlib
        import fcntl

        @contextlib.contextmanager
        def cm():
            fcntl.flock(self._writer.fileno(), fcntl.LOCK_EX)
            try:
                yield
            finally:
                fcntl.flock(self._writer.fileno(), fcntl.LOCK_UN)

        return cm()

    def __len__(self) -> int:
        return len(self._index)

    def _read_slot(self, slot: int) -> np.ndarray:
        if self._mm is None or slot >= self._mm_slots:
            n = os.path.getsize(self._bin_path) // self._slot_bytes
            self._mm = np.memmap(
                self._bin_path, dtype=np.uint8, mode="r",
                shape=(n, self.size, self.size, 3),
            )
            self._mm_slots = n
        return np.array(self._mm[slot])  # copy out of the map

    def load(self, path: str, size: int) -> np.ndarray:
        if size != self.size:
            return load_image(path, size)
        key = os.path.abspath(path)
        entry = self._index.get(key)
        if entry is not None:
            slot, mtime = entry
            try:
                if os.path.getmtime(path) == mtime:
                    return self._read_slot(slot)
            except OSError:
                pass
        img = load_image(path, size)
        with self._lock, self._flocked():
            # slot comes from the LOCKED file size: concurrent processes
            # interleave appends without clobbering each other's slots
            slot = os.path.getsize(self._bin_path) // self._slot_bytes
            self._writer.write(img.tobytes())
            self._writer.flush()  # readers remap via getsize — keep it honest
            self._index[key] = (slot, os.path.getmtime(path))
            self._puts_since_flush += 1
            if self._puts_since_flush >= self.INDEX_FLUSH_EVERY:
                self._flush_locked()
        return img

    def _flush_locked(self) -> None:
        """Write the index — MERGED with the current on-disk one, so
        concurrent processes flushing their own entries don't drop each
        other's. Caller holds self._lock and the flock."""
        self._writer.flush()
        n_slots = os.path.getsize(self._bin_path) // self._slot_bytes
        merged = dict(self._read_disk_index(n_slots))
        merged.update(self._index)
        self._index = merged
        tmp = self._idx_path + f".tmp{os.getpid()}"
        with open(tmp, "w") as f:
            json.dump(
                {"size": self.size,
                 "entries": {k: list(v) for k, v in merged.items()}},
                f,
            )
        os.replace(tmp, self._idx_path)
        self._puts_since_flush = 0

    def flush(self) -> None:
        with self._lock:
            if self._puts_since_flush and not self._writer.closed:
                with self._flocked():
                    self._flush_locked()


# ---------------------------------------------------------------------------
# device side
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class AugmentSpec:
    """Random-augmentation strengths.

    pretrain (roco_train.py:100-108): crop 0.95-1.05, rot 5, jitter 0.05
    fine-tune (vqamed2019/train.py:179-190): crop 0.75-1.25, rot 10, jitter 0.4
    """

    crop_scale: Tuple[float, float] = (0.95, 1.05)
    crop_ratio: Tuple[float, float] = (0.95, 1.05)
    rotation_deg: float = 5.0
    brightness: float = 0.05
    contrast: float = 0.05
    saturation: float = 0.05
    hue: float = 0.05


PRETRAIN_AUG = AugmentSpec()
FINETUNE_AUG = AugmentSpec(
    crop_scale=(0.75, 1.25), crop_ratio=(0.75, 1.25), rotation_deg=10.0,
    brightness=0.4, contrast=0.4, saturation=0.4, hue=0.4,
)


def random_rotate_host(
    img_u8: np.ndarray, deg: float, rng
) -> np.ndarray:
    """Host-side RandomRotation (PIL, NEAREST like torchvision's default)."""
    if deg <= 0:
        return img_u8
    from PIL import Image

    angle = rng.uniform(-deg, deg)
    return np.asarray(
        Image.fromarray(img_u8).rotate(angle, resample=Image.NEAREST),
        np.uint8,
    )


def _sample_crop(key: jax.Array, size: int, spec: AugmentSpec):
    """Sample a RandomResizedCrop box; returns (y0, x0, h, w) floats."""
    k1, k2, k3, k4 = jax.random.split(key, 4)
    scale = jax.random.uniform(k1, (), minval=spec.crop_scale[0],
                               maxval=spec.crop_scale[1])
    log_r = jax.random.uniform(
        k2, (), minval=jnp.log(spec.crop_ratio[0]),
        maxval=jnp.log(spec.crop_ratio[1]),
    )
    ratio = jnp.exp(log_r)
    area = size * size * scale
    w = jnp.minimum(jnp.sqrt(area * ratio), size)
    h = jnp.minimum(jnp.sqrt(area / ratio), size)
    x0 = jax.random.uniform(k3, (), minval=0.0, maxval=size - w)
    y0 = jax.random.uniform(k4, (), minval=0.0, maxval=size - h)
    return y0, x0, h, w


def _interp_matrix(start: jax.Array, extent: jax.Array, size: int) -> jax.Array:
    """(out size, in size) bilinear sampling matrix for a 1D crop+resize:
    output u samples source coordinate start + (u + 0.5) * extent/size - 0.5.
    Hat-function weights; rows sum to 1. Rides the MXU as a matmul."""
    u = jnp.arange(size, dtype=jnp.float32)
    src = start + (u + 0.5) * (extent / size) - 0.5
    y = jnp.arange(size, dtype=jnp.float32)
    d = jnp.abs(src[:, None] - y[None, :])
    w = jnp.maximum(0.0, 1.0 - d)
    # edge clamp: renormalize rows (handles src outside [0, size-1])
    return w / jnp.maximum(jnp.sum(w, axis=1, keepdims=True), 1e-6)


def _crop_resize(img: jax.Array, key: jax.Array, spec: AugmentSpec):
    """Separable bilinear crop+resize via two matmuls: (S,S,3) -> (S,S,3)."""
    size = img.shape[0]
    y0, x0, h, w = _sample_crop(key, size, spec)
    wy = _interp_matrix(y0, h, size)  # (S, S)
    wx = _interp_matrix(x0, w, size)  # (S, S)
    tmp = jnp.einsum("oy,yxc->oxc", wy, img)
    return jnp.einsum("ox,yxc->yoc", wx, tmp)


def _rgb_to_gray(x: jax.Array) -> jax.Array:
    return (
        0.2989 * x[..., 0] + 0.587 * x[..., 1] + 0.114 * x[..., 2]
    )[..., None]


def _color_jitter(key: jax.Array, x: jax.Array, spec: AugmentSpec) -> jax.Array:
    """brightness/contrast/saturation/hue in torchvision's value conventions
    (random order is approximated by a fixed b->c->s->h order)."""
    kb, kc, ks, kh = jax.random.split(key, 4)
    if spec.brightness > 0:
        f = jax.random.uniform(kb, (), minval=1 - spec.brightness,
                               maxval=1 + spec.brightness)
        x = jnp.clip(x * f, 0.0, 1.0)
    if spec.contrast > 0:
        f = jax.random.uniform(kc, (), minval=1 - spec.contrast,
                               maxval=1 + spec.contrast)
        mean = jnp.mean(_rgb_to_gray(x))
        x = jnp.clip((x - mean) * f + mean, 0.0, 1.0)
    if spec.saturation > 0:
        f = jax.random.uniform(ks, (), minval=1 - spec.saturation,
                               maxval=1 + spec.saturation)
        g = _rgb_to_gray(x)
        x = jnp.clip((x - g) * f + g, 0.0, 1.0)
    if spec.hue > 0:
        f = jax.random.uniform(kh, (), minval=-spec.hue, maxval=spec.hue)
        # cheap hue rotation in YIQ space (equivalent rotation of chroma)
        y = _rgb_to_gray(x)[..., 0]
        i = 0.596 * x[..., 0] - 0.274 * x[..., 1] - 0.322 * x[..., 2]
        q = 0.211 * x[..., 0] - 0.523 * x[..., 1] + 0.312 * x[..., 2]
        ang = f * 2.0 * jnp.pi
        ci, cq = jnp.cos(ang), jnp.sin(ang)
        i2 = ci * i - cq * q
        q2 = cq * i + ci * q
        r = y + 0.956 * i2 + 0.621 * q2
        g2 = y - 0.272 * i2 - 0.647 * q2
        b = y - 1.106 * i2 + 1.703 * q2
        x = jnp.clip(jnp.stack([r, g2, b], axis=-1), 0.0, 1.0)
    return x


@partial(jax.jit, static_argnames=("spec", "augment"))
def process_batch(
    images_u8: jax.Array,
    key: jax.Array,
    spec: AugmentSpec = PRETRAIN_AUG,
    augment: bool = True,
) -> jax.Array:
    """(B, S, S, 3) uint8 -> augmented, normalized float32 (B, S, S, 3).

    normalize((0.5,)*3, (0.5,)*3) -> range [-1, 1] (roco_train.py:108).
    """
    x = images_u8.astype(jnp.float32) / 255.0
    if augment:
        B = x.shape[0]
        keys = jax.random.split(key, B * 2).reshape(B, 2, 2)

        def per_image(img, ks):
            img = _crop_resize(img, ks[0], spec)
            return _color_jitter(ks[1], img, spec)

        x = jax.vmap(per_image)(x, keys)
    return (x - 0.5) / 0.5
