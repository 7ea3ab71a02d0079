"""BatchLoader unit tests: fixed shapes, padding weights, sharding,
shuffling, string passthrough, and the distillation text encoding with a
fake teacher."""

import numpy as np
import pytest

from mmvqa_tpu.data.loader import BatchLoader


class ToyDataset:
    def __init__(self, n, with_text=False):
        self.n = n
        self.with_text = with_text

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        out = {"x": np.full((3,), i, np.float32),
               "y": np.asarray(i, np.int32)}
        if self.with_text:
            out["caption"] = f"caption {i}"
        return out


def test_fixed_shapes_and_padding_weights():
    loader = BatchLoader(ToyDataset(10), batch_size=4, num_workers=2)
    batches = list(loader)
    assert len(batches) == 3
    for b in batches:
        assert b["x"].shape == (4, 3)
        assert b["weights"].shape == (4,)
    # last batch: 2 real + 2 padded
    np.testing.assert_array_equal(batches[-1]["weights"], [1, 1, 0, 0])
    # all real samples seen exactly once among weight-1 rows
    seen = np.concatenate([b["y"][b["weights"] > 0] for b in batches])
    assert sorted(seen.tolist()) == list(range(10))


def test_drop_last():
    loader = BatchLoader(ToyDataset(10), batch_size=4, drop_last=True)
    batches = list(loader)
    assert len(batches) == 2
    assert all((b["weights"] == 1).all() for b in batches)


def test_sharding_partitions_dataset():
    seen = []
    for idx in range(3):
        loader = BatchLoader(
            ToyDataset(10), batch_size=4, shard_index=idx, shard_count=3
        )
        for b in loader:
            seen.extend(b["y"][b["weights"] > 0].tolist())
    assert sorted(seen) == list(range(10))


def test_shuffle_changes_order_per_epoch():
    loader = BatchLoader(ToyDataset(16), batch_size=16, shuffle=True, seed=1)
    e1 = next(iter(loader))["y"].tolist()
    e2 = next(iter(loader))["y"].tolist()
    assert sorted(e1) == sorted(e2) == list(range(16))
    assert e1 != e2  # epoch counter reseeds


def test_string_fields_stay_lists():
    loader = BatchLoader(ToyDataset(4, with_text=True), batch_size=2)
    b = next(iter(loader))
    assert isinstance(b["caption"], list) and len(b["caption"]) == 2


def test_image_cache_hits():
    calls = []

    class Counting(ToyDataset):
        def __getitem__(self, i):
            calls.append(i)
            return super().__getitem__(i)

    loader = BatchLoader(Counting(4), batch_size=4, cache_images=True)
    list(loader)
    list(loader)
    assert len(calls) == 4  # second epoch fully cached


def test_distillation_encoding_with_fake_teacher(tmp_path):
    from mmvqa_tpu.data.text_encoding import encode_text_distillation
    from mmvqa_tpu.data.tokenizer import (
        WordPieceTokenizer,
        build_vocab_from_corpus,
        write_vocab,
    )

    corpus = ["the lung shows pneumonia", "ct scan normal"]
    vocab = build_vocab_from_corpus(corpus, max_size=500)
    path = str(tmp_path / "vocab.txt")
    write_vocab(vocab, path)
    tok = WordPieceTokenizer.from_vocab_file(path)

    H = 8

    def fake_teacher(ids):
        ids = np.asarray(ids)
        # deterministic embedding: token id broadcast over H dims
        return np.repeat(ids[..., None], H, axis=-1).astype(np.float32)

    enc = encode_text_distillation(
        "the lung shows pneumonia", tok, fake_teacher,
        num_vis=5, max_position_embeddings=20, max_token_length=16,
    )
    assert enc.labels.shape == (20, H)
    # labels at text positions equal the token ids (CLS/SEP stripped)
    ids = tok.tokenize("the lung shows pneumonia")
    id_vals = tok.convert_tokens_to_ids(ids)
    np.testing.assert_array_equal(enc.labels[7, :], id_vals[0])
    # visual/special/pad positions carry zero vectors
    assert (enc.labels[:7] == 0).all()


def test_cache_images_keeps_train_randomness(tmp_path):
    """cache_images on a TRAIN dataset must cache only the decode: per-epoch
    randomness (host rotation / MLM masks) must differ between epochs, and
    each image must still be decoded exactly once."""
    import mmvqa_tpu.data.images as images_mod
    from mmvqa_tpu.core.config import pretrain_config
    from mmvqa_tpu.data import ROCODataset
    from mmvqa_tpu.data.fixtures import make_roco_fixture
    from mmvqa_tpu.data.tokenizer import WordPieceTokenizer

    root = make_roco_fixture(str(tmp_path / "roco"), 6, 2, seed=0, image_size=32)
    cfg = pretrain_config(data_dir=root, image_size=32, mlm_prob=0.5,
                          max_position_embeddings=24, batch_size=6)
    tok = WordPieceTokenizer.find_and_load(root, "")
    cfg = cfg.replace(vocab_size=tok.vocab_size)
    import pandas as pd

    df = pd.read_csv(f"{root}/train/radiology/traindata.csv")
    ds = ROCODataset(cfg, df, tok, ["lung", "scan"], "train")

    calls = []
    orig = images_mod.load_image

    def spy(path, size=224):
        calls.append(path)
        return orig(path, size)

    images_mod.load_image = spy
    try:
        loader = BatchLoader(ds, batch_size=6, num_workers=1,
                             cache_images=True)
        assert loader._cache is None  # sample cache OFF for train datasets
        assert ds.image_cache is not None
        e1 = next(iter(loader))
        e2 = next(iter(loader))
    finally:
        images_mod.load_image = orig
    assert len(calls) == 6  # epoch 2 decoded nothing
    # randomness is NOT frozen: rotation and/or masking differ across epochs
    assert (not np.array_equal(e1["image"], e2["image"])
            or not np.array_equal(e1["labels"], e2["labels"]))


def test_cache_images_eval_dataset_keeps_sample_cache(tmp_path):
    """Eval datasets are deterministic — full-sample caching stays."""
    from mmvqa_tpu.core.config import pretrain_config
    from mmvqa_tpu.data import ROCODataset
    from mmvqa_tpu.data.fixtures import make_roco_fixture
    from mmvqa_tpu.data.tokenizer import WordPieceTokenizer
    import pandas as pd

    root = make_roco_fixture(str(tmp_path / "roco"), 4, 4, seed=0, image_size=32)
    cfg = pretrain_config(data_dir=root, image_size=32, mlm_prob=0.5,
                          max_position_embeddings=24, batch_size=4)
    tok = WordPieceTokenizer.find_and_load(root, "")
    cfg = cfg.replace(vocab_size=tok.vocab_size)
    df = pd.read_csv(f"{root}/validation/radiology/valdata.csv")
    ds = ROCODataset(cfg, df, tok, ["lung"], "validation")
    loader = BatchLoader(ds, batch_size=4, num_workers=1, cache_images=True)
    assert loader._cache is not None
    list(loader)
    assert len(loader._cache) == 4


def test_cache_images_layers_ram_over_disk_cache(tmp_path):
    """--cache_images + --image_cache_dir together: the train dataset's
    disk cache gets WRAPPED by a RamImageCache (misses fall through to the
    memmap), not silently ignored — warm epochs must serve from RAM."""
    from mmvqa_tpu.core.config import pretrain_config
    from mmvqa_tpu.data import ROCODataset
    from mmvqa_tpu.data.fixtures import make_roco_fixture
    from mmvqa_tpu.data.images import DecodedImageCache, RamImageCache
    from mmvqa_tpu.data.tokenizer import WordPieceTokenizer

    root = make_roco_fixture(str(tmp_path / "roco"), 4, 2, seed=0,
                             image_size=32)
    cfg = pretrain_config(data_dir=root, image_size=32, mlm_prob=0.5,
                          max_position_embeddings=24, batch_size=4)
    tok = WordPieceTokenizer.find_and_load(root, "")
    cfg = cfg.replace(vocab_size=tok.vocab_size)
    import pandas as pd

    df = pd.read_csv(f"{root}/train/radiology/traindata.csv")
    disk = DecodedImageCache(str(tmp_path / "cache"), 32)
    ds = ROCODataset(cfg, df, tok, ["lung"], "train", image_cache=disk)

    BatchLoader(ds, batch_size=4, num_workers=1, cache_images=True)
    assert isinstance(ds.image_cache, RamImageCache)
    assert ds.image_cache._backing is disk

    img = ds[0]["image"]  # decodes through RAM -> disk
    assert len(disk) >= 1  # the miss fell through and filled the disk cache
    assert img.shape == (32, 32, 3)

    # second read: RAM hit — the disk cache must NOT be consulted again
    reads = []
    orig = disk.load
    disk.load = lambda p, s: (reads.append(p), orig(p, s))[1]
    ds[0]
    assert reads == []
