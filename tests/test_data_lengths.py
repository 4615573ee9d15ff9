"""Regression: per-dataset length cache must be instance-scoped.

The bucketing length proxy (``train/data._primary_lengths``) was cached in
a module dict keyed by ``id(dataset)``; CPython reuses freed addresses, so
a dataset built after another died could inherit the dead one's (longer)
sizes array — ``np.argsort`` over it then emits indices past the new
dataset's end and eval crashes (observed as an order-dependent IndexError
in the full suite). The cache now lives on the instance.
"""

import numpy as np
import torch

from interspeech_ser_tpu.train.data import LazyFeatureDataset, _primary_lengths, epoch_batches


def _make_ds(tmp_path, n, d=4, t0=5):
    sub = tmp_path / f"lazy_{n}_{np.random.randint(1 << 30)}"
    sub.mkdir()
    names = []
    for i in range(n):
        name = f"u{i:03d}.wav"
        names.append(name)
        torch.save(
            torch.zeros((t0 + i, d)), str(sub / name.replace(".wav", ".pt"))
        )
    labels = np.eye(8)[np.arange(n) % 8]
    return LazyFeatureDataset(names, labels, [str(sub)], [d])


class TestPrimaryLengthCache:
    def test_lengths_match_instance(self, tmp_path):
        ds_a = _make_ds(tmp_path, 12)
        la = _primary_lengths(ds_a)
        assert len(la) == 12
        # cached: second call returns the same array object
        assert _primary_lengths(ds_a) is la

        ds_b = _make_ds(tmp_path, 5)
        lb = _primary_lengths(ds_b)
        assert len(lb) == 5

    def test_address_reuse_does_not_leak_sizes(self, tmp_path):
        """Recreate the crash recipe: big dataset dies, small one may land
        at the same address; its lengths must still be its own."""
        big = _make_ds(tmp_path, 40)
        _primary_lengths(big)
        dead_id = id(big)
        del big

        hit = False
        for _ in range(200):
            small = _make_ds(tmp_path, 7)
            if id(small) == dead_id:
                hit = True
            lengths = _primary_lengths(small)
            assert len(lengths) == len(small) == 7
            # the full pipeline consequence: every batch index in range
            batches = epoch_batches(
                small, batch_size=4, rng=np.random.default_rng(0),
                shuffle=False, bucket_window=2,
            )
            assert max(i for b in batches for i in b) < 7
            del small
            if hit:
                break
        # (address reuse is allocator-dependent; the correctness asserts
        # above hold either way, `hit` just records whether we recreated
        # the exact aliasing condition this run)
