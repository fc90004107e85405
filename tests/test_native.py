"""Native (C++) data-runtime tests: builds libcamvid_native.so with g++ and
validates record store round-trip, threaded gather, shuffler determinism,
and the background prefetcher against numpy oracles."""

import numpy as np
import pytest

from pytorch_camvid_tpu.data import native


requires_native = pytest.mark.skipif(not native.native_available(),
                                     reason="native toolchain unavailable")


def test_record_store_roundtrip(tmp_path):
    path = str(tmp_path / "store.cvrs")
    rng = np.random.default_rng(0)
    records = [rng.integers(0, 256, size=rng.integers(1, 500),
                            dtype=np.uint8).tobytes() for _ in range(17)]
    records.append(b"")  # empty record edge case
    native.RecordStore.write(path, records)
    store = native.RecordStore(path)
    assert len(store) == 18
    for i, r in enumerate(records):
        assert store[i] == r
    store.close()


@requires_native
def test_gather_matches_numpy():
    rng = np.random.default_rng(1)
    data = rng.integers(0, 256, size=(50, 9, 7, 3), dtype=np.uint8)
    idx = rng.integers(0, 50, size=16)
    got = native.gather_batch(data, idx, nthreads=4)
    np.testing.assert_array_equal(got, data[idx])


@requires_native
def test_permutation_deterministic_and_valid():
    p1 = native.permutation(100, seed=7)
    p2 = native.permutation(100, seed=7)
    p3 = native.permutation(100, seed=8)
    np.testing.assert_array_equal(p1, p2)
    assert not np.array_equal(p1, p3)
    assert sorted(p1.tolist()) == list(range(100))


@requires_native
def test_prefetcher_covers_epoch():
    rng = np.random.default_rng(2)
    data = rng.integers(0, 256, size=(23, 4, 5), dtype=np.uint8)
    pf = native.NativePrefetcher(data, batch=5, seed=3, shuffle=True)
    seen = []
    for batch in pf:
        assert batch.shape[1:] == (4, 5)
        seen.append(batch)
    pf.close()
    got = np.concatenate(seen)
    assert got.shape == (23, 4, 5)  # full epoch incl. ragged tail
    # shuffled epoch is a permutation of the dataset
    key = lambda a: sorted(map(bytes, a.reshape(len(a), -1)))
    assert key(got) == key(data)
