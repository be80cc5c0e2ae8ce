import numpy as np
import pytest

from renderih_tpu.data.native_reader import PackedReader, native_available


@pytest.fixture(scope="module")
def packed_file(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("native") / "data.u8")
    rng = np.random.default_rng(0)
    data = rng.integers(0, 255, (100, 16, 16, 3), dtype=np.uint8)
    data.tofile(path)
    return path, data


def test_native_builds():
    assert native_available(), "g++ build of packed_reader failed"


def test_gather_matches_numpy(packed_file):
    path, data = packed_file
    r = PackedReader(path, (16, 16, 3), np.uint8, n_threads=3)
    assert r._native is not None, "expected the native path"
    assert len(r) == 100
    idx = np.asarray([0, 99, 42, 7, 42])
    got = r.gather(idx)
    np.testing.assert_array_equal(got, data[idx])
    r.close()


def test_out_of_bounds_raises(packed_file):
    path, _ = packed_file
    r = PackedReader(path, (16, 16, 3), np.uint8)
    if r._native is None:
        pytest.skip("native lib unavailable")
    with pytest.raises(IndexError):
        r.gather(np.asarray([100]))
    with pytest.raises(IndexError):
        r.gather(np.asarray([-1]))
    r.close()


def test_large_parallel_gather(packed_file):
    path, data = packed_file
    r = PackedReader(path, (16, 16, 3), np.uint8, n_threads=8)
    rng = np.random.default_rng(1)
    idx = rng.integers(0, 100, 512)
    got = r.gather(idx)
    np.testing.assert_array_equal(got, data[idx])
    r.close()
