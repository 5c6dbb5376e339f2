"""Real-file dataset reader tests: fabricate tiny valid MNIST idx(.gz) and
CIFAR-10 pickle/bin files and assert load_dataset parses them with the
reference's split conventions (dataset_loaders.py:18-94) — so the
"drop files under data/" path is exercised, not dead code.
"""
import gzip
import pickle
import struct

import numpy as np
import pytest

from fiode_tpu.train.data import _read_idx, _synthetic, load_dataset


def _write_idx_images(path, arr, compress=False):
    """IDX3 ubyte: magic 0x00000803, dims (N, H, W)."""
    n, h, w = arr.shape
    payload = struct.pack(">IIII", 0x00000803, n, h, w) + arr.astype(
        np.uint8
    ).tobytes()
    if compress:
        with gzip.open(path, "wb") as fh:
            fh.write(payload)
    else:
        path.write_bytes(payload)


def _write_idx_labels(path, arr, compress=False):
    payload = struct.pack(">II", 0x00000801, len(arr)) + arr.astype(
        np.uint8
    ).tobytes()
    if compress:
        with gzip.open(path, "wb") as fh:
            fh.write(payload)
    else:
        path.write_bytes(payload)


@pytest.mark.parametrize("compress", [False, True])
def test_read_idx_roundtrip(tmp_path, compress):
    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 256, (5, 28, 28)).astype(np.uint8)
    labs = rng.integers(0, 10, 5).astype(np.uint8)
    ip = tmp_path / ("imgs.idx3-ubyte" + (".gz" if compress else ""))
    lp = tmp_path / ("labs.idx1-ubyte" + (".gz" if compress else ""))
    _write_idx_images(ip, imgs, compress)
    _write_idx_labels(lp, labs, compress)
    np.testing.assert_array_equal(_read_idx(ip), imgs)
    np.testing.assert_array_equal(_read_idx(lp), labs)


@pytest.mark.parametrize("compress", [False, True])
def test_load_mnist_from_files(tmp_path, compress):
    rng = np.random.default_rng(1)
    n_train, n_test = 20, 8
    raw = tmp_path / "MNIST" / "raw"
    raw.mkdir(parents=True)
    suffix = ".gz" if compress else ""
    _write_idx_images(
        raw / ("train-images-idx3-ubyte" + suffix),
        rng.integers(0, 256, (n_train, 28, 28)).astype(np.uint8), compress,
    )
    _write_idx_labels(
        raw / ("train-labels-idx1-ubyte" + suffix),
        np.arange(n_train, dtype=np.uint8) % 10, compress,
    )
    _write_idx_images(
        raw / ("t10k-images-idx3-ubyte" + suffix),
        rng.integers(0, 256, (n_test, 28, 28)).astype(np.uint8), compress,
    )
    _write_idx_labels(
        raw / ("t10k-labels-idx1-ubyte" + suffix),
        np.arange(n_test, dtype=np.uint8) % 10, compress,
    )
    ds = load_dataset("MNIST", str(tmp_path), allow_synthetic=False)
    assert not ds.synthetic
    # random 90/10 train/val split of the train files
    # (dataset_loaders.py:36-40)
    assert len(ds.val_x) == int(0.1 * n_train)
    assert len(ds.train_x) == n_train - len(ds.val_x)
    assert ds.train_x.shape[1:] == (1, 28, 28)
    assert ds.test_x.shape == (n_test, 1, 28, 28)
    assert ds.train_x.dtype == np.float32
    assert 0.0 <= ds.train_x.min() and ds.train_x.max() <= 1.0
    assert ds.test_y.dtype == np.int32


def _make_cifar_pickle(root, rng, per_batch=4):
    pydir = root / "cifar-10-batches-py"
    pydir.mkdir(parents=True)
    all_x, all_y = [], []
    for i in range(1, 6):
        data = rng.integers(0, 256, (per_batch, 3072)).astype(np.uint8)
        labels = list(rng.integers(0, 10, per_batch))
        with open(pydir / f"data_batch_{i}", "wb") as fh:
            pickle.dump({b"data": data, b"labels": labels}, fh)
        all_x.append(data)
        all_y.extend(labels)
    tdata = rng.integers(0, 256, (per_batch, 3072)).astype(np.uint8)
    tlabels = list(rng.integers(0, 10, per_batch))
    with open(pydir / "test_batch", "wb") as fh:
        pickle.dump({b"data": tdata, b"labels": tlabels}, fh)
    return np.concatenate(all_x), np.asarray(all_y), tdata, np.asarray(tlabels)


def test_load_cifar10_pickle(tmp_path):
    rng = np.random.default_rng(2)
    tx_raw, ty_raw, sx_raw, sy_raw = _make_cifar_pickle(tmp_path, rng)
    ds = load_dataset("CIFAR10", str(tmp_path), allow_synthetic=False)
    assert not ds.synthetic
    assert ds.train_x.shape == (20, 3, 32, 32)
    assert ds.test_x.shape == (4, 3, 32, 32)
    np.testing.assert_allclose(
        ds.train_x,
        tx_raw.reshape(-1, 3, 32, 32).astype(np.float32) / 255.0,
    )
    np.testing.assert_array_equal(ds.train_y, ty_raw)
    # CIFAR convention: validation IS the test set (dataset_loaders.py:92-94)
    np.testing.assert_array_equal(ds.val_x, ds.test_x)
    np.testing.assert_array_equal(ds.val_y, sy_raw)


def test_load_cifar10_bin(tmp_path):
    rng = np.random.default_rng(3)
    bindir = tmp_path / "cifar-10-batches-bin"
    bindir.mkdir(parents=True)
    per_batch = 3
    expected_x, expected_y = [], []
    for i in range(1, 6):
        labels = rng.integers(0, 10, per_batch).astype(np.uint8)
        data = rng.integers(0, 256, (per_batch, 3072)).astype(np.uint8)
        rows = np.concatenate([labels[:, None], data], axis=1)
        rows.tofile(bindir / f"data_batch_{i}.bin")
        expected_x.append(data)
        expected_y.append(labels)
    tlabels = rng.integers(0, 10, per_batch).astype(np.uint8)
    tdata = rng.integers(0, 256, (per_batch, 3072)).astype(np.uint8)
    np.concatenate([tlabels[:, None], tdata], 1).tofile(
        bindir / "test_batch.bin"
    )
    ds = load_dataset("CIFAR10", str(tmp_path), allow_synthetic=False)
    assert not ds.synthetic
    assert ds.train_x.shape == (15, 3, 32, 32)
    np.testing.assert_allclose(
        ds.train_x,
        np.concatenate(expected_x).reshape(-1, 3, 32, 32).astype(np.float32)
        / 255.0,
    )
    np.testing.assert_array_equal(ds.train_y, np.concatenate(expected_y))
    np.testing.assert_array_equal(ds.test_y, tlabels)


def test_load_cifar3_reduction(tmp_path):
    rng = np.random.default_rng(4)
    _, ty_raw, _, sy_raw = _make_cifar_pickle(tmp_path, rng, per_batch=16)
    ds = load_dataset("CIFAR3", str(tmp_path), allow_synthetic=False)
    assert ds.n_classes == 3
    assert (ds.train_y < 3).all() and (ds.test_y < 3).all()
    assert len(ds.train_y) == int((ty_raw < 3).sum())
    assert len(ds.test_y) == int((sy_raw < 3).sum())


def test_missing_files_raise_without_synthetic(tmp_path):
    with pytest.raises(FileNotFoundError):
        load_dataset("CIFAR10", str(tmp_path), allow_synthetic=False)


def test_synthetic_hardness_zero_is_unchanged():
    a = _synthetic("CIFAR10", n_train=64, n_test=16, seed=0)
    b = _synthetic("CIFAR10", n_train=64, n_test=16, seed=0, hardness=0.0)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)


def test_eval_entry_points_honor_dataset_knobs():
    """certify/attack must evaluate on the distribution the model was
    trained against: _load_cfg_dataset threads seed/size/hardness from the
    config exactly like build_trainer does."""
    from fiode_tpu.experiment import _load_cfg_dataset

    cfg = {
        "dataset": {"name": "CIFAR10"},
        "seed": 3,
        "synthetic_size": 64,
        "synthetic_hardness": 0.5,
    }
    ds = _load_cfg_dataset(cfg)
    assert ds.synthetic
    # the synthetic generator itself is pinned to seed 0 (the dataset is a
    # fixed artifact; cfg seed varies training only, like the reference's
    # fixed CIFAR files + seed_everything)
    tx, _, sx, _ = _synthetic("CIFAR10", n_train=64, n_test=64, hardness=0.5)
    np.testing.assert_array_equal(ds.test_x, sx)
    np.testing.assert_array_equal(ds.train_x, tx)
    easy = _synthetic("CIFAR10", n_train=64, n_test=64)[2]
    assert np.abs(ds.test_x - easy).max() > 1e-3


def test_synthetic_hardness_shrinks_class_separation():
    def sep(hard):
        tx, ty, _, _ = _synthetic(
            "CIFAR10", n_train=512, n_test=16, seed=0, hardness=hard
        )
        mus = np.stack([tx[ty == c].mean(0) for c in range(10)])
        d = mus[:, None] - mus[None, :]
        within = np.stack(
            [tx[ty == c].std(0).mean() for c in range(10)]
        ).mean()
        return np.sqrt((d ** 2).sum(-1).sum(-1).sum(-1)).mean() / within

    assert sep(0.8) < 0.5 * sep(0.0)


# ---- data-check dry run (BASELINE.md "Blocked" readiness command) ----

def _fabricate_full_mnist(root, rng):
    """Full-size (60k/10k) MNIST-shaped idx files with realistic pixel
    statistics (sparse bright pixels -> mean ~0.13) and balanced labels."""
    raw = root / "MNIST" / "raw"
    raw.mkdir(parents=True)
    def imgs(n):
        return (rng.random((n, 28, 28)) < 0.13).astype(np.uint8) * 255
    def labs(n):
        return (np.arange(n) % 10).astype(np.uint8)
    _write_idx_images(raw / "train-images-idx3-ubyte", imgs(60000))
    _write_idx_labels(raw / "train-labels-idx1-ubyte", labs(60000))
    _write_idx_images(raw / "t10k-images-idx3-ubyte", imgs(10000))
    _write_idx_labels(raw / "t10k-labels-idx1-ubyte", labs(10000))


def test_data_check_missing_reports_layout(tmp_path):
    from fiode_tpu.train.data import check_data_root

    rep = check_data_root("CIFAR10", str(tmp_path))
    assert not rep["ok"]
    assert "cifar-10-batches" in rep["expected_layout"]


def test_data_check_rejects_wrong_size_files(tmp_path):
    """Tiny fabricated files are found and parsed but are NOT the real
    dataset — data-check must say not-ready, not silently pass."""
    from fiode_tpu.train.data import check_data_root

    rng = np.random.default_rng(0)
    _make_cifar_pickle(tmp_path, rng, per_batch=4)
    rep = check_data_root("CIFAR10", str(tmp_path))
    assert not rep["ok"]
    by_name = {c["check"]: c["ok"] for c in rep["checks"]}
    assert by_name["not synthetic"]          # real files were read...
    assert not by_name["train size"]         # ...but they are not CIFAR-10


def test_data_check_passes_on_full_size_mnist(tmp_path):
    from fiode_tpu.train.data import check_data_root

    rng = np.random.default_rng(0)
    _fabricate_full_mnist(tmp_path, rng)
    rep = check_data_root("MNIST", str(tmp_path))
    assert rep["ok"], rep["errors"]
    assert len(rep["sha256_test_x"]) == 64


def test_data_check_cli_exit_codes(tmp_path, capsys):
    from fiode_tpu.cli import main

    with pytest.raises(SystemExit) as ei:
        main(["data-check", "--dataset", "CIFAR10",
              "--data-root", str(tmp_path)])
    assert ei.value.code == 1
    rng = np.random.default_rng(0)
    _fabricate_full_mnist(tmp_path, rng)
    main(["data-check", "--dataset", "MNIST", "--data-root", str(tmp_path)])
    out = capsys.readouterr().out
    assert "accuracy-parity" in out and "fiode_tpu train" in out
