"""MLP/CNN example tests — the reference's MNIST genre on synthetic digits
(tests/test_mlp.cpp, test_CNN_MNIST_MaxPool.cpp), with real asserts."""

import numpy as np
import pytest

from graphflow_tpu.models.mlp import MLP, CNN
from graphflow_tpu.utils import datasets


@pytest.fixture(scope="module")
def digits():
    xs, ys = datasets.synthetic_mnist(256, seed=1)
    xt, yt = datasets.synthetic_mnist(64, seed=2)
    return xs, ys, xt, yt


def test_mlp_learns_digits(digits):
    xs, ys, xt, yt = digits
    m = MLP([784, 64, 10], optimizer="adam")
    for epoch in range(30):
        for i in range(0, len(xs), 32):
            m.BatchLearn(xs[i:i + 32], ys[i:i + 32], 0.003)
    acc = m.accuracy(xt, yt)
    assert acc > 0.8, acc


def test_cnn_learns_digits(digits):
    xs, ys, xt, yt = digits
    m = CNN(optimizer="adam", lam=1e-4)
    for epoch in range(8):
        for i in range(0, len(xs), 32):
            m.BatchLearn(xs[i:i + 32], ys[i:i + 32], 0.002)
    acc = m.accuracy(xt, yt)
    assert acc > 0.8, acc


def test_cnn_avgpool_variant(digits):
    xs, ys, _, _ = digits
    m = CNN(pool="avg", optimizer="adam")
    l0 = m.BatchLearn(xs[:32], ys[:32], 1e-3)
    for _ in range(10):
        l1 = m.BatchLearn(xs[:32], ys[:32], 1e-3)
    assert l1 < l0


def test_mlp_save_load(tmp_path, digits):
    xs, ys, _, _ = digits
    m = MLP([784, 32, 10])
    m.BatchLearn(xs[:32], ys[:32], 0.05)
    p0 = m.Predict(xs[:8])
    fn = str(tmp_path / "mlp.dat")
    m.save_model(fn)
    m2 = MLP([784, 32, 10], seed=123)
    m2.load_model(fn)
    np.testing.assert_array_equal(m2.Predict(xs[:8]), p0)


def test_mnist_label_loader_parses_reference_files():
    """The reference ships the MNIST label files; parse them for real."""
    import os
    path = "/root/reference/tests/MNIST/train-labels.idx1-ubyte"
    if not os.path.exists(path):
        pytest.skip("reference MNIST labels not present")
    labels = datasets.load_mnist_labels(path)
    assert labels.shape == (60000,)
    assert labels.min() == 0 and labels.max() == 9


def test_synthetic_mnist_is_separable():
    xs, ys = datasets.synthetic_mnist(50, seed=3)
    assert xs.shape == (50, 28, 28) and ys.shape == (50,)
    assert xs.max() <= 1.0 + 0.1 and xs.min() >= 0.0
