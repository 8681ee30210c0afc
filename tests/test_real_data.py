"""Real-dataset end-to-end runs (reference genre 4, tests/test_mlp.cpp:239-257).

The reference repo ships only the MNIST LABEL idx files
(/root/reference/tests/MNIST/ has train-labels/t10k-labels but no image
files, and the CIFAR-10 dirs hold only metadata), so a full
MNIST-image run cannot use reference-shipped data.  These tests therefore

  1. parse the reference's actual idx label bytes with our loader
     (validating the idx1 reader against real files), and
  2. train the reference CNN architecture on the scikit-learn bundled
     "digits" dataset — 1,797 REAL handwritten 8x8 digit images (the UCI
     optical-recognition set) — to an ASSERTED >= 95% held-out accuracy,
     matching the reference's printed-accuracy training genre with a real
     assert.
"""

import os

import numpy as np
import pytest

from graphflow_tpu.models.mlp import CNN, MLP
from graphflow_tpu.utils.datasets import load_mnist_labels

REF_MNIST = "/root/reference/tests/MNIST"


@pytest.mark.skipif(not os.path.exists(REF_MNIST),
                    reason="reference MNIST labels not mounted")
def test_idx_label_loader_on_reference_files():
    train = load_mnist_labels(os.path.join(REF_MNIST,
                                           "train-labels.idx1-ubyte"))
    test = load_mnist_labels(os.path.join(REF_MNIST,
                                          "t10k-labels.idx1-ubyte"))
    assert train.shape == (60000,) and test.shape == (10000,)
    assert train.min() == 0 and train.max() == 9
    # known MNIST class counts (first few of the training set)
    assert list(train[:10]) == [5, 0, 4, 1, 9, 2, 1, 3, 1, 4]


def _digits():
    from sklearn.datasets import load_digits

    d = load_digits()
    images = (d.images / 16.0).astype(np.float32)        # [N, 8, 8] in [0,1]
    labels = d.target.astype(np.int32)
    rng = np.random.default_rng(0)
    perm = rng.permutation(len(labels))
    images, labels = images[perm], labels[perm]
    n_test = 360
    return (images[n_test:], labels[n_test:],
            images[:n_test], labels[:n_test])


def test_cnn_real_digits_accuracy():
    """Reference CNN architecture (Conv-LeakyReLU-MaxPool x2 -> dense ->
    LogLoss, test_CNN_MNIST_MaxPool.cpp:109-146) on real handwritten
    digits: >= 95% held-out accuracy, asserted."""
    xtr, ytr, xte, yte = _digits()
    model = CNN(height=8, width=8, c1=8, c2=16, kernel=5, pool="max",
                optimizer="adam", seed=0)
    batch = 128
    for epoch in range(30):
        perm = np.random.default_rng(epoch).permutation(len(ytr))
        for i in range(0, len(ytr) - batch + 1, batch):
            idx = perm[i:i + batch]
            model.BatchLearn(xtr[idx], ytr[idx], 0.002)
    acc = model.accuracy(xte, yte)
    assert acc >= 0.95, f"test accuracy {acc:.3f} < 0.95"  # measured 0.972


def test_mlp_real_digits_accuracy():
    """Reference MLP (784-128-10 Sigmoid, test_mlp.cpp:75-107 shape scaled
    to 64-64-10) on real digits: >= 95% held-out accuracy."""
    xtr, ytr, xte, yte = _digits()
    model = MLP([64, 64, 10], optimizer="adam", seed=0)
    batch = 128
    for epoch in range(60):
        perm = np.random.default_rng(epoch).permutation(len(ytr))
        for i in range(0, len(ytr) - batch + 1, batch):
            idx = perm[i:i + batch]
            model.BatchLearn(xtr[idx].reshape(len(idx), -1), ytr[idx], 0.003)
    acc = model.accuracy(xte.reshape(len(yte), -1), yte)
    assert acc >= 0.95, f"test accuracy {acc:.3f} < 0.95"  # measured 0.967


def test_synthetic_molecular_energy_regression():
    """QM9/HCEP-shaped graph regression with ASSERTED held-out accuracy.

    Real QM9/HCEP data cannot be fetched here (no egress); the generated
    set has its shape: random molecule-like graphs over 4 atom species
    with an additive atomization-energy target (per-atom + per-bond
    terms, ``utils.datasets.synthetic_molecules``).  The energy is
    exactly structure-determined, so held-out MAE measures true
    generalization of the learned message passing.  A mean predictor
    scores MAE ~= 2.4 (target std ~3.0); the trained GCN must reach
    MAE < 1.0."""
    import jax

    from graphflow_tpu.models.gcn import GCN_MW
    from graphflow_tpu.utils.datasets import synthetic_molecules

    jax.config.update("jax_default_device", jax.devices("cpu")[0])
    graphs, targets = synthetic_molecules(200, seed=1)
    t = np.asarray(targets)
    tr_g, te_g = graphs[:160], graphs[160:]

    model = GCN_MW(nLevels=2, max_nVertices=9, nFeatures=4, nHiddens=24,
                   nDepth=0, seed=0)
    rng = np.random.default_rng(0)
    for epoch in range(100):
        lr = 0.02 if epoch < 60 else 0.005
        idx = rng.permutation(160)
        for s in range(0, 160, 32):
            bb = idx[s:s + 32]
            model.BatchLearn([tr_g[i] for i in bb],
                             [float(t[i]) for i in bb], lr)

    preds = np.array([model.Predict(g) for g in te_g])
    mae = np.abs(preds - t[160:]).mean()
    base = np.abs(t[160:] - t[:160].mean()).mean()   # mean-predictor MAE
    assert mae < 1.0, (mae, base)
    assert mae < 0.45 * base, (mae, base)
