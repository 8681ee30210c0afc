"""MNIST CNN demo (reference ``tests/test_CNN_MNIST_MaxPool.cpp``).

Uses the real MNIST idx files when present (the reference repo ships the
label files; image files must be downloaded separately), otherwise the
synthetic separable digits.

Run: python examples/train_mnist_cnn.py [mnist_dir]
"""

import os
import sys

from graphflow_tpu.models import CNN
from graphflow_tpu.utils import datasets


def load(mnist_dir):
    img = os.path.join(mnist_dir, "train-images.idx3-ubyte")
    lab = os.path.join(mnist_dir, "train-labels.idx1-ubyte")
    if os.path.exists(img) and os.path.exists(lab):
        xs = datasets.load_mnist_images(img)[:4096]
        ys = datasets.load_mnist_labels(lab)[:4096]
        print(f"loaded {len(xs)} real MNIST digits")
        return xs, ys
    print("MNIST images not found; using synthetic digits")
    return datasets.synthetic_mnist(1024)


def main():
    mnist_dir = sys.argv[1] if len(sys.argv) > 1 else "data/MNIST"
    xs, ys = load(mnist_dir)
    n_test = len(xs) // 8
    xt, yt = xs[:n_test], ys[:n_test]
    xs, ys = xs[n_test:], ys[n_test:]

    model = CNN(optimizer="adam", lam=1e-4)
    for epoch in range(10):
        total = 0.0
        for i in range(0, len(xs), 64):
            total += model.BatchLearn(xs[i:i + 64], ys[i:i + 64], 2e-3)
        acc = model.accuracy(xt, yt)
        print(f"epoch {epoch}: loss {total:.1f}  test accuracy {acc:.3f}")


if __name__ == "__main__":
    main()
