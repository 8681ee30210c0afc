"""Numerical parity against the ACTUAL compiled reference binary.

tools/parity_reference.cpp runs the reference GraphFlow kernels (compiled
from the read-only reference headers) on deterministic inputs and dumps
(T, A, Y); these tests reproduce the inputs and compare our kernels'
outputs element-wise.  This is ground truth from the reference itself, not
from any re-implementation.
"""

import os
import subprocess

import numpy as np
import pytest
import jax.numpy as jnp

from graphflow_tpu.ops import contractions as C

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
HARNESS_SRC = os.path.join(REPO, "tools", "parity_reference.cpp")
HARNESS_BIN = "/tmp/graphflow_parity_ref"
REFERENCE = "/root/reference"


def _build():
    if os.path.exists(HARNESS_BIN):
        return True
    if not os.path.isdir(REFERENCE):
        return False
    try:
        subprocess.run(
            ["g++", "-O2", "-std=c++11", f"-I{REFERENCE}", HARNESS_SRC,
             "-o", HARNESS_BIN], check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


pytestmark = pytest.mark.skipif(not _build(),
                                reason="reference tree or g++ unavailable")


def _run_reference(kind: str, N: int, Cc: int, seed: int):
    out = subprocess.run([HARNESS_BIN, kind, str(N), str(Cc), str(seed)],
                         check=True, capture_output=True, timeout=120)
    vals = np.array([float(x) for x in out.stdout.split()])
    nT = N * N * N * Cc
    nA = N * N
    T = vals[:nT].reshape(N, N, N, Cc)   # [a][(b, c, f) row-major]
    A = vals[nT:nT + nA].reshape(N, N)
    Y = vals[nT + nA:]
    return T, A, Y


@pytest.mark.parametrize("kind,fn,ncases", [
    ("risi18", lambda T, A: C.risi_contraction_18(T, A), 18),
    ("risi10", lambda T, A: C.risi_contraction_10(T, A), 10),
    ("risi50", lambda T, A: C.risi_contraction_50(T, A), 50),
])
def test_contraction_matches_reference_binary(kind, fn, ncases):
    N, Cc, seed = 5, 3, 12345
    T, A, Y_ref = _run_reference(kind, N, Cc, seed)
    Y = np.asarray(fn(jnp.asarray(T), jnp.asarray(A)))
    Y_ref = Y_ref.reshape(N, N, ncases * Cc)
    np.testing.assert_allclose(Y, Y_ref, rtol=1e-9, atol=1e-9)


def test_risi4_matches_reference_binary():
    N, Cc, seed = 4, 3, 999
    T, _, Y_ref = _run_reference("risi4", N, Cc, seed)
    Y = np.asarray(C.risi_contraction_4(jnp.asarray(T)))
    np.testing.assert_allclose(Y, Y_ref.reshape(N, N, 4 * Cc),
                               rtol=1e-9, atol=1e-9)


def test_reference_negative_adjacency_guard():
    """The LCG produces negative adjacency entries, so this parity run also
    pins the adj > 0 guard behavior of RisiContraction_18 for free."""
    N, Cc, seed = 6, 2, 777
    T, A, Y_ref = _run_reference("risi18", N, Cc, seed)
    assert (A < 0).any()  # the guard is actually exercised
    Y = np.asarray(C.risi_contraction_18(jnp.asarray(T), jnp.asarray(A)))
    np.testing.assert_allclose(Y, Y_ref.reshape(N, N, 18 * Cc),
                               rtol=1e-9, atol=1e-9)
