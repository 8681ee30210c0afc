"""WHOLE-MODEL activation parity against the ACTUAL reference binary.

tools/parity_model_reference.cpp builds the reference SMP_omega / SMP_theta
(compiled from the read-only headers at /root/reference) on a deterministic
molecule, loads weights from file, runs ``complete_computation_graph`` +
``forward`` and dumps every per-level vertex state, the vertex features,
the graph feature and the prediction.  Here we build the IDENTICAL molecule
and weights in graphflow_tpu (float64) and assert every activation matches
element-wise — pinning level-0 embed, phi construction/capping, neighbor
gather alignment, the contraction, K/bias/LeakyReLU, and the head in one
stroke (reference call stack ``SMP_omega.h:584-693``, ``SMP_theta.h:570-615``).
"""

import os
import subprocess

import numpy as np
import pytest
import jax

from graphflow_tpu.core.graph import DenseGraph

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
HARNESS_SRC = os.path.join(REPO, "tools", "parity_model_reference.cpp")
HARNESS_BIN = "/tmp/graphflow_parity_model"
REFERENCE = "/root/reference"


def _build():
    if os.path.exists(HARNESS_BIN):
        return True
    if not os.path.isdir(REFERENCE):
        return False
    try:
        subprocess.run(
            ["g++", "-O2", "-std=c++11", "-pthread", f"-I{REFERENCE}",
             HARNESS_SRC, "-o", HARNESS_BIN],
            check=True, capture_output=True, timeout=300)
        return True
    except Exception:
        return False


pytestmark = [pytest.mark.skipif(not _build(),
                                 reason="reference tree or g++ unavailable"),
              pytest.mark.slow]


class _LCG:
    """Exact replica of the harness's deterministic value stream."""

    def __init__(self, seed):
        self.s = seed & 0xFFFFFFFFFFFFFFFF

    def next(self):
        self.s = (self.s * 6364136223846793005
                  + 1442695040888963407) & 0xFFFFFFFFFFFFFFFF
        return ((self.s >> 33) & 0x7FFFFFFF) / float(0x7FFFFFFF) - 0.5


def build_molecule(n, nFeat, seed):
    """Same molecule the C++ harness builds (feature draws, then edges)."""
    lcg = _LCG(seed)
    feats = np.zeros((n, nFeat))
    for u in range(n):
        fi = min(int((lcg.next() + 0.5) * nFeat), nFeat - 1)
        feats[u, fi] = 1.0
    adj = np.zeros((n, n), dtype=int)
    for u in range(n):
        for v in range(u + 1, n):
            if lcg.next() < -0.1:
                adj[u, v] = adj[v, u] = 1
    for u in range(n - 1):
        adj[u, u + 1] = adj[u + 1, u] = 1
    edges = np.argwhere(np.triu(adj))
    return DenseGraph.from_edges(n, nFeat, edges, feats)


def _run_harness(kind, n, V, rf, L, C, nFeat, nDepth, seed, weights_file):
    out = subprocess.run(
        [HARNESS_BIN, kind, str(n), str(V), str(rf), str(L), str(C),
         str(nFeat), str(nDepth), str(seed), weights_file],
        check=True, capture_output=True, timeout=300, text=True)
    lines = [l for l in out.stdout.splitlines() if l and not l.startswith("#")]
    tokens = " ".join(lines).split()
    pos = [0]

    def take(k):
        vals = np.array([float(x) for x in tokens[pos[0]:pos[0] + k]])
        pos[0] += k
        return vals

    order = 2 if kind == "omega" else 1
    states = []            # per level: list over v of (size, array)
    for l in range(L + 1):
        lev = []
        for v in range(n):
            size = int(take(1)[0])
            shape = (size, size, C) if order == 2 else (size, C)
            lev.append((size, take(int(np.prod(shape))).reshape(shape)))
        states.append(lev)
    vertex_feats = np.stack([take(C) for _ in range(n)])
    graph_feat = take(C)
    predict = take(1)[0]
    assert pos[0] == len(tokens)
    return states, vertex_feats, graph_feat, predict


def _write_theta_weights(fn, params, V, L, C):
    """SMP_theta registration order (SMP_theta.h:255-264): H; per level
    (for size=1..V: lambda1[s], lambda2[s], b[s]), then K; then W."""
    with open(fn, "w") as f:
        def w(arr):
            for v in np.asarray(arr, dtype=np.float64).reshape(-1):
                f.write(f"{float(v)} ")
        w(params["H"])
        for l in range(L):
            lev = params["levels"][l]
            for s in range(1, V + 1):
                w(lev["lambda1"][s]); w(lev["lambda2"][s]); w(lev["b"][s])
            w(lev["K"])
        w(params["W"])


@pytest.mark.parametrize("n,V,rf,L,C,seed", [
    (5, 5, 5, 2, 4, 101),     # uncapped, no padding
    (7, 9, 4, 3, 5, 202),     # capped receptive field + padded V
    (9, 9, 3, 3, 4, 303),     # aggressively capped
])
def test_smp_omega_matches_reference_binary(tmp_path, n, V, rf, L, C, seed):
    from graphflow_tpu.models.smp2d import (SMP2D, SMP2DConfig, smp2d_states,
                                            _graph_feature)
    from graphflow_tpu.ops import activations

    nFeat, nDepth = 4, 3
    cfg = SMP2DConfig(max_nVertices=V, max_receptive_field=rf, nLevels=L,
                      nChanels=C, nFeatures=nFeat, nDepth=nDepth,
                      contraction=18, dtype="float64")
    model = SMP2D(cfg, seed=0)
    mol = build_molecule(n, nFeat, seed)

    fn = str(tmp_path / "w.txt")
    model.save_model(fn)
    ref_states, ref_vf, ref_gf, ref_pred = _run_harness(
        "omega", n, V, rf, L, C, nFeat, nDepth, seed, fn)

    batch = model._stack([mol])
    g = jax.tree_util.tree_map(lambda x: x[0], batch)
    states = smp2d_states(model.params, g, cfg)
    sizes = np.asarray(g["sizes"])                    # [L+1, V]

    for l in range(L + 1):
        for v in range(n):
            s_ref, f_ref = ref_states[l][v]
            assert sizes[l][v] == s_ref, (l, v, sizes[l][v], s_ref)
            ours = np.asarray(states[l])[v, :s_ref, :s_ref, :]
            np.testing.assert_allclose(ours, f_ref, rtol=1e-9, atol=1e-12,
                                       err_msg=f"level {l} vertex {v}")
    vertex = np.asarray(activations.leaky_relu(
        states[-1].sum(axis=(1, 2))))[:n]
    np.testing.assert_allclose(vertex, ref_vf, rtol=1e-9, atol=1e-12)
    gf = np.asarray(_graph_feature(states[-1], g["vmask"]))
    np.testing.assert_allclose(gf, ref_gf, rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(model.Predict(mol), ref_pred, rtol=1e-9)


def test_smp_omega_capping_exercised(tmp_path):
    """The (9, 9, 3) case must actually trigger the receptive-field cap —
    some uncapped |phi| exceeds rf (SMP_omega.h:476-507)."""
    from graphflow_tpu.core import prep
    mol = build_molecule(9, 4, 303)
    capped = prep.prepare_graph(mol, 3, 9, 3, 3)
    free = prep.prepare_graph(mol, 3, 9, None, 3)
    assert (np.asarray(free.sizes)[1:, :9]
            > np.asarray(capped.sizes)[1:, :9]).any()


@pytest.mark.parametrize("n,V,rf,L,C,seed", [
    (5, 6, 3, 2, 4, 404),     # capped + padded
    (7, 8, 4, 3, 5, 505),     # capped, deeper
])
def test_smp_theta_matches_reference_binary(tmp_path, n, V, rf, L, C, seed):
    from graphflow_tpu.models.smp1d import (SMP1D, SMP1DConfig, smp1d_states,
                                            _graph_feature)
    from graphflow_tpu.ops import activations

    nFeat, nDepth = 4, 3
    cfg = SMP1DConfig(max_nVertices=V, max_receptive_field=rf, nLevels=L,
                      nChanels=C, nFeatures=nFeat, nDepth=nDepth,
                      filter="theta", dtype="float64")
    model = SMP1D(cfg, seed=0)
    mol = build_molecule(n, nFeat, seed)

    fn = str(tmp_path / "w.txt")
    _write_theta_weights(fn, model.params, V, L, C)
    ref_states, ref_vf, ref_gf, ref_pred = _run_harness(
        "theta", n, V, rf, L, C, nFeat, nDepth, seed, fn)

    batch = model._stack([mol])
    g = jax.tree_util.tree_map(lambda x: x[0], batch)
    states = smp1d_states(model.params, g, cfg)
    sizes = np.asarray(g["sizes"])

    for l in range(L + 1):
        for v in range(n):
            s_ref, f_ref = ref_states[l][v]
            assert sizes[l][v] == s_ref, (l, v, sizes[l][v], s_ref)
            ours = np.asarray(states[l])[v, :s_ref, :]
            np.testing.assert_allclose(ours, f_ref, rtol=1e-9, atol=1e-12,
                                       err_msg=f"level {l} vertex {v}")
    vertex = np.asarray(activations.leaky_relu(states[-1].sum(axis=1)))[:n]
    np.testing.assert_allclose(vertex, ref_vf, rtol=1e-9, atol=1e-12)
    gf = np.asarray(_graph_feature(states[-1], g["vmask"]))
    np.testing.assert_allclose(gf, ref_gf, rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(model.Predict(mol), ref_pred, rtol=1e-9)
