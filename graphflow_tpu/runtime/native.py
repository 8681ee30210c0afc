"""ctypes binding for the native C++ graph-preprocessing library.

Loads ``libgraphprep.so`` (built by the Makefile in this directory; the
import auto-builds it if a compiler is available) and exposes
:func:`prepare_graph_native` with the same result type as
``graphflow_tpu.core.prep.prepare_graph``.  Falls back silently: callers
should check :func:`available` and use the pure-NumPy pipeline otherwise.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_HERE, "libgraphprep.so")
_lib = None


def _try_build() -> bool:
    try:
        subprocess.run(["make", "-C", _HERE, "-s"], check=True,
                       capture_output=True, timeout=120)
        return os.path.exists(_LIB_PATH)
    except Exception:
        return False


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH) and not _try_build():
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
    lib.gf_prepare_graph.restype = ctypes.c_int
    lib.gf_prepare_graph.argtypes = [
        i32p, f64p, f64p,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        f64p, i32p, i32p, i32p, f64p, f64p,
    ]
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def prepare_graph_native(graph, nLevels: int, max_nVertices: int,
                         max_receptive_field: Optional[int], nDepth: int,
                         has_WL_ordering: bool = True,
                         use_coulomb: bool = False,
                         use_wl_features: bool = True,
                         dtype=np.float32):
    """Native-path twin of ``prep.prepare_graph`` (same PreparedGraph out)."""
    from graphflow_tpu.core import prep as prep_mod

    lib = _load()
    assert lib is not None, "libgraphprep.so unavailable"
    n, V = graph.nVertices, max_nVertices
    P = max_receptive_field if max_receptive_field is not None else V
    L, F = nLevels, graph.nFeatures
    out_fd = F * (nDepth + 1) if use_wl_features else F

    adj = np.ascontiguousarray(graph.adj, np.int32)
    adj_pad = np.zeros((V, V), np.int32)
    adj_pad[:n, :n] = adj
    feat = np.zeros((V, F), np.float64)
    feat[:n] = graph.feature
    cou = np.zeros((V, V), np.float64)
    cou[:n, :n] = graph.coulomb

    wl_feat = np.zeros((V, out_fd), np.float64)
    sizes = np.zeros((L + 1, V), np.int32)
    nbr = np.zeros((L, V, P), np.int32)
    pos = np.full((L, V, P, P), P, np.int32)
    radj = np.zeros((L, V, P, P), np.float64)
    smask = np.zeros((L + 1, V, P, P), np.float64)

    rc = lib.gf_prepare_graph(
        adj_pad, feat, cou, n, V, F, L, P,
        int(max_receptive_field is not None), nDepth,
        int(has_WL_ordering), int(use_coulomb), int(use_wl_features),
        wl_feat, sizes, nbr, pos, radj, smask)
    assert rc == 0, f"gf_prepare_graph failed with {rc}"

    vmask = np.zeros((V,), dtype)
    vmask[:n] = 1.0
    sp = prep_mod.floyd_warshall(graph.adj)
    sp_pad = np.full((V, V), prep_mod.INF, np.int64)
    sp_pad[:n, :n] = sp
    na = np.zeros((V, V), dtype)
    na[:n, :n] = graph.norm_adj().astype(dtype)
    adjf = np.zeros((V, V), dtype)
    adjf[:n, :n] = (graph.adj[:n, :n] > 0).astype(dtype)
    raw = np.zeros((V, F), dtype)
    raw[:n] = graph.feature.astype(dtype)
    dist_pad = np.zeros((V, V), dtype)
    dist_pad[:n, :n] = graph.distance.astype(dtype)

    return prep_mod.PreparedGraph(
        wl_feat=wl_feat.astype(dtype), vmask=vmask, sizes=sizes, nbr=nbr,
        pos=pos, radj=radj.astype(dtype), smask=smask.astype(dtype),
        nVertices=n, norm_adj=na, adj=adjf, sp=sp_pad, raw_feat=raw,
        dist=dist_pad)
