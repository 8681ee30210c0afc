"""Permutation-covariant tensor contraction banks (RisiContraction 4/10/18/50).

These are the flagship kernels of the CCN "Steerable Message Passing" models:
given N stacked vertex tensors T[a, b, c, f] (the a-axis indexes the stacked
neighbor tensors) and a reduced adjacency A[d, e], each contraction case fixes
two of the five indices (a,b,c,d,e), ties/contracts the rest, and emits an
[N, N, C] slab; the bank concatenates the cases along the channel axis.

Reference implementations (scalar loops / CUDA gather kernels):
  RisiContraction_4.h:79-124   (4 cases, no adjacency)
  RisiContraction_10.h:94-...  (10 "fix 2, contract 3" cases of T.A)
  RisiContraction_18.h:73-331  (the 18-case flagship; the `adj_value > 0`
                               guard at :90 drops non-positive adjacency)
  RisiContraction_50.h:94-...  (all 50 index-partition patterns)
  RisiContraction_18_gpu.h     (CUDA gather formulation)

TPU-native design: every case collapses to an einsum over a small set of
*shared reductions* of T and A.  This removes the |E| factor from the
reference's scatter loops — the whole 18-case bank costs O(N^3 C) instead of
O(|E| N^3 C) — and lands on the MXU/VPU as a handful of fused contractions.
The generic case-table engine below is the executable specification (used by
the parity tests); `risi_contraction_18` is the hand-optimized production
path with shared reductions.

All functions take one (T, A) pair; batch with `jax.vmap` (the models do).
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

nContractions_4 = 4
nContractions_10 = 10
nContractions_18 = 18
nContractions_50 = 50

# ----------------------------------------------------------------------
# Generic case-table engine (executable specification)
# ----------------------------------------------------------------------

_PAIRS: Tuple[Tuple[str, str], ...] = (
    ("a", "b"), ("a", "c"), ("a", "d"), ("a", "e"), ("b", "c"),
    ("b", "d"), ("b", "e"), ("c", "d"), ("c", "e"), ("d", "e"),
)


def _case_table_50():
    """The 50 cases in the reference's order (RisiContraction_50.h:94-431).

    Cases 1-10: fix each pair, contract the other three independently.
    Cases 11-40: fix each pair; tie each lexicographic pair of the rest.
    Cases 41-50: fix each pair; tie all three of the rest.
    Each entry: (fixed_pair, tie_group or None).
    """
    table = [(p, None) for p in _PAIRS]
    for p in _PAIRS:
        rest = [i for i in "abcde" if i not in p]
        for t in ((rest[0], rest[1]), (rest[0], rest[2]), (rest[1], rest[2])):
            table.append((p, t))
    for p in _PAIRS:
        rest = tuple(i for i in "abcde" if i not in p)
        table.append((p, rest))
    return tuple(table)


_TABLE_50 = _case_table_50()

# The 18-case subset, by 1-based position in the 50-case table
# (the "(k/50)" comments in RisiContraction_18.h:103-319).
_SUBSET_18 = (1, 3, 5, 6, 10, 11, 13, 17, 18, 23, 26, 27, 28, 38, 40, 43, 46, 50)


def _case_einsum(T, A, fixed, tie):
    """One contraction case as an einsum of T[a,b,c,f] and A[d,e]."""
    sym = {i: i for i in "abcde"}
    if tie is not None:
        for i in tie[1:]:
            sym[i] = tie[0]
    t_sub = sym["a"] + sym["b"] + sym["c"] + "f"
    a_sub = sym["d"] + sym["e"]
    out = sym[fixed[0]] + sym[fixed[1]] + "f"
    return jnp.einsum(f"{t_sub},{a_sub}->{out}", T, A)


def _contract_cases(T, A, cases: Sequence[int]):
    """Run selected (1-based) 50-table cases and concat along channels."""
    outs = [_case_einsum(T, A, *_TABLE_50[c - 1]) for c in cases]
    return jnp.concatenate(outs, axis=-1)


# ----------------------------------------------------------------------
# Public contraction banks
# ----------------------------------------------------------------------

def risi_contraction_4(T):
    """``RisiContraction_4.h:79-124``: 4 contractions of T[a,b,c,f], no
    adjacency: (a,b)/sum c; (b,c)/sum a; diag a==b; diag b==c."""
    y1 = T.sum(axis=2)                      # Case 1: fix (a,b), contract c
    y2 = T.sum(axis=0)                      # Case 2: fix (b,c), contract a
    y3 = jnp.einsum("aacf->acf", T)         # Case 3: (a==b, c)
    y4 = jnp.einsum("abbf->abf", T)         # Case 4: (a, b==c)
    return jnp.concatenate([y1, y2, y3, y4], axis=-1)


def risi_contraction_10(T, A):
    """``RisiContraction_10.h:94-...``: the 10 "fix 2, contract 3" cases.

    No positivity guard in the reference (plain multiplication by A)."""
    return _contract_cases(T, A, range(1, 11))


def risi_contraction_50(T, A):
    """``RisiContraction_50.h:94-431``: all 50 cases, reference order."""
    return _contract_cases(T, A, range(1, 51))


def risi_contraction_18_spec(T, A):
    """Executable specification of the 18-case bank via the generic engine.

    Applies the reference's ``adj_value > 0`` guard (RisiContraction_18.h:90).
    Used as ground truth by the parity tests; prefer
    :func:`risi_contraction_18` in models.
    """
    Ap = jnp.where(A > 0, A, jnp.zeros_like(A))
    return _contract_cases(T, Ap, _SUBSET_18)


def risi_contraction_18(T, A):
    """Optimized 18-case contraction bank via shared reductions.

    T: [N, N, N, C] stacked neighbor tensors (axis 0 = stacking axis "a"),
    A: [N, N] reduced adjacency.  Returns [N, N, 18*C] with depth layout
    case*C + f, matching ``RisiContraction_18.h`` / ``Tensor3D.h:37``.

    Decomposition: with Ap = A * (A > 0),
      S = sum Ap, R[d] = sum_e Ap[d,e], trA = tr Ap,
      and the T-reductions below, every case is a (broadcast) outer product
      or a single small matmul — O(N^3 C) total work, MXU-friendly.
    """
    Ap = jnp.where(A > 0, A, jnp.zeros_like(A))
    S = Ap.sum()
    R = Ap.sum(axis=1)                       # [N]
    trA = jnp.trace(Ap)
    # f32 (or wider) accumulation: hits the native MXU bf16xbf16->f32 path
    # for bf16 states (~6x faster than plain bf16 einsum on TPU, measured)
    # and costs nothing for f32/f64.
    acc_t = jnp.promote_types(T.dtype, jnp.float32)
    ein = functools.partial(jnp.einsum, preferred_element_type=acc_t)
    cast = lambda x: x.astype(T.dtype)

    T_ab = T.sum(axis=2)                     # [a,b,f] = sum_c
    T_bc = T.sum(axis=0)                     # [b,c,f] = sum_a
    T_a = T_ab.sum(axis=1)                   # [a,f]
    T_b = T_bc.sum(axis=1)                   # [b,f]
    T_full = T_a.sum(axis=0)                 # [f]
    D_bc = jnp.einsum("abbf->abf", T)        # T[a,b,b,f]
    D_ac = jnp.einsum("abaf->abf", T)        # T[a,b,a,f] (kept as [a,b,f])
    D_aab = jnp.einsum("aacf->acf", T)       # T[a,a,c,f] (as [a,c,f])
    s14 = D_aab.sum(axis=(0))                # [c,f] -> sum_a; then sum over c below
    s14 = s14.sum(axis=0)                    # sum_{a,c} T[a,a,c,f]
    s15 = D_bc.sum(axis=(0, 1))              # sum_{a,b} T[a,b,b,f]
    t18 = jnp.einsum("aaaf->af", T).sum(axis=0)
    W16 = jnp.einsum("aeef->aef", T)         # T[a,e,e,f]
    W17 = jnp.einsum("ebef->bef", T)         # T[e,b,e,f]
    Tdiag_ac_b = D_ac.sum(axis=0)            # sum_a T[a,b,a,f] -> [b,f]
    Tdiag_bc_a = D_bc.sum(axis=1)            # sum_b T[a,b,b,f] -> [a,f]

    def outer_vR(u):                         # u: [N, f] -> u[x,f]*R[y]
        return u[:, None, :] * R[None, :, None]

    AoT = Ap[:, :, None]

    y1 = T_ab * S                                         # (a,b) c,d,e
    y2 = outer_vR(T_a)                                    # (a,d) b,c,e
    y3 = T_bc * S                                         # (b,c) a,d,e
    y4 = outer_vR(T_b)                                    # (b,d) a,c,e
    y5 = AoT * T_full[None, None, :]                      # (d,e) a,b,c
    y6 = cast(ein("abdf,d->abf", T, R))                   # (a,b) c==d | e
    y7 = T_ab * trA                                       # (a,b) d==e | c
    y8 = outer_vR(Tdiag_bc_a)                             # (a,d) b==c | e
    y9 = cast(ein("aef,de->adf", T_ab, Ap))               # (a,d) b==e | c
    y10 = cast(ein("dbcf,d->bcf", T, R))                  # (b,c) a==d | e
    y11 = outer_vR(Tdiag_ac_b)                            # (b,d) a==c | e
    y12 = cast(ein("ebf,de->bdf", T_ab, Ap))              # (b,d) a==e | c
    y13 = cast(ein("bef,de->bdf", T_bc, Ap))              # (b,d) c==e | a
    y14 = AoT * s14[None, None, :]                        # (d,e) a==b | c
    y15 = AoT * s15[None, None, :]                        # (d,e) b==c | a
    y16 = cast(ein("aef,de->adf", W16, Ap))               # (a,d) b==c==e
    y17 = cast(ein("bef,de->bdf", W17, Ap))               # (b,d) a==c==e
    y18 = AoT * t18[None, None, :]                        # (d,e) a==b==c

    return jnp.concatenate(
        [y1, y2, y3, y4, y5, y6, y7, y8, y9, y10, y11, y12, y13, y14,
         y15, y16, y17, y18], axis=-1)


def risi_contraction_18_batched(T, A):
    """Batched bank: T [B, N, N, N, C], A [B, N, N] -> [B, N, N, 18C]."""
    return jax.vmap(risi_contraction_18)(T, A)


def risi_contraction_18_dropout(T, A, case_mask):
    """``RisiContraction_18_dropout.h``: case-level dropout.

    ``case_mask`` is an [18] multiplier: at train time a random 0/1 mask
    keeping ``nKept`` cases (draw with :func:`dropout_case_mask`); at eval a
    constant nKept/18 (reference line ~469).
    """
    y = risi_contraction_18(T, A)
    C = T.shape[-1]
    scale = jnp.repeat(case_mask, C)
    return y * scale[None, None, :]


def dropout_case_mask(key, nKept: int, train: bool,
                      n_cases: int = nContractions_18):
    """Draw the per-case mask used by :func:`risi_contraction_18_dropout`."""
    if not train:
        return jnp.full((n_cases,), nKept / n_cases)
    idx = jax.random.permutation(key, n_cases)[:nKept]
    return jnp.zeros((n_cases,)).at[idx].set(1.0)
