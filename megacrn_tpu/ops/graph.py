"""Graph aggregation ops: Chebyshev neighborhood aggregation and the learned
meta-graph generator.

These are the compute-hot ops of the framework. Semantics reproduce the
reference AGCN support construction (``model/MegaCRN.py:16-27``) and the
hypernetwork meta-graph (``model/MegaCRN.py:168-173``) but the implementation
is TPU-first:

* Chebyshev polynomials are never materialised as N x N matrices. The
  reference builds ``[I, A, 2*A@T_{k-1} - T_{k-2}]`` as explicit supports and
  multiplies each into ``x`` (O(N^3) to build + O(N^2 B C) to apply). Here the
  recursion is applied directly to the feature tensor:
  ``t_k(x) = 2 A @ t_{k-1}(x) - t_{k-2}(x)``, which is mathematically
  identical, keeps every op a large MXU matmul, and avoids the N x N
  intermediate entirely.
* The per-support stacks are returned as one ``(B, N, S*K, C)`` tensor whose
  third axis preserves the reference concatenation order
  ``[I, g1, T2(g1), ..., I, g2, T2(g2), ...]`` so that a flat reshape matches
  the reference weight layout bit-for-bit (weight-portability).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def support_matmul(support: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """``einsum('nm,bmc->bnc')``: aggregate node features over one support.

    support: (N, N) dense row-stochastic adjacency; x: (B, N, C).
    Lowers to a single (N, N) @ (N, B*C) MXU matmul.
    """
    return jnp.einsum(
        "nm,bmc->bnc", support, x, preferred_element_type=x.dtype
    )


def cheb_aggregate(
    supports: jnp.ndarray, x: jnp.ndarray, cheb_k: int
) -> jnp.ndarray:
    """Chebyshev feature stack for every support, in reference concat order.

    Args:
      supports: (S, N, N) stacked dense supports (S=2 for MegaCRN).
      x: (B, N, C) node features.
      cheb_k: number of Chebyshev terms per support (>= 2).

    Returns:
      (B, N, S*cheb_k, C): ``out[:, :, s*K + k]`` is ``T_k(A_s) @ x`` with
      ``T_0 = I, T_1 = A`` — exactly the reference's ``support_set`` order
      (``model/MegaCRN.py:17-26``).

    Implementation note: an S-batched einsum (``snm,sbmc->sbnc``) was
    measured SLOWER than per-support matmuls on v5e (169 vs 138 ms/step at
    the EXPY-TKY config) — the batched layout defeats XLA's single-matmul
    tiling — so the recursion stays a plain per-support loop.
    """
    num_supports = supports.shape[0]
    terms = []
    for s in range(num_supports):
        a = supports[s]
        t_prev, t_cur = x, support_matmul(a, x)
        terms.append(t_prev)
        terms.append(t_cur)
        for _ in range(2, cheb_k):
            t_prev, t_cur = t_cur, 2.0 * support_matmul(a, t_cur) - t_prev
            terms.append(t_cur)
    return jnp.stack(terms, axis=2)


def cheb_support_stack(supports: jnp.ndarray, cheb_k: int) -> jnp.ndarray:
    """Precompute the row-stacked Chebyshev polynomial matrices, once per
    forward: ``[T_1(A_0); ..; T_{K-1}(A_0); T_1(A_1); ..]`` -> ((K-1)*S*N, N).

    Each extra term is one (N, N) @ (N, N) matmul via the matrix recursion
    ``T_k = 2 A T_{k-1} - T_{k-2}`` (~2N^3 FLOPs — trivial next to the ~24
    aggregations per train step that reuse the stack; ~0.2 ms at N=1843
    bf16). T_0 = I is NOT stacked: multiplying by the identity would waste
    S*N^2*B*C FLOPs per aggregation, so ``cheb_aggregate_prestacked``
    splices ``x`` itself in.
    """
    s_num, n, _ = supports.shape
    rows = []
    for s in range(s_num):
        a = supports[s]
        t_prev, t_cur = jnp.eye(n, dtype=a.dtype), a
        rows.append(a)
        for _ in range(2, cheb_k):
            t_prev, t_cur = t_cur, 2.0 * (a @ t_cur) - t_prev
            rows.append(t_cur)
    return jnp.concatenate(rows, axis=0)


def cheb_aggregate_prestacked(stack: jnp.ndarray, num_supports: int,
                              x: jnp.ndarray, cheb_k: int) -> jnp.ndarray:
    """Chebyshev feature stack via ONE tall matmul over a precomputed
    polynomial stack (``cheb_support_stack``).

    Replaces the (K-1)-deep *sequential* per-support feature recursion of
    ``cheb_aggregate`` (2S dependent matmuls per aggregation at K=3) with a
    single ``((K-1)*S*N, N) @ (N, B*C)`` MXU matmul: chain depth 1, one
    matmul S*(K-1)x the size — same FLOPs, far better MXU occupancy and
    launch count. Identical math (T_k(A) @ x == the feature recursion);
    output layout/order identical to ``cheb_aggregate``: (B, N, S*K, C) with
    ``[I, A, T2(A), ...]`` per support.
    """
    b, n, c = x.shape
    km1 = cheb_k - 1
    y = jnp.einsum("pm,bmc->bpc", stack, x,
                   preferred_element_type=x.dtype)
    # p-axis slices are contiguous (B, N, C) blocks (p = (s*(K-1)+k-1)*N+n),
    # so the output assembles exactly like cheb_aggregate's term stack — no
    # 5-D transpose (a measured 26% step regression in an earlier variant).
    terms = []
    for s in range(num_supports):
        terms.append(x)
        for k in range(km1):
            lo = (s * km1 + k) * n
            terms.append(y[:, lo:lo + n, :])
    return jnp.stack(terms, axis=2)


def cheb_aggregate_sparse_stacked(packs, x: jnp.ndarray, cheb_k: int,
                                  interpret=None) -> jnp.ndarray:
    """Chebyshev stack over static sparse supports via ONE block-diagonal
    COO pack: the recursion over all S supports runs on stacked features
    (``kernels.spmm_coo.StackedRoadPack``), so each Chebyshev level is a
    single padding-free kernel invocation instead of S Block-ELL calls —
    measured 2x+ fewer kernel launches at EXPY-TKY shapes. Output
    layout/order identical to ``cheb_aggregate`` (support-major)."""
    from megacrn_tpu.kernels.spmm_coo import spmm_coo, spmm_coo_xla

    if packs.impl == "xla":
        apply = lambda v: spmm_coo_xla(packs.pack, v)
    else:
        apply = lambda v: spmm_coo(packs.pack, packs.pack_t, v, interpret)
    s_num, n_pad = packs.num_supports, packs.n_pad
    b, n, c = x.shape
    flat = jnp.transpose(x, (1, 0, 2)).reshape(n, b * c)
    xp = flat if n == n_pad else jnp.zeros(
        (n_pad, b * c), flat.dtype).at[:n].set(flat)
    x_stack = jnp.tile(xp, (s_num, 1))  # (S*n_pad, f)
    levels = [None]  # level 0 handled by `flat` directly
    t_prev, t_cur = x_stack, apply(x_stack)
    levels.append(t_cur)
    for _ in range(2, cheb_k):
        t_prev, t_cur = t_cur, 2.0 * apply(t_cur) - t_prev
        levels.append(t_cur)
    terms = []
    for s in range(s_num):
        for k in range(cheb_k):
            terms.append(flat if k == 0
                         else levels[k][s * n_pad:s * n_pad + n])
    stack = jnp.stack(terms, 1)  # (N, S*K, B*C)
    return jnp.transpose(stack.reshape(n, s_num * cheb_k, b, c),
                         (2, 0, 1, 3))


def cheb_aggregate_sparse(packs, x: jnp.ndarray, cheb_k: int,
                          interpret=None) -> jnp.ndarray:
    """Chebyshev stack over static sparse supports via the Pallas block-ELL
    SpMM kernel (megacrn_tpu.kernels.spmm). Same output layout/order as
    ``cheb_aggregate``.

    packs: sequence of (BlockELL, BlockELL_transposed) pairs, one per
    support; the sparsity pattern is fixed at trace time.
    """
    from megacrn_tpu.kernels.spmm import spmm_batched

    terms = []
    for pack, pack_t in packs:
        t_prev = x
        t_cur = spmm_batched(pack, pack_t, x, interpret)
        terms.append(t_prev)
        terms.append(t_cur)
        for _ in range(2, cheb_k):
            t_prev, t_cur = t_cur, (
                2.0 * spmm_batched(pack, pack_t, t_cur, interpret) - t_prev)
            terms.append(t_cur)
    return jnp.stack(terms, axis=2)


def dual_random_walk_supports(adj) -> "tuple":
    """DCRNN-style dual random-walk normalisation of a static road adjacency:
    ``[(D^-1 A)^T, (D^-1 A^T)^T]`` (the sparse-support convention the
    reference GTS aspires to in its commented path, GTS.py:95-99).

    Returns two dense numpy matrices with the same sparsity pattern as
    adj/adj^T — pack with ``kernels.spmm.to_block_ell`` for the sparse
    backend.
    """
    import numpy as np

    def rw(a):
        d = a.sum(1)
        # np.where evaluates both branches — divide only where d > 0 so
        # isolated nodes (degree 0) stay warning-free.
        d_inv = np.divide(1.0, d, out=np.zeros_like(d), where=d > 0)
        return (d_inv[:, None] * a).T

    adj = np.asarray(adj, np.float32)
    return rw(adj), rw(adj.T)


def meta_graph(
    memory: jnp.ndarray, we1: jnp.ndarray, we2: jnp.ndarray
) -> jnp.ndarray:
    """Hypernetwork-generated adaptive adjacency pair.

    ``E_i = We_i @ Memory``; ``g1 = softmax(relu(E1 @ E2^T))``,
    ``g2 = softmax(relu(E2 @ E1^T))`` — reference ``model/MegaCRN.py:168-173``.

    Returns (2, N, N) stacked row-stochastic supports.
    """
    e1 = we1 @ memory  # (N, d)
    e2 = we2 @ memory  # (N, d)
    logits = jax.nn.relu(e1 @ e2.T)  # (N, N)
    g1 = jax.nn.softmax(logits, axis=-1)
    g2 = jax.nn.softmax(jax.nn.relu(e2 @ e1.T), axis=-1)
    return jnp.stack([g1, g2], axis=0)
