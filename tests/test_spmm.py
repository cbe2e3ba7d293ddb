"""Pallas block-sparse SpMM: correctness vs dense matmul (interpret mode on
CPU; the same kernel compiles via Mosaic on TPU)."""
import numpy as np
import jax
import jax.numpy as jnp

from megacrn_tpu.data.synthetic import synthetic_road_adjacency
from megacrn_tpu.kernels.spmm import (BLOCK, spmm, spmm_batched,
                                      to_block_ell, transpose_block_ell)


def _sparse_mat(n, seed=0, density=0.03):
    rng = np.random.RandomState(seed)
    a = (rng.rand(n, n) < density).astype(np.float32) * rng.randn(n, n)
    return a.astype(np.float32)


def test_block_ell_roundtrip_structure():
    a = _sparse_mat(200)
    pack = to_block_ell(a)
    assert pack.n == 256 and pack.n_orig == 200
    assert pack.data.shape[2:] == (BLOCK, BLOCK)
    # Reassemble dense from the pack and compare.
    dense = np.zeros((pack.n, pack.n), np.float32)
    for i in range(pack.n // BLOCK):
        for r in range(int(pack.nnz_blocks[i])):
            c = int(pack.cols[i, r])
            dense[i * BLOCK:(i + 1) * BLOCK, c * BLOCK:(c + 1) * BLOCK] += \
                np.asarray(pack.data[i, r])
    np.testing.assert_allclose(dense[:200, :200], a, atol=1e-6)


def test_spmm_matches_dense():
    n, f = 200, 96
    a = _sparse_mat(n, seed=1)
    x = np.random.RandomState(2).randn(n, f).astype(np.float32)
    pack = to_block_ell(a)
    pack_t = transpose_block_ell(a)
    y = spmm(pack, pack_t, jnp.asarray(x), True)
    np.testing.assert_allclose(np.asarray(y), a @ x, atol=1e-4, rtol=1e-4)


def test_spmm_gradient_is_transpose_spmm():
    n, f = 140, 64
    a = _sparse_mat(n, seed=3)
    x = np.random.RandomState(4).randn(n, f).astype(np.float32)
    pack, pack_t = to_block_ell(a), transpose_block_ell(a)

    def loss(x):
        return jnp.sum(spmm(pack, pack_t, x, True) ** 2)

    g = jax.grad(loss)(jnp.asarray(x))
    want = 2 * a.T @ (a @ x)
    np.testing.assert_allclose(np.asarray(g), want, atol=1e-3, rtol=1e-4)


def test_spmm_batched_matches_einsum():
    n, b, c = 150, 4, 16
    a = np.asarray(synthetic_road_adjacency(n, avg_degree=4), np.float32)
    x = np.random.RandomState(5).randn(b, n, c).astype(np.float32)
    pack, pack_t = to_block_ell(a), transpose_block_ell(a)
    y = spmm_batched(pack, pack_t, jnp.asarray(x), True)
    want = np.einsum("nm,bmc->bnc", a, x)
    np.testing.assert_allclose(np.asarray(y), want, atol=1e-4, rtol=1e-4)
