"""Property tests for the graph ops: Chebyshev recursion, meta-graph, memory."""
import numpy as np
import jax
import jax.numpy as jnp

from megacrn_tpu.nn.cell import agcn_apply, agcn_init
from megacrn_tpu.nn.memory import memory_init, query_memory
from megacrn_tpu.ops.graph import cheb_aggregate, meta_graph


def _rand(key, shape):
    return jax.random.normal(jax.random.PRNGKey(key), shape)


def test_cheb_aggregate_matches_explicit_polynomials():
    n, b, c, k = 9, 4, 3, 4
    a1 = np.asarray(_rand(0, (n, n)))
    a2 = np.asarray(_rand(1, (n, n)))
    x = np.asarray(_rand(2, (b, n, c)))

    # Explicit reference-style construction: materialise T_k(A) then apply
    # (model/MegaCRN.py:17-26).
    def ref_stack(a):
        mats = [np.eye(n, dtype=np.float32), a]
        for _ in range(2, k):
            mats.append(2 * a @ mats[-1] - mats[-2])
        return mats

    mats = ref_stack(a1) + ref_stack(a2)
    want = np.stack([np.einsum("nm,bmc->bnc", m, x) for m in mats], axis=2)

    got = cheb_aggregate(jnp.stack([a1, a2]), jnp.asarray(x), k)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-4, rtol=1e-4)


def test_cheb_aggregate_order_is_support_major():
    # Term s*K+0 must be the identity (raw x) for every support.
    n, b, c, k = 5, 2, 2, 3
    supports = jnp.stack([_rand(0, (n, n)), _rand(1, (n, n))])
    x = _rand(2, (b, n, c))
    agg = cheb_aggregate(supports, x, k)
    np.testing.assert_allclose(np.asarray(agg[:, :, 0]), np.asarray(x), atol=1e-6)
    np.testing.assert_allclose(np.asarray(agg[:, :, k]), np.asarray(x), atol=1e-6)


def test_agcn_equals_explicit_concat_projection():
    # agcn_apply must equal concat-then-project with the same weight.
    n, b, cin, cout, k = 7, 3, 4, 5, 3
    params = agcn_init(jax.random.PRNGKey(3), cin, cout, k)
    supports = jnp.stack([_rand(0, (n, n)), _rand(1, (n, n))])
    x = _rand(2, (b, n, cin))
    agg = cheb_aggregate(supports, x, k)
    want = agg.reshape(b, n, 2 * k * cin) @ params["W"] + params["b"]
    got = agcn_apply(params, x, supports, k)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)


def test_meta_graph_row_stochastic():
    mem = memory_init(jax.random.PRNGKey(0), num_nodes=11, rnn_units=8,
                      mem_num=4, mem_dim=6)
    supports = meta_graph(mem["Memory"], mem["We1"], mem["We2"])
    assert supports.shape == (2, 11, 11)
    np.testing.assert_allclose(
        np.asarray(supports.sum(-1)), np.ones((2, 11)), atol=1e-5)
    assert np.all(np.asarray(supports) >= 0)


def test_query_memory_top2_distinct_and_ordered():
    mem = memory_init(jax.random.PRNGKey(1), num_nodes=6, rnn_units=8,
                      mem_num=5, mem_dim=7)
    h = _rand(5, (3, 6, 8))
    value, query, pos, neg = query_memory(mem, h)
    assert value.shape == (3, 6, 7) and query.shape == (3, 6, 7)
    att = jax.nn.softmax(
        (h @ mem["Wq"]) @ mem["Memory"].T, axis=-1)
    ind = np.argsort(-np.asarray(att), axis=-1)
    np.testing.assert_allclose(
        np.asarray(pos), np.asarray(mem["Memory"])[ind[..., 0]], atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(neg), np.asarray(mem["Memory"])[ind[..., 1]], atol=1e-6)


def test_cheb_prestacked_matches_recursive():
    # The stacked-polynomial speed path (one tall matmul per aggregation)
    # must equal the per-support feature recursion exactly (same math).
    from megacrn_tpu.ops.graph import (cheb_aggregate_prestacked,
                                       cheb_support_stack)

    for k in (2, 3, 4):
        n, b, c = 13, 4, 5
        supports = jnp.stack([_rand(0, (n, n)), _rand(1, (n, n))])
        supports = jax.nn.softmax(supports, axis=-1)  # row-stochastic scale
        x = _rand(2, (b, n, c))
        want = cheb_aggregate(supports, x, k)
        stack = cheb_support_stack(supports, k)
        assert stack.shape == ((k - 1) * 2 * n, n)
        got = cheb_aggregate_prestacked(stack, 2, x, k)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-5, rtol=1e-5)


def test_cheb_prestacked_gradients_match():
    # Gradient w.r.t. BOTH the supports (the learned meta-graph) and x must
    # agree between the two dense implementations.
    from megacrn_tpu.ops.graph import (cheb_aggregate_prestacked,
                                       cheb_support_stack)

    n, b, c, k = 7, 2, 3, 3
    supports = jax.nn.softmax(jnp.stack([_rand(0, (n, n)),
                                         _rand(1, (n, n))]), axis=-1)
    x = _rand(2, (b, n, c))

    def f_rec(s, v):
        return jnp.sum(jnp.sin(cheb_aggregate(s, v, k)))

    def f_stk(s, v):
        return jnp.sum(jnp.sin(
            cheb_aggregate_prestacked(cheb_support_stack(s, k), 2, v, k)))

    gs_r, gx_r = jax.grad(f_rec, argnums=(0, 1))(supports, x)
    gs_s, gx_s = jax.grad(f_stk, argnums=(0, 1))(supports, x)
    np.testing.assert_allclose(np.asarray(gs_s), np.asarray(gs_r),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(gx_s), np.asarray(gx_r),
                               atol=1e-5, rtol=1e-5)
