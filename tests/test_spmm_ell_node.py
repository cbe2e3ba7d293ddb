"""Node-level ELL SpMM: equality vs dense aggregation + gradients + model
integration (the scalable road-graph path, kernels/spmm_ell_node.py)."""
import numpy as np
import jax
import jax.numpy as jnp

from megacrn_tpu.data.synthetic import synthetic_road_adjacency
from megacrn_tpu.kernels.spmm_ell_node import (build_stacked_node_ell,
                                               cheb_aggregate_node_ell)
from megacrn_tpu.ops.graph import cheb_aggregate, dual_random_walk_supports


def _setup(n=37, b=3, c=5, seed=0):
    adj = synthetic_road_adjacency(n, avg_degree=5, seed=seed)
    s1, s2 = dual_random_walk_supports(adj)
    packs = build_stacked_node_ell([s1, s2])
    dense = jnp.stack([jnp.asarray(s1), jnp.asarray(s2)])
    x = jax.random.normal(jax.random.PRNGKey(1), (b, n, c))
    return packs, dense, x


def test_node_ell_matches_dense_cheb():
    packs, dense, x = _setup()
    for k in (2, 3, 4):
        want = cheb_aggregate(dense, x, k)
        got = cheb_aggregate_node_ell(packs, x, k)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-5, rtol=2e-5)


def test_node_ell_gradient_matches_dense():
    packs, dense, x = _setup()

    def f_ell(v):
        return jnp.sum(jnp.sin(cheb_aggregate_node_ell(packs, v, 3)))

    def f_dense(v):
        return jnp.sum(jnp.sin(cheb_aggregate(dense, v, 3)))

    g_e = jax.grad(f_ell)(x)
    g_d = jax.grad(f_dense)(x)
    np.testing.assert_allclose(np.asarray(g_e), np.asarray(g_d),
                               atol=2e-5, rtol=2e-5)


def test_node_ell_pack_is_runtime_arg_safe():
    # The pack must survive the split/join runtime-arg threading used by
    # every jitted step (train/steps.py).
    from megacrn_tpu.train.steps import (join_support_arrays,
                                         split_support_arrays)

    packs, dense, x = _setup()
    skel, arrs = split_support_arrays(packs)
    rebuilt = join_support_arrays(skel, arrs)
    got = cheb_aggregate_node_ell(rebuilt, x, 3)
    want = cheb_aggregate(dense, x, 3)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def test_node_ell_bucketed_equals_flat():
    """Degree-bucketed pack == flat pack (values AND gradients): bucketing
    only changes the gather layout (per-bucket max-degree padding + one
    static un-permute), never the math."""
    from megacrn_tpu.kernels.spmm_ell_node import (BucketedStackedNodeELL,
                                                   StackedNodeELL, pack_nnz)

    n = 64
    adj = synthetic_road_adjacency(n, avg_degree=5, seed=1)
    s1, s2 = dual_random_walk_supports(adj)
    flat = build_stacked_node_ell([s1, s2], max_buckets=1)
    bucketed = build_stacked_node_ell([s1, s2], max_buckets=4,
                                      min_saving=0.0)
    assert isinstance(flat, StackedNodeELL)
    assert isinstance(bucketed, BucketedStackedNodeELL)
    assert pack_nnz(flat) == pack_nnz(bucketed)
    # Bucketing stores fewer padded slots than the flat layout.
    flat_slots = flat.pack.w.shape[0] * flat.pack.w.shape[1]
    bucket_slots = sum(int(np.prod(w.shape)) for w in bucketed.fwd_w)
    assert bucket_slots <= flat_slots

    x = jax.random.normal(jax.random.PRNGKey(3), (2, n, 4))
    for k in (2, 3):
        a = cheb_aggregate_node_ell(flat, x, k)
        b = cheb_aggregate_node_ell(bucketed, x, k)
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=2e-5, rtol=2e-5)
    ga = jax.grad(lambda v: jnp.sum(jnp.sin(
        cheb_aggregate_node_ell(flat, v, 3))))(x)
    gb = jax.grad(lambda v: jnp.sum(jnp.sin(
        cheb_aggregate_node_ell(bucketed, v, 3))))(x)
    np.testing.assert_allclose(np.asarray(gb), np.asarray(ga),
                               atol=2e-5, rtol=2e-5)


def test_node_ell_full_model_matches_dense_road():
    """road_sparse forward with the node-ELL pack == the COO-pack forward."""
    from megacrn_tpu.config import MegaCRNConfig
    from megacrn_tpu.kernels.spmm_coo import build_stacked_road_pack
    from megacrn_tpu.models import megacrn

    n = 24
    adj = synthetic_road_adjacency(n, avg_degree=4, seed=3)
    s1, s2 = dual_random_walk_supports(adj)
    ell = build_stacked_node_ell([s1, s2])
    coo = build_stacked_road_pack([s1, s2], impl="xla")
    cfg = MegaCRNConfig(num_nodes=n, rnn_units=8, mem_num=4, mem_dim=8,
                        horizon=3, seq_len=3, graph_backend="road_sparse")
    params = megacrn.init_params(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 3, n, 1))
    ycov = jax.random.normal(jax.random.PRNGKey(2), (2, 3, n, 1))
    out_e = megacrn.forward(params, x, ycov, cfg, road_supports=ell)
    out_c = megacrn.forward(params, x, ycov, cfg, road_supports=coo)
    np.testing.assert_allclose(np.asarray(out_e.output),
                               np.asarray(out_c.output),
                               atol=2e-5, rtol=2e-5)


def test_node_ell_trains():
    from megacrn_tpu.config import MegaCRNConfig, TrainConfig
    from megacrn_tpu.models import megacrn
    from megacrn_tpu.train.optim import make_optimizer
    from megacrn_tpu.train.steps import make_train_step

    n = 24
    adj = synthetic_road_adjacency(n, avg_degree=4, seed=3)
    packs = build_stacked_node_ell(list(dual_random_walk_supports(adj)))
    cfg = MegaCRNConfig(num_nodes=n, rnn_units=8, mem_num=4, mem_dim=8,
                        horizon=3, seq_len=3, graph_backend="road_sparse")
    tcfg = TrainConfig(batch_size=4, lr=0.01)
    params = megacrn.init_params(jax.random.PRNGKey(0), cfg)
    opt = make_optimizer(tcfg, steps_per_epoch=10)
    step = make_train_step(cfg, tcfg, opt, road_supports=packs)
    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    x = jax.random.normal(ks[0], (4, 3, n, 1))
    y = jax.random.normal(ks[1], (4, 3, n, 1))
    ycov = jax.random.normal(ks[2], (4, 3, n, 1))
    state = opt.init(params)
    losses = []
    for i in range(5):
        params, state, loss = step(params, state, x, y, ycov,
                                   jnp.float32(i), jax.random.PRNGKey(2))
        losses.append(float(loss))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]


def test_node_ell_mesh_node_partition_matches_single_device():
    """Node-partitioned ELL train step on a (2, 4) mesh must reproduce the
    single-device update (all-gather over the node axis; autodiff inserts
    the dx scatter/psum_scatter)."""
    from megacrn_tpu.config import MegaCRNConfig, TrainConfig
    from megacrn_tpu.kernels.spmm_ell_node import shard_node_ell
    from megacrn_tpu.models import megacrn
    from megacrn_tpu.parallel.api import make_road_node_train_step
    from megacrn_tpu.parallel.mesh import make_mesh, shard_batch
    from megacrn_tpu.train.optim import make_optimizer
    from megacrn_tpu.train.steps import make_train_step

    n = 16
    adj = synthetic_road_adjacency(n, avg_degree=4, seed=2)
    s1, s2 = dual_random_walk_supports(adj)
    cfg = MegaCRNConfig(num_nodes=n, rnn_units=8, mem_num=4, mem_dim=8,
                        horizon=4, seq_len=4, cl_decay_steps=10,
                        graph_backend="road_sparse")
    tcfg = TrainConfig(batch_size=8, lr=0.01)
    params = megacrn.init_params(jax.random.PRNGKey(7), cfg)
    opt = make_optimizer(tcfg, steps_per_epoch=10)
    ks = jax.random.split(jax.random.PRNGKey(8), 3)
    x = np.asarray(jax.random.normal(ks[0], (8, 4, n, 1)))
    y = np.asarray(jax.random.normal(ks[1], (8, 4, n, 1)))
    ycov = np.asarray(jax.random.normal(ks[2], (8, 4, n, 1)))
    rng = jax.random.PRNGKey(9)
    b = 5.0

    base = make_train_step(cfg, tcfg, opt,
                           road_supports=build_stacked_node_ell([s1, s2]))
    p1, _, loss1 = base(params, opt.init(params), x, y, ycov, b, rng)

    mesh = make_mesh(2, 4)
    step = make_road_node_train_step(
        cfg, tcfg, opt, mesh, shard_node_ell([s1, s2], 4), donate=False)
    xs, ys, ycs = shard_batch((x, y, ycov), mesh)
    p2, _, loss2 = step(params, opt.init(params), xs, ys, ycs,
                        jnp.float32(b), rng)
    np.testing.assert_allclose(float(loss2), float(loss1), rtol=1e-5)
    for a, c in zip(jax.tree_util.tree_leaves(p1),
                    jax.tree_util.tree_leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   atol=1e-5, rtol=1e-4)


def _skewed_adjacency(n, seed=11):
    """Adjacency with a spread-out degree profile (so bucketing saves),
    plus an isolated node and a hub row."""
    rng = np.random.RandomState(seed)
    adj = (rng.rand(n, n) < 0.08).astype(np.float32)
    adj[3] = 0.0
    adj[:, 3] = 0.0  # isolated node
    adj[9] = 1.0
    adj[9, 9] = 0.0  # hub row
    np.fill_diagonal(adj, 0.0)
    return adj


def test_node_ell_bucketed_mesh_matches_flat_and_single_device():
    """Shape-uniform degree-bucketed sharded packs (BucketedShardedNodeELL)
    must reproduce BOTH the flat sharded update and the single-device
    update on a (2, 4) mesh — bucketing on the per-device degree ENVELOPE
    changes only the gather layout, never the math. The graph includes an
    isolated node and a hub row (degenerate degree-profile edge cases)."""
    from megacrn_tpu.config import MegaCRNConfig, TrainConfig
    from megacrn_tpu.kernels.spmm_ell_node import (BucketedShardedNodeELL,
                                                   ShardedNodeELL,
                                                   shard_node_ell)
    from megacrn_tpu.models import megacrn
    from megacrn_tpu.parallel.api import make_road_node_train_step
    from megacrn_tpu.parallel.mesh import make_mesh, shard_batch
    from megacrn_tpu.train.optim import make_optimizer
    from megacrn_tpu.train.steps import make_train_step

    n = 32
    s1, s2 = dual_random_walk_supports(_skewed_adjacency(n))
    cfg = MegaCRNConfig(num_nodes=n, rnn_units=8, mem_num=4, mem_dim=8,
                        horizon=4, seq_len=4, cl_decay_steps=10,
                        graph_backend="road_sparse")
    tcfg = TrainConfig(batch_size=8, lr=0.01)
    params = megacrn.init_params(jax.random.PRNGKey(7), cfg)
    opt = make_optimizer(tcfg, steps_per_epoch=10)
    ks = jax.random.split(jax.random.PRNGKey(8), 3)
    x = np.asarray(jax.random.normal(ks[0], (8, 4, n, 1)))
    y = np.asarray(jax.random.normal(ks[1], (8, 4, n, 1)))
    ycov = np.asarray(jax.random.normal(ks[2], (8, 4, n, 1)))
    rng = jax.random.PRNGKey(9)
    b = 5.0

    base = make_train_step(cfg, tcfg, opt,
                           road_supports=build_stacked_node_ell(
                               [s1, s2], max_buckets=1))
    p1, _, loss1 = base(params, opt.init(params), x, y, ycov, b, rng)

    flat = shard_node_ell([s1, s2], 4, max_buckets=1)
    bucketed = shard_node_ell([s1, s2], 4, max_buckets=4, min_saving=0.0)
    assert isinstance(flat, ShardedNodeELL)
    assert isinstance(bucketed, BucketedShardedNodeELL)
    # The bucketed pack stores fewer padded slots than the flat one (the
    # whole point), at identical stored-edge count.
    flat_slots = int(np.prod(flat.w.shape))
    bucket_slots = sum(int(np.prod(np.asarray(w).shape))
                       for sup in bucketed.w for w in sup)
    assert bucket_slots < flat_slots
    flat_nnz = int(np.count_nonzero(np.asarray(flat.w)))
    bucket_nnz = sum(int(np.count_nonzero(np.asarray(w)))
                     for sup in bucketed.w for w in sup)
    assert bucket_nnz == flat_nnz

    mesh = make_mesh(2, 4)
    xs, ys, ycs = shard_batch((x, y, ycov), mesh)
    results = []
    for packs in (flat, bucketed):
        step = make_road_node_train_step(cfg, tcfg, opt, mesh, packs,
                                         donate=False)
        results.append(step(params, opt.init(params), xs, ys, ycs,
                            jnp.float32(b), rng))
    for p2, _, loss2 in results:
        np.testing.assert_allclose(float(loss2), float(loss1), rtol=1e-5)
        for a, c in zip(jax.tree_util.tree_leaves(p1),
                        jax.tree_util.tree_leaves(p2)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                       atol=1e-5, rtol=1e-4)


def test_node_ell_bucketed_mesh_eval_matches_single_device():
    """Eval forward through the node-partitioned bucketed packs must equal
    the single-device forward (make_road_node_eval_forward routing)."""
    from megacrn_tpu.config import MegaCRNConfig
    from megacrn_tpu.kernels.spmm_ell_node import shard_node_ell
    from megacrn_tpu.models import megacrn
    from megacrn_tpu.parallel.api import make_road_node_eval_forward
    from megacrn_tpu.parallel.mesh import make_mesh, shard_batch

    n = 32
    s1, s2 = dual_random_walk_supports(_skewed_adjacency(n, seed=12))
    cfg = MegaCRNConfig(num_nodes=n, rnn_units=8, mem_num=4, mem_dim=8,
                        horizon=4, seq_len=4, graph_backend="road_sparse")
    params = megacrn.init_params(jax.random.PRNGKey(3), cfg)
    ks = jax.random.split(jax.random.PRNGKey(4), 2)
    x = np.asarray(jax.random.normal(ks[0], (8, 4, n, 1)))
    ycov = np.asarray(jax.random.normal(ks[1], (8, 4, n, 1)))
    want = megacrn.forward(params, x, ycov, cfg,
                           road_supports=build_stacked_node_ell(
                               [s1, s2], max_buckets=1))
    mesh = make_mesh(2, 4)
    fwd = make_road_node_eval_forward(
        cfg, mesh, shard_node_ell([s1, s2], 4, max_buckets=4,
                                  min_saving=0.0))
    xs, ycs = shard_batch((x, ycov), mesh)
    got = fwd(params, xs, ycs)
    np.testing.assert_allclose(np.asarray(got.output),
                               np.asarray(want.output),
                               atol=2e-5, rtol=2e-5)


def test_node_ell_bucketed_handles_isolated_and_hub_rows():
    """Degenerate degree profiles: isolated nodes (degree 0) and a hub row
    must bucket correctly and still match the dense aggregation."""
    n = 40
    rng = np.random.RandomState(9)
    adj = (rng.rand(n, n) < 0.08).astype(np.float32)
    adj[5] = 0.0
    adj[:, 5] = 0.0  # isolated node
    adj[7] = 1.0
    adj[7, 7] = 0.0  # hub row: degree n-1
    s1, s2 = dual_random_walk_supports(adj)
    packs = build_stacked_node_ell([s1, s2], max_buckets=4, min_saving=0.0)
    from megacrn_tpu.kernels.spmm_ell_node import BucketedStackedNodeELL

    assert isinstance(packs, BucketedStackedNodeELL)
    dense = jnp.stack([jnp.asarray(s1), jnp.asarray(s2)])
    x = jax.random.normal(jax.random.PRNGKey(4), (2, n, 3))
    got = cheb_aggregate_node_ell(packs, x, 3)
    want = cheb_aggregate(dense, x, 3)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def test_bucket_splits_dp_is_optimal():
    """The DP cut-point search must find the true minimum padded-slot total
    over all bucketings (brute force over cut combinations on small random
    degree profiles)."""
    import itertools

    from megacrn_tpu.kernels.spmm_ell_node import _bucket_splits

    rng = np.random.RandomState(0)
    for trial in range(20):
        deg = np.sort(rng.randint(0, 12, size=rng.randint(3, 16)))
        max_buckets = rng.randint(1, 5)
        best, cuts = _bucket_splits(deg, max_buckets)
        # The returned cuts must cost what the DP claims and cover all rows.
        starts = [0] + cuts[:-1]
        cost = sum((e - s) * int(deg[e - 1])
                   for s, e in zip(starts, cuts))
        assert best == cost
        assert cuts[-1] == len(deg)
        # Brute force: all ways to split [0, len) into <= max_buckets
        # contiguous groups cut at distinct-degree boundaries.
        ends = sorted(set(np.searchsorted(deg, np.unique(deg), "right")))
        brute = min(
            (sum((e - s) * int(deg[e - 1])
                 for s, e in zip([0] + list(c[:-1]), c))
             for k in range(1, max_buckets + 1)
             for c in itertools.combinations(ends, k)
             if c and c[-1] == len(deg)),
            default=None)
        assert brute is not None and best == brute, (deg, max_buckets)
        del cost


def test_sharded_bucketed_builder_invariants():
    """Every stored edge appears exactly once with its original weight, and
    each device's inv is a permutation of its local rows."""
    from megacrn_tpu.kernels.spmm_ell_node import (BucketedShardedNodeELL,
                                                   shard_node_ell)

    n, shards = 48, 4
    s1, s2 = dual_random_walk_supports(_skewed_adjacency(n, seed=21))
    packs = shard_node_ell([s1, s2], shards, max_buckets=4, min_saving=0.0)
    assert isinstance(packs, BucketedShardedNodeELL)
    n_loc = n // shards
    for si, sup in enumerate([s1, s2]):
        inv = np.asarray(packs.inv[si])
        for dev in range(shards):
            assert sorted(inv[dev]) == list(range(n_loc))
            orig_of = np.argsort(inv[dev])  # sorted rank -> original row
            # Reconstruct this device's row block from its buckets
            # (bucket widths differ — walk them in concat order).
            recon = np.zeros((n_loc, n), np.float32)
            r_sorted = 0
            for nbr_b, w_b in zip(packs.nbr[si], packs.w[si]):
                for i in range(nbr_b.shape[1]):  # n_b rows per device
                    row = orig_of[r_sorted]
                    for c, w in zip(np.asarray(nbr_b[dev][i]),
                                    np.asarray(w_b[dev][i])):
                        if w != 0:
                            recon[row, c] += w
                    r_sorted += 1
            assert r_sorted == n_loc
            blk = sup[dev * n_loc:(dev + 1) * n_loc]
            np.testing.assert_allclose(recon, blk, atol=1e-6)
