"""Multi-chip sharding on the 8-device virtual CPU mesh.

Validates that the node-partitioned + data-parallel training step compiles,
runs, matches the single-device math, and keeps parameter shardings stable
across updates (SURVEY.md section 4 multi-host simulation strategy).
"""
import numpy as np
import jax
import jax.numpy as jnp

from megacrn_tpu.config import MegaCRNConfig, TrainConfig
from megacrn_tpu.models import megacrn
from megacrn_tpu.parallel.api import (make_sharded_eval_forward,
                                      make_sharded_train_step)
from megacrn_tpu.parallel.mesh import (make_mesh, shard_batch, shard_params)
from megacrn_tpu.train.optim import make_optimizer
from megacrn_tpu.train.steps import make_train_step

CFG = MegaCRNConfig(num_nodes=16, rnn_units=8, mem_num=4, mem_dim=8,
                    horizon=4, seq_len=4)
TCFG = TrainConfig(batch_size=8, lr=0.01)


def _batch(b=8):
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    x = jax.random.normal(ks[0], (b, 4, 16, 1))
    y = jax.random.normal(ks[1], (b, 4, 16, 1))
    ycov = jax.random.normal(ks[2], (b, 4, 16, 1))
    return np.asarray(x), np.asarray(y), np.asarray(ycov)


def test_mesh_construction_and_validation():
    mesh = make_mesh(2, 4)
    assert mesh.shape == {"data": 2, "node": 4}
    try:
        make_mesh(4, 4)
        assert False, "expected ValueError for oversubscribed mesh"
    except ValueError:
        pass


def test_sharded_forward_matches_single_device():
    mesh = make_mesh(2, 4)
    params = megacrn.init_params(jax.random.PRNGKey(1), CFG)
    x, y, ycov = _batch()
    want = megacrn.forward(params, x, ycov, CFG)

    sp = shard_params(params, mesh)
    sx, sycov = shard_batch((x, ycov), mesh)
    fwd = make_sharded_eval_forward(CFG, mesh)
    got = fwd(sp, sx, sycov)
    np.testing.assert_allclose(np.asarray(got.output), np.asarray(want.output),
                               atol=1e-5, rtol=1e-5)


def test_sharded_train_step_matches_single_device():
    params = megacrn.init_params(jax.random.PRNGKey(2), CFG)
    opt = make_optimizer(TCFG, steps_per_epoch=10)
    opt_state = opt.init(params)
    x, y, ycov = _batch()
    rng = jax.random.PRNGKey(3)

    # Single-device baseline (curriculum threshold ~0 at huge batches_seen so
    # the coin flips can't diverge between the two programs).
    base_step = make_train_step(CFG, TCFG, opt)
    p1, o1, loss1 = base_step(params, opt_state, x, y, ycov, 1e9, rng)

    mesh = make_mesh(2, 4)
    sp = shard_params(params, mesh)
    so = opt.init(sp)
    sx, sy, sycov = shard_batch((x, y, ycov), mesh)
    sharded_step = make_sharded_train_step(CFG, TCFG, opt, mesh, donate=False)
    p2, o2, loss2 = sharded_step(sp, so, sx, sy, sycov, 1e9, rng)

    np.testing.assert_allclose(float(loss2), float(loss1), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(p1),
                    jax.tree_util.tree_leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-4)


def test_gspmd_curriculum_rng_mid_range():
    """GSPMD step == single-device step at a MID-RANGE curriculum counter
    (threshold ~0.5, so the scheduled-sampling coins actually matter), and
    consecutive counters draw different coins (the per-step fold_in)."""
    cfg = MegaCRNConfig(num_nodes=16, rnn_units=8, mem_num=4, mem_dim=8,
                        horizon=4, seq_len=4, cl_decay_steps=10)
    params = megacrn.init_params(jax.random.PRNGKey(21), cfg)
    opt = make_optimizer(TCFG, steps_per_epoch=10)
    x, y, ycov = _batch()
    rng = jax.random.PRNGKey(22)
    b = 23.0  # threshold = 10 / (10 + e^2.3) ~ 0.5

    base_step = make_train_step(cfg, TCFG, opt)
    p1, _, loss1 = base_step(params, opt.init(params), x, y, ycov, b, rng)

    mesh = make_mesh(2, 4)
    sp = shard_params(params, mesh)
    sx, sy, sycov = shard_batch((x, y, ycov), mesh)
    step = make_sharded_train_step(cfg, TCFG, opt, mesh, donate=False)
    p2, _, loss2 = step(sp, opt.init(sp), sx, sy, sycov, b, rng)
    np.testing.assert_allclose(float(loss2), float(loss1), rtol=1e-5)
    for a, c in zip(jax.tree_util.tree_leaves(p1),
                    jax.tree_util.tree_leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   atol=1e-5, rtol=1e-4)

    # The coin pattern must change between consecutive steps: the folded key
    # differs, so at threshold ~0.5 the use_truth vectors diverge.
    def coins(batches_seen):
        k = jax.random.fold_in(rng, jnp.int32(batches_seen))
        ks = jax.random.split(k, cfg.horizon)
        return np.asarray(jax.vmap(lambda kk: jax.random.uniform(kk))(ks))
    thr = float(megacrn.compute_sampling_threshold(cfg.cl_decay_steps, b))
    assert not np.array_equal(coins(23) < thr, coins(24) < thr)
    # ... and the mesh step actually consumes them: same state, consecutive
    # counters -> different losses (would be equal under a per-epoch key).
    sp2 = shard_params(params, mesh)
    _, _, loss3 = step(sp2, opt.init(sp2), sx, sy, sycov, 24.0, rng)
    assert abs(float(loss3) - float(loss2)) > 1e-7


def test_shardmap_masked_loss_global_mask_normalization():
    """Zero-masked targets concentrated in one batch shard: the shard_map
    step must reproduce the GLOBAL masked-mean normalisation (psum of
    sums), not a pmean of per-shard masked means."""
    from megacrn_tpu.parallel.api import make_shardmap_train_step

    params = megacrn.init_params(jax.random.PRNGKey(31), CFG)
    opt = make_optimizer(TCFG, steps_per_epoch=10)
    x, y, ycov = _batch()
    y = y.copy()
    y[:6] = 0.0  # data shard 0 of the (2, 4) mesh is FULLY masked out
    rng = jax.random.PRNGKey(32)

    base_step = make_train_step(CFG, TCFG, opt)
    p1, _, loss1 = base_step(params, opt.init(params), x, y, ycov, 5.0, rng)

    mesh = make_mesh(2, 4)
    step = make_shardmap_train_step(CFG, TCFG, opt, mesh, donate=False)
    p2, _, loss2 = step(params, opt.init(params), x, y, ycov, 5.0, rng)
    np.testing.assert_allclose(float(loss2), float(loss1), rtol=1e-5)
    for a, c in zip(jax.tree_util.tree_leaves(p1),
                    jax.tree_util.tree_leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   atol=1e-5, rtol=1e-4)


def test_param_shardings_stable_across_updates():
    mesh = make_mesh(2, 4)
    params = megacrn.init_params(jax.random.PRNGKey(4), CFG)
    opt = make_optimizer(TCFG, steps_per_epoch=10)
    sp = shard_params(params, mesh)
    so = opt.init(sp)
    x, y, ycov = _batch()
    sx, sy, sycov = shard_batch((x, y, ycov), mesh)
    step = make_sharded_train_step(CFG, TCFG, opt, mesh, donate=False)
    p2, o2, _ = step(sp, so, sx, sy, sycov, 0.0, jax.random.PRNGKey(5))
    # We1/We2 stay row-sharded over node after the update.
    for name in ["We1", "We2"]:
        spec = p2["memory"][name].sharding.spec
        assert spec[0] == "node", f"{name} lost node sharding: {spec}"
    # Loss stays finite over several steps.
    p, o = p2, o2
    for i in range(3):
        p, o, loss = step(p, o, sx, sy, sycov, float(i), jax.random.PRNGKey(i))
    assert np.isfinite(float(loss))


def test_ring_aggregate_matches_dense():
    from megacrn_tpu.parallel.ring import make_ring_aggregate
    from megacrn_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(2, 4)
    n, b, c = 32, 8, 6  # n divisible by node axis (4)
    support = jax.random.normal(jax.random.PRNGKey(0), (n, n))
    x = jax.random.normal(jax.random.PRNGKey(1), (b, n, c))
    agg = make_ring_aggregate(mesh)
    got = agg(support, x)
    want = jnp.einsum("nm,bmc->bnc", support, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_ring_aggregate_grads_flow():
    from megacrn_tpu.parallel.ring import make_ring_aggregate
    from megacrn_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(1, 8)
    n, b, c = 16, 2, 3
    support = jax.random.normal(jax.random.PRNGKey(2), (n, n))
    x = jax.random.normal(jax.random.PRNGKey(3), (b, n, c))
    agg = make_ring_aggregate(mesh)

    def loss(s, x):
        return jnp.sum(agg(s, x) ** 2)

    gs, gx = jax.grad(loss, argnums=(0, 1))(support, x)
    want_y = jnp.einsum("nm,bmc->bnc", support, x)
    want_gx = jnp.einsum("nm,bnc->bmc", support, 2 * want_y)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(want_gx),
                               atol=1e-4, rtol=1e-4)
    assert np.all(np.isfinite(np.asarray(gs)))


def test_fit_with_mesh_end_to_end(tmp_path):
    """Full harness training over the virtual mesh."""
    from megacrn_tpu.config import MegaCRNConfig, TrainConfig
    from megacrn_tpu.data.datasets import build_synthetic
    from megacrn_tpu.parallel.mesh import make_mesh
    from megacrn_tpu.train.logs import RunDir
    from megacrn_tpu.train.loop import fit

    mesh = make_mesh(2, 4)
    model_cfg = MegaCRNConfig(num_nodes=16, rnn_units=8, mem_num=4, mem_dim=8,
                              horizon=3, seq_len=3)
    train_cfg = TrainConfig(batch_size=16, epochs=2, patience=5, seed=0,
                            lr_milestones=(100,))
    data = build_synthetic(num_nodes=16, num_steps=400, seq_len=3, horizon=3,
                           batch_size=16)
    run = RunDir(str(tmp_path), "SYNTH", snapshot_sources=False)
    result = fit(model_cfg, train_cfg, data, run, test_every_epoch=False,
                 mesh=mesh)
    assert np.isfinite(result["best_val"]) and result["epochs_run"] == 2


def test_ring_train_step_matches_single_device():
    """The dense_ring backend: full train step through the explicit
    ppermute ring schedule on a (2, 4) mesh must reproduce the
    single-device dense update (same math, manual collectives)."""
    from megacrn_tpu.parallel.api import make_ring_train_step

    cfg = MegaCRNConfig(num_nodes=16, rnn_units=8, mem_num=4, mem_dim=8,
                        horizon=4, seq_len=4, cl_decay_steps=10,
                        graph_backend="dense_ring")
    dense_cfg = MegaCRNConfig(num_nodes=16, rnn_units=8, mem_num=4, mem_dim=8,
                              horizon=4, seq_len=4, cl_decay_steps=10)
    params = megacrn.init_params(jax.random.PRNGKey(41), dense_cfg)
    opt = make_optimizer(TCFG, steps_per_epoch=10)
    x, y, ycov = _batch()
    y = y.copy()
    y[:2] = 0.0  # exercise the global mask normalisation too
    rng = jax.random.PRNGKey(42)
    b = 23.0  # mid-range curriculum threshold

    base_step = make_train_step(dense_cfg, TCFG, opt)
    p1, _, loss1 = base_step(params, opt.init(params), x, y, ycov, b, rng)

    mesh = make_mesh(2, 4)
    step = make_ring_train_step(cfg, TCFG, opt, mesh, donate=False)
    p2, _, loss2 = step(params, opt.init(params), x, y, ycov, b, rng)
    np.testing.assert_allclose(float(loss2), float(loss1), rtol=1e-5)
    for a, c in zip(jax.tree_util.tree_leaves(p1),
                    jax.tree_util.tree_leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   atol=1e-5, rtol=1e-4)


def test_fit_with_mesh_dense_ring_end_to_end(tmp_path):
    """Full harness training through the ring-collective path."""
    from megacrn_tpu.data.datasets import build_synthetic
    from megacrn_tpu.train.logs import RunDir
    from megacrn_tpu.train.loop import fit

    mesh = make_mesh(2, 4)
    model_cfg = MegaCRNConfig(num_nodes=16, rnn_units=8, mem_num=4, mem_dim=8,
                              horizon=3, seq_len=3,
                              graph_backend="dense_ring")
    train_cfg = TrainConfig(batch_size=16, epochs=1, patience=5, seed=0,
                            lr_milestones=(100,))
    data = build_synthetic(num_nodes=16, num_steps=200, seq_len=3, horizon=3,
                           batch_size=16)
    run = RunDir(str(tmp_path), "SYNTH", snapshot_sources=False)
    result = fit(model_cfg, train_cfg, data, run, test_every_epoch=False,
                 mesh=mesh)
    assert np.isfinite(result["best_val"]) and result["epochs_run"] == 1


def test_shardmap_train_step_road_sparse_matches_single_device():
    """The Pallas road_sparse backend on a mesh: explicit shard_map DP must
    reproduce the single-device update exactly (equal shards -> pmean of
    per-shard means == global mean; replicated RNG -> identical coins)."""
    from megacrn_tpu.data.synthetic import synthetic_road_adjacency
    from megacrn_tpu.kernels.spmm import to_block_ell, transpose_block_ell
    from megacrn_tpu.ops.graph import dual_random_walk_supports
    from megacrn_tpu.parallel.api import make_shardmap_train_step

    cfg = MegaCRNConfig(num_nodes=16, rnn_units=8, mem_num=4, mem_dim=8,
                        horizon=4, seq_len=4, graph_backend="road_sparse")
    adj = synthetic_road_adjacency(16, avg_degree=4, seed=11)
    s1, s2 = dual_random_walk_supports(adj)
    packs = [(to_block_ell(s1), transpose_block_ell(s1)),
             (to_block_ell(s2), transpose_block_ell(s2))]

    params = megacrn.init_params(jax.random.PRNGKey(7), cfg)
    opt = make_optimizer(TCFG, steps_per_epoch=10)
    opt_state = opt.init(params)
    x, y, ycov = _batch()
    rng = jax.random.PRNGKey(8)

    base_step = make_train_step(cfg, TCFG, opt, road_supports=packs)
    p1, o1, loss1 = base_step(params, opt_state, x, y, ycov, 3.0, rng)

    mesh = make_mesh(2, 4)
    step = make_shardmap_train_step(cfg, TCFG, opt, mesh, donate=False,
                                    road_supports=packs)
    p2, o2, loss2 = step(params, opt.init(params), x, y, ycov, 3.0, rng)

    np.testing.assert_allclose(float(loss2), float(loss1), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(p1),
                    jax.tree_util.tree_leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-4)


def test_sharded_train_step_sparse_meta_matches_single_device():
    """The XLA block-sparse learned meta-graph backend under GSPMD: the
    gathers + tile einsums partition over the mesh and match 1-device math."""
    from megacrn_tpu.kernels.sparse_graph import build_block_pattern

    cfg = MegaCRNConfig(num_nodes=16, rnn_units=8, mem_num=4, mem_dim=8,
                        horizon=4, seq_len=4, graph_backend="sparse_meta")
    rs = np.random.RandomState(0)
    adj = (rs.rand(16, 16) < 0.4).astype(np.float32)
    np.fill_diagonal(adj, 1)
    pattern = build_block_pattern(adj)

    params = megacrn.init_params(jax.random.PRNGKey(9), cfg)
    opt = make_optimizer(TCFG, steps_per_epoch=10)
    x, y, ycov = _batch()
    rng = jax.random.PRNGKey(10)

    base_step = make_train_step(cfg, TCFG, opt, road_supports=pattern)
    p1, o1, loss1 = base_step(params, opt.init(params), x, y, ycov, 1e9, rng)

    mesh = make_mesh(2, 4)
    sp = shard_params(params, mesh)
    so = opt.init(sp)
    sx, sy, sycov = shard_batch((x, y, ycov), mesh)
    step = make_sharded_train_step(cfg, TCFG, opt, mesh, donate=False,
                                   road_supports=pattern)
    p2, o2, loss2 = step(sp, so, sx, sy, sycov, 1e9, rng)

    np.testing.assert_allclose(float(loss2), float(loss1), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(p1),
                    jax.tree_util.tree_leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-4)


def test_sharded_train_step_sparse_meta_node_matches_single_device():
    """The node-granular learned meta-graph backend under GSPMD: the edge
    weights row-shard over the node axis, the gathers partition, and the
    mesh update matches 1-device math (same bar as the tile impl)."""
    from megacrn_tpu.kernels.sparse_graph_node import build_node_pattern

    cfg = MegaCRNConfig(num_nodes=16, rnn_units=8, mem_num=4, mem_dim=8,
                        horizon=4, seq_len=4, graph_backend="sparse_meta")
    rs = np.random.RandomState(0)
    adj = (rs.rand(16, 16) < 0.4).astype(np.float32)
    np.fill_diagonal(adj, 1)
    pattern = build_node_pattern(adj)

    params = megacrn.init_params(jax.random.PRNGKey(9), cfg)
    opt = make_optimizer(TCFG, steps_per_epoch=10)
    x, y, ycov = _batch()
    rng = jax.random.PRNGKey(10)

    base_step = make_train_step(cfg, TCFG, opt, road_supports=pattern)
    p1, o1, loss1 = base_step(params, opt.init(params), x, y, ycov, 1e9, rng)

    mesh = make_mesh(2, 4)
    sp = shard_params(params, mesh)
    so = opt.init(sp)
    sx, sy, sycov = shard_batch((x, y, ycov), mesh)
    step = make_sharded_train_step(cfg, TCFG, opt, mesh, donate=False,
                                   road_supports=pattern)
    p2, o2, loss2 = step(sp, so, sx, sy, sycov, 1e9, rng)

    np.testing.assert_allclose(float(loss2), float(loss1), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(p1),
                    jax.tree_util.tree_leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-4)


def test_sharded_train_step_sparse_meta_node_bucketed_matches_single_device():
    """The BUCKETED node-granular learned pattern under GSPMD: per-bucket
    edge-weight arrays row-shard over the node axis (degree-sorted rows
    need no node-block alignment under GSPMD — it inserts the boundary
    collectives), and the mesh update matches 1-device math. Round-4
    VERDICT item 4: the bucketed (default, fastest) learned layout no
    longer forgoes node partitioning."""
    from megacrn_tpu.kernels.sparse_graph_node import (
        BucketedNodeELLPattern, build_node_pattern_bucketed)

    cfg = MegaCRNConfig(num_nodes=16, rnn_units=8, mem_num=4, mem_dim=8,
                        horizon=4, seq_len=4, graph_backend="sparse_meta")
    rs = np.random.RandomState(5)
    adj = (rs.rand(16, 16) < 0.3).astype(np.float32)
    adj[2] = 1.0  # hub row -> spread degree profile, real buckets
    np.fill_diagonal(adj, 1)
    pattern = build_node_pattern_bucketed(adj, max_buckets=3)
    assert isinstance(pattern, BucketedNodeELLPattern)
    assert len(pattern.nbr) > 1  # actually multi-bucket

    params = megacrn.init_params(jax.random.PRNGKey(9), cfg)
    opt = make_optimizer(TCFG, steps_per_epoch=10)
    x, y, ycov = _batch()
    rng = jax.random.PRNGKey(10)

    base_step = make_train_step(cfg, TCFG, opt, road_supports=pattern)
    p1, o1, loss1 = base_step(params, opt.init(params), x, y, ycov, 1e9, rng)

    mesh = make_mesh(2, 4)
    sp = shard_params(params, mesh)
    so = opt.init(sp)
    sx, sy, sycov = shard_batch((x, y, ycov), mesh)
    step = make_sharded_train_step(cfg, TCFG, opt, mesh, donate=False,
                                   road_supports=pattern)
    p2, o2, loss2 = step(sp, so, sx, sy, sycov, 1e9, rng)

    np.testing.assert_allclose(float(loss2), float(loss1), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(p1),
                    jax.tree_util.tree_leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-4)


def test_road_node_train_step_two_layers_matches_single_device():
    """Mesh-matrix hardening (round-4 VERDICT item 7): the node-partitioned
    road backend with num_layers=2 — deeper cell stacks re-enter the
    sharded aggregation with layer-local states — must still reproduce the
    single-device update on the (2, 4) mesh."""
    from megacrn_tpu.data.synthetic import synthetic_road_adjacency
    from megacrn_tpu.kernels.spmm_ell_node import (build_stacked_node_ell,
                                                   shard_node_ell)
    from megacrn_tpu.ops.graph import dual_random_walk_supports
    from megacrn_tpu.parallel.api import make_road_node_train_step

    n = 16
    s1, s2 = dual_random_walk_supports(
        synthetic_road_adjacency(n, avg_degree=4, seed=6))
    cfg = MegaCRNConfig(num_nodes=n, rnn_units=8, mem_num=4, mem_dim=8,
                        horizon=4, seq_len=4, num_layers=2,
                        cl_decay_steps=10, graph_backend="road_sparse")
    params = megacrn.init_params(jax.random.PRNGKey(11), cfg)
    opt = make_optimizer(TCFG, steps_per_epoch=10)
    x, y, ycov = _batch()
    rng = jax.random.PRNGKey(12)

    base = make_train_step(cfg, TCFG, opt,
                           road_supports=build_stacked_node_ell(
                               [s1, s2], max_buckets=1))
    p1, _, loss1 = base(params, opt.init(params), x, y, ycov, 5.0, rng)

    mesh = make_mesh(2, 4)
    step = make_road_node_train_step(
        cfg, TCFG, opt, mesh, shard_node_ell([s1, s2], 4), donate=False)
    xs, ys, ycs = shard_batch((x, y, ycov), mesh)
    p2, _, loss2 = step(params, opt.init(params), xs, ys, ycs,
                        jnp.float32(5.0), rng)
    np.testing.assert_allclose(float(loss2), float(loss1), rtol=1e-5)
    for a, c in zip(jax.tree_util.tree_leaves(p1),
                    jax.tree_util.tree_leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   atol=1e-5, rtol=1e-4)


def test_sharded_api_rejects_road_sparse_gspmd():
    mesh = make_mesh(2, 4)
    cfg = MegaCRNConfig(num_nodes=16, rnn_units=8, mem_num=4, mem_dim=8,
                        graph_backend="road_sparse")
    opt = make_optimizer(TCFG, steps_per_epoch=10)
    try:
        make_sharded_train_step(cfg, TCFG, opt, mesh)
        assert False, "expected ValueError"
    except ValueError:
        pass


def test_fit_with_mesh_road_sparse_end_to_end(tmp_path):
    """Full harness training of the Pallas sparse backend over the mesh."""
    from megacrn_tpu.data.datasets import build_synthetic
    from megacrn_tpu.data.synthetic import synthetic_road_adjacency
    from megacrn_tpu.kernels.spmm import to_block_ell, transpose_block_ell
    from megacrn_tpu.ops.graph import dual_random_walk_supports
    from megacrn_tpu.train.logs import RunDir
    from megacrn_tpu.train.loop import fit

    n = 16
    adj = synthetic_road_adjacency(n, avg_degree=4, seed=3)
    s1, s2 = dual_random_walk_supports(adj)
    packs = [(to_block_ell(s1), transpose_block_ell(s1)),
             (to_block_ell(s2), transpose_block_ell(s2))]
    mesh = make_mesh(2, 4)
    model_cfg = MegaCRNConfig(num_nodes=n, rnn_units=8, mem_num=4, mem_dim=8,
                              horizon=3, seq_len=3,
                              graph_backend="road_sparse")
    train_cfg = TrainConfig(batch_size=16, epochs=1, patience=5, seed=0,
                            lr_milestones=(100,))
    data = build_synthetic(num_nodes=n, num_steps=200, seq_len=3, horizon=3,
                           batch_size=16)
    run = RunDir(str(tmp_path), "SYNTH", snapshot_sources=False)
    result = fit(model_cfg, train_cfg, data, run, test_every_epoch=False,
                 mesh=mesh, road_supports=packs)
    assert np.isfinite(result["best_val"]) and result["epochs_run"] == 1


def test_gts_mesh_train_step_matches_single_device():
    """GTS (the second model family) through the explicit shard_map DP
    layer: mesh update must equal the single-device update, including the
    global masked-loss normalization with zero-masked targets concentrated
    in one batch shard."""
    from megacrn_tpu.config import GTSConfig
    from megacrn_tpu.data.graph_prior import cosine_knn_graph
    from megacrn_tpu.parallel.api import make_gts_mesh_train_step
    from megacrn_tpu.train.gts_loop import make_gts_train_step

    cfg = GTSConfig(num_nodes=10, input_dim=2, output_dim=1, horizon=3,
                    seq_len=3, rnn_units=8, max_diffusion_step=2,
                    train_series_len=60, knn_k=3)
    from megacrn_tpu.models import gts

    params, bn_state = gts.init_params(jax.random.PRNGKey(5), cfg)
    feas = np.asarray(jax.random.normal(jax.random.PRNGKey(6), (60, 10)),
                      np.float32)
    knn = cosine_knn_graph(feas, 3)
    import optax

    opt = optax.chain(optax.clip_by_global_norm(5.0), optax.adam(0.005,
                                                                 eps=1e-3))
    ks = jax.random.split(jax.random.PRNGKey(7), 2)
    x = np.asarray(jax.random.normal(ks[0], (8, 3, 10, 2)), np.float32)
    y = np.array(jax.random.normal(ks[1], (8, 3, 10, 1)), np.float32)
    y[:3] = 0.0  # zero-masked rows land entirely in the first shard
    rng = jax.random.PRNGKey(8)
    b = 5.0

    base = make_gts_train_step(cfg, TCFG, opt, 1.5, 2.0, feas, knn)
    p1, bn1, _, loss1 = base(params, bn_state, opt.init(params), x, y, b, rng)

    mesh = make_mesh(2, 4)
    step = make_gts_mesh_train_step(cfg, TCFG, opt, mesh, 1.5, 2.0, feas,
                                    knn, donate=False)
    p2, bn2, _, loss2 = step(params, bn_state, opt.init(params), x, y,
                             jnp.float32(b), rng)
    np.testing.assert_allclose(float(loss2), float(loss1), rtol=1e-5)
    for a, c in zip(jax.tree_util.tree_leaves(p1),
                    jax.tree_util.tree_leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   atol=1e-5, rtol=1e-4)
    for a, c in zip(jax.tree_util.tree_leaves(bn1),
                    jax.tree_util.tree_leaves(bn2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   atol=1e-6, rtol=1e-6)


def test_gts_mesh_train_step_honors_gumbel_noise_flag():
    """gumbel_noise=False (deterministic-parity mode) must reach the mesh
    step too: a mesh gumbel_noise=False update equals the single-device
    gumbel_noise=False update (before the fix the mesh step silently
    trained WITH Gumbel noise)."""
    from megacrn_tpu.config import GTSConfig
    from megacrn_tpu.data.graph_prior import cosine_knn_graph
    from megacrn_tpu.models import gts
    from megacrn_tpu.parallel.api import make_gts_mesh_train_step
    from megacrn_tpu.train.gts_loop import make_gts_train_step
    import optax

    cfg = GTSConfig(num_nodes=10, input_dim=1, output_dim=1, horizon=3,
                    seq_len=3, rnn_units=8, max_diffusion_step=2,
                    train_series_len=60, knn_k=3)
    params, bn_state = gts.init_params(jax.random.PRNGKey(5), cfg)
    feas = np.asarray(jax.random.normal(jax.random.PRNGKey(6), (60, 10)),
                      np.float32)
    knn = cosine_knn_graph(feas, 3)
    opt = optax.adam(0.005, eps=1e-3)
    ks = jax.random.split(jax.random.PRNGKey(7), 2)
    x = np.asarray(jax.random.normal(ks[0], (8, 3, 10, 1)), np.float32)
    y = np.asarray(jax.random.normal(ks[1], (8, 3, 10, 1)), np.float32)
    rng = jax.random.PRNGKey(8)

    base = make_gts_train_step(cfg, TCFG, opt, 0.0, 1.0, feas, knn,
                               gumbel_noise=False)
    _, _, _, loss1 = base(params, bn_state, opt.init(params), x, y,
                          jnp.float32(2.0), rng)

    mesh = make_mesh(2, 4)
    step = make_gts_mesh_train_step(cfg, TCFG, opt, mesh, 0.0, 1.0, feas,
                                    knn, donate=False, gumbel_noise=False)
    _, _, _, loss2 = step(params, bn_state, opt.init(params), x, y,
                          jnp.float32(2.0), rng)
    np.testing.assert_allclose(float(loss2), float(loss1), rtol=1e-5)


def test_bf16_modes_train_on_mesh():
    """The opt-in bfloat16 compute modes compose with the mesh DP steps:
    GTS and MegaCRNx bf16 configs must run a finite shard_map step on the
    (2, 4) mesh (coverage for the bf16 x mesh combination, which is
    otherwise by-construction only)."""
    import optax

    from megacrn_tpu.config import GTSConfig
    from megacrn_tpu.data.graph_prior import cosine_knn_graph
    from megacrn_tpu.models import gts, megacrnx
    from megacrn_tpu.parallel.api import (make_gts_mesh_train_step,
                                          make_megacrnx_mesh_train_step)
    from megacrn_tpu.train.megacrnx_loop import MegaCRNxTrainConfig

    mesh = make_mesh(2, 4)
    x, y, ycov = _batch()

    gcfg = GTSConfig(num_nodes=16, input_dim=1, output_dim=1, horizon=4,
                     seq_len=4, rnn_units=8, max_diffusion_step=2,
                     train_series_len=60, knn_k=3, embedding_dim=16,
                     compute_dtype="bfloat16")
    gparams, bn = gts.init_params(jax.random.PRNGKey(0), gcfg)
    feas = np.asarray(jax.random.normal(jax.random.PRNGKey(1), (60, 16)),
                      np.float32)
    gopt = optax.adam(5e-3, eps=1e-3)
    gstep = make_gts_mesh_train_step(gcfg, TCFG, gopt, mesh, 0.0, 1.0, feas,
                                     cosine_knn_graph(feas, 3), donate=False)
    _, _, _, gloss = gstep(gparams, bn, gopt.init(gparams), x, y,
                           jnp.float32(0.0), jax.random.PRNGKey(2))
    assert np.isfinite(float(gloss))

    xcfg = megacrnx.MegaCRNxConfig(num_nodes=16, horizon=4, seq_len=4,
                                   rnn_units=8, mem_num=4, mem_dim=8,
                                   compute_dtype="bfloat16")
    xtcfg = MegaCRNxTrainConfig(batch_size=8)
    xparams = megacrnx.init_params(jax.random.PRNGKey(3), xcfg)
    xopt = optax.adam(xtcfg.lr)
    xstep = make_megacrnx_mesh_train_step(xcfg, xtcfg, xopt, mesh, 0.0, 1.0,
                                          donate=False)
    _, _, xvals = xstep(xparams, xopt.init(xparams), x, y + 1.5, ycov)
    assert np.isfinite(float(xvals[0]))


def test_fit_gts_with_mesh_end_to_end(tmp_path):
    """Full GTS harness training data-parallel on the virtual mesh."""
    from megacrn_tpu.config import GTSConfig
    from megacrn_tpu.data.datasets import build_from_series
    from megacrn_tpu.data.graph_prior import cosine_knn_graph
    from megacrn_tpu.data.synthetic import synthetic_speed_series
    from megacrn_tpu.train.gts_loop import fit_gts
    from megacrn_tpu.train.logs import RunDir

    values, index = synthetic_speed_series(300, 10)
    data = build_from_series(values, index, seq_len=4, horizon=4,
                             batch_size=16)
    train_feas = values[:210]
    knn = cosine_knn_graph(train_feas, 3)
    cfg = GTSConfig(num_nodes=10, input_dim=2, output_dim=1, horizon=4,
                    seq_len=4, rnn_units=8, max_diffusion_step=2,
                    train_series_len=210, knn_k=3)
    tcfg = TrainConfig(batch_size=16, epochs=2, patience=5, seed=0, lr=0.005)
    run = RunDir(str(tmp_path), "SYNTH", model_name="GTS",
                 snapshot_sources=False)
    result = fit_gts(cfg, tcfg, data, train_feas, knn, run, max_epochs=2,
                     mesh=make_mesh(2, 4))
    assert np.isfinite(result["best_val"])
    assert result["test_metrics"]["mae"] < 30


def _road_setup(n, avg_degree, seed):
    from megacrn_tpu.data.synthetic import synthetic_road_adjacency
    from megacrn_tpu.kernels.spmm import to_block_ell, transpose_block_ell
    from megacrn_tpu.ops.graph import dual_random_walk_supports

    adj = synthetic_road_adjacency(n, avg_degree=avg_degree, seed=seed)
    s1, s2 = dual_random_walk_supports(adj)
    packs = [(to_block_ell(s1), transpose_block_ell(s1)),
             (to_block_ell(s2), transpose_block_ell(s2))]
    return [s1, s2], packs


def _assert_node_road_parity(n, t, units, batch, avg_degree):
    """Node-partitioned road_sparse step (per-device row packs + all_gather)
    vs single-device math."""
    from megacrn_tpu.kernels.spmm import shard_road_packs
    from megacrn_tpu.parallel.api import make_road_node_train_step

    cfg = MegaCRNConfig(num_nodes=n, rnn_units=units, mem_num=4,
                        mem_dim=units, horizon=t, seq_len=t,
                        graph_backend="road_sparse")
    dense_supports, packs = _road_setup(n, avg_degree, seed=11)
    params = megacrn.init_params(jax.random.PRNGKey(7), cfg)
    opt = make_optimizer(TCFG, steps_per_epoch=10)
    rs = np.random.RandomState(1)
    x, y, ycov = (rs.randn(batch, t, n, 1).astype(np.float32)
                  for _ in range(3))
    rng = jax.random.PRNGKey(8)

    base = make_train_step(cfg, TCFG, opt, road_supports=packs)
    p1, _, loss1 = base(params, opt.init(params), x, y, ycov, 3.0, rng)

    mesh = make_mesh(2, 4)
    sp = shard_road_packs(dense_supports, 4)
    step = make_road_node_train_step(cfg, TCFG, opt, mesh, sp, donate=False)
    sx, sy, sycov = shard_batch((x, y, ycov), mesh)
    p2, _, loss2 = step(params, opt.init(params), sx, sy, sycov,
                        jnp.float32(3.0), rng)

    np.testing.assert_allclose(float(loss2), float(loss1), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(p1),
                    jax.tree_util.tree_leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-4)


def test_road_node_train_step_matches_single_device():
    _assert_node_road_parity(n=16, t=4, units=8, batch=16, avg_degree=4)


def test_road_node_train_step_multi_tile():
    """N=384 -> 3 row-blocks: exercises the multi-tile gather/SpMM paths of
    the node-partitioned Pallas backend (each device owns a rectangular
    96 x 384 row slice)."""
    _assert_node_road_parity(n=384, t=2, units=4, batch=8, avg_degree=6)


def test_road_node_eval_forward_matches_single_device():
    from megacrn_tpu.kernels.spmm import shard_road_packs
    from megacrn_tpu.parallel.api import make_road_node_eval_forward

    n, t = 16, 4
    cfg = MegaCRNConfig(num_nodes=n, rnn_units=8, mem_num=4, mem_dim=8,
                        horizon=t, seq_len=t, graph_backend="road_sparse")
    dense_supports, packs = _road_setup(n, 4, seed=11)
    params = megacrn.init_params(jax.random.PRNGKey(7), cfg)
    rs = np.random.RandomState(2)
    x = rs.randn(8, t, n, 1).astype(np.float32)
    ycov = rs.randn(8, t, n, 1).astype(np.float32)

    want = megacrn.forward(params, x, ycov, cfg, road_supports=packs)
    mesh = make_mesh(2, 4)
    fwd = make_road_node_eval_forward(cfg, mesh, shard_road_packs(
        dense_supports, 4))
    sx, sycov = shard_batch((x, ycov), mesh)
    got = fwd(params, sx, sycov)
    np.testing.assert_allclose(np.asarray(got.output),
                               np.asarray(want.output),
                               atol=1e-5, rtol=1e-4)


def test_sparse_meta_gspmd_multi_tile():
    """sparse_meta at N=384 (3 row-blocks) under GSPMD with the learned
    tiles node-sharded (mesh.make_shard_fn 'tiles' constraint): multi-tile
    gathers/scatter-adds partition and still match 1-device math."""
    from megacrn_tpu.data.synthetic import synthetic_road_adjacency
    from megacrn_tpu.kernels.sparse_graph import build_block_pattern

    n, t = 384, 2
    cfg = MegaCRNConfig(num_nodes=n, rnn_units=4, mem_num=4, mem_dim=4,
                        horizon=t, seq_len=t, graph_backend="sparse_meta")
    adj = synthetic_road_adjacency(n, avg_degree=6, seed=5)
    pat = ((adj != 0) | (adj.T != 0)).astype(np.float32)
    np.fill_diagonal(pat, 1.0)
    pattern = build_block_pattern(pat)
    params = megacrn.init_params(jax.random.PRNGKey(9), cfg)
    opt = make_optimizer(TCFG, steps_per_epoch=10)
    rs = np.random.RandomState(1)
    x, y, ycov = (rs.randn(8, t, n, 1).astype(np.float32) for _ in range(3))
    rng = jax.random.PRNGKey(10)

    base = make_train_step(cfg, TCFG, opt, road_supports=pattern)
    p1, _, loss1 = base(params, opt.init(params), x, y, ycov, 3.0, rng)

    mesh = make_mesh(2, 4)
    sp = shard_params(params, mesh)
    sx, sy, sycov = shard_batch((x, y, ycov), mesh)
    step = make_sharded_train_step(cfg, TCFG, opt, mesh, donate=False,
                                   road_supports=pattern)
    p2, _, loss2 = step(sp, opt.init(sp), sx, sy, sycov, jnp.float32(3.0),
                        rng)
    np.testing.assert_allclose(float(loss2), float(loss1), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(p1),
                    jax.tree_util.tree_leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-4)


def test_fit_with_mesh_road_node_end_to_end(tmp_path):
    """Full harness training through the node-partitioned road_sparse path
    (ShardedRoadPacks dispatch in fit)."""
    from megacrn_tpu.data.datasets import build_synthetic
    from megacrn_tpu.kernels.spmm import shard_road_packs
    from megacrn_tpu.train.logs import RunDir
    from megacrn_tpu.train.loop import fit

    n = 16
    dense_supports, _ = _road_setup(n, 4, seed=3)
    mesh = make_mesh(2, 4)
    model_cfg = MegaCRNConfig(num_nodes=n, rnn_units=8, mem_num=4, mem_dim=8,
                              horizon=3, seq_len=3,
                              graph_backend="road_sparse")
    train_cfg = TrainConfig(batch_size=16, epochs=1, patience=5, seed=0,
                            lr_milestones=(100,))
    data = build_synthetic(num_nodes=n, num_steps=200, seq_len=3, horizon=3,
                           batch_size=16)
    run = RunDir(str(tmp_path), "SYNTH", snapshot_sources=False)
    result = fit(model_cfg, train_cfg, data, run, test_every_epoch=False,
                 mesh=mesh, road_supports=shard_road_packs(dense_supports, 4))
    assert np.isfinite(result["best_val"]) and result["epochs_run"] == 1


def test_fit_gspmd_mesh_eval_matches_single_device(tmp_path):
    """fit's GSPMD-mesh branch evaluates DATA-PARALLEL (batches placed with
    shard_batch through make_sharded_eval_forward) and must reproduce the
    single-device val/test metrics of an identical run without a mesh
    (round-4 VERDICT weak item 4)."""
    from megacrn_tpu.data.datasets import build_synthetic
    from megacrn_tpu.train.logs import RunDir
    from megacrn_tpu.train.loop import fit

    model_cfg = MegaCRNConfig(num_nodes=16, rnn_units=8, mem_num=4, mem_dim=8,
                              horizon=3, seq_len=3, cl_decay_steps=20)
    train_cfg = TrainConfig(batch_size=16, epochs=1, patience=5, seed=3,
                            lr_milestones=(100,))

    def make_data():
        # Pinned shuffle_rng: the loader's ONE-SHOT shuffle draws from a
        # fresh OS-entropy default_rng otherwise (reference parity), which
        # would give the two runs different batch orders.
        return build_synthetic(num_nodes=16, num_steps=300, seq_len=3,
                               horizon=3, batch_size=16,
                               shuffle_rng=np.random.default_rng(7))

    run_a = RunDir(str(tmp_path / "a"), "SYNTH", snapshot_sources=False)
    res_a = fit(model_cfg, train_cfg, make_data(), run_a,
                test_every_epoch=False)
    run_b = RunDir(str(tmp_path / "b"), "SYNTH", snapshot_sources=False)
    res_b = fit(model_cfg, train_cfg, make_data(), run_b,
                test_every_epoch=False, mesh=make_mesh(2, 4))
    np.testing.assert_allclose(res_b["best_val"], res_a["best_val"],
                               rtol=1e-5)
    for k in ("mae", "mape", "rmse"):
        np.testing.assert_allclose(res_b["test_metrics"][k],
                                   res_a["test_metrics"][k], rtol=1e-4)


def test_fit_with_mesh_resume_step_identical(tmp_path):
    """Resume on a mesh must replay the uninterrupted trajectory exactly:
    load_checkpoint returns host arrays, and fit must re-apply the GSPMD
    placements (shard_params + opt state shardings) before stepping
    (round-2 VERDICT weak item 3)."""
    from megacrn_tpu.data.datasets import build_synthetic
    from megacrn_tpu.train.logs import RunDir
    from megacrn_tpu.train.loop import fit

    model_cfg = MegaCRNConfig(num_nodes=16, rnn_units=8, mem_num=4, mem_dim=8,
                              horizon=3, seq_len=3, cl_decay_steps=20)
    train_cfg = TrainConfig(batch_size=16, epochs=4, patience=50, seed=7,
                            lr=0.01, lr_milestones=(100,))

    def make_data():
        return build_synthetic(num_nodes=16, num_steps=400, seq_len=3,
                               horizon=3, batch_size=16,
                               reshuffle_each_epoch=True, shuffle_seed=7)

    mesh = make_mesh(2, 4)
    run_a = RunDir(str(tmp_path / "a"), "SYNTH", snapshot_sources=False,
                   timestring="fixed")
    res_a = fit(model_cfg, train_cfg, make_data(), run_a,
                test_every_epoch=False, mesh=mesh)

    run_b = RunDir(str(tmp_path / "b"), "SYNTH", snapshot_sources=False,
                   timestring="fixed")
    fit(model_cfg, train_cfg, make_data(), run_b, test_every_epoch=False,
        mesh=mesh, max_epochs=2)  # "killed" after 2 epochs
    run_b2 = RunDir(str(tmp_path / "b"), "SYNTH", snapshot_sources=False,
                    timestring="fixed")
    res_b = fit(model_cfg, train_cfg, make_data(), run_b2,
                test_every_epoch=False, mesh=mesh, resume=True)

    assert res_b["epochs_run"] == res_a["epochs_run"] == 4
    np.testing.assert_allclose(res_b["best_val"], res_a["best_val"],
                               rtol=1e-6)
    for (ka, a), (kb, b) in zip(
            jax.tree_util.tree_flatten_with_path(res_a["params"])[0],
            jax.tree_util.tree_flatten_with_path(res_b["params"])[0]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6,
                                   err_msg=str(ka))


def test_dense_ring_mesh_eval_matches_single_device():
    """dense_ring mesh eval routes through the shard_map DP eval forward
    (round-2 VERDICT weak item 4) — outputs must equal the single-device
    dense forward."""
    from megacrn_tpu.parallel.api import make_shardmap_eval_forward

    cfg = MegaCRNConfig(num_nodes=16, rnn_units=8, mem_num=4, mem_dim=8,
                        horizon=4, seq_len=4, graph_backend="dense_ring")
    params = megacrn.init_params(jax.random.PRNGKey(5), cfg)
    x, _, ycov = _batch()
    want = megacrn.forward(params, x, ycov, cfg)
    mesh = make_mesh(2, 4)
    fwd = make_shardmap_eval_forward(cfg, mesh)
    got = fwd(params, x, ycov)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w), atol=1e-5,
                                   rtol=1e-5)


def test_shardmap_l1_normalized_matches_single_device():
    """The EXPY-TKY objective through the shard_map DP step: psum-sum /
    psum-count global mean must equal the single-device step exactly
    (round-2 VERDICT weak item 5 — no equal-shard assumption)."""
    tcfg = TrainConfig(batch_size=8, lr=0.01, pred_loss="l1_normalized",
                       max_grad_norm=None, lamb=0.01, lamb1=0.0)
    cfg = MegaCRNConfig(num_nodes=16, rnn_units=8, mem_num=4, mem_dim=8,
                        horizon=4, seq_len=4, cl_decay_steps=10)
    params = megacrn.init_params(jax.random.PRNGKey(3), cfg)
    opt = make_optimizer(tcfg, steps_per_epoch=10)
    x, y, ycov = _batch()
    rng = jax.random.PRNGKey(11)
    b = 7.0

    base = make_train_step(cfg, tcfg, opt)
    p1, _, loss1 = base(params, opt.init(params), x, y, ycov, b, rng)

    mesh = make_mesh(8, 1)
    from megacrn_tpu.parallel.api import make_shardmap_train_step
    step = make_shardmap_train_step(cfg, tcfg, opt, mesh, donate=False)
    p2, _, loss2 = step(params, opt.init(params), x, y, ycov, b, rng)
    np.testing.assert_allclose(float(loss2), float(loss1), rtol=1e-5)
    for a, c in zip(jax.tree_util.tree_leaves(p1),
                    jax.tree_util.tree_leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   atol=1e-5, rtol=1e-4)
