"""Inference / serving path.

The reference repo is research-only (train + offline test); this module adds
the deployment surface: load a trained checkpoint, jit the forward once, and
serve predictions from raw recent observations — batch or streaming.

* ``Predictor`` — stateless batch inference: raw speed windows in, forecasts
  out (normalisation folded in, single jitted program, padding to a fixed
  batch to avoid recompiles).
* ``StreamingForecaster`` — keeps a rolling window per deployment and emits a
  forecast every time a new observation step arrives (the online-serving
  loop).
"""
from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from megacrn_tpu.config import MegaCRNConfig
from megacrn_tpu.models import megacrn
from megacrn_tpu.ops.scaling import inverse_transform


class Predictor:
    """Batch forecaster around a trained MegaCRN.

    Args:
      params: trained parameter pytree (from ``train.checkpoint`` or
        ``interop.params_from_torch_checkpoint``).
      cfg: model config.
      scaler_mean / scaler_std: the training normalisation stats (stored in
        checkpoint metadata by the harness).
      max_batch: compiled batch size; smaller requests are padded, larger
        ones chunked — the jitted program never recompiles.
    """

    def __init__(self, params: Dict, cfg: MegaCRNConfig,
                 scaler_mean: float = 0.0, scaler_std: float = 1.0,
                 max_batch: int = 64, road_supports=None):
        """``road_supports``: the graph constant of a sparse-backend config
        (node-ELL/COO packs for ``road_sparse``, an edge pattern for
        ``sparse_meta``) — required when ``cfg.graph_backend`` is not dense,
        exactly as in training. Its array leaves are threaded as runtime
        args so program size stays independent of nnz."""
        from megacrn_tpu.train.steps import (join_support_arrays,
                                             split_support_arrays)

        self.params = params
        self.cfg = cfg
        self.mean = float(scaler_mean)
        self.std = float(scaler_std)
        self.max_batch = max_batch
        skel, self._sup_arrays = split_support_arrays(road_supports)

        @jax.jit
        def fwd(params, x, y_cov, mean, std, sup):
            return self._forward(params, x, y_cov, mean, std, cfg,
                                 join_support_arrays(skel, sup))

        self._fwd = lambda p, x, yc, m, s: fwd(p, x, yc, m, s,
                                               self._sup_arrays)

    @staticmethod
    def _forward(params, x, y_cov, mean, std, cfg, road_supports=None):
        x = x.at[..., 0].set((x[..., 0] - mean) / std)
        out = megacrn.forward(params, x[..., : cfg.input_dim], y_cov, cfg,
                              road_supports=road_supports)
        return inverse_transform(out.output, std, mean)

    @classmethod
    def from_checkpoint(cls, path: str, cfg: MegaCRNConfig,
                        max_batch: int = 64,
                        road_supports=None) -> "Predictor":
        from megacrn_tpu.train import checkpoint as ckpt

        template = megacrn.init_params(jax.random.PRNGKey(0), cfg)
        params, _, meta = ckpt.load_checkpoint(path, template)
        return cls(params, cfg, meta.get("scaler_mean", 0.0),
                   meta.get("scaler_std", 1.0), max_batch,
                   road_supports=road_supports)

    def predict(self, x: np.ndarray,
                y_cov: Optional[np.ndarray] = None) -> np.ndarray:
        """x: (B, seq_len, N, >=1) RAW (unnormalised) windows, channel 0 =
        speed; y_cov: (B, horizon, N, ycov_dim) decoder covariates (zeros if
        omitted). Returns (B, horizon, N, output_dim) raw-scale forecasts."""
        cfg = self.cfg
        x = np.asarray(x, np.float32)
        if y_cov is None:
            y_cov = np.zeros((x.shape[0], cfg.horizon, cfg.num_nodes,
                              cfg.ycov_dim), np.float32)
        return _run_batched(
            lambda xb, yb: self._fwd(self.params, xb, yb, self.mean,
                                     self.std),
            self.max_batch, (x, np.asarray(y_cov, np.float32)))


def _run_batched(fwd, max_batch: int, arrays) -> np.ndarray:
    """Chunk/pad a request to the compiled batch size and call ``fwd`` on
    each chunk (shared by every predictor: the jitted program never
    recompiles). ``arrays``: tuple of (B, ...) numpy arrays."""
    b = arrays[0].shape[0]
    outs = []
    for s in range(0, b, max_batch):
        chunk = [a[s:s + max_batch] for a in arrays]
        nb = len(chunk[0])
        if nb < max_batch:  # pad to the compiled batch
            pad = max_batch - nb
            chunk = [np.concatenate([c, np.repeat(c[-1:], pad, 0)])
                     for c in chunk]
        out = fwd(*[jnp.asarray(c) for c in chunk])
        outs.append(np.asarray(out)[:nb])
    return np.concatenate(outs, axis=0)


class GTSPredictor:
    """Batch forecaster around a trained GTS model (the second family).

    The graph learner consumes the NORMALIZED training series
    (``node_feas``, model/GTS.py:423-434) — it is deployed state alongside
    the weights and BatchNorm stats. Inference samples the graph
    deterministically (argmax, no Gumbel noise) and runs BatchNorm in
    inference mode, matching the reference eval path
    (model/traintest_GTS.py:104-120).
    """

    def __init__(self, params: Dict, bn_state: Dict, cfg, node_feas,
                 scaler_mean: float = 0.0, scaler_std: float = 1.0,
                 max_batch: int = 64):
        from megacrn_tpu.models import gts

        self.params, self.bn_state = params, bn_state
        self.cfg = cfg
        self.mean, self.std = float(scaler_mean), float(scaler_std)
        self.max_batch = max_batch
        # The sampled graph depends only on (params, bn_state, node_feas)
        # at inference (deterministic argmax, no Gumbel noise), never on
        # the request — compute it ONCE here instead of re-running the
        # full-training-series extractor (the measured ~56% of the GTS
        # step) per predict() chunk.
        adj, adj_prob, _ = jax.jit(
            lambda p, b, f: gts.sample_graph(p, b, f, cfg, rng=None,
                                             training=False))(
            params, bn_state, jnp.asarray(node_feas))
        self.adj = adj

        @jax.jit
        def fwd(params, bn_state, x, adj, adj_prob, mean, std):
            x = x.at[..., 0].set((x[..., 0] - mean) / std)
            out = gts.forward(params, bn_state, x[..., : cfg.input_dim],
                              None, cfg, training=False, gumbel_noise=False,
                              graph=(adj, adj_prob))
            return inverse_transform(out.output, std, mean)

        self._fwd = lambda x: fwd(self.params, self.bn_state, x, adj,
                                  adj_prob, self.mean, self.std)

    @classmethod
    def from_checkpoint(cls, path: str, cfg, node_feas,
                        max_batch: int = 64) -> "GTSPredictor":
        """Loads the (params, params.bn) checkpoint pair written by
        ``train.gts_loop.fit_gts``."""
        from megacrn_tpu.models import gts
        from megacrn_tpu.train import checkpoint as ckpt

        p_tmpl, b_tmpl = gts.init_params(jax.random.PRNGKey(0), cfg)
        params, _, meta = ckpt.load_checkpoint(path, p_tmpl)
        bn_state, _, _ = ckpt.load_checkpoint(path + ".bn", b_tmpl)
        return cls(params, bn_state, cfg, node_feas,
                   meta.get("scaler_mean", 0.0), meta.get("scaler_std", 1.0),
                   max_batch)

    def predict(self, x: np.ndarray, y_cov=None) -> np.ndarray:
        """x: (B, seq_len, N, >=input_dim) RAW windows, channel 0 = speed.
        ``y_cov`` is accepted for StreamingForecaster compatibility and
        ignored — GTS has no decoder covariates (model/GTS.py:387-410)."""
        del y_cov
        x = np.asarray(x, np.float32)
        return _run_batched(self._fwd, self.max_batch, (x,))


class MegaCRNxPredictor:
    """Batch forecaster around a trained MegaCRNx (the third family) —
    deterministic forward (no scheduled sampling), raw-scale output per its
    protocol (model_futurework/traintest_MegaCRNx.py: normalized x,
    raw-scale targets)."""

    def __init__(self, params: Dict, cfg, scaler_mean: float = 0.0,
                 scaler_std: float = 1.0, max_batch: int = 64):
        from megacrn_tpu.models import megacrnx

        self.params = params
        self.cfg = cfg
        self.mean, self.std = float(scaler_mean), float(scaler_std)
        self.max_batch = max_batch

        @jax.jit
        def fwd(params, x, y_cov, mean, std):
            x = x.at[..., 0].set((x[..., 0] - mean) / std)
            out = megacrnx.forward(params, x[..., : cfg.input_dim], y_cov,
                                   cfg)
            return inverse_transform(out.output, std, mean)

        self._fwd = lambda x, yc: fwd(self.params, x, yc, self.mean,
                                      self.std)

    @classmethod
    def from_checkpoint(cls, path: str, cfg,
                        max_batch: int = 64) -> "MegaCRNxPredictor":
        from megacrn_tpu.models import megacrnx
        from megacrn_tpu.train import checkpoint as ckpt

        template = megacrnx.init_params(jax.random.PRNGKey(0), cfg)
        params, _, meta = ckpt.load_checkpoint(path, template)
        return cls(params, cfg, meta.get("scaler_mean", 0.0),
                   meta.get("scaler_std", 1.0), max_batch)

    def predict(self, x: np.ndarray,
                y_cov: Optional[np.ndarray] = None) -> np.ndarray:
        cfg = self.cfg
        x = np.asarray(x, np.float32)
        if y_cov is None:
            y_cov = np.zeros((x.shape[0], cfg.horizon, cfg.num_nodes,
                              cfg.ycov_dim), np.float32)
        return _run_batched(self._fwd, self.max_batch,
                            (x, np.asarray(y_cov, np.float32)))


class StreamingForecaster:
    """Online serving: push one observation step at a time, get a forecast
    once the window is warm.

    ``push(obs)`` with obs (N,) or (N, C); returns (horizon, N, output_dim)
    forecast or None while warming up.
    """

    def __init__(self, predictor: Predictor,
                 cov_fn=None):
        self.predictor = predictor
        self.cfg = predictor.cfg
        self._window: list = []
        self._cov_fn = cov_fn  # optional t -> (horizon, N, ycov) covariates
        self._t = 0

    def push(self, obs: np.ndarray) -> Optional[np.ndarray]:
        obs = np.asarray(obs, np.float32)
        if obs.ndim == 1:
            obs = obs[:, None]
        self._window.append(obs)
        self._t += 1
        if len(self._window) > self.cfg.seq_len:
            self._window.pop(0)
        if len(self._window) < self.cfg.seq_len:
            return None
        x = np.stack(self._window)[None]  # (1, T, N, C)
        y_cov = None
        if self._cov_fn is not None:
            y_cov = np.asarray(self._cov_fn(self._t), np.float32)[None]
        return self.predictor.predict(x, y_cov)[0]
