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
        b = x.shape[0]
        if y_cov is None:
            y_cov = np.zeros((b, cfg.horizon, cfg.num_nodes, cfg.ycov_dim),
                             np.float32)
        outs = []
        for s in range(0, b, self.max_batch):
            xb = x[s:s + self.max_batch]
            yb = y_cov[s:s + self.max_batch]
            nb = len(xb)
            if nb < self.max_batch:  # pad to the compiled batch
                pad = self.max_batch - nb
                xb = np.concatenate([xb, np.repeat(xb[-1:], pad, 0)])
                yb = np.concatenate([yb, np.repeat(yb[-1:], pad, 0)])
            out = self._fwd(self.params, jnp.asarray(xb), jnp.asarray(yb),
                            self.mean, self.std)
            outs.append(np.asarray(out)[:nb])
        return np.concatenate(outs, axis=0)


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
