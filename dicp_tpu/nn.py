"""Compat shim: class-based NN interface matching ``dICP.nn.nn``
(dICP/nn.py:4-21) on top of the functional :mod:`dicp_tpu.knn`.

Note on defaults: the reference class defaults to ``use_gumbel=True``
(dICP/nn.py:5) even though the shipped ICP config disables it
(config/dICP_config.yaml:12); we keep the same default.  Unlike the
reference's unseeded ``torch.rand`` (dICP/nn.py:60), Gumbel noise requires an
explicit key — ``find_nn`` accepts one, or a deterministic default key(0) is
used so drop-in calls still work (and are reproducible, which the reference's
are not).
"""

from __future__ import annotations

from typing import Optional

import jax

from dicp_tpu import knn as _knn


class nn:
    def __init__(self, differentiable: bool = True, use_gumbel: bool = True,
                 eps: float = 1e-20, tau: float = 0.1):
        self.differentiable = differentiable
        self.use_gumbel = use_gumbel
        self.eps = eps
        self.tau = tau

    def find_nn(self, x, y, key: Optional[jax.Array] = None):
        if self.differentiable and self.use_gumbel and key is None:
            key = jax.random.key(0)
        return _knn.find_nn(
            x, y,
            differentiable=self.differentiable,
            use_gumbel=self.use_gumbel,
            key=key, tau=self.tau, eps=self.eps,
        )
