"""Compat shim: class-based loss interface matching ``dICP.loss.loss``
(dICP/loss.py:3-19) on top of the functional :mod:`dicp_tpu.losses`."""

from __future__ import annotations

from dicp_tpu import losses as _losses


class loss:
    def __init__(self, name: str = "huber", metric: float = 1.0,
                 differentiable: bool = False, tanh_steepness: float = 10.0):
        self.name = name
        self.metric = metric
        self.differentiable = differentiable
        self.tanh_steepness = tanh_steepness

    def get_weight(self, err):
        return _losses.robust_weight(
            self.name, err, self.metric, self.differentiable, self.tanh_steepness)
