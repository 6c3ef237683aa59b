"""Estimator base class (reference: nerfacc/estimators/base.py:7-22)."""
from __future__ import annotations

from typing import Any, Dict


class AbstractEstimator:
    """Base class for transmittance estimators.

    The reference is an ``nn.Module`` whose grids ride along in
    ``state_dict()``; here estimators hold their state as JAX pytrees and
    expose the same ``sampling()`` / ``update_every_n_steps()`` protocol plus
    ``state_dict()`` / ``load_state_dict()`` for checkpointing.
    """

    def __init__(self) -> None:
        self.training = True

    def train(self, mode: bool = True) -> "AbstractEstimator":
        self.training = mode
        return self

    def eval(self) -> "AbstractEstimator":
        return self.train(False)

    def sampling(self, *args, **kwargs) -> Any:
        raise NotImplementedError

    def update_every_n_steps(self, *args, **kwargs) -> None:
        raise NotImplementedError

    def state_dict(self) -> Dict[str, Any]:
        raise NotImplementedError

    def load_state_dict(self, state_dict: Dict[str, Any]) -> None:
        raise NotImplementedError
