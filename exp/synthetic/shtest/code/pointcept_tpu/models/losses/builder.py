"""LOSSES registry + Criteria weighted-sum container.

Parity: reference `pointcept/models/losses/builder.py:13` — a config list of
loss dicts, summed (each loss applies its own loss_weight internally).
"""

from pointcept_tpu.utils.registry import Registry

LOSSES = Registry("losses")


class Criteria:
    def __init__(self, cfg=None):
        self.cfg = cfg if cfg is not None else []
        self.criteria = [LOSSES.build(c) for c in self.cfg]

    def __call__(self, pred, target):
        if len(self.criteria) == 0:
            return pred
        total = 0.0
        for c in self.criteria:
            total = total + c(pred, target)
        return total


def build_criteria(cfg):
    return Criteria(cfg)
