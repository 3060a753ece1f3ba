"""Hebbian configuration and layer-exclusion predicate.

The reference mutates a built torch model, swapping conv modules for
Hebbian ones and freezing everything it does not convert
(/root/reference/hebb/makehebbian.py:45-87).  TPU-native redesign: no
module surgery — every conv site in every model is an
:class:`hebbax.hebb.layers.HConv` that consults a static
:class:`HebbSpec`; ``exclude`` is a predicate over the module path, and
"freezing" is an optimizer mask (:func:`hebbax.hebb.surgery.
pretrain_trainable_mask`).  One model definition serves plain and
Hebbian variants with identical parameter shapes, so checkpoints remain
load-compatible across the pretrain -> fine-tune hand-off.
"""

import dataclasses
from typing import Optional, Tuple


@dataclasses.dataclass(frozen=True)
class HebbSpec:
    """Global Hebbian hyper-parameters (uniform across converted layers,
    as in the reference's single ``hebb_params`` dict).

    mode: 'swta' | 'hpca' | 'swta_t' | 'hpca_t' | 'contrastive'.
      Forward convs automatically strip the ``_t`` suffix
      (makehebbian.adjust_hebbian_params, makehebbian.py:25-30).
    k: softmax inverse temperature for swta-type rules.
    alpha: 1 -> pure Hebbian updates (pretraining), 0 -> pure backprop
      (fine-tuning; Hebbian layers then only keep weight-norm forward).
    patchwise: per-patch updates aggregated; the reference's
      non-patchwise branch is shape-inconsistent dead code and is not
      supported.
    exclude: module names (dotted paths) kept as plain trainable convs,
      e.g. ('out_conv',) — matched as ancestors, like the reference's
      named_modules equality match.
    """

    mode: str = "swta_t"
    k: float = 50.0
    w_nrm: bool = True
    alpha: float = 1.0
    patchwise: bool = True
    contrast: float = 1.0
    uniformity: bool = False
    exclude: Tuple[str, ...] = ()

    def conv_mode(self, transpose: bool) -> str:
        """Effective rule for a layer: forward convs use the non-_t rule."""
        if not transpose and self.mode.endswith("_t"):
            return self.mode[:-2]
        return self.mode

    def to_dict(self):
        d = dataclasses.asdict(self)
        d.pop("exclude")
        return d

    @classmethod
    def from_dict(cls, d, exclude=()):
        d = dict(d)
        d.pop("act", None)  # reference stores an nn.Identity here
        return cls(exclude=tuple(exclude or ()), **d)


# makehebbian.default_hebb_params parity (makehebbian.py:7)
default_hebb_params = HebbSpec()


def is_excluded(path, exclude) -> bool:
    """True if any dotted ancestor prefix of ``path`` equals an exclude
    name (reference excludes a named module and all its submodules)."""
    if not exclude:
        return False
    parts = tuple(str(p) for p in path)
    for i in range(1, len(parts) + 1):
        if ".".join(parts[:i]) in exclude:
            return True
    return False


def spec_if_active(hebb: Optional[HebbSpec], path) -> Optional[HebbSpec]:
    """The spec if this layer is converted, else None."""
    if hebb is None:
        return None
    if is_excluded(path, hebb.exclude):
        return None
    return hebb
