"""Fusion-model contract and factory.

Every fusion model is a Flax module with

    __call__(batch: dict, train: bool) -> (features, emos_out, vals_out, interloss)

mirroring the reference contract (``MERBench/toolkit/models/attention.py:36-57``):
``features`` is the fused representation, ``emos_out`` the emotion logits,
``vals_out`` the valence regression, and ``interloss`` any auxiliary loss the
model adds (0.0 for most). ``batch`` carries ``audios``/``texts``/``videos``
(and modality lengths for frame-level models).

Models register with ``@registry.register_model(name)`` and are constructed
from an :class:`~mertools_tpu.core.config.Args` namespace via
:func:`get_model` (reference ``toolkit/models/__init__.py:18-46``).
"""

from __future__ import annotations

from ..core.config import Args
from ..core.registry import registry


def get_model(args: Args):
    """Instantiate a fusion model by ``args.model``."""
    cls = registry.get_model(args.model)
    return cls.from_args(args)


class FromArgsMixin:
    """Default from_args: pass through the fields the dataclass declares."""

    @classmethod
    def from_args(cls, args: Args):
        fields = getattr(cls, "__dataclass_fields__", {})
        kw = {}
        for name in fields:
            if name in ("parent", "name"):
                continue
            if args.get(name) is not None:
                kw[name] = args[name]
        return cls(**kw)
