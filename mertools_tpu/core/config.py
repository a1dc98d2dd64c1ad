"""Configuration system.

Replaces the reference's three config tiers (see SURVEY.md §5 "Config"):

1. a path registry per dataset (reference ``MERBench/config.py:4-86``),
2. argparse CLIs merged with random-searched hyperparameters from
   ``model-tune.yaml`` (reference ``MERBench/toolkit/utils/functions.py:144-159``),
3. OmegaConf YAML with dotted ``--options`` overrides for the MLLM stack
   (reference ``MER2025/MER2025_Track23/my_affectgpt/common/config.py``).

Implemented here with plain dataclass-free dict configs on PyYAML (OmegaConf
is not a dependency): :class:`PathRegistry`, :func:`load_yaml`,
:func:`apply_dotted_overrides`, :func:`random_select`, :func:`merge_config`.
"""

from __future__ import annotations

import copy
import os
from dataclasses import dataclass, field
from typing import Any, Iterable, Mapping

import numpy as np
import yaml


class Args(dict):
    """Attribute-style config namespace (argparse-args equivalent).

    Missing keys read as ``None``, matching how the reference's argparse
    namespace behaves for unset optional flags.
    """

    def __getattr__(self, name):
        if name.startswith("__"):
            raise AttributeError(name)
        return self.get(name)

    def __setattr__(self, name, value):
        self[name] = value

    def updated(self, **kw) -> "Args":
        out = Args(self)
        out.update(kw)
        return out


# ---------------------------------------------------------------------------
# Tier 1: dataset path registry
# ---------------------------------------------------------------------------
@dataclass
class DatasetPaths:
    """Normalized-layout paths for one dataset (reference MERBench/config.py)."""

    root: str
    video: str = ""
    audio: str = ""
    openface_face: str = ""
    features: str = ""
    transcriptions: str = ""
    label: str = ""

    def __post_init__(self):
        defaults = {
            "video": "video",
            "audio": "audio",
            "openface_face": "openface_face",
            "features": "features",
            "transcriptions": "transcription.csv",
            "label": "label-6way.npz",
        }
        for name, rel in defaults.items():
            if not getattr(self, name):
                setattr(self, name, os.path.join(self.root, rel))


@dataclass
class PathRegistry:
    """Maps dataset name -> :class:`DatasetPaths` plus global tool paths."""

    datasets: dict[str, DatasetPaths] = field(default_factory=dict)
    saved_root: str = "./saved"

    def register(self, name: str, root: str, **kw) -> DatasetPaths:
        paths = DatasetPaths(root=root, **kw)
        self.datasets[name] = paths
        return paths

    def __getitem__(self, name: str) -> DatasetPaths:
        return self.datasets[name]

    def __contains__(self, name: str) -> bool:
        return name in self.datasets

    @classmethod
    def from_yaml(cls, path: str) -> "PathRegistry":
        raw = load_yaml(path)
        reg = cls(saved_root=raw.get("saved_root", "./saved"))
        for name, spec in raw.get("datasets", {}).items():
            if isinstance(spec, str):
                reg.register(name, spec)
            else:
                reg.register(name, **spec)
        return reg


# Global default registry; CLIs populate it from a YAML or env var.
REGISTRY = PathRegistry()


def resolve_dataset_args(args, dataset_attr: str = "dataset",
                         **arg_to_field) -> None:
    """run.sh compatibility: fill CLI path args left as None from the
    registry entry named by ``--dataset`` (the reference CLIs resolve every
    path from config.py the same way, e.g.
    ``extract_audio_huggingface.py --dataset=MER2023``). Explicit dirs
    always win; raises SystemExit if a path is still missing."""
    ds = getattr(args, dataset_attr, None)
    if ds is not None:
        reg = configure_from_env()
        if ds not in reg:
            raise SystemExit(
                f"--dataset={ds} is not in the path registry "
                f"(set $MERTOOLS_TPU_CONFIG or pass explicit dirs)")
        for arg, fieldname in arg_to_field.items():
            if getattr(args, arg, None) is None:
                setattr(args, arg, getattr(reg[ds], fieldname))
    missing = [a for a in arg_to_field if getattr(args, a, None) is None]
    if missing:
        raise SystemExit(
            f"missing {', '.join('--' + m for m in missing)} "
            f"(pass them explicitly or use --dataset with a registry)")


def configure_from_env() -> PathRegistry:
    """Load the path registry from $MERTOOLS_TPU_CONFIG if set."""
    cfg = os.environ.get("MERTOOLS_TPU_CONFIG")
    if cfg and os.path.exists(cfg):
        global REGISTRY
        REGISTRY = PathRegistry.from_yaml(cfg)
    return REGISTRY


# ---------------------------------------------------------------------------
# Tier 2/3: YAML configs, dotted overrides, random hyperparameter search
# ---------------------------------------------------------------------------
def load_yaml(path: str) -> dict:
    with open(path, "r") as f:
        return yaml.safe_load(f) or {}


def _parse_scalar(text: str) -> Any:
    """Parse a CLI override value with YAML scalar semantics (plus bare
    scientific notation like ``1e-3``, which YAML 1.1 treats as a string)."""
    value = yaml.safe_load(text)
    if isinstance(value, str):
        try:
            return int(value)
        except ValueError:
            pass
        try:
            return float(value)
        except ValueError:
            pass
    return value


def apply_dotted_overrides(cfg: dict, options: Iterable[str] | None) -> dict:
    """Apply ``a.b.c=value`` overrides (reference: --options in train.py:35)."""
    cfg = copy.deepcopy(cfg)
    for opt in options or []:
        if "=" not in opt:
            raise ValueError(f"override must be key=value, got {opt!r}")
        key, value = opt.split("=", 1)
        node = cfg
        parts = key.split(".")
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        node[parts[-1]] = _parse_scalar(value)
    return cfg


def random_select(space: Mapping[str, list], rng: np.random.Generator | None = None) -> dict:
    """Pick one value per hyperparameter from its candidate list.

    Reference behavior: ``func_random_select``
    (MERBench/toolkit/utils/functions.py:153-159) — uniform choice per key.
    """
    rng = rng or np.random.default_rng()
    out = {}
    for key, candidates in space.items():
        if isinstance(candidates, (list, tuple)):
            out[key] = candidates[int(rng.integers(len(candidates)))]
        else:
            out[key] = candidates
    return out


def merge_config(base: Mapping[str, Any], overlay: Mapping[str, Any]) -> dict:
    """Overlay wins; mirrors ``merge_args_config``
    (MERBench/toolkit/utils/functions.py:144-150) where tuned hyperparameters
    overwrite argparse defaults unless the CLI pinned them (handled by caller).
    """
    merged = dict(base)
    merged.update(overlay)
    return merged
