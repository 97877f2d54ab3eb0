"""Pluggable stage registry + layered config loading (SURVEY §2.11).

Reference analog: the ``run`` CLI's name→entry registry (reference
``run:18-28``) and ``configs/presets/*.yaml`` layering — users swap a
blocker or scorer and tune a preset WITHOUT editing pipeline code. Here
the same contract is a name→object registry resolved from ``ERConfig``
string fields, plus ``load_er_config`` merging dict/JSON/YAML layers.

Stage protocols (duck-typed; see the built-in registrations below):

* blocker — ``fn(conversations: Dataset, cfg: ERConfig) -> Dataset`` with
  columns ``(block_key, conv_id)``; every same-block pair becomes a
  candidate (subject to the oversize policy).
* scorer — a CLASS for ``map_batches`` actor pools:
  ``__init__(idf_ref=None, weights=None)`` once per actor,
  ``__call__(batch: pa.Table) -> pa.Table`` per batch. Input carries
  ``conv_id_left/right`` + ``text_left/right``; output must carry
  ``conv_id_left``, ``conv_id_right``, ``score`` (floats in [0, 1]).

Custom stages run on the generic attach+score path; the default names
keep the specialized fused/pre-warmed hot path in ``run_er``.
"""

from __future__ import annotations

import json
from typing import Any, Callable

_REGISTRIES: dict[str, dict[str, Any]] = {"blocker": {}, "scorer": {}}


def register(kind: str, name: str) -> Callable[[Any], Any]:
    """Decorator: ``@register("scorer", "my_scorer")`` on a class/fn."""
    if kind not in _REGISTRIES:
        raise KeyError(f"unknown stage kind {kind!r}; "
                       f"kinds: {sorted(_REGISTRIES)}")

    def deco(obj: Any) -> Any:
        _REGISTRIES[kind][name] = obj
        return obj

    return deco


def resolve(kind: str, name: str) -> Any:
    reg = _REGISTRIES.get(kind)
    if reg is None:
        raise KeyError(f"unknown stage kind {kind!r}")
    _ensure_builtins()
    if name not in reg:
        raise KeyError(
            f"no {kind} registered under {name!r}; "
            f"registered: {sorted(reg)}")
    return reg[name]


def registered(kind: str) -> list[str]:
    _ensure_builtins()
    return sorted(_REGISTRIES[kind])


_BUILTINS_DONE = False


def _ensure_builtins() -> None:
    """Register the engine's own stages lazily (import cycle guard)."""
    global _BUILTINS_DONE
    if _BUILTINS_DONE:
        return
    _BUILTINS_DONE = True
    from .stages.blocking import make_blocks
    from .stages.scoring import PairScorer

    def minhash_lsh(conversations, cfg):
        return make_blocks(conversations, num_perm=cfg.num_perm,
                           num_bands=cfg.num_bands, seed=cfg.seed)

    _REGISTRIES["blocker"].setdefault("minhash_lsh", minhash_lsh)
    _REGISTRIES["scorer"].setdefault("pair_features", PairScorer)


# defaults that keep run_er on the specialized fused / pre-warmed path
DEFAULT_BLOCKER = "minhash_lsh"
DEFAULT_SCORER = "pair_features"


def load_er_config(*layers):
    """Layered ERConfig: each layer is a dict or a path to a ``.json`` /
    ``.yaml`` file; later layers override earlier ones (the reference's
    preset-over-base YAML pattern). Unknown keys raise (typo safety)."""
    from .pipelines.er import ERConfig

    merged: dict[str, Any] = {}
    for layer in layers:
        if isinstance(layer, str):
            if layer.endswith((".yaml", ".yml")):
                try:
                    import yaml  # optional; container may not ship it
                except ImportError as e:
                    raise ImportError(
                        "YAML config layer requires pyyaml; use JSON"
                    ) from e
                with open(layer) as f:
                    layer = yaml.safe_load(f) or {}
            else:
                with open(layer) as f:
                    layer = json.load(f)
        if not isinstance(layer, dict):
            raise TypeError(f"config layer must be dict or path, "
                            f"got {type(layer).__name__}")
        merged.update(layer)
    valid = set(ERConfig.__dataclass_fields__)
    unknown = set(merged) - valid
    if unknown:
        raise KeyError(f"unknown ERConfig keys: {sorted(unknown)}; "
                       f"valid: {sorted(valid)}")
    return ERConfig(**merged)
