"""User-extension surface (SURVEY.md §2.12).

Reference analog: the parser-plugin contract — a module exposing a
``build_graph`` entry point wired in through a registry
(``/root/reference/CONTRIBUTING.md:15-55``) and the LLM-provider registry
(``/root/reference/pipeline/llm_providers.py:41-57, 235-248``). Here the
plug points are the three places a record-linkage user actually customizes:

- **Stage protocol**: anything with ``name`` and ``apply(Dataset) ->
  Dataset`` composes with :func:`compose` into a pipeline.
- **Blocking-key providers**: named functions ``(normalized batch, cfg) ->
  KEYS_SCHEMA table``; ``ERConfig.blocking_keys`` selects which run. The
  built-ins (sha / stem / minhash) register themselves in
  ``stages.blocking``; a user adds a provider without touching any stage.
- **Scorer extra features**: named ``(enriched pair batch) -> float array in
  [0, 1]`` with a weight; the pair score becomes the weight-renormalized
  blend of built-ins + extras.
"""

from __future__ import annotations

from typing import Callable, Protocol, runtime_checkable

import numpy as np
import pyarrow as pa

import ray.data


@runtime_checkable
class Stage(Protocol):
    """A named Dataset -> Dataset transform (schema-in/out documented by the
    implementation)."""

    name: str

    def apply(self, ds: "ray.data.Dataset") -> "ray.data.Dataset": ...


def compose(ds: "ray.data.Dataset", stages: list[Stage]) -> "ray.data.Dataset":
    for st in stages:
        ds = st.apply(ds)
    return ds


# --- blocking-key providers ---------------------------------------------

KeyProvider = Callable[[pa.Table, "object"], pa.Table]  # cfg duck-typed

_BLOCKING_KEYS: dict[str, KeyProvider] = {}


def register_blocking_key(name: str):
    """Decorator: register a provider producing KEYS_SCHEMA rows
    (block_key u64 with the family tag already applied, file_id u64,
    fam i8, sha u64) from a scorable-row normalized batch."""

    def deco(fn: KeyProvider) -> KeyProvider:
        _BLOCKING_KEYS[name] = fn
        return fn

    return deco


def blocking_key_provider(name: str) -> KeyProvider:
    try:
        return _BLOCKING_KEYS[name]
    except KeyError:
        raise KeyError(
            f"unknown blocking key {name!r}; registered: {sorted(_BLOCKING_KEYS)}"
        ) from None


def registered_blocking_keys() -> list[str]:
    return sorted(_BLOCKING_KEYS)


# --- scorer extra features ----------------------------------------------

FeatureFn = Callable[[pa.Table], np.ndarray]

_SCORER_FEATURES: dict[str, tuple[float, FeatureFn]] = {}


def register_scorer_feature(name: str, weight: float):
    """Decorator: register an extra pairwise feature. ``fn`` receives the
    enriched pair batch (columns ``id_a id_b stem_a stem_b tokens_a tokens_b
    trunc_a trunc_b sha_a sha_b``) and returns a float array in [0, 1]; the
    score blends built-ins and extras with weights renormalized to 1."""

    def deco(fn: FeatureFn) -> FeatureFn:
        _SCORER_FEATURES[name] = (float(weight), fn)
        return fn

    return deco


def unregister_scorer_feature(name: str) -> None:
    _SCORER_FEATURES.pop(name, None)


def scorer_extra_features() -> list[tuple[str, float, FeatureFn]]:
    return [(n, w, f) for n, (w, f) in sorted(_SCORER_FEATURES.items())]
