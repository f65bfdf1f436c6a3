"""Cross-tower parameter tying — the JAX-native siamese mechanism.

The reference shares live module objects between towers
(``replace_modules`` with ``shared_modules``/``keep_hp``,
`/root/reference/cvap/model/cvalp.py:147-180`). In a functional JAX model the
same capability is a *pytree transform*: a tie spec maps destination param
subtrees onto source subtrees; inside the differentiated train step the
destination entries are substituted by the source arrays, so gradients flow
to the single canonical copy. Runtime hyperparameters (stride, target grid)
stay per-tower because they live in module config, not in params —
exactly ``keep_hp=True``.
"""

from __future__ import annotations

from typing import Any, Dict, List, Sequence, Tuple

import jax


def _get_path(tree: Dict, path: str):
    node = tree
    for part in path.split("/"):
        node = node[part]
    return node


def _set_path(tree: Dict, path: str, value) -> None:
    parts = path.split("/")
    node = tree
    for part in parts[:-1]:
        node = node[part]
    node[parts[-1]] = value


def _del_path(tree: Dict, path: str) -> None:
    parts = path.split("/")
    node = tree
    for part in parts[:-1]:
        node = node[part]
    del node[parts[-1]]


def apply_ties(params: Dict, ties: Sequence[Tuple[str, str]]) -> Dict:
    """Return a copy of ``params`` where each ``(dst, src)`` path pair has
    the destination subtree replaced by the source subtree. Call this at the
    top of the (differentiated) loss function."""
    if not ties:
        return params
    params = jax.tree_util.tree_map(lambda x: x, params)  # shallow-ish copy
    params = _deep_copy_dicts(params)
    for dst, src in ties:
        _set_path(params, dst, _get_path(params, src))
    return params


def prune_tied(params: Dict, ties: Sequence[Tuple[str, str]]) -> Dict:
    """Remove destination subtrees so the optimizer never sees (or updates)
    the dead copies. Use on the params returned by ``init``."""
    if not ties:
        return params
    params = _deep_copy_dicts(params)
    for dst, _ in ties:
        _del_path(params, dst)
    return params


def restore_tied(params: Dict, ties: Sequence[Tuple[str, str]]) -> Dict:
    """Re-materialize pruned destinations from their sources (for apply)."""
    if not ties:
        return params
    params = _deep_copy_dicts(params)
    for dst, src in ties:
        _set_path(params, dst, _get_path(params, src))
    return params


def _deep_copy_dicts(tree):
    if isinstance(tree, dict):
        return {k: _deep_copy_dicts(v) for k, v in tree.items()}
    return tree
