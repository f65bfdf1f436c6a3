"""Trainable/frozen parameter partition.

The performance-correct JAX freezing: split the param tree by the tunable
mask and differentiate only the trainable subtree — XLA then dead-code
eliminates the entire backward graph of frozen towers (the reference merely
set ``requires_grad=False``, `/root/reference/cvap/monitor/cvap.py:292-296`).
The optimizer also only carries state for trainable leaves.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

from flax.traverse_util import flatten_dict, unflatten_dict


def partition_params(params: Dict, mask: Dict) -> Tuple[Dict, Dict]:
    """(trainable, frozen) — each a dict tree containing only its leaves."""
    flat_p = flatten_dict(params)
    flat_m = flatten_dict(mask)
    train = {k: v for k, v in flat_p.items() if flat_m[k]}
    frozen = {k: v for k, v in flat_p.items() if not flat_m[k]}
    return unflatten_dict(train), unflatten_dict(frozen)


def merge_params(trainable: Dict, frozen: Dict) -> Dict:
    flat = dict(flatten_dict(frozen))
    flat.update(flatten_dict(trainable))
    return unflatten_dict(flat)
