"""Convert decoder params between separate-L/R and paired (hand-stacked)
layouts.

The standard layout (checkpoint-parity with the reference,
`common/myhand/model_attn/DualGraph_lijun.py`) keeps separate modules
`graph_left`/`graph_right`, `img_ex_left`/`img_ex_right` and
`L_self_attn`/`R_self_attn`. The paired layout (`ModelConfig.paired_lr`)
runs one nn.vmap-lifted module per pair whose params carry a leading (2,)
hand axis, ordered [left, right].

`pair_params` / `unpair_params` convert whole model pytrees between the
two; they are exact inverses and the two layouts compute identical
functions (tested in tests/test_paired_decoder.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_PAIRS = (
    ("graph_left", "graph_right", "graph_pair"),
    ("img_ex_left", "img_ex_right", "img_ex_pair"),
    ("L_self_attn", "R_self_attn", "LR_self_attn"),
)


def pair_params(tree):
    """Separate-L/R param pytree -> paired layout (leaves stacked on axis 0)."""
    if not isinstance(tree, dict):
        return tree
    out = {}
    consumed = set()
    for left, right, pair in _PAIRS:
        if left in tree and right in tree:
            out[pair] = jax.tree_util.tree_map(
                lambda a, b: jnp.stack([a, b]),
                pair_params(tree[left]), pair_params(tree[right]),
            )
            consumed.update((left, right))
    for k, v in tree.items():
        if k not in consumed:
            out[k] = pair_params(v)
    return out


def unpair_params(tree):
    """Paired param pytree -> separate-L/R layout."""
    if not isinstance(tree, dict):
        return tree
    out = {}
    names = {pair: (left, right) for left, right, pair in _PAIRS}
    for k, v in tree.items():
        if k in names:
            left, right = names[k]
            sub = unpair_params(v)
            out[left] = jax.tree_util.tree_map(lambda x: x[0], sub)
            out[right] = jax.tree_util.tree_map(lambda x: x[1], sub)
        else:
            out[k] = unpair_params(v)
    return out
