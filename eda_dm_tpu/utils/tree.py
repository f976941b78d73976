"""Small pytree-path helpers for nested variable dicts."""

from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple


def get_subtree(tree: Dict[str, Any], path: Sequence[str]):
    for p in path:
        tree = tree[p]
    return tree


def set_subtree(tree: Dict[str, Any], path: Sequence[str], value) -> Dict[str, Any]:
    """Functionally replace the subtree at ``path`` (shallow-copies the spine)."""
    if not path:
        return value
    new = dict(tree)
    new[path[0]] = set_subtree(tree[path[0]], path[1:], value)
    return new


def deep_merge(base: Dict[str, Any], overlay: Dict[str, Any]) -> Dict[str, Any]:
    """Merge ``overlay`` leaves into ``base`` (overlay wins)."""
    out = dict(base)
    for k, v in overlay.items():
        if k in out and isinstance(out[k], dict) and isinstance(v, dict):
            out[k] = deep_merge(out[k], v)
        else:
            out[k] = v
    return out


def partition_leaves(tree: Dict[str, Any], predicate) -> Tuple[Dict, Dict]:
    """Split a nested dict into (selected, rest) by predicate(path, leaf).

    Empty sub-dicts are dropped from both sides.
    """
    sel: Dict[str, Any] = {}
    rest: Dict[str, Any] = {}

    def walk(node, path):
        s: Dict[str, Any] = {}
        r: Dict[str, Any] = {}
        for k, v in node.items():
            if isinstance(v, dict):
                cs, cr = walk(v, path + (k,))
                if cs:
                    s[k] = cs
                if cr:
                    r[k] = cr
            elif predicate(path + (k,), v):
                s[k] = v
            else:
                r[k] = v
        return s, r

    sel, rest = walk(tree, ())
    return sel, rest
