"""Checkpoint / resume subsystem.

The reference has none (SURVEY §5: the nearest artifact is ad-hoc
``np.save`` of intermediates in scripts, and the tree cannot be serialized
because children are destroyed during construction). Here:

  * :func:`save_plan` / :func:`load_plan` — serialize a ``TreePlan`` to one
    ``.npz`` (planning a 1M-location tree takes seconds-to-minutes on host;
    loading is instant and deterministic across sessions);
  * :func:`save_pytree` / :func:`load_pytree` — checkpoint any pytree of
    arrays (sampler states, HMC draws, fitted parameters) to ``.npz``.
"""
from __future__ import annotations

import json

import numpy as np

__all__ = ["save_plan", "load_plan", "save_pytree", "load_pytree"]


def save_plan(path: str, plan) -> None:
    """Serialize a :class:`pymra_tpu.tree.plan.TreePlan`.

    Saves the padded level arrays + location coordinates — everything the
    numeric sweep needs. The host-side ``NodeRec`` records (used only by
    tree-walking diagnostics like ``draw_knots``) are not serialized; a
    loaded plan has empty ``nodes`` lists.
    """
    arrays = {"locs": plan.locs}
    meta = {"r": plan.r, "M": plan.M, "J": plan.J,
            "n_levels": len(plan.levels)}
    for m, g in enumerate(plan.levels):
        arrays[f"l{m}_int_knot_gidx"] = g.int_knot_gidx
        arrays[f"l{m}_int_parent"] = g.int_parent
        arrays[f"l{m}_int_path"] = g.int_path
        arrays[f"l{m}_leaf_loc_gidx"] = g.leaf_loc_gidx
        arrays[f"l{m}_leaf_loc_mask"] = g.leaf_loc_mask
        arrays[f"l{m}_leaf_is_knot"] = g.leaf_is_knot
        arrays[f"l{m}_leaf_parent"] = g.leaf_parent
        arrays[f"l{m}_leaf_path"] = g.leaf_path
    np.savez_compressed(path, __meta__=json.dumps(meta), **arrays)


def load_plan(path: str):
    """Load a plan saved by :func:`save_plan`."""
    from pymra_tpu.tree.plan import LevelGroup, PlanConfig, TreePlan

    data = np.load(path, allow_pickle=False)
    meta = json.loads(str(data["__meta__"]))
    levels = []
    for m in range(meta["n_levels"]):
        levels.append(LevelGroup(
            level=m,
            int_knot_gidx=data[f"l{m}_int_knot_gidx"],
            int_parent=data[f"l{m}_int_parent"],
            int_path=data[f"l{m}_int_path"],
            leaf_loc_gidx=data[f"l{m}_leaf_loc_gidx"],
            leaf_loc_mask=data[f"l{m}_leaf_loc_mask"],
            leaf_is_knot=data[f"l{m}_leaf_is_knot"],
            leaf_parent=data[f"l{m}_leaf_parent"],
            leaf_path=data[f"l{m}_leaf_path"],
        ))
    return TreePlan(
        locs=data["locs"], r=meta["r"], M=meta["M"], J=meta["J"],
        levels=levels, nodes=[[] for _ in range(meta["n_levels"])],
        config=PlanConfig(r=meta["r"], M=meta["M"], J=meta["J"]),
    )


def _encode_structure(obj, leaves: list) -> dict:
    """Recursively encode a pytree's structure as JSON, collecting leaves.

    Containers handled: dict (str/int/float/bool keys), list, tuple
    (named tuples are recorded as plain tuples — the class itself is not
    serializable without pickling), None. Everything else is a leaf.
    """
    if obj is None:
        return {"t": "none"}
    if isinstance(obj, dict):
        return {"t": "dict",
                "items": [[k, _encode_structure(v, leaves)]
                          for k, v in obj.items()]}
    if isinstance(obj, tuple):
        return {"t": "tuple",
                "items": [_encode_structure(v, leaves) for v in obj]}
    if isinstance(obj, list):
        return {"t": "list",
                "items": [_encode_structure(v, leaves) for v in obj]}
    leaves.append(obj)
    return {"t": "leaf", "i": len(leaves) - 1}


def _decode_structure(spec: dict, leaves: list):
    t = spec["t"]
    if t == "none":
        return None
    if t == "dict":
        return {k: _decode_structure(v, leaves) for k, v in spec["items"]}
    if t == "tuple":
        return tuple(_decode_structure(v, leaves) for v in spec["items"])
    if t == "list":
        return [_decode_structure(v, leaves) for v in spec["items"]]
    return leaves[spec["i"]]


def save_pytree(path: str, tree) -> None:
    """Checkpoint a pytree of arrays to ``.npz``.

    The container structure (dicts/lists/tuples/None) is serialized as a
    recoverable JSON path encoding, so :func:`load_pytree` restores the full
    pytree with no template. Named tuples are restored as plain tuples;
    custom pytree node classes are flattened through ``jax.tree`` first (a
    round-trip returns their dict/tuple skeleton, not the class instance).
    """
    leaves: list = []
    structure = _encode_structure(tree, leaves)
    arrays = {f"leaf_{i}": np.asarray(v) for i, v in enumerate(leaves)}
    np.savez_compressed(path, __structure__=json.dumps(structure), **arrays)


def load_pytree(path: str, like=None):
    """Load a pytree checkpoint, restoring the container structure.

    ``like`` (optional) re-unflattens the restored leaves into an arbitrary
    template's treedef instead — useful to get named-tuple / custom-node
    classes back.
    """
    import jax

    data = np.load(path, allow_pickle=False)
    n = len([k for k in data.files if k.startswith("leaf_")])
    leaves = [data[f"leaf_{i}"] for i in range(n)]
    if like is not None:
        treedef = jax.tree_util.tree_structure(like)
        return jax.tree_util.tree_unflatten(treedef, leaves)
    if "__structure__" in data.files:
        structure = json.loads(str(data["__structure__"]))
        return _decode_structure(structure, leaves)
    return leaves  # legacy checkpoints (round-1 format) carried no structure
