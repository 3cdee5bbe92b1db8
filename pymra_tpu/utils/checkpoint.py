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


def save_pytree(path: str, tree) -> None:
    """Checkpoint a pytree of arrays to ``.npz`` (structure stored as a
    JSON treedef of dict/list/tuple keys)."""
    import jax

    leaves, treedef = jax.tree_util.tree_flatten(tree)
    arrays = {f"leaf_{i}": np.asarray(v) for i, v in enumerate(leaves)}
    np.savez_compressed(path, __treedef__=str(treedef), **arrays)


def load_pytree(path: str, like=None):
    """Load a pytree checkpoint. ``like`` provides the structure to
    unflatten into (required: treedefs are not portable as strings)."""
    import jax

    data = np.load(path, allow_pickle=False)
    n = len([k for k in data.files if k.startswith("leaf_")])
    leaves = [data[f"leaf_{i}"] for i in range(n)]
    if like is None:
        return leaves
    treedef = jax.tree_util.tree_structure(like)
    return jax.tree_util.tree_unflatten(treedef, leaves)
