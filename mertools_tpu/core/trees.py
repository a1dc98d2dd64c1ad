"""Small param-pytree utilities shared by the CLIs."""

from __future__ import annotations


def check_tree_like(restored, reference, source: str) -> None:
    """A restored checkpoint tree must match the reference architecture
    (same structure and leaf shapes) — fail clearly instead of a cryptic
    shape error at the first forward."""
    import jax

    s1 = jax.tree_util.tree_structure(restored)
    s2 = jax.tree_util.tree_structure(reference)
    if s1 != s2:
        raise ValueError(
            f"{source}: checkpoint tree does not match the selected "
            f"model architecture (structure mismatch)")
    bad = [
        (a.shape, b.shape)
        for a, b in zip(jax.tree_util.tree_leaves(restored),
                        jax.tree_util.tree_leaves(reference))
        if getattr(a, "shape", None) != getattr(b, "shape", None)]
    if bad:
        raise ValueError(
            f"{source}: checkpoint leaf shapes do not match the selected "
            f"model architecture (e.g. {bad[0][0]} vs {bad[0][1]})")
