"""Debug toggles.

The reference's error-handling story is cudaGetLastError prints after
every kernel (cuda/cuda_wrapper.cu:119-123).  XLA's functional purity
removes that class of bug; what remains useful is NaN tracing — finding
which op first produced a NaN — via jax's debug_nans (SURVEY.md §5)."""

from __future__ import annotations

import contextlib

import jax

__all__ = ["debug_nans", "assert_finite"]


@contextlib.contextmanager
def debug_nans(enabled: bool = True):
    """Context manager: raise at the first op producing NaN/inf.

    Slows execution (per-op checks); use for debugging only.
    """
    prev = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", enabled)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)


def assert_finite(tree, name: str = "value") -> None:
    """Host-side finite check of every array leaf in a pytree."""
    import numpy as np

    for i, leaf in enumerate(jax.tree_util.tree_leaves(tree)):
        arr = np.asarray(leaf)
        if arr.dtype.kind == "f" and not np.isfinite(arr).all():
            raise FloatingPointError(
                f"{name}: leaf {i} contains "
                f"{np.isnan(arr).sum()} NaN / {np.isinf(arr).sum()} inf values"
            )
