"""Device/backend introspection — the CudaManager analogue.

The reference's CudaManager (include/cuda_interface.hpp:12-56,
cuda/cuda_interface.cu:44-95) lazily initializes device 0, caches
availability, and lets every op silently fall back to CPU.  Under JAX the
runtime owns initialization; what remains useful is introspection and the
same graceful-degradation contract: ``accelerator_available()`` answers
the "is there a TPU" question, and the segment-op impl auto-selection
(segment/segops.default_impl) is the per-op dispatch equivalent.
"""

from __future__ import annotations

from typing import Dict, List

import jax

__all__ = ["accelerator_available", "device_info", "initialize", "cleanup"]

_TPU_BACKENDS = ("tpu", "axon")


def accelerator_available() -> bool:
    """True when a TPU-class backend is the default (CudaManager::isAvailable)."""
    try:
        return jax.default_backend() in _TPU_BACKENDS
    except RuntimeError:
        return False


def initialize() -> bool:
    """Force backend initialization; returns availability.

    (CudaManager::initialize, cuda_interface.cu:61-88 — JAX initializes
    lazily on first use; this just triggers it eagerly.)
    """
    try:
        jax.devices()
        return accelerator_available()
    except RuntimeError:
        return False


def cleanup() -> None:
    """Release cached backend clients (CudaManager::cleanup)."""
    jax.clear_caches()


def device_info() -> List[Dict[str, str]]:
    """One record per visible device."""
    return [
        {
            "id": str(d.id),
            "platform": d.platform,
            "kind": d.device_kind,
            "process": str(d.process_index),
        }
        for d in jax.devices()
    ]
