"""Weight utilities: delta checkpoints and consolidation.

Reference spec: psalm/model/make_delta.py / apply_delta.py / consolidate.py —
LLaVA-style delta = target minus base over shared keys (embedding rows beyond
the base vocab kept verbatim), applied in reverse to reconstruct.
Operates on flax param pytrees saved with orbax.
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np
import jax


def _zip_trees(a, b, fn):
    return jax.tree.map(fn, a, b)


def make_delta(base_params: Any, target_params: Any) -> Any:
    """delta = target - base, except leaves whose shapes differ (e.g. resized
    vocab embeddings): kept as the raw target values (make_delta.py:15)."""
    def leaf(b, t):
        b, t = np.asarray(b), np.asarray(t)
        if b.shape == t.shape:
            return t - b
        return t

    return _zip_trees(base_params, target_params, leaf)


def apply_delta(base_params: Any, delta_params: Any) -> Any:
    def leaf(b, d):
        b, d = np.asarray(b), np.asarray(d)
        if b.shape == d.shape:
            return b + d
        return d

    return _zip_trees(base_params, delta_params, leaf)


def consolidate(variables: Dict[str, Any], dtype=np.float32) -> Dict[str, Any]:
    """Cast every leaf to one dtype for release (consolidate.py:13)."""
    return jax.tree.map(lambda x: np.asarray(x, dtype), variables)
