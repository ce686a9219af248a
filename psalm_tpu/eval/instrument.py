"""Runtime validation of the window-mode exactness radius (VERDICT r1 #4).

Window-mode deformable attention (ops/msdeform_window.py) is exact while
sampling offsets stay within ±window_radius target-level pixels; beyond it
they are clamped. The offset magnitudes under real checkpoints are unknown a
priori, so this module measures them: each MSDeformAttnLayer sows per-layer
``offset_max`` (max |offset| in target-level px) and ``offset_clamp_frac``
(fraction of samples whose offset would be clamped at the configured
radius) into the flax "intermediates" collection.

Spec: the offset head is zero-kernel / direction-bias initialized at
magnitude <= n_points (reference ms_deform_attn.py:70-80), so radius 8
covers init with 2x margin; trained checkpoints must be validated with
``offset_clamp_report``.
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import numpy as np


@functools.lru_cache(maxsize=8)
def _instrumented_forward(model, kwargs_items):
    """Jitted instrumented forward. The only sows are per-layer scalars
    (pixel_decoder.py:106-107), so returning the intermediates collection
    downloads a handful of floats. Unjitted, the mutable apply ran the
    whole spine op-by-op — ~free on a local device but per-op dispatch on
    the tunneled axon runtime, which made the every-50-batches telemetry
    check cost far more than the one forward it looks like (VERDICT r3
    weak #7)."""
    kw = dict(kwargs_items)

    def run(variables, batch):
        _, inter = model.apply(variables, batch, mutable=["intermediates"],
                               **kw)
        return inter["intermediates"]

    return jax.jit(run)


def offset_clamp_report(model, variables, batch, **apply_kwargs) -> Dict[str, Dict[str, float]]:
    """One instrumented forward; returns {layer_path: {offset_max,
    clamp_frac}} for every MSDeformAttn encoder layer."""
    fwd = _instrumented_forward(model, tuple(sorted(apply_kwargs.items())))
    inter = fwd(variables, batch)

    flat = jax.tree_util.tree_flatten_with_path(inter)[0]
    per_layer: Dict[str, Dict[str, float]] = {}
    for kp, v in flat:
        parts = [str(getattr(k, "key", k)) for k in kp]
        stat = next((p for p in parts
                     if p in ("offset_max", "offset_clamp_frac")), None)
        if stat is None:
            continue
        layer = "/".join(p for p in parts
                         if p.startswith("encoder_layer_"))
        entry = per_layer.setdefault(layer or "/".join(parts[:-2]), {})
        key = "offset_max" if stat == "offset_max" else "clamp_frac"
        entry[key] = float(np.asarray(v).reshape(-1)[0])
    return per_layer


def summarize(report: Dict[str, Dict[str, float]]) -> Dict[str, float]:
    """Aggregate a report to {max_offset_px, max_clamp_frac}."""
    if not report:
        return {"max_offset_px": 0.0, "max_clamp_frac": 0.0}
    return {
        "max_offset_px": max(e.get("offset_max", 0.0)
                             for e in report.values()),
        "max_clamp_frac": max(e.get("clamp_frac", 0.0)
                              for e in report.values()),
    }
