"""Differentiable rendering: parameter packing, losses, inverse-rendering steps."""

from raytracingproject_tpu.grad.inverse import (
    SceneParams,
    extract_params,
    apply_params,
    render_loss,
    make_train_step,
)

__all__ = [
    "SceneParams",
    "extract_params",
    "apply_params",
    "render_loss",
    "make_train_step",
]
