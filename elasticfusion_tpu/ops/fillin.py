"""Gap fill-in — TPU-native equivalent of `FillIn`
(/root/reference/Core/Shaders/FillIn.{h,cpp}; fill_vertex.frag,
fill_normal.frag, fill_rgb.frag).

Combines predicted model maps with raw-frame data: wherever the prediction is
empty (vertex z == 0 / RGB sum == 0) or `passthrough` is forced (tracking
lost, or frameToFrameRGB for the image — ElasticFusion.cpp:647-649), the raw
back-projection is substituted.  The fill-in outputs are what tracking and
fern matching consume (ElasticFusion.cpp:311-315, 395-402)."""

from __future__ import annotations

import jax.numpy as jnp

from ..config import CameraConfig
from .preprocess import compute_nmap, compute_vmap
from .splat import Prediction


def fill_vertex(pred_vertex, depth_filtered_m, cam: CameraConfig, max_depth: float, passthrough):
    """fill_vertex.frag:44-52: substitute the raw back-projection where the
    predicted vertex has no depth.  `passthrough` may be a traced bool."""
    raw = compute_vmap(depth_filtered_m, cam, max_depth)
    use_raw = (pred_vertex[2] == 0) | passthrough
    return jnp.where(use_raw[None], raw, pred_vertex)


def fill_normal(pred_normal, depth_filtered_m, cam: CameraConfig, max_depth: float, passthrough):
    """fill_normal.frag:41-49: forward-difference raw normals where the
    prediction is empty.  The shader keys emptiness off the *normal* sample's
    z — equivalent here since empty predictions are all-zero."""
    raw = compute_nmap(compute_vmap(depth_filtered_m, cam, max_depth))
    use_raw = (pred_normal[2] == 0) | passthrough
    return jnp.where(use_raw[None], raw, pred_normal)


def fill_image(pred_image, rgb, passthrough):
    """fill_rgb.frag: substitute raw RGB where the predicted color sums to 0."""
    rgbf = rgb.astype(jnp.float32)
    use_raw = (jnp.sum(pred_image, axis=-1) == 0) | passthrough
    return jnp.where(use_raw[..., None], rgbf, pred_image)


def fill_all(pred: Prediction, depth_filtered_m, rgb, cam: CameraConfig,
             max_depth: float, lost, frame_to_frame_rgb: bool):
    """The three fill passes as called from predict() (EF.cpp:646-650)."""
    return (
        fill_vertex(pred.vertex, depth_filtered_m, cam, max_depth, lost),
        fill_normal(pred.normal, depth_filtered_m, cam, max_depth, lost),
        fill_image(pred.image, rgb, lost | jnp.bool_(frame_to_frame_rgb)),
    )
